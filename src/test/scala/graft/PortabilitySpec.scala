package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cross-engine semantic corners, pinned. Every expected value below was
  * produced by DuckDB (probed 2026-08-13, same build the driver's oracle
  * runs) for the identical expression — these are the equivalences the
  * OracleSqlGen portability ruleset RELIES on. If a Spark upgrade changes
  * any of them, the matching oracle idiom must change in the same commit.
  *
  * Breadth lives in the declared `q_fuzz_portability` query, which pushes
  * md5-derived pseudo-random values through the same rules and is
  * oracle-compared at every driver round; this spec pins the handful of
  * corner semantics (negatives, ties, non-ASCII) a random draw could miss.
  */
class PortabilitySpec extends AnyFunSuite with SparkTestBase {

  private def one(sql: String): Any = spark.sql(s"SELECT $sql").head.get(0)

  test("integer div/mod on negatives: truncating div, C-style remainder (DuckDB // and %)") {
    assert(one("-5 div 7") == 0L)  // DuckDB -5 // 7 = 0 (truncates, not floors)
    assert(one("5 div -7") == 0L)  // DuckDB 5 // -7 = 0
    assert(one("-5 % 7") == -5)    // sign of dividend, both engines
    assert(one("5 % -7") == 5)
  }

  test("md5 hex prefix parses to the same 60-bit long as DuckDB's CAST('0x'||…)") {
    // DuckDB: CAST('0x' || substr(md5('42'),1,15) AS BIGINT) = 728752383503378226
    assert(one("CAST(conv(substring(md5(CAST('42' AS BINARY)), 1, 15), 16, 10) AS BIGINT)")
      == 728752383503378226L)
  }

  test("round(double, k) is half-up away from zero on the shortest decimal repr") {
    assert(one("round(2.5d, 0)") == 3.0)   // DuckDB round(2.5e0, 0) = 3.0
    assert(one("round(3.5d, 0)") == 4.0)   // not banker's rounding
    assert(one("round(-2.5d, 0)") == -3.0) // away from zero
    // 1.0045d is binarily 1.00449999…; both engines still round the SHORTEST
    // DECIMAL representation (1.0045 → 1.005), not the raw binary expansion
    assert(one("round(1.0045d, 3)") == 1.005)
  }

  test("string functions are codepoint-based and null-skipping like DuckDB") {
    assert(one("length('héllo🙂漢')") == 7)            // codepoints, not bytes/UTF-16 units
    assert(one("substring('héllo🙂漢', 2, 3)") == "éll")
    assert(one("reverse('abc🙂')") == "🙂cba") // the emoji survives reversal intact
    assert(one("upper('héllo')") == "HÉLLO")
    assert(one("concat_ws('-', 'a', NULL, 'b')") == "a-b")     // NULL skipped, not propagated
  }

  test("CAST(double AS INT) TRUNCATES in Spark but ROUNDS in DuckDB — never cross the boundary uncast") {
    // this is the rule's justification pin: Spark gives 2, DuckDB gives 3 —
    // any oracle-compared value must go through explicit floor()/round()
    assert(one("CAST(2.7d AS INT)") == 2)
  }
}
