package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass data-validation expectations — the pre-training data gate
  * (schema/range/non-null/consistency assertions) evaluated over a table in
  * ONE scan.
  *
  * Each expectation is a row-level boolean; a NULL verdict counts as a
  * violation (an assertion that cannot be evaluated has not passed — the
  * three-valued-logic trap every hand-rolled `WHERE NOT check` gets wrong).
  * All expectations become conditional sums inside ONE aggregation, so at
  * 100 TB the suite costs a single partial-aggregated scan regardless of
  * how many assertions it carries — vs the N-scans-for-N-checks shape of a
  * naive validator. The O(expectations)-cell result is then melted to one
  * row per expectation (the relational report shape).
  */
object Expectations {

  /** Evaluate `expectations` (name → row predicate) over `df` in one pass.
    * Returns one row per expectation: (expectation, n_rows, n_violations,
    * pass), ordered by name. Names must be SQL-identifier-safe (they pass
    * through a generated `stack`). Empty input passes every expectation
    * over zero rows.
    */
  /** Names flow into a generated `stack(...)` — restrict to identifier
    * characters so a quote or comma can't mangle the projection.
    */
  private[graft] def requireSafeNames(expectations: Seq[(String, Column)]): Unit =
    expectations.foreach { case (name, _) =>
      require(name.matches("[A-Za-z][A-Za-z0-9_]*"),
        s"expectation name '$name' must be a plain identifier")
    }

  def check(df: DataFrame, expectations: Seq[(String, Column)]): DataFrame = {
    require(expectations.nonEmpty, "at least one expectation")
    requireSafeNames(expectations)
    val aggs = expectations.map { case (name, pred) =>
      coalesce(
        sum(when(coalesce(pred, lit(false)), lit(0L)).otherwise(lit(1L))),
        lit(0L)).as(s"v_$name")
    } :+ count(lit(1)).as("_n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = expectations
      .map { case (name, _) => s"'$name', v_$name" }.mkString(", ")
    one
      .selectExpr("_n",
        s"stack(${expectations.size}, $stackArgs) AS (expectation, n_violations)")
      .select(col("expectation"), col("_n").as("n_rows"),
        col("n_violations"), (col("n_violations") === 0L).as("pass"))
      .orderBy("expectation")
  }
}
