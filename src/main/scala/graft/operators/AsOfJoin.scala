package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, the single right row of the same
  * key with the greatest timestamp at-or-before the left timestamp — the
  * point-in-time lookup of time-series/feature-store pipelines (e.g. "the
  * features as of this training example's event time"). The reference has no
  * temporal operators at all; this extends the engine's event surface the
  * way DuckDB's ASOF JOIN / kdb's aj do.
  *
  * Spark has no native as-of join, and the naive formulations die at scale:
  *  - `l JOIN r ON l.k = r.k AND r.ts <= l.ts` + row_number: the range
  *    predicate forces every (key) pair through the join (quadratic in rows
  *    per key) before the filter;
  *  - sort-merge per key via mapPartitions: abandons Catalyst.
  *
  * This implementation is the union+window linear scan: tag both sides,
  * shuffle ONCE on the key, sort each partition by (ts, side) — right rows
  * ordered before left rows at equal ts, making the match inclusive — and
  * carry the latest right payload forward with `last(..., ignoreNulls)` over
  * a running frame. Cost is one shuffle + one in-partition sort of |L|+|R|,
  * independent of match fan-out; skewed keys AQE-split like any window.
  */
object AsOfJoin {

  /** @param left         probe side; all its columns survive
    * @param right        build side; only `key`, `rightTs`, `rightPayload`
    *                     are read
    * @param key          equality key (same name both sides)
    * @param leftTs       left timestamp column name
    * @param rightTs      right timestamp column name (emitted in the output;
    *                     rename on the right DataFrame if it collides with a
    *                     left column)
    * @param rightPayload additional right columns to emit
    * @param tolerance    optional max lookback: matches older than
    *                     `leftTs - tolerance` are dropped (row dropped —
    *                     inner semantics, like matchless rows)
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String] = Nil,
      tolerance: Option[Column] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val emitted = rightTs +: rightPayload
    require(leftCols.intersect(emitted).isEmpty,
      s"Right output columns ${leftCols.intersect(emitted).mkString(",")} collide with left columns — rename first")

    val lStructT = left.select(struct(leftCols.map(col): _*)).schema.head.dataType
    val rStructT = right.select(struct(emitted.map(col): _*)).schema.head.dataType

    // join semantics: NULL keys never match (partitionBy would otherwise
    // group them together and "match" them — diverging from any real join,
    // including the DuckDB ASOF oracle)
    val lU = left.filter(col(key).isNotNull && col(leftTs).isNotNull).select(
      col(key).as("_k"), col(leftTs).as("_ts"), lit(1).as("_side"),
      struct(leftCols.map(col): _*).as("_l"),
      lit(null).cast(rStructT).as("_r"))
    val rU = right.filter(col(key).isNotNull && col(rightTs).isNotNull).select(
      col(key).as("_k"), col(rightTs).as("_ts"), lit(0).as("_side"),
      lit(null).cast(lStructT).as("_l"),
      struct(emitted.map(col): _*).as("_r"))

    // right-before-left at equal ts ⇒ inclusive (ts_r == ts_l matches);
    // the trailing `_r` orders equal-timestamp right rows by their payload
    // struct so the carried match is DETERMINISTIC (requires payload
    // columns to be orderable types — pre-aggregate arrays/maps first)
    val w = Window.partitionBy("_k").orderBy(col("_ts"), col("_side"), col("_r"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = lU.unionByName(rU)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1 && col("_m").isNotNull)
    val bounded = tolerance match {
      case Some(tol) => matched.filter(
        col("_ts") <= col(s"_m.$rightTs") + tol)
      case None => matched
    }
    bounded.select(col("_l.*"), col("_m.*"))
  }
}
