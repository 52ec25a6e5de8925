package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join without a nested-loop join. Spark plans a
  * pure range predicate (`p BETWEEN lo AND hi`) as BroadcastNestedLoopJoin —
  * O(|points|·|intervals|) comparisons, a non-starter at scale. The standard
  * fix is axis bucketing: bin the numeric axis with width ≈ the typical
  * interval length, explode each interval to the bins it covers, map each
  * point to its single bin, equi-join on the bin, then apply the exact range
  * filter. Each (point, interval) candidate meets in exactly ONE bin (the
  * point's), so no dedup pass is needed, and the equi-join is an ordinary
  * shuffled-hash/broadcast join that AQE can size and skew-split.
  *
  * Cost: shuffle of points + exploded intervals (×(len/binWidth + 1) rows),
  * candidates bounded by per-bin co-occurrence instead of the full cross
  * product. Degenerate long intervals (≫ binWidth) explode wide — pick
  * binWidth near the p99 interval length, or split outliers first.
  */
object RangeJoin {

  /** Inclusive on both ends: emits rows where `lo <= point <= hi`, with all
    * columns of both inputs. Axis columns must be integral (cast dates to
    * epoch days, timestamps to epoch seconds first).
    */
  def pointInRange(
      points: DataFrame,
      intervals: DataFrame,
      point: String,
      lo: String,
      hi: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // pure integer floor-division (pmod handles negatives): `floor(col / w)`
    // would divide through DOUBLE and silently mis-bin axis values above
    // 2^53 (e.g. epoch-nanos), dropping matches
    def bin(c: String) = expr(s"((`$c` - pmod(`$c`, ${binWidth}L)) div ${binWidth}L)")
    val binnedP = points.withColumn("_bin", bin(point))
    val binnedI = intervals.withColumn("_bin",
      explode(sequence(bin(lo), bin(hi))))
    binnedP.join(binnedI, Seq("_bin"))
      .filter(col(point) >= col(lo) && col(point) <= col(hi))
      .drop("_bin")
  }

  /** [[pointInRange]] with an extra equi-key (e.g. per-user validity spans):
    * the shuffle key is (key, bin), so one entity's intervals never meet
    * another's points. Without the key in the JOIN (vs a post-filter), every
    * point would pair with every co-binned interval of every entity — the
    * difference between O(matches) and O(points × entities) at scale.
    */
  def pointInRangeKeyed(
      points: DataFrame,
      intervals: DataFrame,
      pointKey: String,
      intervalKey: String,
      point: String,
      lo: String,
      hi: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def bin(c: String) = expr(s"((`$c` - pmod(`$c`, ${binWidth}L)) div ${binWidth}L)")
    // distinct bin column names: after the join both frames' columns are in
    // scope, and the key columns must also be differently named (the caller
    // picks them; same-named keys would be ambiguous in the output)
    require(pointKey != intervalKey,
      "pointKey and intervalKey must have different column names")
    val binnedP = points.withColumn("_pbin", bin(point))
    val binnedI = intervals.withColumn("_ibin",
      explode(sequence(bin(lo), bin(hi))))
    binnedP.join(binnedI,
        col("_pbin") === col("_ibin") && col(pointKey) === col(intervalKey))
      .filter(col(point) >= col(lo) && col(point) <= col(hi))
      .drop("_pbin", "_ibin")
  }
}
