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
}
