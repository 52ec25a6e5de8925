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
    val binnedP = points.withColumn("_bin", floor(col(point) / binWidth))
    val binnedI = intervals.withColumn("_bin",
      explode(sequence(floor(col(lo) / binWidth), floor(col(hi) / binWidth))))
    binnedP.join(binnedI, Seq("_bin"))
      .filter(col(point) >= col(lo) && col(point) <= col(hi))
      .drop("_bin")
  }
}
