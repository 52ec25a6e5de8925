package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch as a RELATION — `(j, b, cnt)` cell rows instead of an
  * opaque binary blob — with md5-derived row hashes, so the whole structure
  * is a DETERMINISTIC pure function of the keyed corpus: any engine
  * rebuilds the identical sketch and the identical (always-overestimating)
  * point estimates. That determinism is what lets a DuckDB oracle pin the
  * sketch bit-for-bit — unlike library sketches whose layout is
  * implementation-defined (cf. the HLL/KLL rows-only queries).
  *
  * Scale shape: `build` is one map-side-combinable aggregation to at most
  * depth·width cells regardless of corpus size; `merge` is cell-wise
  * addition (the mergeability CMS exists for — per-partition, per-batch, or
  * per-day sketches union freely); `probe` touches O(probe·depth) cells via
  * an equi-join against the tiny cell table. Nothing here is O(corpus) but
  * the one initial scan.
  *
  * Reference behavior: heavy-hitter / approx-count surfaces of the target
  * engine family (BASELINE.json north star); CMS per Cormode–Muthukrishnan.
  */
object Cms {
  private def bucket(j: Int, key: Column, width: Int): Column =
    conv(substring(md5(concat_ws(":", lit(j).cast("string"),
      key.cast("string")).cast("binary")), 1, 13), 16, 10)
      .cast("long") % width

  /** Driver-side twin of [[bucket]] for literal probe keys — lets
    * fixed-probe readers (e.g. the streaming monitor) compile their cell
    * tests down to literal bucket comparisons at plan time.
    */
  def plannedBucket(j: Int, key: String, width: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j:$key".getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.take(13), 16) % width
  }

  /** The engine-side bucket column, exposed for readers that inline the
    * cell test instead of materializing the sketch.
    */
  def bucketCol(j: Int, key: Column, width: Int): Column = bucket(j, key, width)

  /** Sketch cells for the keyed corpus, reduced to ≤ depth·width
    * `(j, b, cnt)` cells. Counts are pre-aggregated per DISTINCT key first
    * (map-side combinable), so the depth md5 lanes are computed once per
    * distinct key instead of once per row — on a 6M-row / 20k-key column
    * that is 300× less hashing for bit-identical cells (the bucket sum of
    * per-key counts ≡ the bucket count of rows; round-8 rewrite, oracles
    * unchanged). Keys near-unique degrade gracefully: the pre-aggregation
    * then shuffles what the cell aggregation would have anyway.
    */
  def build(df: DataFrame, key: Column, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2)
    df.select(key.as("k"))
      .groupBy("k").agg(count(lit(1)).as("_kcnt"))
      .select(col("_kcnt"), explode(array((0 until depth).map(j =>
        struct(lit(j).as("j"), bucket(j, col("k"), width).as("b"))): _*))
        .as("cell"))
      .groupBy(col("cell.j").as("j"), col("cell.b").as("b"))
      .agg(sum("_kcnt").as("cnt"))
  }

  /** Cell-wise sum of two sketches built with the same (depth, width):
    * merge(build(A), build(B)) ≡ build(A ∪ B), exactly.
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("j", "b").agg(sum("cnt").as("cnt"))

  /** Point estimates for a probe-key frame: min over depth of the key's
    * cells — the classic always-an-overestimate CMS read. Probe keys whose
    * cells are all absent estimate 0 (a key never inserted).
    */
  def probe(cells: DataFrame, keys: DataFrame, key: Column,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2)
    keys.select(key.as("k")).distinct()
      .select(col("k"), explode(array((0 until depth).map(j =>
        struct(lit(j).as("j"), bucket(j, col("k"), width).as("b"))): _*))
        .as("cell"))
      .select(col("k"), col("cell.j").as("j"), col("cell.b").as("b"))
      .join(cells, Seq("j", "b"), "left")
      .groupBy("k")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }
}
