package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ZOrderFunctions

/** Physical-layout operators — the levers that decide what a 100 TB scan
  * actually reads:
  *
  *  - Z-order clustering: range-partition + sort by a Morton key so parquet
  *    min/max footer stats prune files for predicates on EITHER of two
  *    columns (a plain sort only serves its leading column).
  *  - Bucketing: pre-shuffle a table by its join key at write time; two
  *    tables bucketed the same way equi-join with NO exchange on either
  *    side — the repeated-join shuffle moves from every query to one write.
  */
object Layout {

  /** Morton-cluster `df` by two integer columns: range-partition on the
    * interleaved key (`numFiles` output files ≈ parquet row groups), sort
    * within partitions so row-group stats are tight on both dimensions.
    */
  def clusterByZ(df: DataFrame, x: Column, y: Column, numFiles: Int,
      bits: Int = 20): DataFrame = {
    val keyed = df.withColumn("_zkey", ZOrderFunctions.zorderKey(x, y, bits))
    keyed
      .repartitionByRange(numFiles, col("_zkey"))
      .sortWithinPartitions("_zkey")
      .drop("_zkey")
  }

  /** Write `df` as a bucketed+sorted managed table. Joining two tables
    * bucketed by the same key into the same bucket count plans
    * SortMergeJoin with ZERO Exchange (verified by LayoutSpec) — the 100 TB
    * pattern for a fact table joined on the same key by every query.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table) // managed: lives under spark.sql.warehouse.dir
}
