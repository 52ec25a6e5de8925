package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier) as a RANGE-PARTITIONED sweep.
  *
  * A row survives iff its `size` is strictly greater than every
  * strictly-earlier row's `size` in (`price`, `key`) total order — the
  * classic O(n log n) dominance sweep. The naive formulation is a global
  * unpartitioned window (`WindowExec` moves ALL data to one partition — the
  * single-node bottleneck a 100 TB plan cannot contain). Here the sweep is
  * distributed:
  *
  *  1. range-partition on (price, key) and sort within partitions — a total
  *     order across partition boundaries, each partition holding a
  *     contiguous price range;
  *  2. per-partition maxima (O(partitions) rows — metadata scale) roll into
  *     prefix maxima over strictly-earlier partitions, broadcast back as
  *     each partition's sweep seed;
  *  3. a window PARTITIONED BY the physical partition id computes the
  *     within-partition running max; a row's dominating max is
  *     greatest(seed, running) — no partition ever sees another's rows.
  *
  * Wall-clock is one range shuffle + one parallel windowed pass; the only
  * driver-side data is one (pid, max) pair per partition. `df` is
  * checkpointed so the seed pass and the sweep observe identical partition
  * ids. `size` must be non-null (TPC-H `p_size` is).
  */
object Skyline {

  def sweep2d(
      df: DataFrame,
      price: Column,
      size: Column,
      key: Column,
      partitions: Int = 32): DataFrame = {
    val parted = df
      .repartitionByRange(partitions, price, key)
      .sortWithinPartitions(price, key)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(false)

    // O(partitions) rows — the same metadata-scale driver hop as a stats
    // manifest; never row data.
    val partMax = parted.groupBy(col("_pid"))
      .agg(max(size.cast("long")).as("_m"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)

    // prefix max over strictly-earlier partitions; first non-empty
    // partition (and any before it) seeds with null
    val seeds = {
      var running: Option[Long] = None
      partMax.map { case (pid, m) =>
        val s = running
        running = Some(running.fold(m)(math.max(_, m)))
        (pid, s.map(java.lang.Long.valueOf).orNull)
      }
    }
    val spark = df.sparkSession
    import spark.implicits._
    val seedDf = seeds.toSeq.toDF("_pid", "_seed")

    val w = Window.partitionBy("_pid").orderBy(price, key)
      .rowsBetween(Window.unboundedPreceding, -1)
    parted
      .join(broadcast(seedDf), Seq("_pid"), "left")
      .withColumn("_best", greatest(max(size.cast("long")).over(w), col("_seed")))
      .filter(col("_best").isNull || size.cast("long") > col("_best"))
      .drop("_pid", "_seed", "_best")
  }
}
