package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact GLOBAL ranking without a single-partition sort.
  *
  * `row_number()` / `ntile()` over an unpartitioned window move every row to
  * one task (`WindowExec` "No Partition Defined") — the single-node
  * bottleneck a 100 TB plan cannot contain. The distributed form is the same
  * range-partitioned decomposition as [[Skyline]]:
  *
  *  1. range-partition on the sort key and sort within partitions — a total
  *     order across partition boundaries, each partition a contiguous key
  *     range;
  *  2. per-partition ROW COUNTS (O(partitions) rows — metadata scale, the
  *     only driver hop) prefix-sum into each partition's global rank offset,
  *     broadcast back;
  *  3. a window PARTITIONED BY the physical partition id ranks within
  *     partitions in parallel; global rank = offset + local rank.
  *
  * The input is localCheckpoint'd so the count pass and the rank pass
  * observe identical partition ids. `sortCols` must be a TOTAL order
  * (include a unique tiebreaker) — with ties at a range boundary the
  * partitioner could split equal keys across partitions and ranks within
  * the tie would be partitioner-dependent.
  */
object Ranking {

  /** `df` plus `out` = exact 1-based global row number in `sortCols` order. */
  def withGlobalRowNumber(
      df: DataFrame,
      sortCols: Seq[Column],
      out: String = "grank",
      partitions: Int = 32): DataFrame = {
    val (parted, offDf, _) = rankScaffold(df, sortCols, partitions)
    val w = Window.partitionBy("_pid").orderBy(sortCols: _*)
    parted
      .join(broadcast(offDf), Seq("_pid"), "left")
      .withColumn(out, col("_off") + row_number().over(w))
      .drop("_pid", "_off")
  }

  /** `df` plus `out` = NTILE(k) bucket in `sortCols` order, by the standard
    * allocation (first n mod k buckets take ceil(n/k) rows, the rest
    * floor(n/k)) — identical output to `ntile(k).over(Window.orderBy(...))`
    * without its all-rows-to-one-task sort. Bucket arithmetic is integer
    * `div` on the exact global rank, so the assignment is engine-exact.
    */
  def withGlobalNtile(
      df: DataFrame,
      sortCols: Seq[Column],
      k: Int,
      out: String,
      partitions: Int = 32): DataFrame = {
    val rankCol = "_grank"
    val (parted, offDf, n) = rankScaffold(df, sortCols, partitions)
    val w = Window.partitionBy("_pid").orderBy(sortCols: _*)
    val ranked = parted
      .join(broadcast(offDf), Seq("_pid"), "left")
      .withColumn(rankCol, col("_off") + row_number().over(w))
      .drop("_pid", "_off")
    val q = n / k
    val rem = n % k
    // rank r (1-based): first rem buckets hold q+1 rows each
    val bucket =
      if (q == 0) expr(s"$rankCol - 1")
      else expr(
        s"""CASE WHEN $rankCol <= ${rem * (q + 1)}
              THEN ($rankCol - 1) div ${q + 1}
              ELSE ${rem} + ($rankCol - 1 - ${rem * (q + 1)}) div ${q}
            END""")
    ranked
      .withColumn(out, (bucket + 1).cast("int"))
      .drop(rankCol)
  }

  /** MULTI-dimension exact ntile, size-gated (the Dedup connected-
    * components pattern: a measured-small frame takes the cheap local
    * plan, anything else the distributed one — same output either way):
    * the input is materialized once and counted; at or below `smallLimit`
    * rows each dimension is one unpartitioned ntile window over the
    * checkpointed frame (bounded by the gate — ≤ smallLimit rows in one
    * task, the fast plan for an aggregate that fits), above it every
    * dimension runs the range-partitioned [[withGlobalNtile]] (three
    * scaffolds cost ~4 Spark jobs each — pure overhead below the gate,
    * the only workable plan above it). Output is identical by the
    * q_ntile contract (withGlobalNtile ≡ the ntile window, spec-pinned),
    * so callers and oracles never see the branch.
    */
  def withGlobalNtiles(
      df: DataFrame,
      dims: Seq[(Seq[Column], String)],
      k: Int,
      smallLimit: Long = 5000000L): DataFrame = {
    val base = df.localCheckpoint(true)
    if (base.count() <= smallLimit)
      dims.foldLeft(base) { case (acc, (sort, out)) =>
        acc.withColumn(out, ntile(k).over(Window.orderBy(sort: _*)))
      }
    else
      dims.foldLeft(base) { case (acc, (sort, out)) =>
        withGlobalNtile(acc, sort, k, out)
      }
  }

  /** `df` plus `out` = exact global running sum of `value` in `sortCols`
    * order (inclusive of the current row) — the distributed form of
    * `sum(value).over(Window.orderBy(...).rowsBetween(unboundedPreceding,
    * currentRow))`. Per-partition TOTALS (not rows) hop to the driver,
    * prefix-sum over strictly-earlier partitions in exact arithmetic
    * (BigDecimal for decimal columns, Long for integral ones), and broadcast
    * back as each partition's seed. `value` must be a decimal or integral
    * column — the exactness contract this engine's oracles rely on; null
    * values are skipped by the sums exactly as in the window form.
    */
  def withGlobalCumSum(
      df: DataFrame,
      sortCols: Seq[Column],
      value: Column,
      out: String,
      partitions: Int = 32): DataFrame = {
    requireNoScratchColumns(df)
    addSeededCumSum(cumSumScaffold(df, sortCols, partitions),
      sortCols, value, out)
      .drop("_pid")
  }

  /** SEVERAL independent global running sums in the SAME `sortCols` order
    * over ONE range partitioning — for values all known up front (the KS
    * test's two class-count prefixes). One shuffle + one materialization;
    * each extra value costs only an O(partitions) totals pass over the
    * materialized frame, and Catalyst collapses the per-value windows
    * (identical specs) into one WindowExec. N separate
    * [[withGlobalCumSum]] calls would pay N samplings + N shuffles + N
    * checkpoints for the same answer.
    */
  def withGlobalCumSums(
      df: DataFrame,
      sortCols: Seq[Column],
      sums: Seq[(Column, String)],
      partitions: Int = 32): DataFrame = {
    requireNoScratchColumns(df)
    val parted = cumSumScaffold(df, sortCols, partitions)
    sums.foldLeft(parted) { case (acc, (value, out)) =>
      addSeededCumSum(acc, sortCols, value, out)
    }.drop("_pid")
  }

  /** TWO chained global running sums over ONE range partitioning: `out1` =
    * running sum of `value1` in `sortCols` order; `derive` then appends
    * columns computed from it (row-local expressions only — it must not
    * reorder or filter); `out2` = running sum of `value2` evaluated on the
    * derived frame, same order. The second stage rides the FIRST stage's
    * shuffle + checkpoint: two back-to-back [[withGlobalCumSum]] calls
    * would re-sample, re-shuffle and re-materialize an already range-
    * partitioned frame (2× the fixed cost on small aggregated inputs, two
    * full shuffles of a 100 TB one) — Kaplan–Meier's death-prefix →
    * ln-term → survival chain is the canonical caller.
    */
  def withGlobalCumSumChain(
      df: DataFrame,
      sortCols: Seq[Column],
      value1: Column,
      out1: String,
      derive: DataFrame => DataFrame,
      value2: Column,
      out2: String,
      partitions: Int = 32): DataFrame = {
    requireNoScratchColumns(df)
    val parted = cumSumScaffold(df, sortCols, partitions)
    val first = addSeededCumSum(parted, sortCols, value1, out1)
    addSeededCumSum(derive(first), sortCols, value2, out2)
      .drop("_pid")
  }

  /** Range-partition + in-partition sort + pin partition ids — the shared
    * head of the cumsum family, materialized once so every downstream
    * totals/window pass observes identical partition ids without
    * re-shuffling.
    */
  private def cumSumScaffold(
      df: DataFrame, sortCols: Seq[Column], partitions: Int): DataFrame =
    df.repartitionByRange(partitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(false)

  /** Shared tail of the cumsum family: per-partition totals of `value`
    * (O(partitions) driver hop) prefix-sum into each partition's seed in
    * exact arithmetic (BigDecimal for decimals, Long for integrals),
    * broadcast back, and `out` = seed + in-partition running sum. `parted`
    * must carry `_pid` (from [[cumSumScaffold]]); `_pid` is KEPT so stages
    * can chain — callers drop it.
    */
  private def addSeededCumSum(
      parted: DataFrame,
      sortCols: Seq[Column],
      value: Column,
      out: String): DataFrame = {
    import org.apache.spark.sql.types.{DataTypes, DecimalType, LongType, IntegerType, StructField, StructType}
    val seedCol = s"_seed_$out"
    val withV = parted.withColumn(s"_v_$out", value)
    val v = col(s"_v_$out")
    val sumType = withV.select(sum(v).as("_s")).schema.head.dataType
    val totals = withV.groupBy(col("_pid")).agg(sum(v).as("_s"))
      .collect()
      .map(r => (r.getInt(0), r.get(1)))
      .sortBy(_._1)
    val seeds = sumType match {
      case _: DecimalType =>
        var running = java.math.BigDecimal.ZERO
        totals.map { case (pid, s) =>
          val seed = running
          if (s != null)
            running = running.add(s.asInstanceOf[java.math.BigDecimal])
          org.apache.spark.sql.Row(pid, seed)
        }
      case LongType | IntegerType =>
        var running = 0L
        totals.map { case (pid, s) =>
          val seed = running
          if (s != null) running += s.asInstanceOf[Number].longValue()
          org.apache.spark.sql.Row(pid, java.lang.Long.valueOf(seed))
        }
      case t => throw new IllegalArgumentException(
        s"withGlobalCumSum needs a decimal or integral value column, got $t")
    }
    val seedField = sumType match {
      case d: DecimalType => StructField(seedCol, d)
      case _ => StructField(seedCol, LongType)
    }
    val spark = parted.sparkSession
    val seedDf = spark.createDataFrame(
      java.util.Arrays.asList(seeds: _*),
      StructType(Seq(StructField("_pid", DataTypes.IntegerType), seedField)))
    val w = Window.partitionBy("_pid").orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withV
      .join(broadcast(seedDf), Seq("_pid"), "left")
      .withColumn(out, col(seedCol) + sum(v).over(w))
      .drop(seedCol, s"_v_$out")
  }

  /** `df` plus `out` = running MAX of `value` in `sortCols` order (inclusive
    * of the current row) — the distributed form of `max(value).over(
    * Window.orderBy(...).rowsBetween(unboundedPreceding, currentRow))`.
    * Same decomposition as [[withGlobalCumSum]], with the partition seeds
    * being the prefix-MAX of strictly-earlier partitions' maxima (the
    * Skyline boundary-seed construction for an arbitrary long column).
    */
  def withGlobalCumMax(
      df: DataFrame,
      sortCols: Seq[Column],
      value: Column,
      out: String,
      partitions: Int = 32): DataFrame = {
    import org.apache.spark.sql.types.{DataTypes, LongType, StructField, StructType}
    requireNoScratchColumns(df)
    val parted = df
      .repartitionByRange(partitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_v", value.cast("long"))
      .localCheckpoint(false)
    val totals = parted.groupBy(col("_pid")).agg(max(col("_v")).as("_m"))
      .collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .sortBy(_._1)
    var running: Option[Long] = None
    val seeds = totals.map { case (pid, m) =>
      val seed = running
      running = (running.toSeq ++ m.toSeq).reduceOption((a, b) => math.max(a, b))
      org.apache.spark.sql.Row(pid, seed.map(java.lang.Long.valueOf).orNull)
    }
    val seedDf = df.sparkSession.createDataFrame(
      java.util.Arrays.asList(seeds: _*),
      StructType(Seq(StructField("_pid", DataTypes.IntegerType),
        StructField("_seed", LongType))))
    val w = Window.partitionBy("_pid").orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parted
      .join(broadcast(seedDf), Seq("_pid"), "left")
      .withColumn(out, greatest(coalesce(col("_seed"), lit(Long.MinValue)),
        max(col("_v")).over(w)))
      .drop("_pid", "_seed", "_v")
  }

  /** Shared scaffold: range-partitioned, partition-sorted, pid-stamped frame,
    * the broadcast (pid → strictly-earlier row count) offset table, and the
    * total row count (a free by-product of the offset pass).
    */
  private def rankScaffold(
      df: DataFrame,
      sortCols: Seq[Column],
      partitions: Int): (DataFrame, DataFrame, Long) = {
    requireNoScratchColumns(df)
    val parted = df
      .repartitionByRange(partitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(false)
    val counts = parted.groupBy(col("_pid")).count().collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    val offsets = {
      var running = 0L
      counts.map { case (pid, c) =>
        val o = running; running += c; (pid, o)
      }
    }
    val spark = df.sparkSession
    import spark.implicits._
    (parted, offsets.toSeq.toDF("_pid", "_off"), counts.map(_._2).sum)
  }

  /** The decomposition stamps scratch columns onto the input; a caller
    * column with one of these names would be silently clobbered or joined
    * against — refuse loudly instead.
    */
  private def requireNoScratchColumns(df: DataFrame): Unit = {
    val scratch = Set("_pid", "_off", "_seed", "_v", "_grank")
    val clash = df.columns.filter(scratch)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with Ranking scratch columns $scratch")
  }
}
