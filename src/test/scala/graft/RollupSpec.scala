package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Rollup

/** Materialized-rollup contract:
  *  1. merging a rollup at a coarser grain equals aggregating the base table
  *     directly — bit-for-bit (decimal partials);
  *  2. incremental maintenance (O(batch) appendDelta) equals a full rebuild
  *     over base ∪ batch;
  *  3. the reader touches only the summary: scanned rows are bounded by the
  *     grain cardinality (× appends), never the fact-table row count;
  *  4. compactRollup restores one row per grain key without changing results.
  */
class RollupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val dims = Seq("flag", "status")
  private val measures = Seq("qty", "price")

  private def fact(n: Int, seed: Int) =
    (0 until n).map { i =>
      val h = (i * 2654435761L + seed) & 0x7fffffff
      (s"f${h % 3}", s"s${h % 2}", (h % 100).toDouble, (h % 1000) / 4.0)
    }.toDF("flag", "status", "qty", "price")

  private def direct(df: org.apache.spark.sql.DataFrame, by: Seq[String]) =
    df.groupBy(by.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("qty").cast(DecimalType(28, 4))).cast("double").as("sum_qty"),
        sum(col("price").cast(DecimalType(28, 4))).cast("double").as("sum_price"))
      .orderBy(by.map(col): _*)

  test("rollup merge at coarser grain == direct aggregation of the base") {
    val dir = Files.createTempDirectory("rollup").toString + "/r"
    val base = fact(5000, 1)
    Rollup.build(base, dims, measures, dir)
    for (by <- Seq(Seq("flag"), Seq("flag", "status"))) {
      val got = Rollup.query(spark, dir, by, measures).orderBy(by.map(col): _*)
      assert(got.collect().toSeq == direct(base, by).collect().toSeq)
    }
  }

  test("appendDelta (O(batch)) == full rebuild over base ∪ batch; compact keeps results") {
    val dir = Files.createTempDirectory("rollup").toString + "/r"
    val base = fact(5000, 1)
    val batch1 = fact(700, 2)
    val batch2 = fact(300, 3)
    Rollup.build(base, dims, measures, dir)
    Rollup.appendDelta(batch1, dims, measures, dir)
    Rollup.appendDelta(batch2, dims, measures, dir)
    val all = base.union(batch1).union(batch2)
    val got = Rollup.query(spark, dir, Seq("flag"), measures).orderBy("flag")
    assert(got.collect().toSeq == direct(all, Seq("flag")).collect().toSeq)

    // after two appends the summary holds up to 3 rows per key; compaction
    // restores one per key and leaves every merged answer unchanged
    val compacted = dir + "_c"
    Rollup.compactRollup(spark, dir, dims, measures, compacted)
    val perKey = spark.read.parquet(graft.store.VersionedDir.currentDir(compacted)).groupBy(dims.map(col): _*)
      .count().agg(max("count")).as[Long].head()
    assert(perKey == 1L)
    val got2 = Rollup.query(spark, compacted, Seq("flag"), measures).orderBy("flag")
    assert(got2.collect().toSeq == direct(all, Seq("flag")).collect().toSeq)
  }

  test("stats + maintainIfNeeded: file growth re-merges IN PLACE; trigger resets; race-safe") {
    val dir = Files.createTempDirectory("rollup_m").toString + "/r"
    val base = fact(2000, 1)
    val batches = (2 to 5).map(fact(200, _))
    Rollup.build(base, dims, measures, dir)
    batches.foreach(Rollup.appendDelta(_, dims, measures, dir))
    val s1 = Rollup.stats(spark, dir)
    assert(s1.version == 5 && s1.files >= 5,
      s"appends should accumulate part files, got $s1")
    val all = batches.foldLeft(base)(_ union _)
    // gate just below the observed drift => due, heals IN PLACE
    assert(Rollup.maintainIfNeeded(spark, dir, dims, measures,
      maxFiles = s1.files - 1, targetFiles = 1))
    val s2 = Rollup.stats(spark, dir)
    assert(s2.version == 6 && s2.files <= 1 && s2.rows < s1.rows,
      s"in-place compact must coalesce the summary to targetFiles: $s1 -> $s2")
    assert(Rollup.query(spark, dir, Seq("flag"), measures).orderBy("flag")
      .collect().toSeq == direct(all, Seq("flag")).collect().toSeq)
    assert(!Rollup.maintainIfNeeded(spark, dir, dims, measures,
      maxFiles = s1.files - 1, targetFiles = 1))
    assert(graft.store.VersionedDir.head(dir) == 6)
    // converging knobs are enforced: a gate at or below the post-compact
    // file count would re-fire a full rewrite after every batch forever
    intercept[IllegalArgumentException] {
      Rollup.maintainIfNeeded(spark, dir, dims, measures,
        maxFiles = 8, targetFiles = 8)
    }
    // in-place compact racing an appendDelta: the CAS rerun must re-merge
    // the append's rows (pin INSIDE the transaction)
    val late = fact(150, 9)
    var injected = false
    graft.store.VersionedDir.withPreCommitHook(dir, _ =>
      if (!injected) {
        injected = true
        Rollup.appendDelta(late, dims, measures, dir)
      }) {
      Rollup.compactRollup(spark, dir, dims, measures, dir)
    }
    assert(injected)
    assert(Rollup.query(spark, dir, Seq("flag"), measures).orderBy("flag")
      .collect().toSeq ==
      direct(all.union(late), Seq("flag")).collect().toSeq,
      "in-place compact dropped the racing append's rows")
  }

  test("stream-maintained rollups: recursive stats see batch_id partitions; in-place compact refused, cross-root works") {
    val dir = Files.createTempDirectory("rollup_s").toString + "/r"
    val b0 = fact(500, 1)
    val b1 = fact(200, 2)
    Rollup.writeMicroBatch(b0, dims, measures, dir, 0)
    Rollup.writeMicroBatch(b1, dims, measures, dir, 1)
    val s = Rollup.stats(spark, dir)
    assert(s.files >= 2 && s.rows > 0,
      s"recursive stats must count batch_id=N partitions, got $s")
    // in-place compaction would commit a v000001 that query() resolves,
    // orphaning every later micro-batch — must refuse loudly
    intercept[IllegalArgumentException] {
      Rollup.compactRollup(spark, dir, dims, measures, dir)
    }
    // and the maintenance loop rejects the misconfiguration on the FIRST
    // call (healthy or not), not maxFiles batches later mid-stream
    intercept[IllegalArgumentException] {
      Rollup.maintainIfNeeded(spark, dir, dims, measures)
    }
    // cross-root compaction of the stream summary is fine
    val out = dir + "_c"
    Rollup.compactRollup(spark, dir, dims, measures, out)
    assert(Rollup.query(spark, out, Seq("flag"), measures).orderBy("flag")
      .collect().toSeq == direct(b0.union(b1), Seq("flag")).collect().toSeq)
  }

  test("retractDelta (O(batch)) == full rebuild over the survivors, bit-exact") {
    val dir = Files.createTempDirectory("rollup").toString + "/r"
    val base = fact(5000, 7)
    val deleted = base.filter(col("qty") >= 80) // a deterministic delete batch
    val survivors = base.filter(col("qty") < 80)
    Rollup.build(base, dims, measures, dir)
    Rollup.retractDelta(deleted, dims, measures, dir)
    for (by <- Seq(Seq("flag"), Seq("flag", "status"))) {
      val got = Rollup.query(spark, dir, by, measures).orderBy(by.map(col): _*)
      assert(got.collect().toSeq == direct(survivors, by).collect().toSeq,
        s"retract != rebuild at grain $by")
    }
    // retraction after an append composes: add a second batch, delete part
    val batch2 = fact(1000, 9)
    Rollup.appendDelta(batch2, dims, measures, dir)
    val deleted2 = batch2.filter(col("price") < 50)
    Rollup.retractDelta(deleted2, dims, measures, dir)
    val live = survivors.unionByName(batch2.filter(col("price") >= 50))
    val got2 = Rollup.query(spark, dir, Seq("flag"), measures).orderBy("flag")
    assert(got2.collect().toSeq == direct(live, Seq("flag")).collect().toSeq)
  }

  test("a grain key fully retracted merges to n = 0 and vanishes from the read") {
    val dir = Files.createTempDirectory("rollup").toString + "/r"
    val base = Seq(
      ("gone", "s0", 1.0, 2.0), ("gone", "s0", 3.0, 4.0),
      ("kept", "s0", 5.0, 6.0)).toDF("flag", "status", "qty", "price")
    Rollup.build(base, dims, measures, dir)
    Rollup.retractDelta(base.filter(col("flag") === "gone"), dims, measures, dir)
    val rows = Rollup.query(spark, dir, Seq("flag"), measures).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("kept"),
      s"fully-retracted grain key must not appear, got ${rows.toSeq}")
    // and compaction over a summary containing retraction rows (their NULL
    // min/max are ignored by the min/max merge) keeps the same answer
    val cdir = dir + "_c"
    Rollup.compactRollup(spark, dir, dims, measures, cdir)
    val cRows = Rollup.query(spark, cdir, Seq("flag"), measures).collect()
    assert(cRows.map(_.getString(0)).toSeq == Seq("kept"))
  }

  test("reader scans the summary, not the fact table") {
    val dir = Files.createTempDirectory("rollup").toString + "/r"
    val base = fact(20000, 5)
    Rollup.build(base, dims, measures, dir)
    // grain has ≤6 keys, so the merging read's scan must be ≤6 rows — three
    // orders of magnitude under the 20k fact rows.
    val summaryRows = spark.read.parquet(graft.store.VersionedDir.currentDir(dir)).count()
    assert(summaryRows <= 6L)
    val q = Rollup.query(spark, dir, Seq("flag"), measures)
    val scans = q.queryExecution.executedPlan.collectLeaves().map(_.toString)
    assert(scans.forall(_.contains("rollup")), s"unexpected scan: $scans")
  }
}
