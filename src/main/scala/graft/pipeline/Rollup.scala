package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Materialized rollup (summary table) with incremental maintenance — the
  * standard way a 100 TB warehouse avoids rescanning the fact table for every
  * dashboard aggregate.
  *
  * The rollup stores ALGEBRAIC partial aggregates at a declared grain:
  * `dims..., _n (count), _sum_<measure> (exact decimal)`. Any query grouping
  * by a SUBSET of the grain re-aggregates the summary (sum of counts, sum of
  * sums; avg = merged sum / merged n) — the classic partial-aggregate merge,
  * identical in spirit to Spark's own partial/final HashAggregate split but
  * persisted across jobs.
  *
  * Incremental maintenance is append-only: a new batch is aggregated AT THE
  * SAME GRAIN (an O(batch) job — the existing summary is not read) and
  * appended. Duplicate grain rows across appends are merged by the reader's
  * re-aggregation, so maintenance needs no rewrite, no merge-on-write, and no
  * locking beyond the parquet append. A periodic `compactRollup` re-groups
  * the summary back to one row per grain key.
  *
  * Sums are DECIMAL(38,12): order-independent, and exact for measures
  * with ≤ 12 fractional digits (beyond that each row rounds at 1e-12 —
  * still tighter than double accumulation drift at warehouse magnitudes),
  * so rollup-then-merge equals a direct decimal aggregation of the base
  * table bit-for-bit (spec-pinned). `_cnt_<m>` keeps each measure's
  * NON-NULL count so a merged avg(m) = Σ_sum_m / Σ_cnt_m is correct even
  * when the measure column has nulls (count(*) would overcount them).
  */
object Rollup {

  private def sumCol(m: String) = s"_sum_$m"
  private def cntCol(m: String) = s"_cnt_$m"
  private def minCol(m: String) = s"_min_$m"
  private def maxCol(m: String) = s"_max_$m"

  /** Aggregate `df` to the grain and write it as a fresh committed version
    * (round-12: batch-maintained rollups commit via the engine-wide
    * [[graft.store.VersionedDir]] CAS — a torn append of partial rows
    * would silently corrupt every merged sum, the worst failure class of
    * an algebraic summary, so appends stage a complete new version and
    * claim it atomically; readers merge one consistent snapshot).
    * STREAM-maintained rollups ([[writeMicroBatch]]) keep their own
    * batch_id-partition idempotency contract instead — the two layouts
    * are separate usage modes on separate paths.
    */
  def build(df: DataFrame, dims: Seq[String], measures: Seq[String],
      path: String): Unit =
    graft.store.VersionedDir.mutate(path) { (_, _) =>
      val stage = graft.store.VersionedDir.stageDir(path)
      aggregateToGrain(df, dims, measures).write.parquet(stage.toString)
      Some(stage)
    }

  /** O(batch) incremental maintenance: aggregate ONLY the new batch at the
    * grain and commit it beside the hardlink-adopted prior partials.
    * Never reads the existing summary ROWS — data I/O is O(batch). The
    * adoption is O(files so far) METADATA per append (the price of the
    * torn-append safety the old in-place append lacked), so like the
    * probe-side row growth it is bounded by running [[compactRollup]] on
    * the operator's schedule — one maintenance knob covers both.
    */
  def appendDelta(batch: DataFrame, dims: Seq[String], measures: Seq[String],
      path: String): Unit =
    graft.store.VersionedDir.mutate(path) { (_, cur) =>
      val stage = graft.store.VersionedDir.stageDir(path)
      aggregateToGrain(batch, dims, measures).write.parquet(stage.toString)
      graft.store.VersionedDir.adoptTree(new java.io.File(cur), stage)
      Some(stage)
    }

  /** O(batch) DECREMENTAL maintenance: retract a batch of DELETED fact rows
    * by appending their grain aggregate with NEGATED count/sum partials —
    * exact, because decimal sums and counts subtract cleanly (the reader's
    * merge yields precisely the aggregate of the surviving rows, and a
    * grain key whose merged count reaches 0 disappears from `query`).
    * Min/max are SELECTIONS, not accumulations — they are not algebraic
    * under retraction — so the retraction row carries NULL min/max (nulls
    * are ignored by the merge): after a retraction the summary's min/max
    * are conservative BOUNDS (the true min/max of survivors is within
    * them) until the next `build`/`compactRollup` from base re-tightens
    * them. Like appendDelta, never reads the existing summary.
    */
  def retractDelta(deleted: DataFrame, dims: Seq[String], measures: Seq[String],
      path: String): Unit = {
    val negated = aggregateToGrain(deleted, dims, measures)
      .withColumn("_n", -col("_n"))
    val flipped = measures.foldLeft(negated) { (df, m) =>
      df.withColumn(sumCol(m), -col(sumCol(m)))
        .withColumn(cntCol(m), -col(cntCol(m)))
        .withColumn(minCol(m), lit(null).cast(df.schema(minCol(m)).dataType))
        .withColumn(maxCol(m), lit(null).cast(df.schema(maxCol(m)).dataType))
    }
    graft.store.VersionedDir.mutate(path) { (_, cur) =>
      val stage = graft.store.VersionedDir.stageDir(path)
      flipped.write.parquet(stage.toString)
      graft.store.VersionedDir.adoptTree(new java.io.File(cur), stage)
      Some(stage)
    }
  }

  private def aggregateToGrain(df: DataFrame, dims: Seq[String],
      measures: Seq[String]): DataFrame = {
    // min/max partials keep the ORIGINAL measure type: selection, not
    // accumulation, so they are order-independent without a decimal cast
    val aggs = count(lit(1)).as("_n") +:
      (measures.map(m => sum(col(m).cast(DecimalType(38, 12))).as(sumCol(m))) ++
        measures.map(m => count(col(m)).as(cntCol(m))) ++
        measures.map(m => min(col(m)).as(minCol(m))) ++
        measures.map(m => max(col(m)).as(maxCol(m))))
    df.groupBy(dims.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merging read: group the summary by `groupCols` (must be a subset of the
    * build grain) and merge the partials. Output per measure: `sum_<m>`
    * (DOUBLE at the boundary per the portability rule) and `n`.
    */
  def query(spark: SparkSession, path: String, groupCols: Seq[String],
      measures: Seq[String]): DataFrame = {
    // one consistent committed snapshot (stream-maintained batch_id
    // layouts have no version dirs and resolve to the root unchanged)
    val summary = spark.read.parquet(graft.store.VersionedDir.currentDir(path))
    val aggs = sum(col("_n")).as("n") +:
      measures.map(m => sum(col(sumCol(m))).cast("double").as(s"sum_$m"))
    summary.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      // a group fully retracted by retractDelta merges to n = 0 and must
      // not appear (a direct aggregate of the survivors has no such group);
      // append-only summaries never produce n = 0, so this is a no-op there
      .filter(col("n") =!= 0)
  }

  /** One micro-batch of streaming maintenance: the batch's grain aggregate
    * lands in a `batch_id=N` partition dir with overwrite, so a replayed
    * batch (foreachBatch is at-least-once) overwrites its own partition
    * instead of double-counting — effective exactly-once without reading or
    * locking the summary.
    */
  def writeMicroBatch(batch: DataFrame, dims: Seq[String], measures: Seq[String],
      path: String, batchId: Long): Unit =
    aggregateToGrain(batch, dims, measures)
      .write.mode("overwrite").parquet(s"$path/batch_id=$batchId")

  /** Maintain the rollup from a stream: foreachBatch → writeMicroBatch.
    * Readers (`query`) merge across batch partitions by construction.
    */
  def maintainFromStream(stream: DataFrame, dims: Seq[String],
      measures: Seq[String], path: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeMicroBatch(batch, dims, measures, path, batchId)
      }
      .start()

  /** Re-merge appended grain rows back to one row per key (periodic
    * maintenance; bounds summary growth at O(grain), not O(appends)).
    * Cross-root compacts pin their source OUTSIDE the transaction
    * (snapshot semantics); in-place (`outPath == path`) pins INSIDE it,
    * so a CAS rerun against a racing appendDelta re-merges the append's
    * rows instead of silently dropping them (the engine-wide compact
    * discipline — SuffixIndex/SearchIndex/IVF).
    *
    * The compacted summary is COALESCED to `targetFiles` parts: the
    * re-merge shuffle would otherwise write at shuffle-partition
    * parallelism, and on a session without AQE small-partition coalescing
    * that can exceed [[maintainIfNeeded]]'s file gate — the loop would
    * then re-fire a full rewrite after every batch forever. The summary
    * is O(grain) narrow rows by design, so a single-digit file count is
    * right; raise `targetFiles` for billion-grain summaries (and raise
    * the maintenance gate with it).
    */
  def compactRollup(spark: SparkSession, path: String, dims: Seq[String],
      measures: Seq[String], outPath: String, targetFiles: Int = 8): Unit = {
    // A STREAM-maintained summary (maintainFromStream) writes micro-batch
    // partitions `batch_id=N` at the un-versioned root on a fixed path —
    // compacting THAT in place would commit a v000001 that query() then
    // resolves, making every subsequent micro-batch invisible. Refuse
    // loudly; stream summaries compact into a separate root (and the
    // caller repoints readers) or on the stream's own teardown.
    val inPlace = new java.io.File(outPath).getCanonicalPath ==
      new java.io.File(path).getCanonicalPath
    require(!(inPlace && isStreamLayout(path)),
      "in-place compaction of a stream-maintained rollup would orphan " +
        "subsequent micro-batches — compact into a separate root")
    val aggs = sum(col("_n")).as("_n") +:
      (measures.map(m => sum(col(sumCol(m))).as(sumCol(m))) ++
        measures.map(m => sum(col(cntCol(m))).as(cntCol(m))) ++
        measures.map(m => min(col(minCol(m))).as(minCol(m))) ++
        measures.map(m => max(col(maxCol(m))).as(maxCol(m))))
    graft.store.VersionedDir.compactInto(path, outPath) { (cur, stage) =>
      spark.read.parquet(cur)
        .groupBy(dims.map(col): _*).agg(aggs.head, aggs.tail: _*)
        .coalesce(targetFiles)
        .write.parquet(stage.toString)
    }
  }

  /** Operational snapshot — O(files) footer/dir metadata, no Spark job:
    * summary part files (each appendDelta — or stream micro-batch
    * partition — adds at least one; every query re-merges them all) and
    * physical grain rows (> distinct keys once appends pile up unmerged
    * duplicates), plus the committed version. The walk is RECURSIVE so a
    * stream-maintained summary's `batch_id=N` partitions are counted
    * too (a top-level-only listing would report a growing stream summary
    * as permanently healthy).
    */
  final case class RollupStats(files: Int, rows: Long, version: Long)

  def stats(spark: SparkSession, path: String): RollupStats = {
    val cur = graft.store.VersionedDir.currentDir(path)
    val conf = spark.sparkContext.hadoopConfiguration
    val files = graft.store.ParquetMeta.parquetFiles(new java.io.File(cur))
    val rows = files.map(graft.store.ParquetMeta.rowCount(conf, _)).sum
    RollupStats(files.length, rows, graft.store.VersionedDir.head(path))
  }

  private def isStreamLayout(path: String): Boolean =
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .exists(f => f.isDirectory && f.getName.startsWith("batch_id="))

  /** Maintenance policy: re-merge in place (by default) once the summary
    * has accumulated more than `maxFiles` part files — no-op on a healthy
    * summary, so call it unconditionally after ingest batches. Returns
    * whether a compact ran. STREAM-maintained summaries must pass
    * `outPath`: the misconfiguration is rejected on the FIRST call
    * (not `maxFiles` batches later when the gate first trips — a delayed
    * crash in a production loop is worse than a wiring-time one). The
    * gate itself is a pure file COUNT (no footer opens — [[stats]] reads
    * every footer for its row count, which the gate never consults; on a
    * long stream that would be O(batches) ranged reads per call).
    * `maxFiles` must exceed the post-compact `targetFiles` — enforced, so
    * the heal-then-no-op loop converges instead of re-firing forever.
    */
  def maintainIfNeeded(spark: SparkSession, path: String, dims: Seq[String],
      measures: Seq[String], outPath: String = null,
      maxFiles: Int = 16, targetFiles: Int = 8): Boolean = {
    require(outPath != null || !isStreamLayout(path),
      "stream-maintained rollups must maintain into a separate root " +
        "(in-place compaction would orphan later micro-batches)")
    require(maxFiles > targetFiles,
      s"maxFiles ($maxFiles) must exceed the post-compact targetFiles " +
        s"($targetFiles) or maintenance re-fires every batch")
    val cur = graft.store.VersionedDir.currentDir(path)
    val due = graft.store.ParquetMeta
      .parquetFiles(new java.io.File(cur)).size > maxFiles
    if (due) compactRollup(spark, path, dims, measures,
      Option(outPath).getOrElse(path), targetFiles)
    due
  }
}
