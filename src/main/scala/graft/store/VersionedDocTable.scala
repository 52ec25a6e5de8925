package graft.store

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** A persisted SINGLE-TABLE, doc-keyed index under the engine-wide
  * [[VersionedDir]] CAS — the shared shape of the perceptual-hash index
  * (1 row per doc) and the minhash band index (`bands` rows per doc),
  * which had grown as two near-identical copies of the same discipline
  * before this extraction:
  *
  *  - build/append stage O(batch) new rows and hardlink-adopt the rest —
  *    the expensive upstream stage (media decode, shingling + hashing) is
  *    paid exactly once per payload;
  *  - deletes are O(batch) tombstones (`deletes/` beside the data table),
  *    applied at read as ONE anti-join on doc_id — a doc's rows are
  *    key-local, so nothing else needs fixing up;
  *  - the maintenance triple: [[stats]] from parquet footers (O(files),
  *    no Spark job), [[compact]] folding tombstones + coalescing parts,
  *    [[maintainIfNeeded]] gating on deleted fraction / file count with
  *    enforced converging knobs.
  *
  * Multi-table indexes (text postings+doclen, IVF cell dirs, PQ
  * codebook+codes, suffix grams+edges+perdoc+meta) keep their own
  * layouts — this helper owns only the one-table case. Rows must carry a
  * `doc_id` column; doc ids must be new on append (the
  * keep-one-copy-of-every-row contract all persisted indexes share).
  */
object VersionedDocTable {

  /** Build the index: persist `rows` as a fresh committed version. */
  def build(rows: DataFrame, path: String, table: String): Unit = {
    requireDocId(rows)
    VersionedDir.mutate(path) { (_, _) =>
      val stage = VersionedDir.stageDir(path)
      rows.write.parquet(s"$stage/$table")
      Some(stage)
    }
  }

  /** O(batch) incremental maintenance: commit the batch's rows beside the
    * hardlink-adopted prior table (and any live tombstones).
    */
  def append(batch: DataFrame, path: String, table: String): Unit = {
    requireDocId(batch)
    VersionedDir.mutate(path) { (_, cur) =>
      val stage = VersionedDir.stageDir(path)
      batch.write.parquet(s"$stage/$table")
      VersionedDir.adoptTree(
        new java.io.File(s"$cur/$table"), new java.io.File(s"$stage/$table"))
      if (new java.io.File(s"$cur/deletes").isDirectory)
        VersionedDir.adoptTree(
          new java.io.File(s"$cur/deletes"), new java.io.File(s"$stage/deletes"))
      Some(stage)
    }
  }

  /** O(batch) DELETION maintenance: append the deleted doc ids to the
    * tombstone table; the data table is never rewritten.
    */
  def delete(deletedDocs: DataFrame, id: Column, path: String,
      table: String): Unit =
    VersionedDir.mutate(path) { (_, cur) =>
      // Tombstones must carry the DATA table's doc_id type: a blind cast
      // (the pre-round-15 `cast("long")`) against a non-numeric-keyed
      // index yields nulls, the read-side anti-join never matches, and
      // the delete is a silent no-op. Cast only when lossless, else fail
      // fast — a delete that cannot address its keys is a caller bug.
      val spark = deletedDocs.sparkSession
      val keys = deletedDocs.select(id.as("doc_id"))
      val keyType = keys.schema("doc_id").dataType
      val tableType = spark.read.parquet(s"$cur/$table").schema("doc_id").dataType
      require(keyType == tableType ||
          org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(keyType, tableType),
        s"delete keys typed $keyType cannot be losslessly cast to the " +
          s"index's doc_id type $tableType — the tombstone anti-join " +
          "would silently match nothing")
      val stage = VersionedDir.stageDir(path)
      keys.select(col("doc_id").cast(tableType).as("doc_id")).distinct()
        .write.parquet(s"$stage/deletes")
      if (new java.io.File(s"$cur/deletes").isDirectory) {
        val prior = spark.read.parquet(s"$cur/deletes")
        if (prior.schema("doc_id").dataType == tableType)
          VersionedDir.adoptTree(
            new java.io.File(s"$cur/deletes"), new java.io.File(s"$stage/deletes"))
        else {
          // pre-round-15 deletes on a non-long-keyed index blind-cast to
          // long and tombstoned only nulls (matching nothing). Adopting
          // them beside typed tombstones would mix parquet schemas and
          // break the read scan — drop them IF they really were no-ops,
          // refuse loudly otherwise (refusing loses nothing; dropping a
          // live tombstone would resurrect a deleted doc)
          require(prior.filter(col("doc_id").isNotNull).isEmpty,
            s"existing tombstones are typed ${prior.schema("doc_id").dataType} " +
              s"with non-null keys but the data table is $tableType — " +
              "cannot migrate; compact the index first")
        }
      }
      VersionedDir.adoptTree(
        new java.io.File(s"$cur/$table"), new java.io.File(s"$stage/$table"))
      Some(stage)
    }

  /** Read the committed SURVIVORS: one consistent snapshot (version
    * resolved once), tombstones applied as a single anti-join. The
    * tombstone side is an unbounded corpus fraction at scale, so the join
    * is left to AQE (broadcast when actually small).
    */
  def read(spark: SparkSession, path: String, table: String): DataFrame = {
    val cur = VersionedDir.currentDir(path)
    val data = spark.read.parquet(s"$cur/$table")
    val delDir = new java.io.File(s"$cur/deletes")
    if (delDir.isDirectory)
      data.join(spark.read.parquet(delDir.toString).select("doc_id").distinct(),
        Seq("doc_id"), "left_anti")
    else data
  }

  /** Operational snapshot — O(files) footer/dir metadata, no Spark job
    * (the shared [[ParquetMeta]] backbone): data rows, tombstone rows (an
    * upper bound on live tombstones — re-deleting a doc adds a row),
    * per-table file counts (each append adds ~1 data part; every read
    * opens them all until a compact folds them), committed version.
    * `deletedFraction(rowsPerKey)` estimates the tombstoned share when
    * every doc contributes exactly `rowsPerKey` rows (1 for phash,
    * `bands` for the minhash index).
    */
  final case class Stats(rowCount: Long, tombstoneCount: Long,
      dataFiles: Int, deleteFiles: Int, version: Long) {
    def deletedFraction(rowsPerKey: Int = 1): Double =
      if (rowCount <= 0) 0.0
      else tombstoneCount * rowsPerKey.toDouble / rowCount
  }

  def stats(spark: SparkSession, path: String, table: String): Stats = {
    val cur = VersionedDir.currentDir(path)
    val conf = spark.sparkContext.hadoopConfiguration
    def parquets(dir: String): Seq[java.io.File] =
      ParquetMeta.parquetFiles(new java.io.File(s"$cur/$dir"))
    def rows(fs: Seq[java.io.File]): Long =
      fs.map(ParquetMeta.rowCount(conf, _)).sum
    val data = parquets(table)
    val deletes = parquets("deletes")
    Stats(
      rowCount = rows(data),
      tombstoneCount = rows(deletes),
      dataFiles = data.size,
      deleteFiles = deletes.size,
      version = VersionedDir.head(path))
  }

  /** Rewrite the table minus its tombstones, coalesced back to
    * `targetFiles` parts (the fresh version carries no deletes table) —
    * equivalent to a rebuild over the survivors WITHOUT re-running the
    * upstream stage. In-place compacts pin their source inside the CAS
    * body (a rerun against a racing append re-pins the append's rows) —
    * the choice [[VersionedDir.compactInto]] encodes once. Rows are
    * narrow fixed-width records, so `targetFiles` stays small even at
    * large corpora; raise it past ~10⁹ docs.
    */
  def compact(spark: SparkSession, path: String, outPath: String,
      table: String, targetFiles: Int = 8): Unit =
    VersionedDir.compactInto(path, outPath) { (cur, stage) =>
      val data = spark.read.parquet(s"$cur/$table")
      val delDir = new java.io.File(s"$cur/deletes")
      val survivors =
        if (delDir.isDirectory)
          data.join(
            spark.read.parquet(delDir.toString).select("doc_id").distinct(),
            Seq("doc_id"), "left_anti")
        else data
      survivors.coalesce(targetFiles).write.parquet(s"$stage/$table")
    }

  /** The maintenance policy, closed over [[stats]]: compact when read
    * costs have drifted — tombstoned fraction past `maxDeletedFraction`
    * (every read anti-joins them and dead rows still occupy scan bytes)
    * or more than `maxDataFiles` data parts (appends accumulate ~1 each).
    * In place by default so the index a scheduler keeps appending into is
    * the one that heals and the trigger resets; compaction achieves
    * ≤ `targetFiles` < `maxDataFiles` (enforced), so the loop converges.
    * No-op on a healthy index — call it unconditionally after ingest
    * batches.
    */
  def maintainIfNeeded(spark: SparkSession, path: String, table: String,
      outPath: String = null, maxDeletedFraction: Double = 0.2,
      maxDataFiles: Int = 64, targetFiles: Int = 8,
      rowsPerKey: Int = 1): Boolean = {
    require(maxDataFiles > targetFiles,
      s"maxDataFiles ($maxDataFiles) must exceed the post-compact " +
        s"targetFiles ($targetFiles) or maintenance re-fires every batch")
    val s = stats(spark, path, table)
    val due = s.deletedFraction(rowsPerKey) > maxDeletedFraction ||
      s.dataFiles > maxDataFiles
    if (due) compact(spark, path, Option(outPath).getOrElse(path), table,
      targetFiles)
    due
  }

  /** Enforce the `doc_id` contract at wiring time, not as a downstream
    * AnalysisException inside a CAS transaction.
    */
  private def requireDocId(rows: DataFrame): Unit =
    require(rows.columns.contains("doc_id"),
      s"VersionedDocTable rows must carry doc_id, got ${rows.columns.toSeq}")
}
