package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted text index — the lexical-search analog of the
  * persisted IVF layout: per-(doc, term) postings written
  * `partitionBy(term_bucket)` so a probe reads ONLY the directories its
  * probe terms hash into (md5-derived buckets — any engine, and the
  * driver-side planner below, compute the same bucket for the same term),
  * plus an O(docs) doc-length table. BM25 scoring over the index is the
  * IDENTICAL expression tree the inline query uses, so index-read ≡
  * inline-compute is provable by hash.
  *
  * Scale shape: the index build is one tokenization + one partial-agg
  * shuffle, paid once per ingest; appends are O(batch) (new docs' postings
  * land in their buckets, doc lengths append — nothing rescans the old
  * corpus); probes touch probe_terms/buckets of the postings and the tiny
  * doclen aggregate. Reference behavior: the fuzzy search surface
  * (/root/reference/src/db/client.ts:389-423) served from an index instead
  * of a scan.
  */
object SearchIndex {
  /** md5-derived term bucket — matches [[plannedBuckets]] driver-side. */
  def termBucket(t: Column, buckets: Int): Column =
    conv(substring(md5(t.cast("binary")), 1, 13), 16, 10)
      .cast("long") % buckets

  /** The bucket ids a probe-term list hashes to, computed at PLAN time so
    * the scan's partition filter is a literal IN-list (static pruning).
    */
  def plannedBuckets(probes: Seq[String], buckets: Int): Seq[Long] =
    probes.map { t =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex.take(13), 16) % buckets
    }.distinct

  private def tokenize(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("doc_id"),
        explode(split(lower(text), "[^a-z]+")).as("term"))
      .filter(col("term") =!= "")

  /** Build the index: bucket-partitioned postings + doc-length table.
    * Round-12: both tables commit as ONE staged version via the
    * engine-wide [[graft.store.VersionedDir]] CAS — a crash can never
    * leave postings from one build beside doc lengths from another (the
    * old overwrite pair had exactly that torn window), and racing
    * mutations rerun instead of losing updates.
    */
  def buildIndex(docs: DataFrame, id: Column, text: Column,
      path: String, buckets: Int = 16): Unit =
    graft.store.VersionedDir.mutate(path) { (_, _) =>
      val tok = tokenize(docs, id, text).localCheckpoint(false)
      val stage = graft.store.VersionedDir.stageDir(path)
      tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .withColumn("tb", termBucket(col("term"), buckets))
        .write.partitionBy("tb").parquet(s"$stage/postings")
      tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
        .write.parquet(s"$stage/doclen")
      Some(stage)
    }

  /** O(batch) incremental maintenance: the new docs' postings and lengths
    * commit beside the hardlink-adopted prior tables — the old corpus is
    * never re-tokenized; data I/O is O(batch), adoption is O(files so
    * far) metadata (bounded by [[compactIndex]] on the operator's
    * schedule, the same knob that folds tombstones). Doc ids must be new;
    * re-ingesting an existing doc would double its rows.
    */
  def appendToIndex(newDocs: DataFrame, id: Column, text: Column,
      path: String, buckets: Int = 16): Unit =
    graft.store.VersionedDir.mutate(path) { (_, cur) =>
      val tok = tokenize(newDocs, id, text).localCheckpoint(false)
      val stage = graft.store.VersionedDir.stageDir(path)
      tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .withColumn("tb", termBucket(col("term"), buckets))
        .write.partitionBy("tb").parquet(s"$stage/postings")
      tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
        .write.parquet(s"$stage/doclen")
      // carry the committed tables by hardlink: the batch's bucket dirs
      // gain the old files beside the new ones, untouched buckets carry
      // over whole, and live tombstones survive the append
      graft.store.VersionedDir.adoptTree(
        new java.io.File(s"$cur/postings"), new java.io.File(s"$stage/postings"))
      graft.store.VersionedDir.adoptTree(
        new java.io.File(s"$cur/doclen"), new java.io.File(s"$stage/doclen"))
      if (new java.io.File(s"$cur/deletes").isDirectory)
        graft.store.VersionedDir.adoptTree(
          new java.io.File(s"$cur/deletes"), new java.io.File(s"$stage/deletes"))
      Some(stage)
    }

  /** O(batch) DELETION maintenance: append the deleted doc ids to a
    * tombstone table. A doc's postings are spread across (potentially all)
    * term buckets, so an eager rewrite would touch the whole postings
    * layout per delete; the tombstone is instead applied at probe time as
    * one broadcast anti-join on doc_id (postings are per-doc local — no
    * cross-doc state to fix up), and [[compactIndex]] folds tombstones
    * into the postings on the operator's schedule, bounding probe-side
    * tombstone cost at O(deletes since last compaction).
    */
  def deleteFromIndex(deletedDocs: DataFrame, id: Column, path: String): Unit =
    graft.store.VersionedDir.mutate(path) { (_, cur) =>
      val stage = graft.store.VersionedDir.stageDir(path)
      deletedDocs.select(id.cast("long").as("doc_id")).distinct()
        .write.parquet(s"$stage/deletes")
      if (new java.io.File(s"$cur/deletes").isDirectory)
        graft.store.VersionedDir.adoptTree(
          new java.io.File(s"$cur/deletes"), new java.io.File(s"$stage/deletes"))
      graft.store.VersionedDir.adoptTree(
        new java.io.File(s"$cur/postings"), new java.io.File(s"$stage/postings"))
      graft.store.VersionedDir.adoptTree(
        new java.io.File(s"$cur/doclen"), new java.io.File(s"$stage/doclen"))
      Some(stage)
    }

  /** Rewrite the index minus its tombstones (postings and doc lengths
    * anti-joined on doc_id; the fresh index carries no deletes table) —
    * equivalent to a rebuild over the surviving corpus, without
    * re-tokenizing anything. Cross-root compacts pin their source
    * OUTSIDE the transaction (snapshot semantics); an IN-PLACE compact
    * (`outPath == path`) pins INSIDE it, so a CAS rerun against a racing
    * append re-pins the append's postings instead of silently dropping
    * them (the SuffixIndex.compact discipline).
    */
  def compactIndex(spark: SparkSession, path: String, outPath: String): Unit =
    graft.store.VersionedDir.compactInto(path, outPath) { (cur, stage) =>
      val del = tombstones(spark, cur)
      spark.read.parquet(s"$cur/postings")
        .join(broadcast(del), Seq("doc_id"), "left_anti")
        .write.partitionBy("tb").parquet(s"$stage/postings")
      spark.read.parquet(s"$cur/doclen")
        .join(broadcast(del), Seq("doc_id"), "left_anti")
        .write.parquet(s"$stage/doclen")
    }

  /** Operational snapshot of a committed index — O(files) driver-side
    * metadata (parquet footer row counts, directory listings; no Spark
    * job): ingested docs and tombstone rows (an upper bound on live
    * tombstones — re-deleting a doc adds a row; the exact distinct count
    * would need a scan), postings/doclen/deletes
    * file counts (each append adds ~1 file per touched term bucket plus
    * a doclen part; every probe reads them all until a compact folds
    * them), and the committed version.
    */
  final case class IndexStats(docCount: Long, tombstoneCount: Long,
      postingsFiles: Int, doclenFiles: Int, deleteFiles: Int,
      version: Long) {
    def deletedFraction: Double =
      if (docCount <= 0) 0.0 else tombstoneCount.toDouble / docCount
  }

  def stats(spark: SparkSession, path: String): IndexStats = {
    val cur = graft.store.VersionedDir.currentDir(path)
    val conf = spark.sparkContext.hadoopConfiguration
    def parquets(dir: String): Seq[java.io.File] =
      graft.store.ParquetMeta.parquetFiles(new java.io.File(s"$cur/$dir"))
    def rows(fs: Seq[java.io.File]): Long =
      fs.map(graft.store.ParquetMeta.rowCount(conf, _)).sum
    val doclen = parquets("doclen")
    val deletes = parquets("deletes")
    IndexStats(
      docCount = rows(doclen),
      tombstoneCount = rows(deletes),
      postingsFiles = parquets("postings").size,
      doclenFiles = doclen.size,
      deleteFiles = deletes.size,
      version = graft.store.VersionedDir.head(path))
  }

  /** The maintenance policy, closed over [[stats]]: compact when probe
    * costs have drifted — the tombstoned fraction past
    * `maxDeletedFraction` (every probe anti-joins the tombstones and the
    * dead postings still occupy scan bytes) or more than
    * `maxPostingsFiles` postings part files (appends accumulate one per
    * touched term bucket). In place by default so the index a scheduler
    * keeps appending into is the one that heals and the trigger resets;
    * pass `outPath` for a copy-compact (the caller must then switch to
    * it). Returns whether a compact ran — no-op on a healthy index, so
    * call it unconditionally after ingest batches.
    */
  def maintainIfNeeded(spark: SparkSession, path: String,
      outPath: String = null, maxDeletedFraction: Double = 0.2,
      maxPostingsFiles: Int = 256): Boolean = {
    val s = stats(spark, path)
    val due = s.deletedFraction > maxDeletedFraction ||
      s.postingsFiles > maxPostingsFiles
    if (due) compactIndex(spark, path, Option(outPath).getOrElse(path))
    due
  }

  /** Tombstone table of a RESOLVED version dir (pass `currentDir(path)`). */
  private def tombstones(spark: SparkSession, path: String): DataFrame = {
    val dir = new java.io.File(s"$path/deletes")
    if (dir.isDirectory)
      spark.read.parquet(dir.toString).select("doc_id").distinct()
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType))))
  }

  /** BM25 top-k probe over the persisted index: the postings scan carries
    * a literal bucket IN-list (partition-pruned at plan time) plus the
    * term filter; df/dl/corpus stats and the fixed-point score are the
    * SAME expressions as the inline bm25 path, so the result hash-matches
    * the from-scratch oracle. Tombstoned docs are excluded BEFORE the
    * df/dl/corpus statistics, so a post-delete probe scores exactly as a
    * rebuild over the survivors would.
    */
  def bm25Probe(spark: SparkSession, path: String, probes: Seq[String],
      topK: Int, buckets: Int = 16): DataFrame = {
    val tbs = plannedBuckets(probes, buckets)
    // resolve the committed version once: postings, doc lengths and
    // tombstones all come from ONE consistent snapshot even if a
    // build/append/delete commits mid-probe
    val cur = graft.store.VersionedDir.currentDir(path)
    val del = tombstones(spark, cur)
    val tf = spark.read.parquet(s"$cur/postings")
      .filter(col("tb").isin(tbs: _*) && col("term").isin(probes: _*))
      .select("doc_id", "term", "tf")
      .join(broadcast(del), Seq("doc_id"), "left_anti")
    val dl = spark.read.parquet(s"$cur/doclen")
      .join(broadcast(del), Seq("doc_id"), "left_anti")
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = log((col("n_docs").cast("double") - col("df") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5)) + lit(1.0))
    val tscore = idf * (col("tf").cast("double") * lit(2.2)) /
      (col("tf").cast("double") +
        lit(1.2) * (lit(0.25) + lit(0.75) * col("dl").cast("double") / avgdl))
    tf.join(broadcast(dfT), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        floor(tscore * lit(1000000.0)).cast("long").as("iscore"))
      .groupBy("doc_id").agg(sum("iscore").as("bm25_fp"))
      .orderBy(desc("bm25_fp"), asc("doc_id")).limit(topK)
  }

  /** Fixed-point DCG position weights floor(1e6 / log2(i+1)) for ranks
    * 1..k — computed ONCE in Scala and inlined as literals into both the
    * Spark plan and the DuckDB oracle SQL, so the metric never depends on
    * two engines' log2 agreeing at the last ulp.
    */
  def dcgWeights(k: Int): Seq[Long] =
    (1 to k).map(i => math.floor(1e6 / (math.log(i + 1.0) / math.log(2.0))).toLong)

  /** Retrieval-quality evaluation of a per-(query, doc) scored ranking:
    * nDCG@k, MRR (first top-grade hit) and recall@k of rel ≥ 2 docs, per
    * query. `scored` must carry (query, doc_id, rel, score) where rel is a
    * small integer relevance grade; ranking is (score desc, doc_id asc) —
    * a total order, so the metrics are engine-exact integers (graded DCG
    * in fixed point via [[dcgWeights]]).
    *
    * Scale shape: two row_number windows partitioned by query (each query
    * key is independent — 10⁶ eval queries parallelize as 10⁶ groups) and
    * one per-query aggregate; nothing materializes beyond the candidate
    * postings themselves.
    */
  def rankingEval(scored: DataFrame, query: Column, docId: Column,
      rel: Column, score: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = scored.select(query.as("query"), docId.as("doc_id"),
      rel.as("rel"), score.as("score"))
    val byScore = Window.partitionBy("query")
      .orderBy(desc("score"), asc("doc_id"))
    val byRel = Window.partitionBy("query")
      .orderBy(desc("rel"), asc("doc_id"))
    val w = dcgWeights(k)
    def weightAt(rank: Column): Column =
      w.zipWithIndex.foldLeft(lit(0L)) { case (acc, (wi, i)) =>
        when(rank === (i + 1), lit(wi)).otherwise(acc)
      }
    val r = base
      .withColumn("rnk", row_number().over(byScore))
      .withColumn("irank", row_number().over(byRel))
    r.groupBy("query").agg(
        count(lit(1)).as("n_cand"),
        sum(when(col("rnk") <= k, col("rel") * weightAt(col("rnk")))
          .otherwise(lit(0L))).as("dcg_fp"),
        sum(when(col("irank") <= k, col("rel") * weightAt(col("irank")))
          .otherwise(lit(0L))).as("idcg_fp"),
        min(when(col("rel") === 3, col("rnk"))).as("rank_first_raw"),
        sum(when(col("rel") >= 2, lit(1L)).otherwise(lit(0L))).as("rel2_total"),
        sum(when(col("rel") >= 2 && col("rnk") <= k, lit(1L)).otherwise(lit(0L)))
          .as("rel2_top"))
      .select(col("query"), col("n_cand"),
        col("dcg_fp"), col("idcg_fp"),
        when(col("idcg_fp") === 0, lit(0L))
          .otherwise(expr("dcg_fp * 1000000 div idcg_fp")).as("ndcg_ppm"),
        coalesce(col("rank_first_raw"), lit(0)).cast("long").as("rank_first"),
        when(col("rank_first_raw").isNull, lit(0L))
          .otherwise(expr("1000000 div rank_first_raw")).as("rr_ppm"),
        col("rel2_total"), col("rel2_top"),
        when(col("rel2_total") === 0, lit(0L))
          .otherwise(expr("rel2_top * 1000000 div rel2_total"))
          .as("recall2_ppm"))
  }
}
