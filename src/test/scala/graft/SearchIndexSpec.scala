package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.SearchIndex

/** Persisted inverted-index laws: planner buckets agree with the engine's
  * md5 bucket column, the probe scan prunes to the probe terms' partition
  * directories, and append ≡ rebuild.
  */
class SearchIndexSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("driver-side planned buckets equal the engine's md5 bucket column") {
    val terms = Seq("spark", "query", "vector", "agg", "zz").toDF("t")
    val engine = terms
      .select(col("t"), SearchIndex.termBucket(col("t"), 16).as("tb"))
      .as[(String, Long)].collect().toMap
    terms.as[String].collect().foreach { t =>
      assert(SearchIndex.plannedBuckets(Seq(t), 16) == Seq(engine(t)),
        s"bucket mismatch for '$t'")
    }
  }

  test("probe prunes the postings scan to the probe terms' buckets; equals inline bm25") {
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("sidx").toString
    SearchIndex.buildIndex(docs, col("doc_id"), col("text"), s"$dir/idx")
    val probes = Seq("spark", "query", "vector")
    val probe = SearchIndex.bm25Probe(spark, s"$dir/idx", probes, topK = 20)
    val rows = probe.as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    // the postings scan must carry a tb partition filter and read fewer
    // files than the full index (checked on the same pruned read the probe
    // issues — AQE wraps the probe's own executed plan)
    val tbs = SearchIndex.plannedBuckets(probes, 16)
    val pruned = spark.read.parquet(graft.store.VersionedDir.currentDir(s"$dir/idx") + "/postings")
      .filter(col("tb").isin(tbs: _*) && col("term").isin(probes: _*))
    assert(pruned.collect().nonEmpty)
    val scan = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.metadata("PartitionFilters").contains("tb"),
      s"no bucket partition filter: ${scan.metadata("PartitionFilters")}")
    val total = spark.read.parquet(graft.store.VersionedDir.currentDir(s"$dir/idx") + "/postings").inputFiles.length
    assert(scan.metrics("numFiles").value < total,
      s"scanned ${scan.metrics("numFiles").value} of $total files - no pruning")
  }

  test("append ≡ rebuild: probing the incrementally-built index equals the full build") {
    val docs = Tables.documents(spark, sf)
    val incDir = java.nio.file.Files.createTempDirectory("sidx_inc").toString
    val allDir = java.nio.file.Files.createTempDirectory("sidx_all").toString
    SearchIndex.buildIndex(docs.filter(col("doc_id") < 30),
      col("doc_id"), col("text"), s"$incDir/idx")
    SearchIndex.appendToIndex(docs.filter(col("doc_id") >= 30),
      col("doc_id"), col("text"), s"$incDir/idx")
    SearchIndex.buildIndex(docs, col("doc_id"), col("text"), s"$allDir/idx")
    val probes = Seq("spark", "query", "vector")
    def run(p: String) = SearchIndex.bm25Probe(spark, p, probes, topK = 20)
      .as[(Long, Long)].collect().toSeq
    assert(run(s"$incDir/idx") == run(s"$allDir/idx"))
  }

  test("delete ≡ rebuild over survivors: tombstoned probe equals the surviving-corpus build") {
    val docs = Tables.documents(spark, sf)
    val delDir = java.nio.file.Files.createTempDirectory("sidx_del").toString
    val survDir = java.nio.file.Files.createTempDirectory("sidx_surv").toString
    val deletePred = col("doc_id") % 5 === 2
    SearchIndex.buildIndex(docs, col("doc_id"), col("text"), s"$delDir/idx")
    SearchIndex.deleteFromIndex(docs.filter(deletePred), col("doc_id"), s"$delDir/idx")
    SearchIndex.buildIndex(docs.filter(!deletePred),
      col("doc_id"), col("text"), s"$survDir/idx")
    val probes = Seq("spark", "query", "vector")
    def run(p: String) = SearchIndex.bm25Probe(spark, p, probes, topK = 20)
      .as[(Long, Long)].collect().toSeq
    val tombstoned = run(s"$delDir/idx")
    assert(tombstoned.nonEmpty)
    // scores must match the survivor rebuild EXACTLY — including the
    // n_docs/avgdl/df statistics shift from the deleted docs
    assert(tombstoned == run(s"$survDir/idx"))
    // no tombstoned doc can surface
    val deletedIds = docs.filter(deletePred).select("doc_id")
      .as[Long].collect().toSet
    assert(tombstoned.forall { case (id, _) => !deletedIds.contains(id) })
    // compaction folds the tombstones in: same probe result, no deletes dir
    val compDir = java.nio.file.Files.createTempDirectory("sidx_comp").toString
    SearchIndex.compactIndex(spark, s"$delDir/idx", s"$compDir/idx")
    assert(!new java.io.File(s"$compDir/idx/deletes").exists())
    assert(run(s"$compDir/idx") == tombstoned)
  }

  test("stats + maintainIfNeeded: tombstone drift heals IN PLACE; trigger resets") {
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("sidx_maint").toString
    val idx = s"$dir/idx"
    val deletePred = col("doc_id") % 3 === 1 // ~33% > the 20% default gate
    SearchIndex.buildIndex(docs, col("doc_id"), col("text"), idx)
    SearchIndex.deleteFromIndex(docs.filter(deletePred), col("doc_id"), idx)
    val n = docs.count()
    val s1 = SearchIndex.stats(spark, idx)
    assert(s1.docCount == n && s1.version == 2)
    assert(s1.deletedFraction > 0.2 && s1.deleteFiles > 0)
    val before = SearchIndex.bm25Probe(spark, idx,
      Seq("spark", "query", "vector"), topK = 20)
      .as[(Long, Long)].collect().toSeq
    // due -> in-place compact: new version of the SAME root, tombstones
    // folded, probe unchanged
    assert(SearchIndex.maintainIfNeeded(spark, idx))
    val s2 = SearchIndex.stats(spark, idx)
    assert(s2.version == 3 && s2.tombstoneCount == 0 && s2.deleteFiles == 0)
    assert(s2.docCount < n, "compacted doclen must drop the tombstoned docs")
    assert(SearchIndex.bm25Probe(spark, idx,
      Seq("spark", "query", "vector"), topK = 20)
      .as[(Long, Long)].collect().toSeq == before)
    // trigger reset: the unconditional per-batch call is now a no-op
    assert(!SearchIndex.maintainIfNeeded(spark, idx))
    assert(graft.store.VersionedDir.head(idx) == 3)
  }

  test("in-place compact racing an append: the CAS rerun re-pins the append's docs") {
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("sidx_race").toString
    val idx = s"$dir/idx"
    SearchIndex.buildIndex(docs.filter(col("doc_id") < 30),
      col("doc_id"), col("text"), idx)
    SearchIndex.deleteFromIndex(docs.filter(col("doc_id") === 7),
      col("doc_id"), idx)
    var injected = false
    graft.store.VersionedDir.withPreCommitHook(idx, _ =>
      if (!injected) {
        injected = true
        SearchIndex.appendToIndex(docs.filter(col("doc_id") >= 30),
          col("doc_id"), col("text"), idx)
      }) {
      SearchIndex.compactIndex(spark, idx, idx)
    }
    assert(injected)
    // the compact rerun re-pinned the racing append's docs AND kept the
    // tombstone folded: equals a fresh build over (all docs minus doc 7)
    val allDir = java.nio.file.Files.createTempDirectory("sidx_race_all").toString
    SearchIndex.buildIndex(docs.filter(col("doc_id") =!= 7),
      col("doc_id"), col("text"), s"$allDir/idx")
    val probes = Seq("spark", "query", "vector")
    def run(p: String) = SearchIndex.bm25Probe(spark, p, probes, topK = 20)
      .as[(Long, Long)].collect().toSeq
    assert(run(idx) == run(s"$allDir/idx"),
      "in-place compact dropped the racing append's docs or the tombstone")
  }
}
