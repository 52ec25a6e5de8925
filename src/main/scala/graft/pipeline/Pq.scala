package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for vector search — the memory-compression
  * scale path beyond int8: each vector is split into `m` subvectors, each
  * subvector replaced by the id of its nearest codebook centroid, so a
  * 64-dim float32 vector becomes `m` small codes (here 8 bytes — 32×
  * smaller). Probes score candidates with an Asymmetric Distance
  * Computation (ADC) lookup table instead of touching raw vectors.
  * Extends the vector capability the reference dropped in v0.0.16
  * (/root/reference/CHANGELOG.md:11-16) with the standard IVF-PQ
  * compression companion (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011).
  *
  * EVERY arithmetic step is exact integer math in a fixed-point domain
  * (component → floor(x·10⁶) as BIGINT), including codebook TRAINING:
  * Lloyd iterations assign by exact squared-L2 longs (ties → smaller code)
  * and re-center by floor(sum/count) — sums are < 2⁵³ so the double
  * division is exact and its floor is engine-identical. Training is
  * therefore deterministic across engines, partitionings, and reruns, and
  * the DuckDB oracle replays the ENTIRE pipeline — seeding, every Lloyd
  * round, encoding, ADC — from the base tables, pinning training + index +
  * probe end-to-end by hash.
  *
  * Scale shape (100 TB): the codebook is O(m·K) and broadcasts; encoding
  * is one map-side pass (argmin fold over the broadcast codebook — no
  * shuffle, no K× row fanout); the per-round re-center is one
  * partial-aggregated shuffle of m·K·sub cells. Probing joins the code
  * table against a broadcast O(Q·m·K) lookup table and partial-aggregates
  * Q·N pair distances — the corpus vectors themselves are never read at
  * probe time.
  */
object Pq {

  /** Fixed-point image of a float vector: floor(x·10⁶) per component. */
  def intVec(v: Column): Column =
    transform(v, x => floor(x.cast("double") * lit(1000000.0)))

  /** Exact squared-L2 distance between two long vectors (sequential fold,
    * but integer addition is associative so the order is irrelevant).
    */
  def sqDistL(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, x) => acc + x)

  /** (vec_id, subspace, sv): the `m` fixed-point subvectors of each row. */
  private[graft] def subvectors(
      df: DataFrame, id: Column, vec: Column, m: Int, sub: Int): DataFrame =
    df.select(id.as("vec_id"), intVec(vec).as("iv"))
      .select(col("vec_id"),
        posexplode(transform(sequence(lit(0), lit(m - 1)),
          s => slice(col("iv"), s * lit(sub) + lit(1), lit(sub)))))
      .select(col("vec_id"), col("pos").as("subspace"), col("col").as("sv"))

  /** Nearest-centroid code against the broadcast per-subspace codebook
    * array (sorted by code, strict `<` keeps the smallest code on ties).
    * Map-side — no shuffle, no K× fanout — and codegen'd (PqArgminExpr's
    * fused loop): encoding is the index-build hot path, once per
    * (corpus row × subspace), where an interpreted HOF fold would drop the
    * stage out of whole-stage codegen.
    */
  private def argminCode(sv: Column, cb: Column): Column =
    graft.functions.VectorFunctions.pqArgmin(sv, cb)

  /** Pure-builtin fold twin of [[argminCode]] — same exact-long arithmetic
    * and tiebreak, kept for spec cross-checking the native expression.
    */
  private[graft] def argminCodeFold(sv: Column, cb: Column): Column = {
    val init = struct(lit(Long.MaxValue).as("d"), lit(Int.MaxValue).as("c"))
    aggregate(cb, init, (acc, e) => {
      val d = sqDistL(sv, e.getField("cent"))
      when(d < acc.getField("d"),
        struct(d.as("d"), e.getField("code").as("c"))).otherwise(acc)
    }).getField("c")
  }

  /** Codebook rows (subspace, code, cent) folded to one broadcastable array
    * per subspace, sorted by code (the argmin tiebreak order).
    */
  private def cbArrays(codebook: DataFrame): DataFrame =
    codebook.groupBy("subspace")
      .agg(sort_array(collect_list(struct(col("code"), col("cent")))).as("cb"))

  /** Train per-subspace codebooks with `iters` Lloyd rounds in the exact
    * integer domain. Seeding is deterministic: code c of subspace s starts
    * as subvector s of the corpus row with id == c (ids [0, k) must exist —
    * the caller picks/reassigns ids, the usual deterministic-seed contract).
    * Empty clusters keep their previous centroid. The per-round codebook
    * merge is an O(m·k)-row driver hop (planning-scale, like the layout
    * manifest) that keeps each round's lineage flat.
    */
  def trainCodebook(
      corpus: DataFrame,
      id: Column,
      vec: Column,
      m: Int,
      sub: Int,
      k: Int,
      iters: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sv = subvectors(Dedup.spread(corpus), id, vec, m, sub)

    var cb: Seq[(Int, Int, Seq[Long])] = sv.filter(col("vec_id") < k)
      .select(col("subspace"), col("vec_id").cast("int").as("code"), col("sv"))
      .as[(Int, Int, Seq[Long])].collect().toSeq.sortBy(t => (t._1, t._2))

    for (_ <- 1 to iters) {
      val cbDf = cb.toDF("subspace", "code", "cent")
      val assigned = sv.join(broadcast(cbArrays(cbDf)), "subspace")
        .withColumn("code", argminCode(col("sv"), col("cb")))
      // floor(sum/count): sums stay < 2^53, so the double division is exact
      // and floor() is the true integer floor on any engine
      val means = assigned.select(col("subspace"), col("code"), posexplode(col("sv")))
        .groupBy("subspace", "code", "pos")
        .agg(floor(sum("col").cast("double") / count(lit(1)).cast("double")).as("cj"))
        .groupBy("subspace", "code")
        .agg(transform(sort_array(collect_list(struct(col("pos"), col("cj")))),
          p => p.getField("cj")).as("cent"))
        .as[(Int, Int, Seq[Long])].collect()
        .map(t => (t._1, t._2) -> t._3).toMap
      cb = cb.map { case (s, c, old) => (s, c, means.getOrElse((s, c), old)) }
    }
    cb.toDF("subspace", "code", "cent")
  }

  /** Encode the corpus against a trained codebook: one map-side pass,
    * (vec_id, subspace, code) — the 32×-compressed index payload.
    */
  def encode(
      corpus: DataFrame,
      id: Column,
      vec: Column,
      codebook: DataFrame,
      m: Int,
      sub: Int): DataFrame =
    subvectors(Dedup.spread(corpus), id, vec, m, sub)
      .join(broadcast(cbArrays(codebook)), "subspace")
      .select(col("vec_id"), col("subspace"), argminCode(col("sv"), col("cb")).as("code"))

  /** Build the persisted PQ index: train, then encode, writing `codebook`
    * and `codes` under `path`. The maintenance write an ANN service pays
    * once per ingest; probes read only these two tables. Round-12: the
    * two tables commit as ONE staged version via the engine-wide
    * [[graft.store.VersionedDir]] CAS — a crash or racing rebuild can
    * never leave a codebook from one build beside codes from another.
    */
  def buildIndex(
      corpus: DataFrame,
      id: Column,
      vec: Column,
      path: String,
      m: Int,
      sub: Int,
      k: Int,
      iters: Int): Unit =
    graft.store.VersionedDir.mutate(path) { (_, _) =>
      val cb = trainCodebook(corpus, id, vec, m, sub, k, iters)
      val stage = graft.store.VersionedDir.stageDir(path)
      cb.write.parquet(s"$stage/codebook")
      encode(corpus, id, vec, cb, m, sub)
        .write.parquet(s"$stage/codes")
      Some(stage)
    }

  /** Incremental PQ index maintenance: encode ONLY the new batch against
    * the persisted (frozen) codebook and append its codes — O(batch)
    * ingest, existing codes never re-read or rewritten; sound because
    * encoding is a pure per-vector function of the fixed codebook. The
    * same maintenance contract as the incremental IVF/MinHash indexes:
    * probing the appended index is IDENTICAL to re-encoding the union
    * under that codebook (oracle- and spec-pinned). Codebook drift
    * (retraining on grown corpora) is a rebuild, by design — the codebook
    * is the index's frozen vocabulary.
    */
  def appendToIndex(
      batch: DataFrame,
      id: Column,
      vec: Column,
      path: String,
      m: Int,
      sub: Int): Unit =
    graft.store.VersionedDir.mutate(path) { (_, cur) =>
      val cb = batch.sparkSession.read.parquet(s"$cur/codebook")
      val stage = graft.store.VersionedDir.stageDir(path)
      encode(batch, id, vec, cb, m, sub)
        .write.parquet(s"$stage/codes")
      // carry the committed codebook + prior codes by hardlink: a crashed
      // append leaves the committed version byte-identical (no torn batch),
      // and an append racing another mutation reruns instead of being lost
      graft.store.VersionedDir.adoptTree(
        new java.io.File(s"$cur/codes"), new java.io.File(s"$stage/codes"))
      graft.store.VersionedDir.adoptTree(
        new java.io.File(s"$cur/codebook"), new java.io.File(s"$stage/codebook"))
      Some(stage)
    }

  /** IVF-PQ index build — the flagship billion-scale ANN layout (FAISS's
    * IVFPQ architecture: coarse inverted-file cells × product-quantized
    * residents): every corpus vector is assigned its nearest coarse
    * centroid (cosine, as the IVF index) AND its PQ codes, and the code
    * table is written `partitionBy(centroid_id)` — a probe reads only the
    * nprobe probed cell directories and scores them from codes alone. The
    * corpus raw vectors appear in NO index file: cells + codes are the
    * entire probe-side state (32× smaller than the vectors).
    */
  def buildIvfPqIndex(
      corpus: DataFrame,
      centroids: DataFrame,
      cId: Column,
      cVec: Column,
      centId: Column,
      centVec: Column,
      path: String,
      m: Int,
      sub: Int,
      k: Int,
      iters: Int): Unit =
    graft.store.VersionedDir.mutate(path) { (_, _) =>
      val cb = trainCodebook(corpus, cId, cVec, m, sub, k, iters)
      val stage = graft.store.VersionedDir.stageDir(path)
      cb.write.parquet(s"$stage/codebook")
      centroids.select(centId.as("centroid_id"), centVec.as("centv"))
        .write.parquet(s"$stage/centroids")
      val cells = Similarity.assignToCentroids(
        Dedup.spread(corpus), cId, cVec, centroids, centId, centVec)
      encode(corpus, cId, cVec, cb, m, sub)
        .join(cells, "vec_id")
        .write.partitionBy("centroid_id").parquet(s"$stage/codes")
      Some(stage)
    }

  /** Incremental IVF-PQ maintenance: assign ONLY the new batch to its
    * coarse cells and PQ codes (both pure per-vector functions of the
    * frozen centroid table and codebook) and append into the cell
    * partition directories — O(batch) ingest, existing cells never re-read
    * or rewritten. Probing the appended index is IDENTICAL to a
    * from-scratch encode of the union under the same frozen state
    * (oracle-pinned), the contract shared by the incremental IVF, PQ, and
    * MinHash indexes.
    */
  def appendToIvfPqIndex(
      batch: DataFrame,
      cId: Column,
      cVec: Column,
      path: String,
      m: Int,
      sub: Int): Unit = {
    val spark = batch.sparkSession
    graft.store.VersionedDir.mutate(path) { (_, cur) =>
      val cb = spark.read.parquet(s"$cur/codebook")
      val cent = spark.read.parquet(s"$cur/centroids")
      val cells = Similarity.assignToCentroids(
        Dedup.spread(batch), cId, cVec, cent, col("centroid_id"), col("centv"))
      val stage = graft.store.VersionedDir.stageDir(path)
      encode(batch, cId, cVec, cb, m, sub)
        .join(cells, "vec_id")
        .write.partitionBy("centroid_id").parquet(s"$stage/codes")
      graft.store.VersionedDir.adoptTree(
        new java.io.File(s"$cur/codes"), new java.io.File(s"$stage/codes"))
      graft.store.VersionedDir.adoptTree(
        new java.io.File(s"$cur/codebook"), new java.io.File(s"$stage/codebook"))
      graft.store.VersionedDir.adoptTree(
        new java.io.File(s"$cur/centroids"), new java.io.File(s"$stage/centroids"))
      Some(stage)
    }
  }

  // ── maintenance triple (shared by flat PQ and IVF-PQ) ──────────────────

  /** The IVF-PQ code table's cell partition dirs (empty for flat PQ). */
  private def codeCellDirs(cur: String): Seq[java.io.File] =
    Option(new java.io.File(s"$cur/codes").listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("centroid_id="))
      .toSeq

  /** Operational snapshot of a committed PQ or IVF-PQ index — O(files)
    * driver-side metadata (directory listings + parquet footer row counts
    * via the shared [[graft.store.ParquetMeta]]; no Spark job): code rows
    * (m per vector), total code part files and the worst cell's count
    * (each append hardlink-adopts the old files and writes ~1 new part
    * per touched cell beside them — a flat PQ index is one cell — so
    * files grow per append until a compact folds them and every probe
    * opens them all), plus the committed version.
    */
  final case class PqStats(codeRows: Long, codesFiles: Int,
      maxFilesPerCell: Int, cells: Int, version: Long)

  def pqStats(spark: org.apache.spark.sql.SparkSession,
      path: String): PqStats = {
    val cur = graft.store.VersionedDir.currentDir(path)
    val conf = spark.sparkContext.hadoopConfiguration
    val cells = codeCellDirs(cur)
    val perCell: Seq[Seq[java.io.File]] =
      if (cells.nonEmpty) cells.map(graft.store.ParquetMeta.parquetFiles)
      else Seq(graft.store.ParquetMeta.parquetFiles(
        new java.io.File(s"$cur/codes")))
    PqStats(
      codeRows = perCell.flatten
        .map(graft.store.ParquetMeta.rowCount(conf, _)).sum,
      codesFiles = perCell.map(_.size).sum,
      maxFilesPerCell = perCell.map(_.size).max,
      cells = cells.size,
      version = graft.store.VersionedDir.head(path))
  }

  /** Fold the code table's part files back together — the read-side
    * file-count reset after a run of appends (code rows are untouched, so
    * probes are bit-identical before and after): IVF-PQ cells fold to one
    * file each (one hash-exchange by cell id, the compactIvfIndex shape),
    * a flat PQ table coalesces to `targetFiles` parts. The codebook (and
    * centroids, when present) carry by hardlink — they are immutable
    * between rebuilds — and everything commits as ONE claim through
    * [[graft.store.VersionedDir.compactInto]], which pins the source
    * inside the CAS body for in-place compacts (a rerun against a racing
    * append re-folds the append's codes instead of dropping them).
    */
  def compactPqIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, outPath: String, targetFiles: Int = 8): Unit =
    graft.store.VersionedDir.compactInto(path, outPath) { (cur, stage) =>
      val codes = spark.read.parquet(s"$cur/codes")
      val cells = codeCellDirs(cur)
      if (cells.nonEmpty)
        codes.repartition(math.max(cells.length, 1), col("centroid_id"))
          .write.partitionBy("centroid_id").parquet(s"$stage/codes")
      else
        codes.coalesce(targetFiles).write.parquet(s"$stage/codes")
      graft.store.VersionedDir.adoptTree(
        new java.io.File(s"$cur/codebook"), new java.io.File(s"$stage/codebook"))
      val cents = new java.io.File(s"$cur/centroids")
      if (cents.isDirectory)
        graft.store.VersionedDir.adoptTree(
          cents, new java.io.File(s"$stage/centroids"))
    }

  /** Maintenance policy over [[pqStats]]: compact (in place by default)
    * when any cell's file count passes `maxFilesPerCell` — no-op on a
    * healthy index, so an ingest scheduler calls it unconditionally after
    * appends. `maxFilesPerCell` must exceed the post-compact `targetFiles`
    * (enforced) so the heal-then-no-op loop converges. Returns whether a
    * compact ran.
    */
  def pqMaintainIfNeeded(spark: org.apache.spark.sql.SparkSession,
      path: String, outPath: String = null,
      maxFilesPerCell: Int = 16, targetFiles: Int = 8): Boolean = {
    require(maxFilesPerCell > targetFiles,
      s"maxFilesPerCell ($maxFilesPerCell) must exceed the post-compact " +
        s"targetFiles ($targetFiles) or maintenance re-fires every batch")
    val due = pqStats(spark, path).maxFilesPerCell > maxFilesPerCell
    if (due) compactPqIndex(spark, path,
      Option(outPath).getOrElse(path), targetFiles)
    due
  }

  /** IVF-PQ probe: nprobe coarse cells per query (cosine against the
    * broadcast O(centroids) table), a partition-PRUNED read of exactly
    * those cell directories, then ADC scoring of the resident codes via
    * the broadcast lookup table — candidate set ≈ nprobe/num_centroids of
    * the corpus, per-candidate cost O(m) lookups, raw vectors untouched.
    */
  def ivfPqProbe(
      queries: DataFrame,
      qId: Column,
      qVec: Column,
      indexPath: String,
      k: Int,
      nprobe: Int,
      m: Int,
      sub: Int): DataFrame = {
    val spark = queries.sparkSession
    // resolve the committed version once: the whole probe runs against one
    // consistent snapshot even if a mutation commits mid-read
    val cur = graft.store.VersionedDir.currentDir(indexPath)
    val cb = spark.read.parquet(s"$cur/codebook")
    val cent = broadcast(spark.read.parquet(s"$cur/centroids"))
    val wq = Window.partitionBy("query_id").orderBy(desc("csim"), asc("centroid_id"))
    val probes = queries.select(qId.as("query_id"), qVec.as("qv"))
      .crossJoin(cent)
      .withColumn("csim", Similarity.cosine(col("qv"), col("centv")))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nprobe)
      .select("query_id", "centroid_id")
      .localCheckpoint(false) // cells collected AND joined: compute once
    val cells = probes.select("centroid_id").distinct()
      .collect().map(_.get(0)).toSeq // O(centroids) driver hop, as ivfProbeIndex
    val codes = spark.read.parquet(s"$cur/codes")
      .filter(col("centroid_id").isInCollection(cells)) // partition-pruned scan
    val qsv = subvectors(queries, qId, qVec, m, sub)
      .withColumnRenamed("vec_id", "query_id").withColumnRenamed("sv", "qsv")
    val lut = broadcast(
      qsv.join(cb, "subspace")
        .select(col("query_id"), col("subspace"), col("code"),
          sqDistL(col("qsv"), col("cent")).as("pd")))
    val w = Window.partitionBy("query_id").orderBy(asc("adc_dist"), asc("neighbor_id"))
    codes.join(broadcast(probes), Seq("centroid_id"))
      .join(lut, Seq("query_id", "subspace", "code"))
      .filter(col("query_id") =!= col("vec_id"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(sum("pd").as("adc_dist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "adc_dist")
  }

  /** IVF-PQ probe + exact REFINE (FAISS's refine stage): the compressed ADC
    * ranking supplies a `shortlist`-deep candidate set (raw vectors
    * untouched), then ONLY those O(queries·shortlist) candidates fetch
    * their raw vectors for an exact sequential-fold cosine rerank —
    * recovering most of the recall PQ compression costs at a bounded
    * exact-scoring budget. Both stages deterministic (integer ADC
    * distances, fold cosine, id tie-breaks) → hash-pinned end to end.
    */
  def ivfPqRefine(
      queries: DataFrame,
      qId: Column,
      qVec: Column,
      candidates: DataFrame,
      cId: Column,
      cVec: Column,
      indexPath: String,
      shortlist: Int,
      k: Int,
      nprobe: Int,
      m: Int,
      sub: Int): DataFrame = {
    val short = ivfPqProbe(queries, qId, qVec, indexPath, shortlist, nprobe, m, sub)
      .select("query_id", "neighbor_id")
    val rw = Window.partitionBy("query_id").orderBy(desc("qcos"), asc("neighbor_id"))
    short
      .join(candidates.select(cId.as("neighbor_id"), cVec.as("cvec")), "neighbor_id")
      .join(broadcast(queries.select(qId.as("query_id"), qVec.as("qvec"))), "query_id")
      // codegen'd cosine — bit-identical to the fold twin
      .withColumn("qcos", Similarity.cosine(col("qvec"), col("cvec")))
      .withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** ADC probe of a persisted PQ index: per (query, subspace, code) partial
    * distances form a broadcast O(Q·m·K) lookup table; the code table joins
    * it map-side and partial-aggregates to Q·N pair distances; top-k per
    * query. Raw corpus vectors are never touched. Distances are exact longs
    * end-to-end — ranking is engine/partition-independent.
    */
  def adcProbe(
      queries: DataFrame,
      qId: Column,
      qVec: Column,
      indexPath: String,
      k: Int,
      m: Int,
      sub: Int): DataFrame = {
    val spark = queries.sparkSession
    // one consistent committed snapshot for both tables
    val cur = graft.store.VersionedDir.currentDir(indexPath)
    val cb = spark.read.parquet(s"$cur/codebook")
    val codes = spark.read.parquet(s"$cur/codes")
    val qsv = subvectors(queries, qId, qVec, m, sub)
      .withColumnRenamed("vec_id", "query_id").withColumnRenamed("sv", "qsv")
    val lut = broadcast(
      qsv.join(cb, "subspace")
        .select(col("query_id"), col("subspace"), col("code"),
          sqDistL(col("qsv"), col("cent")).as("pd")))
    val w = Window.partitionBy("query_id").orderBy(asc("adc_dist"), asc("neighbor_id"))
    codes.join(lut, Seq("subspace", "code"))
      .filter(col("query_id") =!= col("vec_id"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(sum("pd").as("adc_dist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "adc_dist")
  }
}
