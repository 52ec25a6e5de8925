package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`), reinstating the
  * vector capability the reference dropped in v0.0.16
  * (/root/reference/CHANGELOG.md:11-16) as distributed DataFrame operators.
  *
  * Numeric determinism: all folds are SEQUENTIAL (`aggregate`) over
  * double-cast elements, which both Spark and the DuckDB oracle reproduce
  * bit-exactly (verified: DuckDB `list_reduce` sequential fold == IEEE
  * sequential accumulation; DuckDB's builtin list_cosine_similarity does NOT
  * match and is not used for comparison).
  */
object Similarity {

  /** Sequential-fold dot product of two float vectors, in doubles. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Sequential-fold squared L2 norm. */
  def norm2(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))

  /** Cosine similarity via the native codegen'd expression
    * (graft.functions.CosineSimExpr). Bit-identical to `cosineFold` — the
    * pure-builtin formulation kept for cross-checking — but stays inside
    * WholeStageCodegen instead of interpreting HOF lambdas.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosineSim(a, b)

  /** Sequential-fold cosine from builtins only (reference semantics twin). */
  def cosineFold(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Brute-force cosine top-k: every query row against every candidate, then
    * rank-per-query via window. Correctness baseline — the broadcast side is
    * the QUERY set (assumed small); the candidate scan stays partitioned, so
    * this is one pass over the big table, no shuffle of candidates.
    *
    * Norms are HOISTED out of the query×candidate fan-out: each side's
    * √‖v‖² is a projection evaluated once per ROW below the join, so a pair
    * costs one codegen'd dot loop instead of the fused dot+2-norms loop —
    * with |queries| fan-out, that recomputed every candidate's norm
    * |queries| times (round-10 ANN floor warns). dot/(√nq·√nc) is the same
    * expression tree as CosineSimExpr evaluates fused, so results are
    * bit-identical — PROVIDED query and candidate vectors share one
    * dimension (the corpus contract everywhere in this engine):
    * FloatNorm2Expr folds each side's FULL array, while CosineSimExpr
    * norms only the first min(len_a, len_b) elements, so on ragged inputs
    * the twins diverge.
    */
  def bruteForceTopK(
      queries: DataFrame,
      candidates: DataFrame,
      qId: Column,
      qVec: Column,
      cId: Column,
      cVec: Column,
      k: Int): DataFrame = {
    import graft.functions.VectorFunctions.{floatDot, floatNorm2}
    val q = broadcast(queries.select(qId.as("query_id"), qVec.as("qv"))
      .withColumn("qn", sqrt(floatNorm2(col("qv")))))
    val c = Dedup.spread(candidates).select(cId.as("neighbor_id"), cVec.as("cv"))
      .withColumn("cn", sqrt(floatNorm2(col("cv"))))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        floatDot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cosine"), asc("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Hard-negative mining for contrastive training: per query, the top-k
    * cosine neighbors whose group label DIFFERS from the query's — the
    * nearest non-members, which make the hardest negatives. Same
    * broadcast-queries × partitioned-candidates shape as bruteForceTopK;
    * the label inequality prunes pairs BEFORE scoring (a self-pair shares
    * its own label, so the id-inequality filter is implied).
    */
  def hardNegatives(
      queries: DataFrame,
      candidates: DataFrame,
      qId: Column,
      qVec: Column,
      qGroup: Column,
      cId: Column,
      cVec: Column,
      cGroup: Column,
      k: Int): DataFrame = {
    val q = broadcast(
      queries.select(qId.as("query_id"), qVec.as("qv"), qGroup.as("qg")))
    val c = Dedup.spread(candidates)
      .select(cId.as("neighbor_id"), cVec.as("cv"), cGroup.as("cg"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cosine"), asc("neighbor_id"))
    q.crossJoin(c)
      .filter(col("qg") =!= col("cg"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Int8-quantized brute-force top-k — the memory-bandwidth scale path:
    * vectors are symmetric-quantized to int8 codes ONCE (4× smaller than
    * float32 — at 100 TB the quantized corpus is what fits in cluster page
    * cache), then scored with exact integer dot products fused into
    * whole-stage codegen (IntDotExpr). The ranking score is the cosine of
    * the QUANTIZED codes: per-vector scale cancels in cosine, so quantized
    * cosine tracks true cosine to ~1/127 per component. Every arithmetic
    * step up to the final double division is EXACT integer math, so the
    * result is order/partition/engine-independent by construction.
    */
  def quantizedTopK(
      queries: DataFrame,
      candidates: DataFrame,
      qId: Column,
      qVec: Column,
      cId: Column,
      cVec: Column,
      k: Int): DataFrame = {
    import graft.functions.VectorFunctions.{intDot, quantizeInt8}
    val q = broadcast(
      queries.select(qId.as("query_id"), quantizeInt8(qVec).as("qq"))
        .withColumn("qn", intDot(col("qq"), col("qq"))))
    val c = Dedup.spread(candidates)
      .select(cId.as("neighbor_id"), quantizeInt8(cVec).as("cq"))
      .withColumn("cn", intDot(col("cq"), col("cq")))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      // dot / (sqrt(qn) * sqrt(cn)) — same association as the oracle SQL;
      // inputs are exact integers, so the doubles are engine-identical
      .withColumn("qcos", intDot(col("qq"), col("cq")).cast("double")
        / (sqrt(col("qn").cast("double")) * sqrt(col("cn").cast("double"))))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("qcos"), asc("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** One 32-bit SIGN word of a float vector: bit j set iff
    * vec[from+j] > 0. Two words cover a 64-dim embedding; weights are
    * CAST(round(power(2,j))) — exact for j ≤ 31, and the identical
    * expression tree the DuckDB oracle evaluates.
    */
  def signWord(vec: Column, from: Int): Column =
    aggregate(
      sequence(lit(from), lit(from + 31)),
      lit(0L),
      (acc, i) => acc + when(element_at(vec, i + 1) > lit(0f),
        round(pow(lit(2.0), (i - lit(from)).cast("double"))).cast("long"))
        .otherwise(lit(0L)))

  /** Binary-quantized ANN with exact rerank — the 1-bit compression rung
    * below int8 ([[quantizedTopK]]) and PQ: each vector becomes its 64-bit
    * sign pattern (two longs, 16 bytes — a 16× shrink over float32), the
    * shortlist is the `shortlist` nearest by HAMMING distance (two
    * codegen'd bit_count(xor) ops per pair — the memory-bandwidth scan a
    * 100 TB corpus wants), and only shortlist members are re-scored with
    * exact cosine against raw vectors. Raw candidate vectors are touched
    * for O(queries · shortlist) rows, never during the scan.
    *
    * Determinism: the bit table is an exact function of sign(v_i); Hamming
    * distances are integers (ties → neighbor_id); the rerank cosine is the
    * sequential fold (CosineSimExpr — the codegen'd bit-identical twin).
    * Recall < 1 by construction (sign quantization) — `shortlist` tunes the
    * recall/cost curve. The bit table builds with the native SignWordExpr
    * (one fused loop per row; the builtin [[signWord]] fold is its
    * interpreted cross-check twin and was the scan's per-row bottleneck).
    */
  def hammingRerank(
      queries: DataFrame,
      candidates: DataFrame,
      qId: Column,
      qVec: Column,
      cId: Column,
      cVec: Column,
      shortlist: Int,
      k: Int): DataFrame = {
    import graft.functions.VectorFunctions.signWord32
    val q = broadcast(queries.select(qId.as("query_id"), qVec.as("qvec"))
      .withColumn("q0", signWord32(col("qvec"), 0))
      .withColumn("q1", signWord32(col("qvec"), 32)))
    val cRaw = candidates.select(cId.as("neighbor_id"), cVec.as("cvec"))
    val cBits = Dedup.spread(cRaw)
      .select(col("neighbor_id"),
        signWord32(col("cvec"), 0).as("c0"), signWord32(col("cvec"), 32).as("c1"))
    val hw = Window.partitionBy("query_id").orderBy(asc("hd"), asc("neighbor_id"))
    val short = q.select("query_id", "q0", "q1").crossJoin(cBits)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("hd",
        bit_count(col("q0").bitwiseXOR(col("c0")))
          + bit_count(col("q1").bitwiseXOR(col("c1"))))
      .withColumn("hrank", row_number().over(hw))
      .filter(col("hrank") <= shortlist)
      .select("query_id", "neighbor_id")
    val rw = Window.partitionBy("query_id").orderBy(desc("qcos"), asc("neighbor_id"))
    short
      .join(cRaw, "neighbor_id")
      .join(q.select("query_id", "qvec"), "query_id")
      .withColumn("qcos", cosine(col("qvec"), col("cvec")))
      .withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Random-hyperplane sign bucket: `planes` pseudo-random hyperplanes drawn
    * deterministically from md5(plane#, dim) → ±1 components; bucket = the
    * sign pattern of the projections. Engine-portable LSH for the scale path:
    * candidate generation becomes an equi-join on bucket.
    */
  /** Deterministic ±1 hyperplane component, shared by SignBucketsExpr and
    * OracleSqlGen (so the Spark buckets and the DuckDB oracle buckets come
    * from the same matrix).
    */
  def planeSign(p: Int, i: Int): Double =
    if (Integer.parseInt(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s"plane$p#$i").substring(0, 1), 16) < 8) 1.0
    else -1.0

  /** LSH-bucketed ANN top-k — the scale path: queries and candidates are
    * bucketed by multi-band random-hyperplane signs (one native
    * SignBucketsExpr pass each); only same-bucket pairs are scored. Exact
    * cosine then ranks the candidate set. Candidate generation shuffles ids
    * only; vectors re-join once. Recall < 1 by construction (LSH) — `bands`
    * × `planesPerBand` tune the recall/cost curve.
    */
  def lshTopK(
      queries: DataFrame,
      candidates: DataFrame,
      qId: Column,
      qVec: Column,
      cId: Column,
      cVec: Column,
      k: Int,
      bands: Int = 4,
      planesPerBand: Int = 4): DataFrame = {
    import graft.functions.VectorFunctions.signBuckets
    val qb = queries.select(qId.as("query_id"),
        posexplode(signBuckets(qVec, bands, planesPerBand)))
      .select(col("query_id"), col("pos").as("band"), col("col").as("bucket"))
    val cb = Dedup.spread(candidates).select(cId.as("neighbor_id"),
        posexplode(signBuckets(cVec, bands, planesPerBand)))
      .select(col("neighbor_id"), col("pos").as("band"), col("col").as("bucket"))
    val cand = qb.join(cb, Seq("band", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .distinct()
    val qv = queries.select(qId.as("query_id"), qVec.as("qv"))
    val cv = candidates.select(cId.as("neighbor_id"), cVec.as("cv"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cosine"), asc("neighbor_id"))
    cand.join(qv, "query_id").join(cv, "neighbor_id")
      .withColumn("cosine", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** IVF-style ANN: assign every candidate to its nearest centroid once
    * (pre-partitioning ≈ the index build), probe only `nprobe` centroid
    * buckets per query. At 100 TB the candidate table is bucketed/partitioned
    * by centroid_id on disk so a probe reads only matching partitions.
    */
  def assignToCentroids(
      vectors: DataFrame,
      id: Column,
      vec: Column,
      centroids: DataFrame,
      centId: Column,
      centVec: Column): DataFrame = {
    val c = broadcast(centroids.select(centId.as("centroid_id"), centVec.as("cv")))
    val scored = vectors.select(id.as("vec_id"), vec.as("v"))
      .crossJoin(c)
      .withColumn("sim", cosine(col("v"), col("cv")))
    val w = Window.partitionBy("vec_id").orderBy(desc("sim"), asc("centroid_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("centroid_id"))
  }

  /** Full IVF search: the corpus is pre-assigned to its nearest centroid
    * (`assignToCentroids` ≈ the index build); each query probes only its
    * `nprobe` nearest centroids and scores ONLY the corpus vectors assigned
    * there — the candidate set shrinks by ≈ nprobe/num_centroids vs
    * brute force. At 100 TB the assigned corpus is bucketed by centroid_id
    * on disk, so a probe reads only matching partitions; centroids
    * broadcast. Recall < 1 by construction (a true neighbor can live in an
    * unprobed cell); `nprobe` tunes the recall/cost curve.
    */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      centroids: DataFrame,
      qId: Column,
      qVec: Column,
      cId: Column,
      cVec: Column,
      centId: Column,
      centVec: Column,
      k: Int,
      nprobe: Int = 2): DataFrame = {
    val assigned = assignToCentroids(
        Dedup.spread(corpus), cId, cVec, centroids, centId, centVec)
      .withColumnRenamed("vec_id", "neighbor_id")
    val cent = broadcast(centroids.select(centId.as("centroid_id"), centVec.as("centv")))
    val wq = Window.partitionBy("query_id").orderBy(desc("csim"), asc("centroid_id"))
    val probes = queries.select(qId.as("query_id"), qVec.as("qv"))
      .crossJoin(cent)
      .withColumn("csim", cosine(col("qv"), col("centv")))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nprobe)
      .select("query_id", "centroid_id")
    // each corpus vector lives in exactly one cell and probes are distinct
    // per (query, centroid), so no dedup pass is needed
    val cand = probes.join(assigned, Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
    val qv = queries.select(qId.as("query_id"), qVec.as("qv"))
    val cv = corpus.select(cId.as("neighbor_id"), cVec.as("cv"))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("neighbor_id"))
    cand.join(qv, "query_id").join(cv, "neighbor_id")
      .withColumn("cosine", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  // ── persisted-IVF commit protocol ──────────────────────────────────────
  // Round-12: every IVF mutation commits through the ENGINE-WIDE
  // optimistic-CAS versioned-directory protocol
  // ([[graft.store.VersionedDir]] — the GraphStore manifest discipline
  // generalized to all persisted indexes): pin the head committed version,
  // stage a complete new version (changed cells written, untouched cells
  // hardlink-adopted), claim v(base+1) by atomic rename — of two racing
  // mutators exactly one wins and the loser reruns; a crash leaves the
  // committed version byte-identical. Readers resolve the head version
  // dir once and read immutable files.

  import graft.store.VersionedDir

  /** Current committed version dir; legacy un-versioned layouts resolve
    * to the root itself.
    */
  private[graft] def ivfCurrentDir(path: String): String =
    VersionedDir.currentDir(path)

  private def cellDirs(dir: String): Array[java.io.File] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("centroid_id="))

  /** The index's OWN committed centroid table `(centroid_id, centv)`,
    * when present. Round-15 builds persist it under `_centroids` (the
    * underscore keeps it invisible to `spark.read.parquet(versionDir)`'s
    * partition discovery), because a hot-cell SPLIT mints NEW child
    * centroids the caller's original table cannot know about — after the
    * first split, the index's centroid set is no longer the built one.
    * Every index-reading operation prefers this table and falls back to
    * the caller-supplied centroids for pre-round-15 indexes (which can
    * never have split, so the caller's table is still exact for them).
    */
  private[pipeline] def centroidsFor(
      spark: org.apache.spark.sql.SparkSession, versionDir: String,
      fallback: => DataFrame): DataFrame = {
    val d = new java.io.File(versionDir, "_centroids")
    if (d.isDirectory) spark.read.parquet(d.toString) else fallback
  }

  /** Normalize a caller-supplied centroid table to the persisted
    * `(centroid_id, centv)` shape.
    */
  private def centShape(centroids: DataFrame, centId: Column,
      centVec: Column): DataFrame =
    centroids.select(centId.as("centroid_id"), centVec.as("centv"))

  private def adoptCentroids(cur: String, stage: java.io.File): Unit = {
    val d = new java.io.File(cur, "_centroids")
    if (d.isDirectory)
      VersionedDir.adoptTree(d, new java.io.File(stage, "_centroids"))
  }

  /** PERSISTED IVF index build: the corpus, pre-assigned to its nearest
    * centroid, written `partitionBy(centroid_id)` WITH its vectors — the
    * index is self-contained, probes never touch the corpus table again.
    * This is the maintenance write an ANN service pays once per ingest
    * (the disk-layout form of [[assignToCentroids]]'s comment); at 100 TB
    * each cell is its own partition directory, so a probe's cell list
    * prunes the scan to nprobe/num_centroids of the data. The build stages
    * a fresh complete version and claims the next slot via [[ivfMutate]] —
    * rebuilding over a live index never disturbs its readers.
    */
  def buildIvfIndex(
      corpus: DataFrame,
      centroids: DataFrame,
      cId: Column,
      cVec: Column,
      centId: Column,
      centVec: Column,
      path: String): Unit =
    VersionedDir.mutate(path) { (_, _) =>
      val assigned = assignToCentroids(
          Dedup.spread(corpus), cId, cVec, centroids, centId, centVec)
        .withColumnRenamed("vec_id", "neighbor_id")
      val stage = VersionedDir.stageDir(path)
      corpus.select(cId.as("neighbor_id"), cVec.as("cv"))
        .join(assigned, "neighbor_id")
        .write.partitionBy("centroid_id").parquet(stage.toString)
      // persist the centroid table INSIDE the index (one tiny file) so
      // hot-cell splits can evolve it — see [[centroidsFor]]
      centShape(centroids, centId, centVec)
        .coalesce(1).write.parquet(s"$stage/_centroids")
      Some(stage)
    }

  /** Incremental IVF index maintenance: assign ONLY the new batch to its
    * cells — O(batch) data I/O, the same maintenance contract as the
    * incremental MinHash band index. Probing the appended index is
    * IDENTICAL to probing a from-scratch rebuild over the union (oracle-
    * and spec-pinned), because cell assignment is a pure per-vector
    * function of the fixed centroids.
    *
    * Round-12: appends go through the SAME staged-version CAS as every
    * other mutation instead of `mode("append")` into the committed dir —
    * the batch's cells write new part files into the stage, every existing
    * cell's files are hardlink-adopted beside them (metadata-only), and
    * the stage claims v(base+1). So: a crashed append leaves the committed
    * version byte-identical (no torn batch), an append racing a
    * delete/merge/build is never silently dropped (one side reruns), and
    * [[diffIvfVersions]] audits appends like any other mutation.
    */
  def appendToIvfIndex(
      batch: DataFrame,
      centroids: DataFrame,
      cId: Column,
      cVec: Column,
      centId: Column,
      centVec: Column,
      path: String): Unit =
    VersionedDir.mutate(path) { (_, curDir) =>
      val spark = batch.sparkSession
      // resolved INSIDE the transaction: a rerun against a racing SPLIT
      // must route the batch under the split's child centroids
      val cents = centroidsFor(spark, curDir,
        centShape(centroids, centId, centVec))
      val assigned = assignToCentroids(
          Dedup.spread(batch), cId, cVec, cents,
          col("centroid_id"), col("centv"))
        .withColumnRenamed("vec_id", "neighbor_id")
      val stage = VersionedDir.stageDir(path)
      batch.select(cId.as("neighbor_id"), cVec.as("cv"))
        .join(assigned, "neighbor_id")
        .write.partitionBy("centroid_id").parquet(stage.toString)
      // carry the whole previous version by link: cells the batch touched
      // gain the old files beside the new ones, untouched cells carry over
      cellDirs(curDir).foreach(d =>
        VersionedDir.adoptTree(d, new java.io.File(stage, d.getName)))
      adoptCentroids(curDir, stage)
      Some(stage)
    }

  /** DELETION maintenance for the persisted IVF index — cell-pruned eager
    * rewrite, NOT a tombstone: a deleted vector's cell is a pure function
    * of the fixed centroids, so the rewrite reads and rewrites ONLY the
    * affected cell directories (anti-join on vec id inside them), leaving
    * every other cell untouched and the probe path completely unchanged —
    * delete cost ∝ affected cells, probe pays nothing. (Contrast
    * SearchIndex.deleteFromIndex: text postings spread one doc across many
    * term buckets, so there tombstones win; IVF postings are one-cell-per-
    * vector, so here the pruned rewrite wins.) Survivors of the affected
    * cells are staged into the next version dir, untouched cells are
    * hardlink-adopted (metadata-only), and `_IVF_MANIFEST` flips once — a
    * concurrent probe never observes a missing or half-rewritten cell, and
    * a crash at any point leaves the committed version intact (round-10
    * advice: the old rmTree-then-move swap had a window that silently
    * dropped a cell). A cell whose vectors are ALL deleted simply is not
    * staged, so it is absent from the new version (a dynamic partition
    * overwrite would silently keep it).
    */
  def deleteFromIvfIndex(
      deleted: DataFrame,
      centroids: DataFrame,
      cId: Column,
      cVec: Column,
      centId: Column,
      centVec: Column,
      path: String): Unit = {
    val spark = deleted.sparkSession
    VersionedDir.mutate(path) { (_, curDir) =>
      // the affected-cell set is a pure function of the committed
      // centroids — resolved INSIDE the transaction since round 15, so a
      // rerun against a racing SPLIT re-derives cells under the split's
      // child centroids instead of addressing a retired parent cell
      val assigned = assignToCentroids(
        Dedup.spread(deleted), cId, cVec,
        centroidsFor(spark, curDir, centShape(centroids, centId, centVec)),
        col("centroid_id"), col("centv"))
      val cells = assigned.select("centroid_id").distinct()
        .collect().map(_.get(0)).toSeq // O(affected cells) driver hop
      if (cells.isEmpty) None
      else {
        val affected = cells.map(c => s"centroid_id=$c").toSet
        val delIds = deleted.select(cId.cast("long").as("del_id")).distinct()
        val survivors = spark.read.parquet(curDir)
          .filter(col("centroid_id").isInCollection(cells)) // partition-pruned
          .join(broadcast(delIds), col("neighbor_id") === col("del_id"), "left_anti")
          .drop("del_id")
        // stage the next version: rewritten survivors of the affected cells
        // (the only data I/O — ∝ affected cells), then untouched cells
        // adopted by hardlink (metadata-only)
        val stage = VersionedDir.stageDir(path)
        survivors.write.partitionBy("centroid_id").parquet(stage.toString)
        cellDirs(curDir).filterNot(d => affected(d.getName))
          .foreach(d => VersionedDir.adoptTree(d, new java.io.File(stage, d.getName)))
        adoptCentroids(curDir, stage)
        Some(stage)
      }
    }
  }

  /** MERGE two persisted IVF indexes that share centroids — cell-wise FILE
    * ADOPTION, zero data I/O: because a vector's cell is a pure function
    * of the (shared, fixed) centroids, the same `centroid_id=` partition
    * of both indexes holds rows of the same cell, so merging is moving
    * `src`'s parquet files into `dest`'s matching cell dirs (creating
    * cells `dest` lacks). Cost is O(files) driver metadata ops — merging
    * two 50 TB indexes touches no vector bytes, the same economics as
    * adopting a finished ingest partition into a warehouse table. Probing
    * the merged index is byte-identical to probing a from-scratch build
    * over the union (spec- and oracle-pinned). `src` is consumed.
    *
    * The adoption stages the NEXT version of `dest` (BOTH sides carried by
    * hardlink — src's committed version is never mutated either) and
    * claims it via the [[ivfMutate]] CAS; `src` is deleted only after the
    * commit. A crash at any point therefore loses nothing: before the
    * claim, dest's committed version and the whole of src are intact and
    * the stage is an orphan of links; after it, both indexes are valid and
    * re-running the merge just stages a fresh next version (idempotent —
    * writer-UUID part names make a same-name file the same bytes, so the
    * re-link skips).
    */
  def mergeIvfIndexes(srcPath: String, destPath: String): Unit = {
    val srcCur = ivfCurrentDir(srcPath)
    VersionedDir.mutate(destPath) { (_, destCur) =>
      val stage = VersionedDir.stageDir(destPath)
      cellDirs(destCur).foreach(d =>
        VersionedDir.adoptTree(d, new java.io.File(stage, d.getName)))
      // src's files are HARDLINKED into the stage, never moved: src's
      // committed version stays intact until the commit lands
      cellDirs(srcCur).foreach(cell =>
        VersionedDir.adoptTree(cell, new java.io.File(stage, cell.getName)))
      // shared-centroid contract: an index that has SPLIT refuses to
      // merge — its centroid set diverged, so same-named cells no longer
      // hold the same key range. Two checks: (a) when both sides carry a
      // table, the FULL rows must match (two independent splits can mint
      // the same child IDS with different vectors — ids alone would pass);
      // (b) whichever table carries must cover every cell dir of BOTH
      // sides, else that cell becomes unreachable (probes derive their
      // candidate cells from the centroid table).
      val s = org.apache.spark.sql.SparkSession.active
      def centRows(dir: String): Option[Seq[(String, Seq[Float])]] =
        if (!new java.io.File(dir, "_centroids").isDirectory) None
        else Some(s.read.parquet(s"$dir/_centroids")
          .select(col("centroid_id").cast("string"), col("centv"))
          .collect().map(r => (r.getString(0), r.getSeq[Float](1)))
          .sortBy(_._1).toSeq)
      val destTbl = centRows(destCur)
      val srcTbl = centRows(srcCur)
      require(destTbl.isEmpty || srcTbl.isEmpty || destTbl == srcTbl,
        "mergeIvfIndexes requires both indexes to carry the same centroid " +
          "table (ids AND vectors) — one has split since its build; " +
          "rebuild over the union instead")
      destTbl.orElse(srcTbl).foreach { tbl =>
        val tblIds = tbl.map(_._1).toSet
        val dirIds = (cellDirs(destCur) ++ cellDirs(srcCur))
          .map(_.getName.stripPrefix("centroid_id=")).toSet
        require(dirIds.subsetOf(tblIds),
          s"mergeIvfIndexes: cells ${(dirIds -- tblIds).mkString(", ")} are " +
            "not addressed by the carried centroid table — one side has " +
            "split since its build; rebuild over the union instead")
      }
      // mixed vintages: ONE side's table carries (equal when both exist —
      // checked above; adopting both would union the rows)
      if (destTbl.isDefined) adoptCentroids(destCur, stage)
      else adoptCentroids(srcCur, stage)
      Some(stage)
    }
    // consume src only AFTER the merged version is committed
    VersionedDir.rmTree(new java.io.File(srcPath))
  }

  /** Operational snapshot of a committed IVF index — O(files) driver-side
    * metadata (directory listings + parquet footer row counts, no Spark
    * job): cell count, vectors, part-file totals and the worst cell's
    * file count (each append hardlink-adopts the old files and writes new
    * ones beside them, so files/cell grows ~1 per append until a compact
    * folds them; a probe of that cell opens them all).
    */
  final case class IvfStats(cells: Int, vectors: Long, files: Int,
      maxFilesPerCell: Int, maxRowsPerCell: Long, version: Long)

  def ivfStats(spark: org.apache.spark.sql.SparkSession,
      path: String): IvfStats = {
    // ONE resolved version and ONE footer walk feed every field — a
    // commit landing mid-call must not mix two versions' cells/rows
    val perCell = cellWalk(spark, ivfCurrentDir(path))
    val files = perCell.map(_._2)
    val rows = perCell.map(_._3)
    IvfStats(
      cells = perCell.length,
      vectors = rows.sum,
      files = files.sum,
      maxFilesPerCell = if (files.isEmpty) 0 else files.max,
      maxRowsPerCell = if (rows.isEmpty) 0L else rows.max,
      version = VersionedDir.head(path))
  }

  /** Per-cell committed row counts `(cell dir name, rows)` — parquet
    * FOOTER metadata only (O(files), no Spark job), the input to the
    * hot-cell split policy.
    */
  def ivfCellRowCounts(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(String, Long)] =
    cellWalk(spark, ivfCurrentDir(path)).map(c => (c._1, c._3))

  /** One footer walk of one resolved version: (cell name, files, rows)
    * per cell. Null-safe via ParquetMeta: a concurrent commit-GC/vacuum
    * deleting the version mid-walk yields a partial snapshot, never an
    * NPE in the ingest loop.
    */
  private def cellWalk(spark: org.apache.spark.sql.SparkSession,
      versionDir: String): Seq[(String, Int, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    cellDirs(versionDir).toSeq.map { d =>
      val fs = graft.store.ParquetMeta.parquetFiles(d)
      (d.getName, fs.length,
        fs.map(graft.store.ParquetMeta.rowCount(conf, _)).sum)
    }
  }

  /** Fold every cell back to one part file — the read-side file-count
    * reset after a run of appends (rows are untouched, so probes are
    * bit-identical before and after; spec-pinned). Cross-root compacts
    * pin their source OUTSIDE the transaction; in-place (`outPath ==
    * path`) pins INSIDE it so a CAS rerun against a racing append re-pins
    * the append's vectors (the SuffixIndex/SearchIndex compact
    * discipline). One hash-exchange by cell id — each cell lands whole in
    * one task, writes one file.
    */
  def compactIvfIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, outPath: String): Unit =
    VersionedDir.compactInto(path, outPath) { (cur, stage) =>
      val nCells = math.max(cellDirs(cur).length, 1)
      spark.read.parquet(cur)
        .repartition(nCells, col("centroid_id"))
        .write.partitionBy("centroid_id").parquet(stage.toString)
      adoptCentroids(cur, stage)
    }

  /** Split ONE hot cell into two children: a deterministic distributed
    * 2-means over that cell's members only, committed as ONE CAS claim —
    * the two child cell dirs + the updated `_centroids` rows (parent
    * retired, children minted at max(id)+1/+2) staged beside every other
    * cell's hardlink-adopted files. This is the row-growth analog of the
    * suffix index's size-triggered bucket re-split: under sustained skew
    * (every crawl-shard append landing in one cell) file compaction
    * bounds FILE counts but rows-per-cell grow unboundedly, and probe
    * cost is ∝ hot-cell rows. Requires an index that persists its
    * centroids (round-15 builds; pre-15 indexes rebuild first).
    *
    * Determinism: seeds are the vectors of the cell's min/max neighbor
    * ids; per-round means use exact DECIMAL sums (order-independent), so
    * assignment is a pure per-row function each round. Degenerate cells
    * (all members identical → one child empty) are NOT split — returns
    * false without committing, and the maintenance loop marks the cell
    * unsplittable instead of spinning.
    *
    * 100 TB shape: each round is one partition-pruned scan of the single
    * hot cell + a 2×dim aggregate; nothing else is read or written, and
    * the commit carries the rest of the index by O(files) metadata.
    */
  def splitIvfCell(spark: org.apache.spark.sql.SparkSession,
      path: String, cellId: Long, rounds: Int = 4): Boolean = {
    require(rounds >= 1)
    var didSplit = false
    VersionedDir.mutate(path) { (_, cur) =>
      val cdir = new java.io.File(cur, "_centroids")
      require(cdir.isDirectory,
        "splitIvfCell requires an index that persists its centroids " +
          "(round-15 buildIvfIndex does) — rebuild this index first")
      val cellDir = new java.io.File(cur, s"centroid_id=$cellId")
      require(cellDir.isDirectory, s"no committed cell $cellId to split")
      val rows = spark.read.parquet(cellDir.toString).localCheckpoint(false)
      val seeds = rows.orderBy(col("neighbor_id")).limit(1)
        .unionAll(rows.orderBy(col("neighbor_id").desc).limit(1))
        .select("cv").collect().map(_.getSeq[Float](0).toArray)
      val dim = seeds(0).length
      // `assign` drives membership, `means`/`counts` describe the members
      // under the LAST aggregation — the final write re-evaluates `child`
      // with the same `assign` as that aggregation, so the commit's
      // membership, the emptiness check, and the stored child centroids
      // (the final members' means) are mutually consistent
      var assign = Array(seeds(0), seeds(1))
      var means = assign
      var counts = Array(0L, 0L)
      def child = { // nearest of the two assignment centroids, ties → 0
        val c0 = typedlit(assign(0).toSeq)
        val c1 = typedlit(assign(1).toSeq)
        when(cosine(col("cv"), c0) >= cosine(col("cv"), c1), 0).otherwise(1)
      }
      for (r <- 1 to rounds) {
        // exact decimal sums: the mean (→ next round's assignment) never
        // depends on float reduction order across tasks
        val agg = rows.groupBy(child.as("child"))
          .agg(count(lit(1)).as("n"),
            array((0 until dim).map(i =>
              (sum(element_at(col("cv"), i + 1)
                .cast(org.apache.spark.sql.types.DecimalType(38, 10))) /
                count(lit(1))).cast("float")): _*).as("m"))
          .collect()
        counts = Array(0L, 0L)
        means = assign.clone()
        agg.foreach { r =>
          val c = r.getInt(0)
          counts(c) = r.getLong(1)
          means(c) = r.getSeq[Float](2).toArray
        }
        if (r < rounds) assign = means
      }
      if (counts(0) == 0L || counts(1) == 0L) {
        didSplit = false; None // degenerate: all members identical
      } else {
        val centTable = spark.read.parquet(cdir.toString)
        val idType = centTable.schema("centroid_id").dataType
        import org.apache.spark.sql.types._
        val idSpace: Long = idType match {
          case ByteType => Byte.MaxValue
          case ShortType => Short.MaxValue
          case IntegerType => Int.MaxValue
          case LongType => Long.MaxValue
          case t => throw new IllegalArgumentException(
            s"splitIvfCell needs integral centroid ids to mint children, got $t")
        }
        val maxId = centTable.agg(max(col("centroid_id").cast("long")))
          .head().getLong(0)
        require(maxId <= idSpace - 2,
          s"splitIvfCell cannot mint children past $idType's range " +
            s"(max id $maxId) — a narrowing cast would silently wrap")
        val kid = Array(maxId + 1, maxId + 2)
        val stage = VersionedDir.stageDir(path)
        rows.withColumn("centroid_id",
            when(child === 0, lit(kid(0))).otherwise(lit(kid(1))).cast(idType))
          .repartition(2, col("centroid_id"))
          .write.partitionBy("centroid_id").parquet(stage.toString)
        cellDirs(cur).filter(_.getName != s"centroid_id=$cellId")
          .foreach(d => VersionedDir.adoptTree(d, new java.io.File(stage, d.getName)))
        import spark.implicits._
        val kids = Seq((kid(0), means(0).toSeq), (kid(1), means(1).toSeq))
          .toDF("centroid_id", "centv")
          .select(col("centroid_id").cast(idType), col("centv"))
        centTable.filter(col("centroid_id").cast("long") =!= cellId)
          .unionByName(kids)
          .coalesce(1).write.parquet(s"$stage/_centroids")
        didSplit = true
        Some(stage)
      }
    }
    didSplit
  }

  /** Maintenance policy over [[ivfStats]], two gates (round 15 added the
    * second): (a) any cell's FILE count past `maxFilesPerCell` → compact
    * (in place by default); (b) when `maxRowsPerCell` > 0, any cell's ROW
    * count past it → [[splitIvfCell]] the hottest such cell, repeating
    * until every cell fits, a cell proves unsplittable (degenerate), or
    * `maxSplits` is hit. No-op on a healthy index, so schedulers can call
    * it unconditionally after ingest batches. Returns whether anything ran.
    */
  def ivfMaintainIfNeeded(spark: org.apache.spark.sql.SparkSession,
      path: String, outPath: String = null,
      maxFilesPerCell: Int = 16, maxRowsPerCell: Long = 0,
      maxSplits: Int = 8): Boolean = {
    var splits = 0
    if (maxRowsPerCell > 0) {
      val unsplittable = scala.collection.mutable.Set.empty[Long]
      var hot = hotCells(spark, path, maxRowsPerCell, unsplittable)
      while (hot.nonEmpty && splits < maxSplits) {
        if (splitIvfCell(spark, path, hot.head)) splits += 1
        else unsplittable += hot.head
        hot = hotCells(spark, path, maxRowsPerCell, unsplittable)
      }
    }
    val due = ivfStats(spark, path).maxFilesPerCell > maxFilesPerCell
    if (due) compactIvfIndex(spark, path, Option(outPath).getOrElse(path))
    due || splits > 0
  }

  /** Cells (numeric ids only — non-numeric cells cannot mint children)
    * over the row gate, hottest first, minus the known-degenerate set.
    */
  private def hotCells(spark: org.apache.spark.sql.SparkSession,
      path: String, maxRowsPerCell: Long,
      skip: scala.collection.Set[Long]): Seq[Long] =
    ivfCellRowCounts(spark, path)
      .flatMap { case (dir, n) =>
        dir.stripPrefix("centroid_id=").toLongOption.map(id => (id, n))
      }
      .filter { case (id, n) => n > maxRowsPerCell && !skip(id) }
      .sortBy { case (id, n) => (-n, id) }
      .map(_._1)

  /** Membership diff between the committed IVF version and its predecessor
    * — the audit readout the commit protocol makes possible (GC keeps
    * exactly current + previous): which vectors a delete/merge/rebuild/
    * APPEND (round-12: appends stage versions too) added or removed, with
    * their cells. A vector's cell is a pure function of the frozen
    * centroids and rows are immutable, so the diff is two id-level
    * anti-joins over the two version dirs — no vector payloads compared.
    * A fresh index (one version) diffs empty.
    * Returns (change ∈ {added, removed}, neighbor_id, centroid_id).
    */
  def diffIvfVersions(path: String, spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val curName = new java.io.File(ivfCurrentDir(path)).getName
    // previous = the newest version BELOW the committed one (under the CAS
    // protocol every vN dir IS committed — in-flight stages live under
    // _stage_* and never shadow a version id)
    val prev = Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.matches("v\\d{6}") && f.getName < curName)
      .sortBy(_.getName).lastOption
    import spark.implicits._
    prev match {
      case None =>
        Seq.empty[(String, Long, Long)].toDF("change", "neighbor_id", "centroid_id")
      case Some(p) =>
        def ids(dir: String) = spark.read.parquet(dir)
          .select(col("neighbor_id"), col("centroid_id").cast("long").as("centroid_id"))
        val cur = ids(ivfCurrentDir(path))
        val old = ids(p.getPath)
        cur.join(old.select(col("neighbor_id")), Seq("neighbor_id"), "left_anti")
          .select(lit("added").as("change"), col("neighbor_id"), col("centroid_id"))
          .unionByName(
            old.join(cur.select(col("neighbor_id")), Seq("neighbor_id"), "left_anti")
              .select(lit("removed").as("change"), col("neighbor_id"),
                col("centroid_id")))
    }
  }

  /** Probe a persisted IVF index: per-query nprobe nearest cells, then ONE
    * partition-pruned read of exactly those cell directories (the distinct
    * probed-cell list is an O(centroids) driver hop, the same metadata-scale
    * pattern as the stats-manifest prune) and top-k scoring of the
    * candidates found there. Identical output to the inline [[ivfTopK]] —
    * spec-pinned — with the index build amortized across probe batches.
    */
  /** Greedy farthest-point traversal (Gonzalez k-center, the 2-approx): k
    * diverse representatives picked one at a time, each maximizing its
    * squared-L2 distance to the nearest already-selected vector — the
    * embedding analog of max-coverage data selection (pick what the
    * selected set explains WORST). Exact fixed-point integer distances and
    * (dist desc, id) tie-breaks make the traversal engine-deterministic.
    * Each round is one broadcast of ≤ k selected vectors + one argmax over
    * the corpus — O(k·n) distance evaluations total, never quadratic.
    * Returns (step, vec_id, dist_sq) with the seed at dist_sq 0.
    */
  def kCenter(corpus: DataFrame, id: Column, vec: Column,
      k: Int, seed: Long = 0L): DataFrame = {
    require(k >= 1 && k <= 64)
    val spark = corpus.sparkSession
    import spark.implicits._
    val iv = Dedup.spread(corpus)
      .select(id.cast("long").as("vec_id"), Pq.intVec(vec).as("iv"))
      .localCheckpoint(true)
    var sel = Seq(seed)
    var out = Seq((1, seed, 0L))
    for (step <- 2 to k) {
      // selected ids as a broadcast FRAME, not an isin literal: the round
      // plan stays structurally identical as the selection grows (codegen
      // compiles once and caches; a growing literal re-compiles every
      // round and would not survive k in the hundreds — round-7 verdict)
      val selIds = broadcast(sel.map(Tuple1(_)).toDF("sel_id"))
      val selDf = broadcast(
        iv.join(selIds, col("vec_id") === col("sel_id"), "left_semi")
          .select(col("iv").as("siv")))
      val best = iv.join(selIds, col("vec_id") === col("sel_id"), "left_anti")
        .crossJoin(selDf)
        .groupBy("vec_id")
        .agg(min(Pq.sqDistL(col("iv"), col("siv"))).as("dmin"))
        .orderBy(desc("dmin"), asc("vec_id")).limit(1)
        .as[(Long, Long)].collect()
      best.headOption.foreach { case (v, dm) =>
        sel :+= v
        out :+= ((step, v, dm))
      }
    }
    out.toDF("step", "vec_id", "dist_sq")
  }

  def ivfProbeIndex(
      queries: DataFrame,
      indexPath: String,
      centroids: DataFrame,
      qId: Column,
      qVec: Column,
      centId: Column,
      centVec: Column,
      k: Int,
      nprobe: Int = 2): DataFrame = {
    val spark = queries.sparkSession
    // resolve the committed version ONCE — centroids and cells must come
    // from the same snapshot: after a hot-cell split the caller's original
    // table addresses a retired parent cell that no longer exists on disk
    val cur = ivfCurrentDir(indexPath)
    val cent = broadcast(
      centroidsFor(spark, cur, centShape(centroids, centId, centVec)))
    val wq = Window.partitionBy("query_id").orderBy(desc("csim"), asc("centroid_id"))
    val probes = queries.select(qId.as("query_id"), qVec.as("qv"))
      .crossJoin(cent)
      .withColumn("csim", cosine(col("qv"), col("centv")))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nprobe)
      .select("query_id", "centroid_id")
      .localCheckpoint(false) // cells collected AND joined: compute once
    val cells = probes.select("centroid_id").distinct()
      .collect().map(_.get(0)).toSeq
    val idx = spark.read.parquet(cur)
      .filter(col("centroid_id").isInCollection(cells)) // partition-pruned scan
    val cand = probes.join(idx, Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
    val qv = queries.select(qId.as("query_id"), qVec.as("qv"))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("neighbor_id"))
    cand.join(qv, "query_id")
      .withColumn("cosine", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }
}
