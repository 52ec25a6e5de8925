package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Dedup, Similarity}

/** 10×-scale drills for the dedup/ANN scale paths (round-7 verdict item 4,
  * the pipeline mirror of GraphAnalyticsSpec's kCore cascade drill): each
  * test synthesizes a corpus ~10× the sf0.1 table it stands in for, with a
  * planted ground truth, and pins the property that makes the operator
  * 100 TB-viable — candidate pairs from (band, bucket) equi-joins grow
  * NEAR-LINEARLY with corpus size at a fixed dup rate (an all-pairs design
  * would grow quadratically and could still pass every fixed-size
  * correctness spec), and IVF probe recall holds its band when the corpus
  * grows 10× around fixed centroids. Measured counts go into the assertion
  * messages so a regression reports the observed scaling, not just a bool.
  */
class ScaleDrillSpec extends AnyFunSuite with SparkTestBase {

  /** splitmix64 — deterministic pseudo-random stream for synthesis. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** 40 pseudo-random tokens from a 5000-word vocabulary — unique enough
    * that cross-doc shingle collisions are negligible.
    */
  private def docText(base: Long): String =
    (0 until 40).map(j => "w" + math.floorMod(mix(base * 31 + j), 5000))
      .mkString(" ")

  /** Corpus with a planted 5% near-dup rate: every doc with id % 20 == 7 is
    * its predecessor with the last token replaced (shingle Jaccard ≈ 0.85).
    */
  private def synthDocs(n: Long) = {
    import spark.implicits._
    (0L until n).map { i =>
      val dup = i % 20 == 7
      val base = if (dup) i - 1 else i
      val text = if (dup)
        docText(base).split(" ").dropRight(1).mkString(" ") + " x" + i
      else docText(base)
      (i, text)
    }.toDF("doc_id", "text")
  }

  test("minhashLsh drill: candidate pairs grow near-linearly 3k -> 30k docs, planted recall holds") {
    val n1 = 3000L
    val n2 = 30000L // ~6x the sf0.1 documents table
    def run(n: Long): (Long, Double) = {
      val pairs = Dedup.minhashLsh(synthDocs(n), col("doc_id"), col("text"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val planted = (0L until n).filter(_ % 20 == 7).map(i => (i - 1, i)).toSet
      val recall = (pairs & planted).size.toDouble / planted.size
      (pairs.size.toLong, recall)
    }
    val (p1, r1) = run(n1)
    val (p2, r2) = run(n2)
    val ratio = p2.toDouble / p1
    // banded md5 buckets collide only on true signature agreement, so at a
    // fixed dup rate pairs scale with n — a quadratic all-pairs candidate
    // step would show ~100x here
    assert(ratio >= 6 && ratio <= 15,
      s"minhashLsh pairs grew ${p1} -> ${p2} (${f"$ratio%.1f"}x) over a 10x " +
        "corpus — expected near-linear (6x-15x)")
    // 4 bands x 4 rows at Jaccard 0.85: P(pair found) ≈ 0.95 — and the md5
    // lanes make the measured value a fixed function of the corpus
    assert(r1 >= 0.85 && r2 >= 0.85,
      s"planted near-dup recall fell: ${f"$r1%.3f"} @ $n1, ${f"$r2%.3f"} @ $n2")
  }

  test("prefixFilterJaccard drill: EXACT planted pairs at both sizes, candidates near-linear") {
    val n1 = 3000L
    val n2 = 30000L
    def run(n: Long): (Set[(Long, Long)], Long) = {
      val docs = synthDocs(n)
      val pairs = Dedup.prefixFilterJaccard(docs, col("doc_id"), col("text"),
        n = 3, tNum = 1, tDen = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val (_, prefCands) = Dedup.prefixFilterStats(docs, col("doc_id"), col("text"))
      (pairs, prefCands)
    }
    val (pairs1, c1) = run(n1)
    val (pairs2, c2) = run(n2)
    // the filter is LOSSLESS — with negligible cross-doc shingle collisions
    // the result is EXACTLY the planted set, at both sizes (recall drills
    // are for the lossy families; this one pins equality)
    def planted(n: Long) = (0L until n).filter(_ % 20 == 7).map(i => (i - 1, i)).toSet
    assert(pairs1 === planted(n1), s"non-planted or missing pairs at $n1")
    assert(pairs2 === planted(n2), s"non-planted or missing pairs at $n2")
    // rarest-first prefixes keep candidate growth near-linear at a fixed
    // dup rate — an all-pairs candidate step would show ~100x
    val ratio = c2.toDouble / c1
    assert(ratio >= 6 && ratio <= 20,
      s"prefix candidates grew $c1 -> $c2 (${f"$ratio%.1f"}x) over a 10x corpus")
  }

  test("bandedHammingPairs drill: emitted pairs exactly the planted set at 5k and 50k fingerprints") {
    import spark.implicits._
    def fps(n: Long) = (0L until n).map { i =>
      val dup = i % 20 == 7
      val base = mix(if (dup) i - 1 else i) & ((1L << 60) - 1)
      (i, if (dup) base ^ (1L << (i % 60).toInt) else base)
    }
    def run(n: Long): (Set[(Long, Long)], Long) = {
      val fpSeq = fps(n)
      val df = fpSeq.toDF("doc_id", "fp")
      val pairs = Dedup.bandedHammingPairs(df, bits = 60, bands = 4, maxHamming = 3)
        .select("a_id", "b_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // candidate volume of the SAME (band, bucket) join, measured: sum of
      // C(bucket, 2) — the true cost driver before Hamming verification
      val w = 15
      val cand = df.select(col("doc_id"),
          posexplode(array((0 until 4).map(b =>
            shiftright(col("fp"), b * w).bitwiseAND(lit((1L << w) - 1))): _*))
            .as(Seq("band", "bucket")))
        .groupBy("band", "bucket").agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * (col("c") - 1)).cast("long")).head().getLong(0) / 2
      (pairs, cand)
    }
    for (n <- Seq(5000L, 50000L)) { // 50k ≈ 10x the sf0.1 documents table
      val (pairs, cand) = run(n)
      val planted = (0L until n).filter(_ % 20 == 7).map(i => (i - 1, i)).toSet
      // pigeonhole: hamming 1 < 4 bands guarantees every planted pair is a
      // candidate (recall 1.0 by construction, not probability), and random
      // 60-bit fingerprints essentially never pass hamming <= 3 — so the
      // output is EXACTLY the planted set, at both scales
      assert(pairs == planted,
        s"n=$n: got ${pairs.size} pairs, planted ${planted.size}; " +
          s"missing=${(planted -- pairs).take(3)}, extra=${(pairs -- planted).take(3)}")
      // the band join's candidate volume follows the birthday term
      // 4*C(n,2)/2^15 + planted — quadratic in n/2^w by design, which is
      // why production simhash sizes band width to the corpus; pin the
      // formula (2x slack) so a bucketing regression (e.g. a truncated
      // band) shows up as a candidate explosion here
      val expected = planted.size + 4.0 * n * (n - 1) / 2 / (1L << 15)
      assert(cand < 2 * expected && cand > expected / 4,
        s"n=$n: candidate pairs $cand vs birthday-model ${expected.toLong}")
    }
  }

  /** Clustered embedding: dominant one-hot direction (id % 16) + small
    * deterministic noise — k-means-style cells with clean separation.
    */
  private def synthVec(i: Long, dim: Int = 16): Array[Float] = {
    val c = (i % 16).toInt
    Array.tabulate(dim) { j =>
      (if (j == c) 8f else 0f) + (math.floorMod(mix(i * 31 + j), 7) - 3) * 0.25f
    }
  }

  test("IVF probe drill: persisted-index recall holds its band when the corpus grows 10x") {
    import spark.implicits._
    val centroids = (0 until 16).map(c =>
      (c.toLong, Array.tabulate(16)(j => if (j == c) 1f else 0f)))
      .toDF("centroid_id", "centv")
    def recallAt(n: Long): Double = {
      val corpus = (0L until n).map(i => (i, synthVec(i))).toDF("vec_id", "embedding")
      val queries = (0L until 50L).map(q => {
        val i = q * (n / 50); (i, synthVec(i))
      }).toDF("vec_id", "embedding")
      val dir = java.nio.file.Files.createTempDirectory("graft-ivf-drill-").toString
      Similarity.buildIvfIndex(corpus, centroids,
        col("vec_id"), col("embedding"), col("centroid_id"), col("centv"),
        s"$dir/ivf")
      val got = Similarity.ivfProbeIndex(queries, s"$dir/ivf", centroids,
          col("vec_id"), col("embedding"), col("centroid_id"), col("centv"),
          k = 10, nprobe = 2)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = Similarity.bruteForceTopK(queries, corpus,
          col("vec_id"), col("embedding"), col("vec_id"), col("embedding"), k = 10)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & exact).size.toDouble / exact.size
    }
    val r1 = recallAt(2000L)  // the sf0.1 embeddings scale
    val r2 = recallAt(20000L) // 10x
    // the ann_* band floor (0.7, BandChecks.annMllib precedent); clustered
    // cells + nprobe=2 should land far above it, and growing the corpus
    // around FIXED centroids must not erode it (cells grow, geometry
    // doesn't)
    assert(r1 >= 0.7 && r2 >= 0.7,
      s"IVF probe recall out of band: ${f"$r1%.3f"} @ 2k, ${f"$r2%.3f"} @ 20k")
    assert(r2 >= r1 - 0.1,
      s"recall eroded >0.1 under 10x growth: ${f"$r1%.3f"} -> ${f"$r2%.3f"}")
  }

  test("semDedup drill: with k grown with the corpus, within-cell candidates stay near-linear; planted dups always drop") {
    import spark.implicits._
    // SemDeDup's scale contract: cell size ≈ n/k, candidates ≈ n·(n/k)/2 —
    // QUADRATIC at fixed k. The method scales by growing k with n (the
    // paper runs k ≈ √n to n/100); this drill grows k 10× with the corpus
    // and pins near-linear candidate growth, plus exact planted-dup drops
    // (identical vectors share a cell by construction, any k).
    def run(n: Long, k: Int): (Long, Set[Long], Set[Long]) = {
      // planted: every id % 20 == 7 duplicates its predecessor's vector
      val corpus = (0L until n).map { i =>
        val base = if (i % 20 == 7) i - 1 else i
        (i, synthVec(base))
      }.toDF("vec_id", "embedding")
      // centroid c is axis-(c%16)-dominant with its own noise pattern: every
      // axis family is covered, and same-axis centroids split their family
      // by the noise components
      val cents = (0 until k).map(c => (c.toLong, synthVec(c.toLong)))
        .toDF("cid", "cv")
      val assigned = Similarity.assignToCentroids(corpus,
        col("vec_id"), col("embedding"), cents, col("cid"), col("cv"))
      val cand = assigned.groupBy("centroid_id").agg(count(lit(1)).as("m"))
        .agg(sum(expr("m * (m - 1) div 2")).as("pairs"))
        .as[Long].collect().head
      val out = Dedup.semDedup(corpus, col("vec_id"), col("embedding"),
          cents, col("cid"), col("cv"), threshold = 0.95)
        .filter(col("kept") === 0).select("vec_id").as[Long].collect().toSet
      val planted = (0L until n).filter(_ % 20 == 7).toSet
      (cand, out, planted)
    }
    val (c1, dropped1, planted1) = run(3000L, 16)
    val (c2, dropped2, planted2) = run(30000L, 160)
    assert(planted1.subsetOf(dropped1), "planted dup survived at 3k")
    assert(planted2.subsetOf(dropped2), "planted dup survived at 30k")
    val ratio = c2.toDouble / c1
    assert(ratio >= 5 && ratio <= 20,
      s"within-cell candidates grew $c1 -> $c2 (${f"$ratio%.1f"}x) over a " +
        "10x corpus with 10x centroids — expected near-linear (5x-20x)")
  }

  test("SearchIndex drill: unconditional maintainIfNeeded keeps postings file count bounded after EVERY append") {
    import graft.pipeline.SearchIndex
    // The operational contract of the maintain loop at 100 TB: a
    // scheduler calls maintainIfNeeded unconditionally after every ingest
    // batch, and no SEQUENCE of appends may leave probe-side file counts
    // unbounded (each append adds ~1 part per touched term bucket, so
    // without the loop files grow linearly in batches forever). Six
    // successive appends, gate at 48 postings parts: after every
    // append+maintain the count must stay under gate + one append's worth.
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("si_drill")
      .toString + "/idx"
    // ALPHABETIC vocabulary: the index tokenizes on [^a-z]+, so docText's
    // "w123" words would all collapse to the single term "w"
    def alphaTok(n0: Long): String = {
      var n = math.floorMod(n0, 5000L)
      val sb = new StringBuilder("t")
      do { sb.append(('a' + (n % 26)).toChar); n /= 26 } while (n > 0)
      sb.toString
    }
    def docs(from: Long, n: Long) =
      (from until from + n).map(i =>
        (i, (0 until 40).map(j => alphaTok(mix(i * 31 + j))).mkString(" ")))
        .toDF("doc_id", "text")
    SearchIndex.buildIndex(docs(0, 200), col("doc_id"), col("text"), path)
    val gate = 48
    var fired = 0
    val observed = (1 to 6).map { b =>
      SearchIndex.appendToIndex(docs(200L * b, 200), col("doc_id"),
        col("text"), path)
      if (SearchIndex.maintainIfNeeded(spark, path,
        maxPostingsFiles = gate)) fired += 1
      val s = SearchIndex.stats(spark, path)
      assert(s.postingsFiles <= gate + 16,
        s"append $b: ${s.postingsFiles} postings parts — maintain loop " +
          s"not bounding file growth (gate $gate)")
      s.postingsFiles
    }
    assert(fired >= 1, s"gate never tripped across 6 appends: $observed")
    // the healed index answers a probe equal to a from-scratch build
    val all = docs(0, 1400)
    val fresh = java.nio.file.Files.createTempDirectory("si_drill_f")
      .toString + "/idx"
    SearchIndex.buildIndex(all, col("doc_id"), col("text"), fresh)
    val probes = Seq(10L, 250L, 999L).map(alphaTok)
    def top(p: String) = SearchIndex.bm25Probe(spark, p, probes, topK = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(top(path) == top(fresh) && top(path).nonEmpty,
      "maintained index diverged from rebuild (or probes matched nothing)")
  }

  test("IVF drill: unconditional ivfMaintainIfNeeded keeps the hot cell's file count bounded through skewed appends") {
    import spark.implicits._
    import graft.pipeline.Similarity
    // The skew shape: every append lands ENTIRELY in one cell (all
    // vectors near centroid 3 — the adjacent-crawl-shard analog for
    // embeddings). Without the loop the hot cell accumulates one part per
    // append forever and every probe of it opens them all.
    val centroids = (0 until 16).map(c =>
      (c.toLong, Array.tabulate(16)(j => if (j == c) 1f else 0f)))
      .toDF("centroid_id", "centv")
    def hot(from: Long, n: Long) = (from until from + n).map { i =>
      val v = synthVec(i); v(3) += 32f // dominate axis 3 → cell 3
      (i, v)
    }.toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("ivf_drill")
      .toString + "/ivf"
    val base = (0L until 2000L).map(i => (i, synthVec(i)))
      .toDF("vec_id", "embedding")
    Similarity.buildIvfIndex(base, centroids,
      col("vec_id"), col("embedding"), col("centroid_id"), col("centv"), path)
    val gate = 3
    var fired = 0
    for (b <- 1 to 6) {
      Similarity.appendToIvfIndex(hot(10000L * b, 300), centroids,
        col("vec_id"), col("embedding"), col("centroid_id"), col("centv"), path)
      if (Similarity.ivfMaintainIfNeeded(spark, path,
        maxFilesPerCell = gate)) fired += 1
      val s = Similarity.ivfStats(spark, path)
      assert(s.maxFilesPerCell <= gate + 1,
        s"append $b: hot cell at ${s.maxFilesPerCell} parts (gate $gate) — " +
          "maintain loop not bounding skewed growth")
    }
    assert(fired >= 2, "the skewed appends never tripped the cell gate")
    // the healed index probes identically to a from-scratch build
    val union = base.unionByName(
      (1 to 6).map(b => hot(10000L * b, 300)).reduce(_ unionByName _))
    val fresh = java.nio.file.Files.createTempDirectory("ivf_drill_f")
      .toString + "/ivf"
    Similarity.buildIvfIndex(union, centroids,
      col("vec_id"), col("embedding"), col("centroid_id"), col("centv"), fresh)
    val queries = (0L until 20L).map(q => (q, synthVec(q * 97)))
      .toDF("vec_id", "embedding")
    def top(p: String) = Similarity.ivfProbeIndex(queries, p, centroids,
        col("vec_id"), col("embedding"), col("centroid_id"), col("centv"),
        k = 5, nprobe = 2)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(top(path) == top(fresh), "maintained IVF diverged from rebuild")
  }

  test("IVF drill: rows-gated maintenance SPLITS the hot cell under sustained skew — probe cost ∝ gate, not corpus") {
    import spark.implicits._
    import graft.pipeline.Similarity
    // Same crawl-shard skew as the file drill above, but the invariant is
    // the round-15 one: file compaction bounds FILE counts while rows per
    // cell grow unboundedly (probe cost ∝ hot-cell rows at 100×). The
    // rows gate must keep max rows/cell bounded through every wave by
    // splitting the hot cell, with total membership exactly preserved.
    val centroids = (0 until 16).map(c =>
      (c.toLong, Array.tabulate(16)(j => if (j == c) 1f else 0f)))
      .toDF("centroid_id", "centv")
    def hot(from: Long, n: Long) = (from until from + n).map { i =>
      val v = synthVec(i); v(3) += 32f // dominate axis 3 → cell 3's range
      (i, v)
    }.toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("ivf_rows_drill")
      .toString + "/ivf"
    val base = (0L until 2000L).map(i => (i, synthVec(i)))
      .toDF("vec_id", "embedding")
    Similarity.buildIvfIndex(base, centroids,
      col("vec_id"), col("embedding"), col("centroid_id"), col("centv"), path)
    val rowGate = 400L
    var total = 2000L
    for (b <- 1 to 6) {
      Similarity.appendToIvfIndex(hot(10000L * b, 300), centroids,
        col("vec_id"), col("embedding"), col("centroid_id"), col("centv"), path)
      total += 300
      Similarity.ivfMaintainIfNeeded(spark, path,
        maxFilesPerCell = 3, maxRowsPerCell = rowGate)
      val s = Similarity.ivfStats(spark, path)
      assert(s.maxRowsPerCell <= rowGate,
        s"append $b: hot cell at ${s.maxRowsPerCell} rows (gate $rowGate) — " +
          "rows-gated maintenance not bounding skewed growth")
      assert(s.vectors == total, s"append $b: membership drifted ($s)")
    }
    val s = Similarity.ivfStats(spark, path)
    assert(s.cells > 16, "the skewed waves never forced a cell split")
    // the split index still answers exhaustive probes identically to a
    // from-scratch rebuild probed exhaustively (cell structure differs, so
    // the equality that MUST hold is the all-cells one)
    val union = base.unionByName(
      (1 to 6).map(b => hot(10000L * b, 300)).reduce(_ unionByName _))
    val fresh = java.nio.file.Files.createTempDirectory("ivf_rows_drill_f")
      .toString + "/ivf"
    Similarity.buildIvfIndex(union, centroids,
      col("vec_id"), col("embedding"), col("centroid_id"), col("centv"), fresh)
    val queries = (0L until 20L).map(q => (q, synthVec(q * 97)))
      .toDF("vec_id", "embedding")
    def top(p: String) = Similarity.ivfProbeIndex(queries, p, centroids,
        col("vec_id"), col("embedding"), col("centroid_id"), col("centv"),
        k = 5, nprobe = 64)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(top(path) == top(fresh),
      "split IVF diverged from rebuild under exhaustive probes")
  }

  test("SuffixIndex drill: bucket sizes stay bounded through repeated skewed appends; a point append stays O(its key range)") {
    import spark.implicits._
    import graft.pipeline.SuffixIndex
    import graft.store.VersionedDir
    // The split invariant that keeps the index 100 TB-viable: the
    // per-bucket merge is ONE task sorting O(bucket) rows, so the
    // O(touched-buckets) append contract only holds if NO sequence of
    // appends can grow a bucket unboundedly. Four successive batches all
    // landing in one narrow key range ("a…" docs — the adjacent crawl-
    // shard shape) must leave max bucket ≤ SplitFactor × target + batch
    // slack after EVERY append, and a subsequent single-doc append must
    // rewrite only the few buckets its grams route to.
    def skewDoc(id: Long): String =
      (0 until 30).map(j => "a" + math.floorMod(mix(id * 17 + j), 40))
        .mkString(" ")
    val base = (0L until 400L)
      .map(i => (i, docText(i))).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("sfx_drill")
      .toString + "/sfx"
    SuffixIndex.build(base, col("doc_id"), col("text"), path,
      cap = 8, buckets = 16)
    val target = spark.read.parquet(s"${VersionedDir.currentDir(path)}/meta")
      .head().getLong(2)
    def maxBucket(): Long =
      spark.read.parquet(s"${VersionedDir.currentDir(path)}/grams")
        .groupBy("bucket").count().agg(max("count")).as[Long].collect().head
    val batchRows = 300L * 30 // grams per skewed batch (upper bound)
    for (b <- 0 until 4) {
      val batch = (0L until 300L)
        .map(i => (10000L + b * 1000 + i, skewDoc(b * 1000 + i)))
        .toDF("doc_id", "text")
      SuffixIndex.append(batch, col("doc_id"), col("text"), path)
      val m = maxBucket()
      // a bucket can legitimately sit at the trigger plus one un-split
      // batch's routed rows; what it must never do is accumulate MULTIPLE
      // batches (the pre-split failure mode grew ~batch × appends)
      assert(m <= SuffixIndex.SplitFactor * target + batchRows,
        s"append ${b + 1}: max bucket $m vs target $target — splits not holding")
    }
    // O(touched) point append: a NARROW doc (one repeated token — all its
    // grams share one key range) must rewrite only the few buckets that
    // range maps to; count rewritten (non-hardlinked) bucket dirs
    val vBefore = VersionedDir.currentDir(path)
    SuffixIndex.append(
      Seq((99999L, Seq.fill(30)("a0").mkString(" "))).toDF("doc_id", "text"),
      col("doc_id"), col("text"), path)
    val vAfter = VersionedDir.currentDir(path)
    def ino(f: java.io.File): Any =
      java.nio.file.Files.getAttribute(f.toPath, "unix:ino")
    val rewritten = new java.io.File(s"$vAfter/grams").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
      .count { nb =>
        val ob = new java.io.File(s"$vBefore/grams/${nb.getName}")
        !ob.isDirectory || {
          val op = ob.listFiles().filter(_.getName.startsWith("part-"))
          op.isEmpty || !op.forall { p =>
            val np = new java.io.File(nb, p.getName)
            np.exists() && ino(np) == ino(p)
          }
        }
      }
    val total = new java.io.File(s"$vAfter/grams").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("bucket="))
    assert(rewritten <= 8,
      s"single-doc narrow append rewrote $rewritten of $total buckets — " +
        "touched-bucket pruning lost")
  }
}
