package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.GraphAnalytics
import graft.pipeline.{Dedup, Splits, TextAnalysis}

/** Degenerate-input behavior for the operator families: empty frames,
  * single elements, and out-of-range parameters must return the correct
  * (usually empty) answer, not throw — at 100 TB a partition, a tenant, or
  * an ingest batch being empty is an everyday event, and an operator that
  * crashes on it takes the whole pipeline down.
  */
class EdgeCaseSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val noPairs = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
  private val noEdges = Seq.empty[(Long, Long)].toDF("u", "v")

  test("connectedComponents: empty pair list gives empty labels") {
    assert(Dedup.connectedComponents(noPairs).count() == 0)
  }

  test("mergeComponents: empty labels + batch behaves as from-scratch") {
    val merged = Dedup.mergeComponents(
      Dedup.connectedComponents(noPairs), Seq((7L, 3L)).toDF("a_id", "b_id"))
      .as[(Long, Long)].collect().toSet
    assert(merged == Set((3L, 3L), (7L, 3L)))
  }

  test("triangleCounts: empty graph and triangle-free graph give no rows") {
    assert(GraphAnalytics.triangleCounts(noEdges).count() == 0)
    val path = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    assert(GraphAnalytics.triangleCounts(path).count() == 0)
  }

  test("pageRankInt: empty edges yield an empty rank table; self-loop converges") {
    val e = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(GraphAnalytics.pageRankInt(e, iters = 2).count() == 0)
    // a single self-loop: all mass recirculates to the one node
    val loop = Seq((1L, 1L)).toDF("src", "dst")
    val got = GraphAnalytics.pageRankInt(loop, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(1L) && got(1L) > 0L)
  }

  test("kCore: k above every degree peels the whole graph") {
    val e = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    assert(GraphAnalytics.kCore(e, k = 5, rounds = 3).count() == 0)
  }

  test("sssp/bfs: empty edges leave only the source at distance 0") {
    val sp = GraphAnalytics.sssp(
      Seq.empty[(Long, Long, Long)].toDF("u", "v", "w"), src = 42L, rounds = 2)
      .as[(Long, Long)].collect().toSet
    assert(sp == Set((42L, 0L)))
    val bf = GraphAnalytics.bfs(noEdges, src = 42L, rounds = 2)
      .as[(Long, Int)].collect().toSet
    assert(bf == Set((42L, 0)))
  }

  test("minhashLsh: empty corpus and single-doc corpus give no pairs") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.minhashLsh(empty, col("doc_id"), col("text"),
      n = 3, bands = 8, rowsPerBand = 2).count() == 0)
    val one = Seq((1L, "only one document here")).toDF("doc_id", "text")
    assert(Dedup.minhashLsh(one, col("doc_id"), col("text"),
      n = 3, bands = 8, rowsPerBand = 2).count() == 0)
  }

  test("keepRepresentatives: empty components table keeps the whole corpus") {
    val docs = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val comp = Seq.empty[(Long, Long)].toDF("doc_id", "rep_id")
    assert(Dedup.keepRepresentatives(docs, col("doc_id"), comp).count() == 2)
  }

  test("assignSplit: empty frame returns empty with the split column present") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = empty.withColumn("split", Splits.assignSplit(col("doc_id")))
    assert(out.columns.contains("split"))
    assert(out.count() == 0)
  }

  test("labelPropagation: empty edges give empty labels; isolated edge keeps both endpoints") {
    assert(GraphAnalytics.labelPropagation(noEdges, rounds = 2).count() == 0)
    val one = GraphAnalytics.labelPropagation(Seq((5L, 9L)).toDF("u", "v"), rounds = 2)
      .as[(Long, Long)].collect().toMap
    // each endpoint's only neighbor label oscillates to the other's — after
    // an even round count both carry their own start label again… except
    // round 1 swaps (5→9, 9→5) and round 2 swaps back
    assert(one == Map(5L -> 5L, 9L -> 9L))
  }

  test("personalizedPageRankInt: empty edges give an empty frame (no reachable mass)") {
    val e = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(GraphAnalytics.personalizedPageRankInt(e, Seq(1L), iters = 2).count() == 0)
  }

  test("temperatureFlatten: empty frame returns empty; single group keeps everything") {
    val empty = Seq.empty[(Long, String)].toDF("id", "g")
    assert(Splits.temperatureFlatten(empty, col("g"), col("id")).count() == 0)
    val single = (1 to 50).map(i => (i.toLong, "only")).toDF("id", "g")
    assert(Splits.temperatureFlatten(single, col("g"), col("id")).count() == 50)
  }

  test("ksTest: one-sided input yields NULL d_stat, never a throw") {
    import graft.operators.Stats
    val oneSided = (1 to 20).map(i => (i.toLong, true)).toDF("v", "a")
    val r = Stats.ksTest(oneSided, col("v"), col("a"), !col("a")).head()
    assert(r.getLong(0) == 20L && r.getLong(1) == 0L)
    assert(r.getLong(2) == 0L)                 // |c1·0 − c2·20| with c2 ≡ 0
    assert(r.isNullAt(3))                      // guarded 0/0 → NULL, no throw
  }

  test("tCloseness: single sensitive value (k=1) yields zero-distance classes") {
    import graft.pipeline.Privacy
    // k−1 = 0 denominator, but emd_num is identically 0 for every class
    // (c·N = g·n_g when the single value covers everything) → 0/0 NaN emd
    val df = Seq(("A", 7), ("A", 7), ("B", 7)).toDF("grp", "sv")
    val out = Privacy.tCloseness(df, Seq("grp"), col("sv"), t = 0.5)
      .orderBy("grp").collect()
    assert(out.length == 2)
    out.foreach { r => assert(r.getLong(2) == 0L) } // emd_num exactly 0
  }

  test("funnelDetect: no stage-0 events → no hits; empty input → empty") {
    import graft.streaming.StatefulOps
    val noViews = Seq((1L, "click", 10L), (1L, "purchase", 20L)).toDS()
    assert(StatefulOps.funnelDetect[Long, (Long, String, Long)](
      noViews, _._1, _._3,
      e => e._2 match { case "view" => 0; case "click" => 1; case "purchase" => 2; case _ => -1 },
      1000L).count() == 0)
    val empty = Seq.empty[(Long, String, Long)].toDS()
    assert(StatefulOps.funnelDetect[Long, (Long, String, Long)](
      empty, _._1, _._3, _ => 0, 1000L).count() == 0)
  }

  test("hardNegatives: all candidates share the query's label → empty result") {
    import graft.pipeline.Similarity
    val vecs = Seq((0L, Array(1.0f, 0.0f), 1), (1L, Array(0.9f, 0.1f), 1))
      .toDF("vec_id", "embedding", "label")
    assert(Similarity.hardNegatives(
      vecs.filter(col("vec_id") === 0), vecs,
      col("vec_id"), col("embedding"), col("label"),
      col("vec_id"), col("embedding"), col("label"), k = 3).count() == 0)
  }

  test("mannWhitneyU: one-sided input yields U1 = 0 exactly, never a throw") {
    import graft.operators.Stats
    val oneSided = (1 to 20).map(i => (i.toLong, true)).toDF("v", "a")
    val r = Stats.mannWhitneyU(oneSided, col("v"), col("a"), !col("a")).head()
    // n2 = 0: R1 = n1(n1+1)/2 exactly → U1 = 0, U2 = 0, u_stat 0
    assert(r.getLong(0) == 20L && r.getLong(1) == 0L)
    assert(r.getLong(2) == 0L && r.getLong(3) == 0L && r.getDouble(4) == 0.0)
  }

  test("spearman: constant column yields NULL rho (zero variance), never a throw") {
    import graft.operators.Stats
    val const = (1 to 10).map(i => (i.toLong, 5L)).toDF("x", "y")
    val r = Stats.spearman(const, col("x"), col("y")).head()
    assert(r.getLong(0) == 10L)
    assert(r.isNullAt(1)) // guarded 0/0 → NULL (ANSI would throw on a raw div)
  }

  test("betweennessInt: empty edges empty; rounds=1 gives all-zero dependencies") {
    val empty = Seq.empty[(Long, Long)].toDF("u", "v")
    assert(GraphAnalytics.betweennessInt(empty, Seq(1L), rounds = 3).count() == 0)
    // one-hop horizon: every reached node is a leaf → delta 0 everywhere
    val path = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val r1 = GraphAnalytics.betweennessInt(path, Seq(1L), rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(2L -> 0L))
  }

  test("randomWalks: a seed absent from the graph emits only its step-0 rows") {
    val edges = Seq((1L, 2L)).toDF("u", "v")
    val out = GraphAnalytics.randomWalks(edges, Seq(42L), walksPerSeed = 2, steps = 3)
      .as[(Long, Int, Long)].collect().toSeq
    assert(out.forall(_._2 == 0) && out.length == 2)
  }

  test("readPrunedByKeys: empty key list reads nothing and returns empty") {
    import graft.pipeline.Layout
    val dir = java.nio.file.Files.createTempDirectory("graft-bloomedge-").toString + "/t"
    spark.range(0, 100).toDF("k").coalesce(1).write.parquet(dir)
    val mf = Layout.bloomManifest(spark, dir, "k", 1000L, 1L << 12)
    assert(Layout.readPrunedByKeys(spark, dir, mf, "k", Seq.empty).count() == 0)
  }

  test("Cms: empty corpus builds an empty sketch; probes over it estimate 0") {
    import graft.pipeline.Cms
    val empty = Seq.empty[Long].toDF("k")
    val cells = Cms.build(empty, col("k"), depth = 4, width = 64)
    assert(cells.count() == 0)
    val est = Cms.probe(cells, Seq(1L, 2L).toDF("k"), col("k"), 4, 64)
      .as[(Long, Long)].collect().toMap
    assert(est == Map(1L -> 0L, 2L -> 0L))
  }

  test("bandedHammingPairs: empty and singleton fingerprint frames pair nothing") {
    import graft.pipeline.Dedup
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "fp")
    assert(Dedup.bandedHammingPairs(empty, 64, 4, 3).count() == 0)
    val one = Seq((1L, 42L)).toDF("doc_id", "fp")
    assert(Dedup.bandedHammingPairs(one, 64, 4, 3).count() == 0)
  }

  test("averageHash: empty media dataset is empty") {
    import graft.pipeline.{Multimodal, MediaRow}
    assert(Multimodal.averageHash(
      Seq.empty[MediaRow].toDS()).count() == 0)
  }

  test("SearchIndex probe: terms absent from the corpus score nothing") {
    import graft.pipeline.SearchIndex
    val docs = Seq((1L, "alpha beta gamma"), (2L, "beta delta"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("sidx_edge").toString
    SearchIndex.buildIndex(docs, col("doc_id"), col("text"), s"$dir/idx")
    assert(SearchIndex.bm25Probe(spark, s"$dir/idx",
      Seq("zeta", "omega"), topK = 5).count() == 0)
  }

  test("mannWhitneyU feeding AUC: one empty class yields NULL auc, not an ANSI error") {
    val users = Seq((1L, 10L, 1L), (2L, 5L, 1L)).toDF("user_id", "score", "label")
    val r = graft.operators.Stats.mannWhitneyU(users, col("score"),
        col("label") === 1, col("label") === 0)
      .select(col("n1"), col("n2"),
        when(col("n1") * col("n2") === 0, lit(null).cast("double"))
          .otherwise(col("u1_x2").cast("double") /
            (col("n1") * col("n2") * 2).cast("double")).as("auc"))
      .head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 0L && r.isNullAt(2))
  }

  test("duplicatedSpanStats: empty corpus is empty; all-sub-k corpus is all-zero") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.pipeline.TextAnalysis.duplicatedSpanStats(
      empty, col("doc_id"), col("text"), k = 8).count() == 0)
    val shorts = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    val out = graft.pipeline.TextAnalysis.duplicatedSpanStats(
      shorts, col("doc_id"), col("text"), k = 8)
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(out == Seq((1L, 2L, 0L, 0.0), (2L, 2L, 0L, 0.0)))
  }

  test("round-10 ops: degenerate inputs (empty corpus, sub-window docs, zero target)") {
    import graft.pipeline.TextAnalysis
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // winnow pairs: empty corpus and sub-k docs produce no pairs, no error
    assert(Dedup.winnowPairs(empty, col("doc_id"), col("text")).count() == 0)
    assert(Dedup.winnowPairs(Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text"),
      col("doc_id"), col("text")).count() == 0)
    // gopher rules: a one-token doc measures without dividing by zero
    val one = TextAnalysis.gopherRules(Seq((1L, "word")).toDF("doc_id", "text"),
      col("doc_id"), col("text")).head()
    assert(one.getAs[Long]("n_tok") == 1L && one.getAs[Int]("keep") == 0)
    // dsir: zero target docs — every weight is a finite negative-or-zero
    // self-information shift, never NaN/null (add-one smoothing)
    val w = TextAnalysis.dsirWeights(
        Seq((1L, "a b c", false), (2L, "x y z", false)).toDF("doc_id", "text", "t"),
        col("doc_id"), col("text"), isTarget = col("t"), buckets = 16)
      .as[(Long, Long)].collect()
    assert(w.length == 2 && w.forall(_._2 != null))
    // keep-first span removal: empty corpus passes through empty
    assert(TextAnalysis.removeDuplicatedSpansKeepFirst(
      empty, col("doc_id"), col("text"), k = 8).count() == 0)
    // metaRowCount on a freshly initialized (row-less) store is 0, no jobs
    val st = new graft.store.GraphStore(spark,
      java.nio.file.Files.createTempDirectory("graft-meta-edge-").toString)
    st.initialize()
    assert(Seq("entities", "observations", "relations")
      .forall(st.metaRowCount(_) == 0L))
  }

  test("suffix family: empty-string docs, all-identical corpus, cap 1") {
    // Empty text tokenizes to [""] (split semantics) — a 1-token doc; two
    // of them share that token, so each reports lrs 1, never a crash.
    val empties = Seq((1L, ""), (2L, ""), (3L, "x"))
      .toDF("doc_id", "text")
    val lrs = TextAnalysis.longestRepeatStats(
        empties, col("doc_id"), col("text"), cap = 4)
      .as[(Long, Long, Int)].collect()
      .map { case (id, n, l) => id -> (n, l) }.toMap
    assert(lrs == Map(1L -> (1L, 1), 2L -> (1L, 1), 3L -> (1L, 0)))
    // cap = 1 degenerates to "has any duplicated token"
    val capOne = TextAnalysis.longestRepeatStats(
        Seq((1L, "a b a"), (2L, "c d")).toDF("doc_id", "text"),
        col("doc_id"), col("text"), cap = 1)
      .as[(Long, Long, Int)].collect()
      .map { case (id, n, l) => id -> (n, l) }.toMap
    assert(capOne == Map(1L -> (3L, 1), 2L -> (2L, 0)))
    // an all-identical corpus saturates at the cap for every doc
    val same = (1L to 6L).map(i => (i, "t1 t2 t3 t4 t5 t6 t7 t8"))
    val sat = TextAnalysis.longestRepeatStats(
        same.toDF("doc_id", "text"), col("doc_id"), col("text"), cap = 4)
      .as[(Long, Long, Int)].collect()
    assert(sat.forall { case (_, n, l) => n == 8L && l == 4 })
    // the persisted index agrees on the degenerate corpus, build + probe
    val p = java.nio.file.Files.createTempDirectory("sfx-edge").toString
    graft.pipeline.SuffixIndex.build(empties, col("doc_id"), col("text"),
      s"$p/sfx", cap = 4, buckets = 2)
    val idx = graft.pipeline.SuffixIndex.lrsStats(spark, s"$p/sfx")
      .as[(Long, Long, Int)].collect()
      .map { case (id, n, l) => id -> (n, l) }.toMap
    assert(idx == lrs)
    // probing an empty-text query doc against it: matches the "" token
    val probe = graft.pipeline.SuffixIndex.probeMaxOverlap(spark, s"$p/sfx",
        Seq((9L, "")).toDF("doc_id", "text"), col("doc_id"), col("text"))
      .as[(Long, Long, Int)].collect()
    assert(probe.toSeq == Seq((9L, 1L, 1)))
  }
}
