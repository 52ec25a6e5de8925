package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{SuffixIndex, TextAnalysis}
import graft.store.VersionedDir

/** The persisted suffix-gram index: build == from-scratch, O(touched
  * buckets) appends == from-scratch over the union (including the subtle
  * old-doc-lrs-rises-at-a-bucket-boundary path), untouched buckets
  * hardlink-adopted, CAS append races rerun.
  */
class SuffixIndexSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("sfxidx").toString

  private def fromScratch(docs: Seq[(Long, String)], cap: Int): Set[(Long, Long, Int)] =
    TextAnalysis.longestRepeatStats(
      docs.toDF("doc_id", "text"), col("doc_id"), col("text"), cap)
      .as[(Long, Long, Int)].collect().toSet

  private def indexRead(path: String): Set[(Long, Long, Int)] =
    SuffixIndex.lrsStats(spark, path)
      .as[(Long, Long, Int)].collect().toSet

  private def randomDocs(seed: Int, n: Int, vocab: Vector[String]): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (1L to n.toLong).map { id =>
      val len = 1 + rnd.nextInt(25)
      id -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
  }

  test("build + read == from-scratch longestRepeatStats") {
    val docs = randomDocs(1, 40, Vector("a", "b", "c", "d"))
    val path = s"${tmp()}/sfx"
    SuffixIndex.build(docs.toDF("doc_id", "text"),
      col("doc_id"), col("text"), path, cap = 8, buckets = 7)
    assert(indexRead(path) == fromScratch(docs, cap = 8))
  }

  test("two appends == from-scratch over the union; old-doc lrs rises") {
    val vocab = Vector("a", "b", "c", "d", "e")
    val all = randomDocs(2, 60, vocab) ++ Seq(
      // doc 61 has a distinctive 6-run no other base doc shares;
      // batch doc 62 duplicates it — 61's stored lrs must RISE on append.
      (61L, "q r s t u v"),
      (62L, "x q r s t u v y"))
    val base = all.filter(t => t._1 <= 40 || t._1 == 61L)
    val batch1 = all.filter(t => t._1 > 40 && t._1 <= 50)
    val batch2 = all.filter(t => t._1 > 50 && t._1 != 61L)
    val path = s"${tmp()}/sfx"
    SuffixIndex.build(base.toDF("doc_id", "text"),
      col("doc_id"), col("text"), path, cap = 8, buckets = 5)
    val lrsBefore = indexRead(path).find(_._1 == 61L).get._3
    SuffixIndex.append(batch1.toDF("doc_id", "text"),
      col("doc_id"), col("text"), path)
    assert(indexRead(path) == fromScratch(base ++ batch1, cap = 8))
    SuffixIndex.append(batch2.toDF("doc_id", "text"),
      col("doc_id"), col("text"), path)
    assert(indexRead(path) == fromScratch(all, cap = 8))
    val lrsAfter = indexRead(path).find(_._1 == 61L).get._3
    assert(lrsBefore < 6 && lrsAfter == 6,
      s"old doc's lrs must rise via the batch: $lrsBefore -> $lrsAfter")
  }

  test("append touches only the batch's buckets; untouched buckets are hardlinked") {
    // Base spreads over many buckets; the batch is ONE doc whose grams
    // land in few buckets — every other bucket's files must carry into
    // the new version as hardlinks (same inode), not copies.
    val docs = randomDocs(3, 50, Vector("a", "b", "c", "d", "e", "f"))
    val path = s"${tmp()}/sfx"
    SuffixIndex.build(docs.toDF("doc_id", "text"),
      col("doc_id"), col("text"), path, cap = 8, buckets = 8)
    val v1 = VersionedDir.currentDir(path)
    SuffixIndex.append(Seq((99L, "zz zz")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), path)
    val v2 = VersionedDir.currentDir(path)
    assert(v1 != v2)
    def ino(f: java.io.File): Any =
      java.nio.file.Files.getAttribute(f.toPath, "unix:ino")
    val oldBuckets = new java.io.File(s"$v1/grams").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bucket=")).sortBy(_.getName)
    val adopted = oldBuckets.map { ob =>
      val nb = new java.io.File(s"$v2/grams/${ob.getName}")
      val oldParts = ob.listFiles().filter(_.getName.startsWith("part-"))
      oldParts.nonEmpty && oldParts.forall { p =>
        val np = new java.io.File(nb, p.getName)
        np.exists() && ino(np) == ino(p)
      }
    }
    // "zz" sorts above every vocab gram -> exactly one touched bucket
    assert(adopted.count(_ == false) <= 1,
      s"expected at most one rewritten bucket, got ${adopted.count(_ == false)}")
    assert(adopted.count(_ == true) >= oldBuckets.length - 1)
    // and the result is still exact
    assert(indexRead(path) ==
      fromScratch(docs :+ (99L, "zz zz"), cap = 8))
  }

  test("racing appends: CAS loser reruns, both batches land") {
    val docs = randomDocs(4, 30, Vector("a", "b", "c"))
    val b1 = Seq((101L, "a c a c a c"))
    val b2 = Seq((102L, "c b c b c b"))
    val path = s"${tmp()}/sfx"
    SuffixIndex.build(docs.toDF("doc_id", "text"),
      col("doc_id"), col("text"), path, cap = 8, buckets = 4)
    // Deterministic CAS loss: while append(b1) stages, inject append(b2)
    // committing first — b1's body must rerun against b2's version.
    var injected = false
    VersionedDir.withPreCommitHook(path, _ =>
      if (!injected) {
        injected = true
        SuffixIndex.append(b2.toDF("doc_id", "text"),
          col("doc_id"), col("text"), path)
      }) {
      SuffixIndex.append(b1.toDF("doc_id", "text"),
        col("doc_id"), col("text"), path)
    }
    assert(injected)
    assert(VersionedDir.head(path) == 3) // build, b2, rerun b1
    assert(indexRead(path) == fromScratch(docs ++ b2 ++ b1, cap = 8))
  }

  test("compact folds perdoc deltas and bucket files; read unchanged") {
    val docs = randomDocs(5, 40, Vector("a", "b", "c", "d"))
    val b1 = randomDocs(6, 5, Vector("a", "b", "c", "d")).map { case (id, t) => (id + 100, t) }
    val b2 = randomDocs(7, 5, Vector("a", "b", "c", "d")).map { case (id, t) => (id + 200, t) }
    val path = s"${tmp()}/sfx"
    val out = s"${tmp()}/sfx_c"
    SuffixIndex.build(docs.toDF("doc_id", "text"),
      col("doc_id"), col("text"), path, cap = 8, buckets = 6)
    SuffixIndex.append(b1.toDF("doc_id", "text"), col("doc_id"), col("text"), path)
    SuffixIndex.append(b2.toDF("doc_id", "text"), col("doc_id"), col("text"), path)
    SuffixIndex.compact(spark, path, out)
    val before = indexRead(path)
    assert(indexRead(out) == before)
    assert(before == fromScratch(docs ++ b1 ++ b2, cap = 8))
    // deltas resolved: exactly one perdoc row per doc, no nulls left
    val perdoc = spark.read.parquet(
      s"${VersionedDir.currentDir(out)}/perdoc")
    assert(perdoc.count() == perdoc.select("doc_id").distinct().count())
    assert(perdoc.filter(col("n_tokens").isNull).count() == 0)
    // and each bucket holds ONE part file again
    val buckets = new java.io.File(s"${VersionedDir.currentDir(out)}/grams")
      .listFiles().filter(f => f.isDirectory && f.getName.startsWith("bucket="))
    assert(buckets.forall(_.listFiles().count(_.getName.startsWith("part-")) == 1))
  }

  test("probe: max corpus overlap, co-probed docs never match each other") {
    val corpus = Seq(
      (1L, "a b c d e f"),
      (2L, "g h i j"),
      (3L, "k k k"))
    val path = s"${tmp()}/sfx"
    SuffixIndex.build(corpus.toDF("doc_id", "text"),
      col("doc_id"), col("text"), path, cap = 8, buckets = 3)
    val queries = Seq(
      (10L, "x b c d y"),        // shares "b c d" with doc 1 -> 3
      (11L, "w w w w q1 q2 q3"), // shares NOTHING with the corpus -> 0
      (12L, "w w w w q1 q2 q3"), // identical to 11 — must still be 0
      (13L, "k k k k k"),        // overlapping "k k k" in corpus -> 3
      (14L, "f g h i j a"))      // "g h i j" -> 4 (no cross-doc concat)
    val out = SuffixIndex.probeMaxOverlap(spark, path,
      queries.toDF("doc_id", "text"), col("doc_id"), col("text"))
      .as[(Long, Long, Int)].collect()
      .map { case (id, n, o) => id -> (n, o) }.toMap
    assert(out(10L) == (5L, 3))
    assert(out(11L) == (7L, 0))
    assert(out(12L) == (7L, 0))
    assert(out(13L) == (5L, 3))
    assert(out(14L) == (6L, 4))
  }

  test("probe: re-probing an INGESTED doc sees its own index twin (full-tie order)") {
    // The query gram and its index twin tie on the FULL (g, doc_id, i)
    // sort key; without the deterministic _q tiebreak the twin can fall
    // outside both growing window frames and the exact match goes
    // invisible. Doc 3's tokens are unique corpus-wide, so ONLY the
    // self-match can produce its overlap.
    val corpus = Seq((1L, "a b c"), (2L, "a b d"), (3L, "u1 u2 u3 u4 u5"))
    val path = s"${tmp()}/sfx"
    SuffixIndex.build(corpus.toDF("doc_id", "text"),
      col("doc_id"), col("text"), path, cap = 4, buckets = 3)
    val out = SuffixIndex.probeMaxOverlap(spark, path,
      corpus.toDF("doc_id", "text"), col("doc_id"), col("text"))
      .as[(Long, Long, Int)].collect()
      .map { case (id, n, o) => id -> (n, o) }.toMap
    assert(out(1L) == (3L, 3))  // its own full text (capped by len 3)
    assert(out(2L) == (3L, 3))
    assert(out(3L) == (5L, 4))  // unique tokens: only the self-twin, at cap
  }

  test("probe == brute force on a randomized split") {
    val vocab = Vector("a", "b", "c", "d")
    val all = randomDocs(8, 60, vocab)
    val corpus = all.filter(_._1 % 3 != 0L)
    val queries = all.filter(_._1 % 3 == 0L)
    val cap = 8
    val path = s"${tmp()}/sfx"
    SuffixIndex.build(corpus.toDF("doc_id", "text"),
      col("doc_id"), col("text"), path, cap = cap, buckets = 5)
    val corpusGrams = (for {
      (_, t) <- corpus; ts = t.split(" ", -1).toSeq
      i <- ts.indices; n <- 1 to math.min(cap, ts.length - i)
    } yield (n, ts.slice(i, i + n))).toSet
    val expected = queries.map { case (id, t) =>
      val ts = t.split(" ", -1).toSeq
      val best = for {
        i <- ts.indices; n <- 1 to math.min(cap, ts.length - i)
        if corpusGrams((n, ts.slice(i, i + n)))
      } yield n
      id -> (if (best.isEmpty) 0 else best.max)
    }.toMap
    val got = SuffixIndex.probeMaxOverlap(spark, path,
      queries.toDF("doc_id", "text"), col("doc_id"), col("text"))
      .as[(Long, Long, Int)].collect()
      .map { case (id, _, o) => id -> o }.toMap
    assert(got == expected)
  }

  test("skewed appends split the hot bucket; compact rebalances; reads stay exact") {
    // All batch grams land in ONE key range (docs of only "a" tokens —
    // the near-duplicate-crawl-shard shape): without the size-triggered
    // split the lowest bucket would absorb the whole batch and the
    // O(touched-buckets) contract would silently become one O(corpus)
    // single-task sort.
    val base = randomDocs(9, 30, Vector("b", "c", "d", "e", "f", "g"))
    val rnd = new scala.util.Random(10)
    val skew = (200L until 240L).map(id =>
      id -> Seq.fill(15 + rnd.nextInt(10))("a").mkString(" "))
    val path = s"${tmp()}/sfx"
    SuffixIndex.build(base.toDF("doc_id", "text"),
      col("doc_id"), col("text"), path, cap = 8, buckets = 6)
    val meta = spark.read.parquet(s"${VersionedDir.currentDir(path)}/meta").head()
    val target = meta.getLong(2)
    assert(target > 0)
    def bucketSizes(): Map[Int, Long] =
      spark.read.parquet(s"${VersionedDir.currentDir(path)}/grams")
        .groupBy("bucket").count()
        .as[(Int, Long)].collect().toMap
    SuffixIndex.append(skew.toDF("doc_id", "text"),
      col("doc_id"), col("text"), path)
    val sizes = bucketSizes()
    // (a) the hot range was split: no bucket holds more than the split
    // trigger's bound (SplitFactor × target), and the ~800-gram batch is
    // spread over several sub-buckets instead of one
    assert(sizes.values.max <= SuffixIndex.SplitFactor.toLong * target,
      s"max bucket ${sizes.values.max} vs target $target — split did not fire")
    assert(sizes.size > 6, s"expected split sub-buckets, got ${sizes.keySet}")
    // (b) bucket id order still equals range order (every consumer of the
    // edges table relies on it): first-gram sequence sorted by bucket id
    // must be non-decreasing
    val edges = spark.read.parquet(s"${VersionedDir.currentDir(path)}/edges")
      .select("bucket", "first_g").as[(Int, Seq[String])].collect()
      .sortBy(_._1).map(_._2)
    val ord = math.Ordering.Implicits.seqOrdering[Seq, String]
    assert(edges.zip(edges.drop(1)).forall { case (a, b) => ord.lteq(a, b) },
      "bucket id order diverged from gram range order after the split")
    // (c) reads stay exact, and the split index keeps working: another
    // append and a probe against it
    assert(indexRead(path) == fromScratch(base ++ skew, cap = 8))
    SuffixIndex.append(Seq((300L, "b c d a a a")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), path)
    assert(indexRead(path) ==
      fromScratch(base ++ skew :+ (300L, "b c d a a a"), cap = 8))
    val probed = SuffixIndex.probeMaxOverlap(spark, path,
      Seq((400L, "x a a a a y")).toDF("doc_id", "text"),
      col("doc_id"), col("text"))
      .as[(Long, Long, Int)].collect().head
    assert(probed == ((400L, 6L, 4)), s"got $probed")
    // (d) compact re-derives BALANCED boundaries at the target count: the
    // skew is spread evenly again, not frozen into the old cuts
    val out = s"${tmp()}/sfx_rebal"
    SuffixIndex.compact(spark, path, out)
    val rebal = spark.read.parquet(s"${VersionedDir.currentDir(out)}/grams")
      .groupBy("bucket").count().as[(Int, Long)].collect().toMap
    assert(rebal.size <= 6, s"compact must restore the target count, got ${rebal.size}")
    val mean = rebal.values.sum.toDouble / rebal.size
    assert(rebal.values.max <= (3 * mean).ceil.toLong,
      s"compact left skewed buckets: max ${rebal.values.max} vs mean $mean")
    assert(SuffixIndex.lrsStats(spark, out)
      .as[(Long, Long, Int)].collect().toSet ==
      fromScratch(base ++ skew :+ (300L, "b c d a a a"), cap = 8))
  }

  test("probe against an index built over an EMPTY corpus returns 0-overlap rows") {
    val path = s"${tmp()}/sfx"
    SuffixIndex.build(Seq.empty[(Long, String)].toDF("doc_id", "text"),
      col("doc_id"), col("text"), path, cap = 4, buckets = 3)
    val out = SuffixIndex.probeMaxOverlap(spark, path,
      Seq((1L, "a b c"), (2L, "d")).toDF("doc_id", "text"),
      col("doc_id"), col("text"))
      .as[(Long, Long, Int)].collect().toSet
    assert(out == Set((1L, 3L, 0), (2L, 1L, 0)))
  }

  test("append emits no delta rows for untouched–untouched boundary pairs") {
    // Their LCPs are unchanged from the previous version and already
    // recorded — re-emitting them would grow the perdoc table faster than
    // the O(touched-buckets) cost model admits.
    val docs = randomDocs(11, 48, Vector("b", "c", "d", "e", "f", "g"))
    val path = s"${tmp()}/sfx"
    SuffixIndex.build(docs.toDF("doc_id", "text"),
      col("doc_id"), col("text"), path, cap = 8, buckets = 8)
    val v1 = VersionedDir.currentDir(path)
    SuffixIndex.append(Seq((99L, "zz zz")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), path)
    val v2 = VersionedDir.currentDir(path)
    val newDelta = spark.read.parquet(s"$v2/perdoc")
      .exceptAll(spark.read.parquet(s"$v1/perdoc"))
    val oldDocRows = newDelta.filter(col("n_tokens").isNull)
      .select("doc_id").as[Long].collect().toSet
    // allowed: docs with grams in a recomputed (merged) bucket, plus edge
    // docs of boundary pairs adjacent to one
    val e1 = spark.read.parquet(s"$v1/edges").collect().map(_.toSeq).toSet
    val e2 = spark.read.parquet(s"$v2/edges").collect()
    val mergedBuckets = e2.filterNot(r => e1(r.toSeq)).map(_.getInt(0)).toSet
    assert(mergedBuckets.nonEmpty)
    val sorted2 = e2.sortBy(_.getInt(0))
    val boundaryDocs = sorted2.zip(sorted2.drop(1))
      .filter { case (p, q) =>
        mergedBuckets(p.getInt(0)) || mergedBuckets(q.getInt(0)) }
      .flatMap { case (p, q) =>
        Seq(p.getLong(p.fieldIndex("last_doc")), q.getLong(q.fieldIndex("first_doc"))) }
      .toSet
    val mergedDocs = spark.read.parquet(s"$v2/grams")
      .filter(col("bucket").isin(mergedBuckets.toSeq: _*))
      .select("doc_id").as[Long].collect().toSet
    val allowed = mergedDocs ++ boundaryDocs
    assert(oldDocRows.subsetOf(allowed),
      s"untouched–untouched pair docs re-emitted: ${oldDocRows -- allowed}")
  }

  test("stats + maintainIfNeeded: drifted index heals IN PLACE; the trigger resets; healthy index is a no-op") {
    val docs = randomDocs(12, 60, Vector("a", "b", "c", "d", "e"))
    val base = docs.filter(_._1 <= 6)      // ~10%: appends will blow past target
    val rest = docs.filter(_._1 > 6)
    val path = s"${tmp()}/sfx"
    SuffixIndex.build(base.toDF("doc_id", "text"),
      col("doc_id"), col("text"), path, cap = 8, buckets = 4)
    SuffixIndex.append(rest.toDF("doc_id", "text"),
      col("doc_id"), col("text"), path)
    val s1 = SuffixIndex.stats(spark, path)
    assert(s1.targetBuckets == 4 && s1.version == 2)
    assert(s1.buckets > 4, "the growth append should have split buckets")
    // bucket drift past the threshold => maintenance is due; the default
    // compacts IN PLACE (a new version of the same root), so the index
    // the scheduler keeps appending into is the one that heals
    val ran = SuffixIndex.maintainIfNeeded(spark, path,
      maxBucketDrift = (s1.buckets.toDouble / 4) - 0.1)
    assert(ran, "drifted index must trigger a compact")
    val s2 = SuffixIndex.stats(spark, path)
    assert(s2.version == 3, "in-place compact must commit a new version")
    assert(s2.buckets <= 4 && s2.perdocFiles <= 4 && s2.imbalance < 3.0,
      s"compact left an unhealthy index: $s2")
    assert(indexRead(path) == fromScratch(docs, cap = 8))
    // the trigger RESET: calling again (the scheduler's unconditional
    // per-batch call) is now a no-op — no version committed
    assert(!SuffixIndex.maintainIfNeeded(spark, path,
      maxBucketDrift = (s1.buckets.toDouble / 4) - 0.1))
    assert(VersionedDir.head(path) == 3, "no-op must not commit anything")
    // and the healed index keeps taking appends
    SuffixIndex.append(Seq((500L, "a b c d e")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), path)
    assert(indexRead(path) == fromScratch(docs :+ (500L, "a b c d e"), cap = 8))
  }

  test("append into an empty-built index bootstraps a build — the first micro-batch of a bootstrap-then-stream scheduler") {
    val path = s"${tmp()}/sfx"
    SuffixIndex.build(Seq.empty[(Long, String)].toDF("doc_id", "text"),
      col("doc_id"), col("text"), path, cap = 8, buckets = 4)
    // the empty index answers probes (0-overlap), and the FIRST append
    // must not crash on route-into-no-buckets — it bootstraps a build
    // under the index's own cap/buckets
    val docs = randomDocs(7, 40, Vector("a", "b", "c"))
    SuffixIndex.append(docs.toDF("doc_id", "text"),
      col("doc_id"), col("text"), path)
    assert(indexRead(path) == fromScratch(docs, cap = 8))
    val s = SuffixIndex.stats(spark, path)
    assert(s.version == 2 && s.targetBuckets == 4 && s.buckets >= 1,
      s"bootstrap should commit a real build: $s")
    // and the bootstrapped index keeps taking NORMAL merge appends
    SuffixIndex.append(Seq((900L, "a b c a b c")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), path)
    assert(indexRead(path) == fromScratch(docs :+ (900L, "a b c a b c"), cap = 8))
  }

  test("append into an index whose docs ALL tokenized to zero grams keeps those docs in lrsStats") {
    // Zero committed EDGES does not mean zero committed DOCS: null-text
    // docs contribute perdoc rows but no grams. Pre-round-15 the
    // zero-edge bootstrap staged a from-scratch build of only the batch,
    // silently dropping the committed docs from lrsStats.
    val path = s"${tmp()}/sfx"
    val hollow = Seq((900L, Option.empty[String]), (901L, Option.empty[String]))
    SuffixIndex.build(hollow.toDF("doc_id", "text"),
      col("doc_id"), col("text"), path, cap = 8, buckets = 4)
    assert(SuffixIndex.lrsStats(spark, path)
      .select("doc_id").as[Long].collect().toSet == Set(900L, 901L))
    val docs = randomDocs(11, 20, Vector("a", "b", "c"))
    SuffixIndex.append(docs.toDF("doc_id", "text"),
      col("doc_id"), col("text"), path)
    val got = SuffixIndex.lrsStats(spark, path)
    assert(got.select("doc_id").as[Long].collect().toSet ==
      docs.map(_._1).toSet ++ Set(900L, 901L),
      "the bootstrap append dropped the committed zero-gram docs")
    assert(got.filter(col("doc_id") >= 900L).agg(max("lrs"))
      .head().getInt(0) == 0)
    // the batch's own stats are still a from-scratch build's
    assert(got.filter(col("doc_id") < 900L)
      .as[(Long, Long, Int)].collect().toSet == fromScratch(docs, cap = 8))
  }

  test("in-place compact racing an append: the CAS rerun re-pins the append's rows") {
    // The in-place form must pin its source INSIDE the transaction: a
    // compact staged against v1 that loses the slot to a racing append
    // (v2) would otherwise commit a v3 compacted from v1 — silently
    // dropping the appended docs.
    val docs = randomDocs(14, 30, Vector("a", "b", "c", "d"))
    val batch = Seq((900L, "a d c b a d"))
    val path = s"${tmp()}/sfx"
    SuffixIndex.build(docs.toDF("doc_id", "text"),
      col("doc_id"), col("text"), path, cap = 8, buckets = 4)
    var injected = false
    VersionedDir.withPreCommitHook(path, _ =>
      if (!injected) {
        injected = true
        SuffixIndex.append(batch.toDF("doc_id", "text"),
          col("doc_id"), col("text"), path)
      }) {
      SuffixIndex.compact(spark, path, path)
    }
    assert(injected)
    assert(VersionedDir.head(path) == 3) // build, racing append, compact rerun
    assert(indexRead(path) == fromScratch(docs ++ batch, cap = 8),
      "the in-place compact dropped the racing append's rows")
  }

  test("single-bucket and single-doc degenerate shapes") {
    val path = s"${tmp()}/sfx"
    SuffixIndex.build(Seq((1L, "solo doc here")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), path, cap = 4, buckets = 1)
    assert(indexRead(path) == Set((1L, 3L, 0)))
    SuffixIndex.append(Seq((2L, "solo doc here too")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), path)
    assert(indexRead(path) ==
      fromScratch(Seq((1L, "solo doc here"), (2L, "solo doc here too")), cap = 4))
  }
}
