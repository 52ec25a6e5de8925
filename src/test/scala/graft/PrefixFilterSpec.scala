package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Dedup

class PrefixFilterSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def shingleSet(t: String, n: Int = 3): Set[String] =
    t.split(" ").sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet

  private def bruteForce(docs: Seq[(Long, String)], t: Double) =
    (for {
      (ai, at) <- docs; (bi, bt) <- docs if ai < bi
      a = shingleSet(at); b = shingleSet(bt)
      common = (a & b).size
      j = common.toDouble / (a.size + b.size - common) if common > 0 && j >= t
    } yield (ai, bi) -> j).toMap

  test("prefixFilterJaccard: identical and disjoint hand cases") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // J = 1.0 with doc 1
      (3L, "zeta eta theta iota kappa"))      // disjoint
    val out = Dedup.prefixFilterJaccard(docs.toDF("doc_id", "text"),
      col("doc_id"), col("text")).collect()
    assert(out.length === 1)
    assert(out.head.getLong(0) === 1L && out.head.getLong(1) === 2L)
    assert(out.head.getDouble(2) === 1.0)
  }

  test("prefixFilterJaccard: lossless vs brute force on a mixed corpus") {
    // clusters of near-dups + noise docs; deterministic word soup
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omicron",
      "pi", "rho", "sigma", "tau", "upsilon")
    val docs = (0 until 40).map { i =>
      val base = (0 until 9).map(j => words((i * 3 + j * 7) % words.size))
      val mutated =
        if (i % 4 == 0) base.updated(i % 9, words((i * 5 + 11) % words.size))
        else base
      (i.toLong, mutated.mkString(" "))
    }
    val expected = bruteForce(docs, 0.5)
    val got = Dedup.prefixFilterJaccard(docs.toDF("doc_id", "text"),
      col("doc_id"), col("text"), n = 3, tNum = 1, tDen = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet === expected.keySet, "prefix filter must be lossless")
    got.foreach { case (k, j) => assert(math.abs(j - expected(k)) < 1e-12) }
    assert(expected.nonEmpty, "test corpus should contain qualifying pairs")
  }

  test("prefixFilterJaccard: hot shingles fall out of prefixes — fewer candidates") {
    // every doc opens with the same 3 words: the shingle "common shared
    // head" has df = n_docs and would pair everything in a full inverted
    // index; rarest-first prefixes skip it without any tuned cutoff
    def word(n: Int): String =
      "t" + ('a' + n % 26).toChar.toString + ('a' + (n / 26) % 26).toChar
    val docs = (0 until 30).map { i =>
      (i.toLong, "common shared head " +
        (0 until 5).map(j => word((i * 7 + j * 13) % 97)).mkString(" "))
    }
    val (full, pref) = Dedup.prefixFilterStats(docs.toDF("doc_id", "text"),
      col("doc_id"), col("text"))
    assert(full === 435L, "hot head shingle pairs all 30 docs in the full index")
    assert(pref < full, s"prefix candidates ($pref) must undercut full ($full)")
    // losslessness on the same corpus: brute force agrees
    val expected = bruteForce(docs, 0.5)
    val got = Dedup.prefixFilterJaccard(docs.toDF("doc_id", "text"),
      col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected.keySet)
  }

  test("prefixFilterJaccard: sub-threshold overlap excluded exactly") {
    // 1 of 5 union shingles shared -> J = 0.2 < 0.5
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma zeta eta"))
    val out = Dedup.prefixFilterJaccard(docs.toDF("doc_id", "text"),
      col("doc_id"), col("text")).collect()
    assert(out.isEmpty)
  }

  test("prefixFilterIncremental: equals full recompute restricted to batch endpoints") {
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lam", "mu")
    val corpus = (0 until 24).map { i =>
      (i.toLong, (0 until 8).map(j => words((i * 5 + j) % words.size)).mkString(" "))
    }
    // batch: one near-dup of a corpus doc, one batch-internal dup pair,
    // one doc made ENTIRELY of tokens the frozen vocab has never seen
    val batch = Seq(
      (100L, corpus(3)._2),
      (101L, "nu xi omicron pi rho sigma tau upsilon"),
      (102L, "nu xi omicron pi rho sigma tau upsilon"),
      (103L, "unseen tokens only here novel words entirely fresh"))
    val all = corpus ++ batch
    val expected = bruteForce(all, 0.5)
      .filter { case ((a, b), _) => a >= 100L || b >= 100L }
    val (sets, vocab, prefix) = Dedup.prefixIndexFrames(
      corpus.toDF("doc_id", "text"), col("doc_id"), col("text"))
    val got = Dedup.prefixFilterIncremental(
      batch.toDF("doc_id", "text"), col("doc_id"), col("text"),
      sets, vocab, prefix)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet === expected.keySet,
      "incremental must equal full recompute on batch-endpoint pairs")
    got.foreach { case (k, j) => assert(math.abs(j - expected(k)) < 1e-12) }
    assert(expected.contains((3L, 100L)), "batch x corpus pair planted")
    assert(expected.contains((101L, 102L)), "batch-internal pair planted")
  }

  test("sortedOverlap kernel: exact boundary behavior, agrees with array_intersect") {
    import graft.functions.VectorFunctions.sortedOverlap
    // deterministic token sets of varied size/overlap, as one DataFrame so
    // the expression runs through codegen
    val rows = (0 until 200).map { i =>
      val a = (0 until 5 + i % 7).map(j => f"t${(i * 3 + j * 5) % 40}%02d").distinct.sorted
      // every 3rd row: b is a near-copy of a (high overlap); otherwise an
      // independent draw (mostly low overlap)
      val b = if (i % 3 == 0) (a.drop(1) :+ f"x$i%03d").distinct.sorted
        else (0 until 5 + (i / 2) % 6).map(j => f"t${(i * 7 + j * 11) % 40}%02d").distinct.sorted
      (i.toLong, a, b)
    }
    val df = rows.toDF("i", "a", "b")
    val got = df.select(col("i"),
        sortedOverlap(col("a"), col("b"), 1, 2).as("c"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("ref"),
        size(col("a")).cast("long").as("na"), size(col("b")).cast("long").as("nb"))
      .collect()
    got.foreach { r =>
      val (c, ref, na, nb) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      // J >= 1/2  <=>  3c >= na+nb (exact rationals)
      val qualifies = 3L * ref >= na + nb
      if (qualifies) assert(c === ref, s"row ${r.getLong(0)}: kernel overlap")
      else assert(c === -1L, s"row ${r.getLong(0)}: must reject")
    }
    assert(got.exists(_.getLong(1) >= 0) && got.exists(_.getLong(1) == -1L),
      "fixture must hit both branches")
    // edge cases: empty sides and exact-threshold equality (J = 1/2 needs
    // c = ceil((na+nb)/3): {a,b,c} vs {a,b,x} -> c=2, 3*2 >= 6 qualifies)
    val edge = Seq(
      (Seq.empty[String], Seq("a", "b")),
      (Seq("a", "b", "c"), Seq("a", "b", "x")),
      (Seq("a", "b", "c", "d"), Seq("a", "b", "x", "y"))) // J = 2/6 < 1/2
      .toDF("a", "b")
      .select(sortedOverlap(col("a"), col("b"), 1, 2).as("c"))
      .as[Long].collect()
    assert(edge(0) === -1L && edge(1) === 2L && edge(2) === -1L)
  }

  test("prefixFilterJaccard: sub-shingle docs produce no pairs, no errors") {
    val docs = Seq((1L, "one two"), (2L, "one two"), (3L, ""))
    val out = Dedup.prefixFilterJaccard(docs.toDF("doc_id", "text"),
      col("doc_id"), col("text")).collect()
    assert(out.isEmpty)
  }
}
