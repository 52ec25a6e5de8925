package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Embeddings, Similarity}

/** Invariant coverage for the MLlib embedding/LSH scale paths (engine-specific
  * hashing → no DuckDB oracle; SURVEY §5.2 item 3).
  */
class EmbeddingsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark catalyst optimizer rules engine"),
    (2L, "spark catalyst optimizer rules engine"),          // exact dup of 1
    (3L, "spark catalyst optimizer rewrite rules engine"),  // near dup of 1
    (4L, "completely unrelated text about cooking pasta")
  ).toDF("doc_id", "text")

  test("topPrincipalInt: hand-computed 2-dim power iteration incl. negative loading") {
    // q rows (thousandth-quantized): (1000,-1000) ×2, (1000,0).
    // C = [[3e6, -2e6], [-2e6, 2e6]], max 3e6 →
    // cp = [[1e6, -666666], [-666666, 666666]].
    // v0 = (1e5, 1e5): w = (333334e5, 0) → v1 = (1e5, 0).
    // round 2: w = (1e11, -666666e5) → v2 = (100000, -66666).
    val emb = Seq(
      (1L, Seq(1.0f, -1.0f)), (2L, Seq(1.0f, -1.0f)), (3L, Seq(1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Embeddings.topPrincipalInt(emb, "embedding", rounds = 2, dims = 2)
      .as[(Int, Long)].collect().toMap
    assert(got == Map(0 -> 100000L, 1 -> -66666L))
  }

  test("tfidf: stable dim, identical docs get identical vectors") {
    val out = Embeddings.tfidf(docs, "doc_id", "text", dim = 64)
      .orderBy("doc_id").as[(Long, Seq[Double])].collect()
    assert(out.forall(_._2.size == 64))
    assert(out(0)._2 == out(1)._2)
    assert(out(0)._2 != out(3)._2)
  }

  test("word2vec: identical docs embed identically, near dups closer than unrelated") {
    // Partitioned training (numPartitions > 1) is hogwild-style: weights are
    // NOT bit-reproducible across runs, so no run-to-run equality assert —
    // the invariants below hold within any one trained model.
    val a = Embeddings.word2vec(docs, "doc_id", "text", dim = 16)
      .orderBy("doc_id").as[(Long, Seq[Double])].collect()
    assert(a.forall(_._2.size == 16))
    assert(a(0)._2 == a(1)._2) // same text → same mean-of-word-vectors
    def cos(x: Seq[Double], y: Seq[Double]) = {
      val d = x.zip(y).map { case (p, q) => p * q }.sum
      d / (math.sqrt(x.map(v => v * v).sum) * math.sqrt(y.map(v => v * v).sum))
    }
    assert(cos(a(0)._2, a(2)._2) > cos(a(0)._2, a(3)._2))
  }

  test("MinHashLSH join surfaces the duplicate pair") {
    val pairs = Embeddings.minhashJoin(docs, "doc_id", "text", maxJaccardDistance = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 4L)))
  }

  test("BucketedRandomProjectionLSH ANN join finds identical embeddings") {
    val emb = Seq(
      (1L, Array.fill(8)(0.5f)),
      (2L, Array.fill(8)(0.5f)),
      (3L, Array.tabulate(8)(i => if (i % 2 == 0) 5.0f else -5.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Embeddings.annJoin(emb, "vec_id", "embedding", maxL2Distance = 0.1)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("generated embeddings flow into the engine's ANN top-k") {
    val emb = Embeddings.tfidf(docs, "doc_id", "text", dim = 64)
      .select(col("doc_id").as("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
    val top1 = Similarity.bruteForceTopK(
      emb.filter(col("vec_id") === 1), emb,
      col("vec_id"), col("embedding"), col("vec_id"), col("embedding"), k = 1)
      .head()
    assert(top1.getLong(1) == 2L) // the exact dup is the nearest neighbor
  }
}
