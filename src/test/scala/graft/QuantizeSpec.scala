package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions.{intDot, quantizeInt8}
import graft.pipeline.Similarity

/** Pins the int8 scalar-quantization contract (QuantizeInt8Expr /
  * IntDotExpr) and the quantized ANN path: exact quantized codes on known
  * vectors, exact integer dots, and quantized top-k agreeing with exact
  * top-k on a well-separated fixture.
  */
class QuantizeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("quantizeInt8: known codes, extremes hit ±127, all-zero stays zero") {
    val df = Seq(
      (1L, Seq(1.0f, -2.0f, 0.5f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("id", "v")
    val out = df.select(col("id"), quantizeInt8(col("v")).as("q"))
      .orderBy("id").as[(Long, Seq[Byte])].collect()
    // maxabs=2: 1.0→floor(63.5+0.5)=64, -2.0→-127, 0.5→floor(31.75+0.5)=32, 0→0
    assert(out(0)._2 == Seq[Byte](64, -127, 32, 0))
    assert(out(1)._2 == Seq[Byte](0, 0, 0, 0))
  }

  test("intDot: exact integer dot product and self-dot as squared norm") {
    val df = Seq((Seq(1.0f, -2.0f, 0.5f, 0.0f), Seq(-2.0f, 1.0f, 2.0f, 1.0f)))
      .toDF("a", "b")
    val r = df.select(
      intDot(quantizeInt8(col("a")), quantizeInt8(col("b"))).as("dot"),
      intDot(quantizeInt8(col("a")), quantizeInt8(col("a"))).as("na"))
      .as[(Long, Long)].head()
    // qa = [64,-127,32,0]; qb (maxabs=2) = [-127,64,127,64]
    assert(r._1 == 64L * -127 + -127L * 64 + 32L * 127)
    assert(r._2 == 64L * 64 + 127L * 127 + 32L * 32)
  }

  test("signWord: exact bit patterns on known signs") {
    // dims 0..63: positive iff dim % 3 == 0 → bit j of word w set iff
    // (32w + j) % 3 == 0; zero entries must NOT set bits (strict > 0)
    val v = (0 until 64).map(i =>
      if (i % 3 == 0) 1.5f else if (i % 2 == 0) 0.0f else -2.0f)
    val df = Seq((1L, v)).toDF("id", "emb")
    val (w0, w1) = df.select(
      Similarity.signWord(col("emb"), 0).as("w0"),
      Similarity.signWord(col("emb"), 32).as("w1"))
      .as[(Long, Long)].head()
    def expected(from: Int): Long =
      (0 until 32).map(j => if ((from + j) % 3 == 0) 1L << j else 0L).sum
    assert(w0 == expected(0) && w1 == expected(32))
  }

  test("hammingRerank with full-corpus shortlist equals exact brute-force top-k") {
    // with shortlist >= corpus the Hamming stage prunes nothing, so the
    // exact-cosine rerank must reproduce bruteForceTopK verbatim
    val rnd = new scala.util.Random(19)
    val vecs = (0 until 12).map { i =>
      (i.toLong, Seq.fill(64)((rnd.nextFloat() - 0.5f) * 4f))
    }.toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") < 3)
    val exact = Similarity.bruteForceTopK(q, vecs,
      col("vec_id"), col("embedding"), col("vec_id"), col("embedding"), k = 4)
      .orderBy("query_id", "rank").as[(Long, Long, Int)].collect()
    val ham = Similarity.hammingRerank(q, vecs,
      col("vec_id"), col("embedding"), col("vec_id"), col("embedding"),
      shortlist = 12, k = 4)
      .orderBy("query_id", "rank").as[(Long, Long, Int)].collect()
    assert(ham.toSeq == exact.toSeq)
  }

  test("quantizedTopK matches exact top-k on well-separated vectors") {
    // three tight clusters in 4-d; nearest neighbors are unambiguous, so
    // 1/127-scale quantization noise cannot flip any rank
    val vecs = (0 until 12).map { i =>
      val base = Array.fill(4)(0.0f)
      base(i % 3) = 10.0f
      base(3) = (i / 3).toFloat * 0.1f
      (i.toLong, base.toSeq)
    }.toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") < 3)
    val exact = Similarity.bruteForceTopK(q, vecs,
      col("vec_id"), col("embedding"), col("vec_id"), col("embedding"), k = 3)
      .orderBy("query_id", "rank").as[(Long, Long, Int)].collect()
    val quant = Similarity.quantizedTopK(q, vecs,
      col("vec_id"), col("embedding"), col("vec_id"), col("embedding"), k = 3)
      .orderBy("query_id", "rank").as[(Long, Long, Int)].collect()
    assert(quant.toSeq == exact.toSeq)
  }
}
