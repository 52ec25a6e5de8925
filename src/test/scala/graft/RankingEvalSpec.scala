package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SearchIndex

class RankingEvalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def eval(rows: Seq[(String, Long, Long, Long)], k: Int) =
    SearchIndex.rankingEval(rows.toDF("q", "doc", "rel", "score"),
      col("q"), col("doc"), col("rel"), col("score"), k)

  test("dcgWeights: rank-1 weight is exactly 1e6, weights strictly decrease") {
    val w = SearchIndex.dcgWeights(10)
    assert(w.head === 1000000L)
    assert(w(2) === 500000L) // 1e6 / log2(4)
    assert(w.sliding(2).forall(p => p(0) > p(1)))
  }

  test("rankingEval: hand-computed nDCG/MRR/recall on one query") {
    val rows = Seq(
      ("q", 1L, 3L, 100L), ("q", 2L, 1L, 90L), ("q", 3L, 3L, 80L))
    val r = eval(rows, k = 3).collect().head
    val dcg = 3L * 1000000 + 1L * 630929 + 3L * 500000
    val idcg = 3L * 1000000 + 3L * 630929 + 1L * 500000
    assert(r.getAs[Long]("dcg_fp") === dcg)
    assert(r.getAs[Long]("idcg_fp") === idcg)
    assert(r.getAs[Long]("ndcg_ppm") === dcg * 1000000 / idcg)
    assert(r.getAs[Long]("rank_first") === 1L)
    assert(r.getAs[Long]("rr_ppm") === 1000000L)
    assert(r.getAs[Long]("rel2_total") === 2L)
    assert(r.getAs[Long]("recall2_ppm") === 1000000L)
  }

  test("rankingEval: a perfect ranking has ndcg_ppm exactly 1e6") {
    val rows = Seq(
      ("q", 1L, 3L, 90L), ("q", 2L, 2L, 80L), ("q", 3L, 1L, 70L))
    assert(eval(rows, 3).collect().head.getAs[Long]("ndcg_ppm") === 1000000L)
  }

  test("rankingEval: relevant doc pushed below k costs recall and nDCG") {
    // rel-3 doc ranked 4th with k=3
    val rows = Seq(
      ("q", 1L, 1L, 100L), ("q", 2L, 1L, 90L), ("q", 3L, 1L, 80L),
      ("q", 4L, 3L, 70L))
    val r = eval(rows, k = 3).collect().head
    assert(r.getAs[Long]("rank_first") === 4L)
    assert(r.getAs[Long]("rr_ppm") === 250000L)
    assert(r.getAs[Long]("rel2_total") === 1L)
    assert(r.getAs[Long]("rel2_top") === 0L)
    assert(r.getAs[Long]("recall2_ppm") === 0L)
    assert(r.getAs[Long]("ndcg_ppm") < 1000000L)
  }

  test("rankingEval: no graded hits -> zero MRR/recall, zero idcg guarded") {
    val rows = Seq(("q", 1L, 0L, 100L), ("q", 2L, 0L, 90L))
    val r = eval(rows, 3).collect().head
    assert(r.getAs[Long]("ndcg_ppm") === 0L)
    assert(r.getAs[Long]("rank_first") === 0L)
    assert(r.getAs[Long]("rr_ppm") === 0L)
    assert(r.getAs[Long]("recall2_ppm") === 0L)
  }

  test("rankingEval: queries are independent groups") {
    val rows = Seq(
      ("a", 1L, 3L, 10L), ("b", 1L, 1L, 10L), ("b", 2L, 3L, 5L))
    val out = eval(rows, 2).orderBy("query").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("rank_first") === 1L)
    assert(out(1).getAs[Long]("rank_first") === 2L)
  }
}
