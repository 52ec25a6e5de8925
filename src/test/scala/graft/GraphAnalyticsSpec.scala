package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphAnalytics

/** Pins the fixed-point PageRank arithmetic to hand-computed values, so the
  * integer contract (the thing that makes the DuckDB oracle hash-exact) can't
  * drift. scale=1e6, damp=85/100 ⇒ base = 150000.
  */
class GraphAnalyticsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("pageRankInt: hand-computed ranks on a 3-node path a→b→c") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    // iter1: contrib(x) = 1e6*85//100 = 850000 (out_deg 1)
    //   a = 150000 (no in-edges); b = 150000+850000 = 1000000; c = 1000000
    // iter2: contrib(a) = 150000*85//100 = 127500; contrib(b) = 850000
    //   a = 150000; b = 150000+127500 = 277500; c = 150000+850000 = 1000000
    val got = GraphAnalytics.pageRankInt(edges, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 150000L, 2L -> 277500L, 3L -> 1000000L))
  }

  test("pageRankInt: multi-edges weight contributions; fan-in sums") {
    // a has two parallel edges to b and one to c: out_deg(a) = 3.
    val edges = Seq((1L, 2L), (1L, 2L), (1L, 3L)).toDF("src", "dst")
    // iter1: contrib per edge = (1e6*85//100)//3 = 283333
    //   b = 150000 + 2*283333 = 716666; c = 150000 + 283333 = 433333
    val got = GraphAnalytics.pageRankInt(edges, iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 150000L, 2L -> 716666L, 3L -> 433333L))
  }

  test("pageRankInt: total rank is conserved up to integer-division dust") {
    // On a strongly-connected cycle nothing leaks to dangling nodes: the
    // total can only shrink by the per-node floor losses (< dampDen per node
    // per iteration) plus the base remainder.
    val n = 64L
    val edges = (0L until n).map(i => (i, (i + 1) % n)).toDF("src", "dst")
    val total = GraphAnalytics.pageRankInt(edges, iters = 5)
      .agg(org.apache.spark.sql.functions.sum("pr")).as[Long].head()
    val exact = n * 1000000L
    assert(total <= exact && total > exact - 5 * n * 100,
      s"total $total outside conservation envelope of $exact")
  }
}
