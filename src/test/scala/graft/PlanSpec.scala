package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality regression gate: the properties that make these operators
  * scale are physical-plan shapes, so pin them. A refactor that silently
  * turns the edge lookup into a BroadcastNestedLoopJoin or loses parquet
  * pushdown fails here, not in production.
  */
class PlanSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** Formatted explain (full ReadSchema / PushedFilters, no truncation). */
  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  /** Final adaptive plan, after execution (codegen spans materialized). */
  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("r1 point lookup pushes the predicate into the parquet scan") {
    val p = plan("r1_point_lookup")
    // the name filter is derived from p_partkey format_string, so the scan
    // must at least prune columns to the two used
    assert(p.contains("ReadSchema: struct<p_partkey:bigint,p_type:string>"))
  }

  test("r4 search ends in TakeOrderedAndProject (top-k, no global sort)") {
    val p = plan("r4_search")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("r7 recency top-k is TakeOrderedAndProject") {
    assert(plan("r7_recent").contains("TakeOrderedAndProject"))
  }

  test("r8 edge lookup avoids nested-loop join (single scan + broadcast flag joins)") {
    val p = plan("r8_edges")
    assert(!p.contains("BroadcastNestedLoopJoin"))
    // one relations scan, membership via broadcast-hash left joins
    // (formatted explain lists every node twice: tree + detail section)
    assert(p.contains("BroadcastHashJoin"))
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size == 1,
      s"r8 must scan relations once:\n$p")
  }

  test("r10 builds the searched hit set once (runtime exchange reuse)") {
    // the two membership flag-joins broadcast the SAME canonicalized search
    // plan; AQE must materialize it once and reuse it, or the whole search
    // runs twice
    val p = finalPlan("r10_search_nodes")
    assert(p.contains("ReusedExchange") ||
      "\\(\\d+\\) TakeOrderedAndProject".r.findAllIn(p).size == 1,
      s"r10 must not evaluate the search subtree twice:\n$p")
  }

  test("q1 aggregation has map-side partial aggregation") {
    val p = plan("q1_agg")
    assert(p.contains("HashAggregate"))
    // partial + final pairs: two HashAggregate levels around one Exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("q3 join keeps the filtered dimension on the broadcast side") {
    val p = plan("q3_top_revenue")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("flagship queries stay inside WholeStageCodegen") {
    Seq("q1_agg", "r4_search", "text_quality", "dedup_simhash").foreach { q =>
      assert(finalPlan(q).contains("codegen id"), s"$q lost codegen")
    }
  }

  test("scans prune columns: q1 reads only the 5 referenced lineitem columns") {
    val p = plan("q1_agg")
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double," +
      "l_discount:double,l_returnflag:string,l_linestatus:string>"))
  }
}
