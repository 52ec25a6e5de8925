package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** Semantics + plan shape of the bucketed point-in-interval range join. */
class RangeJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val points = Seq((1L, 5L), (2L, 10L), (3L, 17L), (4L, 100L))
    .toDF("pid", "pt")
  private val intervals = Seq((10L, 0L, 9L), (20L, 10L, 10L), (30L, 15L, 40L))
    .toDF("iid", "lo", "hi")

  test("inclusive bounds; pairs found across bin boundaries; no duplicates") {
    Seq(1L, 3L, 7L, 64L).foreach { bw => // result must be binWidth-invariant
      val out = RangeJoin.pointInRange(points, intervals, "pt", "lo", "hi", bw)
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      assert(out == Seq((1L, 10L), (2L, 20L), (3L, 30L)), s"binWidth=$bw")
    }
  }

  test("matches the naive range-predicate join on real data") {
    val sf = "/root/testdata/sf0.001"
    val epoch = lit("1970-01-01").cast("date")
    val o = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"),
        datediff(col("o_orderdate"), epoch).cast("long").as("lo"))
      .withColumn("hi", col("lo") + 6)
    val l = Tables.lineitem(spark, sf)
      .select(datediff(col("l_shipdate"), epoch).cast("long").as("pt"))
    val fast = RangeJoin.pointInRange(l, o, "pt", "lo", "hi", 7)
      .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
    val slow = l.join(o, col("pt") >= col("lo") && col("pt") <= col("hi"))
      .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
    assert(fast.count() > 0)
  }

  test("axis values beyond 2^53 bin exactly (integer floor-div, not double)") {
    // epoch-nanos-scale values: double division would mis-bin these
    val base = 1_700_000_000_000_000_000L
    val pts = Seq((1L, base + 5L), (2L, base + 105L)).toDF("pid", "pt")
    val ivs = Seq((10L, base + 3L, base + 9L)).toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInRange(pts, ivs, "pt", "lo", "hi", 100L)
      .select("pid", "iid").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 10L)))
  }

  test("plan shape: equi-join on the bin, no nested-loop join") {
    val plan = RangeJoin.pointInRange(points, intervals, "pt", "lo", "hi", 7)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must not plan a nested loop:\n$plan")
  }

  test("pointInRangeKeyed: entities isolated; matches naive keyed predicate join") {
    // two users with overlapping time windows: user 1's point must not match
    // user 2's interval even though the ranges overlap
    val pts = Seq((1L, 50L, "p1"), (2L, 50L, "p2"), (1L, 500L, "p3"))
      .toDF("pu", "pt", "ptag")
    val ivs = Seq((1L, 40L, 60L, "i1"), (2L, 45L, 55L, "i2"), (2L, 400L, 600L, "i3"))
      .toDF("iu", "lo", "hi", "itag")
    val got = RangeJoin.pointInRangeKeyed(pts, ivs, "pu", "iu", "pt", "lo", "hi", 7L)
      .select("ptag", "itag").as[(String, String)].collect().toSet
    val naive = pts.join(ivs, $"pu" === $"iu" && $"pt" >= $"lo" && $"pt" <= $"hi")
      .select("ptag", "itag").as[(String, String)].collect().toSet
    assert(got == naive)
    assert(got == Set(("p1", "i1"), ("p2", "i2"))) // p3: right time, wrong user
  }
}
