package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

/** Semantics of the backward as-of join (point-in-time lookup). */
class AsOfJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // prices: key A at t=10,20,30; key B at t=15
  private val prices = Seq(
    ("A", ts(10), 1.0), ("A", ts(20), 2.0), ("A", ts(30), 3.0),
    ("B", ts(15), 9.0)
  ).toDF("k", "price_ts", "price")

  // trades probing at various times
  private val trades = Seq(
    ("A", 1L, ts(25)), // between 20 and 30 → price 2.0
    ("A", 2L, ts(20)), // exactly at 20 → inclusive → 2.0
    ("A", 3L, ts(5)),  // before any price → dropped (inner)
    ("B", 4L, ts(50)), // long after → 9.0
    ("C", 5L, ts(10))  // key with no prices → dropped
  ).toDF("k", "trade_id", "trade_ts")

  test("backward match picks the latest right row at-or-before; inner semantics") {
    val out = AsOfJoin.asofBackward(trades, prices, "k", "trade_ts", "price_ts",
        rightPayload = Seq("price"))
      .select("trade_id", "price")
      .as[(Long, Double)].collect().toMap
    assert(out == Map(1L -> 2.0, 2L -> 2.0, 4L -> 9.0))
  }

  test("tolerance drops matches older than the lookback window") {
    val out = AsOfJoin.asofBackward(trades, prices, "k", "trade_ts", "price_ts",
        rightPayload = Seq("price"),
        tolerance = Some(expr("INTERVAL 10 SECONDS")))
      .select("trade_id", "price")
      .as[(Long, Double)].collect().toMap
    // trade 4 at t=50 is 35s after B's only price at t=15 → dropped
    assert(out == Map(1L -> 2.0, 2L -> 2.0))
  }

  test("equal right timestamps emit the same matched ts regardless of pick") {
    val dupPrices = Seq(("A", ts(10), 1.0), ("A", ts(10), 1.5)).toDF("k", "price_ts", "price")
    val probe = Seq(("A", 1L, ts(12))).toDF("k", "trade_id", "trade_ts")
    val out = AsOfJoin.asofBackward(probe, dupPrices, "k", "trade_ts", "price_ts")
      .select("trade_id", "price_ts").as[(Long, Timestamp)].collect()
    assert(out.toSeq == Seq((1L, ts(10))))
  }

  test("NULL keys never match (join semantics, unlike a window partition)") {
    val p = Seq((Option.empty[String], 1L, ts(20)), (Some("A"), 2L, ts(25)))
      .toDF("k", "trade_id", "trade_ts")
    val r = Seq((Option.empty[String], ts(10), 9.0), (Some("A"), ts(10), 1.0))
      .toDF("k", "price_ts", "price")
    val out = AsOfJoin.asofBackward(p, r, "k", "trade_ts", "price_ts",
        rightPayload = Seq("price"))
      .select("trade_id", "price").as[(Long, Double)].collect().toMap
    assert(out == Map(2L -> 1.0)) // the NULL-key trade is dropped, not matched
  }

  test("matches the plain-SQL formulation on real events data") {
    val e = Tables.events(spark, "/root/testdata/sf0.001")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts").as("purchase_ts"))
    val s = e.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("signup_ts"))
    val fast = AsOfJoin.asofBackward(p, s, "user_id", "purchase_ts", "signup_ts")
      .select("event_id", "signup_ts")
    // reference formulation: range join + per-left max (correct but
    // quadratic per key — the semantic oracle, not the scale path)
    val slow = p.join(s, Seq("user_id"))
      .filter(col("signup_ts") <= col("purchase_ts"))
      .groupBy("event_id").agg(max("signup_ts").as("signup_ts"))
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
  }

  test("plan shape: exactly one exchange (the key shuffle), no joins") {
    val plan = AsOfJoin.asofBackward(trades, prices, "k", "trade_ts", "price_ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
  }
}
