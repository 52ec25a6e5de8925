package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.pipeline.Similarity

/** Independent driver-side brute-force twins for the session's analytics
  * additions: each test recomputes the expected answer from the same
  * sf0.001 parquet with plain Scala collections (no Spark, no SQL), so a
  * bug shared between the Spark query and its DuckDB oracle cannot hide.
  */
class AnalyticsTwinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def cents(v: Double): Long =
    (BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  test("q_ks_test matches a sequential-scan KS computation") {
    val rows = Tables.events(spark, sf)
      .select("event_type", "value").as[(String, Double)].collect()
    val s1 = rows.filter(_._1 == "click").map(r => cents(r._2)).sorted
    val s2 = rows.filter(_._1 == "view").map(r => cents(r._2)).sorted
    val pooled = (s1 ++ s2).distinct.sorted
    def cdfCount(s: Array[Long], x: Long): Long = s.count(_ <= x).toLong
    val dNum = pooled.map(x =>
      math.abs(cdfCount(s1, x) * s2.length - cdfCount(s2, x) * s1.length)).max

    val got = SparkEntry.queries("q_ks_test")(spark, sf).head()
    assert(got.getLong(0) == s1.length.toLong)
    assert(got.getLong(1) == s2.length.toLong)
    assert(got.getLong(2) == dNum)
    assert(got.getDouble(3) == dNum.toDouble / (s1.length.toLong * s2.length))
    assert(got.getDouble(3) >= 0.0 && got.getDouble(3) <= 1.0)
  }

  test("events_ewma matches a sequential-scan fixed-point EWMA") {
    val hours = Tables.events(spark, sf).select("ts")
      .as[java.sql.Timestamp].collect()
      .map(t => Math.floorDiv(Math.floorDiv(t.getTime, 1000L), 3600L))
    val counts = hours.groupBy(identity).map { case (h, a) => h -> a.length.toLong }
    val expected = counts.keys.toSeq.sorted.map { t =>
      val fp = (0 to 19).map { j =>
        counts.getOrElse(t - j, 0L) * (1L << (19 - j))
      }.sum
      (t, counts(t), fp)
    }
    val got = SparkEntry.queries("events_ewma")(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3)) == expected)
    got.foreach(r => assert(r._4 == r._3.toDouble / 1048576.0))
    // a 20-hour-saturated constant-rate stretch would give fp = c*(2^20-1);
    // sanity: fp is always below that bound for the max hourly count
    val cMax = counts.values.max
    got.foreach(r => assert(r._3 <= cMax * ((1L << 20) - 1)))
  }

  test("events_funnel_steps matches a per-user sequential scan") {
    // microsecond precision end to end — getTime would truncate to ms
    val rowsUs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .as[(Long, String, Long)].collect()
    val byUser = rowsUs.groupBy(_._1)
    var n1, n2, n3, n4 = 0L
    byUser.foreach { case (_, evs) =>
      val t1 = evs.filter(_._2 == "view").map(_._3).sorted.headOption
      t1.foreach { a =>
        n1 += 1
        val t2 = evs.filter(e => e._2 == "click" && e._3 > a).map(_._3).sorted.headOption
        t2.foreach { b =>
          n2 += 1
          val t3 = evs.filter(e => e._2 == "purchase" && e._3 > b).map(_._3).sorted.headOption
          t3.foreach { c =>
            n3 += 1
            if (c <= a + 7L * 86400L * 1000000L) n4 += 1
          }
        }
      }
    }
    val got = SparkEntry.queries("events_funnel_steps")(spark, sf)
      .as[(Int, Long)].collect().toMap
    assert(got == Map(1 -> n1, 2 -> n2, 3 -> n3, 4 -> n4))
    assert(n1 >= n2 && n2 >= n3 && n3 >= n4)
    assert(rowsUs.nonEmpty)
  }

  test("graph_modularity matches a driver-side recomputation from the labels") {
    val e = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("u"), (lit(1000000000L) + col("l_partkey")).as("v"))
      .distinct().as[(Long, Long)].collect()
    val labels = graft.operators.GraphAnalytics.labelPropagation(
      Tables.lineitem(spark, sf)
        .select(col("l_orderkey").as("u"), (lit(1000000000L) + col("l_partkey")).as("v"))
        .distinct(), rounds = 4)
      .as[(Long, Long)].collect().toMap
    val m = e.length.toLong
    val mc = e.filter { case (u, v) => labels(u) == labels(v) }
      .groupBy { case (u, _) => labels(u) }.map { case (c, a) => c -> a.length.toLong }
    val deg = e.flatMap { case (u, v) => Seq(u, v) }
      .groupBy(identity).map { case (n, a) => n -> a.length.toLong }
    val dc = deg.toSeq.groupBy { case (n, _) => labels(n) }
      .map { case (c, a) => c -> a.map(_._2).sum }
    val qNum = dc.map { case (c, d_c) =>
      BigInt(4) * m * BigInt(mc.getOrElse(c, 0L)) - BigInt(d_c) * d_c }.sum
    val got = SparkEntry.queries("graph_modularity")(spark, sf).head()
    assert(got.getLong(0) == m)
    assert(got.getLong(1) == dc.size.toLong)
    assert(got.getLong(2) == qNum.toLong)
    assert(got.getDouble(3) == qNum.toDouble / (4.0 * m * m))
    assert(got.getDouble(3) >= -1.0 && got.getDouble(3) <= 1.0)
  }

  test("events_growth_accounting matches a per-user sequential recomputation") {
    val uw = Tables.events(spark, sf)
      .select(col("user_id"),
        expr("CAST(unix_timestamp(date_trunc('week', ts)) AS LONG) div 604800").as("wk"))
      .distinct().as[(Long, Long)].collect()
    val byUser = uw.groupBy(_._1).map { case (u, a) => u -> a.map(_._2).toSet }
    val allWeeks = uw.map(_._2).toSet
    val out = collection.mutable.Map[Long, Array[Long]]() // wk -> new,ret,res,churn
    def row(w: Long) = out.getOrElseUpdate(w, Array(0L, 0L, 0L, 0L))
    byUser.foreach { case (_, wks) =>
      val first = wks.min
      wks.foreach { w =>
        if (w == first) row(w)(0) += 1
        else if (wks.contains(w - 1)) row(w)(1) += 1
        else row(w)(2) += 1
        if (!wks.contains(w + 1)) row(w + 1)(3) += 1
      }
    }
    val got = SparkEntry.queries("events_growth_accounting")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> Array(r._2, r._3, r._4, r._5)).toMap
    assert(got.keySet == out.keySet)
    out.foreach { case (w, a) =>
      assert(got(w).toSeq == a.toSeq, s"week $w: ${got(w).toSeq} vs ${a.toSeq}")
    }
    // identity: every active week decomposes exactly
    val active = uw.groupBy(_._2).map { case (w, a) => w -> a.length.toLong }
    active.foreach { case (w, n) =>
      assert(got(w)(0) + got(w)(1) + got(w)(2) == n)
    }
    assert(allWeeks.nonEmpty)
  }

  test("events_concurrency matches a driver-side boundary sweep") {
    val ts = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")))
      .as[(Long, Long)].collect()
    val bounds = ts.flatMap { case (id, t) =>
      Seq((t, 1L, id), (t + 900000000L, -1L, id)) }
      .sortBy { case (t, dl, id) => (t, dl, id) }
    var lvl = 0L
    val peaks = collection.mutable.Map[Long, Long]()
    bounds.foreach { case (t, dl, _) =>
      lvl += dl
      val day = Math.floorDiv(t, 86400000000L)
      peaks(day) = math.max(peaks.getOrElse(day, Long.MinValue), lvl)
    }
    val got = SparkEntry.queries("events_concurrency")(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(got == peaks.toMap)
  }

  test("events_lateness matches a driver-side running-max scan") {
    val rows = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")))
      .as[(Long, Long)].collect().sortBy(_._1)
    var runMax = Long.MinValue
    val hist = collection.mutable.Map[Long, Long]()
    rows.foreach { case (_, t) =>
      runMax = math.max(runMax, t)
      val lateS = Math.floorDiv(runMax - t, 1000000L)
      hist(lateS) = hist.getOrElse(lateS, 0L) + 1
    }
    val got = SparkEntry.queries("events_lateness")(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(got == hist.toMap)
    assert(got.contains(0L)) // the high-water-mark events themselves
  }

  test("events_backlog closed form equals the sequential Lindley recursion") {
    import org.apache.spark.sql.expressions.Window
    // W_t = max(0, W_{t-1} + net_t), including a deep-negative run that
    // forces the clamp, then recovery
    val net = Seq(5L, -8L, 3L, -2L, 7L, -30L, 4L, 4L, -1L)
    val truth = net.scanLeft(0L)((w, x) => math.max(0L, w + x)).tail
    val df = net.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("hr", "net")
    val w = Window.orderBy("hr")
    val out = df.withColumn("cum", sum("net").over(w))
      .withColumn("runmin", least(lit(0L), min("cum").over(w)))
      .select(col("hr"), (col("cum") - col("runmin")).as("backlog"))
      .orderBy("hr").as[(Long, Long)].collect().map(_._2).toSeq
    assert(out == truth)
  }

  test("hardNegatives skips same-label neighbors however close") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 7),
      (1L, Array(0.999f, 0.01f), 7), // nearest overall — same label, excluded
      (2L, Array(0.9f, 0.1f), 3),
      (3L, Array(0.0f, 1.0f), 3)).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(
      vecs.filter(col("vec_id") === 0), vecs,
      col("vec_id"), col("embedding"), col("label"),
      col("vec_id"), col("embedding"), col("label"), k = 2)
      .orderBy("rank").as[(Long, Long, Int)].collect()
    assert(out.map(_._2).toSeq == Seq(2L, 3L))
    assert(out.map(_._3).toSeq == Seq(1, 2))
  }
}
