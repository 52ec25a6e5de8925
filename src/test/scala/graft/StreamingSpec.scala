package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventOps

case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)
case class SEv(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double, op: Int)

/** Structured Streaming specs: the streaming forms must agree with their
  * batch twins (SURVEY §7.3 — streaming state has no reference analog, so
  * batch recomputation is the oracle).
  */
class StreamingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val evs = Seq(
    Ev(1, ts("2024-01-01 00:05:00"), 1, "click", 1.0),
    Ev(2, ts("2024-01-01 00:20:00"), 1, "click", 2.0),
    Ev(3, ts("2024-01-01 01:10:00"), 1, "view", 3.0),   // >30min gap → new session
    Ev(4, ts("2024-01-01 00:10:00"), 2, "click", 4.0),
    Ev(5, ts("2024-01-01 02:00:00"), 2, "buy", 5.0),    // new session
    Ev(6, ts("2024-01-01 02:10:00"), 2, "buy", 6.0))

  // far-future flush event: advances the watermark so append-mode emits all
  // real windows/sessions before the query stops.
  private val flush = Ev(99, ts("2024-06-01 00:00:00"), 999, "flush", 0.0)

  private def runStream(agg: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      name: String): org.apache.spark.sql.DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = agg(mem.toDF()).writeStream
      .outputMode("append").format("memory").queryName(name).start()
    mem.addData(evs: _*)
    q.processAllAvailable()
    mem.addData(flush)
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("stream-static broadcast enrichment: stateless, equals the batch join") {
    import spark.implicits._
    val dim = Seq(("click", 1L), ("view", 2L), ("buy", 5L), ("flush", 0L))
      .toDF("event_type", "weight")
    val got = runStream(
      s => s.join(org.apache.spark.sql.functions.broadcast(dim), "event_type"),
      "enrich")
      .select("event_id", "weight").as[(Long, Long)].collect().toSet
    val want = (evs :+ flush).toDF()
      .join(dim, "event_type")
      .select("event_id", "weight").as[(Long, Long)].collect().toSet
    // stateless by construction: a static-side broadcast join keeps the
    // stream append-only — no state store or watermark was configured and
    // every row still arrived exactly once
    assert(got == want && got.size == 7)
  }

  test("ewmaByHour streaming equals the batch twin on finalized windows") {
    val got = runStream(s => EventOps.ewmaByHour(s), "ewma_hours")
      .as[(Timestamp, Long)].collect().toMap
    val batchAll = EventOps.ewmaByHour((evs :+ flush).toDF())
      .as[(Timestamp, Long)].collect().toMap
    // append mode emits exactly the finalized prefix of the batch answer:
    // every emitted window matches the batch twin bit-for-bit, and every
    // real (January) window was finalized by the flush's watermark advance
    assert(got.forall { case (k, v) => batchAll.get(k).contains(v) })
    val want = EventOps.ewmaByHour(evs.toDF())
      .as[(Timestamp, Long)].collect().toMap
    assert(want.keySet.subsetOf(got.keySet))
    want.foreach { case (k, v) => assert(got(k) == v) }
    // hand-pinned fixed point: hour 00 has 3 events, each weight 2^19
    assert(want(ts("2024-01-01 00:00:00")) == 3L * (1L << 19))
    // hour 01 = hour-00 mass halved + its own event: 3·2^18 + 2^19
    assert(want(ts("2024-01-01 01:00:00")) == 3L * (1L << 18) + (1L << 19))
    // 20 hours after the last event the mass is gone: exactly the scatter
    // horizon many windows exist past each contributing hour
    assert(!want.contains(ts("2024-01-02 02:00:00")))
  }

  test("stateful first-seen dedup drops duplicates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val deduped = graft.streaming.StatefulOps.dedupeFirstSeen[Long, Ev](
      mem.toDF().withWatermark("ts", "0 seconds").as[Ev],
      _.event_id, _.ts.getTime, retentionMs = 365L * 24 * 3600 * 1000)
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    mem.addData(evs(0), evs(1), evs(1)) // ids 1,2 + in-batch dup; wm → 00:20
    q.processAllAvailable()
    // a batch with OTHER keys advances the watermark to 02:00 — the old
    // watermark-anchored timeout expired first-batch keys right here
    mem.addData(evs(2), evs(4))
    q.processAllAvailable()
    // NON-late duplicate of key 1 (fresh ts, state must drop it) + fresh id
    mem.addData(
      Ev(1, ts("2024-01-01 02:30:00"), 1, "click", 9.9),
      Ev(6, ts("2024-01-01 02:30:00"), 9, "view", 0.0))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_out").select("event_id")
      .as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L, 5L, 6L)) // each id exactly once
  }

  test("stateful dedup in batch mode equals first-per-key") {
    val withDups = (evs ++ Seq(evs(0), evs(3))).toDS()
    val out = graft.streaming.StatefulOps.dedupeFirstSeen[Long, Ev](
      withDups, _.event_id, _.ts.getTime, retentionMs = 1000L)
      .collect().map(_.event_id).sorted.toSeq
    assert(out == evs.map(_.event_id).sorted.toSeq)
  }

  test("stateful funnel detection: strict order, one hit per key, stream == batch") {
    def stage(e: Ev): Int = e.event_type match {
      case "view" => 0; case "click" => 1; case "buy" => 2; case _ => -1
    }
    val fevs = Seq(
      Ev(20, ts("2024-01-01 00:00:00"), 1, "click", 0.0), // click BEFORE view: no stage
      Ev(21, ts("2024-01-01 00:10:00"), 1, "view", 0.0),  // t1
      Ev(22, ts("2024-01-01 00:20:00"), 1, "click", 0.0), // t2
      Ev(23, ts("2024-01-01 00:30:00"), 1, "buy", 0.0),   // t3 → hit
      Ev(24, ts("2024-01-01 00:40:00"), 1, "buy", 0.0),   // second buy ignored
      Ev(25, ts("2024-01-01 00:05:00"), 2, "view", 0.0),
      Ev(26, ts("2024-01-01 00:06:00"), 2, "buy", 0.0))   // buy w/o click: no hit
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = graft.streaming.StatefulOps.funnelDetect[Long, Ev](
        mem.toDF().withWatermark("ts", "0 seconds").as[Ev],
        _.user_id, _.ts.getTime, stage, retentionMs = 365L * 24 * 3600 * 1000)
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_out").start()
    // split across micro-batches: state must carry the partial funnel
    mem.addData(fevs.take(3): _*)
    q.processAllAvailable()
    mem.addData(fevs.drop(3): _*)
    q.processAllAvailable()
    mem.addData(flush)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("funnel_out")
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    val batch = graft.streaming.StatefulOps.funnelDetect[Long, Ev](
        fevs.toDS(), _.user_id, _.ts.getTime, stage, retentionMs = 1000L)
      .collect().sorted.toSeq
    assert(streamed == batch)
    assert(batch == Seq((1L, ts("2024-01-01 00:10:00").getTime,
      ts("2024-01-01 00:20:00").getTime, ts("2024-01-01 00:30:00").getTime)))
  }

  test("stream-stream interval join equals its batch twin") {
    val funnelEvs = Seq(
      Ev(10, ts("2024-01-01 00:00:00"), 1, "signup", 0.0),
      Ev(11, ts("2024-01-01 00:30:00"), 1, "purchase", 5.0), // within 1h → match
      Ev(12, ts("2024-01-01 02:30:00"), 1, "purchase", 6.0), // >1h → no match
      Ev(13, ts("2024-01-01 01:00:00"), 2, "signup", 0.0),
      Ev(14, ts("2024-01-01 01:59:00"), 2, "purchase", 7.0)) // within → match
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventOps.conversionsWithin(mem.toDF(), "1 HOUR", "0 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("conv_out").start()
    mem.addData(funnelEvs: _*)
    q.processAllAvailable()
    mem.addData(flush.copy(event_type = "signup"), flush.copy(event_id = 100, event_type = "purchase"))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("conv_out")
      .filter($"user_id" =!= 999)
      .select("user_id", "purchase_id").as[(Long, Long)].collect().sorted.toSeq
    val batch = EventOps.conversionsWithin(funnelEvs.toDF(), "1 HOUR")
      .select("user_id", "purchase_id").as[(Long, Long)].collect().sorted.toSeq
    assert(streamed == batch && batch == Seq((1L, 11L), (2L, 14L)))
  }

  test("stream-stream LEFT OUTER interval join: abandoned signups emit null rows after watermark") {
    val funnelEvs = Seq(
      Ev(10, ts("2024-01-01 00:00:00"), 1, "signup", 0.0),
      Ev(11, ts("2024-01-01 00:30:00"), 1, "purchase", 5.0), // within 1h → match
      Ev(13, ts("2024-01-01 01:00:00"), 2, "signup", 0.0),   // never converts
      Ev(15, ts("2024-01-01 02:30:00"), 2, "purchase", 7.0), // >1h late → still null row
      Ev(16, ts("2024-01-01 03:00:00"), 3, "signup", 0.0))   // no purchase at all
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventOps.conversionsWithinOuter(mem.toDF(), "1 HOUR", "0 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("conv_outer_out").start()
    mem.addData(funnelEvs: _*)
    q.processAllAvailable()
    // the null rows for signups 13/16 can only emit once the watermark
    // passes signup_ts + 1h — push it with far-future flush events
    mem.addData(flush.copy(event_type = "signup"),
      flush.copy(event_id = 100, event_type = "purchase"))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("conv_outer_out")
      .filter($"user_id" =!= 999)
      .select($"signup_id", coalesce($"purchase_id", lit(-1L)))
      .as[(Long, Long)].collect().sorted.toSeq
    val batch = EventOps.conversionsWithinOuter(funnelEvs.toDF(), "1 HOUR")
      .select($"signup_id", coalesce($"purchase_id", lit(-1L)))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(streamed == batch)
    assert(batch == Seq((10L, 11L), (13L, -1L), (16L, -1L)))
  }

  test("streaming tumbling agg equals batch tumbling agg") {
    val streamed = runStream(
      df => EventOps.tumbling(EventOps.withWatermarkIfStreaming(df, "ts", "0 seconds"), "1 hour")
        .drop("sum_value"), // decimal sum compared separately in batch tests
      "tumbling_out")
      .filter($"event_type" =!= "flush")
      .orderBy("window_start", "event_type")
      .collect().toSeq
    val batch = EventOps.tumbling(evs.toDF(), "1 hour")
      .drop("sum_value")
      .orderBy("window_start", "event_type")
      .collect().toSeq
    assert(streamed == batch)
  }

  test("streaming signed (CDC retraction) agg equals batch netting; pairs cancel exactly") {
    // the insert stream plus LATE retractions of user 1's events — the
    // signed op is a data column, so the same watermark-bounded windowed
    // sum runs in append mode with no update-mode machinery
    val retractions = evs.filter(_.user_id == 1)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SEv]
    // 6h late-tolerance: retractions land in a LATER micro-batch than
    // their inserts, so the windows must not finalize until the flush —
    // the correction horizon is exactly the watermark delay, the honest
    // contract for CDC over append-mode streaming
    val q = EventOps.tumblingSigned(
        EventOps.withWatermarkIfStreaming(mem.toDF(), "ts", "6 hours"),
        "1 hour", col("op"))
      .writeStream.outputMode("append").format("memory")
      .queryName("signed_out").start()
    mem.addData(evs.map(e => SEv(e.event_id, e.ts, e.user_id, e.event_type, e.value, 1)): _*)
    q.processAllAvailable()
    // retractions arrive LATER in stream order but inside the watermark
    mem.addData(retractions.map(e => SEv(e.event_id + 50, e.ts, e.user_id, e.event_type, e.value, -1)): _*)
    q.processAllAvailable()
    mem.addData(SEv(99, flush.ts, 999, "flush", 0.0, 1))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("signed_out")
      .filter($"event_type" =!= "flush")
      .select($"window_start", $"event_type", $"n", $"sum_value".cast("double"))
      .orderBy("window_start", "event_type")
      .collect().toSeq
    // batch twin over the NET events (user 1 fully retracted)
    val net = evs.filterNot(_.user_id == 1)
    val batch = EventOps.tumbling(net.toDF(), "1 hour")
      .select($"window_start", $"event_type", $"n", $"sum_value".cast("double"))
      .orderBy("window_start", "event_type")
      .collect().toSeq
    assert(streamed == batch, s"signed streaming netting diverged:\n$streamed\nvs\n$batch")
    // user 1's windows are fully retracted → gone, not present with n=0
    assert(!streamed.exists(r => r.getLong(2) == 0))
  }

  test("streaming sliding agg equals batch sliding agg") {
    val streamed = runStream(
      df => EventOps.sliding(EventOps.withWatermarkIfStreaming(df, "ts", "0 seconds"),
        "1 hour", "30 minutes"),
      "sliding_out")
      .filter($"event_type" =!= "flush")
      .orderBy("window_start", "event_type")
      .collect().toSeq
    val batch = EventOps.sliding(evs.toDF(), "1 hour", "30 minutes")
      .orderBy("window_start", "event_type")
      .collect().toSeq
    assert(streamed == batch)
  }

  test("streaming windowed expectations equal the batch suite per window") {
    val exps = Seq(
      "value_positive" -> ($"value" > 0),
      "click_only" -> ($"event_type" === "click")) // real violations per window
    val streamed = runStream(
      df => EventOps.expectationsByWindow(
        EventOps.withWatermarkIfStreaming(df, "ts", "0 seconds"), exps, "1 hour"),
      "expect_out")
      .filter($"window_start" < ts("2024-06-01 00:00:00")) // drop the flush window
      .orderBy("window_start", "expectation")
      .collect().toSeq
    val batch = EventOps.expectationsByWindow(evs.toDF(), exps, "1 hour")
      .orderBy("window_start", "expectation")
      .collect().toSeq
    assert(streamed == batch && batch.size == 6) // 3 hourly windows × 2 assertions
  }

  test("streaming windowed histogram equals the batch binned counts") {
    val streamed = runStream(
      df => EventOps.histogramByWindow(
        EventOps.withWatermarkIfStreaming(df, "ts", "0 seconds"),
        (col("value") * 100).cast("long"), binWidth = 200L, every = "1 hour"),
      "hist_out")
      .filter($"window_start" < ts("2024-06-01 00:00:00")) // drop the flush window
      .orderBy("window_start", "bin")
      .collect().toSeq
    val batch = EventOps.histogramByWindow(evs.toDF(),
      (col("value") * 100).cast("long"), binWidth = 200L, every = "1 hour")
      .orderBy("window_start", "bin")
      .collect().toSeq
    // values 1..6 ×100 with width 200 → real bin splits inside windows
    assert(streamed == batch && batch.nonEmpty)
  }

  test("streaming CMS probe monitor equals the batch estimates per window") {
    val probes = Seq(1L, 2L, 3L, 99L) // 99 absent → estimate 0 (or collision overcount)
    val streamed = runStream(
      df => EventOps.cmsProbeByWindow(
        EventOps.withWatermarkIfStreaming(df, "ts", "0 seconds"),
        col("user_id"), probes, depth = 4, width = 64, every = "1 hour"),
      "cms_out")
      .filter($"window_start" < ts("2024-06-01 00:00:00")) // drop the flush window
      .orderBy("window_start", "probe_key")
      .collect().toSeq
    val batch = EventOps.cmsProbeByWindow(evs.toDF(), col("user_id"),
        probes, depth = 4, width = 64, every = "1 hour")
      .orderBy("window_start", "probe_key")
      .collect().toSeq
    assert(streamed == batch && batch.nonEmpty)
    // every estimate is an overestimate of the window's true key count
    val truth = evs.groupBy(e => (e.ts.getTime / 3600000L, e.user_id))
      .map { case (k, rs) => k -> rs.size.toLong }
    batch.foreach { r =>
      val w = r.getTimestamp(0).getTime / 3600000L
      val est = r.getLong(2)
      assert(est >= truth.getOrElse((w, r.getLong(1)), 0L),
        s"CMS under-estimated $r")
    }
  }

  test("streaming windowed KLL quantiles match batch within the rank-error band") {
    val streamed = runStream(
      df => EventOps.quantilesByWindow(
        EventOps.withWatermarkIfStreaming(df, "ts", "0 seconds"),
        $"event_type", $"value", "1 hour"),
      "kll_out")
      .filter($"window_start" < ts("2024-06-01 00:00:00")) // drop the flush window
      .orderBy("window_start", "g")
      .select("window_start", "g", "n_rows", "p50")
      .as[(Timestamp, String, Long, Double)].collect().toSeq
    val batch = EventOps.quantilesByWindow(evs.toDF(), $"event_type", $"value", "1 hour")
      .orderBy("window_start", "g")
      .select("window_start", "g", "n_rows", "p50")
      .as[(Timestamp, String, Long, Double)].collect().toSeq
    // identical grouping/counts; estimates agree within the band (tiny
    // groups here, so KLL is exact — but pin only the contract: ±1 value)
    assert(streamed.map(r => (r._1, r._2, r._3)) == batch.map(r => (r._1, r._2, r._3)))
    assert(streamed.nonEmpty &&
      streamed.zip(batch).forall { case (s, b) => math.abs(s._4 - b._4) <= 1.0 })
  }

  test("streaming session_window equals batch gaps-and-islands sessionization") {
    val streamed = runStream(
      df => EventOps.sessionWindowStreaming(
        EventOps.withWatermarkIfStreaming(df, "ts", "0 seconds"), "30 minutes"),
      "session_out")
      .filter($"user_id" =!= 999)
      .orderBy("user_id", "session_start")
      .select("user_id", "session_start", "n_events")
      .collect().toSeq
    val batch = EventOps.sessionizeBatch(evs.toDF(), 30)
      .orderBy("user_id", "session_start")
      .select("user_id", "session_start", "n_events")
      .collect().toSeq
    assert(streamed == batch)
  }

  test("session boundary: a gap of EXACTLY the threshold starts a new session") {
    // session_window's window is half-open [start, last + gap), so an event
    // exactly gap after its predecessor opens a NEW session; the batch twin
    // must agree (>=, not >) — and sub-second fractions must count (micros
    // precision, not unix_timestamp's whole-second truncation)
    val edge = Seq(
      Ev(1, ts("2024-01-01 00:00:00"), 7, "click", 1.0),
      Ev(2, ts("2024-01-01 00:30:00"), 7, "click", 2.0), // exactly 30min → split
      Ev(3, Timestamp.valueOf("2024-01-01 00:59:59.5"), 7, "click", 3.0)) // 29:59.5 → same
    val got = EventOps.sessionizeBatch(edge.toDF(), 30)
      .orderBy("session_start")
      .select("session_start", "n_events")
      .as[(Timestamp, Long)].collect().toSeq
    assert(got == Seq(
      (ts("2024-01-01 00:00:00"), 1L),
      (ts("2024-01-01 00:30:00"), 2L)))
  }

  test("watermark drops late data in append mode") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventOps.tumbling(
        EventOps.withWatermarkIfStreaming(mem.toDF(), "ts", "10 minutes"), "1 hour")
      .writeStream.outputMode("append").format("memory")
      .queryName("late_out").start()
    // batch 1: on-time events in hour 0
    mem.addData(
      Ev(1, ts("2024-01-01 00:10:00"), 1, "click", 1.0),
      Ev(2, ts("2024-01-01 00:20:00"), 1, "click", 1.0))
    q.processAllAvailable()
    // batch 2: advance watermark far past hour 0 (+10min delay)
    mem.addData(Ev(3, ts("2024-01-01 05:00:00"), 1, "view", 1.0))
    q.processAllAvailable()
    // batch 3: a LATE event for hour 0 — watermark 04:50 > window end 01:00
    mem.addData(Ev(4, ts("2024-01-01 00:30:00"), 1, "click", 9.0))
    q.processAllAvailable()
    // flush so remaining windows finalize
    mem.addData(flush)
    q.processAllAvailable()
    q.stop()
    val hour0 = spark.table("late_out")
      .filter($"event_type" === "click").collect()
    assert(hour0.length == 1)
    assert(hour0.head.getAs[Long]("n") == 2) // late event 4 was dropped
  }

  test("streaming anomaly sink equals the batch anomaly query on finalized buckets") {
    implicit val sqlCtx = spark.sqlContext
    val base = ts("2024-01-01 00:00:00").getTime
    // 30 hourly buckets, a spike at hour 25 (the LayoutSpec fixture shape)
    val rows = (0 until 30).flatMap { h =>
      val n = if (h == 25) 60 else 10 + (h % 3)
      (0 until n).map(i => Ev(h.toLong * 1000 + i,
        new Timestamp(base + h * 3600L * 1000 + i * 1000), 1, "click", 1.0))
    }
    val dir = java.nio.file.Files.createTempDirectory("anom_store").toFile.getAbsolutePath
    var last: org.apache.spark.sql.DataFrame = null
    val mem = MemoryStream[Ev]
    val q = graft.streaming.EventOps.anomalySink(
      mem.toDF(), s"$dir/counts", s"$dir/ckpt", "1 hour",
      lookback = 24, zThreshold = 2.0)(
      scored => last = scored)
    mem.addData(rows.take(150): _*)   // mid-bucket split: a bucket must not
    q.processAllAvailable()           // be emitted before the watermark
    mem.addData(rows.drop(150): _*)   // passes its end
    q.processAllAvailable()
    mem.addData(flush)                // finalize all 30 real buckets
    q.processAllAvailable()
    q.stop()
    val streamed = last.filter($"event_type" === "click")
      .orderBy("window_start").collect().toSeq
    val batch = graft.streaming.EventOps.anomalies(
        rows.toDF(), "1 hour", lookback = 24, zThreshold = 2.0)
      .orderBy("window_start").collect().toSeq
    assert(streamed == batch)
    assert(streamed.count(_.getAs[Boolean]("is_anomaly")) >= 1) // the spike
  }

  test("streaming top-k sink equals the batch leaderboard on finalized windows") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("topk_store").toFile.getAbsolutePath
    var last: org.apache.spark.sql.DataFrame = null
    val mem = MemoryStream[Ev]
    val q = EventOps.topkSink(mem.toDF(), s"$dir/counts", s"$dir/ckpt",
      k = 2, "1 hour")(ranked => last = ranked)
    mem.addData(evs.take(4): _*)  // chronology-safe split (event 4 backdates
    q.processAllAvailable()       // to 00:10 — later batches would drop it
    mem.addData(evs.drop(4): _*)  // as late under the 0s watermark)
    q.processAllAvailable()
    mem.addData(flush)            // finalize all real windows
    q.processAllAvailable()
    q.stop()
    val streamed = last.filter($"event_type" =!= "flush")
      .orderBy("window_start", "rank").collect().toSeq
    val batch = EventOps.topkOfBucketCounts(
        EventOps.bucketCounts(evs.toDF(), "1 hour"), k = 2)
      .orderBy("window_start", "rank").collect().toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty && streamed.forall(_.getAs[Int]("rank") <= 2))
  }

  test("sink stores are exactly-once: a replayed micro-batch overwrites itself, the store is unchanged") {
    // foreachBatch is at-least-once under retries; the batch_id partition
    // overwrite must make the re-fire idempotent (the round-13 verdict's
    // at-least-once caveat on anomalySink/topkSink, now closed): duplicate
    // finalized buckets would silently skew z-scores and leaderboards.
    val dir = java.nio.file.Files.createTempDirectory("sink_replay")
      .toFile.getAbsolutePath + "/counts"
    val b0 = EventOps.bucketCounts(evs.toDF(), "1 hour")
    EventOps.writeFinalized(b0, dir, 0)
    val once = EventOps.readFinalized(spark, dir)
      .orderBy("window_start", "event_type").collect().toSeq
    assert(once.nonEmpty)
    EventOps.writeFinalized(b0, dir, 0) // the retry
    val twice = EventOps.readFinalized(spark, dir)
      .orderBy("window_start", "event_type").collect().toSeq
    assert(twice == once, "a replayed batch changed the committed store")
    // a distinct batch id still lands as new rows
    EventOps.writeFinalized(b0.limit(1), dir, 1)
    assert(EventOps.readFinalized(spark, dir).count() == once.size + 1)
    // and the reader hides the physical partition column from consumers
    assert(!EventOps.readFinalized(spark, dir).columns.contains("batch_id"))
  }

  test("batch sessionization splits on gap strictly greater than threshold") {
    val out = EventOps.sessionizeBatch(evs.toDF(), 30)
      .orderBy("user_id", "session_start").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(3))).toSeq ==
      Seq((1L, 2L), (1L, 1L), (2L, 1L), (2L, 2L)))
  }
}
