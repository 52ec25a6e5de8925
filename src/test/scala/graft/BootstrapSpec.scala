package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Stats

class BootstrapSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("poissonThresholdsHex: match the Poisson(1) CDF, strictly increasing, fixed width") {
    val ts = Stats.poissonThresholdsHex
    assert(ts.size === 9)
    assert(ts.forall(t => t.length == 5 && t.forall("0123456789abcdef".contains(_))))
    def v(h: String) = java.lang.Long.parseLong(h, 16) / 1048576.0
    assert(math.abs(v(ts.head) - math.exp(-1.0)) < 1e-5) // 20-bit lattice
    assert(math.abs(v(ts(1)) - 2 * math.exp(-1.0)) < 1e-5) // k=1 cdf = 2/e
    // fixed-width lowercase hex: string order == numeric order
    assert(ts.sliding(2).forall(p => p(0) < p(1)))
  }

  test("poissonBootstrap: reproducible and layout-independent") {
    val df = (1 to 200).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Stats.poissonBootstrap(d, col("id"), col("v"), replicates = 8)
        .orderBy("b").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val a = run(df)
    val b = run(df.repartition(7))
    assert(a === b, "resampling must not depend on partitioning")
    assert(a === run(df), "resampling must not depend on the run")
  }

  test("poissonBootstrap: replicate means center on the sample mean, n_eff ~ n") {
    val n = 400
    val df = (1 to n).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val out = Stats.poissonBootstrap(df, col("id"), col("v"), replicates = 32)
      .collect()
    assert(out.length === 32)
    val trueMean = (n + 1) / 2.0
    // sd of a bootstrap mean ~ sd/sqrt(n) ~ 115.6/20 ~ 5.8; allow 5 sigma
    out.foreach { r =>
      assert(math.abs(r.getDouble(2) - trueMean) < 29.0,
        s"replicate ${r.getLong(0)} mean ${r.getDouble(2)} far from $trueMean")
      assert(math.abs(r.getLong(1) - n) < 5 * math.sqrt(n.toDouble),
        s"n_eff ${r.getLong(1)} far from $n")
    }
    // replicates genuinely differ (they are resamples, not copies)
    assert(out.map(_.getDouble(2)).distinct.length > 16)
  }

  test("splitConformal: exact linear data gives a zero-width interval and full coverage") {
    val df = (1 to 900).map(i => (i.toLong, (i % 50 + 1).toDouble,
      2.0 * (i % 50 + 1))).toDF("id", "x", "y")
    val r = Stats.splitConformal(df, col("id"), col("x"), col("y")).collect().head
    assert(r.getAs[Long]("q_hat") === 0L)
    assert(r.getAs[Long]("coverage_ppm") === 1000000L)
    assert(math.abs(r.getAs[Double]("slope") - 2.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("intercept")) < 1e-6)
    // the md5 split is roughly 1/3 each and covers every row
    val n = r.getAs[Long]("n_train") + r.getAs[Long]("n_cal") + r.getAs[Long]("n_test")
    assert(n === 900L)
    assert(r.getAs[Long]("n_train") > 200L && r.getAs[Long]("n_test") > 200L)
  }

  test("splitConformal: noisy data keeps the 1-alpha coverage guarantee") {
    // deterministic heteroscedastic-ish noise in [-10, 10)
    val df = (1 to 2000).map { i =>
      val x = (i % 40 + 1).toDouble
      (i.toLong, x, 3.0 * x + 5.0 + ((i * 7) % 20 - 10).toDouble)
    }.toDF("id", "x", "y")
    val r = Stats.splitConformal(df, col("id"), col("x"), col("y"),
      aNum = 1, aDen = 10).collect().head
    val cov = r.getAs[Long]("coverage_ppm")
    assert(cov >= 850000L && cov <= 1000000L, s"coverage $cov outside band")
    assert(r.getAs[Long]("q_hat") > 0L)
  }

  test("splitConformal: calibration too small for alpha gives q_hat = +inf, coverage 1") {
    // at alpha = 1/100, k = ceil((n_cal+1)·0.99) exceeds n_cal whenever
    // n_cal < 99 — the conformal convention is q̂ = +∞ (cover everything),
    // never a NULL readout. ~60 rows ⇒ ~20 calibration points.
    val df = (1 to 60).map { i =>
      (i.toLong, (i % 10 + 1).toDouble, (i % 10 + 1) * 2.0 + (i % 3).toDouble)
    }.toDF("id", "x", "y")
    val r = Stats.splitConformal(df, col("id"), col("x"), col("y"),
      aNum = 1, aDen = 100).collect().head
    assert(r.getAs[Long]("n_cal") < 99L, "fixture must under-fill the calibration split")
    assert(r.getAs[Long]("q_hat") === Long.MaxValue)
    assert(r.getAs[Long]("covered") === r.getAs[Long]("n_test"))
    assert(r.getAs[Long]("coverage_ppm") === 1000000L)
  }

  test("splitConformal: a single-row input leaves no NULL in the readout") {
    // whichever split the one row hashes to, the other two are empty: the
    // counts must read 0 (not sum-over-empty NULL), q_hat must pin to the
    // +inf sentinel when calibration is empty, and nothing may throw
    for (id <- 1L to 3L) {
      val r = Stats.splitConformal(
        Seq((id, 2.0, 4.0)).toDF("id", "x", "y"),
        col("id"), col("x"), col("y")).collect().head
      assert(!r.isNullAt(r.fieldIndex("n_cal")), s"n_cal NULL for id=$id")
      assert(!r.isNullAt(r.fieldIndex("n_test")), s"n_test NULL for id=$id")
      assert(!r.isNullAt(r.fieldIndex("q_hat")), s"q_hat NULL for id=$id")
      assert(!r.isNullAt(r.fieldIndex("covered")), s"covered NULL for id=$id")
      if (r.getAs[Long]("n_cal") == 0L)
        assert(r.getAs[Long]("q_hat") === Long.MaxValue)
    }
  }

  test("splitConformal: layout-independent") {
    val df = (1 to 500).map { i =>
      (i.toLong, (i % 30 + 1).toDouble, (i % 30 + 1) * 1.5 + (i % 7).toDouble)
    }.toDF("id", "x", "y")
    val a = Stats.splitConformal(df, col("id"), col("x"), col("y")).collect().head
    val b = Stats.splitConformal(df.repartition(11), col("id"), col("x"), col("y"))
      .collect().head
    assert(a.toSeq === b.toSeq)
  }

  test("kaplanMeier: textbook curve with right-censoring") {
    // durations {1,1,2,-,-}: S(1) = 3/5, S(2) = 3/5 * 2/3 = 2/5
    val subj = Seq(Some(1L), Some(1L), Some(2L), None, None)
      .toDF("dur")
    val out = Stats.kaplanMeier(subj, col("dur")).orderBy("duration").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((1L, 5L, 2L), (2L, 3L, 1L)))
    // fixed-point quantization may undershoot by a few ppm, never over
    assert(math.abs(out(0).getAs[Long]("surv_ppm") - 600000L) <= 2L)
    assert(math.abs(out(1).getAs[Long]("surv_ppm") - 400000L) <= 2L)
  }

  test("kaplanMeier: everyone-dies tail reaches zero survival without errors") {
    val subj = Seq(Some(1L), Some(2L), Some(2L)).toDF("dur")
    val out = Stats.kaplanMeier(subj, col("dur")).orderBy("duration").collect()
    assert(out.last.getAs[Long]("surv_ppm") === 0L)
    assert(out.last.getAs[Long]("n_risk") === out.last.getAs[Long]("d"))
  }

  test("budgetWaterfill: hand case + fuzz against a scalar waterline solver") {
    import graft.pipeline.Curate
    val docs = Seq(("a", 10L), ("b", 20L), ("c", 70L)).toDF("src", "w")
    val out = Curate.budgetWaterfill(docs, col("src"), col("w"),
      budgetPpm = 600000L) // budget = 60 of 100
      .orderBy("source").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("alloc")).toMap
    assert(out === Map("a" -> 10L, "b" -> 20L, "c" -> 30L)) // sums to 60

    // budget >= total: everything taken whole
    val full = Curate.budgetWaterfill(docs, col("src"), col("w"),
      budgetPpm = 1000000L).orderBy("source").collect()
      .map(_.getAs[Long]("alloc")).toSeq
    assert(full === Seq(10L, 20L, 70L))

    // fuzz: integer waterline solver on random masses
    def scalarSolve(ns: Seq[Long], b: Long): Seq[Long] = {
      val sorted = ns.sorted
      var lam = Long.MaxValue
      var pk = 0L
      for (k <- sorted.indices if lam == Long.MaxValue) {
        val cand = (b - pk) / (sorted.size - k)
        val prev = if (k == 0) 0L else sorted(k - 1)
        if (prev <= cand && cand < sorted(k)) lam = cand
        pk += sorted(k)
      }
      ns.map(n => math.min(n, lam))
    }
    for (seed <- 1 to 5) {
      val ns = (0 until 8).map(i => ((seed * 31 + i * 17) % 97 + 1).toLong)
      val tot = ns.sum
      val df = ns.zipWithIndex.map { case (n, i) => (f"s$i%02d", n) }
        .toDF("src", "w")
      val got = Curate.budgetWaterfill(df, col("src"), col("w"), 600000L)
        .orderBy("source").collect().map(_.getAs[Long]("alloc")).toSeq
      val want = scalarSolve(ns, tot * 600000L / 1000000L)
      assert(got === want, s"seed $seed: $ns")
    }
  }

  test("poissonBootstrap: empty input yields empty output, one-row input guarded") {
    val empty = Seq.empty[(Long, Double)].toDF("id", "v")
    assert(Stats.poissonBootstrap(empty, col("id"), col("v"), 4).count() === 0L)
    val one = Seq((1L, 42.0)).toDF("id", "v")
    val out = Stats.poissonBootstrap(one, col("id"), col("v"), 32).collect()
    assert(out.length === 32)
    out.foreach { r =>
      if (r.getLong(1) === 0L) assert(r.getDouble(2) === 0.0)
      else assert(r.getDouble(2) === 42.0)
    }
  }
}
