package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Experiment

class ExperimentSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val cutoff = lit("2024-01-10").cast("timestamp")

  private def ev(rows: Seq[(Long, String, Double)]) =
    rows.toDF("user_id", "day", "value")
      .select(col("user_id"), concat(lit("2024-01-"), col("day")).cast("timestamp").as("ts"),
        col("value"))

  test("cuped: sufficient-statistic readout matches a brute-force per-unit computation") {
    // 8 units, correlated pre/post metrics, fixed arms via the unit id
    val units = (1L to 8L).map { u =>
      val x = u.toDouble * 2 // pre
      val y = u.toDouble * 3 + (if (u % 2 == 0) 5.0 else 0.0) // post
      (u, x, y)
    }
    val rows = units.flatMap { case (u, x, y) =>
      Seq((u, "05", x), (u, "15", y)) // one pre event, one post event
    }
    val arm = (u: org.apache.spark.sql.Column) =>
      when(pmod(u, lit(2)) === 0, "treat").otherwise("control")
    val out = Experiment.cuped(ev(rows), col("user_id"), col("ts"),
      col("value"), cutoff, arm).orderBy("arm").collect()

    // brute force with plain doubles
    val n = units.size.toDouble
    val sx = units.map(_._2).sum; val sy = units.map(_._3).sum
    val sxx = units.map(u => u._2 * u._2).sum
    val sxy = units.map(u => u._2 * u._3).sum
    val theta = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    val meanXAll = sx / n
    def armStats(p: Long => Boolean) = {
      val g = units.filter(u => p(u._1))
      val gn = g.size.toDouble
      val mx = g.map(_._2).sum / gn; val my = g.map(_._3).sum / gn
      val vy = g.map(u => u._3 * u._3).sum / gn - my * my
      val vx = g.map(u => u._2 * u._2).sum / gn - mx * mx
      val cv = g.map(u => u._2 * u._3).sum / gn - mx * my
      (gn, my, my - theta * (mx - meanXAll), vy, vy - 2 * theta * cv + theta * theta * vx)
    }
    val ctrl = armStats(_ % 2 == 1); val trt = armStats(_ % 2 == 0)
    val byArm = out.map(r => r.getString(0) -> r).toMap
    for ((name, st) <- Seq("control" -> ctrl, "treat" -> trt)) {
      val r = byArm(name)
      assert(r.getLong(1) === st._1.toLong)
      assert(math.abs(r.getDouble(2) - st._2) < 1e-6, s"$name mean_y")
      assert(math.abs(r.getDouble(3) - st._3) < 1e-6, s"$name mean_y_adj")
      assert(math.abs(r.getDouble(4) - st._4) < 1e-6, s"$name var_y")
      assert(math.abs(r.getDouble(5) - st._5) < 1e-6, s"$name var_y_adj")
      assert(math.abs(r.getDouble(6) - theta) < 1e-6, s"$name theta")
    }
  }

  test("cuped: perfectly predictive covariate drives adjusted variance to ~0") {
    // y = 2x exactly -> rho = 1, var reduction ~ 100%
    val rows = (1L to 20L).flatMap { u =>
      Seq((u, "05", u.toDouble), (u, "15", u.toDouble * 2))
    }
    val out = Experiment.cuped(ev(rows), col("user_id"), col("ts"),
      col("value"), cutoff).collect()
    out.foreach { r =>
      assert(math.abs(r.getDouble(5)) < 1e-6, "var_y_adj should vanish")
      assert(r.getLong(7) > 990000L, "var_reduction_ppm ~ 1e6")
    }
  }

  test("cuped: units missing a period count with 0 (exposure semantics)") {
    val rows = Seq((1L, "05", 10.0), (2L, "15", 7.0)) // 1: pre only; 2: post only
    val out = Experiment.cuped(ev(rows), col("user_id"), col("ts"),
      col("value"), cutoff,
      u => when(u === 1, "control").otherwise("treat")).orderBy("arm").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(1L, 1L)) // both units present
    val byArm = out.map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(byArm("control") === 0.0) // unit 1 has no post-period value
    assert(byArm("treat") === 7.0)
  }

  test("deltaMethodRatio: matches a brute-force per-unit computation") {
    // per-unit y totals and event counts with known moments
    val rows = (1L to 12L).flatMap { u =>
      (0 until (u % 3 + 1).toInt).map(j => (u, "05", u.toDouble + j))
    }
    val arm = (u: org.apache.spark.sql.Column) =>
      when(pmod(u, lit(2)) === 0, "treat").otherwise("control")
    val out = Experiment.deltaMethodRatio(ev(rows), col("user_id"),
      col("value"), arm).orderBy("arm").collect()
    def brute(p: Long => Boolean) = {
      val units = (1L to 12L).filter(p).map { u =>
        val vs = (0 until (u % 3 + 1).toInt).map(j => u.toDouble + j)
        (vs.sum, vs.size.toDouble)
      }
      val n = units.size.toDouble
      val sy = units.map(_._1).sum; val sm = units.map(_._2).sum
      val my = sy / n; val mm = sm / n
      val vy = units.map(u => u._1 * u._1).sum / n - my * my
      val vm = units.map(u => u._2 * u._2).sum / n - mm * mm
      val cv = units.map(u => u._1 * u._2).sum / n - my * mm
      val r = sy / sm
      (r, (vy - 2 * r * cv + r * r * vm) / (n * mm * mm))
    }
    val byArm = out.map(r => r.getString(0) -> r).toMap
    for ((name, p) <- Seq("control" -> ((u: Long) => u % 2 == 1),
        "treat" -> ((u: Long) => u % 2 == 0))) {
      val (r, v) = brute(p)
      assert(math.abs(byArm(name).getAs[Double]("ratio") - r) < 1e-6, name)
      assert(math.abs(byArm(name).getAs[Double]("var_ratio") - v) < 1e-6, name)
    }
  }

  test("diffInDiff: recovers a planted treatment effect exactly") {
    // base level 10, time trend +2 for everyone, +5 extra for treated post
    val rows =
      (1L to 20L).map(u => (u, "05", 10.0)) ++
      (1L to 20L).map(u => (u, "15",
        12.0 + (if (u % 2 == 0) 5.0 else 0.0)))
    val arm = (u: org.apache.spark.sql.Column) =>
      when(pmod(u, lit(2)) === 0, "treat").otherwise("control")
    val r = Experiment.diffInDiff(ev(rows), col("user_id"), col("ts"),
      col("value"), cutoff, arm).collect().head
    assert(r.getAs[Double]("ctrl_pre") === 10.0)
    assert(r.getAs[Double]("ctrl_post") === 12.0)
    assert(r.getAs[Double]("treat_post") === 17.0)
    assert(r.getAs[Double]("dd") === 5.0) // the trend cancels
    assert(r.getAs[Long]("n_total") === 40L)
  }

  test("powerMde: matches the closed form, shrinks quadratically with MDE") {
    val rows = (1L to 30L).map(u => (u, "05", (u % 7 + 1).toDouble))
    val out = Experiment.powerMde(ev(rows), col("user_id"), col("value"),
      mdePcts = Seq(1, 2, 5, 10)).orderBy("mde_pct").collect()
    val ys = (1L to 30L).map(u => (u % 7 + 1).toDouble)
    val n = ys.size.toDouble
    val mean = ys.sum / n
    // unbiased sample variance, matching the operator
    val v = (ys.map(y => y * y).sum / n - mean * mean) * (n / (n - 1.0))
    for (r <- out) {
      val delta = mean * r.getAs[Int]("mde_pct") / 100.0
      val want = math.ceil(Experiment.powerK80 * 2.0 * v / (delta * delta)).toLong
      assert(r.getAs[Long]("n_per_arm") === want, s"pct ${r.getAs[Int]("mde_pct")}")
    }
    // halving the MDE quadruples the required sample
    val byPct = out.map(r => r.getAs[Int]("mde_pct") -> r.getAs[Long]("n_per_arm")).toMap
    assert(math.abs(byPct(1).toDouble / byPct(2) - 4.0) < 0.01)
  }

  test("inverseNormalCdf: textbook quantiles to 1e-8") {
    assert(math.abs(Experiment.inverseNormalCdf(0.975) - 1.959963984540054) < 1e-8)
    assert(math.abs(Experiment.inverseNormalCdf(0.995) - 2.5758293035489004) < 1e-8)
    assert(math.abs(Experiment.inverseNormalCdf(0.5)) < 1e-12)
    assert(math.abs(Experiment.inverseNormalCdf(0.025) + 1.959963984540054) < 1e-8)
    // tail branch
    assert(math.abs(Experiment.inverseNormalCdf(0.001) + 3.090232306167813) < 1e-7)
  }

  test("bhFdr: planted effect rejected, null groups spared, step-up order respected") {
    // groups A (huge effect), B (none), C (none); many units for power
    val arm = (u: org.apache.spark.sql.Column) =>
      when(pmod(u, lit(2)) === 0, "treat").otherwise("control")
    val rows = (1L to 400L).flatMap { u =>
      val t = u % 2 == 0
      Seq(
        (u, "A", if (t) 30.0 + (u % 5) else 10.0 + (u % 5)),
        (u, "B", 20.0 + (u % 7)),
        (u, "C", 15.0 + (u % 3)))
    }.map { case (u, g, v) => (u, g, v) }
    val df = rows.toDF("user_id", "grp", "value")
    val out = Experiment.bhFdr(df, col("grp"), col("value"),
      groups = Seq("A", "B", "C"), alpha = 0.05, arm, col("user_id"))
      .orderBy("rank").collect()
    val byGrp = out.map(r => r.getString(0) -> r).toMap
    assert(byGrp("A").getAs[Boolean]("rejected"), "the planted effect must reject")
    assert(byGrp("A").getAs[Long]("rank") === 1L)
    assert(!byGrp("B").getAs[Boolean]("rejected"))
    assert(!byGrp("C").getAs[Boolean]("rejected"))
    // critical z's strictly decrease down the ranking (the step-up ladder)
    val crits = out.map(_.getAs[Double]("z_crit"))
    assert(crits.sliding(2).forall(p => p(0) > p(1)))
  }

  test("bhFdr: all-null family rejects nothing") {
    val arm = (u: org.apache.spark.sql.Column) =>
      when(pmod(u, lit(2)) === 0, "treat").otherwise("control")
    val rows = (1L to 200L).flatMap(u => Seq((u, "A", 5.0), (u, "B", 7.0)))
    val out = Experiment.bhFdr(rows.toDF("user_id", "grp", "value"),
      col("grp"), col("value"), Seq("A", "B"), 0.05, arm, col("user_id"))
      .collect()
    assert(out.forall(!_.getAs[Boolean]("rejected")))
  }

  test("cohenKappa: perfect agreement gives kappa 1") {
    val df = Seq(("a", "a"), ("b", "b"), ("a", "a")).toDF("x", "y")
    val r = Experiment.cohenKappa(df, col("x"), col("y")).collect().head
    assert(r.getAs[Double]("p_observed") === 1.0)
    assert(r.getAs[Double]("kappa") === 1.0)
  }

  test("cohenKappa: the textbook 2x2 case") {
    // 20 a/a, 5 a/b, 10 b/a, 15 b/b: po=0.7, pe=0.5 -> kappa=0.4
    val rows = Seq.fill(20)(("a", "a")) ++ Seq.fill(5)(("a", "b")) ++
      Seq.fill(10)(("b", "a")) ++ Seq.fill(15)(("b", "b"))
    val r = Experiment.cohenKappa(rows.toDF("x", "y"), col("x"), col("y"))
      .collect().head
    assert(r.getAs[Long]("n_total") === 50L)
    assert(r.getAs[Long]("n_agree") === 35L)
    assert(math.abs(r.getAs[Double]("p_observed") - 0.7) < 1e-9)
    assert(math.abs(r.getAs[Double]("p_expected") - 0.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("kappa") - 0.4) < 1e-9)
  }

  test("cohenKappa: disagreement-heavy raters go negative") {
    val rows = Seq.fill(5)(("a", "a")) ++ Seq.fill(20)(("a", "b")) ++
      Seq.fill(20)(("b", "a")) ++ Seq.fill(5)(("b", "b"))
    val r = Experiment.cohenKappa(rows.toDF("x", "y"), col("x"), col("y"))
      .collect().head
    assert(r.getAs[Double]("kappa") < 0.0)
  }

  test("psi: identical samples give zero terms; a shift is positive and attributed") {
    val base = (1 to 100).map(i => (i % 10) * 10.0 + 1.0)
    val ref = base.toDF("v"); val curSame = base.toDF("v")
    val zero = Experiment.psi(ref, curSame, col("v"), bins = 10, lo = 0, hi = 100)
      .agg(sum(abs(col("psi_term_ppm")))).collect().head.getLong(0)
    assert(zero === 0L)

    val curShift = base.map(_ + 30.0).toDF("v") // mass moves up 3 bins
    val out = Experiment.psi(ref, curShift, col("v"), bins = 10, lo = 0, hi = 100)
      .collect()
    val total = out.map(_.getAs[Long]("psi_term_ppm")).sum
    assert(total > 200000L, s"a 3-bin shift should alarm (got $total ppm)")
    // every populated bin row is finite (smoothing) even where one side is 0
    assert(out.forall(r => r.getAs[Long]("ref_ppm") > 0 && r.getAs[Long]("cur_ppm") > 0))
  }

  test("psi: values outside [lo,hi) clamp into the edge bins") {
    val ref = Seq(-5.0, 500.0).toDF("v")
    val cur = Seq(1.0, 99.0).toDF("v")
    val bins = Experiment.psi(ref, cur, col("v"), bins = 10, lo = 0, hi = 100)
      .select("bin").as[Long].collect().sorted
    assert(bins.toSeq === Seq(0L, 9L))
  }
}
