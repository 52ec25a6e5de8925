package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Experimentation / drift readouts over event streams: CUPED
  * variance-reduced A/B effect estimation, Cohen's kappa inter-annotator
  * agreement, and PSI (population stability index) distribution drift.
  *
  * Scale shape: every operator here is ONE key-shuffle (the per-unit or
  * per-bin aggregate) followed by a tiny broadcast/scalar stage — the
  * closed-form moment identities do the rest. Nothing materializes
  * per-unit adjusted values; variances and covariances of the CUPED
  * adjustment fall out of the exact sufficient statistics
  * (n, Σx, Σy, Σx², Σy², Σxy), so a 100 TB event table costs exactly one
  * aggregation pass.
  *
  * Numeric portability: sufficient statistics accumulate as
  * DECIMAL(18,2)-derived exact decimals (order-independent across any
  * partitioning); the handful of scalar double operations on top are
  * written as the same expression tree in the DuckDB oracle, and every
  * double output is round(·, 6) — the repo-wide boundary convention.
  */
object Experiment {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Deterministic 50/50 arm assignment by md5 of the unit key — the
    * experiment twin of [[Splits.hashBucket]]: reproducible across reruns,
    * engines and cluster layouts (first hex byte < 0x80 → "treat").
    */
  def hashArm(unit: Column): Column =
    when(substring(md5(unit.cast("string").cast("binary")), 1, 2) < lit("80"),
      lit("treat")).otherwise(lit("control"))

  /** CUPED (Controlled-experiment Using Pre-Experiment Data, Deng et al.
    * WSDM'13): per experiment unit, Y = post-period metric, X = pre-period
    * metric of the SAME unit; the adjusted metric Y' = Y − θ(X − E[X]) with
    * θ = cov(X,Y)/var(X) keeps E[Y'] = E[Y] per arm (θ and E[X] are pooled,
    * so the adjustment is a constant shift of a mean-zero covariate) while
    * removing the pre-period-explained variance: var(Y') =
    * var(Y)·(1 − ρ²).
    *
    * Output: one row per arm with n_units, mean_y, mean_y_adj, var_y,
    * var_y_adj (population), pooled theta, and the realized variance
    * reduction in ppm. Units with no post-period events still count with
    * Y = 0 (they are exposed members of the arm); units with no pre-period
    * events have X = 0.
    *
    * Plan: one groupBy(unit) aggregate over the event scan (map-side
    * combinable sums of decimals), a 1-row pooled-stats frame cross-joined
    * into the ≤2-row per-arm frame. No per-unit second pass: var(Y') =
    * var(Y) − 2θ·cov(X,Y) + θ²·var(X) per arm, all from the exact moments.
    */
  def cuped(events: DataFrame, unit: Column, ts: Column, value: Column,
      cutoff: Column, arm: Column => Column = hashArm): DataFrame = {
    val pre = ts < cutoff
    // per-unit x/y re-narrowed to DECIMAL(18,2): the sums fit (they are one
    // unit's activity), and 18-digit inputs keep the x², xy products inside
    // DECIMAL(38,4) EXACTLY on both Spark and the DuckDB oracle — a wider
    // input would make the product overflow 38 digits and lose exactness.
    val perUnit = events
      .groupBy(unit.as("unit"))
      .agg(
        coalesce(sum(when(pre, dec(value))), lit(0).cast(DecimalType(18, 2)))
          .cast(DecimalType(18, 2)).as("x"),
        coalesce(sum(when(!pre, dec(value))), lit(0).cast(DecimalType(18, 2)))
          .cast(DecimalType(18, 2)).as("y"))
      .select(col("unit"), col("x"), col("y"), arm(col("unit")).as("arm"))

    // exact sufficient statistics (order-independent under any shuffle).
    // Per-ARM moments are the only pass over the per-unit frame; the
    // POOLED moments are sums of the ≤#arms per-arm rows (decimal addition
    // is associative, so this is bit-identical to aggregating the units
    // directly) — one events scan, not two. The ≤#arms frame is
    // materialized eagerly so its two consumers don't replay the lineage.
    val perArm = perUnit.groupBy("arm").agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"))
      .localCheckpoint(true)

    val pooled = perArm.groupBy().agg(
      sum(col("n")).as("n"),
      sum(col("sx")).as("sx"), sum(col("sy")).as("sy"),
      sum(col("sxx")).as("sxx"), sum(col("syy")).as("syy"),
      sum(col("sxy")).as("sxy"))
      .select(
        (col("sxy").cast("double")
          - col("sx").cast("double") * col("sy").cast("double")
            / col("n").cast("double")).as("cov_num"),
        (col("sxx").cast("double")
          - col("sx").cast("double") * col("sx").cast("double")
            / col("n").cast("double")).as("varx_num"),
        (col("sx").cast("double") / col("n").cast("double")).as("mean_x_all"))
      .select(
        // a constant covariate (varx = 0) cannot adjust anything: θ = 0
        // degrades CUPED to the plain difference-in-means readout instead
        // of erroring under ANSI division
        when(col("varx_num") === 0.0, lit(0.0))
          .otherwise(col("cov_num") / col("varx_num")).as("theta"),
        col("mean_x_all"))

    val n = col("n").cast("double")
    val meanX = col("sx").cast("double") / n
    val meanY = col("sy").cast("double") / n
    val varY = col("syy").cast("double") / n - meanY * meanY
    val varX = col("sxx").cast("double") / n - meanX * meanX
    val covXY = col("sxy").cast("double") / n - meanX * meanY
    val varAdj = (varY - lit(2.0) * col("theta") * covXY) +
      col("theta") * col("theta") * varX

    perArm.crossJoin(broadcast(pooled))
      .select(
        col("arm"), col("n").as("n_units"),
        round(meanY, 6).as("mean_y"),
        round(meanY - col("theta") * (meanX - col("mean_x_all")), 6)
          .as("mean_y_adj"),
        round(varY, 6).as("var_y"),
        round(varAdj, 6).as("var_y_adj"),
        round(col("theta"), 6).as("theta"),
        // a zero-variance arm (e.g. one unit) has nothing to reduce
        when(varY === 0.0, lit(0L))
          .otherwise(floor((varY - varAdj) / varY * lit(1000000.0))
            .cast("long")).as("var_reduction_ppm"))
  }

  /** Delta-method readout for a RATIO metric (revenue per session,
    * clicks per view — the metrics t-tests silently get wrong because
    * the unit of analysis is not the unit of randomization): per arm,
    * R = ΣY/ΣN over units, with the linearization variance
    * var(R) ≈ (var(y) − 2R·cov(y,n) + R²·var(n)) / (n_units · mean(n)²)
    * — every moment an exact decimal sum, the formula a pure scalar
    * function on top. One per-unit shuffle, one tiny per-arm aggregate;
    * the companion to [[cuped]] for metrics that are ratios.
    */
  def deltaMethodRatio(events: DataFrame, unit: Column, y: Column,
      arm: Column => Column = hashArm): DataFrame = {
    val perUnit = events
      .groupBy(unit.as("unit"))
      .agg(coalesce(sum(dec(y)), lit(0).cast(DecimalType(18, 2)))
          .cast(DecimalType(18, 2)).as("y"),
        count(lit(1)).cast(DecimalType(18, 2)).as("m"))
      .select(col("y"), col("m"), arm(col("unit")).as("arm"))
    val perArm = perUnit.groupBy("arm").agg(
      count(lit(1)).as("n"),
      sum(col("y")).as("sy"), sum(col("m")).as("sm"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("m") * col("m")).as("smm"),
      sum(col("y") * col("m")).as("sym"))
    val n = col("n").cast("double")
    val meanY = col("sy").cast("double") / n
    val meanM = col("sm").cast("double") / n
    val varY = col("syy").cast("double") / n - meanY * meanY
    val varM = col("smm").cast("double") / n - meanM * meanM
    val covYM = col("sym").cast("double") / n - meanY * meanM
    val ratio = col("sy").cast("double") / col("sm").cast("double")
    val varR = ((varY - lit(2.0) * ratio * covYM) + ratio * ratio * varM) /
      (n * meanM * meanM)
    perArm.select(col("arm"), col("n").as("n_units"),
      round(ratio, 6).as("ratio"),
      round(varR, 6).as("var_ratio"),
      round(sqrt(varR / n), 6).as("se_ratio"))
  }

  /** Difference-in-differences over a 2×2 (arm × pre/post period) design:
    * the causal readout when assignment is not randomized but parallel
    * trends are plausible. Four exact per-cell means plus
    * dd = (treat_post − treat_pre) − (ctrl_post − ctrl_pre); one grouped
    * aggregate over the scan, a 1-row pivot on top.
    */
  def diffInDiff(events: DataFrame, unit: Column, ts: Column, value: Column,
      cutoff: Column, arm: Column => Column = hashArm): DataFrame = {
    val cells = events
      .select(arm(unit).as("arm"),
        when(ts < cutoff, "pre").otherwise("post").as("period"),
        dec(value).as("v"))
      .groupBy("arm", "period")
      .agg(sum(col("v")).as("sv"), count(lit(1)).as("nv"))
      .select(col("arm"), col("period"),
        (col("sv").cast("double") / col("nv").cast("double")).as("mean_v"),
        col("nv"))
    def cell(a: String, p: String) =
      max(when(col("arm") === a && col("period") === p, col("mean_v")))
    cells.groupBy()
      .agg(cell("control", "pre").as("ctrl_pre"),
        cell("control", "post").as("ctrl_post"),
        cell("treat", "pre").as("treat_pre"),
        cell("treat", "post").as("treat_post"),
        sum("nv").as("n_total"))
      .select(col("n_total"),
        round(col("ctrl_pre"), 6).as("ctrl_pre"),
        round(col("ctrl_post"), 6).as("ctrl_post"),
        round(col("treat_pre"), 6).as("treat_pre"),
        round(col("treat_post"), 6).as("treat_post"),
        round((col("treat_post") - col("treat_pre"))
          - (col("ctrl_post") - col("ctrl_pre")), 6).as("dd"))
  }

  /** (z_{1−α/2} + z_{1−β})² for α = 0.05, power = 0.8 — the constant of
    * the two-sample power formula, fixed here in Scala (the z-values are
    * universal constants, not data) and inlined as ONE double literal
    * into both the Spark plan and the DuckDB oracle.
    */
  val powerK80: Double = {
    val z975 = 1.959963984540054; val z80 = 0.8416212335729143
    (z975 + z80) * (z975 + z80)
  }

  /** Power analysis over the live metric: per candidate MDE (as a % of
    * the current per-unit mean), the required units per arm
    * n = ⌈K · 2σ² / δ²⌉ with σ², mean from ONE exact-decimal moment pass
    * over the per-unit metric — the "how long must this test run" readout
    * computed from the same sufficient statistics as [[cuped]].
    */
  def powerMde(events: DataFrame, unit: Column, value: Column,
      mdePcts: Seq[Int] = Seq(1, 2, 5, 10), k: Double = powerK80): DataFrame = {
    require(mdePcts.nonEmpty && mdePcts.forall(_ > 0), "MDE grid must be positive")
    val perUnit = events.groupBy(unit.as("unit"))
      .agg(coalesce(sum(dec(value)), lit(0).cast(DecimalType(18, 2)))
        .cast(DecimalType(18, 2)).as("y"))
    val m = perUnit.agg(
      count(lit(1)).as("n"),
      sum(col("y")).as("sy"), sum(col("y") * col("y")).as("syy"))
    val n = col("n").cast("double")
    val mean = col("sy").cast("double") / n
    // unbiased sample variance (popvar · n/(n−1)); a 1-unit readout has no
    // variance estimate → σ² = 0 (n_per_arm 0, same as the old popvar)
    val varY = when(col("n") <= 1, lit(0.0))
      .otherwise((col("syy").cast("double") / n - mean * mean)
        * (n / (n - lit(1.0))))
    val grid = mdePcts.map { p =>
      val delta = mean * lit(p.toDouble) / lit(100.0)
      struct(lit(p).as("mde_pct"), round(delta, 6).as("mde_abs"),
        ceil(lit(k) * lit(2.0) * varY / (delta * delta)).cast("long")
          .as("n_per_arm"))
    }
    m.select(explode(array(grid: _*)).as("g"))
      .select(col("g.mde_pct").as("mde_pct"), col("g.mde_abs").as("mde_abs"),
        col("g.n_per_arm").as("n_per_arm"))
  }

  /** Φ⁻¹ (standard normal quantile) by Acklam's rational approximation
    * (~1e-9 relative error) — runs ONLY in Scala, to mint the critical-z
    * literals both engines share. Never evaluated per row.
    */
  def inverseNormalCdf(p: Double): Double = {
    require(p > 0.0 && p < 1.0, "p must be in (0,1)")
    val a = Seq(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Seq(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01, -1.328068155288572e+01)
    val c = Seq(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      4.374664141464968e+00, 2.938163982698783e+00)
    val dd = Seq(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    val pLow = 0.02425
    if (p < pLow) {
      val q = math.sqrt(-2 * math.log(p))
      (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((dd(0) * q + dd(1)) * q + dd(2)) * q + dd(3)) * q + 1)
    } else if (p <= 1 - pLow) {
      val q = p - 0.5; val r = q * q
      (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
        (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1)
    } else {
      -inverseNormalCdf(1 - p)
    }
  }

  /** BH critical z-values: the k-th ranked test (by |z| desc ⇔ p asc)
    * rejects under Benjamini–Hochberg iff |z_k| ≥ Φ⁻¹(1 − kα/(2m)) for
    * some k' ≥ k's step-up — constants minted here, inlined into both
    * engines.
    */
  def bhCriticalZ(m: Int, alpha: Double = 0.05): Seq[Double] =
    (1 to m).map(k => inverseNormalCdf(1.0 - k * alpha / (2.0 * m)))

  /** Benjamini–Hochberg FDR across a FAMILY of two-sample z-tests (one
    * per metric group): the multiple-testing gate an experiment readout
    * needs once it reports more than one metric. Per group, Welch z from
    * exact decimal moments; tests rank by |z| desc (⇔ p asc) and the
    * step-up rule rejects ranks 1..k* where k* is the largest k with
    * |z_k| ≥ the k-th critical z. Everything after the one grouped
    * aggregate runs on an O(m) frame.
    */
  def bhFdr(events: DataFrame, group: Column, value: Column,
      groups: Seq[String], alpha: Double = 0.05,
      arm: Column => Column = hashArm, unit: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(groups.nonEmpty, "need at least one test")
    val zc = bhCriticalZ(groups.size, alpha)
    val isT = arm(unit) === "treat"
    val v = dec(value)
    val cells = events.filter(group.isin(groups: _*))
      .groupBy(group.as("grp"))
      .agg(
        sum(when(isT, 1L).otherwise(0L)).as("n_t"),
        sum(when(isT, v)).as("sy_t"), sum(when(isT, v * v)).as("ss_t"),
        sum(when(!isT, 1L).otherwise(0L)).as("n_c"),
        sum(when(!isT, v)).as("sy_c"), sum(when(!isT, v * v)).as("ss_c"))
    val nT = col("n_t").cast("double"); val nC = col("n_c").cast("double")
    val mT = col("sy_t").cast("double") / nT
    val mC = col("sy_c").cast("double") / nC
    val vT = col("ss_t").cast("double") / nT - mT * mT
    val vC = col("ss_c").cast("double") / nC - mC * mC
    // Welch terms use the UNBIASED sample variance: s²/n = popvar/(n−1)
    // (population moments inflated z by √(n/(n−1)) and made the FDR gate
    // anti-conservative for small arms — round-10 advice)
    // a degenerate family member (an arm with < 2 units — no variance
    // estimate — or zero variance in both arms, a constant metric) carries
    // no evidence: z = 0, never a 0/0
    val seSq = vT / (nT - lit(1.0)) + vC / (nC - lit(1.0))
    val z = when(col("n_t") <= 1 || col("n_c") <= 1, lit(0.0))
      .when(seSq === 0.0, lit(0.0))
      .otherwise((mT - mC) / sqrt(seSq))
    val w = Window.orderBy(desc("abs_z"), asc("grp"))
    val zcrit = zc.zipWithIndex.foldLeft(lit(Double.NaN)) {
      case (acc, (c, i)) => when(col("rank") === (i + 1), lit(c)).otherwise(acc)
    }
    val ranked = cells
      .select(col("grp"), col("n_t"), col("n_c"), z.as("z"), abs(z).as("abs_z"))
      .withColumn("rank", row_number().over(w))
      .withColumn("z_crit", zcrit)
      .withColumn("_pass", col("abs_z") >= col("z_crit"))
    val all = Window.orderBy("rank")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked
      .withColumn("_kstar",
        max(when(col("_pass"), col("rank"))).over(all))
      .select(col("grp"), col("n_t"), col("n_c"),
        round(col("z"), 6).as("z"), col("rank").cast("long").as("rank"),
        round(col("z_crit"), 6).as("z_crit"),
        (col("rank") <= coalesce(col("_kstar"), lit(0))).as("rejected"))
  }

  /** Cohen's kappa between two categorical labelings of the same rows —
    * the inter-annotator-agreement gate of a labeling pipeline (two model
    * versions, or model vs heuristic). κ = (p_o − p_e)/(1 − p_e) with p_e
    * from the raters' marginal distributions.
    *
    * One aggregate over the scan (the K×K confusion matrix is tiny);
    * observed and expected agreement come from exact integer cell counts,
    * so the three output doubles are pure scalar functions of integers.
    */
  def cohenKappa(df: DataFrame, raterA: Column, raterB: Column): DataFrame = {
    val cells = df.groupBy(raterA.as("a"), raterB.as("b"))
      .agg(count(lit(1)).as("n_cell"))
    // marginals via two tiny re-aggregations of the confusion matrix
    val total = cells.agg(sum("n_cell").as("n_total"),
      sum(when(col("a") === col("b"), col("n_cell")).otherwise(lit(0L)))
        .as("n_agree"))
    val margA = cells.groupBy("a").agg(sum("n_cell").as("n_a"))
    val margB = cells.groupBy("b").agg(sum("n_cell").as("n_b"))
    val expected = margA.join(margB, col("a") === col("b"))
      .agg(sum(col("n_a") * col("n_b")).as("sum_ab"))
    val nT = col("n_total").cast("double")
    val po = col("n_agree").cast("double") / nT
    val pe = col("sum_ab").cast("double") / (nT * nT)
    total.crossJoin(expected)
      .select(
        col("n_total"), col("n_agree"),
        round(po, 6).as("p_observed"),
        round(pe, 6).as("p_expected"),
        round((po - pe) / (lit(1.0) - pe), 6).as("kappa"))
  }

  /** PSI (population stability index) between a reference and a current
    * sample of the same metric over fixed-width bins: per bin,
    * term = (p − q)·ln(p/q) with add-one-smoothed bin probabilities
    * (PSI is undefined on empty bins; smoothing keeps the index total and
    * finite without dropping bins). Σ term > 0.2 is the conventional
    * "population shifted" alarm.
    *
    * Emits one row PER BIN (term in fixed-point ppm) — the attribution
    * view: which value range moved, not just that something did. The
    * total is the sum of a `bins`-row frame, driver-trivial.
    *
    * Plan: one bin-keyed aggregate per side (map-side combinable), a
    * `bins`-row outer join — current rows never co-shuffle with reference
    * rows.
    */
  def psi(ref: DataFrame, cur: DataFrame, value: Column,
      bins: Int, lo: Double, hi: Double): DataFrame = {
    require(bins > 0 && hi > lo, "need a positive bin count and lo < hi")
    val width = (hi - lo) / bins
    def binned(df: DataFrame, as: String) = df
      .select(least(greatest(
        floor((value - lit(lo)) / lit(width)).cast("int"), lit(0)),
        lit(bins - 1)).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(as))
    // the O(bins) joined frame has two consumers (rows + totals) —
    // materialize it eagerly so each side's scan runs exactly once
    val b = binned(ref, "ref_n").join(binned(cur, "cur_n"), Seq("bin"), "full")
      .select(col("bin"),
        coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
      .localCheckpoint(true)
    val tot = b.agg(sum("ref_n").as("ref_t"), sum("cur_n").as("cur_t"))
    val p = (col("ref_n") + lit(1)).cast("double") /
      (col("ref_t") + lit(bins)).cast("double")
    val q = (col("cur_n") + lit(1)).cast("double") /
      (col("cur_t") + lit(bins)).cast("double")
    b.crossJoin(broadcast(tot))
      .select(col("bin").cast("long").as("bin"), col("ref_n"), col("cur_n"),
        floor(p * lit(1000000.0)).cast("long").as("ref_ppm"),
        floor(q * lit(1000000.0)).cast("long").as("cur_ppm"),
        floor((p - q) * log(p / q) * lit(1000000.0)).cast("long")
          .as("psi_term_ppm"))
  }
}
