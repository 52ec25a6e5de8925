package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed exact statistics over integer-valued samples.
  *
  * Everything here follows the engine's determinism contract: counts and
  * cross-multiplied products stay integer (DECIMAL(38,0) where products can
  * outgrow longs), and any double appears only at the output boundary as a
  * division of exact integers — so results are partition/order/engine-exact.
  */
object Stats {

  /** Poisson(1) CDF thresholds on the 20-bit uniform lattice as FIVE-HEX
    * strings, f"floor(cdf_k · 2²⁰)%05x" for k = 0..8 (the k > 8 tail is
    * < 1.2e-6, at the lattice resolution, and truncated identically
    * everywhere). Hex-string form because fixed-width lowercase hex
    * compares lexicographically exactly as it compares numerically in
    * EVERY engine — the draw is a raw md5 substring compared against
    * these literals, no base conversion in the hot path. Computed ONCE
    * here and inlined into both the Spark plan and the DuckDB oracle —
    * the dcgWeights pattern: no cross-engine exp() dependence.
    */
  val poissonThresholdsHex: Seq[String] = {
    val pmf = (0 to 8).map(k => math.exp(-1.0) / (1 to k).product)
    pmf.scanLeft(0.0)(_ + _).tail
      .map(cdf => f"${math.floor(cdf * 1048576.0).toLong}%05x") // 2^20
  }

  /** Poisson bootstrap (the bootstrap that scales): instead of B
    * multinomial resamples — which need global coordination — each row
    * independently contributes Poisson(1) copies of itself to each
    * replicate, with the count derived from a 20-bit md5 draw of
    * (row key, replicate group). Per-row independence is the whole point
    * at 100 TB: one pass, no shared state, and the md5 derivation makes
    * every replicate REPRODUCIBLE across reruns, partitionings and
    * engines (rand() is none of those). The replicate explosion fuses
    * into the map-side partial aggregate — B·rows never materializes; the
    * shuffle is B rows per partition.
    *
    * Hot-path economics: one md5 serves SIX replicates (six disjoint
    * 5-hex draws per digest), and each draw is a fixed-width hex STRING
    * compare against the inlined thresholds — no hex→int conversion per
    * (row, replicate). That's what keeps B = 32 at ~one md5 per 6 rows
    * of work instead of 32 digests + 32 base conversions per row.
    *
    * Returns one row per replicate: (b, n_eff, mean) with the mean a
    * single division of exact decimal/integer sums.
    */
  def poissonBootstrap(df: DataFrame, key: Column, value: Column,
      replicates: Int = 32): DataFrame = {
    require(replicates >= 1, "need at least one replicate")
    val nGroups = (replicates + 5) / 6
    val cnt = poissonThresholdsHex.zipWithIndex
      .foldRight(lit(poissonThresholdsHex.size): Column) {
        case ((t, k), acc) => when(col("_d") < lit(t), lit(k)).otherwise(acc)
      }
    // value in exact integer CENTS: the 19.2M-row hot path multiplies and
    // partial-aggregates longs, not decimals; the closing division undoes
    // the scaling while both sums are exactly representable doubles.
    // fanOutScan: the B·rows md5 ladder is the suite's heaviest map-side
    // expression chain — an under-split input must not run it on one core
    Parallelism.fanOutScan(df)
      .select(key.cast("string").as("k"),
        (value.cast(DecimalType(18, 2)) * 100).cast("long").as("vc"))
      // one digest per (row, group of 6 replicates)…
      .select(col("vc"),
        explode(sequence(lit(0L), lit(nGroups - 1L))).as("g"),
        col("k"))
      .select(col("vc"), col("g"),
        expr("md5(cast(concat(k, ':', cast(g as string)) as binary))").as("h"))
      // …then six 5-hex draws out of it — posexplode over an array of
      // LITERAL-offset substrings (codegen'd), not a transform() lambda
      // (interpreted per row — measured 2× slower on this hot path)
      .select(col("vc"), col("g"), posexplode(array(
        (0 to 5).map(j => expr(s"substring(h, ${1 + 5 * j}, 5)")): _*))
        .as(Seq("j", "_d")))
      .select((col("g") * 6 + col("j")).as("b"), col("vc"), col("_d"))
      .filter(col("b") < replicates)
      .select(col("b"), col("vc"), cnt.as("cnt"))
      .groupBy("b")
      .agg(sum(col("cnt").cast("long")).as("n_eff"),
        sum(col("vc") * col("cnt")).as("sv"))
      .select(col("b").cast("long").as("b"), col("n_eff"),
        when(col("n_eff") === 0, lit(0.0))
          .otherwise(col("sv").cast("double") / lit(100.0)
            / col("n_eff").cast("double"))
          .as("mean"))
  }

  /** Kaplan–Meier survival curve with right-censoring at a common horizon:
    * subjects arrive as one row each with `duration` = time to event, or
    * NULL if no event occurred before the horizon (the subject then stays
    * in the risk set past every observed event time, so
    * n_risk(t) = total − Σ_{s<t} d_s exactly). Emits one row per distinct
    * event time: (duration, n_risk, d, surv_ppm) with
    * S(t) = Π (1 − d/n) accumulated as a cumulative Σ ln(1−d/n), with
    * each ln-term quantized to a ·1e9 fixed-point long BEFORE the window:
    * integer window sums are exact under ANY accumulation order (engines
    * are free to fold framed float aggregates hierarchically — a raw
    * double running sum would be order-fragile), so the curve is
    * engine-identical.
    *
    * Scale shape: both running sums (the death prefix that shrinks the
    * risk set, and the Σ ln-term that forms S(t)) ride ONE
    * range-partitioned distributed cumsum pass
    * ([[Ranking.withGlobalCumSumChain]]) — NOT an unpartitioned window:
    * the aggregated frame is O(distinct durations), which at 100 TB with
    * fine-grained durations (ms-resolution lifetimes) is itself huge, and
    * a single-task global sort-window over it was the last unbounded-ish
    * WindowExec in the declared suite (round-11 verdict #4). Integer
    * cumsums are exact under any partitioning, so the curve is unchanged
    * bit for bit.
    */
  def kaplanMeier(subjects: DataFrame, duration: Column): DataFrame = {
    val d = subjects.select(duration.cast("long").as("t"))
    val total = d.agg(count(lit(1)).as("n_total"))
    val byT = d.filter(col("t").isNotNull)
      .groupBy("t").agg(count(lit(1)).as("d"))
    Ranking.withGlobalCumSumChain(byT, Seq(col("t")),
      // stage 1: inclusive death prefix → exclusive via − d → risk set
      col("d"), "cd",
      first => first
        .crossJoin(broadcast(total))
        .withColumn("n_risk", col("n_total") - (col("cd") - col("d")))
        .withColumn("lnterm_fp",
          // d == n_risk (everyone remaining dies) would be ln(0) = -inf;
          // pin it to a finite sentinel that still drives surv to 0
          when(col("d") === col("n_risk"), lit(-100000000000L))
            .otherwise(floor(
              log(lit(1.0) - col("d").cast("double") / col("n_risk").cast("double"))
                * lit(1000000000.0)).cast("long"))),
      // stage 2: inclusive Σ ln-terms → S(t)
      col("lnterm_fp"), "cln")
      .withColumn("surv_ppm",
        floor(exp(col("cln").cast("double") / lit(1000000000.0))
          * lit(1000000.0)).cast("long"))
      .select(col("t").as("duration"), col("n_risk"), col("d"),
        col("surv_ppm"))
  }

  /** Split-conformal prediction interval (Vovk; Lei et al.) for a linear
    * model, end to end: md5-split the rows into train (fit a least-squares
    * line from exact decimal moments), calibration (take the
    * ⌈(n+1)(1−α)⌉-th smallest absolute residual as the interval radius
    * q̂ — the distribution-free guarantee needs EXACTLY this order
    * statistic) and test (measure empirical coverage of ŷ ± q̂, which the
    * conformal theorem lower-bounds by 1−α in expectation).
    *
    * Scale shape: the order statistic is the hard part at 100 TB — a
    * global sort of calibration residuals won't fly. Residuals quantize to
    * fixed-point longs, group to (value, count), and the k-th smallest
    * falls out of [[Ranking.withGlobalCumSum]] (range-partitioned
    * distributed cumsum — no single-task window). α is the exact rational
    * aNum/aDen so the rank index is integer arithmetic.
    *
    * One row out: split sizes, the fit, q̂ (cents), covered count and
    * coverage ppm.
    */
  def splitConformal(df: DataFrame, key: Column, x: Column, y: Column,
      aNum: Int = 1, aDen: Int = 10): DataFrame = {
    require(aNum > 0 && aNum < aDen, "alpha must be in (0, 1)")
    val xd = x.cast(DecimalType(18, 2)); val yd = y.cast(DecimalType(18, 2))
    val b = substring(md5(key.cast("string").cast("binary")), 1, 2)
    // The (x, y, split) projection feeds TWO passes (train moments, then
    // residuals), and each pass's split filter would sink below any
    // repartition straight onto the under-split scan — so fan the scan out
    // AND settle the projection once (the spearman precedent): both passes
    // then read parallel checkpointed blocks instead of re-running the
    // md5 split on one core per pass.
    val base = Parallelism.fanOutScan(df).select(xd.as("x"), yd.as("y"),
      when(b < "55", "train").when(b < "aa", "cal").otherwise("test")
        .as("split"))
      .localCheckpoint(true)
    val fit = base.filter(col("split") === "train").agg(
        count(lit(1)).as("n_train"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum(col("x") * col("x")).cast("double").as("sxx"),
        sum(col("x") * col("y")).cast("double").as("sxy"))
      .select(col("n_train"),
        ((col("n_train") * col("sxy") - col("sx") * col("sy")) /
          (col("n_train") * col("sxx") - col("sx") * col("sx"))).as("slope"),
        col("sx"), col("sy"))
      .select(col("n_train"), col("slope"),
        ((col("sy") - col("slope") * col("sx")) /
          col("n_train").cast("double")).as("intercept"))
      .localCheckpoint(true)
    // |y - (a + b·x)| in cents — the same expression tree on both engines.
    // ONE residual pass covers BOTH holdout splits (the fit must exist
    // first, so two passes over the fact — train moments, then residuals —
    // is the floor): aggregate to (split, residual, count) and settle it;
    // everything downstream (calibration size, cumsum, test coverage) runs
    // on this O(distinct residuals) frame, never re-scanning the fact
    val resAgg = base.filter(col("split") =!= "train")
      .crossJoin(broadcast(fit))
      .select(col("split"), floor(abs(col("y").cast("double")
        - (col("intercept") + col("slope") * col("x").cast("double")))
        * lit(100.0)).cast("long").as("r"))
      .groupBy("split", "r").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val calR = resAgg.filter(col("split") === "cal").select("r", "cnt")
    // empty calibration split: n_cal must be 0 (the oracle's count(*)),
    // not sum-over-empty NULL
    val calStats = calR.agg(coalesce(sum("cnt"), lit(0L)).as("n_cal"))
      .localCheckpoint(true)
    // k = ceil((n_cal + 1) · (1 − α)) via integer arithmetic
    val kRow = calStats.select(expr(
      s"cast((($aDen - $aNum) * (n_cal + 1) + ${aDen - 1}) div $aDen as bigint)")
      .as("kk"), col("n_cal"))
    // conformal convention when the calibration split is too small for the
    // requested miscoverage (k > n_cal, incl. n_cal = 0): q̂ = +∞ — every
    // test residual is covered, coverage 1 — not a NULL that poisons the
    // readout (round-10 advice). Long.MaxValue is +∞ in cents here.
    val qHat = Ranking.withGlobalCumSum(calR, Seq(col("r")), col("cnt"), "cum")
      .crossJoin(broadcast(kRow))
      .filter(col("cum") >= col("kk"))
      .agg(coalesce(min(col("r")), lit(Long.MaxValue)).as("q_hat"))
      .crossJoin(broadcast(kRow.select("n_cal")))
      .localCheckpoint(true)
    // q_hat / n_cal re-attach from the settled 1-row frame AFTER the
    // aggregate — min()-ing them through it would go NULL when the test
    // split is empty (0 rows in, min over nothing)
    val test = resAgg.filter(col("split") === "test")
      .crossJoin(broadcast(qHat))
      .agg(coalesce(sum("cnt"), lit(0L)).as("n_test"),
        coalesce(sum(when(col("r") <= col("q_hat"), col("cnt"))
          .otherwise(0L)), lit(0L)).as("covered"))
      .crossJoin(broadcast(qHat))
    test.crossJoin(broadcast(fit))
      .select(col("n_train"), col("n_cal"), col("n_test"),
        round(col("slope"), 6).as("slope"),
        round(col("intercept"), 6).as("intercept"),
        col("q_hat"), col("covered"),
        when(col("n_test") === 0, lit(0L))
          .otherwise(expr("covered * 1000000 div n_test")).as("coverage_ppm"))
  }

  /** Exact two-sample Kolmogorov–Smirnov distance between the `value`
    * distributions of the rows where `in1` / `in2` hold (value must be an
    * integral column — quantize first). Both ECDFs stay integer cumulative
    * counts via the distributed range-partitioned cumsum
    * ([[Ranking.withGlobalCumSum]] — no single-task global window), and the
    * max runs over |c1·n2 − c2·n1| in DECIMAL(38,0). Returns one row:
    * (n1, n2, d_num, d_stat).
    */
  def ksTest(df: DataFrame, value: Column, in1: Column, in2: Column): DataFrame = {
    // fanOutScan: quantize + class flags + the (v)-grouping partials are
    // map-side work an under-split scan would single-thread
    val x = Parallelism.fanOutScan(df).filter(in1 || in2)
      .select(value.as("v"),
        in1.cast("long").as("is1"), in2.cast("long").as("is2"))
    val g = x.groupBy("v").agg(sum("is1").as("n1"), sum("is2").as("n2"))
    // both class prefixes ride ONE range partitioning (round-12: two
    // back-to-back cumsum calls re-sampled and re-shuffled the same frame)
    val c2 = Ranking.withGlobalCumSums(g, Seq(col("v")),
      Seq((col("n1"), "c1"), (col("n2"), "c2")))
    val tot = x.agg(sum("is1").as("t1"), sum("is2").as("t2"))
    c2.crossJoin(broadcast(tot))
      .select(col("t1"), col("t2"),
        abs(col("c1").cast(DecimalType(38, 0)) * col("t2")
          - col("c2").cast(DecimalType(38, 0)) * col("t1")).as("dn"))
      .groupBy("t1", "t2").agg(max(col("dn")).as("dmax"))
      .select(col("t1").as("n1"), col("t2").as("n2"),
        col("dmax").cast("long").as("d_num"),
        // explicit zero-divisor guard: ANSI mode would otherwise throw on a
        // one-sided input; an empty comparison sample yields NULL, not a crash
        when(col("t1") * col("t2") === 0, lit(null).cast("double"))
          .otherwise(col("dmax").cast("double")
            / (col("t1") * col("t2")).cast("double"))
          .as("d_stat"))
      .orderBy("n1")
  }

  /** Exact Mann–Whitney U between the `value` distributions of the rows
    * where `in1` / `in2` hold (value must be integral — quantize first).
    * Tie-corrected via AVERAGE ranks, kept integral by working with 2×
    * ranks: for a value with `nt` observations and `cb` observations
    * strictly below it, 2·avgrank = 2·cb + nt + 1. The rank-sum uses the
    * distributed range-partitioned cumsum (no single-task global window);
    * rank sums and the U numerators stay DECIMAL(38,0)/HUGEINT, so the
    * statistic is partition/order/engine-exact; U itself is the one closing
    * halving (exact in doubles — 2×U is an integer).
    * Returns one row: (n1, n2, u1_x2, u2_x2, u_stat).
    */
  def mannWhitneyU(df: DataFrame, value: Column, in1: Column, in2: Column): DataFrame = {
    // fanOutScan: same under-split guard as ksTest (shared input shape)
    val x = Parallelism.fanOutScan(df).filter(in1 || in2)
      .select(value.as("v"),
        in1.cast("long").as("is1"), in2.cast("long").as("is2"))
    val g = x.groupBy("v")
      .agg(sum("is1").as("n1v"), sum("is2").as("n2v"))
      .withColumn("nt", col("n1v") + col("n2v"))
    val c = Ranking.withGlobalCumSum(g, Seq(col("v")), col("nt"), "cum")
    // 2×avgrank = 2·(cum − nt) + nt + 1 = 2·cum − nt + 1
    val r1 = c.agg(sum(col("n1v").cast(DecimalType(38, 0))
      * (col("cum") * 2 - col("nt") + 1)).as("r1_2"))
    val tot = x.agg(sum("is1").as("t1"), sum("is2").as("t2"))
    val d1 = col("t1").cast(DecimalType(38, 0))
    val d2 = col("t2").cast(DecimalType(38, 0))
    // U1 = R1 − n1(n1+1)/2, so 2×U1 = (2×R1) − n1(n1+1); r1_2 is 2×R1
    val u1 = col("r1_2") - d1 * (d1 + 1)
    r1.crossJoin(broadcast(tot))
      .select(col("t1"), col("t2"), u1.as("u1x2"), (d1 * d2 * 2 - u1).as("u2x2"))
      .select(col("t1").as("n1"), col("t2").as("n2"),
        col("u1x2").cast("long").as("u1_x2"),
        col("u2x2").cast("long").as("u2_x2"),
        (least(col("u1x2"), col("u2x2")).cast("double") / 2).as("u_stat"))
  }

  /** Exact Spearman rank correlation between `x` and `y` over the whole
    * frame, tie-corrected: Pearson computed on 2×-scaled AVERAGE ranks (the
    * 2× cancels in the ratio), which stay integers under ties. Per-variable
    * rank maps are O(distinct values) aggregates cumsum'd distributedly and
    * joined back; moments accumulate in DECIMAL(38,0); the ratio is double
    * only at the output boundary (rounded to 6 dp — the engine's Pearson
    * convention, see events_autocorr). Returns one row: (n, rho).
    *
    * Measured alternative (round 11, rejected): deriving everything from a
    * groupBy(x, y) pair-count relation (one corpus shuffle, marginal
    * moments off the rank maps, only the cross term joined back) LOST at
    * sf0.1 — with a near-unique variable the pair relation is the corpus,
    * so the "aggregation" only added a materialization (3.3 s vs 2.65 s
    * warm). It would win only when both variables are low-cardinality.
    */
  def spearman(df: DataFrame, x: Column, y: Column): DataFrame = {
    // the projected pair relation is read FOUR times (two rank-map
    // aggregates + two joins): checkpoint the 2-longs-per-row projection
    // once instead of re-scanning the fact table per consumer; fanOutScan
    // first so the checkpointed frame has parallel partitions (a single-
    // row-group input otherwise serializes every consumer behind one task)
    val base = Parallelism.fanOutScan(df)
      .select(x.as("xv"), y.as("yv")).localCheckpoint(true)
    def rankMap(c: String, out: String): DataFrame = {
      val g = base.groupBy(c).agg(count(lit(1)).as("nt"))
      Ranking.withGlobalCumSum(g, Seq(col(c)), col("nt"), "cum")
        .select(col(c), (col("cum") * 2 - col("nt") + 1).as(out))
    }
    // hash joins: the rank maps are aggregates keyed by the join key, a
    // sort-merge would pay two avoidable full sorts per join
    val j = base.hint("shuffle_hash")
      .join(rankMap("xv", "rx2"), "xv")
      .hint("shuffle_hash")
      .join(rankMap("yv", "ry2"), "yv")
    val dx = col("rx2").cast(DecimalType(38, 0))
    val dy = col("ry2").cast(DecimalType(38, 0))
    val den1 = col("n") * col("sxx") - col("sx") * col("sx")
    val den2 = col("n") * col("syy") - col("sy") * col("sy")
    j.agg(count(lit(1)).as("n"), sum(dx).as("sx"), sum(dy).as("sy"),
        sum(dx * dx).as("sxx"), sum(dy * dy).as("syy"), sum(dx * dy).as("sxy"))
      .select(col("n"),
        // zero-variance guard (constant column → 0/0): NULL, never a throw
        // (ANSI mode errors on a zero divisor) — the ksTest convention
        when(den1 === 0 || den2 === 0, lit(null).cast("double"))
          .otherwise(round(
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
              / (sqrt(den1.cast("double")) * sqrt(den2.cast("double"))), 6))
          .as("rho"))
  }
}
