package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic train/val/test split assignment by content hash — the
  * split step of a training-data pipeline.
  *
  * Why hash, not rand(): a random split is irreproducible across reruns and
  * re-partitions, and at 100 TB the pipeline WILL rerun (backfills, late
  * partitions). Hashing the stable document key gives every row the same
  * split on every run, on any cluster layout, with no shuffle and no state
  * — and downstream joins between differently-produced tables agree on the
  * split for free.
  *
  * The hash is md5 (not Spark's xxhash64/hash) because md5 is
  * engine-portable: any system — the DuckDB oracle, a Python sanity check,
  * a later non-Spark consumer — recomputes the identical assignment. The
  * first two hex chars (256 uniform buckets) are compared lexicographically,
  * which for fixed-width lowercase hex equals numeric comparison in every
  * engine.
  */
object Splits {

  /** Bucket in [0,256) as a two-hex-char string, uniform under md5. */
  def hashBucket(key: Column): Column =
    substring(md5(key.cast("string").cast("binary")), 1, 2)

  /** Split label: first `testBuckets` of 256 → "test", next `valBuckets` →
    * "val", rest → "train" (e.g. 13/26 ≈ 5%/10%).
    */
  def assignSplit(key: Column, testBuckets: Int = 13, valBuckets: Int = 26): Column = {
    require(testBuckets >= 0 && valBuckets >= 0 && testBuckets + valBuckets <= 256,
      "bucket counts must fit in [0, 256]")
    val b = hashBucket(key)
    when(b < lit(f"$testBuckets%02x"), "test")
      .when(b < lit(f"${testBuckets + valBuckets}%02x"), "val")
      .otherwise("train")
  }

  /** 16-bit sample coordinate in [0, 0x10000) as four hex chars. Salted with
    * a ":sample" suffix so sampling decisions are independent of
    * [[hashBucket]]/[[assignSplit]] (the unsalted prefix would correlate
    * "keep" with "test" — the first buckets of the same md5).
    */
  def sampleHash(key: Column): Column =
    substring(md5(concat(key.cast("string"), lit(":sample")).cast("binary")), 1, 4)

  /** Deterministic per-stratum sampling predicate: keep a row iff its
    * [[sampleHash]] falls below `floor(fraction * 65536)` for its stratum
    * (fixed-width lowercase hex compares like the number in every engine).
    * Strata absent from `fractions` are dropped — `sampleBy` semantics
    * (null strata are likewise absent-from-map, hence dropped).
    *
    * Unlike seeded `rand()`/`sampleBy` (partition-layout-dependent RNG
    * streams), the decision is a pure function of the row's key: the sample
    * is identical across reruns, engines, and cluster layouts — which is
    * what a 100 TB backfill needs, and what lets the DuckDB oracle recompute
    * the exact same sample.
    */
  def stratifiedKeep(key: Column, strata: Column, fractions: Map[String, Double]): Column =
    fractions.toSeq.sortBy(_._1).foldLeft(lit(false)) { case (acc, (stratum, frac)) =>
      val keep =
        if (frac >= 1.0) lit(true)
        else sampleHash(key) < lit(f"${math.floor(frac * 65536).toLong}%04x")
      when(strata === stratum, keep).otherwise(acc)
    }

  /** 52-bit sample coordinate (13 hex chars of a salted md5) as a long —
    * fits a double exactly, so it can pass through TopKAgg's double heap
    * without precision loss. Distinct keys get distinct coordinates (md5
    * collision odds are negligible), making k-th-smallest thresholds exact.
    */
  private[graft] def sampleCoord(key: Column): Column =
    conv(substring(md5(concat(key.cast("string"), lit(":gsample")).cast("binary")),
      1, 13), 16, 10).cast("long")

  /** Deterministic k-fold cross-validation assignment: fold(key) ∈ [0, k),
    * uniform under md5, independent of the other surfaces (salt ":fold").
    * Every engine recomputes the same folds — train/eval jobs on different
    * stacks agree without shipping an assignment table.
    */
  def foldAssign(key: Column, k: Int): Column = {
    require(k >= 2 && k <= 256, s"k must be in [2, 256], got $k")
    (conv(substring(md5(concat(key.cast("string"), lit(":fold")).cast("binary")),
      1, 2), 16, 10).cast("int") % k).as("fold")
  }

  /** 52-bit weighted-sample coordinate (13 hex chars of a salted md5) in
    * [0, 2^52). Salt ":wsample" keeps weighted-sampling decisions
    * independent of [[assignSplit]]/[[sampleHash]]/[[sampleCoord]].
    */
  private[graft] def weightCoord(key: Column): Column =
    conv(substring(md5(concat(key.cast("string"), lit(":wsample")).cast("binary")),
      1, 13), 16, 10).cast("long")

  /** Deterministic weighted Bernoulli sample: keep a row with probability
    * min(1, weight · rate) — e.g. length-weighted document sampling, where a
    * 10× longer doc is 10× likelier to be drawn. The decision is a pure
    * function of the row key (coordinate < floor(p · 2^52), integer compare)
    * so the sample is identical across reruns, engines, and layouts, and
    * rows with weight ≥ 1/rate are ALWAYS kept (p = 1 ⇒ threshold 2^52,
    * above every coordinate). Map-side predicate: no shuffle, no state.
    */
  def weightedKeep(key: Column, weight: Column, rate: Double): Column = {
    require(rate > 0, "rate must be positive")
    val p = least(lit(1.0), weight.cast("double") * rate)
    weightCoord(key) < floor(p * lit(4503599627370496.0)).cast("long") // 2^52
  }

  /** Keep with probability ≈ 1/n — the soft-dedup decision: instead of
    * dropping duplicates, each member of an n-strong cluster survives
    * with probability 1/n, so every cluster contributes ~one copy in
    * expectation while rare docs are never lost. Decided as
    * u(key)·n < 2^52 (multiply, not divide — exact integer compare on
    * both engines with no floor-vs-truncate edge); sound while
    * n < 2^11 · (clusters larger than ~2000 would overflow the product;
    * cap n upstream if that ever holds).
    */
  def inverseKeep(key: Column, n: Column, salt: String = ":soft"): Column =
    conv(substring(md5(concat(key.cast("string"), lit(salt)).cast("binary")),
      1, 13), 16, 10).cast("long") * n < lit(4503599627370496L) // 2^52

  /** 52-bit mixing coordinate; salt ":mix" keeps mixing decisions
    * independent of the other sampling surfaces.
    */
  private[graft] def mixCoord(key: Column): Column =
    conv(substring(md5(concat(key.cast("string"), lit(":mix")).cast("binary")),
      1, 13), 16, 10).cast("long")

  /** Deterministic source mixing: downsample groups so the surviving corpus
    * matches `targets`' proportions (the data-mixing step of a training
    * pipeline — "40% web, 30% books, …"). The achievable total is bound by
    * the scarcest group: T = min_g count_g / target_g; each group then keeps
    * fraction target_g·T/count_g of its rows via the salted md5-coordinate
    * threshold (the binding group keeps everything). Groups absent from
    * `targets` are dropped.
    *
    * Scale shape: one tiny count aggregate (rows = groups), fractions
    * broadcast back, then a map-side integer-compare filter — the corpus is
    * never shuffled, and the kept set is a pure function of each row's key
    * (identical across engines/reruns/layouts; proportions hold to binomial
    * noise, not exactly).
    */
  def mixToProportions(
      df: DataFrame,
      group: Column,
      key: Column,
      targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0),
      "targets must be non-empty with positive shares")
    val tcol = targets.toSeq.sortBy(_._1).foldLeft(lit(null).cast("double")) {
      case (acc, (g, t)) => when(group === g, lit(t)).otherwise(acc)
    }
    val withT = df.withColumn("_mix_t", tcol).filter(col("_mix_t").isNotNull)
    val counts = withT.groupBy(group.as("_mix_g"), col("_mix_t"))
      .agg(count(lit(1)).as("_mix_n"))
    val tot = counts.agg(min(col("_mix_n").cast("double") / col("_mix_t")).as("_mix_tot"))
    val fracs = counts.crossJoin(broadcast(tot))
      .select(col("_mix_g"),
        least(lit(1.0), col("_mix_t") * col("_mix_tot") / col("_mix_n").cast("double"))
          .as("_mix_frac"))
    withT.join(broadcast(fracs), group === col("_mix_g"))
      .filter(mixCoord(key) <
        floor(col("_mix_frac") * lit(4503599627370496.0)).cast("long")) // 2^52
      .drop("_mix_t", "_mix_g", "_mix_frac")
  }

  /** Temperature-flattened mixing at α = 1/2: group g keeps fraction
    * (n_min/n_g)^α — the counts^α reweighting that upsamples scarce
    * languages/domains relative to their natural share (temperature-based
    * sampling in multilingual LLM training mixes; α=1 is the natural
    * distribution, α→0 uniform). The smallest group keeps everything; a
    * group 4× larger keeps half its rows instead of a quarter.
    *
    * α is fixed at 1/2 deliberately: sqrt is IEEE-correctly-rounded on
    * every engine and floor(sqrt(r)·2^52) scales by a power of two (exact),
    * so the per-row keep decision is bit-identical across engines — an
    * arbitrary pow() exponent would not be. Same scale shape as
    * [[mixToProportions]]: one tiny count aggregate, broadcast rates, one
    * map-side integer-compare filter; the corpus never shuffles.
    */
  def temperatureFlatten(df: DataFrame, group: Column, key: Column): DataFrame = {
    val counts = df.groupBy(group.as("_tf_g")).agg(count(lit(1)).as("_tf_n"))
    // n_min via a global window over the O(groups) count frame — the frame
    // is tiny by definition, and deriving it in-plan keeps the corpus
    // scanned exactly twice (count pass + keep pass), not three times
    val rates = counts
      .withColumn("_tf_min",
        min("_tf_n").over(org.apache.spark.sql.expressions.Window
          .partitionBy(lit(1))))
      .select(col("_tf_g"),
        sqrt(col("_tf_min").cast("double") / col("_tf_n").cast("double")).as("_tf_p"))
    df.join(broadcast(rates), group === col("_tf_g"))
      .filter(mixCoord(key) <
        floor(col("_tf_p") * lit(4503599627370496.0)).cast("long")) // 2^52
      .drop("_tf_g", "_tf_p")
  }

  /** Deterministic per-group uniform k-sample ("min-hash reservoir"): the k
    * rows with the smallest salted-md5 coordinate in each group. Uniform
    * because md5 is; deterministic and engine/layout-independent for the
    * same reasons as [[stratifiedKeep]] — and count-based where
    * stratifiedKeep is fraction-based (the two sampling surfaces a
    * rebalancing pipeline needs).
    *
    * Scale shape: a `row_number` window would shuffle and sort EVERY row per
    * group. Instead TopKAgg reduces each map partition to ≤k coordinates, the
    * per-group k-th-smallest threshold table (one tiny row per group) is
    * broadcast back, and rows keep iff coordinate ≤ threshold — the shuffle
    * carries O(partitions·k), never the table.
    *
    * `key` must be unique per row (it is the row's sampling identity):
    * duplicate keys share a coordinate, and every row at the threshold
    * coordinate is kept, so duplicates would push a group past k.
    */
  def sampleKPerGroup(df: DataFrame, group: Column, key: Column, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val hashed = df.withColumn("_gs_h", sampleCoord(key))
    // TopKAgg keeps the k LARGEST, so feed negated coordinates; the last
    // (smallest) element of the descending top array is minus the k-th
    // smallest coordinate — the group's admission threshold.
    val thr = hashed.groupBy(group.as("_gs_g"))
      .agg(graft.functions.TopKAgg.topK(-col("_gs_h").cast("double"), k).as("_t"))
      .select(col("_gs_g"),
        (-element_at(col("_t"), size(col("_t")))).cast("long").as("_gs_thr"))
    // null-safe equality: a null group is a legitimate stratum for groupBy,
    // so it must also match its own threshold row (plain === would silently
    // drop every null-group row)
    hashed.join(broadcast(thr), group <=> col("_gs_g"))
      .filter(col("_gs_h") <= col("_gs_thr"))
      .drop("_gs_h", "_gs_g", "_gs_thr")
  }
}
