package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.pipeline.Multimodal

/** Mathematical invariants of the round-5 statistics/planning operators —
  * properties that must hold for ANY input, checked on deterministic
  * pseudo-random data (no fixed oracle values, so these complement the
  * DuckDB hash gate rather than duplicating it).
  */
class StatsPropertySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("resizePlan: never upscales, respects the box, preserves orientation") {
    val rnd = new scala.util.Random(7)
    val dims = (1 to 300).map(i =>
      (i.toLong, 1 + rnd.nextInt(2000), 1 + rnd.nextInt(2000)))
    val meta = dims.toDF("doc_id", "width", "height")
    val out = Multimodal.resizePlan(meta, 224, 224)
      .as[(Long, Int, Int, Int, Int)].collect()
    out.foreach { case (id, w, h, ow, oh) =>
      assert(ow <= 224 && oh <= 224, s"doc $id exceeds the box: ${ow}x$oh")
      assert(ow <= w && oh <= h, s"doc $id upscaled: ${w}x$h -> ${ow}x$oh")
      assert(ow >= 1 && oh >= 1, s"doc $id degenerate output: ${ow}x$oh")
      // orientation (landscape vs portrait) survives the resize
      if (w > h) assert(ow >= oh, s"doc $id flipped orientation")
      if (h > w) assert(oh >= ow, s"doc $id flipped orientation")
      // a fitting image passes through untouched
      if (w <= 224 && h <= 224) assert(ow == w && oh == h)
    }
  }

  test("bandedHammingPairs pigeonhole recall: exactly the ≤maxHamming pairs, no more, no fewer") {
    import graft.pipeline.Dedup
    val rnd = new scala.util.Random(42)
    // 40 random 64-bit fingerprints, each with a partner 0-3 bit flips away
    // (flips may cancel — brute force below is the truth either way)
    val rows = (0 until 40).flatMap { i =>
      val base = rnd.nextLong()
      val flipped = (1 to rnd.nextInt(4))
        .foldLeft(base)((b, _) => b ^ (1L << rnd.nextInt(64)))
      Seq((i * 2L, base), (i * 2L + 1, flipped))
    }
    val found = Dedup.bandedHammingPairs(rows.toDF("doc_id", "fp"), 64, 4, 3)
      .as[(Long, Long, Int)].collect()
      .map(p => (p._1, p._2)).toSet
    val truth = (for {
      a <- rows; b <- rows
      if a._1 < b._1 && java.lang.Long.bitCount(a._2 ^ b._2) <= 3
    } yield (a._1, b._1)).toSet
    assert(found == truth,
      s"missed=${truth -- found} extra=${found -- truth}")
    assert(truth.size >= 30, "fixture must exercise a real pair population")
  }

  test("ksTest: identical→0, disjoint→1, hand case, scale invariance") {
    import graft.operators.Stats
    import org.apache.spark.sql.functions.{col, lit}
    // identical distributions (every row in both samples) → D = 0
    val same = (1 to 100).map(i => (i.toLong % 7)).toDF("v")
    val r0 = Stats.ksTest(same, col("v"), lit(true), lit(true)).head()
    assert(r0.getLong(2) == 0L && r0.getDouble(3) == 0.0)
    // disjoint supports → D = 1
    val dis = ((1 to 50).map(i => (i.toLong, true)) ++
      (101 to 150).map(i => (i.toLong, false))).toDF("v", "a")
    val r1 = Stats.ksTest(dis, col("v"), col("a"), !col("a")).head()
    assert(r1.getDouble(3) == 1.0)
    // hand case: {1,2} vs {2,3} → d_num=2 over 2·2 → 0.5
    val h = Seq((1L, true), (2L, true), (2L, false), (3L, false)).toDF("v", "a")
    val r2 = Stats.ksTest(h, col("v"), col("a"), !col("a")).head()
    assert(r2.getLong(2) == 2L && r2.getDouble(3) == 0.5)
    // monotone (affine) transform leaves D unchanged
    val r3 = Stats.ksTest(h.withColumn("v", col("v") * 1000 + 7),
      col("v"), col("a"), !col("a")).head()
    assert(r3.getLong(2) == r2.getLong(2) && r3.getDouble(3) == r2.getDouble(3))
  }

  test("mannWhitneyU: identical→U1=U2, separation→0, tie hand case, shift invariance") {
    import graft.operators.Stats
    import org.apache.spark.sql.functions.{col, lit}
    // identical samples → U1 = U2 = n1·n2/2 (u1_x2 = u2_x2 = n1·n2)
    val same = (1 to 60).map(i => (i.toLong % 9)).toDF("v")
    val r0 = Stats.mannWhitneyU(same, col("v"), lit(true), lit(true)).head()
    assert(r0.getLong(2) == r0.getLong(3) && r0.getLong(2) == 60L * 60L)
    // complete separation: group A strictly below B → U1 = 0, U2 = n1·n2
    val sep = ((1 to 30).map(i => (i.toLong, true)) ++
      (100 to 129).map(i => (i.toLong, false))).toDF("v", "a")
    val r1 = Stats.mannWhitneyU(sep, col("v"), col("a"), !col("a")).head()
    assert(r1.getLong(2) == 0L && r1.getLong(3) == 1800L && r1.getDouble(4) == 0.0)
    // tie hand case: {1,2} vs {2,3} — avg ranks 1, 2.5, 2.5, 4 →
    // R1 = 3.5, U1 = 0.5, U2 = 3.5
    val h = Seq((1L, true), (2L, true), (2L, false), (3L, false)).toDF("v", "a")
    val r2 = Stats.mannWhitneyU(h, col("v"), col("a"), !col("a")).head()
    assert(r2.getLong(2) == 1L && r2.getLong(3) == 7L && r2.getDouble(4) == 0.5)
    // monotone (affine) transform leaves U unchanged
    val r3 = Stats.mannWhitneyU(h.withColumn("v", col("v") * 500 + 3),
      col("v"), col("a"), !col("a")).head()
    assert(r3.getLong(2) == r2.getLong(2) && r3.getDouble(4) == r2.getDouble(4))
  }

  test("spearman: ±1 on monotone (nonlinear) data, tie-corrected hand case") {
    import graft.operators.Stats
    import org.apache.spark.sql.functions.col
    // perfectly monotone but NONLINEAR association → rho exactly 1
    // (Pearson on these values would be < 1 — the rank transform is the point)
    val cube = (1L to 50L).map(x => (x, x * x * x)).toDF("x", "y")
    assert(Stats.spearman(cube, col("x"), col("y")).head().getDouble(1) == 1.0)
    val neg = (1L to 50L).map(x => (x, -(x * x))).toDF("x", "y")
    assert(Stats.spearman(neg, col("x"), col("y")).head().getDouble(1) == -1.0)
    // hand case with ties: x=(1,2,2,3), y=(1,3,3,5) — identical rank
    // vectors under average ranks → rho = 1
    val ties = Seq((1L, 1L), (2L, 3L), (2L, 3L), (3L, 5L)).toDF("x", "y")
    assert(Stats.spearman(ties, col("x"), col("y")).head().getDouble(1) == 1.0)
    // reversal → -1 even with ties
    val rev = Seq((1L, 5L), (2L, 3L), (2L, 3L), (3L, 1L)).toDF("x", "y")
    assert(Stats.spearman(rev, col("x"), col("y")).head().getDouble(1) == -1.0)
  }

  test("gini formula: 0 for perfect equality, approaches 1 for concentration") {
    import org.apache.spark.sql.expressions.Window
    def gini(values: Seq[Double]): Double = {
      val df = values.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("k", "x0")
        .select(col("k"), col("x0").cast("decimal(18,2)").as("x"))
      val ranked = df.withColumn("i",
        row_number().over(Window.orderBy("x", "k")))
      ranked.agg(
        ((lit(2) * sum(col("x") * col("i")).cast("double") -
          (count(lit(1)) + lit(1)) * sum(col("x")).cast("double")) /
          (count(lit(1)) * sum(col("x")).cast("double"))).as("g"))
        .as[Double].head()
    }
    assert(math.abs(gini(Seq.fill(50)(10.0))) < 1e-12, "equal incomes must give 0")
    // one holder of everything among n: G = (n-1)/n
    val n = 40
    val concentrated = Seq.fill(n - 1)(0.01) ++ Seq(100000.0)
    assert(gini(concentrated) > 0.9, "extreme concentration must approach 1")
  }

  test("pearson r from integer sums stays in [-1, 1] and is exactly ±1 on linear data") {
    def corr(xs: Seq[Long], ys: Seq[Long]): Double = {
      val df = xs.zip(ys).toDF("x", "y")
      df.agg(
        ((count(lit(1)) * sum(col("x") * col("y")) - sum("x") * sum("y")).cast("double") /
          (sqrt((count(lit(1)) * sum(col("x") * col("x")) - sum("x") * sum("x")).cast("double")) *
           sqrt((count(lit(1)) * sum(col("y") * col("y")) - sum("y") * sum("y")).cast("double"))))
          .as("r")).as[Double].head()
    }
    val xs = (1L to 100L).toSeq
    assert(math.abs(corr(xs, xs.map(_ * 3 + 7)) - 1.0) < 1e-12)
    assert(math.abs(corr(xs, xs.map(x => -2 * x + 5)) + 1.0) < 1e-12)
    val rnd = new scala.util.Random(11)
    val noisy = xs.map(_ => rnd.nextInt(1000).toLong)
    val r = corr(xs, noisy)
    assert(r >= -1.0 && r <= 1.0)
  }

  test("driver smoke: SparkEntry.entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
