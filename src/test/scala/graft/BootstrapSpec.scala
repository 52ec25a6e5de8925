package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Stats

class BootstrapSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("poissonThresholds52: match the Poisson(1) CDF, strictly increasing") {
    val ts = Stats.poissonThresholds52
    assert(ts.size === 9)
    assert(math.abs(ts.head / 4503599627370496.0 - math.exp(-1.0)) < 1e-12)
    assert(ts.sliding(2).forall(p => p(0) < p(1)))
    // k=1 cdf = 2/e
    assert(math.abs(ts(1) / 4503599627370496.0 - 2 * math.exp(-1.0)) < 1e-12)
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
