package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Ranking

/** The distributed global rank must be INDISTINGUISHABLE from the
  * single-partition window forms it replaces — same ranks, same ntile
  * allocation — across ties, skew, and n-vs-k degeneracies.
  */
class RankingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def randomDf(n: Int, distinctVals: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(i => (rnd.nextInt(distinctVals).toLong, i.toLong))
      .toDF("v", "id")
  }

  test("withGlobalRowNumber equals the unpartitioned row_number window") {
    val df = randomDf(5000, 40, seed = 11) // heavy ties: 40 values, 5000 rows
    val got = Ranking.withGlobalRowNumber(df, Seq(col("v"), col("id")), "r", partitions = 7)
      .select("v", "id", "r").as[(Long, Long, Long)].collect().toSet
    val want = df.withColumn("r",
        row_number().over(Window.orderBy("v", "id")).cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("withGlobalRowNumber: single-value skew (ranks ride the tiebreaker alone)") {
    val df = (1 to 1000).map(i => (7L, i.toLong)).toDF("v", "id")
    val got = Ranking.withGlobalRowNumber(df, Seq(col("v"), col("id")), "r", partitions = 8)
      .select("id", "r").as[(Long, Long)].collect().toMap
    assert((1 to 1000).forall(i => got(i.toLong) == i.toLong))
  }

  test("withGlobalNtile equals ntile().over(global window) across shapes") {
    for ((n, k, parts) <- Seq((5000, 10, 7), (997, 10, 5), (9, 4, 3), (3, 10, 4))) {
      val df = randomDf(n, 50, seed = n + k)
      val got = Ranking.withGlobalNtile(df, Seq(col("v"), col("id")), k, "b", partitions = parts)
        .select("v", "id", "b").as[(Long, Long, Int)].collect().toSet
      val want = df.withColumn("b", ntile(k).over(Window.orderBy("v", "id")))
        .as[(Long, Long, Int)].collect().toSet
      assert(got == want, s"ntile mismatch at n=$n k=$k")
    }
  }

  test("withGlobalNtile: empty input stays empty") {
    val df = Seq.empty[(Long, Long)].toDF("v", "id")
    assert(Ranking.withGlobalNtile(df, Seq(col("v"), col("id")), 10, "b").count() == 0L)
  }

  test("withGlobalNtiles: both sides of the size gate produce identical buckets") {
    // three dimensions with heavy ties, both sort directions — the q_rfm
    // shape. smallLimit = 0 forces the distributed branch, Long.MaxValue
    // the local-window branch; the gate must be invisible in the output.
    val df = randomDf(2500, 30, seed = 42)
      .withColumn("w", pmod(col("id") * 7919, lit(13L)))
    val dims = Seq(
      (Seq(col("v").asc, col("id").asc), "a"),
      (Seq(col("w").desc, col("id").asc), "b"),
      (Seq(col("v").desc, col("id").asc), "c"))
    def run(limit: Long) =
      Ranking.withGlobalNtiles(df, dims, 5, smallLimit = limit)
        .select("id", "a", "b", "c").as[(Long, Int, Int, Int)].collect().toSet
    val local = run(Long.MaxValue)
    val distributed = run(0L)
    assert(local == distributed)
    // and both equal the reference window form
    val w = df
      .withColumn("a", ntile(5).over(Window.orderBy(col("v").asc, col("id").asc)))
      .withColumn("b", ntile(5).over(Window.orderBy(col("w").desc, col("id").asc)))
      .withColumn("c", ntile(5).over(Window.orderBy(col("v").desc, col("id").asc)))
      .select("id", "a", "b", "c").as[(Long, Int, Int, Int)].collect().toSet
    assert(local == w)
  }

  test("withGlobalCumSum equals the unpartitioned running-sum window (long values)") {
    val df = randomDf(3000, 25, seed = 3)
    val got = Ranking.withGlobalCumSum(df, Seq(col("v"), col("id")), col("id"), "c", partitions = 6)
      .select("v", "id", "c").as[(Long, Long, Long)].collect().toSet
    val w = Window.orderBy("v", "id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("c", sum(col("id")).over(w))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("withGlobalCumSums: N independent sums over one partitioning equal N window sums") {
    val df = randomDf(2000, 20, seed = 8)
      .withColumn("w", pmod(col("id") * 31, lit(7L)))
    val got = Ranking.withGlobalCumSums(df, Seq(col("v"), col("id")),
        Seq((col("id"), "ci"), (col("w"), "cw")), partitions = 5)
      .select("id", "ci", "cw").as[(Long, Long, Long)].collect().toSet
    val win = Window.orderBy("v", "id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df
      .withColumn("ci", sum(col("id")).over(win))
      .withColumn("cw", sum(col("w")).over(win))
      .select("id", "ci", "cw").as[(Long, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("withGlobalCumMax equals the unpartitioned running-max window") {
    val df = randomDf(3000, 25, seed = 11)
    val got = Ranking.withGlobalCumMax(df, Seq(col("id")), col("v"), "m", partitions = 6)
      .select("id", "v", "m").as[(Long, Long, Long)].collect().toSet
    val w = Window.orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("m", max(col("v")).over(w))
      .select("id", "v", "m").as[(Long, Long, Long)].collect().toSet
    assert(got == want)
    // empty input is empty, single row is its own max
    assert(Ranking.withGlobalCumMax(
      Seq.empty[(Long, Long)].toDF("id", "v"), Seq(col("id")), col("v"), "m").count() == 0)
    val one = Ranking.withGlobalCumMax(
      Seq((1L, 7L)).toDF("id", "v"), Seq(col("id")), col("v"), "m")
      .select("m").as[Long].head()
    assert(one == 7L)
  }

  test("withGlobalCumSum: exact decimal accumulation, descending order") {
    val df = (1 to 2000)
      .map(i => (i.toLong, new java.math.BigDecimal(s"$i.${i % 100}")))
      .toDF("id", "x")
      .select(col("id"), col("x").cast("decimal(12,2)").as("x"))
    val got = Ranking.withGlobalCumSum(df, Seq(desc("x"), asc("id")), col("x"), "c", partitions = 5)
      .select(col("id"), col("c").cast("string")).as[(Long, String)].collect().toSet
    val w = Window.orderBy(desc("x"), asc("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("c", sum(col("x")).over(w))
      .select(col("id"), col("c").cast("string")).as[(Long, String)].collect().toSet
    assert(got == want)
  }

  test("withGlobalCumSum rejects inexact (floating) value columns") {
    val df = Seq((1L, 1.5), (2L, 2.5)).toDF("id", "x")
    intercept[IllegalArgumentException] {
      Ranking.withGlobalCumSum(df, Seq(col("id")), col("x"), "c")
    }
  }

  test("property: rank/ntile/cumsum equal DEFINITIONAL in-memory references on random shapes") {
    // complements the window-equality tests above: the reference here is the
    // definition (sorted position; first-rem-buckets-take-ceil allocation
    // filled sequentially; running sum), not another Spark plan
    Seq(13, 47, 101).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 200 + rnd.nextInt(1500)
      val dv = 1 + rnd.nextInt(30) // includes heavy-tie regimes
      val parts = 2 + rnd.nextInt(12)
      val k = 2 + rnd.nextInt(15)
      val data = (1 to n).map(i => (rnd.nextInt(dv).toLong, i.toLong))
      val df = data.toDF("v", "id")
      val sorted = data.sorted
      val expRank = sorted.zipWithIndex.map { case (p, i) => p -> (i + 1L) }.toMap

      val gotRank = Ranking.withGlobalRowNumber(df, Seq(col("v"), col("id")), "r", parts)
        .select("v", "id", "r").as[(Long, Long, Long)].collect()
      assert(gotRank.length == n && gotRank.forall { case (v, id, r) => expRank((v, id)) == r },
        s"rank mismatch at seed=$seed n=$n parts=$parts")

      val q = n / k
      val rem = n % k
      val bucketOfRank = (1 to k).flatMap(b =>
        Seq.fill(q + (if (b <= rem) 1 else 0))(b)) // sequential fill per definition
      val gotN = Ranking.withGlobalNtile(df, Seq(col("v"), col("id")), k, "b", parts)
        .select("v", "id", "b").as[(Long, Long, Int)].collect()
      assert(gotN.forall { case (v, id, b) =>
        bucketOfRank(expRank((v, id)).toInt - 1) == b },
        s"ntile mismatch at seed=$seed n=$n k=$k")

      val expCum = sorted.zip(sorted.scanLeft(0L)(_ + _._2).tail).toMap
      val gotC = Ranking.withGlobalCumSum(df, Seq(col("v"), col("id")), col("id"), "c", parts)
        .select("v", "id", "c").as[(Long, Long, Long)].collect()
      assert(gotC.forall { case (v, id, c) => expCum((v, id)) == c },
        s"cumsum mismatch at seed=$seed n=$n parts=$parts")
    }
  }

  test("scratch-column collisions are refused loudly, never silently clobbered") {
    val df = Seq((1L, 2L)).toDF("v", "_pid")
    intercept[IllegalArgumentException] {
      Ranking.withGlobalRowNumber(df, Seq(col("v")), "r")
    }
  }
}
