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

  test("scratch-column collisions are refused loudly, never silently clobbered") {
    val df = Seq((1L, 2L)).toDF("v", "_pid")
    intercept[IllegalArgumentException] {
      Ranking.withGlobalRowNumber(df, Seq(col("v")), "r")
    }
  }
}
