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
}
