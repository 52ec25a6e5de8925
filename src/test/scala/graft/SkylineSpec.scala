package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skyline

/** The distributed sweep must equal the sequential dominance definition for
  * ANY partition count — partition boundaries are where the seeding logic
  * can silently drop or admit rows.
  */
class SkylineSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("sweep2d equals the sequential sweep on a random fixture, for 1/3/32 partitions") {
    val rnd = new scala.util.Random(42)
    // duplicate prices on purpose: ties break on id, the sweep's key column
    val pts = (1L to 500L).map(i => (i, rnd.nextInt(50).toDouble, rnd.nextInt(60)))

    val expected = {
      var best = Long.MinValue
      val keep = Seq.newBuilder[Long]
      pts.sortBy(p => (p._2, p._1)).foreach { case (id, _, size) =>
        if (size > best) { keep += id; best = size }
        else best = math.max(best, size)
      }
      keep.result().sorted
    }

    val df = pts.toDF("id", "price", "size")
    Seq(1, 3, 32).foreach { np =>
      val got = Skyline.sweep2d(df, col("price"), col("size"), col("id"), np)
        .select("id").as[Long].collect().sorted.toSeq
      assert(got == expected, s"partitions=$np")
    }
  }

  test("sweep2d: empty input and single-row input") {
    val empty = Seq.empty[(Long, Double, Int)].toDF("id", "price", "size")
    assert(Skyline.sweep2d(empty, col("price"), col("size"), col("id"), 4).count() == 0)
    val one = Seq((7L, 3.0, 5)).toDF("id", "price", "size")
    assert(Skyline.sweep2d(one, col("price"), col("size"), col("id"), 4)
      .select("id").as[Long].collect().toSeq == Seq(7L))
  }
}
