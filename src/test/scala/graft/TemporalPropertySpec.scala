package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOfJoin, RangeJoin}

/** Property-style randomized checks: the distributed temporal operators must
  * agree with straightforward in-memory reference computations on arbitrary
  * generated data (duplicate timestamps, empty keys, matchless probes, bin
  * boundary values included by construction).
  */
class TemporalPropertySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("property: asofBackward equals in-memory reference on random data") {
    Seq(7, 23, 91).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      def k() = s"k${rnd.nextInt(6)}"
      val right = (0 until 120).map(i =>
        (k(), new Timestamp(rnd.nextInt(1000) * 1000L), i.toDouble))
      val left = (0 until 150).map(i =>
        (k(), i.toLong, new Timestamp(rnd.nextInt(1000) * 1000L)))
      val rows = AsOfJoin.asofBackward(
          left.toDF("k", "lid", "lts"), right.toDF("k", "rts", "payload"),
          "k", "lts", "rts", rightPayload = Seq("payload"))
        .select("lid", "rts").as[(Long, Timestamp)].collect()
      // exactly ONE row per matched left row — toMap alone would mask
      // duplicate/conflicting emissions
      assert(rows.length == rows.map(_._1).distinct.length, s"seed=$seed dup rows")
      val out = rows.toMap

      // reference: per left row, max right ts <= left ts for same key
      val byKey = right.groupBy(_._1)
      val expected = left.flatMap { case (key, lid, lts) =>
        byKey.getOrElse(key, Nil)
          .filter(!_._2.after(lts))
          .sortBy(_._2.getTime)
          .lastOption
          .map(r => lid -> r._2)
      }.toMap
      assert(out == expected, s"seed=$seed")
    }
  }

  test("property: pointInRange equals in-memory reference across bin widths") {
    Seq(13, 57).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val pts = (0 until 200).map(i => (i.toLong, rnd.nextInt(500).toLong - 250L))
      val ivs = (0 until 60).map { i =>
        val lo = rnd.nextInt(500).toLong - 250L
        (i.toLong, lo, lo + rnd.nextInt(40))
      }
      val expected = (for {
        (pid, p) <- pts
        (iid, lo, hi) <- ivs
        if p >= lo && p <= hi
      } yield (pid, iid)).sorted
      Seq(1L, 7L, 64L).foreach { bw =>
        val out = RangeJoin.pointInRange(
            pts.toDF("pid", "pt"), ivs.toDF("iid", "lo", "hi"),
            "pt", "lo", "hi", bw)
          .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
        assert(out == expected, s"seed=$seed binWidth=$bw")
      }
    }
  }
}
