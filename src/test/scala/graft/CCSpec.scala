package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Dedup

/** Complexity + durability evidence for connectedComponents, beyond the
  * semantic coverage in PipelineSpec:
  *
  *  - the pointer-jumping (path-halving) claim: a path graph is the
  *    worst-case diameter for min-label propagation. Plain propagation needs
  *    `diameter` rounds — for the 4096-node path below that is 4095, far
  *    beyond maxIter=50, so convergence inside the bound is only possible if
  *    the jump actually collapses chains; the round count is additionally
  *    pinned to the O(log d) envelope.
  *  - the reliable-checkpoint mode (`reliableCheckpoint = true`) for cluster
  *    runs, where localCheckpoint blocks die with their executor.
  */
class CCSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("pointer jumping: 4096-node path converges in O(log d) rounds, not O(d)") {
    val n = 4096
    val pairs = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val (labels, rounds) = Dedup.ccWithRounds(pairs, maxIter = 50)
    val out = labels.as[(Long, Long)].collect()
    assert(out.length == n)
    assert(out.forall(_._2 == 0L), "every node must resolve to rep 0")
    // log2(4096) = 12; allow 2× slack for the halving (not full doubling)
    // schedule. Plain propagation would need 4095 rounds.
    assert(rounds <= 24, s"expected O(log d) rounds, got $rounds")
  }

  test("property: components equal an in-memory union-find on random graphs") {
    Seq(3, 17, 41).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 80
      val pairs = (0 until 120).map { _ =>
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      // reference: plain union-find with path compression
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
        .map(v => v -> find(v.toInt).toLong).toMap
      val got = Dedup.connectedComponents(pairs.toDF("a_id", "b_id"))
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"seed=$seed")
    }
  }

  test("reliable-checkpoint mode produces the same components") {
    val dir = java.nio.file.Files.createTempDirectory("cc_ckpt").toFile
    spark.sparkContext.setCheckpointDir(dir.getAbsolutePath)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val local = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toSet
    val durable = Dedup.connectedComponents(pairs, reliableCheckpoint = true)
      .as[(Long, Long)].collect().toSet
    assert(durable == local)
    assert(durable == Set((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L)))
  }
}
