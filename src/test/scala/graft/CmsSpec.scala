package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Cms

/** Count-min sketch laws on inline fixtures: the always-overestimate
  * guarantee, exact counts when no bucket collides, merge ≡ whole-corpus
  * build (cell-table equality, not just estimate equality), absent-key
  * zero, and layout independence (the sketch is a pure function of the
  * multiset, not the partitioning).
  */
class CmsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val corpus =
    (Seq.fill(7)(1L) ++ Seq.fill(3)(2L) ++ Seq(3L)).toDF("k")

  test("probe always overestimates, exactly counts without collisions, 0 for absent keys") {
    val cells = Cms.build(corpus, col("k"), depth = 4, width = 64)
    val est = Cms.probe(cells, Seq(1L, 2L, 3L, 99L).toDF("k"), col("k"), 4, 64)
      .as[(Long, Long)].collect().toMap
    // 3 keys in a 4×64 sketch: collisions would need two of the three keys
    // to share a bucket in EVERY row — astronomically unlikely and, with
    // these fixed md5 hashes, deterministically not the case
    assert(est == Map(1L -> 7L, 2L -> 3L, 3L -> 1L, 99L -> 0L))
  }

  test("overestimate law under forced collisions (width 2)") {
    val cells = Cms.build(corpus, col("k"), depth = 2, width = 2)
    val est = Cms.probe(cells, Seq(1L, 2L, 3L).toDF("k"), col("k"), 2, 2)
      .as[(Long, Long)].collect().toMap
    assert(est(1L) >= 7L && est(2L) >= 3L && est(3L) >= 1L)
    assert(est.values.forall(_ <= 11L)) // never above the corpus size
  }

  test("merge of disjoint halves equals the whole-corpus build cell-for-cell") {
    val whole = Cms.build(corpus, col("k"), 4, 64)
      .as[(Int, Long, Long)].collect().toSet
    val h1 = Cms.build(corpus.filter(col("k") <= 1), col("k"), 4, 64)
    val h2 = Cms.build(corpus.filter(col("k") > 1), col("k"), 4, 64)
    val merged = Cms.merge(h1, h2)
      .select(col("j"), col("b"), col("cnt").cast("long"))
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == whole)
  }

  test("sketch is partition-layout independent") {
    val a = Cms.build(corpus.repartition(1), col("k"), 4, 64)
      .as[(Int, Long, Long)].collect().toSet
    val b = Cms.build(corpus.repartition(13), col("k"), 4, 64)
      .as[(Int, Long, Long)].collect().toSet
    assert(a == b)
  }
}
