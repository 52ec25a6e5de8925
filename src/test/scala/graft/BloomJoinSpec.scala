package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BloomJoin

class BloomJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // 10k fact rows over 1k keys; dim keeps keys 0..49 → 95% of the fact
  // should die at the prefilter
  private lazy val fact = (1 to 10000).map(i => (i.toLong % 1000, i.toLong)).toDF("fk", "val")
  private lazy val dim = (0L until 50L).map(k => (k, s"d$k")).toDF("dk", "attr")

  test("reducedJoin equals the plain join, multiplicity preserved") {
    val reduced = BloomJoin.reducedJoin(fact, $"fk", dim, $"dk",
      expectedItems = 50, numBits = 4096).select("fk", "val", "attr")
    val plain = fact.join(dim, $"fk" === $"dk").select("fk", "val", "attr")
    assert(reduced.count() == plain.count())
    assert(reduced.exceptAll(plain).isEmpty && plain.exceptAll(reduced).isEmpty)
  }

  test("prefilter has no false negatives and drops most non-matching rows") {
    val bloom = BloomJoin.buildBloom(dim, $"dk", expectedItems = 50, numBits = 4096)
    val kept = fact.filter(BloomJoin.mightContain(bloom, $"fk"))
    // every true match survives
    assert(kept.join(dim, $"fk" === $"dk").count() ==
      fact.join(dim, $"fk" === $"dk").count())
    // 500 matching rows; false positives must not balloon the kept set
    // (4096 bits / 50 keys → fp rate well under 5%)
    val n = kept.count()
    assert(n >= 500 && n < 1000, s"prefilter kept $n of 10000 rows")
  }

  test("empty build side matches nothing") {
    val bloom = BloomJoin.buildBloom(dim.filter($"dk" < 0), $"dk", 50, 4096)
    assert(bloom == null)
    assert(fact.filter(BloomJoin.mightContain(bloom, $"fk")).isEmpty)
    assert(BloomJoin.reducedJoin(fact, $"fk", dim.filter($"dk" < 0), $"dk").isEmpty)
  }
}
