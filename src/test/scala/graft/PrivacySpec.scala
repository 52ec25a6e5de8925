package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Privacy, Splits, TextAnalysis}

class PrivacySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def redactOne(s: String): String =
    Seq(s).toDF("t").select(Privacy.redactPii($"t")).head().getString(0)

  test("redacts e-mails, IPv4 addresses, and phone numbers") {
    assert(redactOne("mail a.b+c@ex-ample.org now") == "mail <EMAIL> now")
    assert(redactOne("from 192.168.0.1 port 80") == "from <IP> port 80")
    assert(redactOne("call 555-010-1234 today") == "call <PHONE> today")
    assert(redactOne("call +1 555 010 1234.") == "call <PHONE>.")
    assert(redactOne("(555) 010-1234") == "<PHONE>")
  }

  test("does not redact ISO dates or plain numbers") {
    assert(redactOne("shipped 1995-01-01 qty 12345678") ==
      "shipped 1995-01-01 qty 12345678")
    assert(redactOne("pi is 3.14159") == "pi is 3.14159")
  }

  test("application order: IP inside surrounding digits is not a phone") {
    assert(redactOne("host 10.0.5.7 up") == "host <IP> up")
  }

  test("redaction is idempotent") {
    val once = redactOne("a@b.co 1.2.3.4 555-010-1234")
    assert(redactOne(once) == once)
  }

  test("split assignment is deterministic and matches its bucket thresholds") {
    val df = spark.range(0, 10000).toDF("id")
      .select($"id", Splits.hashBucket($"id").as("b"),
        Splits.assignSplit($"id").as("split"))
    val rows = df.collect()
    rows.foreach { r =>
      val (b, s) = (r.getString(1), r.getString(2))
      // thresholds are hex renderings of 13 and 13+26=39 buckets
      val expected = if (b < "0d") "test" else if (b < "27") "val" else "train"
      assert(s == expected, s"id=${r.getLong(0)} bucket=$b")
    }
    // same ids rehashed under a different layout get identical splits
    val again = spark.range(0, 10000).toDF("id").repartition(13)
      .select($"id", Splits.assignSplit($"id").as("split"))
    assert(df.select("id", "split").exceptAll(again).isEmpty)
  }

  test("inverseKeep: singletons always survive; 1/n rate lands in band; deterministic") {
    val keys = spark.range(2000).toDF("k")
    // n = 1: u·1 < 2^52 is true for every 52-bit coordinate — rare
    // (unclustered) docs are never lost
    assert(keys.filter(Splits.inverseKeep($"k", lit(1L))).count() == 2000L)
    val kept4 = keys.filter(Splits.inverseKeep($"k", lit(4L))).count()
    assert(kept4 > 400 && kept4 < 600, s"~1/4 of 2000 expected, got $kept4")
    val again = keys.filter(Splits.inverseKeep($"k", lit(4L))).count()
    assert(again == kept4)
  }

  test("split fractions land near 13/26/217 of 256") {
    val counts = spark.range(0, 20000).toDF("id")
      .select(Splits.assignSplit($"id").as("split"))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = 20000.0
    assert(math.abs(counts("test") / n - 13.0 / 256) < 0.01)
    assert(math.abs(counts("val") / n - 26.0 / 256) < 0.01)
    assert(math.abs(counts("train") / n - 217.0 / 256) < 0.02)
  }

  test("sampleKPerGroup: exactly k per big group, whole group when smaller, layout-independent") {
    val df = spark.range(0, 5000).toDF("id")
      .withColumn("g", when($"id" < 4990, lit("big")).otherwise(lit("small")))
    val out = Splits.sampleKPerGroup(df, $"g", $"id", k = 25)
      .select("g", "id").as[(String, Long)].collect()
    val byG = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byG("big").size == 25)
    assert(byG("small").size == 10) // group smaller than k → keep all
    // equals the window-reference formulation (k smallest coordinates)
    val ref = df.withColumn("h", Splits.sampleCoord($"id"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"g").orderBy($"h", $"id")))
      .filter($"rn" <= 25).select("g", "id").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byG == ref)
    // identical sample under a different physical layout
    val again = Splits.sampleKPerGroup(df.repartition(7), $"g", $"id", k = 25)
      .select("g", "id").as[(String, Long)].collect().toSet
    assert(again == out.toSet)
  }

  test("weightedKeep: rate scales with weight, saturates at 1, layout-independent") {
    // three weight tiers: w=100 → p=0.1, w=500 → p=0.5, w=2000 → p=1 (capped)
    val df = spark.range(0, 30000).toDF("id")
      .withColumn("w", when($"id" % 3 === 0, 100L).when($"id" % 3 === 1, 500L)
        .otherwise(2000L))
    val kept = df.filter(Splits.weightedKeep($"id", $"w", 0.001))
    val byW = kept.groupBy("w").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(math.abs(byW(100L) / 10000.0 - 0.1) < 0.02)
    assert(math.abs(byW(500L) / 10000.0 - 0.5) < 0.02)
    assert(byW(2000L) == 10000L) // p = 1: every row kept, not approximately
    // pure function of id: identical sample under another physical layout
    val again = df.repartition(13).filter(Splits.weightedKeep($"id", $"w", 0.001))
      .select("id").as[Long].collect().toSet
    assert(again == kept.select("id").as[Long].collect().toSet)
  }

  test("mixToProportions: binding group keeps all, others downsample to ratio, untargeted dropped") {
    // groups: a=1000, b=4000, c=2000, x=500 (untargeted). targets a:0.5 b:0.25
    // c:0.25 → T = min(1000/0.5, 4000/0.25, 2000/0.25) = 2000 → expected
    // keeps: a=1000 (all), b=500, c=500
    val df = spark.range(0, 7500).toDF("id")
      .withColumn("g", when($"id" < 1000, "a").when($"id" < 5000, "b")
        .when($"id" < 7000, "c").otherwise("x"))
    val out = Splits.mixToProportions(df, $"g", $"id",
      Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25))
    val byG = out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byG.contains("x"))
    assert(byG("a") == 1000L) // binding group: every row, not approximately
    assert(math.abs(byG("b") - 500.0) < 80 && math.abs(byG("c") - 500.0) < 80)
    // deterministic under another layout
    val again = Splits.mixToProportions(df.repartition(11), $"g", $"id",
      Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25))
      .select("id").as[Long].collect().toSet
    assert(again == out.select("id").as[Long].collect().toSet)
  }

  test("temperatureFlatten: smallest group intact, big group at ~sqrt rate, layout-independent") {
    val df = (1 to 400).map(i => (i.toLong, if (i <= 320) "big" else "small"))
      .toDF("id", "g")
    val kept = Splits.temperatureFlatten(df, col("g"), col("id"))
    val counts = kept.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(counts("small") == 80) // the n_min group keeps every row
    // big keeps sqrt(80/320) = 1/2 of 320 in expectation (binomial noise)
    assert(counts("big") > 120 && counts("big") < 200)
    val kept7 = Splits.temperatureFlatten(df.repartition(7), col("g"), col("id"))
    assert(kept7.orderBy("id").collect().toSeq == kept.orderBy("id").collect().toSeq)
  }

  test("novelty: shared shingles lower the score, unique docs score 1") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),     // shares "alpha beta gamma" + "beta gamma delta"? no — doc 2 shares only the first
      (2L, "alpha beta gamma epsilon"),   // shares shingle "alpha beta gamma" with doc 1
      (3L, "one two three four five")     // fully unique
    ).toDF("doc_id", "text")
    val out = TextAnalysis.novelty(docs, $"doc_id", $"text", n = 3)
      .orderBy("doc_id").collect()
    // doc 1: shingles {abg, bgd}; abg shared with doc 2 → 1/2 unique
    assert(out(0).getLong(1) == 2 && out(0).getLong(2) == 1)
    assert(out(0).getDouble(3) == 0.5)
    // doc 3: all 3 shingles unique
    assert(out(2).getLong(1) == 3 && out(2).getDouble(3) == 1.0)
  }

  test("HLL approx distinct stays within 5% of exact on 10k keys") {
    val df = spark.range(0, 30000).toDF("id")
      .select((pmod($"id", lit(10000))).as("u"))
    val r = df.agg(
      approx_count_distinct("u").as("a"),
      countDistinct($"u").as("e")).head()
    val (a, e) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(a - e) / e < 0.05)
  }

  test("kAnonymityLevels: finest k-reaching level wins; suppression when even coarse fails") {
    // coarse A: fine 1 has 3 rows (level 2 at k=3), fine 2 has 1 row but
    // A totals 4 ≥ 3 → level 1; coarse B: single row, total 1 < 3 → level 0
    val rows = Seq(
      ("A", 1), ("A", 1), ("A", 1), ("A", 2), ("B", 9)).toDF("seg", "nat")
    val got = Privacy.kAnonymityLevels(rows, $"seg", $"nat", k = 3)
      .orderBy("qi_coarse", "qi_fine")
      .as[(String, Int, Long, Int)].collect().toSeq
    assert(got == Seq(("A", 1, 3L, 2), ("A", 2, 1L, 1), ("B", 9, 1L, 0)))
  }

  test("lDiversity: homogeneous class flagged, diverse class passes, sizes exact") {
    // class (A,1): 3 rows but all sensitive value 'x' → d=1, not diverse;
    // class (A,2): 2 rows, values x,y → d=2 ≥ 2 diverse;
    // class (B,1): 1 row → d=1, not diverse
    val rows = Seq(
      ("A", 1, "x"), ("A", 1, "x"), ("A", 1, "x"),
      ("A", 2, "x"), ("A", 2, "y"), ("B", 1, "z")).toDF("seg", "nat", "sv")
    val got = Privacy.lDiversity(rows, Seq("seg", "nat"), $"sv", l = 2)
      .orderBy("seg", "nat")
      .as[(String, Int, Long, Long, Int)].collect().toSeq
    assert(got == Seq(("A", 1, 3L, 1L, 0), ("A", 2, 2L, 2L, 1), ("B", 1, 1L, 1L, 0)))
  }

  test("tCloseness: hand-computed ordered EMD, threshold on both sides") {
    // global: value counts 1→2, 2→2, 3→2 (N=6, k=3)
    // class A: (2,1,0) → diffs c·N−g·n_g = (6,0,−6), cums (6,6,0), Σ|cum|=12
    //   EMD = 12 / (3·6·2) = 1/3; class B mirrors it
    val rows = Seq(
      ("A", 1), ("A", 1), ("A", 2),
      ("B", 2), ("B", 3), ("B", 3)).toDF("grp", "sv")
    val loose = Privacy.tCloseness(rows, Seq("grp"), $"sv", t = 0.4)
      .orderBy("grp").as[(String, Long, Long, Double, Int)].collect().toSeq
    assert(loose == Seq(
      ("A", 3L, 12L, 12.0 / 36.0, 1), ("B", 3L, 12L, 12.0 / 36.0, 1)))
    val strict = Privacy.tCloseness(rows, Seq("grp"), $"sv", t = 0.2)
      .orderBy("grp").as[(String, Long, Long, Double, Int)].collect().toSeq
    assert(strict.map(_._5) == Seq(0, 0))
    // a class whose distribution IS the global one has EMD exactly 0
    val uniform = Seq(("A", 1), ("A", 2), ("B", 1), ("B", 2)).toDF("grp", "sv")
    val zero = Privacy.tCloseness(uniform, Seq("grp"), $"sv", t = 0.0)
      .orderBy("grp").as[(String, Long, Long, Double, Int)].collect().toSeq
    assert(zero.forall(r => r._3 == 0L && r._4 == 0.0 && r._5 == 1))
  }

  test("geometric mechanism: thresholds well-formed; noise deterministic, bounded, near-symmetric") {
    val th = Privacy.geometricThresholds(16)
    assert(th.size == 33 && th.map(_._2) == (-16 to 16))
    assert(th.map(_._1) == th.map(_._1).sorted, "cumulative must ascend")
    assert(math.abs(th.last._1 - 1.0) < 1e-12, "CDF must end at 1")
    // P(0) of the alpha=1/2 geometric is ~1/3: the two central thresholds
    // bracket a ~1/3-mass step
    val p0 = th.find(_._2 == 0).get._1 - th.find(_._2 == -1).get._1
    assert(math.abs(p0 - 1.0 / 3.0) < 1e-3)
    // sampled over many seeds: deterministic across evaluations, bounded
    // by the truncation, mean near 0 and ~1/3 of draws exactly 0
    val seeds = (0 until 4000).map(i => s"seed-$i").toDF("s")
    def draw() = seeds.select(Privacy.geometricNoise($"s").as("k"))
      .as[Int].collect().toSeq
    val a = draw()
    assert(a == draw(), "noise must be a pure function of the seed")
    assert(a.forall(k => k >= -16 && k <= 16))
    assert(math.abs(a.sum.toDouble / a.size) < 0.1, s"mean ${a.sum.toDouble / a.size}")
    val z = a.count(_ == 0).toDouble / a.size
    assert(z > 0.30 && z < 0.37, s"P(0) sampled at $z, expected ~1/3")
  }
}
