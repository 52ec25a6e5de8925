package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew
import graft.store.{Entity, GraphStore}

class SkewSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // one hot key with 10k values, a handful of cold keys
  private lazy val skewed = ((1 to 10000).map(i => ("hot", s"v$i")) ++
    (1 to 5).map(i => (s"cold$i", s"w$i"))).toDF("k", "v")

  test("saltedCollectSet equals the unsalted aggregation") {
    val salted = Skew.saltedCollectSet(skewed, $"k", $"v", salts = 16)
      .orderBy("key").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1))
    val plain = skewed.groupBy($"k".as("key"))
      .agg(array_sort(collect_set($"v")).as("values"))
      .orderBy("key").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1))
    assert(salted.toSeq == plain.toSeq)
  }

  test("saltedJoin equals the plain join, multiplicity preserved") {
    val dim = Seq(("hot", 1), ("cold1", 2), ("cold1", 3)).toDF("dk", "attr")
    val salted = Skew.saltedJoin(skewed, dim, $"k", $"dk", salts = 8)
      .select("k", "v", "attr")
    val plain = skewed.join(dim, $"k" === $"dk").select("k", "v", "attr")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("vacuum keeps the current version readable and drops old ones") {
    val dir = Files.createTempDirectory("graft-store-").toString
    val st = new GraphStore(spark, dir)
    st.initialize()
    st.createEntities(Seq(Entity("A", "t", Seq("one"))))
    st.createEntities(Seq(Entity("B", "t", Seq("two"))))
    val before = new java.io.File(s"$dir/entities")
      .listFiles().count(_.getName.matches("v\\d+"))
    assert(before >= 3)
    st.vacuum(keepVersions = 1)
    val after = new java.io.File(s"$dir/entities")
      .listFiles().count(_.getName.matches("v\\d+"))
    assert(after == 1)
    assert(st.entities.count() == 2) // current version intact
    assert(st.getEntity("B").observations == Seq("two"))
  }
}
