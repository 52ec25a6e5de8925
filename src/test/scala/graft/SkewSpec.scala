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

  test("SQL views expose the graph to spark.sql") {
    val dir = Files.createTempDirectory("graft-store-").toString
    val st = new GraphStore(spark, dir)
    st.initialize()
    st.createEntities(Seq(
      Entity("Alice", "person", Seq("engineer")),
      Entity("Acme", "company", Seq("startup"))))
    st.createOrReplaceViews()
    val out = spark.sql(
      """SELECT e.name, o.content FROM graft_entities e
         JOIN graft_observations o ON e.name = o.entity_name
         WHERE e.entity_type = 'person' ORDER BY e.name""").collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("Alice", "engineer")))
  }

  test("multimodal frame sampling emits stride-spaced indices for video rows") {
    import graft.pipeline.{Multimodal, MediaRow}
    val docs = Seq((2L, "a video doc with frames"), (0L, "an image doc"))
      .toDF("doc_id", "text")
    val meta = Multimodal.decodeMeta(
      Multimodal.withMediaColumn(docs, "doc_id", "text").as[MediaRow])
    val out = Multimodal.sampleFrameIndices(meta, stride = 10).collect()
    assert(out.length == 1) // only the video row (doc_id 2)
    val idx = out.head.getSeq[Int](2)
    assert(idx.head == 0 && idx.forall(_ % 10 == 0))
  }

  test("crashed stage: orphan version dirs don't affect reads, vacuum removes them, next commit works") {
    val dir = Files.createTempDirectory("graft-store-").toString
    val st = new GraphStore(spark, dir)
    st.initialize()
    st.createEntities(Seq(Entity("A", "t", Seq("one"))))
    // simulate a commit that wrote its version dir but died before the
    // manifest flip: an orphan v-dir newer than the referenced one
    val entDir = new java.io.File(s"$dir/entities")
    val maxV = entDir.listFiles().filter(_.getName.matches("v\\d+"))
      .map(_.getName.drop(1).toLong).max
    val orphan = new java.io.File(entDir, s"v${maxV + 1}")
    orphan.mkdirs()
    new java.io.File(orphan, "part-orphan.parquet").createNewFile()
    // reads resolve the manifest, not directory listings
    assert(st.getEntity("A").observations == Seq("one"))
    // vacuum under the lock removes the orphan, keeps the live version
    st.vacuum(keepVersions = 1)
    assert(!orphan.exists())
    assert(st.getEntity("A").observations == Seq("one"))
    // and the next commit proceeds normally
    st.createEntities(Seq(Entity("B", "t", Seq("two"))))
    assert(st.entities.count() == 2)
  }

  test("vacuum keeps the current version readable and drops old ones") {
    val dir = Files.createTempDirectory("graft-store-").toString
    val st = new GraphStore(spark, dir)
    st.initialize()
    st.createEntities(Seq(Entity("A", "t", Seq("one"))))
    st.createEntities(Seq(Entity("B", "t", Seq("two"))))
    st.compact("entities")
    assert(st.entities.count() == 2) // compaction preserves content
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
