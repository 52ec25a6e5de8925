package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.{Entity, GraphStore, Relation}

/** End-to-end user stories over the whole engine surface. */
class IntegrationSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("concurrent writers serialize through the lock; no lost updates") {
    val dir = Files.createTempDirectory("graft-store-").toString
    val st = new GraphStore(spark, dir)
    st.initialize()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 4).map { t =>
      new Thread(() => {
        try st.createEntities(Seq(Entity(s"writer$t", "thread", Seq(s"obs $t"))))
        catch { case e: Throwable => errors.add(e) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errors.isEmpty, s"writer failed: ${errors.peek()}")
    // all four writes survived (no lost update from racing rewrites)
    assert(st.entities.count() == 4)
    (1 to 4).foreach(t => assert(st.getEntity(s"writer$t").observations == Seq(s"obs $t")))
  }

  test("user story: bulk-ingest documents, search, traverse, delete, re-search") {
    val dir = Files.createTempDirectory("graft-store-").toString
    val st = new GraphStore(spark, dir)
    st.initialize()

    // 1. bulk-ingest the documents table as entities (the 100 TB path)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(200)
    st.upsertEntitiesDf(docs.select(
      format_string("doc#%04d", col("doc_id")).as("name"),
      col("lang").as("entity_type"),
      array(col("text")).as("observations")))
    assert(st.entities.count() == 200)

    // 2. relate docs to their language entities
    st.upsertEntitiesDf(Seq(("lang#en", "language", Seq("english")),
      ("lang#de", "language", Seq("german"))).toDF("name", "entity_type", "observations"))
    val deDocs = st.entities.filter($"entity_type" === "de")
      .select("name").as[String].collect().take(5)
    st.createRelations(deDocs.toSeq.map(d => Relation(d, "lang#de", "written_in")))

    // 3. search by content keyword → ranked hits with hydrated observations
    val (hits, _) = st.searchNodes("spark", limit = 10)
    assert(hits.nonEmpty && hits.forall(_.observations.nonEmpty))

    // 4. graph read: recent entities + their edges
    val (recent, _) = st.readGraph()
    assert(recent.size == 10)

    // 5. type-search finds the language entity and its edges
    val (langHits, langEdges) = st.searchNodes("language", limit = 50)
    assert(langHits.exists(_.name == "lang#de"))
    assert(langEdges.count(_.to == "lang#de") == deDocs.length)

    // 6. cascade delete the language hub; edges disappear
    st.deleteEntity("lang#de")
    val (afterHits, afterEdges) = st.searchNodes("language", limit = 50)
    assert(!afterHits.exists(_.name == "lang#de"))
    assert(!afterEdges.exists(e => e.to == "lang#de" || e.from == "lang#de"))

    // 7. housekeeping: compact + vacuum keep the store readable
    st.compact("entities")
    st.vacuum()
    assert(st.entities.count() == 201) // 200 docs + lang#en
  }
}
