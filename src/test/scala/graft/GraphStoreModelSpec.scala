package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

import graft.store.{Entity, GraphStore, Relation}

/** Model-based test of the bucketed copy-on-write store: a deterministic
  * pseudo-random sequence of API calls (upserts, cascade deletes, relation
  * batches, targeted deletes, compactions, vacuums, re-opens) runs against
  * BOTH the store and a trivial in-memory model; after every mutation the
  * store's three tables must equal the model exactly, and every recorded
  * historical store version must keep matching its model snapshot until
  * vacuumed. This is the harness that catches what example-based specs
  * can't: a wrong touched-bucket set silently dropping rows of an
  * UNtouched bucket, a snapshot descriptor carrying a stale version, or a
  * vacuum deleting a still-referenced bucket — any of these breaks
  * equality within a few ops.
  */
class GraphStoreModelSpec extends AnyFunSuite with SparkTestBase {

  private case class Model(
      entities: Map[String, String], // name -> type
      obs: Map[String, Set[String]], // name -> observations
      rels: Vector[(String, String, String)]) // (source, target, type), dup-preserving

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def storeState(st: GraphStore): Model = {
    val ents = st.entities.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val obs = st.observations.collect()
      .map(r => (r.getString(1), r.getString(2)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val rels = st.relations.collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3)))
      .sorted.toVector
    Model(ents, obs, rels)
  }

  private def versionState(st: GraphStore, m: Long): Model = {
    val ents = st.readTableAt("entities", m).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val obs = st.readTableAt("observations", m).collect()
      .map(r => (r.getString(1), r.getString(2)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val rels = st.readTableAt("relations", m).collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3)))
      .sorted.toVector
    Model(ents, obs, rels)
  }

  test("40 random ops: store ≡ in-memory model after every op, history consistent until vacuumed") {
    val dir = Files.createTempDirectory("graft-store-model-").toString
    var st = new GraphStore(spark, dir, numBuckets = 8, filesPerBucket = 2) // small B → collisions; split path exercised
    st.initialize()
    var model = Model(Map.empty, Map.empty, Vector.empty)
    // recorded (storeVersion, modelSnapshot) pairs for time-travel checks
    var history = Vector(st.storeVersions.last -> model)
    val names = (0 until 12).map(i => s"node#$i") // small pool → heavy reuse

    for (step <- 1 to 40) {
      val r = mix(step.toLong)
      def pick(i: Int, n: Int): Int = math.floorMod(mix(r + i).toInt, n)
      val op = pick(0, 11)
      op match {
        case 0 | 1 | 2 | 3 => // upsert batch of 1-3 entities
          val batch = (0 until 1 + pick(1, 3)).map { j =>
            val n = names(pick(10 + j, names.size))
            Entity(n, s"t${pick(20 + j, 4)}",
              (0 to pick(30 + j, 2)).map(k => s"obs-$step-$j-$k"))
          }.groupBy(_.name).map(_._2.head).toSeq // batch names must be unique
          st.createEntities(batch)
          batch.foreach { e =>
            model = model.copy(
              entities = model.entities + (e.name -> e.entityType),
              obs = model.obs + (e.name -> e.observations.toSet))
          }
        case 4 | 5 => // relation batch among EXISTING names (1-3 edges, dups allowed)
          if (model.entities.nonEmpty) {
            val keys = model.entities.keys.toVector.sorted
            val batch = (0 until 1 + pick(1, 3)).map { j =>
              Relation(keys(pick(40 + j, keys.size)),
                keys(pick(50 + j, keys.size)), s"r${pick(60 + j, 3)}")
            }
            st.createRelations(batch)
            model = model.copy(rels =
              (model.rels ++ batch.map(b => (b.from, b.to, b.relationType))).sorted)
          }
        case 6 => // cascade delete a random existing entity
          if (model.entities.nonEmpty) {
            val keys = model.entities.keys.toVector.sorted
            val victim = keys(pick(70, keys.size))
            st.deleteEntity(victim)
            model = Model(
              model.entities - victim,
              model.obs - victim,
              model.rels.filterNot(e => e._1 == victim || e._2 == victim))
          }
        case 7 => // targeted relation delete (when one exists)
          if (model.rels.nonEmpty) {
            val (f, t, tp) = model.rels(pick(80, model.rels.size))
            st.deleteRelation(f, t, tp)
            // the store (like the reference's DELETE) removes ALL matches
            model = model.copy(rels = model.rels.filterNot(_ == ((f, t, tp))))
          }
        case 8 => // maintenance: compact a table, or vacuum (drops history)
          if (pick(90, 2) == 0) {
            st.compact(Seq("entities", "observations", "relations")(pick(91, 3)))
          } else {
            st.vacuum(keepVersions = 1)
            history = Vector.empty // older versions intentionally gone
          }
        case 9 => // re-open: a fresh instance must resolve identical state
          st = new GraphStore(spark, dir, numBuckets = 8, filesPerBucket = 2)
        case 10 => // progressive re-bucketing mid-script: split one bucket,
          // double a whole table's generation, or merge undersized pairs
          // back down — reads must stay identical to the model through
          // mixed-generation snapshots in BOTH directions
          val t = Seq("entities", "observations", "relations")(pick(96, 3))
          pick(97, 5) match {
            case 0 => st.advanceGeneration(t)
            case 1 | 2 =>
              val live = st.liveBuckets(t)
              if (live.nonEmpty)
                st.splitBucket(t, live(pick(98, live.size)))
            case _ =>
              st.mergeUndersized(t, Long.MaxValue / 2, maxRounds = 1)
          }
      }
      val got = storeState(st)
      assert(got.entities == model.entities,
        s"step $step op $op: entities diverged\ngot   ${got.entities}\nmodel ${model.entities}")
      assert(got.obs == model.obs,
        s"step $step op $op: observations diverged\ngot   ${got.obs}\nmodel ${model.obs}")
      assert(got.rels == model.rels,
        s"step $step op $op: relations diverged\ngot   ${got.rels}\nmodel ${model.rels}")
      // record/check history: the latest version plus one random older one
      val cur = st.storeVersions.last
      if (history.isEmpty || history.last._1 != cur) history :+= cur -> model
      if (history.size > 1) {
        val (hv, hm) = history(pick(95, history.size - 1)) // a strictly older one
        if (st.storeVersions.contains(hv)) {
          val at = versionState(st, hv)
          assert(at == hm,
            s"step $step: historical store version m$hv no longer matches its model snapshot")
        }
      }
    }
    // end-state sanity: at least some mutations of each kind actually ran
    assert(model.entities.nonEmpty, "degenerate run: no entities at the end")
  }
}
