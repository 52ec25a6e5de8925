package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Rollup
import graft.store.{Entity, GraphStore}

/** ONE race matrix, run against BOTH commit disciplines the engine ships:
  * [[graft.store.GraphStore]]'s bucket-granular manifest CAS and
  * [[graft.store.VersionedDir]]'s whole-tree version CAS. They stay
  * separate implementations for a documented reason (the store stages
  * O(touched buckets) per mutation, a whole-tree version would stage the
  * bucket forest — see the cross-referenced scaladocs on both), but they
  * promise the SAME contract:
  *
  *  - every mutation is read-stage-commit with an atomic put-if-absent
  *    claim; of two racing writers exactly one wins and the loser reruns
  *    its whole body against the winner's state — no lost update;
  *  - a crash leaves the committed state untouched and at worst an
  *    orphaned stage, which is invisible to readers and never blocks the
  *    next commit.
  *
  * Each scenario below runs once per protocol through a tiny adapter, so
  * a guarantee tightened (or broken) in one implementation cannot
  * silently drift from the other — the round-12 repair-window fix touched
  * only the store's copy, which is exactly the failure mode this harness
  * exists to catch.
  */
class CommitProtocolContractSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** The least common denominator both protocols expose: tagged
    * read-modify-write mutations from independent writer handles over one
    * shared root, a committed-state read, and a crash-orphan planter.
    */
  private trait Protocol {
    def name: String
    /** Fresh committed state under a new temp root; returns the root. */
    def init(): String
    /** One mutation adding `tag`, through writer handle `handle` (0/1 —
      * two handles simulate two drivers on a shared filesystem).
      */
    def mutate(handle: Int, tag: Int): Unit
    /** Tags visible in the committed state. */
    def readTags(): Set[Int]
    /** Plant an unclaimed stage dir (what a crashed writer leaves). */
    def plantOrphan(): Unit
  }

  private final class GraphStoreProtocol extends Protocol {
    val name = "GraphStore manifest CAS"
    private var root: String = _
    private var stores: Seq[GraphStore] = Seq.empty
    def init(): String = {
      root = Files.createTempDirectory("proto-gs-").toString
      // advisoryLock = false: nothing machine-local serializes the
      // handles, the manifest CAS alone must prevent lost updates
      stores = Seq.tabulate(2)(_ => new GraphStore(spark, root, advisoryLock = false))
      stores.head.initialize()
      root
    }
    def mutate(handle: Int, tag: Int): Unit =
      stores(handle).createEntities(Seq(Entity(s"e$tag", "t", Seq(s"obs $tag"))))
    def readTags(): Set[Int] =
      stores.head.entities.select("name").collect()
        .map(_.getString(0).stripPrefix("e").toInt).toSet
    def plantOrphan(): Unit = {
      val d = new java.io.File(root, s"entities/_stage_${System.nanoTime()}")
      java.nio.file.Files.createDirectories(d.toPath)
      java.nio.file.Files.write(new java.io.File(d, "junk.parquet").toPath,
        Array[Byte](1, 2, 3)): Unit
    }
  }

  private final class VersionedDirProtocol extends Protocol {
    val name = "VersionedDir whole-tree CAS"
    private var root: String = _
    def init(): String = {
      root = Files.createTempDirectory("proto-vd-").toString + "/r"
      Rollup.build(Seq(("seed", 0.0)).toDF("flag", "qty"),
        Seq("flag"), Seq("qty"), root)
      root
    }
    def mutate(handle: Int, tag: Int): Unit =
      // VersionedDir holds no per-handle state: every appendDelta is an
      // independent optimistic transaction, which IS the two-driver shape
      Rollup.appendDelta(Seq((s"t$tag", tag.toDouble)).toDF("flag", "qty"),
        Seq("flag"), Seq("qty"), root)
    def readTags(): Set[Int] =
      Rollup.query(spark, root, Seq("flag"), Seq("qty"))
        .select("flag").as[String].collect()
        .collect { case f if f.startsWith("t") => f.stripPrefix("t").toInt }
        .toSet
    def plantOrphan(): Unit = {
      val d = new java.io.File(root, s"_stage_${System.nanoTime()}")
      java.nio.file.Files.createDirectories(d.toPath)
      java.nio.file.Files.write(new java.io.File(d, "junk.parquet").toPath,
        Array[Byte](1, 2, 3)): Unit
    }
  }

  /** The round-14 addition: the perceptual-hash index was the last
    * persisted index OUTSIDE the CAS discipline (its old fixtures appended
    * into and overwrote the live dir in place). Running it through the
    * same matrix pins that its build/append path now carries the full
    * contract — decode results can no longer be lost to a crash or race.
    */
  private final class PhashIndexProtocol extends Protocol {
    import graft.pipeline.{Multimodal, MediaRow}
    val name = "phash index (VersionedDir client)"
    private var root: String = _
    private def media(tag: Int) =
      Seq(MediaRow(tag.toLong, Multimodal.synthesizePng(tag.toLong), "image")).toDS()
    def init(): String = {
      root = Files.createTempDirectory("proto-ph-").toString + "/phash"
      // seed doc 0 (excluded from readTags): guarantees the hashes table
      // exists with files, so reads never depend on empty-write behavior
      Multimodal.buildPhashIndex(media(0), root)
      root
    }
    def mutate(handle: Int, tag: Int): Unit =
      Multimodal.appendToPhashIndex(media(tag), root)
    def readTags(): Set[Int] =
      Multimodal.readPhashIndex(spark, root)
        .select("doc_id").as[Long].collect().map(_.toInt).toSet - 0
    def plantOrphan(): Unit = {
      val d = new java.io.File(root, s"_stage_${System.nanoTime()}")
      java.nio.file.Files.createDirectories(d.toPath)
      java.nio.file.Files.write(new java.io.File(d, "junk.parquet").toPath,
        Array[Byte](1, 2, 3)): Unit
    }
  }

  /** The round-15 addition: the minhash band index is the FOURTH adapter
    * and the second [[graft.store.VersionedDocTable]] client — the shared
    * single-table backbone's append path rides the same matrix, so a
    * contract change in the backbone is caught from a second, independent
    * call path (bands-per-doc rows vs the phash index's one-per-doc).
    */
  private final class MinhashIndexProtocol extends Protocol {
    import graft.pipeline.Dedup
    val name = "minhash band index (VersionedDocTable client)"
    private var root: String = _
    private def docs(tag: Int) =
      Seq((tag.toLong, (0 until 6).map(j => s"w${tag * 31 + j}").mkString(" ")))
        .toDF("doc_id", "text")
    def init(): String = {
      root = Files.createTempDirectory("proto-mh-").toString + "/mh"
      // seed doc 0 (excluded from readTags), as the phash adapter does
      Dedup.buildMinhashIndex(docs(0), col("doc_id"), col("text"), root)
      root
    }
    def mutate(handle: Int, tag: Int): Unit =
      Dedup.appendToMinhashIndex(docs(tag), col("doc_id"), col("text"), root)
    def readTags(): Set[Int] =
      Dedup.readMinhashIndex(spark, root)
        .select("doc_id").distinct().as[Long].collect().map(_.toInt).toSet - 0
    def plantOrphan(): Unit = {
      val d = new java.io.File(root, s"_stage_${System.nanoTime()}")
      java.nio.file.Files.createDirectories(d.toPath)
      java.nio.file.Files.write(new java.io.File(d, "junk.parquet").toPath,
        Array[Byte](1, 2, 3)): Unit
    }
  }

  private def protocols =
    Seq(new GraphStoreProtocol, new VersionedDirProtocol,
      new PhashIndexProtocol, new MinhashIndexProtocol)

  for (p <- protocols) {
    test(s"${p.name}: a crash orphan is invisible to readers and never blocks the next commit") {
      p.init()
      p.mutate(0, 1)
      assert(p.readTags() == Set(1))
      p.plantOrphan()
      assert(p.readTags() == Set(1), "an unclaimed stage leaked into a read")
      p.mutate(0, 2) // the next commit must step past the orphan
      assert(p.readTags() == Set(1, 2),
        "a crash orphan blocked or corrupted the following commit")
    }
  }

  for (p <- protocols) {
    test(s"${p.name}: racing writers from independent handles lose no update") {
      p.init()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      val futures = (0 until 2).map { h =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = (1 to 3).foreach(i => p.mutate(h, 10 * (h + 1) + i))
        })
      }
      futures.foreach(_.get()); pool.shutdown()
      val want = (for (h <- 0 until 2; i <- 1 to 3) yield 10 * (h + 1) + i).toSet
      assert(p.readTags() == want,
        s"lost updates: ${want -- p.readTags()} never became visible")
    }
  }
}
