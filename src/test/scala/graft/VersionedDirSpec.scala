package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Pq, Rollup, SearchIndex}
import graft.store.VersionedDir

/** The engine-wide versioned-commit discipline, proven on the indexes that
  * ADOPTED it in round 12 (PQ, text inverted index, rollup summaries — the
  * IVF variants are covered in PipelineSpec): every mutation stages a
  * complete version and CAS-claims the next slot, so a crash leaves the
  * committed version byte-identical, a lost race reruns instead of losing
  * an update, and multi-table indexes can never commit torn.
  */
class VersionedDirSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // letter-only per-doc token (the tokenizer splits on [^a-z]+, so "doc7"
  // would not survive as a term): 45 -> "wef"
  private def word(i: Int): String =
    "w" + i.toString.map(c => ('a' + (c - '0')).toChar)

  private def docs(n: Int, from: Int = 0) =
    (from until from + n).map(i =>
      (i.toLong, s"alpha beta ${word(i)} gamma ${if (i % 2 == 0) "even" else "odd"}"))
      .toDF("doc_id", "text")

  private def filesOf(dir: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(dir)).map(f => f.getPath -> f.length()).toMap
  }

  test("PQ: a crashed append leaves the committed codebook+codes byte-identical; retry lands") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val path = Files.createTempDirectory("vd_pq").toString + "/pq"
    // ids [0, k) must exist in the training corpus (the deterministic-seed
    // contract), so the build takes the LOW ids and the append the high
    Pq.buildIndex(e.filter(col("vec_id") < 400), col("vec_id"), col("embedding"),
      path, m = 2, sub = 32, k = 4, iters = 1)
    val cur = VersionedDir.currentDir(path)
    val before = filesOf(cur)
    VersionedDir.withPreCommitHook(path,
      _ => throw new RuntimeException("simulated crash")) {
      intercept[RuntimeException] {
        Pq.appendToIndex(e.filter(col("vec_id") >= 400), col("vec_id"), col("embedding"),
          path, m = 2, sub = 32)
      }
    }
    assert(VersionedDir.currentDir(path) == cur, "crash advanced the version")
    assert(filesOf(cur) == before, "crash mutated the committed version")
    Pq.appendToIndex(e.filter(col("vec_id") >= 400), col("vec_id"), col("embedding"),
      path, m = 2, sub = 32)
    val ids = spark.read.parquet(s"${VersionedDir.currentDir(path)}/codes")
      .select("vec_id").distinct().as[Long].collect().toSet
    assert(ids == e.select("vec_id").as[Long].collect().toSet)
  }

  test("text index: an append racing a delete — exactly one claims each slot, both effects land") {
    val path = Files.createTempDirectory("vd_si").toString + "/idx"
    SearchIndex.buildIndex(docs(40), col("doc_id"), col("text"), path)
    @volatile var injected = false
    VersionedDir.withPreCommitHook(path, _ =>
      if (!injected) {
        injected = true
        // a competing DELETE commits between this append's stage and claim
        SearchIndex.deleteFromIndex(docs(1, from = 7), col("doc_id"), path)
      }) {
      SearchIndex.appendToIndex(docs(10, from = 40), col("doc_id"), col("text"), path)
    }
    assert(injected)
    // the append rerun carried the tombstone forward AND landed its docs:
    // doc7 stays dead, the new docs are probeable
    val got = SearchIndex.bm25Probe(spark, path, Seq(word(7), word(45)), topK = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(!got.contains(7L), "tombstone lost by the racing append")
    assert(got.contains(45L), "appended doc lost by the race")
  }

  test("text index: build commits postings+doclen as ONE version — no torn multi-table state") {
    val path = Files.createTempDirectory("vd_si2").toString + "/idx"
    SearchIndex.buildIndex(docs(10), col("doc_id"), col("text"), path)
    val v1 = VersionedDir.currentDir(path)
    assert(new java.io.File(s"$v1/postings").isDirectory
      && new java.io.File(s"$v1/doclen").isDirectory)
    // a crashed REBUILD (full stage, no claim) leaves v1 both-tables intact
    VersionedDir.withPreCommitHook(path,
      _ => throw new RuntimeException("simulated crash")) {
      intercept[RuntimeException] {
        SearchIndex.buildIndex(docs(50), col("doc_id"), col("text"), path)
      }
    }
    assert(VersionedDir.currentDir(path) == v1)
    val probe = SearchIndex.bm25Probe(spark, path, Seq(word(3)), topK = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(probe == Set(3L))
  }

  test("rollup: a crashed appendDelta cannot tear the summary (merged sums unchanged); retry exact") {
    val path = Files.createTempDirectory("vd_ru").toString + "/r"
    val base = (0 until 1000).map(i => (s"f${i % 3}", i.toDouble)).toDF("flag", "qty")
    val batch = (0 until 100).map(i => (s"f${i % 3}", 1000.0 + i)).toDF("flag", "qty")
    Rollup.build(base, Seq("flag"), Seq("qty"), path)
    val want = Rollup.query(spark, path, Seq("flag"), Seq("qty"))
      .orderBy("flag").collect().toSeq
    VersionedDir.withPreCommitHook(path,
      _ => throw new RuntimeException("simulated crash")) {
      intercept[RuntimeException] {
        Rollup.appendDelta(batch, Seq("flag"), Seq("qty"), path)
      }
    }
    // a torn append of partial rows would corrupt every merged sum — the
    // staged-version commit makes the crash invisible instead
    assert(Rollup.query(spark, path, Seq("flag"), Seq("qty"))
      .orderBy("flag").collect().toSeq == want)
    Rollup.appendDelta(batch, Seq("flag"), Seq("qty"), path)
    val got = Rollup.query(spark, path, Seq("flag"), Seq("qty"))
      .orderBy("flag").collect().toSeq
    val direct = base.unionByName(batch).groupBy("flag")
      .agg(count(lit(1)).as("n"),
        sum(col("qty").cast(org.apache.spark.sql.types.DecimalType(38, 12)))
          .cast("double").as("sum_qty"))
      .orderBy("flag").collect().toSeq
    assert(got == direct)
  }

  test("vacuum sweeps aged orphan stages + pre-previous versions, spares live state") {
    val path = Files.createTempDirectory("vd_vac").toString + "/r"
    val mk = (n: Int) => (0 until n).map(i => (s"f${i % 2}", i.toDouble)).toDF("flag", "qty")
    Rollup.build(mk(10), Seq("flag"), Seq("qty"), path) // v1
    Rollup.appendDelta(mk(5), Seq("flag"), Seq("qty"), path) // v2
    Rollup.appendDelta(mk(5), Seq("flag"), Seq("qty"), path) // v3
    // v1 is head−2 but freshly demoted — inside the commit-GC reader
    // grace period, so it MUST still be on disk, and a young vacuum must
    // spare it too
    val v1 = new java.io.File(path, "v000001")
    assert(v1.isDirectory,
      "head−2 inside the reader grace period was GC'd at commit")
    // a crashed writer's leftovers: an AGED stage and a FRESH stage (a
    // live writer mid-flight); then age v1's DEMOTION past the TTL — a
    // version's demotion time is its successor's commit (v2's mtime), so
    // aging v2 is what makes v1 the stranded-old-version shape vacuum
    // exists to sweep (v2 itself stays: head−1 is always kept)
    val aged = new java.io.File(path, "_stage_dead")
    java.nio.file.Files.createDirectories(aged.toPath)
    assert(aged.setLastModified(System.currentTimeMillis() - 100000L))
    val fresh = new java.io.File(path, "_stage_live")
    java.nio.file.Files.createDirectories(fresh.toPath)
    assert(new java.io.File(path, "v000002")
      .setLastModified(System.currentTimeMillis() - 100000L))
    val want = Rollup.query(spark, path, Seq("flag"), Seq("qty"))
      .orderBy("flag").collect().toSeq
    val swept = VersionedDir.vacuum(path, olderThanMillis = 60000L)
    assert(swept == Seq("_stage_dead", "v000001"), s"got $swept")
    assert(fresh.isDirectory, "a fresh (live) stage must survive the vacuum")
    assert(VersionedDir.currentDir(path).endsWith("v000003"))
    assert(new java.io.File(path, "v000002").isDirectory,
      "the previous version must survive for in-flight readers")
    assert(Rollup.query(spark, path, Seq("flag"), Seq("qty"))
      .orderBy("flag").collect().toSeq == want)
  }

  test("pinned reader survives two rapid commits (commit-GC reader grace period)") {
    // the streaming-ingest pattern the un-aged GC broke: a probe resolves
    // currentDir, then foreachBatch appends land two commits while the
    // probe is still running — its files must not vanish under it
    val path = Files.createTempDirectory("vd_grace").toString + "/r"
    val mk = (from: Int) =>
      (from until from + 50).map(i => (s"f${i % 3}", i.toDouble)).toDF("flag", "qty")
    Rollup.build(mk(0), Seq("flag"), Seq("qty"), path) // v1
    val pinned = VersionedDir.currentDir(path)
    // a LAZY frame over the pinned version: nothing read yet, exactly the
    // long-running-probe shape
    val reader = spark.read.parquet(pinned)
    Rollup.appendDelta(mk(50), Seq("flag"), Seq("qty"), path) // v2
    Rollup.appendDelta(mk(100), Seq("flag"), Seq("qty"), path) // v3: v1 = head−2
    assert(new java.io.File(pinned).isDirectory,
      "v1 was GC'd inside the reader grace period")
    assert(reader.count() == 3L, "the pinned reader failed after two commits")
  }

  test("grace period lapses: the next commit sweeps an aged demoted version") {
    val path = Files.createTempDirectory("vd_grace2").toString + "/r"
    val mk = (from: Int) =>
      (from until from + 50).map(i => (s"f${i % 3}", i.toDouble)).toDF("flag", "qty")
    Rollup.build(mk(0), Seq("flag"), Seq("qty"), path) // v1
    Rollup.appendDelta(mk(50), Seq("flag"), Seq("qty"), path) // v2 (v1 demoted)
    val v1 = new java.io.File(path, "v000001")
    // v1's demotion time is v2's commit (successor mtime — crash-safe, no
    // stamp to lose): deterministically age THAT past a shrunken window
    // instead of sleeping
    assert(new java.io.File(path, "v000002")
      .setLastModified(System.currentTimeMillis() - 120000L))
    VersionedDir.withRetention(path, 60000L) {
      Rollup.appendDelta(mk(100), Seq("flag"), Seq("qty"), path) // v3
    }
    assert(!v1.exists(), "an aged demoted version must be swept at commit")
    assert(new java.io.File(path, "v000002").isDirectory,
      "head−1 always survives regardless of age")
  }

  test("a long-lived ex-head is protected: demotion age comes from the successor, not its own mtime") {
    // v1 is the head for a long time (its dir mtime = staging time, long
    // ago), then two rapid commits land. A reader could have pinned v1
    // seconds before v2 appeared — measuring the grace period off v1's
    // OWN mtime would GC it immediately. The successor-mtime rule keeps
    // it, with no commit-time stamp a crashing writer could fail to write.
    val path = Files.createTempDirectory("vd_exhead").toString + "/r"
    val mk = (from: Int) =>
      (from until from + 50).map(i => (s"f${i % 3}", i.toDouble)).toDF("flag", "qty")
    Rollup.build(mk(0), Seq("flag"), Seq("qty"), path) // v1
    val v1 = new java.io.File(path, "v000001")
    assert(v1.setLastModified(System.currentTimeMillis() - 3600000L)) // staged 1h ago
    VersionedDir.withRetention(path, 60000L) {
      Rollup.appendDelta(mk(50), Seq("flag"), Seq("qty"), path) // v2: demotes v1 NOW
      Rollup.appendDelta(mk(100), Seq("flag"), Seq("qty"), path) // v3: GC considers v1
    }
    assert(v1.isDirectory,
      "v1 was GC'd off its staging-time mtime — a reader pinned just " +
        "before v2's commit would have lost its files")
  }

  test("adoption is metadata-only: carried files share the inode of the previous version's") {
    val path = Files.createTempDirectory("vd_ino").toString + "/r"
    val mk = (from: Int) =>
      (from until from + 500).map(i => (s"f${i % 3}", i.toDouble)).toDF("flag", "qty")
    Rollup.build(mk(0), Seq("flag"), Seq("qty"), path) // v1
    def parts(dir: String): Map[String, Long] = {
      val d = new java.io.File(dir)
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .map(f => f.getName ->
          java.nio.file.Files.getAttribute(f.toPath, "unix:ino").asInstanceOf[Long])
        .toMap
    }
    val v1 = parts(VersionedDir.currentDir(path))
    assert(v1.nonEmpty)
    Rollup.appendDelta(mk(500), Seq("flag"), Seq("qty"), path) // v2
    val v2 = parts(VersionedDir.currentDir(path))
    // every v1 part file appears in v2 under the same name AND inode — the
    // carry-over moved zero data bytes; only the batch's new files are new
    v1.foreach { case (name, ino) =>
      assert(v2.get(name).contains(ino),
        s"$name was copied (or dropped) instead of hardlinked")
    }
    assert(v2.size > v1.size, "the appended batch's files must be present")
  }

  test("three concurrent rollup appenders lose no partial (thread race over one root)") {
    val path = Files.createTempDirectory("vd_race3").toString + "/r"
    val base = (0 until 300).map(i => (s"f${i % 3}", i.toDouble)).toDF("flag", "qty")
    val batches = (1 to 3).map(b =>
      (0 until 100).map(i => (s"f${i % 3}", b * 1000.0 + i)).toDF("flag", "qty"))
    Rollup.build(base, Seq("flag"), Seq("qty"), path)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    val futures = batches.map { b =>
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = Rollup.appendDelta(b, Seq("flag"), Seq("qty"), path)
      })
    }
    futures.foreach(_.get()); pool.shutdown()
    val got = Rollup.query(spark, path, Seq("flag"), Seq("qty"))
      .orderBy("flag").collect().toSeq
    val direct = batches.foldLeft(base)(_ unionByName _).groupBy("flag")
      .agg(count(lit(1)).as("n"),
        sum(col("qty").cast(org.apache.spark.sql.types.DecimalType(38, 12)))
          .cast("double").as("sum_qty"))
      .orderBy("flag").collect().toSeq
    assert(got == direct, "a concurrent append's partials were lost")
  }

  test("ingestOnce: a re-delivered batch is a no-op; watermarks are per-stream and survive unrelated commits") {
    val path = Files.createTempDirectory("vd_txn").toString + "/r"
    val mk = (tag: Int) => Seq((s"t$tag", tag.toDouble)).toDF("flag", "qty")
    Rollup.build(mk(0), Seq("flag"), Seq("qty"), path)
    def rows() = Rollup.query(spark, path, Seq("flag"), Seq("qty")).count()
    // batch 0 applies once
    assert(VersionedDir.ingestOnce(path, "s1", 0) {
      Rollup.appendDelta(mk(1), Seq("flag"), Seq("qty"), path)
    })
    assert(rows() == 2 && VersionedDir.appliedBatch(path, "s1").contains(0L))
    // the retry (foreachBatch re-delivery) is skipped entirely
    assert(!VersionedDir.ingestOnce(path, "s1", 0) {
      Rollup.appendDelta(mk(1), Seq("flag"), Seq("qty"), path)
    })
    assert(rows() == 2, "a re-delivered batch was double-ingested")
    assert(VersionedDir.head(path) == 2, "a skipped batch committed a version")
    // an UNRELATED commit (maintenance, plain append) must carry the
    // watermark forward — else a late retry after a compact re-applies
    Rollup.appendDelta(mk(9), Seq("flag"), Seq("qty"), path)
    Rollup.compactRollup(spark, path, Seq("flag"), Seq("qty"), path)
    assert(VersionedDir.appliedBatch(path, "s1").contains(0L),
      "watermark lost across unrelated commits")
    assert(!VersionedDir.ingestOnce(path, "s1", 0) {
      Rollup.appendDelta(mk(1), Seq("flag"), Seq("qty"), path)
    })
    // streams are independent; later batches apply; the skip covers the
    // one legitimate re-delivery (AT the watermark) while anything BELOW
    // is a restarted-ids violation (see the dedicated reset test)
    assert(VersionedDir.ingestOnce(path, "s2", 0) {
      Rollup.appendDelta(mk(2), Seq("flag"), Seq("qty"), path)
    })
    assert(VersionedDir.ingestOnce(path, "s1", 1) {
      Rollup.appendDelta(mk(3), Seq("flag"), Seq("qty"), path)
    })
    assert(VersionedDir.appliedBatch(path, "s1").contains(1L))
    assert(!VersionedDir.ingestOnce(path, "s1", 1) { fail("must not run") })
    intercept[IllegalStateException] {
      VersionedDir.ingestOnce(path, "s1", 0) { fail("must not run") }
    }
    intercept[IllegalArgumentException] {
      VersionedDir.ingestOnce(path, "bad/stream", 0) {}
    }
  }

  test("ingestOnce: a batch id far below the watermark fails loudly; resetStream re-arms the stream") {
    val path = Files.createTempDirectory("vd_txn_reset").toString + "/r"
    val mk = (tag: Int) => Seq((s"t$tag", tag.toDouble)).toDF("flag", "qty")
    Rollup.build(mk(0), Seq("flag"), Seq("qty"), path)
    assert(VersionedDir.ingestOnce(path, "s", 41) {
      Rollup.appendDelta(mk(1), Seq("flag"), Seq("qty"), path)
    })
    // AT the watermark = the one legitimate re-delivery: silent skip
    // (the checkpoint can trail the atomically-committed watermark by at
    // most one batch, so only the last batch ever re-delivers)
    assert(!VersionedDir.ingestOnce(path, "s", 41) { fail("must not run") })
    // BELOW it = the stream's batch ids RESTARTED (deleted/rebuilt
    // checkpoint) — a silent skip would drop every batch until the id
    // overtakes the stale watermark, so the violation must be loud
    intercept[IllegalStateException] {
      VersionedDir.ingestOnce(path, "s", 40) { fail("must not run") }
    }
    val ex = intercept[IllegalStateException] {
      VersionedDir.ingestOnce(path, "s", 0) { fail("must not run") }
    }
    assert(ex.getMessage.contains("resetStream"))
    // an explicit slack re-admits deeper replays for operators that
    // restore checkpoints from backups
    assert(!VersionedDir.ingestOnce(path, "s", 40, maxReplayLag = 2) {
      fail("must not run")
    })
    // the sanctioned recovery: resetStream drops ONLY this stream's mark
    assert(VersionedDir.ingestOnce(path, "other", 5) {
      Rollup.appendDelta(mk(2), Seq("flag"), Seq("qty"), path)
    })
    VersionedDir.resetStream(path, "s")
    assert(VersionedDir.appliedBatch(path, "s").isEmpty)
    assert(VersionedDir.appliedBatch(path, "other").contains(5L),
      "resetStream erased an unrelated stream's watermark")
    assert(VersionedDir.ingestOnce(path, "s", 0) {
      Rollup.appendDelta(mk(3), Seq("flag"), Seq("qty"), path)
    }, "a restarted stream must apply from batch 0 after reset")
    assert(Rollup.query(spark, path, Seq("flag"), Seq("qty")).count() == 4,
      "resetStream disturbed committed data")
    // resetting a stream that never ingested is a no-op (no version churn)
    val h = VersionedDir.head(path)
    VersionedDir.resetStream(path, "nope")
    assert(VersionedDir.head(path) == h)
  }

  test("resetStream carries underscore data sidecars (the IVF _centroids) into the reset version") {
    import graft.pipeline.Similarity
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .filter(col("vec_id") < 60)
    val cents = e.filter(col("vec_id") < 2)
    val idx = Files.createTempDirectory("vd_reset_ivf").toString + "/ivf"
    def cols = (col("vec_id"), col("embedding"))
    Similarity.buildIvfIndex(e.filter(col("vec_id") < 40), cents,
      cols._1, cols._2, cols._1, cols._2, idx)
    assert(VersionedDir.ingestOnce(idx, "s", 3) {
      Similarity.appendToIvfIndex(e.filter(col("vec_id") >= 40), cents,
        cols._1, cols._2, cols._1, cols._2, idx): Unit
    })
    VersionedDir.resetStream(idx, "s")
    assert(VersionedDir.appliedBatch(idx, "s").isEmpty)
    // adoptTree alone skips underscore dirs — the reset must re-add them,
    // else the index silently downgrades to caller-supplied centroids
    // (and a post-split index would lose its child cells entirely)
    assert(new java.io.File(VersionedDir.currentDir(idx), "_centroids")
      .isDirectory, "resetStream dropped the _centroids sidecar")
    assert(Similarity.ivfStats(spark, idx).vectors == 60)
  }

  test("ingestOnce: crash before the claim leaves no watermark — the retry re-applies; crash AFTER is a skip") {
    val path = Files.createTempDirectory("vd_txn_crash").toString + "/r"
    val mk = (tag: Int) => Seq((s"t$tag", tag.toDouble)).toDF("flag", "qty")
    Rollup.build(mk(0), Seq("flag"), Seq("qty"), path)
    // crash between the fully-built stage and the claim: neither the data
    // nor the watermark landed, so the restarted stream re-applies
    VersionedDir.withPreCommitHook(path,
      _ => throw new RuntimeException("crash")) {
      intercept[RuntimeException] {
        VersionedDir.ingestOnce(path, "s", 7) {
          Rollup.appendDelta(mk(1), Seq("flag"), Seq("qty"), path)
        }
      }
    }
    assert(VersionedDir.appliedBatch(path, "s").isEmpty)
    assert(VersionedDir.ingestOnce(path, "s", 7) {
      Rollup.appendDelta(mk(1), Seq("flag"), Seq("qty"), path)
    }, "retry after a pre-claim crash must re-apply")
    assert(Rollup.query(spark, path, Seq("flag"), Seq("qty")).count() == 2)
    // the stamp rides the SAME claim as the data: once committed, a
    // post-commit crash (before the stream checkpoint advances) only skips
    assert(!VersionedDir.ingestOnce(path, "s", 7) { fail("must not run") })
  }

  test("legacy un-versioned roots stay readable and upgrade on first mutation") {
    val path = Files.createTempDirectory("vd_legacy").toString + "/r"
    // a plain parquet dir written before the protocol existed
    (0 until 10).map(i => (s"f${i % 2}", i.toDouble)).toDF("flag", "qty")
      .groupBy("flag").agg(count(lit(1)).as("_n"),
        sum(col("qty").cast(org.apache.spark.sql.types.DecimalType(38, 12)))
          .as("_sum_qty"), count(col("qty")).as("_cnt_qty"),
        min("qty").as("_min_qty"), max("qty").as("_max_qty"))
      .write.parquet(path)
    assert(VersionedDir.currentDir(path) == path) // resolves to the root
    assert(Rollup.query(spark, path, Seq("flag"), Seq("qty")).count() == 2)
    // first mutation adopts the legacy files into v000001
    Rollup.appendDelta(
      Seq(("f0", 5.0)).toDF("flag", "qty"), Seq("flag"), Seq("qty"), path)
    assert(VersionedDir.currentDir(path).endsWith("v000001"))
    val n = Rollup.query(spark, path, Seq("flag"), Seq("qty"))
      .agg(sum("n")).as[Long].head()
    assert(n == 11L)
  }
}
