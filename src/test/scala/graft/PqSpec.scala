package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Pq

/** Pins the product-quantization contract: deterministic integer-domain
  * codebook training (partition-count independence, empty-cluster
  * retention, floor-mean re-centering), map-side encoding, and ADC probes
  * agreeing with exact search on well-separated fixtures.
  */
class PqSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** 8-dim vectors → m=2 subspaces × 4 dims; ids 0,1 seed a K=2 codebook.
    * Two tight groups: A = {0,2,4}, B = {1,3,5} in both subspaces.
    */
  private def twoGroups = Seq(
    (0L, Seq(1.0f, 1.0f, 0.0f, 0.0f, 5.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Seq(0.0f, 0.0f, 1.0f, 1.0f, 0.0f, 5.0f, 0.0f, 0.0f)),
    (2L, Seq(1.1f, 0.9f, 0.0f, 0.0f, 5.1f, 0.0f, 0.0f, 0.0f)),
    (3L, Seq(0.0f, 0.0f, 1.1f, 0.9f, 0.0f, 5.1f, 0.0f, 0.0f)),
    (4L, Seq(0.9f, 1.1f, 0.0f, 0.0f, 4.9f, 0.0f, 0.0f, 0.0f)),
    (5L, Seq(0.0f, 0.0f, 0.9f, 1.1f, 0.0f, 4.9f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  private def intsOf(xs: Seq[Float]): Seq[Long] =
    xs.map(x => math.floor(x.toDouble * 1e6).toLong)

  test("training is partition-count independent and centroids are floor-means") {
    val cb1 = Pq.trainCodebook(twoGroups.repartition(1), col("vec_id"),
      col("embedding"), m = 2, sub = 4, k = 2, iters = 2)
      .orderBy("subspace", "code").as[(Int, Int, Seq[Long])].collect()
    val cb7 = Pq.trainCodebook(twoGroups.repartition(7), col("vec_id"),
      col("embedding"), m = 2, sub = 4, k = 2, iters = 2)
      .orderBy("subspace", "code").as[(Int, Int, Seq[Long])].collect()
    assert(cb1.toSeq == cb7.toSeq)
    // cluster 0 of subspace 0 holds ids {0,2,4} both rounds: component 0 is
    // floor((⌊1.0e6⌋+⌊1.1e6⌋+⌊0.9e6⌋)/3) computed from the fixed-point longs
    val expect0 = {
      val ints = Seq(1.0f, 1.1f, 0.9f).map(x => math.floor(x.toDouble * 1e6).toLong)
      math.floor(ints.sum.toDouble / 3.0).toLong
    }
    assert(cb1.find(t => t._1 == 0 && t._2 == 0).get._3.head == expect0)
  }

  test("empty clusters keep their previous centroid") {
    // id 2 duplicates id 0 exactly, so seed 2's own vector ties seed 0 and
    // the tiebreak sends it to code 0 — cluster 2 is EMPTY in the round and
    // must retain its seed centroid while cluster 0's centroid moves to the
    // floor-mean of {0,2,4}
    val dupSeeds = Seq(
      (0L, Seq(1.0f, 1.0f, 0.0f, 0.0f, 5.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(0.0f, 0.0f, 1.0f, 1.0f, 0.0f, 5.0f, 0.0f, 0.0f)),
      (2L, Seq(1.0f, 1.0f, 0.0f, 0.0f, 5.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Seq(0.0f, 0.0f, 1.0f, 1.0f, 0.0f, 5.0f, 0.0f, 0.0f)),
      (4L, Seq(0.9f, 1.1f, 0.0f, 0.0f, 4.9f, 0.0f, 0.0f, 0.0f)),
      (5L, Seq(0.0f, 0.0f, 0.9f, 1.1f, 0.0f, 4.9f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val cb = Pq.trainCodebook(dupSeeds, col("vec_id"), col("embedding"),
      m = 2, sub = 4, k = 4, iters = 1)
      .orderBy("subspace", "code").as[(Int, Int, Seq[Long])].collect()
    val seed = intsOf(Seq(1.0f, 1.0f, 0.0f, 0.0f))
    assert(cb.find(t => t._1 == 0 && t._2 == 2).get._3 == seed)
    val moved = cb.find(t => t._1 == 0 && t._2 == 0).get._3
    assert(moved != seed) // cluster 0 re-centered on {0,2,4}
    assert(moved.head == math.floor((1000000L + 1000000L + 899999L).toDouble / 3.0).toLong)
  }

  test("ADC probe matches exact nearest neighbors on separated clusters") {
    val idx = java.nio.file.Files.createTempDirectory("pqspec").toString
    Pq.buildIndex(twoGroups, col("vec_id"), col("embedding"), s"$idx/pq",
      m = 2, sub = 4, k = 2, iters = 2)
    val got = Pq.adcProbe(twoGroups.filter(col("vec_id") < 2), col("vec_id"),
      col("embedding"), s"$idx/pq", k = 1, m = 2, sub = 4)
      .orderBy("query_id").as[(Long, Long, Int, Long)].collect()
    // one centroid per group → same-group neighbors tie on ADC distance and
    // the id tiebreak picks the smallest non-self group member
    assert(got.map(t => (t._1, t._2)).toSeq == Seq((0L, 2L), (1L, 3L)))
  }

  test("appendToIndex equals re-encoding the union under the frozen codebook") {
    val idx1 = java.nio.file.Files.createTempDirectory("pqinc1").toString
    Pq.buildIndex(twoGroups.filter(col("vec_id") < 4), col("vec_id"),
      col("embedding"), s"$idx1/pq", m = 2, sub = 4, k = 2, iters = 2)
    Pq.appendToIndex(twoGroups.filter(col("vec_id") >= 4), col("vec_id"),
      col("embedding"), s"$idx1/pq", m = 2, sub = 4)
    val got = Pq.adcProbe(twoGroups.filter(col("vec_id") < 2), col("vec_id"),
      col("embedding"), s"$idx1/pq", k = 3, m = 2, sub = 4)
      .orderBy("query_id", "rank").as[(Long, Long, Int, Long)].collect().toSeq
    // rebuild comparator: same old-corpus codebook, whole corpus encoded at once
    val cb = Pq.trainCodebook(twoGroups.filter(col("vec_id") < 4), col("vec_id"),
      col("embedding"), m = 2, sub = 4, k = 2, iters = 2)
    val idx2 = java.nio.file.Files.createTempDirectory("pqinc2").toString
    cb.write.parquet(s"$idx2/pq/codebook")
    Pq.encode(twoGroups, col("vec_id"), col("embedding"), cb, m = 2, sub = 4)
      .write.parquet(s"$idx2/pq/codes")
    val want = Pq.adcProbe(twoGroups.filter(col("vec_id") < 2), col("vec_id"),
      col("embedding"), s"$idx2/pq", k = 3, m = 2, sub = 4)
      .orderBy("query_id", "rank").as[(Long, Long, Int, Long)].collect().toSeq
    assert(got == want && got.nonEmpty)
  }

  test("ivfPqProbe with every cell probed equals the plain ADC probe") {
    // nprobe = nCentroids ⇒ no candidate ever pruned; the composition must
    // then reduce exactly to adcProbe over the same codebook
    val flat = java.nio.file.Files.createTempDirectory("pqflat").toString
    Pq.buildIndex(twoGroups, col("vec_id"), col("embedding"), s"$flat/pq",
      m = 2, sub = 4, k = 2, iters = 2)
    val ivfpq = java.nio.file.Files.createTempDirectory("pqivf").toString
    Pq.buildIvfPqIndex(twoGroups, twoGroups.filter(col("vec_id") < 2),
      col("vec_id"), col("embedding"), col("vec_id"), col("embedding"),
      s"$ivfpq/ivfpq", m = 2, sub = 4, k = 2, iters = 2)
    val want = Pq.adcProbe(twoGroups.filter(col("vec_id") < 2), col("vec_id"),
      col("embedding"), s"$flat/pq", k = 3, m = 2, sub = 4)
      .orderBy("query_id", "rank").as[(Long, Long, Int, Long)].collect().toSeq
    val got = Pq.ivfPqProbe(twoGroups.filter(col("vec_id") < 2), col("vec_id"),
      col("embedding"), s"$ivfpq/ivfpq", k = 3, nprobe = 2, m = 2, sub = 4)
      .orderBy("query_id", "rank").as[(Long, Long, Int, Long)].collect().toSeq
    assert(got == want && got.nonEmpty)
  }

  test("pq stats + maintainIfNeeded: append file growth heals IN PLACE on both layouts; probes bit-identical; trigger resets") {
    import graft.store.VersionedDir
    def probe(path: String) =
      Pq.adcProbe(twoGroups.filter(col("vec_id") < 2), col("vec_id"),
        col("embedding"), path, k = 3, m = 2, sub = 4)
        .orderBy("query_id", "rank").as[(Long, Long, Int, Long)].collect().toSeq
    // flat PQ: three appends grow the single-cell file count
    val flat = java.nio.file.Files.createTempDirectory("pqmaint").toString + "/pq"
    Pq.buildIndex(twoGroups.filter(col("vec_id") < 3), col("vec_id"),
      col("embedding"), flat, m = 2, sub = 4, k = 2, iters = 2)
    for (i <- 3 to 5)
      Pq.appendToIndex(twoGroups.filter(col("vec_id") === i), col("vec_id"),
        col("embedding"), flat, m = 2, sub = 4)
    val s1 = Pq.pqStats(spark, flat)
    assert(s1.codeRows == 12 && s1.cells == 0 && s1.version == 4,
      s"flat stats wrong: $s1")
    assert(s1.maxFilesPerCell >= 4, s"appends should accumulate files: $s1")
    val before = probe(flat)
    assert(Pq.pqMaintainIfNeeded(spark, flat,
      maxFilesPerCell = s1.maxFilesPerCell - 1, targetFiles = 1))
    val s2 = Pq.pqStats(spark, flat)
    assert(s2.codeRows == 12 && s2.maxFilesPerCell <= 1 && s2.version == 5,
      s"in-place compact must fold the codes: $s1 -> $s2")
    assert(probe(flat) == before, "compact changed probe results")
    assert(!Pq.pqMaintainIfNeeded(spark, flat,
      maxFilesPerCell = s1.maxFilesPerCell - 1, targetFiles = 1))
    assert(VersionedDir.head(flat) == 5, "no-op must not commit")
    // the codebook carried by hardlink, not rewritten
    def ino(f: java.io.File): Any =
      java.nio.file.Files.getAttribute(f.toPath, "unix:ino")
    val v4 = new java.io.File(s"${flat}/v000004/codebook")
    val v5 = new java.io.File(s"${flat}/v000005/codebook")
    v4.listFiles().filter(_.getName.startsWith("part-")).foreach { p =>
      assert(ino(new java.io.File(v5, p.getName)) == ino(p),
        "compact rewrote the codebook")
    }
    // IVF-PQ: cells fold to one file each, probes bit-identical
    val ivf = java.nio.file.Files.createTempDirectory("pqmaint2").toString + "/ivfpq"
    Pq.buildIvfPqIndex(twoGroups.filter(col("vec_id") < 4),
      twoGroups.filter(col("vec_id") < 2),
      col("vec_id"), col("embedding"), col("vec_id"), col("embedding"),
      ivf, m = 2, sub = 4, k = 2, iters = 2)
    for (i <- 4 to 5)
      Pq.appendToIvfPqIndex(twoGroups.filter(col("vec_id") === i),
        col("vec_id"), col("embedding"), ivf, m = 2, sub = 4)
    val is1 = Pq.pqStats(spark, ivf)
    assert(is1.cells == 2 && is1.maxFilesPerCell >= 2, s"ivfpq stats wrong: $is1")
    def iprobe() =
      Pq.ivfPqProbe(twoGroups.filter(col("vec_id") < 2), col("vec_id"),
        col("embedding"), ivf, k = 3, nprobe = 2, m = 2, sub = 4)
        .orderBy("query_id", "rank").as[(Long, Long, Int, Long)].collect().toSeq
    val ibefore = iprobe()
    assert(Pq.pqMaintainIfNeeded(spark, ivf,
      maxFilesPerCell = is1.maxFilesPerCell - 1, targetFiles = 1))
    val is2 = Pq.pqStats(spark, ivf)
    assert(is2.cells == 2 && is2.maxFilesPerCell == 1 && is2.codeRows == is1.codeRows,
      s"cell fold failed: $is1 -> $is2")
    assert(iprobe() == ibefore && ibefore.nonEmpty)
    assert(!Pq.pqMaintainIfNeeded(spark, ivf,
      maxFilesPerCell = is1.maxFilesPerCell - 1, targetFiles = 1))
    // converging knobs enforced
    intercept[IllegalArgumentException] {
      Pq.pqMaintainIfNeeded(spark, ivf, maxFilesPerCell = 8, targetFiles = 8)
    }
  }

  test("ivfPq code table prunes the scan to the probed cell's directory") {
    val dir = java.nio.file.Files.createTempDirectory("pqprune").toString
    Pq.buildIvfPqIndex(twoGroups, twoGroups.filter(col("vec_id") < 2),
      col("vec_id"), col("embedding"), col("vec_id"), col("embedding"),
      s"$dir/ivfpq", m = 2, sub = 4, k = 2, iters = 1)
    val cur = graft.store.VersionedDir.currentDir(s"$dir/ivfpq")
    val oneCell = spark.read.parquet(s"$cur/codes")
      .filter(col("centroid_id") === 0)
    assert(oneCell.collect().nonEmpty)
    val scan = oneCell.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.metadata("PartitionFilters").contains("centroid_id"),
      s"no partition filter pushed: ${scan.metadata("PartitionFilters")}")
    val total = spark.read.parquet(s"$cur/codes").inputFiles.length
    assert(scan.metrics("numFiles").value < total,
      s"scanned ${scan.metrics("numFiles").value} of $total files - no pruning")
  }

  test("codegen'd pq_argmin equals the builtin fold twin on every (vector, subspace)") {
    val cb = Pq.trainCodebook(twoGroups, col("vec_id"), col("embedding"),
      m = 2, sub = 4, k = 2, iters = 2)
    val cbArr = cb.groupBy("subspace")
      .agg(sort_array(collect_list(struct(col("code"), col("cent")))).as("cb"))
    val sv = Pq.subvectors(twoGroups, col("vec_id"), col("embedding"), m = 2, sub = 4)
      .join(broadcast(cbArr), "subspace")
    val both = sv.select(col("vec_id"), col("subspace"),
        graft.functions.VectorFunctions.pqArgmin(col("sv"), col("cb")).as("expr"),
        Pq.argminCodeFold(col("sv"), col("cb")).as("fold"))
      .as[(Long, Int, Int, Int)].collect().toSeq
    assert(both.nonEmpty && both.forall(r => r._3 == r._4))
  }

  test("encoding assigns every (vector, subspace) exactly one code in [0, k)") {
    val cb = Pq.trainCodebook(twoGroups, col("vec_id"), col("embedding"),
      m = 2, sub = 4, k = 2, iters = 1)
    val codes = Pq.encode(twoGroups, col("vec_id"), col("embedding"), cb,
      m = 2, sub = 4).as[(Long, Int, Int)].collect()
    assert(codes.length == 12) // 6 vectors × 2 subspaces
    assert(codes.forall(c => c._3 >= 0 && c._3 < 2))
    assert(codes.map(c => (c._1, c._2)).distinct.length == 12)
  }
}
