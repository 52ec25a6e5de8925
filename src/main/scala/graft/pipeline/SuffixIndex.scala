package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.store.VersionedDir

/** Persisted SUFFIX-GRAM index — incremental exact-substring statistics
  * ([[TextAnalysis.longestRepeatStats]] semantics) without re-sorting the
  * corpus per batch. The sorted suffix space is cut into range BUCKETS
  * (bucket b owns grams in [first(b), first(next b)), recorded in an
  * O(buckets) edges table); a batch routes each of its grams to its bucket,
  * so an append reads ONLY the touched buckets (partition-pruned), merges
  * the batch in, and recomputes adjacent LCPs there — untouched buckets
  * carry into the next version by hardlink adoption, and per-doc results
  * accumulate as max-merged deltas. Every mutation commits through the
  * engine-wide [[graft.store.VersionedDir]] optimistic CAS: racing appends
  * rerun instead of losing updates, and a crash leaves the committed
  * version byte-identical.
  *
  * Correctness of the pruned recompute: under append a position's sort
  * neighbors only get CLOSER (rows are inserted, never removed), so
  * adjacent LCPs never decrease and max-merging bucket recomputes into the
  * stored per-doc values is exact. Positions in untouched buckets keep
  * their neighbors except at BUCKET BOUNDARIES, where a merged bucket's new
  * edge row may now face an untouched neighbor's edge row — those O(buckets)
  * pairs are stitched at the driver from the edges table (including the
  * old-doc side: an untouched doc's lrs CAN rise when a batch gram lands
  * next to its bucket edge, and the delta row records it).
  *
  * Layout per committed version:
  *   grams/bucket=B/   (doc_id, i, g)      — the bucket's suffix grams
  *   edges/            (bucket, first/last gram + position)
  *   perdoc/           (doc_id, n_tokens, lrs) delta rows, max-merged at read
  *   meta/             (cap, buckets, target_rows) — appends validate cap
  *                     and size-trigger splits against target_rows
  *
  * Bucket boundaries are NOT frozen at build time: bucket ids are spaced
  * [[BucketGap]] apart so an append can SPLIT an oversized bucket into
  * sub-buckets whose ids sit strictly between its id and the next bucket's
  * (id order stays range order — the invariant every consumer of the edges
  * table relies on), and [[compact]] re-derives balanced boundaries from a
  * fresh range partitioning (it re-sorts the whole gram table anyway, so
  * the re-split is free there). Without either, appends concentrated in
  * one key range — realistic: near-duplicate crawl shards sort adjacently
  * — would grow one bucket without bound and silently degrade the
  * O(touched-buckets) append contract into single-task O(corpus) sorts.
  */
object SuffixIndex {

  /** Initial spacing between bucket ids: a bucket can split into midpoint
    * ids up to 16 levels deep before running out of integer room (then the
    * split is skipped and the next [[compact]] rebalances everything).
    */
  val BucketGap: Int = 1 << 16

  /** A bucket splits on append once it exceeds this multiple of the
    * index's target rows/bucket (meta's `target_rows`).
    */
  val SplitFactor: Int = 4

  /** Build the index over an initial corpus. `cap` is fixed for the
    * index's lifetime; `buckets` is the TARGET bucket count (appends may
    * split oversized buckets, compact rebalances back to the target).
    */
  def build(docs: DataFrame, id: Column, text: Column, path: String,
      cap: Int = 16, buckets: Int = 32): Unit = {
    require(buckets >= 1 && buckets <= (1 << 14),
      s"buckets must be in [1, 16384], got $buckets")
    VersionedDir.mutate(path) { (_, _) =>
      stageFullBuild(docs, id, text, path, cap, buckets)
    }
  }

  /** Stage one complete from-scratch index version — the shared body of
    * [[build]] and [[append]]'s empty-index bootstrap. Runs INSIDE a
    * [[VersionedDir.mutate]] transaction, so it must be rerunnable.
    */
  private def stageFullBuild(docs: DataFrame, id: Column, text: Column,
      path: String, cap: Int, buckets: Int): Option[java.io.File] = {
    val spark = docs.sparkSession
    val stage = VersionedDir.stageDir(path)
    val lens = docLens(docs, id, text).localCheckpoint(false)
    val parted = cappedSuffixes(docs, id, text, cap)
      .repartitionByRange(buckets, col("g"), col("doc_id"), col("i"))
      .sortWithinPartitions(col("g"), col("doc_id"), col("i"))
      .withColumn("bucket", spark_partition_id() * lit(BucketGap))
      .localCheckpoint(false)
    parted.write.partitionBy("bucket").parquet(s"$stage/grams")
    val (bucketContrib, edges) = neighborPass(parted)
    writeEdges(edges, spark, s"$stage/edges")
    val contrib = bucketContrib
      .unionAll(boundaryContributions(spark, edges))
      .groupBy("doc_id").agg(max(col("lcp")).as("lrs"))
    lens.join(contrib, Seq("doc_id"), "left")
      .na.fill(0, Seq("lrs"))
      .select(col("doc_id"), col("n_tokens"), col("lrs").cast("int").as("lrs"))
      .write.parquet(s"$stage/perdoc")
    writeMeta(spark, s"$stage/meta", cap, buckets,
      parted.count() / math.max(buckets, 1))
    Some(stage)
  }

  /** O(touched buckets) incremental append of new docs (ids must be new —
    * the keep-one-copy-of-every-row contract every persisted index here
    * shares). Batch grams route to their range buckets via the edges
    * table; only those buckets are read, merged, recomputed, and
    * rewritten; everything else hardlinks into the staged version.
    */
  def append(newDocs: DataFrame, id: Column, text: Column,
      path: String): Unit = {
    val spark = newDocs.sparkSession
    VersionedDir.mutate(path) { (_, cur) =>
      val meta = spark.read.parquet(s"$cur/meta").head()
      val cap = meta.getInt(0)
      val oldEdges = readEdgeRows(spark, s"$cur/edges")
      // Bootstrap: an index with no committed GRAMS has no buckets to
      // route into, so the first append of a bootstrap-then-stream
      // scheduler is a from-scratch build of the batch under the index's
      // own cap/buckets (trivially ≡ merge-into-empty). Staged INSIDE
      // this transaction: two racing bootstrap appends then CAS — the
      // loser reruns, sees the winner's edges, and takes the normal merge
      // path instead of overwriting the winner's batch away.
      //
      // Zero edges does NOT mean zero DOCS (round-15 ADVICE): a committed
      // corpus whose docs all tokenized to zero tokens has perdoc rows
      // but no grams. The prior perdoc parts are hardlink-adopted beside
      // the batch's, so those docs keep counting in docLens/lrsStats —
      // and when the prior corpus really was empty, adopting its
      // zero-row perdoc parts is a harmless identity.
      if (oldEdges.isEmpty) {
        val staged = stageFullBuild(newDocs, id, text, path, cap, meta.getInt(1))
        val priorPerdoc = new java.io.File(s"$cur/perdoc")
        if (priorPerdoc.isDirectory)
          staged.foreach(st => VersionedDir.adoptTree(
            priorPerdoc, new java.io.File(st, "perdoc")))
        staged
      } else appendStaged(newDocs, id, text, path, cur, cap, meta, oldEdges)
    }
  }

  /** The non-bootstrap append body (see [[append]]); runs inside the CAS
    * transaction against the pinned `cur` version.
    */
  private def appendStaged(newDocs: DataFrame, id: Column, text: Column,
      path: String, cur: String, cap: Int, meta: Row,
      oldEdges: Seq[Edge]): Option[java.io.File] = {
    val spark = newDocs.sparkSession
    locally {
      val batchLens = docLens(newDocs, id, text).localCheckpoint(false)
      val routed = routeToBuckets(
        cappedSuffixes(newDocs, id, text, cap), oldEdges)
        .localCheckpoint(false)
      val touched = routed.select(col("bucket")).distinct()
        .collect().map(_.getInt(0)).toSet
      val stage = VersionedDir.stageDir(path)

      // Merge batch grams into the touched buckets; ONE window sort per
      // bucket (bucket = partition), exactly the build plan restricted to
      // the touched key ranges. The old-side read is partition-pruned.
      val oldTouched =
        if (touched.isEmpty) routed.limit(0).select("doc_id", "i", "g", "bucket")
        else spark.read.parquet(s"$cur/grams")
          .filter(col("bucket").isin(touched.toSeq: _*))
          .select(col("doc_id"), col("i"), col("g"),
            col("bucket").cast("int").as("bucket"))
      val mergedBase = oldTouched
        .unionByName(routed.select("doc_id", "i", "g", "bucket"))
        .repartition(math.max(touched.size, 1), col("bucket"))
        .sortWithinPartitions(col("bucket"), col("g"), col("doc_id"), col("i"))
        .localCheckpoint(false)
      // Size-triggered SPLIT: a merged bucket past SplitFactor × the
      // index's target rows/bucket is cut into ~target-sized sub-buckets
      // at ids spread through the gap to the next bucket (id order stays
      // range order). Sub-bucketing is count-based over the merged sort
      // order — same invariant as build's repartitionByRange, which also
      // cuts inside equal-gram runs; the boundary stitch covers those.
      // The one-off single-bucket row_number sort is bounded by the
      // trigger itself (≤ SplitFactor × target + batch); skipping the
      // split would let the bucket grow without bound instead. A
      // non-positive target (a build whose corpus was smaller than its
      // bucket count, or a pre-target legacy meta) DISABLES splitting —
      // the safe fallback is never-split-until-compact, not
      // split-every-bucket-into-singleton-rows.
      val target = if (meta.length > 2) meta.getLong(2) else 0L
      val sizes =
        if (target < 1) Map.empty[Int, Long]
        else mergedBase.groupBy("bucket").count().collect()
          .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val allIds = oldEdges.map(_.bucket).sorted
      def nextId(b: Int): Int =
        allIds.find(_ > b).getOrElse(allIds.lastOption.getOrElse(0) + BucketGap)
      val splits = sizes.iterator
        .filter { case (_, cnt) => cnt > SplitFactor.toLong * target }
        .flatMap { case (b, cnt) =>
          val room = nextId(b).toLong - b // ids available, including b
          val m = math.min((cnt + target - 1) / target, room)
          if (m <= 1) None
          else Some(b -> (m, (nextId(b).toLong - b) / m, (cnt + m - 1) / m))
        }.toMap
      val merged =
        if (splits.isEmpty) mergedBase
        else {
          val planDf = spark.createDataFrame(
            java.util.Arrays.asList(splits.toSeq.map { case (b, (m, step, pp)) =>
              Row(b, m, step, pp.toDouble)
            }: _*),
            StructType(Seq(StructField("bucket", IntegerType),
              StructField("_m", LongType), StructField("_step", LongType),
              StructField("_pp", DoubleType))))
          val wB = Window.partitionBy("bucket")
            .orderBy(col("g"), col("doc_id"), col("i"))
          // only the SPLITTING buckets pay the window re-sort; the rest of
          // the touched set passes through with its checkpointed layout
          // (union of two checkpoint-derived branches — no extra shuffle)
          val splitIds = splits.keySet.toSeq
          val rebucketed = mergedBase
            .filter(col("bucket").isin(splitIds: _*))
            .join(broadcast(planDf), Seq("bucket"), "left")
            .withColumn("_rn", row_number().over(wB))
            .withColumn("_sub", least(
              floor((col("_rn").cast("double") - 1) / col("_pp")).cast("long"),
              col("_m") - 1))
            .select(col("doc_id"), col("i"), col("g"),
              (col("bucket") + col("_sub") * col("_step"))
                .cast("int").as("bucket"))
          mergedBase
            .filter(!col("bucket").isin(splitIds: _*))
            .select("doc_id", "i", "g", "bucket")
            .unionByName(rebucketed)
            .localCheckpoint(false)
        }
      merged.write.partitionBy("bucket").parquet(s"$stage/grams")
      // untouched buckets carry over by hardlink (metadata-only)
      val gramsDir = new java.io.File(s"$cur/grams")
      Option(gramsDir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
        .filterNot(f => touched(f.getName.stripPrefix("bucket=").toInt))
        .foreach { f =>
          VersionedDir.adoptTree(f,
            new java.io.File(s"$stage/grams/${f.getName}"))
        }

      // Edges: recompute for merged buckets, keep the rest; the SAME
      // window pass also yields the within-bucket LCP contributions.
      val (mergedContrib, mergedEdges) = neighborPass(merged)
      val keptEdges = oldEdges.filterNot(e => touched(e.bucket))
      val newEdges = (keptEdges ++ mergedEdges).sortBy(_.bucket)
      writeEdges(newEdges, spark, s"$stage/edges")
      // post-split ids included: a new sub-bucket's boundary with an
      // untouched neighbor is exactly a recomputed pair
      val mergedIds = mergedEdges.map(_.bucket).toSet

      // Contributions: all adjacent pairs within merged buckets, plus the
      // boundary pairs over the UPDATED edge set RESTRICTED to pairs with
      // at least one merged side — which is where an untouched doc's lrs
      // can rise (its bucket-edge row now faces a merged neighbor's new
      // edge row). Untouched–untouched pair LCPs are unchanged from the
      // previous version and already recorded in prior perdoc rows;
      // re-emitting them would be harmless under max-merge but grows the
      // perdoc table faster than the O(touched-buckets) cost model says.
      val contrib = mergedContrib
        .unionAll(boundaryContributions(spark, newEdges,
          (p, q) => mergedIds(p.bucket) || mergedIds(q.bucket)))
        .groupBy("doc_id").agg(max(col("lcp")).as("lcp"))
      // Delta rows: every batch doc (n_tokens known, lrs >= 0) and every
      // OLD doc that gained a contribution (n_tokens null — the base row
      // carries it; the read-side max-merge skips nulls).
      val batchDelta = batchLens
        .join(contrib, Seq("doc_id"), "left")
        .na.fill(0, Seq("lcp"))
        .select(col("doc_id"), col("n_tokens"), col("lcp").cast("int").as("lrs"))
      val oldDelta = contrib
        .join(batchLens.select("doc_id"), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), lit(null).cast("long").as("n_tokens"),
          col("lcp").cast("int").as("lrs"))
      batchDelta.unionByName(oldDelta).write.parquet(s"$stage/perdoc")
      VersionedDir.adoptTree(new java.io.File(s"$cur/perdoc"),
        new java.io.File(s"$stage/perdoc"))
      VersionedDir.adoptTree(new java.io.File(s"$cur/meta"),
        new java.io.File(s"$stage/meta"))
      Some(stage)
    }
  }

  /** The read path of the declared query: per-doc longest-repeat stats,
    * max-merged over the committed version's delta rows — same schema and
    * semantics as [[TextAnalysis.longestRepeatStats]] over the full
    * ingested corpus.
    */
  def lrsStats(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"${VersionedDir.currentDir(path)}/perdoc")
      .groupBy("doc_id")
      .agg(max(col("n_tokens")).as("n_tokens"),
        max(col("lrs")).as("lrs"))

  /** Compaction on the operator's schedule: every append leaves one more
    * perdoc delta file (max-merged at read) and one more part file in each
    * touched bucket — compaction folds the deltas into ONE resolved
    * per-doc table and rewrites each bucket as one sorted file, bounding
    * read-side file counts at O(buckets) again. Equivalent to a rebuild
    * over the ingested corpus without re-tokenizing anything; the fresh
    * index commits into `outPath` through the same VersionedDir CAS.
    *
    * The resolved perdoc table is COALESCED to `targetPerdocFiles` parts:
    * its re-merge would otherwise write at shuffle-partition parallelism,
    * and on a session without AQE small-partition coalescing that can
    * exceed [[maintainIfNeeded]]'s delta-file gate — the loop would then
    * re-fire a full rewrite after every append forever. Three narrow
    * columns per doc, so a single-digit file count is right; raise it
    * (and the gate with it) past ~10⁹ docs.
    */
  def compact(spark: SparkSession, path: String, outPath: String,
      targetPerdocFiles: Int = 8): Unit = {
    // Pin ONE source version for every table — grams, edges AND perdoc. A
    // `lrsStats(spark, path)` call here would re-resolve the head at read
    // time, so an append racing the compaction could hand us v(N+1) perdoc
    // rows beside vN grams: a doc with an lrs row but no substrings.
    // The where-to-pin choice (outside for cross-root snapshots, inside
    // for in-place CAS-rerun safety) is encoded ONCE in
    // VersionedDir.compactInto — every index's compact rides it.
    VersionedDir.compactInto(path, outPath) { (cur, stage) =>
      val meta = spark.read.parquet(s"$cur/meta").head()
      val cap = meta.getInt(0)
      val nBuckets = meta.getInt(1)
      // Re-derive BALANCED boundaries from a fresh range partitioning of
      // the full gram table — NOT the old bucket column: compact re-sorts
      // everything anyway, so recomputing even cuts costs only the range
      // sampling pass, and it is the rebalance point that restores the
      // O(touched-buckets) append contract after skewed appends (splits
      // bound a bucket at SplitFactor × target between compacts; this
      // resets them to ~target and re-centers the id gaps).
      val grams = spark.read.parquet(s"$cur/grams")
        .select(col("doc_id"), col("i"), col("g"))
        .repartitionByRange(nBuckets, col("g"), col("doc_id"), col("i"))
        .sortWithinPartitions(col("g"), col("doc_id"), col("i"))
        .withColumn("bucket", spark_partition_id() * lit(BucketGap))
        .localCheckpoint(false)
      grams.write.partitionBy("bucket").parquet(s"$stage/grams")
      val (_, edges) = neighborPass(grams)
      writeEdges(edges, spark, s"$stage/edges")
      spark.read.parquet(s"$cur/perdoc")
        .groupBy("doc_id")
        .agg(max(col("n_tokens")).as("n_tokens"),
          max(col("lrs")).cast("int").as("lrs"))
        .coalesce(targetPerdocFiles)
        .write.parquet(s"$stage/perdoc")
      writeMeta(spark, s"$stage/meta", cap, nBuckets,
        grams.count() / math.max(nBuckets, 1))
    }
  }

  /** Read-only PROBE: for each query doc, the length (capped at the
    * index's cap) of the longest token run it shares with the INDEXED
    * corpus — substring-granularity decontamination (the eval-overlap
    * check Lee et al. §5 / GPT-3 App. C run with fixed n-grams, here with
    * the exact maximal length). Query docs are NOT ingested and do not see
    * each other: each query position's match is against index rows only.
    *
    * Plan: query grams route to their range buckets (broadcast bounds
    * join), ONLY those buckets are read (partition-pruned); within a
    * bucket, the merged sort order gives each query row its nearest index
    * rows via running last/first-non-null windows (ignoreNulls lag/lead
    * generalization — intervening query rows are skipped, so co-probed
    * docs cannot contaminate each other); a query row at a bucket edge
    * stitches to the NEIGHBOR bucket's edge row from the O(buckets) edges
    * table — which is exactly an index row, untouched buckets never read.
    */
  def probeMaxOverlap(spark: SparkSession, path: String,
      queryDocs: DataFrame, id: Column, text: Column): DataFrame = {
    val cur = VersionedDir.currentDir(path)
    val cap = spark.read.parquet(s"$cur/meta").head().getInt(0)
    val edges = readEdgeRows(spark, s"$cur/edges")
    val qLens = docLens(queryDocs, id, text).localCheckpoint(false)
    // An index legitimately built over an EMPTY corpus has no buckets to
    // route into (routeToBuckets requires edges for an append, where an
    // empty index is a caller error) — every query doc shares nothing with
    // an empty corpus, so the answer is 0-overlap rows, not a crash.
    if (edges.isEmpty)
      return qLens.select(col("doc_id"), col("n_tokens"),
        lit(0).cast("int").as("max_overlap"))
    val routed = routeToBuckets(
      cappedSuffixes(queryDocs, id, text, cap), edges)
      .localCheckpoint(false)
    val touched = routed.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).toSet
    val idxRows =
      if (touched.isEmpty) routed.limit(0).select("doc_id", "i", "g", "bucket")
      else spark.read.parquet(s"$cur/grams")
        .filter(col("bucket").isin(touched.toSeq: _*))
        .select(col("doc_id"), col("i"), col("g"),
          col("bucket").cast("int").as("bucket"))
    val merged = idxRows.withColumn("_q", lit(false))
      .unionByName(routed.select("doc_id", "i", "g", "bucket")
        .withColumn("_q", lit(true)))
    // Nearest index gram before/after each row in bucket sort order. BOTH
    // directions run as GROWING frames (unboundedPreceding, -1) — the
    // "next" side over the REVERSED order — because Spark evaluates
    // growing frames incrementally while an (1, unboundedFollowing) frame
    // recomputes per row: O(rows²) per bucket, measured 10× slower here.
    // `_q` is the FINAL tiebreak (index rows first, ascending): probing a
    // doc that is already ingested under the same id ties an index row on
    // the full (g, doc_id, i) key, and without a deterministic side order
    // the twin could fall outside BOTH growing frames — the exact match
    // (lcp = min length) would be invisible.
    val order = Seq(col("g"), col("doc_id"), col("i"), col("_q"))
    val orderDesc =
      Seq(col("g").desc, col("doc_id").desc, col("i").desc, col("_q").desc)
    val wPrev = Window.partitionBy("bucket").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.partitionBy("bucket").orderBy(orderDesc: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ig = when(!col("_q"), col("g"))
    // per-bucket stitch rows from the index's own edges: the previous
    // bucket's last gram / next bucket's first gram (driver-computed over
    // consecutive EXISTING buckets — bucket ids need not be contiguous)
    val sortedEdges = edges.sortBy(_.bucket)
    val stitchRows = sortedEdges.zipWithIndex.map { case (e, ix) =>
      val prevLast = if (ix == 0) null else sortedEdges(ix - 1).lastG
      val nextFirst = if (ix == sortedEdges.size - 1) null
        else sortedEdges(ix + 1).firstG
      Row(e.bucket, prevLast, nextFirst)
    }
    val stitchDf = spark.createDataFrame(
      java.util.Arrays.asList(stitchRows: _*),
      StructType(Seq(StructField("bucket", IntegerType),
        StructField("_pl", ArrayType(StringType)),
        StructField("_nf", ArrayType(StringType)))))
    val scored = merged
      .withColumn("_pi", last(ig, ignoreNulls = true).over(wPrev))
      .withColumn("_ni", last(ig, ignoreNulls = true).over(wNext))
      .filter(col("_q"))
      .join(broadcast(stitchDf), Seq("bucket"), "left")
      .select(col("doc_id"),
        greatest(
          lcpCol(col("g"), coalesce(col("_pi"), col("_pl"))),
          lcpCol(col("g"), coalesce(col("_ni"), col("_nf")))).as("ov"))
      .groupBy("doc_id").agg(max(col("ov")).as("max_overlap"))
    qLens.join(scored, Seq("doc_id"), "left")
      .na.fill(0, Seq("max_overlap"))
      .select(col("doc_id"), col("n_tokens"),
        col("max_overlap").cast("int").as("max_overlap"))
  }

  /** Operational snapshot of a committed index — the inputs a maintenance
    * scheduler needs, all O(buckets)+O(files) metadata reads (no gram
    * rows touched): bucket count vs the build target, row balance
    * (max/mean over the parquet footers' row counts), perdoc delta file
    * count (grows by ~1 per append until compact folds them), and the
    * committed version number.
    */
  final case class IndexStats(buckets: Int, targetBuckets: Int,
      maxBucketRows: Long, meanBucketRows: Double, perdocFiles: Int,
      version: Long) {
    def imbalance: Double =
      if (meanBucketRows <= 0) 1.0 else maxBucketRows / meanBucketRows
  }

  def stats(spark: SparkSession, path: String): IndexStats = {
    val cur = VersionedDir.currentDir(path)
    val meta = spark.read.parquet(s"$cur/meta").head()
    // per-bucket row counts read directly from parquet FOOTERS via the
    // shared graft.store.ParquetMeta — genuine O(files) driver-side
    // metadata (a Spark groupBy-count would launch a full scan job per
    // call; Spark 4 has no metadata-only rule for grouped counts), so a
    // scheduler can afford stats() per ingest batch
    val conf = spark.sparkContext.hadoopConfiguration
    val perBucket = Option(new java.io.File(s"$cur/grams").listFiles())
      .getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith("bucket="))
      .map(graft.store.ParquetMeta.totalRows(conf, _))
    val perdocFiles =
      graft.store.ParquetMeta.parquetFiles(new java.io.File(s"$cur/perdoc")).size
    IndexStats(
      buckets = perBucket.length,
      targetBuckets = meta.getInt(1),
      maxBucketRows = if (perBucket.isEmpty) 0L else perBucket.max,
      meanBucketRows =
        if (perBucket.isEmpty) 0.0 else perBucket.sum.toDouble / perBucket.length,
      perdocFiles = perdocFiles,
      version = VersionedDir.head(path))
  }

  /** The maintenance policy, closed over [[stats]]: compact when
    * read-side costs have drifted — more than `maxDeltaFiles` perdoc
    * delta files (each append leaves one; every lrsStats read max-merges
    * all of them), bucket imbalance past `maxImbalance` (splits bound a
    * bucket at SplitFactor × target between compacts; compact re-centers
    * everything), or bucket count drifted `maxBucketDrift`× past the
    * build target (each split adds a task to every subsequent append's
    * neighbor pass). Compaction is IN PLACE by default (a new version of
    * the same root, CAS-safe against racing appends), so the index a
    * scheduler keeps appending into is the one that gets healed and the
    * trigger actually resets; pass `outPath` to compact into a separate
    * root instead — but then the CALLER must switch subsequent appends
    * to it, or the source index stays due forever. Returns whether a
    * compact ran — a no-op on a healthy index, so schedulers can call it
    * unconditionally after ingest batches ([[stats]] is O(files) footer
    * reads, no Spark job).
    */
  def maintainIfNeeded(spark: SparkSession, path: String,
      outPath: String = null, maxDeltaFiles: Int = 16,
      maxImbalance: Double = 8.0, maxBucketDrift: Double = 4.0,
      targetPerdocFiles: Int = 8): Boolean = {
    // converging knobs, enforced: compact leaves ≤ targetPerdocFiles
    // perdoc parts, so a delta gate at or below it would re-fire a full
    // rewrite after every append forever
    require(maxDeltaFiles > targetPerdocFiles,
      s"maxDeltaFiles ($maxDeltaFiles) must exceed the post-compact " +
        s"targetPerdocFiles ($targetPerdocFiles)")
    val s = stats(spark, path)
    val due = s.perdocFiles > maxDeltaFiles ||
      s.imbalance > maxImbalance ||
      s.buckets > maxBucketDrift * math.max(s.targetBuckets, 1)
    if (due) compact(spark, path, Option(outPath).getOrElse(path),
      targetPerdocFiles)
    due
  }

  // ── internals ──────────────────────────────────────────────────────────

  private[pipeline] def cappedSuffixes(
      docs: DataFrame, id: Column, text: Column, cap: Int): DataFrame =
    docs.select(id.as("doc_id"), TextAnalysis.tokens(text).as("toks"))
      .select(col("doc_id"),
        explode(sequence(lit(0), size(col("toks")) - 1)).as("i"),
        slice(col("toks"), col("i") + 1, lit(cap)).as("g"))

  private def docLens(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("doc_id"),
      size(TextAnalysis.tokens(text)).cast("long").as("n_tokens"))

  /** One bucket's boundary metadata: its first and last gram rows. */
  private[pipeline] case class Edge(bucket: Int,
      firstG: Seq[String], firstDoc: Long, firstI: Int,
      lastG: Seq[String], lastDoc: Long, lastI: Int)

  /** ONE window pass over the bucketed gram frame serving BOTH outputs a
    * build/append/compact needs: the per-position adjacent-LCP
    * contributions (doc_id, lcp) and the O(buckets) collected edge rows.
    * Running edge collection and LCP as separate windows would shuffle and
    * sort the O(N·cap) frame twice for the same spec — the pass is
    * materialized once and both derive from it.
    */
  private def neighborPass(parted: DataFrame): (DataFrame, Seq[Edge]) = {
    val pidCol = if (parted.columns.contains("_pid")) "_pid" else "bucket"
    val w = Window.partitionBy(pidCol).orderBy(col("g"), col("doc_id"), col("i"))
    val withNbr = parted
      .withColumn("_gn", lead(col("g"), 1).over(w))
      .withColumn("_gp", lag(col("g"), 1).over(w))
      .localCheckpoint(false)
    val contrib = withNbr.select(col("doc_id"),
      greatest(lcpCol(col("g"), col("_gn")), lcpCol(col("g"), col("_gp")))
        .as("lcp"))
    val marked = withNbr
      .filter(col("_gn").isNull || col("_gp").isNull)
      .select(col(pidCol).cast("int").as("b"), col("_gp").isNull.as("_first"),
        col("_gn").isNull.as("_last"),
        col("g"), col("doc_id").cast("long"), col("i").cast("int"))
      .collect()
    val edges = marked.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map {
      case (b, rows) =>
        val first = rows.find(_.getBoolean(1)).get
        val last = rows.find(_.getBoolean(2)).get
        Edge(b, first.getSeq[String](3), first.getLong(4), first.getInt(5),
          last.getSeq[String](3), last.getLong(4), last.getInt(5))
    }
    (contrib, edges)
  }

  private val edgeSchema = StructType(Seq(
    StructField("bucket", IntegerType),
    StructField("first_g", ArrayType(StringType)),
    StructField("first_doc", LongType), StructField("first_i", IntegerType),
    StructField("last_g", ArrayType(StringType)),
    StructField("last_doc", LongType), StructField("last_i", IntegerType)))

  private def writeEdges(edges: Seq[Edge], spark: SparkSession,
      out: String): Unit =
    spark.createDataFrame(
      java.util.Arrays.asList(edges.map(e => Row(e.bucket,
        e.firstG, e.firstDoc, e.firstI, e.lastG, e.lastDoc, e.lastI)): _*),
      edgeSchema).coalesce(1).write.parquet(out)

  private def readEdgeRows(spark: SparkSession, dir: String): Seq[Edge] =
    spark.read.parquet(dir).collect().toSeq
      .map(r => Edge(r.getInt(0), r.getSeq[String](1), r.getLong(2),
        r.getInt(3), r.getSeq[String](4), r.getLong(5), r.getInt(6)))
      .sortBy(_.bucket)

  /** Route batch grams to their range buckets: bucket b owns
    * [first(b), first(next b)), the lowest bucket unbounded below — the
    * invariant range partitioning established at build and appends
    * preserve. O(buckets) bounds broadcast into a literal-array binary
    * search is overkill at this fan-in; a broadcast range join over the
    * O(buckets) bounds frame is the q_range_join shape and keeps array
    * comparison in the engine.
    */
  private def routeToBuckets(batch: DataFrame, edges: Seq[Edge]): DataFrame = {
    require(edges.nonEmpty, "append into an empty index — build first")
    val spark = batch.sparkSession
    val bounds = edges.sortBy(_.bucket)
    val rows = bounds.zipWithIndex.map { case (e, ix) =>
      val lo = if (ix == 0) null else e.firstG
      val hi = if (ix == bounds.size - 1) null
        else bounds(ix + 1).firstG
      Row(e.bucket, lo, hi)
    }
    val boundsDf = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      StructType(Seq(StructField("bucket", IntegerType),
        StructField("lo", ArrayType(StringType)),
        StructField("hi", ArrayType(StringType)))))
    batch.join(broadcast(boundsDf),
      (col("lo").isNull || col("g") >= col("lo")) &&
        (col("hi").isNull || col("g") < col("hi")))
      .select(col("doc_id"), col("i"), col("g"), col("bucket"))
  }

  /** The engine-wide common-prefix expression — ONE definition shared with
    * [[TextAnalysis.longestRepeatStats]], whose semantics this index is
    * pinned against; two private copies could silently diverge.
    */
  private def lcpCol(a: Column, b: Column): Column =
    TextAnalysis.commonPrefixCol(a, b)

  /** Boundary pairs between consecutive buckets, computed at the driver
    * from the O(buckets) edges — each pair contributes its LCP to BOTH edge
    * positions' docs. `pairFilter` lets an append skip pairs whose LCP is
    * provably unchanged (both sides untouched); build/compact keep all.
    */
  private def boundaryContributions(spark: SparkSession, edges: Seq[Edge],
      pairFilter: (Edge, Edge) => Boolean = (_, _) => true): DataFrame = {
    val sorted = edges.sortBy(_.bucket)
    val rows = sorted.zip(sorted.drop(1))
      .filter { case (p, q) => pairFilter(p, q) }
      .flatMap { case (p, q) =>
        val l = commonPrefixLen(p.lastG, q.firstG)
        Seq(Row(p.lastDoc, l), Row(q.firstDoc, l))
      }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("lcp", IntegerType))))
  }

  private def commonPrefixLen(a: Seq[String], b: Seq[String]): Int = {
    var n = 0
    while (n < a.length && n < b.length && a(n) == b(n)) n += 1
    n
  }

  /** One-row meta table: the lifetime-fixed cap, the target bucket count,
    * and the target rows/bucket the append-side split triggers against.
    */
  private def writeMeta(spark: SparkSession, out: String, cap: Int,
      buckets: Int, targetRows: Long): Unit =
    spark.createDataFrame(
      java.util.Arrays.asList(Row(cap, buckets, targetRows)),
      StructType(Seq(StructField("cap", IntegerType),
        StructField("buckets", IntegerType),
        StructField("target_rows", LongType))))
      .coalesce(1).write.parquet(out)
}
