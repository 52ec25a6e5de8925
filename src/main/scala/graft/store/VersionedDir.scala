package graft.store

import java.io.File
import java.nio.file.{Files, StandardCopyOption}

/** Optimistic-CAS versioned directory — the commit discipline shared by
  * EVERY persisted index in this engine (IVF, PQ, IVF-PQ, text inverted
  * index, materialized rollups), extracted from the IVF protocol and
  * modeled on GraphStore's manifest CAS (GraphStore.scala commitBuckets):
  *
  * Layout under an index root `path`:
  *   path/v000003/<whole index state>   (immutable once committed)
  *   path/_HEAD                         (publish pointer, observability)
  *   path/_stage_<uuid>/                (in-flight stages; crash orphans)
  *
  * Every mutation is one optimistic read-stage-commit transaction:
  *  1. PIN base = the head committed version (max vN dir on disk — a vN
  *     dir can only appear via the atomic claim in step 3, so every one
  *     is a complete committed version by construction);
  *  2. STAGE a complete new version under `_stage_<uuid>`: changed files
  *     written by Spark jobs, untouched files hardlink-adopted (O(files)
  *     metadata, zero data I/O — on an object store this is a manifest
  *     file-list re-reference, same cost class);
  *  3. COMMIT = ATOMIC_MOVE the stage to v(base+1). rename(2) onto an
  *     existing NON-empty directory fails, so the slot is an atomic
  *     put-if-absent: of two mutators racing from the same base exactly
  *     one wins, and the loser's whole read-stage body RERUNS against the
  *     winner's state — no silently dropped mutation, even from two
  *     drivers on a shared filesystem where JVM locks don't reach;
  *  4. PUBLISH the `_HEAD` pointer (forward-guarded, informational only —
  *     readers resolve the head DIR, so a stale pointer can't regress
  *     them).
  *
  * Readers never block: resolve [[currentDir]] once and read immutable
  * files — a mutation mid-read is invisible (demoted versions survive for
  * at least [[commitRetainMillis]] plus one commit; older ones are GC'd).
  * A crash at any point leaves the committed version byte-identical and
  * at worst an orphaned stage dir (garbage, never wrong answers). A
  * multi-TABLE index (e.g. the text index's postings + doclen +
  * tombstones) commits all its tables in ONE claim — no torn cross-table
  * state.
  *
  * WHY THIS IS NOT GraphStore's commit path (and must not be folded into
  * it): both enforce the same pin → stage-complete → atomic
  * put-if-absent claim → rerun-on-loss contract (CommitProtocolContractSpec
  * runs one race matrix over both), but the version GRANULARITY differs
  * by design. An index version here is the whole tree — right for
  * indexes, whose mutations (append/delete/compact) logically replace the
  * index and whose untouched files carry by O(files) hardlink adoption.
  * The store's unit of change is one BUCKET of one table: a
  * single-entity upsert stages O(touched buckets) dirs and flips one
  * manifest line (GraphStore.scala commitBuckets); as whole-tree versions
  * it would adopt the entire bucket forest — O(all files) metadata per
  * point-write — and lose per-bucket version history (time travel, diffs,
  * bucket-granular vacuum). Changes to either protocol's guarantees must
  * keep the shared contract spec green for BOTH.
  */
object VersionedDir {

  private val versionRe = "v\\d{6}"

  def versionName(v: Long): String = f"v$v%06d"

  /** Head committed version number (0 if the root is un-versioned or
    * absent). Every `vN` dir IS committed — it can only appear via the
    * atomic claim move in [[mutate]] — so the head dir is the source of
    * truth, not the `_HEAD` pointer (which may trail a writer that
    * crashed between claim and publish).
    */
  def head(path: String): Long =
    Option(new File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.matches(versionRe))
      .map(_.getName.drop(1).toLong)
      .foldLeft(0L)(math.max)

  /** Current committed version dir; legacy un-versioned layouts (no vN
    * dirs) resolve to the root itself, so plain-parquet indexes built
    * before the protocol stay readable.
    */
  def currentDir(path: String): String = {
    val h = head(path)
    if (h > 0) s"$path/${versionName(h)}" else path
  }

  /** A fresh in-flight stage dir under the root (same filesystem as the
    * versions, so the claim move and hardlink adoption stay metadata-only).
    */
  def stageDir(path: String): File =
    new File(path, s"_stage_${java.util.UUID.randomUUID().toString.take(8)}")

  /** A mutation lost the version-slot CAS: its stage is discarded and its
    * whole read-stage body reruns against the new head.
    */
  final class CommitConflict extends RuntimeException(
    "versioned-dir slot already claimed")

  /** Test seam: invoked with the root after a stage is fully built,
    * immediately before the commit claim — lets specs inject a competing
    * commit (CAS-loss path) or a crash (orphaned-stage path)
    * deterministically. No-op in production. This global is the DEFAULT
    * only — prefer [[withPreCommitHook]], which scopes the seam to one
    * root so parallel suites (or two libraries sharing a JVM) cannot see
    * each other's injected races.
    */
  @volatile var preCommitHook: String => Unit = _ => ()

  // Per-root overrides of the two @volatile globals (which remain the
  // defaults): all roots sharing one JVM-wide retention value — and one
  // JVM-wide test hook that specs mutate and restore — meant parallel
  // suite execution, or two libraries in one JVM, could race and silently
  // change GC behavior mid-commit. Keys are canonical paths.
  private val retainOverrides =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private val scopedHooks =
    new java.util.concurrent.ConcurrentHashMap[String, String => Unit]()

  private def canon(path: String): String = new File(path).getCanonicalPath

  /** Run `body` with this ROOT's commit-GC retention overridden; other
    * roots keep [[commitRetainMillis]]. Re-entrant: exit restores the
    * PREVIOUS override (an unconditional remove would let an inner scope
    * silently strip an outer one's window mid-test).
    */
  def withRetention[T](path: String, millis: Long)(body: => T): T = {
    val key = canon(path)
    val prev = retainOverrides.put(key, millis)
    try body finally {
      if (prev == null) retainOverrides.remove(key): Unit
      else retainOverrides.put(key, prev): Unit
    }
  }

  private def retainFor(path: String): Long =
    Option(retainOverrides.get(canon(path)))
      .map(_.longValue).getOrElse(commitRetainMillis)

  /** Run `body` with the pre-commit test seam installed for this ROOT
    * only; other roots keep the (normally no-op) global default.
    * Re-entrant: exit restores the previous hook, not a bare remove.
    */
  def withPreCommitHook[T](path: String, hook: String => Unit)(body: => T): T = {
    val key = canon(path)
    val prev = scopedHooks.put(key, hook)
    try body finally {
      if (prev == null) scopedHooks.remove(key): Unit
      else scopedHooks.put(key, prev): Unit
    }
  }

  private def firePreCommitHook(path: String): Unit =
    Option(scopedHooks.get(canon(path))).getOrElse(preCommitHook)(path)

  // ── exactly-once streaming ingest ───────────────────────────────────────
  //
  // foreachBatch is AT-LEAST-ONCE: after a driver crash the restarted
  // stream re-delivers the whole last-unacknowledged batch, and every CAS
  // index append requires NEW doc ids — a re-delivered batch would ingest
  // its rows twice. The fix is the Delta-lake txn pattern: each committed
  // version carries a per-stream watermark file `_txn_<streamId>` holding
  // the last applied batch id. The watermark is written INTO the staged
  // version, so ONE atomic claim covers data + marker — no crash point can
  // double-apply (marker committed ⇒ data committed) or lose a batch
  // (crash before the claim ⇒ neither landed, the retry re-runs).
  // Underscore names keep the markers invisible to Spark readers,
  // [[ParquetMeta.parquetFiles]], and [[adoptTree]] — [[mutate]] itself is
  // their single owner and carries them forward on EVERY commit (a compact
  // or unrelated append between a batch and a late retry must not erase
  // the watermark).

  private val pendingTxn = new ThreadLocal[(String, String, Long)]

  /** Set only inside [[resetStream]]: tells [[stampTxns]] NOT to carry
    * this (root, streamId)'s watermark marker into the staged version.
    */
  private val pendingReset = new ThreadLocal[(String, String)]

  private def txnName(streamId: String) = s"_txn_$streamId"

  private def requireStreamId(streamId: String): Unit =
    require(streamId.matches("[A-Za-z0-9][A-Za-z0-9_.-]*"),
      s"streamId must be a simple token, got '$streamId'")

  /** The last batch id applied to `path` under `streamId` (None before
    * the first tagged ingest — or if the watermark was minted on a
    * DIFFERENT root: cross-root compacts start fresh by design, the
    * caller repoints the stream checkpoint with the reader).
    */
  def appliedBatch(path: String, streamId: String): Option[Long] = {
    requireStreamId(streamId)
    val f = new File(currentDir(path), txnName(streamId))
    if (f.isFile)
      Some(new String(Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
    else None
  }

  /** Run `ingest` (which must perform its mutations on `path` through
    * [[mutate]] — every index append does) exactly once per
    * (streamId, batchId): a batch id at or below the committed watermark
    * is SKIPPED, otherwise the next commit on `path` from this thread is
    * stamped with it. Batch ids must be monotone per stream — Structured
    * Streaming's foreachBatch contract. Returns whether the body ran.
    *
    * Wrap each foreachBatch body:
    * {{{
    *   .foreachBatch { (batch, id) =>
    *     VersionedDir.ingestOnce(idx, "my_stream", id) {
    *       SuffixIndex.append(batch, col("doc_id"), col("text"), idx)
    *     }: Unit
    *   }
    * }}}
    */
  def ingestOnce(path: String, streamId: String, batchId: Long,
      maxReplayLag: Long = 0)(
      ingest: => Unit): Boolean = {
    requireStreamId(streamId)
    // A legitimate re-delivery sits exactly AT the watermark: the stream
    // checkpoint advances only after foreachBatch returns, and this
    // watermark commits atomically with the batch's data inside it, so
    // the checkpoint can trail the watermark by at most ONE batch — the
    // one Structured Streaming re-delivers on restart. A batch id BELOW
    // the watermark is therefore a broken monotonicity contract — most
    // commonly a deleted/rebuilt stream checkpoint whose batch ids
    // restarted at 0, which a silent skip would turn into unbounded data
    // loss (every batch dropped until the id overtakes the stale
    // watermark). Fail loudly instead; the recovery step after
    // intentionally rebuilding a checkpoint is [[resetStream]]. (A
    // rebuilt checkpoint whose new batch 0 arrives against watermark 0
    // is indistinguishable from the normal retry and still skips — one
    // batch, the irreducible ambiguity of id-only accounting.)
    appliedBatch(path, streamId) match {
      case Some(wm) if batchId <= wm =>
        if (wm - batchId > maxReplayLag) throw new IllegalStateException(
          s"stream '$streamId' delivered batch $batchId against committed " +
            s"watermark $wm on $path — batch ids restarted (rebuilt " +
            "checkpoint?); every batch until the id overtakes the stale " +
            "watermark would be silently dropped. If the checkpoint was " +
            "intentionally rebuilt, call VersionedDir.resetStream(path, " +
            "streamId) once, then restart the stream.")
        false
      case _ =>
        // check-then-act is safe under Structured Streaming's sequential
        // per-stream batch delivery; a crashed attempt either committed the
        // stamp with its data (skip on retry) or committed nothing (re-run)
        pendingTxn.set((canon(path), streamId, batchId))
        try { ingest; true } finally pendingTxn.remove()
    }
  }

  /** Drop `streamId`'s committed watermark — the ONE sanctioned recovery
    * step after a stream checkpoint is intentionally rebuilt (batch ids
    * restart at 0, which [[ingestOnce]] otherwise rejects loudly). Commits
    * a new version identical to the head minus the `_txn_<streamId>`
    * marker; the caller is asserting the restarted stream's batches are
    * NEW data, so exactly-once accounting starts over.
    */
  def resetStream(path: String, streamId: String): Unit = {
    requireStreamId(streamId)
    if (appliedBatch(path, streamId).isEmpty) return
    pendingReset.set((canon(path), streamId))
    try mutate(path) { (_, cur) =>
      val stage = stageDir(path)
      adoptTree(new File(cur), stage)
      // adoptTree skips underscore entries (it must — a legacy root's
      // in-flight _stage_* dirs cannot be walked), but a committed
      // version's underscore DIRECTORIES are data sidecars (the IVF
      // index's _centroids) that the reset must carry; a watermarked
      // root always has head > 0, so `cur` here is never the legacy root
      Option(new File(cur).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("_"))
        .foreach(d => adoptTree(d, new File(stage, d.getName)))
      Some(stage)
    } finally pendingReset.remove()
  }

  /** Carry every committed stream watermark into the stage and stamp a
    * pending [[ingestOnce]] tag — runs on EVERY commit, just before the
    * claim.
    */
  private def stampTxns(path: String, curDir: String, stage: File): Unit = {
    val resetting = Option(pendingReset.get()).filter(_._1 == canon(path))
      .map { case (_, sid) => txnName(sid) }
    Option(new File(curDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith("_txn_") &&
        !resetting.contains(f.getName))
      .foreach(f => Files.copy(f.toPath, new File(stage, f.getName).toPath,
        StandardCopyOption.REPLACE_EXISTING))
    Option(pendingTxn.get()).filter(_._1 == canon(path)).foreach {
      case (_, sid, bid) =>
        Files.write(new File(stage, txnName(sid)).toPath,
          bid.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
    }
  }

  /** The optimistic transaction loop: pin the head version, let
    * `body(base, currentDir)` build a complete staged version (or None
    * for a no-op), claim slot v(base+1) by atomic rename; a lost claim
    * discards the stage and reruns the body against the new head.
    */
  def mutate(path: String)(body: (Long, String) => Option[File]): Unit = {
    Files.createDirectories(new File(path).toPath)
    var done = false
    while (!done) {
      val base = head(path)
      val curDir = if (base > 0) s"$path/${versionName(base)}" else path
      body(base, curDir) match {
        case None => done = true
        case Some(stage) =>
          stampTxns(path, curDir, stage)
          // the marker makes the claim target non-empty even for a
          // degenerate empty version: rename(2) silently REPLACES an empty
          // dest dir, which would hide a lost race
          Files.write(new File(stage, "_COMMIT").toPath, Array.empty[Byte])
          firePreCommitHook(path)
          val destName = versionName(base + 1)
          val dest = new File(path, destName)
          try {
            Files.move(stage.toPath, dest.toPath, StandardCopyOption.ATOMIC_MOVE)
            // committed & durable. Publish the pointer only while this is
            // still the head — a slower writer must not regress it (the
            // guard is best-effort; correctness never depends on the
            // pointer at all)
            if (head(path) == base + 1) publishHead(path, destName)
            gcVersions(path, Set(destName, versionName(base)))
            done = true
          } catch {
            case _: java.nio.file.FileSystemException if dest.exists() =>
              rmTree(stage) // lost the CAS — discard, re-pin, rerun
          }
      }
    }
  }

  /** The engine-wide COMPACT discipline, encoded once (SuffixIndex /
    * SearchIndex / IVF / Rollup all ride it): rewrite the index at `path`
    * into `outPath`, where the body receives the resolved SOURCE version
    * dir and a fresh stage to fill. The safety-critical part is WHERE the
    * source is pinned: a cross-root compact pins OUTSIDE the transaction
    * (snapshot semantics — the output compacts the version that existed
    * when the call started), but an IN-PLACE compact (`outPath == path`)
    * must pin INSIDE it, so a CAS rerun against a racing append re-pins
    * the append's head instead of silently compacting it away. Callers
    * never re-implement that choice.
    */
  def compactInto(path: String, outPath: String)(
      body: (String, File) => Unit): Unit = {
    val inPlace =
      new File(outPath).getCanonicalPath == new File(path).getCanonicalPath
    val pinned = if (inPlace) null else currentDir(path)
    mutate(outPath) { (_, curOut) =>
      val cur = if (inPlace) curOut else pinned
      val stage = stageDir(outPath)
      body(cur, stage)
      Some(stage)
    }
  }

  /** Hardlink one data file into a stage, falling back to a byte copy on
    * filesystems without links (UnsupportedOperationException) AND on
    * cross-device links (EXDEV surfaces as a plain FileSystemException —
    * e.g. stage and source on different mounts). An already-present dest
    * of the same name is the same writer-UUID part file — skip.
    */
  def linkOrCopy(from: File, to: File): Unit =
    if (!to.exists()) {
      try Files.createLink(to.toPath, from.toPath): Unit
      catch {
        case _: UnsupportedOperationException |
             _: java.nio.file.FileSystemException =>
          if (to.exists()) () // racing our own rerun: same bytes
          else Files.copy(from.toPath, to.toPath): Unit
      }
    }

  /** Carry one untouched directory SUBTREE into a stage by hardlinking its
    * data files (metadata-only). Underscore/dot entries are skipped at
    * EVERY level — sidecar files (_SUCCESS, the _COMMIT marker) because
    * each version writes its own, and underscore DIRECTORIES because when
    * the source is a legacy un-versioned root, its in-flight `_stage_*`
    * dirs (including the very stage being built) must not be walked.
    */
  def adoptTree(src: File, dest: File): Unit = {
    Files.createDirectories(dest.toPath)
    Option(src.listFiles()).getOrElse(Array.empty)
      .filterNot(f => f.getName.startsWith("_") || f.getName.startsWith("."))
      .foreach { f =>
        if (f.isDirectory) adoptTree(f, new File(dest, f.getName))
        else linkOrCopy(f, new File(dest, f.getName))
      }
  }

  /** Reader grace period: commit-time GC never deletes a version demoted
    * from head more recently than this, so a long-running probe that
    * resolved [[currentDir]] survives ANY number of subsequent commits
    * inside the window — not just one. Under rapid appends (the
    * streaming-ingest pattern: foreachBatch → append every few seconds)
    * head−2 was demoted seconds ago when the third commit lands; the
    * pre-round-13 un-aged GC there deleted files out from under a probe
    * spanning two commits. Versions that outlive the window are swept by
    * the NEXT commit or by [[vacuum]]. This global is the DEFAULT for all
    * roots; specs (and operators wanting a different window for one
    * index) scope an override with [[withRetention]].
    */
  @volatile var commitRetainMillis: Long = 15L * 60 * 1000

  /** vK's demotion time = the commit time of its oldest surviving
    * SUCCESSOR version ≈ that dir's mtime (staging writes touch the stage
    * dir's mtime up through the `_COMMIT` marker written immediately
    * before the claim move, and the move preserves it). Crash-safe by
    * construction — the successor exists iff the demotion happened, so no
    * commit-time stamp is needed and a writer dying mid-commit can't
    * leave a long-lived ex-head looking old. If an intermediate version
    * was already GC'd, the next survivor's (later) commit time stands in
    * — conservative, never early. No successor ⇒ vK is the head ⇒ always
    * kept.
    */
  private def demotedAt(sortedVersions: Seq[File], idx: Int, now: Long): Long =
    sortedVersions.drop(idx + 1).headOption.map(_.lastModified()).getOrElse(now)

  /** Drop version dirs other than the just-committed one, its predecessor
    * (kept for in-flight readers and version diffs), and anything demoted
    * from head less than [[commitRetainMillis]] ago ([[demotedAt]]; a
    * reader can only newly pin a version while it is the head, so
    * age-since-demotion lower-bounds every pinned reader's running time).
    * Orphaned `_stage_*` dirs are NOT swept here: a concurrent writer's
    * live stage is indistinguishable from a crash orphan at commit time,
    * so those are left for [[vacuum]], which separates them by age
    * (unreferenced garbage, never wrong answers, until then).
    */
  private def gcVersions(path: String, keep: Set[String]): Unit = {
    val now = System.currentTimeMillis()
    val vs = Option(new File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.matches(versionRe))
      .sortBy(_.getName).toSeq
    val retain = retainFor(path)
    for (i <- vs.indices; f = vs(i) if !keep(f.getName))
      if (now - demotedAt(vs, i, now) >= retain) rmTree(f)
  }

  /** The offline vacuum the protocol docs point at: sweep (a) orphaned
    * `_stage_*` dirs untouched for `olderThanMillis` (a LIVE writer's
    * stage is younger than any sane TTL — Spark touches it while writing;
    * a crash or lost-race orphan only ages), and (b) committed versions
    * BELOW head−1 that were demoted at least `olderThanMillis` ago
    * (normally GC'd at commit time once the [[commitRetainMillis]] grace
    * period lapses; they linger only inside that period or if a writer
    * crashed between its claim and its GC — the age gate keeps vacuum
    * from undercutting the commit-GC's reader guarantee). Never touches
    * the head, its predecessor, or any fresh stage — so it is safe to run
    * beside live readers and writers. Returns the deleted dir names.
    */
  def vacuum(path: String, olderThanMillis: Long = 24L * 3600 * 1000): Seq[String] = {
    val now = System.currentTimeMillis()
    val h = head(path)
    val keep = Set(versionName(h), versionName(math.max(h - 1, 0)))
    val entries = Option(new File(path).listFiles()).getOrElse(Array.empty)
    val stageVictims = entries.filter(f => f.isDirectory &&
      f.getName.startsWith("_stage_") &&
      now - f.lastModified() >= olderThanMillis)
    val vs = entries.filter(f => f.isDirectory && f.getName.matches(versionRe))
      .sortBy(_.getName).toSeq
    val versionVictims = vs.indices.collect {
      case i if !keep(vs(i).getName) &&
        now - demotedAt(vs, i, now) >= olderThanMillis => vs(i)
    }
    val victims = stageVictims ++ versionVictims
    victims.foreach(rmTree)
    victims.map(_.getName).toSeq.sorted
  }

  private def publishHead(path: String, version: String): Unit = {
    val tmp = new File(path,
      s"_HEAD.tmp${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(tmp.toPath,
      version.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.move(tmp.toPath, new File(path, "_HEAD").toPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING): Unit
  }

  def rmTree(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
    f.delete(): Unit
  }
}
