package graft.store

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFns
import graft.functions.TextFns._
import graft.operators.GraphOps

/** API-level types of the reference (/root/reference/src/types/index.ts:1-11). */
case class Entity(name: String, entityType: String, observations: Seq[String])
case class Relation(from: String, to: String, relationType: String)

/** Write path (SURVEY.md §2.2 W1–W7) over immutable parquet: every mutation is
  * an anti-join + union rewrite committed atomically by writing a new
  * versioned directory and flipping a pointer file (temp-write + atomic
  * rename). Per-row interactive transactionality is out of scope for the
  * analytics engine (SURVEY §2.2 W3) — a batch is the atomic unit, which is
  * also the only model that survives 1000 executors writing one table.
  *
  * Reference behavior: /root/reference/src/db/client.ts:58-186 (create),
  * :298-338 (relations), :340-380 (cascade delete), :382-405 (conditional
  * delete), :481-543 (DDL bootstrap).
  */
class GraphStore(spark: SparkSession, root: String) {
  import GraphStore._

  /** W7 DDL bootstrap — idempotent like the reference's CREATE IF NOT EXISTS
    * (client.ts:481-543). Indexes are moot: parquet min/max stats + predicate
    * pushdown serve the same point lookups.
    */
  def initialize(): Unit = withWriteLock {
    val missing = Seq("entities" -> EntitiesSchema,
        "observations" -> ObservationsSchema,
        "relations" -> RelationsSchema)
      .filter { case (t, _) => currentVersion(t).isEmpty }
      .map { case (t, schema) =>
        t -> spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      }
    if (missing.nonEmpty) commitTables(missing.toMap)
  }

  def entities: DataFrame = readTable("entities", EntitiesSchema)
  def observations: DataFrame = readTable("observations", ObservationsSchema)
  def relations: DataFrame = readTable("relations", RelationsSchema)

  // ── time travel over the versioned store ────────────────────────────────

  /** COMMITTED versions of `table` still on disk, ascending (older ones
    * disappear as `vacuum` retention passes). Directories ABOVE the
    * manifest's current version are staged/orphaned writes — commitTables
    * stages the new directory before flipping the manifest — and are never
    * listed: they may be half-written.
    */
  def tableVersions(table: String): Seq[Long] = {
    schemaFor(table) // validates the table name
    val current = currentVersion(table).map(_.drop(1).toLong).getOrElse(-1L)
    versionsOnDisk(table).filter(_ <= current)
  }

  /** Snapshot read of a table at an explicit COMMITTED version — every
    * commit leaves the previous version's files untouched, so any
    * un-vacuumed committed version is a consistent point-in-time read (per
    * table; cross-table consistency is what the CURRENT manifest provides).
    */
  def readTableVersion(table: String, version: Long): DataFrame = {
    require(tableVersions(table).contains(version),
      s"Version v$version of $table is not a committed on-disk version " +
        "(vacuumed, never written, or an in-flight commit)")
    spark.read.schema(schemaFor(table))
      .parquet(tableDir(table).resolve("v" + version).toString)
  }

  /** Snapshot diff between two committed versions of `table`: which keys
    * were added, removed, or changed — the change-data-feed a downstream
    * consumer needs to incrementally react to writes, derived purely from
    * the immutable version directories (no write-path hooks, no log).
    *
    * One full-outer join keyed on the table's natural key (entities: name;
    * observations: id — both unique per snapshot by construction); "changed"
    * is a null-safe struct inequality over the remaining columns, evaluated
    * inside the join's codegen stage. Scale shape: keyed shuffle of the two
    * snapshots, no driver materialization — diffing two 10 TB snapshots is
    * one sort-merge join.
    */
  def diffVersions(table: String, fromVersion: Long, toVersion: Long,
      keyOverride: Seq[String] = Nil): DataFrame = {
    val keys = if (keyOverride.nonEmpty) keyOverride else table match {
      case "entities" => Seq("name")
      case "observations" => Seq("id")
      // parallel relations are exact-duplicate-free per (source, target,
      // type) only if callers keep them so; pass keyOverride otherwise
      case "relations" => Seq("source", "target", "relation_type")
      case other => throw new IllegalArgumentException(s"Unknown table: $other")
    }
    val oldT = readTableVersion(table, fromVersion)
    val newT = readTableVersion(table, toVersion)
    val rest = oldT.columns.filterNot(keys.contains).toSeq
    def packed(df: DataFrame, payload: String) = df.select(
      struct(keys.map(col): _*).as("k"),
      struct((lit(1).as("present") +: rest.map(col)): _*).as(payload))
    packed(oldT, "o").join(packed(newT, "n"), Seq("k"), "full_outer")
      .withColumn("change",
        when(col("o").isNull, lit("added"))
          .when(col("n").isNull, lit("removed"))
          .when(!(col("o") <=> col("n")), lit("changed")))
      .filter(col("change").isNotNull)
      .select(keys.map(kc => col("k." + kc).as(kc)) :+ col("change"): _*)
  }

  private def schemaFor(table: String): StructType = table match {
    case "entities" => EntitiesSchema
    case "observations" => ObservationsSchema
    case "relations" => RelationsSchema
    case other => throw new IllegalArgumentException(s"Unknown table: $other")
  }

  // ── reads (facade over GraphOps, mirroring the six MCP tools) ───────────

  def getEntity(name: String): Entity = {
    val rows = GraphOps.getEntity(entities, name).collect()
    if (rows.isEmpty) throw new NoSuchElementException(s"Entity not found: $name")
    val obs = GraphOps.observationsFor(observations, name)
      .orderBy("content").collect().map(_.getString(0)).toSeq
    Entity(rows.head.getString(0), rows.head.getString(1), obs)
  }

  def searchNodes(query: String, limit: Int = DefaultSearchResults): (Seq[Entity], Seq[Relation]) = {
    TextFns.validateQuery(query) // non-empty + ≤512 chars (index.ts:40)
    val hits = GraphOps.searchEntities(entities, observations, query, limit)
    graphResult(hits)
  }

  def readGraph(): (Seq[Entity], Seq[Relation]) =
    graphResult(GraphOps.recentEntities(entities, 10))

  /** Execute the (already top-k-limited, relevance/recency-ordered) hit plan
    * ONCE, then hydrate and fetch edges from the collected names — the
    * reference returns entities in ranked order (client.ts:241-246) and
    * re-running the full search scan for the edge lookup would double its
    * cost.
    */
  private def graphResult(hits: DataFrame): (Seq[Entity], Seq[Relation]) = {
    val ranked = hits.select("name", "entity_type").collect()
      .map(r => (r.getString(0), r.getString(1)))
    if (ranked.isEmpty) return (Nil, Nil) // client.ts:460-462 short-circuit
    val names = ranked.map(_._1)
    import spark.implicits._
    val obsByName = observations
      .filter(col("entity_name").isin(names.toIndexedSeq: _*))
      .select("entity_name", "content").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (k, vs) =>
        // codepoint order (== Spark sort_array's UTF-8 byte order), not JVM
        // String UTF-16 order — they differ for supplementary-plane chars
        k -> vs.map(_._2).sorted(GraphStore.CodepointOrdering).toSeq
      }
    val hydrated = ranked.map { case (n, t) =>
      Entity(n, t, obsByName.getOrElse(n, Nil))
    }
    val edges = GraphOps.relationsForEntities(relations, names.toSeq.toDF("name"))
      .orderBy("from_entity", "to_entity", "relation_type").collect()
      .map(r => Relation(r.getString(0), r.getString(1), r.getString(2)))
    (hydrated.toSeq, edges.toSeq)
  }

  /** Register the three graph tables as temp views so the full Spark SQL
    * surface (plus `cosine_sim` etc. when GraftExtensions is installed)
    * works over the store: `SELECT ... FROM graft_entities e JOIN ...`.
    */
  def createOrReplaceViews(prefix: String = "graft_"): Unit = {
    entities.createOrReplaceTempView(s"${prefix}entities")
    observations.createOrReplaceTempView(s"${prefix}observations")
    relations.createOrReplaceTempView(s"${prefix}relations")
  }

  // ── writes ──────────────────────────────────────────────────────────────

  /** W1+W2+W3 create/upsert entities with replace-children semantics
    * (client.ts:58-186): UPDATE keeps the original created_at and replaces
    * entity_type; observations are fully replaced.
    */
  def createEntities(batch: Seq[Entity]): Unit = withWriteLock {
    val cleaned = batch.map { e =>
      val name = clean(e.name, MaxNameLength)
      require(name.nonEmpty, "Entity name cannot be empty")
      val tpe = clean(e.entityType, MaxEntityTypeLength)
      require(e.observations.nonEmpty, s"Entity $name must have at least one observation")
      require(e.observations.size <= MaxObservationsPerEntity,
        s"Entity $name exceeds $MaxObservationsPerEntity observations")
      val obs = e.observations.map { o =>
        val c = clean(o, MaxObservationLength)
        require(c.nonEmpty, s"Entity $name has an empty observation")
        c
      }
      Entity(name, tpe, obs)
    }
    require(cleaned.map(_.name).distinct.size == cleaned.size,
      "Duplicate entity names in one batch")

    import spark.implicits._
    val incoming = cleaned.map(e => (e.name, e.entityType))
      .toDF("name", "in_type")
    val now = current_timestamp()

    val existing = entities
    val kept = existing.join(incoming, Seq("name"), "left_anti")
    val updated = existing.join(incoming, Seq("name"))
      .select(col("name"), col("in_type").as("entity_type"), col("created_at"))
    val inserted = incoming.join(existing, Seq("name"), "left_anti")
      .select(col("name"), col("in_type").as("entity_type"), now.as("created_at"))

    val newObs = cleaned.flatMap(e => e.observations.map(o => (e.name, o)))
      .toDF("entity_name", "content")
    val names = cleaned.map(_.name)
    val survivors = observations.filter(!col("entity_name").isin(names: _*))
    val base = nextIdBase("observations", observations)
    val fresh = newObs
      .withColumn("id", monotonically_increasing_id() + lit(base + 1))
      .withColumn("created_at", now)
    // one manifest flip covers both tables — W3's "per-entity transaction"
    // becomes per-batch cross-table atomicity
    commitTables(Map(
      "entities" ->
        alignTo(EntitiesSchema, kept.unionByName(updated).unionByName(inserted)),
      "observations" ->
        alignTo(ObservationsSchema, survivors.unionByName(alignTo(ObservationsSchema, fresh)))),
      Map("observations" -> maxIdOf(fresh, base)))
  }

  /** Bulk DataFrame upsert — the 100 TB ingest path (the Seq-based API above
    * mirrors the reference's MCP surface; a cluster-scale writer hands the
    * store a DataFrame instead). Input columns: `name`, `entity_type`,
    * `observations: array<string>`. Sanitize/truncate/validate run IN-PLAN
    * (TextFns column pipelines, codegen'd); invalid rows are dropped rather
    * than failing the batch (bad-row quarantine is the caller's concern at
    * scale). Upsert semantics match createEntities: replace entity_type,
    * keep created_at, replace children.
    */
  def upsertEntitiesDf(batch: DataFrame): Unit = withWriteLock {
    // dedup by name must be DETERMINISTIC: dropDuplicates keeps an arbitrary
    // row per key, and `cleaned` is evaluated independently by the entities
    // and observations plans below — a nondeterministic pick could commit
    // the type of one input row with the observations of another
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("name").orderBy(col("in_type"), col("obs"))
    val cleaned = batch.select(
        cleanName(col("name")).as("name"),
        cleanEntityType(col("entity_type")).as("in_type"),
        filter(
          transform(col("observations"), o => cleanObservation(o)),
          o => isNonBlank(o)).as("obs"))
      .filter(isNonBlank(col("name")) &&
        size(col("obs")).between(1, MaxObservationsPerEntity))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
      // materialize ONCE: the entities and observations plans below each
      // re-evaluate their inputs, and a nondeterministic source (limit
      // without order, sampling) could otherwise commit entities whose
      // observations were never written
      .localCheckpoint(true)
    val now = current_timestamp()

    val existing = entities
    val kept = existing.join(cleaned, Seq("name"), "left_anti")
    val updated = existing.join(cleaned.select("name", "in_type"), Seq("name"))
      .select(col("name"), col("in_type").as("entity_type"), col("created_at"))
    val inserted = cleaned.join(existing, Seq("name"), "left_anti")
      .select(col("name"), col("in_type").as("entity_type"), now.as("created_at"))

    val updNames = cleaned.select(col("name").as("_upd_name"))
    val survivors = observations.join(updNames,
      col("entity_name") === col("_upd_name"), "left_anti")
    val base = nextIdBase("observations", observations)
    val fresh = cleaned
      .select(col("name").as("entity_name"), explode(col("obs")).as("content"))
      .withColumn("id", monotonically_increasing_id() + lit(base + 1))
      .withColumn("created_at", now)
    // maxIdOf is O(batch) — `fresh` derives from the localCheckpointed
    // `cleaned`, so re-evaluating it for the max is cheap AND deterministic
    commitTables(Map(
      "entities" ->
        alignTo(EntitiesSchema, kept.unionByName(updated).unionByName(inserted)),
      "observations" ->
        alignTo(ObservationsSchema, survivors.unionByName(alignTo(ObservationsSchema, fresh)))),
      Map("observations" -> maxIdOf(fresh, base)))
  }

  /** Structured-Streaming ingest: upsert each micro-batch into the store
    * (exactly-once per the sink's pointer-flip commit; replays of a batch
    * converge because upsert is idempotent for identical input).
    */
  def streamingUpsertSink(entityStream: DataFrame): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    entityStream.writeStream.foreachBatch {
      (batch: DataFrame, _: Long) => upsertEntitiesDf(batch)
    }

  /** W4 batch edge insert (client.ts:298-338) — plain append, parallel edges
    * allowed (the reference never dedups relations).
    */
  def createRelations(batch: Seq[Relation]): Unit = withWriteLock {
    val cleaned = batch.map { r =>
      val from = clean(r.from, MaxNameLength)
      val to = clean(r.to, MaxNameLength)
      val tpe = clean(r.relationType, MaxRelationTypeLength)
      require(from.nonEmpty && to.nonEmpty && tpe.nonEmpty,
        "Relation source/target/type cannot be empty")
      Relation(from, to, tpe)
    }
    import spark.implicits._
    val base = nextIdBase("relations", relations)
    val fresh = cleaned.map(r => (r.from, r.to, r.relationType))
      .toDF("source", "target", "relation_type")
      .withColumn("id", monotonically_increasing_id() + lit(base + 1))
      .withColumn("created_at", current_timestamp())
    commitTables(Map("relations" ->
      alignTo(RelationsSchema, relations.unionByName(alignTo(RelationsSchema, fresh)))),
      Map("relations" -> maxIdOf(fresh, base)))
  }

  /** W5 cascading delete (client.ts:340-380): observations by entity_name,
    * relations touching either side, then the entity row — one logical batch.
    */
  def deleteEntity(name: String): Unit = withWriteLock {
    if (!GraphOps.entityExists(entities, name))
      throw new NoSuchElementException(s"Entity not found: $name")
    // one manifest flip: the cascade is all-or-nothing (client.ts:352-372's
    // batch semantics) — a crash can never leave dangling edges/observations
    commitTables(Map(
      "observations" -> observations.filter(col("entity_name") =!= name),
      "relations" ->
        relations.filter(!(col("source") === name || col("target") === name)),
      "entities" -> entities.filter(col("name") =!= name)))
  }

  /** W6 conditional delete with affected-count check (client.ts:382-405). */
  def deleteRelation(from: String, to: String, relationType: String): Unit = withWriteLock {
    val cond = col("source") === from && col("target") === to &&
      col("relation_type") === relationType
    val n = relations.filter(cond).limit(1).count()
    if (n == 0) throw new NoSuchElementException(
      s"Relation not found: $from -$relationType-> $to")
    commitTable("relations", relations.filter(!cond))
  }

  // ── storage: versioned parquet with one atomic manifest flip ────────────

  /** Mutations are read-modify-write over the current snapshot, so
    * concurrent writers would lose updates; an advisory file lock plus a
    * per-store JVM mutex serializes them (JVM file locks are held per-JVM —
    * without the mutex a second in-process writer gets
    * OverlappingFileLockException instead of waiting). Readers never block:
    * they resolve the manifest once and read immutable files. A
    * multi-driver cloud deployment would swap this for the
    * metastore/catalog commit protocol.
    */
  // depth lives in the COMPANION keyed by normalized root (like jvmLock):
  // two GraphStore instances over the same root must share one reentrancy
  // counter, or a nested write through the second instance would attempt a
  // second FileChannel.lock() and throw OverlappingFileLockException
  private def lockDepth = GraphStore.lockDepthFor(root)

  def withWriteLock[T](body: => T): T =
    GraphStore.jvmLock(root).synchronized {
      // reentrant: the monitor above is, but a second FileChannel.lock() on
      // the same file in one JVM throws OverlappingFileLockException — only
      // the outermost frame takes the file lock
      if (lockDepth.get > 0) {
        lockDepth.set(lockDepth.get + 1)
        try body finally lockDepth.set(lockDepth.get - 1)
      } else {
        Files.createDirectories(Paths.get(root))
        val ch = java.nio.channels.FileChannel.open(
          Paths.get(root, "_LOCK"),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        val lock = ch.lock()
        lockDepth.set(1)
        try body
        finally { lockDepth.set(0); lock.release(); ch.close() }
      }
    }

  private def tableDir(t: String) = Paths.get(root, t)
  private def manifestFile = Paths.get(root, "_MANIFEST")

  /** All `v<N>` directories present for a table (committed or staged),
    * ascending — the single source for version-directory listing/parsing.
    */
  private def versionsOnDisk(t: String): Seq[Long] =
    Option(tableDir(t).toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .map(_.getName.drop(1).toLong).sorted.toSeq

  /** Snapshot manifest: one file mapping every table to its version. A
    * multi-table mutation stages all new version directories, then flips
    * THIS one pointer — cross-table atomicity (a cascade delete is all-or-
    * nothing), not just per-table.
    */
  private def readManifest(): Option[Map[String, String]] =
    if (Files.exists(manifestFile))
      Some(new String(Files.readAllBytes(manifestFile), StandardCharsets.UTF_8)
        .split("\n").filter(_.contains("=")).map { l =>
          val Array(k, v) = l.trim.split("=", 2); k -> v
        }.toMap)
    else None

  private def currentVersion(t: String): Option[String] =
    readManifest().flatMap(_.get(t))

  private def readTable(t: String, schema: StructType): DataFrame =
    currentVersion(t) match {
      case Some(v) => spark.read.schema(schema).parquet(tableDir(t).resolve(v).toString)
      case None => throw new IllegalStateException(
        s"Table $t not initialized — call initialize() first")
    }

  /** Stage new versions for every table in `updates`, then atomically flip
    * the manifest (write temp + ATOMIC_MOVE). Readers see the whole old or
    * whole new snapshot, never a mix; a crash mid-stage leaves only orphan
    * directories the next vacuum removes.
    */
  private def commitTables(updates: Map[String, DataFrame],
      maxIds: Map[String, Long] = Map.empty): Unit = {
    val manifest = readManifest().getOrElse(Map.empty)
    val staged = updates.map { case (t, df) =>
      Files.createDirectories(tableDir(t))
      val next = "v" + (versionsOnDisk(t).lastOption.getOrElse(0L) + 1)
      df.write.mode("overwrite").parquet(tableDir(t).resolve(next).toString)
      t -> next
    }
    val merged = manifest ++ staged ++
      maxIds.map { case (t, v) => s"maxid.$t" -> v.toString }
    val tmp = Paths.get(root, "_MANIFEST.tmp")
    Files.write(tmp, merged.toSeq.sorted.map { case (k, v) => s"$k=$v" }
      .mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def commitTable(t: String, df: DataFrame): Unit =
    commitTables(Map(t -> df))

  /** Compaction: rewrite a table's current version into `numFiles` files.
    * Every rewrite emits shuffle-partition-many files; at scale the
    * small-file accumulation degrades scan planning — compact periodically
    * (then `vacuum` once reader horizons pass).
    */
  def compact(table: String, numFiles: Int = 1): Unit = withWriteLock {
    commitTable(table, readTable(table, schemaFor(table)).coalesce(numFiles))
  }

  /** Retention: drop old version directories, always keeping the version the
    * manifest references (plus the `keepVersions - 1` most recent others
    * below it for in-flight readers). Runs under the write lock, so orphans
    * above the current version — from a crashed stage — are safe to delete
    * too: no commit is in progress and the manifest never pointed at them.
    */
  def vacuum(keepVersions: Int = 1): Unit = withWriteLock {
    require(keepVersions >= 1)
    val manifest = readManifest().getOrElse(Map.empty)
    Seq("entities", "observations", "relations").foreach { t =>
      val current = manifest.get(t).map(_.drop(1).toLong)
      if (current.isDefined) {
        val versions = versionsOnDisk(t)
        val keepBelow = versions
          .filter(_ <= current.get).reverse.take(keepVersions).toSet
        versions.filterNot(keepBelow).foreach { old =>
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete()
          }
          rm(tableDir(t).resolve("v" + old).toFile)
        }
      }
    }
  }

  /** Next-id base: read the id high-water mark from the manifest (written by
    * every id-allocating commit below) instead of full-scanning the table —
    * the round-1 write path ran a per-write O(table) max(id) job, a scan
    * that at 100 TB dwarfs the write itself. One-scan fallback migrates
    * stores created before maxid tracking (persisted on their next commit).
    * Deletes never lower the mark — it is a monotone upper bound, which is
    * all id-uniqueness needs.
    */
  private def nextIdBase(t: String, df: => DataFrame): Long =
    readManifest().flatMap(_.get(s"maxid.$t")).map(_.toLong)
      .getOrElse(maxId(df))

  /** Max id in a batch-sized DataFrame (the id-carrying `fresh` rows), or
    * `fallback` when the batch is empty — O(batch), never O(table).
    */
  private def maxIdOf(df: DataFrame, fallback: Long): Long =
    df.agg(coalesce(max("id"), lit(fallback))).head().getLong(0)

  private def maxId(df: DataFrame): Long =
    df.agg(coalesce(max("id"), lit(0L))).head().getLong(0)

  /** Codepoint-counting truncation, matching `TextFns.truncate` (SURVEY §2.3
    * S2 pins codepoints over the reference's UTF-16 slice).
    */
  private def clean(s: String, max: Int): String = {
    val sanitized = TextFns.sanitizeInputScala(if (s == null) "" else s)
    if (sanitized.codePointCount(0, sanitized.length) <= max) sanitized
    else sanitized.substring(0, sanitized.offsetByCodePoints(0, max))
  }

  private def alignTo(schema: StructType, df: DataFrame): DataFrame =
    df.select(schema.fields.toIndexedSeq.map(f => col(f.name).cast(f.dataType)): _*)
}

object GraphStore {
  /** Per-store-root JVM mutex backing withWriteLock. This map is NOT the
    * cross-process exclusion — that is the `FileChannel.lock` on
    * `root/_LOCK` taken by the outermost withWriteLock frame, which makes
    * a second *process* writing the same store root block until the first
    * commit's manifest flip lands (GraphStoreSpec pins this with a real
    * subprocess). The JVM mutex only queues in-process writers ahead of
    * the file lock, because JVM file locks are held per-process and a
    * second in-process acquisition would throw
    * OverlappingFileLockException instead of waiting.
    */
  private val jvmLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private[store] def jvmLock(root: String): Object =
    jvmLocks.computeIfAbsent(
      // normalize so different spellings of the same dir share one mutex
      java.nio.file.Paths.get(root).toAbsolutePath.normalize.toString,
      _ => new Object)

  /** Per-root reentrancy depth for withWriteLock — shared across instances
    * of the same root for the same reason jvmLock is.
    */
  private val lockDepths =
    new java.util.concurrent.ConcurrentHashMap[String, ThreadLocal[Integer]]()
  private[store] def lockDepthFor(root: String): ThreadLocal[Integer] =
    lockDepths.computeIfAbsent(
      java.nio.file.Paths.get(root).toAbsolutePath.normalize.toString,
      _ => new ThreadLocal[Integer] { override def initialValue = 0 })

  /** Codepoint-lexicographic string ordering — identical to Spark's
    * UTF8String (UTF-8 byte) ordering, unlike java.lang.String's UTF-16
    * code-unit ordering which ranks supplementary-plane chars differently.
    */
  val CodepointOrdering: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int = {
      val x = a.codePoints().toArray
      val y = b.codePoints().toArray
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n && x(i) == y(i)) i += 1
      if (i < n) Integer.compare(x(i), y(i))
      else Integer.compare(x.length, y.length)
    }
  }

  /** Fixed schemas — the reference's DDL (client.ts:484-512) as explicit
    * StructTypes, never inferred (SURVEY §1.3).
    */
  val EntitiesSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("entity_type", StringType, nullable = false),
    StructField("created_at", TimestampType, nullable = true)))

  val ObservationsSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("entity_name", StringType, nullable = false),
    StructField("content", StringType, nullable = false),
    StructField("created_at", TimestampType, nullable = true)))

  val RelationsSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("target", StringType, nullable = false),
    StructField("relation_type", StringType, nullable = false),
    StructField("created_at", TimestampType, nullable = true)))
}
