package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's parquet tables (/root/repo/TESTDATA.md) and the
  * star-schema → knowledge-graph fixture mappings of /root/repo/FIXTURES.md §C.
  * Schemas are fixed by the generator; we rely on parquet footers (explicit
  * StructType pinning happens in GraphStore where we own the files).
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String) = load(s, d, "region")
  def nation(s: SparkSession, d: String) = load(s, d, "nation")
  def customer(s: SparkSession, d: String) = load(s, d, "customer")
  def supplier(s: SparkSession, d: String) = load(s, d, "supplier")
  def part(s: SparkSession, d: String) = load(s, d, "part")
  def orders(s: SparkSession, d: String) = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String) = load(s, d, "lineitem")
  /** The events table's `ts` encoding has varied across driver testdata
    * generations — TIMESTAMP(NANOS) (which Spark's reader rejects with
    * [PARQUET_TYPE_ILLEGAL]) and plain TIMESTAMP_MICROS (isAdjustedToUTC
    * = false, which Spark reads as TIMESTAMP_NTZ). Adapt on the footer
    * schema so both land on the same micros TIMESTAMP column: nanos are
    * read as long (legacy conf) and floor-converted — the truncation
    * DuckDB applies casting TIMESTAMP_NS → TIMESTAMP — and NTZ wall-clock
    * values are reinterpreted as UTC instants (the session timezone is
    * pinned to UTC everywhere), which is exactly how the DuckDB oracle
    * treats the same naive values.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // TIMESTAMP(NANOS) as long
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw // already a micros TIMESTAMP
    }
  }
  def documents(s: SparkSession, d: String) = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = load(s, d, "embeddings")

  /** entities ⇐ customer: name=c_name (unique), type=c_mktsegment; customers
    * have no timestamp so created_at is derived deterministically from the
    * key (stable across engines, total-orderable).
    */
  def customerEntities(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(
      col("c_name").as("name"),
      col("c_mktsegment").as("entity_type"),
      to_timestamp(lit("2024-01-01 00:00:00")).plus(
        expr("make_interval(0, 0, 0, 0, 0, 0, c_custkey)")).as("created_at"),
      col("c_custkey"))

  /** observations ⇐ orders keyed by customer: content = order priority.
    * fanOutScan on the fact side (guide §2.5): the mapper's join probe +
    * string derivations are map-side work an under-split single-row-group
    * scan would otherwise run on one core; at real scale the gate is the
    * identity.
    */
  def orderObservations(s: SparkSession, d: String): DataFrame =
    graft.operators.Parallelism.fanOutScan(orders(s, d))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(
        col("o_orderkey").as("id"),
        col("c_name").as("entity_name"),
        col("o_orderpriority").as("content"),
        col("o_orderdate").as("created_at"))

  /** entities ⇐ orders (timestamps are real → recency reads). */
  def orderEntities(s: SparkSession, d: String): DataFrame =
    graft.operators.Parallelism.fanOutScan(orders(s, d)).select(
      format_string("order#%09d", col("o_orderkey")).as("name"),
      col("o_orderstatus").as("entity_type"),
      col("o_orderdate").as("created_at"))

  /** relations ⇐ orders FK edges: customer -placed-> order (endpoints use
    * customer names so edges compose with customerEntities searches, R10).
    */
  def orderRelations(s: SparkSession, d: String): DataFrame =
    graft.operators.Parallelism.fanOutScan(orders(s, d))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(
        col("o_orderkey").as("id"),
        col("c_name").as("source"),
        format_string("order#%09d", col("o_orderkey")).as("target"),
        lit("placed").as("relation_type"),
        col("o_orderdate").as("created_at"))

  /** relations ⇐ lineitem FK edges: order -contains-> part (fanOutScan:
    * two format_string derivations per row over the biggest fact table).
    */
  def lineitemRelations(s: SparkSession, d: String): DataFrame =
    graft.operators.Parallelism.fanOutScan(lineitem(s, d)).select(
      (col("l_orderkey") * 10 + col("l_linenumber")).as("id"),
      format_string("order#%09d", col("l_orderkey")).as("source"),
      format_string("part#%09d", col("l_partkey")).as("target"),
      lit("contains").as("relation_type"),
      col("l_shipdate").as("created_at"))
}
