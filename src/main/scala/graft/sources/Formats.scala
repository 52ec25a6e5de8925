package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema-enforced readers for the interchange formats an LLM-data
  * pipeline actually ingests: JSONL (the lingua franca of web-scale text
  * corpora), CSV (vendor/label deliveries), ORC (the other columnar
  * warehouse format). Parquet stays the native store; these are the
  * boundary adapters.
  *
  * Design rules, all scale-motivated:
  *  - EXPLICIT StructType, never inference: on 100 TB, `inferSchema` is a
  *    full extra pass over the data before the first real job — and a
  *    schema that silently widens (int → string) when one vendor file is
  *    malformed corrupts everything downstream. The schema is the
  *    contract; rows that break it are data to count, not a reason to
  *    re-plan.
  *  - PERMISSIVE + a corrupt-record column for the text formats: a single
  *    bad line among billions must neither kill the job (FAILFAST) nor
  *    silently vanish (DROPMALFORMED). It lands in `_corrupt`, gets
  *    counted/quarantined by the caller, and the clean rows flow on.
  *  - Line-oriented JSONL (multiLine=false, the default) keeps the format
  *    SPLITTABLE: a 1 TB .jsonl file fans out across executors by byte
  *    range. multiLine=true would force one task per file.
  */
object Formats {

  val CorruptCol = "_corrupt"

  /** JSONL with the contract schema plus a corrupt-record column. Callers
    * split on [[isCorrupt]]: clean rows flow, corrupt rows are counted.
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** CSV with header + explicit schema; quoting/escaping left at RFC-4180
    * defaults (quote `"`, escape `"`), PERMISSIVE corrupt capture.
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)

  /** ORC is self-describing and columnar; the explicit schema here acts as
    * a projection/assertion (column pruning still reaches the reader).
    */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Spark refuses a query whose only referenced file column is the
    * corrupt-record column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD
    * _COLUMN) — to quarantine/count corrupt rows on their own, cache or
    * persist the parsed frame first (Spark's documented contract), or
    * aggregate corrupt + clean in one pass alongside real columns.
    */
  def isCorrupt = col(CorruptCol).isNotNull

  /** Clean rows only, corrupt column dropped — the common happy path. */
  def cleanRows(df: DataFrame): DataFrame =
    df.filter(!isCorrupt).drop(CorruptCol)
}
