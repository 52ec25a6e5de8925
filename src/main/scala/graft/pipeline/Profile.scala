package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Column profiling — the first pass a pipeline runs over a new 100 TB
  * table: one scan computes every column's counts/nulls/distincts/extrema
  * (single aggregation job, map-side combined; no per-column scans).
  * Output is long-format (one row per column) with stringified extrema so
  * heterogeneous column types fit one schema.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__n"),
        count(col(c)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*).head()
    val rows = cols.map { c =>
      Row(c,
        wide.getAs[Long](s"${c}__n"),
        wide.getAs[Long](s"${c}__n") - wide.getAs[Long](s"${c}__nn"),
        wide.getAs[Long](s"${c}__nd"),
        wide.getAs[String](s"${c}__min"),
        wide.getAs[String](s"${c}__max"))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("col_name", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_null", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_distinct", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("min_str", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("max_str", org.apache.spark.sql.types.StringType)))
    df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.parallelize(rows, 1), schema)
  }

  /** Sketch-based distinct counts for when exact countDistinct's shuffle is
    * too expensive — one pass, fixed memory (HLL++). rsd = relative
    * standard deviation target.
    */
  def approxDistinct(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame =
    df.agg(
      approx_count_distinct(col(cols.head), rsd).as(cols.head),
      cols.tail.map(c => approx_count_distinct(col(c), rsd).as(c)): _*)
}
