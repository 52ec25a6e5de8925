package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: exact dedup → quality scoring →
  * keep docs at or above their language's median quality. The composition a
  * pretraining pipeline actually runs, built only from the engine's own
  * operators.
  *
  * Scale shape, by stage:
  *  - exact dedup: window over `md5(text)` — hash keys are balanced, so
  *    partitions stay uniform no matter how skewed the raw text is;
  *  - quality: pure column expressions, scan-speed map stage;
  *  - threshold: per-language medians via AGGREGATION (one partial-agg
  *    shuffle of (lang, quality) pairs) broadcast back as a 5-row build —
  *    deliberately NOT `row_number() OVER (PARTITION BY lang)`: ranking
  *    within language would sort each language's entire corpus in one
  *    partition, and languages are few and huge (the canonical skew
  *    hazard).
  */
object Curate {

  def curate(docs: DataFrame, id: Column, text: Column, lang: Column): DataFrame = {
    val dd = docs
      .select(id.as("doc_id"), lang.as("lang"), text.as("text"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
      .filter(col("_rn") === 1)
    val scored = dd.select(col("doc_id"), col("lang"),
      TextAnalysis.qualityScore(col("text")).as("quality"))
      // consumed twice (median computation + threshold filter): checkpoint
      // lazily so dedup+scoring run once, not once per branch
      .localCheckpoint(false)
    val medians = scored.groupBy("lang")
      .agg(expr("percentile(quality, 0.5)").as("_med"))
    scored.join(broadcast(medians), Seq("lang"))
      .filter(col("quality") >= col("_med"))
      .select("doc_id", "lang", "quality")
  }
}
