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

  /** Token-budget waterfilling across sources: given per-source token
    * masses n_i and a budget B, the max-min-fair allocation is
    * a_i = min(n_i, λ) with λ the waterline Σ a_i ≈ B — small sources are
    * taken whole, big sources are capped at one common level (the mixture
    * rule a pretraining run uses so no single crawl drowns the rest).
    *
    * Exact integer solve: sort sources by (n, source) — an O(sources)
    * frame, the corpus itself only aggregates — and for each boundary k
    * (first capped row) the candidate waterline is
    * λ_k = (B − P_k) div (S − k) with P_k the exclusive prefix sum; the
    * unique feasible k has n_{k−1} ≤ λ_k < n_k. B ≥ Σn degenerates to
    * everything taken whole. Budget is a FRACTION (ppm of Σn) so the same
    * declaration is meaningful at every scale factor.
    *
    * Output per source: n_tok, alloc, rate_ppm — all integers.
    */
  def budgetWaterfill(df: DataFrame, source: Column, weight: Column,
      budgetPpm: Long = 600000L): DataFrame = {
    require(budgetPpm > 0, "budget must be positive")
    val n = df.groupBy(source.as("source"))
      .agg(sum(weight).cast("long").as("n_tok"))
    val w = Window.orderBy(col("n_tok"), col("source"))
    val tot = n.agg(sum("n_tok").as("s_tok"), count(lit(1)).as("s_cnt"))
    val ranked = n
      .withColumn("k", row_number().over(w) - 1)
      .withColumn("pk", coalesce(sum(col("n_tok"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("prev_n", coalesce(lag(col("n_tok"), 1).over(w), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("budget", expr("s_tok * " + budgetPpm + " div 1000000"))
    val lam = ranked
      .withColumn("lam_k", expr("(budget - pk) div (s_cnt - k)"))
      .filter(col("prev_n") <= col("lam_k") && col("lam_k") < col("n_tok"))
      .agg(min(col("lam_k")).as("lam"))
    ranked.crossJoin(broadcast(lam))
      .select(col("source"), col("n_tok"),
        least(col("n_tok"), coalesce(col("lam"), lit(Long.MaxValue)))
          .as("alloc"))
      .withColumn("rate_ppm",
        when(col("n_tok") === 0, lit(0L))
          .otherwise(expr("alloc * 1000000 div n_tok")))
  }
}
