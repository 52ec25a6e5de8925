package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis operators for training-data pipelines: token statistics,
  * quality scoring, heuristic language ID, document fingerprinting. All pure
  * column expressions (codegen'd, no UDFs) so they run at scan speed — at
  * 100 TB these are the per-document map stage before any shuffle.
  */
object TextAnalysis {

  def tokens(text: Column): Column = split(text, " ")

  /** Token statistics: counts, distinct counts, mean token length. */
  def tokenStats(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = tokens(text)
    docs.select(
      id.as("doc_id"),
      length(text).as("n_chars"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_distinct_tokens"),
      round(length(text).cast("double") / size(toks), 6).as("mean_token_len"))
  }

  /** Greedy maximum-coverage data selection (the facility-location /
    * coreset step of training-data curation, Nemhauser-Wolsey-Fisher
    * greedy): pick `k` docs one at a time, each maximizing the count of
    * vocabulary terms NOT yet covered by earlier picks; ties break on
    * doc_id, so the selection is deterministic. Returns
    * (step, doc_id, gain). Each round is one anti-join + one aggregate +
    * one 1-row argmax over the distinct (doc, term) frame — O(k) rounds,
    * never a combinatorial search; the greedy solution carries the classic
    * (1 − 1/e) coverage guarantee.
    */
  def greedyCoverage(docs: DataFrame, id: Column, text: Column,
      k: Int, n: Int = 3): DataFrame = {
    require(k >= 1 && k <= 32, "k bounded to keep the round chain flat")
    val spark = docs.sparkSession
    import spark.implicits._
    // coverage units are word n-gram shingles — the unigram vocabulary of
    // a templated corpus is tiny enough for one doc to cover it whole,
    // which would collapse the greedy to a single round
    val toks = docs
      .select(id.as("doc_id"),
        explode(array_distinct(Dedup.shingles(text, n))).as("t"))
      .localCheckpoint(true)
    var covered = Seq.empty[String].toDF("t").localCheckpoint(true)
    var picks = Seq.empty[(Int, Long, Long)]
    for (step <- 1 to k) {
      val best = toks.join(covered, Seq("t"), "left_anti")
        .groupBy("doc_id").agg(count(lit(1)).as("gain"))
        .orderBy(desc("gain"), asc("doc_id")).limit(1)
        .as[(Long, Long)].collect()
      best.headOption.foreach { case (d, g) =>
        picks :+= ((step, d, g))
        covered = covered
          .union(toks.filter(col("doc_id") === d).select("t"))
          .distinct().localCheckpoint(true)
      }
    }
    picks.toDF("step", "doc_id", "gain")
  }

  /** BPE-ish subword count: whitespace tokens further split at letter/digit
    * boundaries and into ≤4-char chunks — a cheap, deterministic proxy for a
    * BPE tokenizer's token count (the real vocab isn't in this container).
    */
  def subwordCount(text: Column): Column = {
    val pieces = split(
      regexp_replace(
        regexp_replace(text, "([0-9])([a-zA-Z])", "$1 $2"),
        "([a-zA-Z])([0-9])", "$1 $2"),
      " ")
    aggregate(pieces, lit(0),
      (acc, p) => acc + ceil(length(p).cast("double") / 4.0).cast("int"))
  }

  private val Stopwords = Seq("the", "a", "an", "and", "or", "of", "to", "in",
    "is", "it", "for", "on", "with", "at", "by")

  /** Shared with OracleSqlGen so the oracle SQL can't drift from the Spark
    * expressions.
    */
  def stopwordsSqlList: String = Stopwords.map(w => s"'$w'").mkString(", ")
  def langMarkersPublic: Seq[(String, Seq[String])] = LangMarkers

  /** Quality score ∈ [0,1]: blend of length-band fit, stopword ratio,
    * lexical diversity, and mean token length — the standard cheap filters a
    * pretraining pipeline applies before expensive dedup.
    */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val stopHits = size(filter(toks, t => t.isin(Stopwords: _*))).cast("double")
    val stopRatio = stopHits / nTok
    val diversity = size(array_distinct(toks)).cast("double") / nTok
    val meanLen = length(text).cast("double") / nTok
    val lenScore = when(nTok.between(20, 2000), 1.0)
      .when(nTok < 20, nTok / 20.0)
      .otherwise(lit(2000.0) / nTok)
    val stopScore = when(stopRatio.between(0.01, 0.6), 1.0).otherwise(0.5)
    val lenBandScore = when(meanLen.between(3.0, 12.0), 1.0).otherwise(0.5)
    round(lenScore * 0.4 + stopScore * 0.2 + diversity * 0.2 + lenBandScore * 0.2, 6)
  }

  /** Language-marker token lists for the n-gram/stopword language-ID
    * heuristic. Small on purpose: language ID at pipeline scale is a
    * hit-count argmax over marker sets, not a model.
    */
  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "with", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "por"),
    "fr" -> Seq("le", "la", "et", "les", "des", "une", "pour"),
    "de" -> Seq("der", "die", "und", "das", "ein", "mit", "für"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和"))

  /** Heuristic language ID: argmax over marker-token hit counts, 'und' when
    * nothing matches. Deterministic tie-break by language code.
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scored = LangMarkers.map { case (lang, markers) =>
      struct(
        size(filter(toks, t => t.isin(markers: _*))).as("hits"),
        lit(lang).as("lang"))
    }
    // array_max on (hits, lang) structs: max hits, then lexicographically
    // LAST lang — invert by picking via sort: use array_sort + last element.
    val best = element_at(
      array_sort(array(scored: _*)), -1)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise("und")
  }

  /** Token-budget batch packing — the assemble-training-batches step of an
    * LLM data pipeline: documents are packed contiguously (in `order` within
    * each `shard`) into batches whose token budget is `budget`; a document
    * whose tokens would overflow the current batch starts the next one at
    * its cumulative boundary (`batch_id = floor(cum_tokens_before /
    * budget)`) — contiguous packing with at most one overflowing document
    * per batch, the standard streaming-friendly approximation of bin
    * packing (optimal packing is NP-hard and order-destroying).
    *
    * Scale: the running sum is per-shard, so parallelism = number of shards
    * (pick shard = hash-bucket / language / source file). A single global
    * ordering would serialize 100 TB through one task — deliberately not
    * offered.
    */
  def packBatches(
      docs: DataFrame,
      id: Column,
      text: Column,
      shard: Column,
      budget: Long,
      order: Column): DataFrame = {
    require(budget > 0)
    // doc_id tiebreak: a non-unique `order` column would make the running
    // sum (and thus batch assignments) shuffle-order-dependent
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("_ord"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs
      .select(id.as("doc_id"), shard.as("shard"), order.as("_ord"),
        size(tokens(text)).cast("long").as("n_tokens"))
      .withColumn("batch_id",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / budget)
          .cast("long"))
      .drop("_ord")
  }

  /** Intra-document repetition ratio (a Gopher-style quality rule): the
    * fraction of word n-grams that repeat an earlier n-gram of the same
    * document — high values flag boilerplate/looping text. Pure column
    * expression, scan-speed.
    */
  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val shs = Dedup.shingles(text, n)
    when(size(shs) > 0,
      round(lit(1.0) - size(array_distinct(shs)).cast("double") / size(shs), 6))
      .otherwise(0.0)
  }

  /** Decontamination: training docs sharing any word n-gram with a held-out
    * benchmark/eval corpus, with hit counts for review or removal. The
    * benchmark's distinct shingle set is the inverted index (tiny relative
    * to the corpus → broadcast); the corpus explodes once and semi-joins —
    * never an all-pairs comparison. At 100 TB this is a map-side join of
    * the scan against a benchmark index built once.
    */
  def contamination(
      docs: DataFrame,
      id: Column,
      text: Column,
      bench: DataFrame,
      benchText: Column,
      n: Int = 3): DataFrame = {
    val d = docs.select(id.as("doc_id"),
      explode(array_distinct(Dedup.shingles(text, n))).as("sh"))
    val b = bench
      .select(explode(array_distinct(Dedup.shingles(benchText, n))).as("sh"))
      .distinct()
    d.join(broadcast(b), Seq("sh"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_contaminated"))
  }

  /** Per-document novelty: the fraction of a doc's distinct word n-grams
    * that occur in NO other document — the inverse of boilerplate, a cheap
    * originality/duplication-pressure signal over a whole corpus.
    *
    * Scale shape (same inverted-index discipline as Dedup.ngramJaccard):
    * explode distinct shingles once, repartition on the shingle so the
    * doc-frequency aggregate and the df-lookup join share ONE exchange
    * (ReusedExchange), then re-aggregate per doc with map-side partials.
    * Integer-only scoring (counts + one final division, rounded) keeps the
    * result engine-portable.
    */
  def novelty(docs: DataFrame, id: Column, text: Column, n: Int = 3): DataFrame = {
    val sh = docs.select(id.as("doc_id"),
      explode(array_distinct(Dedup.shingles(text, n))).as("sh"))
    val coPart = sh.repartition(col("sh"))
    val dfreq = coPart.groupBy("sh").agg(count(lit(1)).as("_df"))
    coPart.hint("shuffle_hash").join(dfreq, Seq("sh"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("_df") === 1, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("novelty",
        round(col("n_unique").cast("double") / col("n_shingles"), 6))
  }

  /** Duplicated-span coverage — the fixed-k distributed approximation of
    * exact-substring dedup (Lee et al., "Deduplicating Training Data Makes
    * Language Models Better", ACL 2022, which uses suffix arrays
    * single-node): a token position counts as duplicated when ANY k-gram
    * window covering it occurs ≥ 2 times corpus-wide (within- or cross-doc).
    * Per doc: token count, duplicated-token count, coverage ratio — the
    * signal a curation pipeline thresholds or uses to cut spans.
    *
    * Scale shape: position-indexed k-grams are O(total tokens); occurrence
    * counting is a partial-aggregated shuffle co-partitioned with the join
    * back (one exchange, reused — the novelty pattern); coverage expansion
    * is bounded by the constant k before the per-doc distinct.
    */
  def duplicatedSpanStats(
      docs: DataFrame, id: Column, text: Column, k: Int = 8): DataFrame = {
    val (toks, coPart) = positionedSpans(docs, id, text, k)
    val dup = coPart.groupBy("sh").agg(count(lit(1)).as("_c"))
      .filter(col("_c") >= 2).select("sh")
    val cov = coPart.hint("shuffle_hash").join(dup, Seq("sh"))
      .select(col("doc_id"),
        explode(sequence(col("i"), col("i") + lit(k - 1))).as("pos"))
      .distinct()
    val cnt = cov.groupBy("doc_id").agg(count(lit(1)).as("dup_tokens"))
    toks.select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"))
      .join(cnt, Seq("doc_id"), "left")
      .na.fill(0L, Seq("dup_tokens"))
      .withColumn("dup_ratio",
        col("dup_tokens").cast("double") / col("n_tokens").cast("double"))
  }

  /** Duplicated-span REMOVAL — the destructive completion of
    * [[duplicatedSpanStats]]: emit each document's text with every token
    * position covered by a corpus-duplicated k-gram window cut out (the
    * conservative both-copies cut; the curation pipeline's cleaned-corpus
    * output in the Lee et al. 2022 shape). Returns
    * (doc_id, n_kept, clean_text); fully-duplicated docs keep the row with
    * an empty string — the downstream filter decides their fate.
    *
    * Scale shape: identical to the stats pass (position-indexed k-grams,
    * one co-partitioned exchange, k-bounded coverage fanout), plus one
    * per-doc rebuild: kept tokens re-assemble via sort_array over
    * (pos, token) structs — an O(doc length) in-memory sort per row, never
    * a cross-row window.
    */
  def removeDuplicatedSpans(
      docs: DataFrame, id: Column, text: Column, k: Int = 8): DataFrame = {
    val (toks, coPart) = positionedSpans(docs, id, text, k)
    val dup = coPart.groupBy("sh").agg(count(lit(1)).as("_c"))
      .filter(col("_c") >= 2).select("sh")
    val cov = coPart.hint("shuffle_hash").join(dup, Seq("sh"))
      .select(col("doc_id"),
        explode(sequence(col("i"), col("i") + lit(k - 1))).as("pos"))
      .distinct()
    rebuildWithout(toks, cov)
  }

  /** Keep-FIRST-occurrence duplicated-span removal — the production
    * variant of [[removeDuplicatedSpans]]: the canonical occurrence of
    * each corpus-duplicated k-gram (minimum (doc_id, pos) pair, the
    * chunk-dedup winner rule) keeps its tokens; only the OTHER copies are
    * cut. The corpus retains exactly one copy of every duplicated span
    * instead of zero — no content is lost, which is what a pretraining
    * cleanup actually wants (Lee et al. 2022 deduplicate-and-keep-one).
    * Same plan shape: one co-partitioned exchange on the shingle, a
    * k-bounded coverage fanout for non-canonical copies only, one per-doc
    * rebuild.
    *
    * Winner key: min over struct(doc_id, i) — lexicographic struct
    * ordering, so it is exact for ANY orderable id type (string ids
    * included) and any document length, with no packing bounds. (A packed
    * doc_id·2^20+i long would silently null out on string ids and
    * overflow past 2^43 docs / 2^20 tokens.)
    */
  def removeDuplicatedSpansKeepFirst(
      docs: DataFrame, id: Column, text: Column, k: Int = 8): DataFrame = {
    val (toks, coPart) = positionedSpans(docs, id, text, k)
    val keyed = coPart.withColumn("kk", struct(col("doc_id"), col("i")))
    val first = keyed.groupBy("sh")
      .agg(min("kk").as("firstk"), count(lit(1)).as("_c"))
      .filter(col("_c") >= 2).select("sh", "firstk")
    val cov = keyed.hint("shuffle_hash").join(first, Seq("sh"))
      .filter(col("kk") =!= col("firstk"))
      .select(col("doc_id"),
        explode(sequence(col("i"), col("i") + lit(k - 1))).as("pos"))
      .distinct()
    rebuildWithout(toks, cov)
  }

  /** Shared by the span-removal variants: (tokenized docs, position-indexed
    * k-grams co-partitioned on the shingle).
    */
  private def positionedSpans(docs: DataFrame, id: Column, text: Column,
      k: Int): (DataFrame, DataFrame) = {
    val toks = docs.select(id.as("doc_id"), tokens(text).as("toks"))
      .withColumn("n_tokens", size(col("toks")))
    val spans = toks.select(col("doc_id"), col("toks"),
        explode(when(col("n_tokens") >= k,
          sequence(lit(0), col("n_tokens") - lit(k)))
          .otherwise(array().cast("array<int>"))).as("i"))
      .select(col("doc_id"), col("i"),
        concat_ws(" ", slice(col("toks"), col("i") + 1, lit(k))).as("sh"))
    (toks, spans.repartition(col("sh")))
  }

  /** Rebuild each doc's text without the covered positions (shared tail of
    * the span-removal variants): kept tokens re-assemble via sort_array
    * over (pos, token) structs — an O(doc length) in-memory sort per row,
    * never a cross-row window.
    */
  private def rebuildWithout(toks: DataFrame, cov: DataFrame): DataFrame = {
    val kept = toks
      .select(col("doc_id"), posexplode(col("toks")))
      .withColumnsRenamed(Map("pos" -> "pos", "col" -> "tok"))
      .join(cov, Seq("doc_id", "pos"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          sort_array(collect_list(struct(col("pos"), col("tok")))),
          p => p.getField("tok"))).as("clean_text"))
    toks.select("doc_id")
      .join(kept, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_kept")).na.fill("", Seq("clean_text"))
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the
    * MOSS selection rule): hash every word k-gram, slide a w-hash window
    * over the hash sequence, and select each window's minimum hash taking
    * the RIGHTMOST position on ties; the doc's fingerprints are the
    * distinct selected (position, hash) pairs. The local-sampling
    * guarantee plain min-hashing lacks: any shared run of w+k-1 words
    * between two docs yields at least one shared fingerprint, while
    * expected density stays ~2/(w+1) of the grams. Docs shorter than one
    * k-gram emit no rows; fewer than w grams → one window over them all.
    *
    * Plan shape: ONE map-only projection per doc — shingle pass, then a
    * nested higher-order expression (window starts → slice → min →
    * rightmost-index fold) entirely inside codegen, then array_distinct +
    * explode. No shuffle, no self-join, no per-window row blowup: at
    * 100 TB fingerprinting parallelizes embarrassingly across doc
    * partitions, and downstream near-dup joins group on `fp` exactly like
    * the MinHash band index.
    */
  def winnow(docs: DataFrame, id: Column, text: Column,
      k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1)
    // native fused expression: md5 per gram + monotonic-deque rightmost-min,
    // O(grams) — the HOF twin below is O(grams·w) with interpreted lambdas
    // (~10× slower at sf0.1) and is kept spec-pinned equal
    val sel = graft.functions.VectorFunctions.winnowSelect(
      Dedup.shingles(text, k), w)
    docs.select(id.as("doc_id"), sel.as("sel"))
      .filter(size(col("sel")) >= 1)
      .select(col("doc_id"), explode(col("sel")).as("s"))
      .select(col("doc_id"), col("s.pos").cast("long").as("pos"),
        col("s.fp").as("fp"))
  }

  /** Builtin-HOF winnowing twin (the shape [[winnow]] replaced with the
    * native expression) — kept public for the cross-check spec, exactly
    * like Dedup.shinglesFold mirrors the native shingles.
    */
  def winnowFold(docs: DataFrame, id: Column, text: Column,
      k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1)
    val hs = transform(Dedup.shingles(text, k), s => md5(s))
    val sel = transform(
      sequence(lit(0), greatest(size(col("hs")) - w, lit(0))), j => {
        val win = slice(col("hs"), j + 1, lit(w))
        val minh = array_min(win)
        val right = aggregate(sequence(lit(1), size(win)), lit(0),
          (acc, i) => when(element_at(win, i) === minh, i).otherwise(acc))
        struct((j + right - 1).as("pos"), minh.as("fp"))
      })
    docs.select(id.as("doc_id"), hs.as("hs"))
      .filter(size(col("hs")) >= 1)
      .select(col("doc_id"), explode(array_distinct(sel)).as("s"))
      .select(col("doc_id"), col("s.pos").cast("long").as("pos"),
        col("s.fp").as("fp"))
  }

  /** Rolling-hash document fingerprint (winnowing-lite): the minimum md5 over
    * word 5-gram windows + the full-text md5. Two docs sharing the min-window
    * fingerprint almost surely share a 5-gram run — a cheap containment
    * signal that groups by fingerprint instead of comparing pairs.
    */
  def fingerprint(docs: DataFrame, id: Column, text: Column, window: Int = 5): DataFrame =
    docs.select(
      id.as("doc_id"),
      md5(text).as("full_md5"),
      coalesce(array_min(transform(Dedup.shingles(text, window), s => md5(s))),
        md5(text)).as("min_window_md5"))

  /** Gopher's "must contain ≥2 of" stop-word list (Rae et al. 2021 §A.1.1)
    * — distinct from the scoring stopword set above on purpose: the rule
    * battery reproduces the published filter, not our soft score.
    */
  private val GopherStops = Seq("the", "be", "to", "of", "and", "that",
    "have", "with")
  def gopherStopsSqlList: String = GopherStops.map(w => s"'$w'").mkString(", ")

  /** Gopher-style hard quality rules (Rae et al. 2021, Appendix A):
    * per-document boolean filter flags, each backed by an exact-integer
    * measurement (ppm ratios via integer division — no float at the compare
    * boundary), plus the conjunction `keep`. Complements [[qualityScore]]:
    * that is a soft blend for ranking/curriculum; this is the reproducible
    * drop/keep gate a pretraining pipeline logs per rule so corpus ablations
    * can attribute removals.
    *
    * Rules (bounds adapted to word-token scale):
    *  - r_len:   token count within [minTok, maxTok]
    *  - r_mwl:   mean word length within [3, 10] chars
    *  - r_alpha: ≥80% of words contain an alphabetic character
    *  - r_stop:  ≥2 hits from the published 8-word stop list
    *  - r_sym:   symbol-to-word ratio ('#' or '...') ≤ 10%
    *
    * One map-only projection — codegen'd, shuffle-free, scan-speed at any
    * scale.
    */
  def gopherRules(docs: DataFrame, id: Column, text: Column,
      minTok: Int = 20, maxTok: Int = 90): DataFrame = {
    val toks = tokens(text)
    val nTok = size(toks).cast("long")
    val sumWl = aggregate(transform(toks, t => length(t).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val nAlpha = size(filter(toks, t => t.rlike("[a-zA-Z]"))).cast("long")
    val stopHits = size(filter(toks, t => t.isin(GopherStops: _*))).cast("long")
    val hashCnt = (length(text) - length(regexp_replace(text, "#", ""))).cast("long")
    val ellCnt = ((length(text) -
      length(regexp_replace(text, java.util.regex.Pattern.quote("..."), ""))) / 3)
      .cast("long")
    // two selects so the ppm ratios use TRUE integer division (`div`) —
    // Column./ on longs is double division and would leak floats to the
    // compare boundary
    val measured = docs.select(id.as("doc_id"), nTok.as("n_tok"),
      sumWl.as("sum_wl"), nAlpha.as("n_alpha"), stopHits.as("stop_hits"),
      (hashCnt + ellCnt).as("sym_cnt"))
    val ppm = measured.select(col("doc_id"), col("n_tok"),
      expr("sum_wl * 1000000L div n_tok").as("mwl_ppm"),
      expr("n_alpha * 1000000L div n_tok").as("alpha_ppm"),
      col("stop_hits"),
      expr("sym_cnt * 1000000L div n_tok").as("sym_ppm"))
    val rLen = col("n_tok").between(minTok, maxTok)
    val rMwl = col("mwl_ppm").between(3000000L, 10000000L)
    val rAlpha = col("alpha_ppm") >= 800000L
    val rStop = col("stop_hits") >= 2L
    val rSym = col("sym_ppm") <= 100000L
    ppm.select(col("doc_id"), col("n_tok"), col("mwl_ppm"), col("alpha_ppm"),
      col("stop_hits"), col("sym_ppm"),
      rLen.cast("int").as("r_len"), rMwl.cast("int").as("r_mwl"),
      rAlpha.cast("int").as("r_alpha"), rStop.cast("int").as("r_stop"),
      rSym.cast("int").as("r_sym"),
      (rLen && rMwl && rAlpha && rStop && rSym).cast("int").as("keep"))
  }

  /** DSIR importance weights (Xie et al. 2023): score each raw document by
    * how much more likely its hashed n-gram features are under a target
    * distribution than under the raw distribution —
    * w(doc) = Σ_f c_doc(f) · [ln p̂_target(f) − ln p̂_raw(f)], features =
    * word bigrams hashed into `buckets` buckets, probabilities add-one
    * smoothed. The standard cheap data-selection step before training: rank
    * raw data by w and keep the top mass.
    *
    * Scale shape: one explode of bigrams (map-side), ONE shuffle to count
    * (doc, bucket) occurrences; the two global bucket histograms are
    * `buckets`-row aggregates broadcast back, so the scoring join is
    * broadcast-hash — no shuffle of the corpus by feature. The per-doc sum
    * folds the bucket terms in ascending-bucket order (sequential fold, the
    * repo's bit-portable float-reduction idiom); output is floor(w·1e6)
    * fixed-point.
    */
  def dsirWeights(docs: DataFrame, id: Column, text: Column,
      isTarget: Column, buckets: Int = 512): DataFrame = {
    require(buckets > 0)
    val grams = docs.select(id.as("doc_id"), isTarget.as("is_t"),
        explode(Dedup.shingles(text, 2)).as("g"))
      .withColumn("b",
        conv(substring(md5(col("g")), 1, 6), 16, 10).cast("long") % buckets)
    val db = grams.groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
    val rb = grams.groupBy("b").agg(
      count(lit(1)).as("rc"), sum(col("is_t").cast("long")).as("tc"))
    val tot = rb.agg(sum("rc").as("n_r"), sum("tc").as("n_t"))
    val lr = rb.crossJoin(broadcast(tot)).select(col("b"),
      (log((col("tc").cast("double") + 1.0) /
           (col("n_t").cast("double") + buckets.toDouble)) -
       log((col("rc").cast("double") + 1.0) /
           (col("n_r").cast("double") + buckets.toDouble))).as("lr"))
    db.join(broadcast(lr), Seq("b"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("b"),
        (col("c").cast("double") * col("lr")).as("term")))).as("ts"))
      .select(col("doc_id"),
        floor(aggregate(col("ts"), lit(0.0),
          (acc, x) => acc + x.getField("term")) * 1000000.0)
          .cast("long").as("w_fp"))
  }

  /** Longest-repeated-substring statistics via distributed SUFFIX SORTING —
    * the exact maximum-repeat-length statistic behind suffix-array dedup
    * (Lee et al., "Deduplicating Training Data Makes Language Models
    * Better", ACL 2022), which the fixed-k span passes above cannot express
    * (they answer "is any k-gram duplicated", not "HOW LONG is the longest
    * duplicated run"). Per doc: token count and `lrs` = the length (in
    * tokens, capped at `cap`) of the longest token run that occurs at ≥ 2
    * positions corpus-wide — within-doc overlapping occurrences included,
    * exactly the Lee et al. self-overlap convention.
    *
    * Plan: each token position carries its cap-truncated suffix (an
    * `array<string>` slice of the doc's own token array — built row-locally,
    * no shuffle); ONE range exchange + in-partition sort over the suffix key
    * (the [[graft.operators.Ranking]] scaffold — never a single-task window)
    * puts equal prefixes adjacent, so each position's longest match
    * corpus-wide is against one of its two sort neighbors (the defining
    * suffix-array/LCP-array property). Neighbor suffixes come from lead/lag
    * over the PHYSICAL partition id (one WindowExec, no self-join), the
    * O(partitions) cross-boundary pairs are stitched via the Skyline
    * edge-row collect + broadcast, LCPs are a codegen'd
    * zip_with/array_position common-prefix expression, and a per-doc max
    * finishes.
    *
    * Scale shape: O(N·cap) bytes through ONE range exchange (N = corpus
    * token count) — the positionedSpans envelope, at cap instead of k, with
    * no N-row join anywhere (an sa-key self-join would re-shuffle both
    * cap-wide sides; lead/lag rides the exchange already paid for). For
    * caps beyond ~64 the right plan flips to Manber–Myers prefix doubling
    * (O(log cap) rounds of FIXED-width (pos, rank, rank') shuffles instead
    * of one cap-wide one); at cap ≤ 32 the single sort moves fewer total
    * bytes than the doubling rounds would — [[longestRepeatStats]]
    * size-gates between the two plans via [[chooseDoubling]], so callers
    * get the right regime without opting in.
    */
  /** Token-count of the common prefix of two `array<string>` columns (0
    * when `b` is null) — the LCP expression every suffix operator shares
    * ([[longestRepeatStats]], the SuffixIndex family); pure builtin HOFs,
    * codegen'd. zip_with pads the shorter array with nulls, `<=>`-free
    * equality turns those into false, and the first false position (or
    * none ⇒ full min length) is the answer.
    */
  private[pipeline] def commonPrefixCol(a: Column, b: Column): Column = {
    val firstDiff = array_position(
      zip_with(a, b, (x, y) => coalesce(x === y, lit(false))), lit(false))
    when(b.isNull, 0)
      .when(firstDiff === 0, least(size(a), size(b)))
      .otherwise(firstDiff - 1).cast("int")
  }

  /** Doubling pays off only past BOTH gates: the per-position byte ratio
    * (sort-once shuffles ~cap×8 bytes/position vs doubling's ~3 fixed
    * 24-byte exchanges × log₂cap rounds) crosses ~1 around cap 64, and
    * below [[DoublingSlotGate]] gram cells the O(log cap × ~4) iterative
    * stages' fixed scheduler cost dominates either way — measured at sf0.1
    * (250k positions, local[32]): sort-once 2 s at cap 16 vs doubling 17 s
    * at cap 64, which is why the local regime ALWAYS takes sort-once and
    * the doubling branch only engages at cluster scale (≥ ~4e9 cells ≈
    * 32 GB through the one cap-wide exchange) with hundreds-of-token caps
    * — the Lee et al. regime.
    */
  val DoublingCapGate: Int = 64
  val DoublingSlotGate: Long = 4000000000L

  /** True when the prefix-doubling plan beats the sort-once plan:
    * `tokenSlots` (corpus tokens × cap = cells through the sort-once
    * exchange) past the slot gate AND cap past the byte-ratio crossover.
    */
  def chooseDoubling(cap: Int, tokens: Long,
      slotGate: Long = DoublingSlotGate): Boolean =
    cap > DoublingCapGate && cap > 0 && tokens > slotGate / cap

  /** Per-doc longest-repeated-substring statistics, auto-selecting the
    * physical plan ([[withGlobalNtiles]]-style size gate): the sort-once
    * suffix sort below the gates, [[SuffixArray.longestRepeatStatsDoubling]]
    * above them (rounded up to a power-of-two cap, clamped back — exact
    * because lrs@cap = min(true lrs, cap)). Below the cap gate the choice
    * needs no data statistic at all (measured: the stat pass alone cost
    * ~0.3 s at sf0.1), so the small-cap path is byte-identical to the
    * plain sort-once plan; above it, the corpus-token count comes from a
    * lens pass the sort-once branch reuses for its final join. Output is
    * identical on either branch (spec-pinned), so callers and oracles
    * never see it.
    */
  def longestRepeatStats(
      docs: DataFrame, id: Column, text: Column, cap: Int = 16,
      partitions: Int = 32, slotGate: Long = DoublingSlotGate): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    // below the cap gate no token count can flip the choice — skip the
    // lens stat pass entirely and keep the small-cap plan untouched
    if (cap <= DoublingCapGate)
      return longestRepeatStatsSortOnce(docs, id, text, cap, partitions)
    val lens = docs
      .select(id.as("doc_id"), size(tokens(text)).cast("long").as("n_tokens"))
      .localCheckpoint(false)
    val slots = lens.agg(coalesce(sum(col("n_tokens")), lit(0L)))
      .head().getLong(0)
    if (chooseDoubling(cap, slots, slotGate)) {
      val p2 =
        if ((cap & (cap - 1)) == 0) cap else Integer.highestOneBit(cap) << 1
      SuffixArray.longestRepeatStatsDoubling(docs, id, text, p2, partitions)
        .select(col("doc_id"), col("n_tokens"),
          least(col("lrs"), lit(cap)).cast("int").as("lrs"))
    } else longestRepeatStatsSortOnce(docs, id, text, cap, partitions, Some(lens))
  }

  /** The sort-once physical plan (one range exchange of the cap-wide gram
    * table) — public so specs can pin branch equality; use
    * [[longestRepeatStats]] for the size-gated entry.
    */
  def longestRepeatStatsSortOnce(
      docs: DataFrame, id: Column, text: Column, cap: Int = 16,
      partitions: Int = 32, lensOpt: Option[DataFrame] = None): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val toks = docs.select(id.as("doc_id"), tokens(text).as("toks"))
      .withColumn("n_tokens", size(col("toks")))
    val pos = toks.select(col("doc_id"),
        explode(sequence(lit(0), col("n_tokens") - 1)).as("i"),
        slice(col("toks"), col("i") + 1, lit(cap)).as("g"))
    val sortCols = Seq(col("g"), col("doc_id"), col("i"))
    val parted = pos.repartitionByRange(partitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(false)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_pid").orderBy(sortCols: _*)
    // checkpointed so the driver-side edge collect below and the perDoc
    // scoring share ONE materialized window pass (the SuffixIndex
    // neighborPass discipline) — without it the O(N·cap) per-partition
    // window sort runs twice for the same spec
    val withNbr = parted
      .withColumn("_gn", lead(col("g"), 1).over(w))
      .withColumn("_gp", lag(col("g"), 1).over(w))
      .localCheckpoint(false)
    // Cross-boundary stitch: a partition-last row's true sort successor is
    // the FIRST row of the next NON-EMPTY partition (range partitioning may
    // leave empty partitions — pid±1 arithmetic would silently skip a
    // boundary pair, so consecutive non-empty pids pair up at the driver:
    // O(partitions) rows, the Ranking offset-pass scale).
    val edges = withNbr.filter(col("_gn").isNull || col("_gp").isNull)
      .select(col("_pid"), col("_gp").isNull.as("_isFirst"),
        col("_gn").isNull.as("_isLast"), col("g"))
      .collect()
    val firstG = edges.filter(_.getBoolean(1))
      .map(r => r.getInt(0) -> r.getSeq[String](3)).toMap
    val lastG = edges.filter(_.getBoolean(2))
      .map(r => r.getInt(0) -> r.getSeq[String](3)).toMap
    val pids = edges.map(_.getInt(0)).distinct.sorted
    // One row per pid (a middle partition carries BOTH a successor stitch
    // and a predecessor stitch — two rows would fan out the join).
    val bNext = pids.zip(pids.drop(1))
      .map { case (p, q) => p -> firstG(q) }.toMap
    val bPrev = pids.zip(pids.drop(1))
      .map { case (p, q) => q -> lastG(p) }.toMap
    val stitches = pids
      .filter(p => bNext.contains(p) || bPrev.contains(p))
      .map(p => org.apache.spark.sql.Row(
        p, bNext.get(p).orNull, bPrev.get(p).orNull))
    val spark = docs.sparkSession
    val gType = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType)
    val stitchDf = spark.createDataFrame(
      java.util.Arrays.asList(stitches: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_pid",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("_bn", gType),
        org.apache.spark.sql.types.StructField("_bp", gType))))
    def lcp(a: Column, b: Column): Column = commonPrefixCol(a, b)
    val perDoc = withNbr
      .join(broadcast(stitchDf), Seq("_pid"), "left")
      .withColumn("_next", coalesce(col("_gn"), col("_bn")))
      .withColumn("_prev", coalesce(col("_gp"), col("_bp")))
      .select(col("doc_id"),
        greatest(lcp(col("g"), col("_next")),
          lcp(col("g"), col("_prev"))).as("lcp"))
      .groupBy("doc_id").agg(max(col("lcp")).as("lrs"))
    lensOpt
      .getOrElse(toks.select(col("doc_id"),
        col("n_tokens").cast("long").as("n_tokens")))
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0, Seq("lrs"))
      .select(col("doc_id"), col("n_tokens"), col("lrs").cast("int").as("lrs"))
  }
}
