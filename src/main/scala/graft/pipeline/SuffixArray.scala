package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Ranking

/** Distributed suffix-array construction by Manber–Myers PREFIX DOUBLING —
  * the large-cap scale path behind [[TextAnalysis.longestRepeatStats]].
  *
  * The sort-once form materializes each position's cap-truncated suffix and
  * pays O(N·cap) bytes through one range exchange; fine at cap ≤ 32, but the
  * byte blowup scales linearly with the cap. Doubling instead sorts
  * FIXED-width rows O(log cap) times: level k ranks every position by its
  * first 2^k tokens, and level k+1's key is the rank PAIR
  * (r_k(p), r_k(p + 2^k)) — two longs, regardless of cap. At a 100 TB corpus
  * with a 1024-token cap the sort-once plan shuffles ~1000× the corpus; this
  * one shuffles ~10 rounds of ~3 fixed-width exchanges.
  *
  * Rank assignment per round is the repo's exact distributed dense-rank:
  * distinct keys → [[Ranking.withGlobalRowNumber]] (range-partitioned, never
  * a single-task window) → join back. Ranks are order-preserving and
  * equal-iff-equal-key, which is all doubling needs (density is not
  * required). Missing second halves (position within 2^k of its doc end)
  * take the -1 sentinel — shared, so two equal-and-equally-padded windows
  * get equal ranks; the final LCP is clamped by each side's remaining
  * length, which exactly cancels the padding overcount (spec-pinned).
  *
  * LCP of adjacent suffixes in SA order descends the level tables top-down:
  * advance off by 2^k iff both (doc, i+off) ranks exist at level k, are
  * equal, and off + 2^k stays within the cap — each level is one left join
  * of the O(N) pair frame against the O(N) fixed-width rank table on an
  * equi-key, never a re-read of token data.
  *
  * Rounds early-exit when every rank is already unique (no two suffixes
  * share a 2^k-token window ⇒ none share a longer one), so an
  * already-deduplicated corpus pays ~log(longest repeat), not log(cap);
  * the LCP descend skips the missing levels with identical results
  * (window uniqueness at 2^k implies uniqueness at every longer length).
  *
  * Measured trade-off (sf0.1, 250k positions, local[32]): the sort-once
  * form runs ~2 s at cap 16; this one ~17 s at cap 64 — ~40 iterative
  * stages of fixed scheduling cost dominate at local scale, which is why
  * the DECLARED query (text_lrs) is the sort-once form and this is the
  * spec-pinned asymptotic path (SuffixLrsSpec proves output equality).
  * The crossover favors doubling when cap × token-width dwarfs the
  * fixed-width rank rows — hundreds of tokens, the Lee et al. regime —
  * where the sort-once byte envelope (cap × corpus through one exchange)
  * stops being payable.
  */
object SuffixArray {

  /** Same contract and output schema as
    * [[TextAnalysis.longestRepeatStats]] — (doc_id, n_tokens, lrs) with
    * `lrs` capped at `cap` — computed by prefix doubling. `cap` must be a
    * power of two (the doubling ladder's rungs).
    */
  def longestRepeatStatsDoubling(
      docs: DataFrame, id: Column, text: Column, cap: Int = 64,
      partitions: Int = 32): DataFrame = {
    require(cap >= 1 && (cap & (cap - 1)) == 0,
      s"cap must be a power of two, got $cap")
    val toks = docs
      .select(id.as("doc_id"), TextAnalysis.tokens(text).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("n_tokens"))
    val lens = toks.select(col("doc_id"), col("n_tokens"))
    val posDf = toks
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("i", "tok")))
      .localCheckpoint(false)

    // Level 0: rank by the single token.
    val vocab = posDf.select(col("tok")).distinct()
    val vr = Ranking.withGlobalRowNumber(
      vocab, Seq(col("tok")), "_r", partitions)
    var ranks = posDf.join(vr, Seq("tok"))
      .select(col("doc_id"), col("i"), col("_r").as("r"))
      .localCheckpoint(false)
    // tables(k) ranks prefixes of length 2^k.
    val tables = scala.collection.mutable.ArrayBuffer(ranks)

    val levels = java.lang.Integer.numberOfTrailingZeros(cap)
    val nPositions = posDf.count()
    var k = 0
    var allUnique = false
    while (k < levels && !allUnique) {
      val plen = 1L << k
      val shifted = ranks.select(col("doc_id"),
        (col("i") - plen).as("i"), col("r").as("r2"))
      val keyed = ranks.join(shifted, Seq("doc_id", "i"), "left")
        .withColumn("r2", coalesce(col("r2"), lit(-1L)))
      val keys = keyed.select(col("r"), col("r2")).distinct()
      val kr = Ranking.withGlobalRowNumber(
        keys, Seq(col("r"), col("r2")), "_nr", partitions)
      // Early exit: when every (r, r2) key is unique, ranks are a total
      // order already — no two suffixes share a 2^(k+1)-window, so neither
      // this level's table nor any longer one can advance an LCP (window
      // uniqueness at one length implies it at every longer length). The
      // key count is a free read off the rank pass's materialized frame.
      allUnique = kr.count() == nPositions
      ranks = keyed.join(kr, Seq("r", "r2"))
        .select(col("doc_id"), col("i"), col("_nr").as("r"))
        .localCheckpoint(false)
      tables += ranks
      k += 1
    }

    // Adjacent SA pairs: global row number over (final rank, doc, i).
    val withLen = tables.last.join(lens, Seq("doc_id"))
    val sa = Ranking.withGlobalRowNumber(
      withLen, Seq(col("r"), col("doc_id"), col("i")), "sa", partitions)
    val aSide = sa.select(col("sa").as("k"), col("doc_id").as("da"),
      col("i").as("ia"), col("n_tokens").as("na"))
    val bSide = sa.select((col("sa") - 1).as("k"), col("doc_id").as("db"),
      col("i").as("ib"), col("n_tokens").as("nb"))
    var pairs = aSide.join(bSide, Seq("k")).withColumn("off", lit(0L))

    // LCP descend, highest built level first.
    for (lvl <- tables.indices.reverse) {
      val plen = 1L << lvl
      val ra = tables(lvl).select(col("doc_id").as("da"),
        col("i").as("_ja"), col("r").as("_ra"))
      val rb = tables(lvl).select(col("doc_id").as("db"),
        col("i").as("_jb"), col("r").as("_rb"))
      pairs = pairs
        .join(ra, pairs("da") === ra("da") &&
          (pairs("ia") + pairs("off")) === ra("_ja"), "left")
        .drop(ra("da"))
        .join(rb, pairs("db") === rb("db") &&
          (pairs("ib") + pairs("off")) === rb("_jb"), "left")
        .drop(rb("db"))
        .withColumn("off",
          when(col("off") + plen <= cap &&
            col("_ra").isNotNull && col("_ra") === col("_rb"),
            col("off") + plen).otherwise(col("off")))
        .drop("_ja", "_jb", "_ra", "_rb")
    }

    val lcp = least(col("off"),
      col("na") - col("ia"), col("nb") - col("ib")).cast("int")
    val perDoc = pairs.select(col("da").as("doc_id"), lcp.as("lcp"))
      .unionAll(pairs.select(col("db").as("doc_id"), lcp.as("lcp")))
      .groupBy("doc_id").agg(max(col("lcp")).as("lrs"))
    lens.select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0, Seq("lrs"))
      .select(col("doc_id"), col("n_tokens"), col("lrs").cast("int").as("lrs"))
  }
}
