package graft

/** Programmatic DuckDB oracle SQL for the queries whose SQL form is long but
  * mechanical (per-bit simhash tallies, md5 minhash bands, sequential-fold
  * cosine). Kept in Scala so the SQL and the Spark expressions are generated
  * from the same constants and cannot drift.
  *
  * Numeric portability rules (validated against DuckDB locally):
  *  - hashes: md5 hex strings, or CAST('0x'||substr(md5(x),1,15) AS BIGINT)
  *    for 60-bit ints — never engine hash() builtins;
  *  - float reductions: explicit sequential folds (list_reduce), which match
  *    Spark's `aggregate` bit-for-bit; never list_cosine_similarity (pairwise
  *    accumulation, diverges in the last ~8 bits of the mantissa);
  *  - NEVER expose a decimal aggregate directly at the compare boundary:
  *    Spark's sum(DECIMAL(18,2)) is DECIMAL(28,2), DuckDB's DECIMAL(38,2),
  *    and the driver's hash canonicalizes scale-padded decimal strings
  *    ("253942.00") differently from float repr ("253942.0") — values that
  *    are byte-equal still hash-mismatch. Accumulate in decimal (exact,
  *    order-independent) but CAST the FINAL output column to DOUBLE on both
  *    the Spark and oracle sides (the round-1 root cause of 5 red rows).
  */
object OracleSqlGen {

  /** Word n-gram shingles of `text` as a DuckDB list expression. */
  private def shinglesSql(n: Int): String = {
    val toks = "string_split(text, ' ')"
    val gram = (1 to n).map(j => s"$toks[i+$j]").mkString("concat_ws(' ', ", ", ", ")")
    s"list_transform(range(len($toks)-${n - 1}), i -> $gram)"
  }

  /** Mirrors text_source_overlap: pairwise source containment over DISTINCT
    * word n-grams — for each source pair, how much of A's shingle
    * vocabulary appears in B's (and vice versa), exact ppm. The
    * cross-source governance view of the per-doc containment dedup.
    */
  def sourceOverlap(n: Int): String =
    s"""WITH sh AS (
          SELECT DISTINCT source, sh FROM (
            SELECT source, unnest(list_distinct(${shinglesSql(n)})) AS sh
            FROM documents)),
        sz AS (SELECT source, count(*) AS n_sh FROM sh GROUP BY source),
        pr AS (
          SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
          FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
          GROUP BY 1, 2)
        SELECT src_a, src_b, CAST(n_common AS BIGINT) AS n_common,
          CAST(sa.n_sh AS BIGINT) AS n_a, CAST(sb.n_sh AS BIGINT) AS n_b,
          CAST((n_common * 1000000) // sa.n_sh AS BIGINT) AS contain_a_ppm,
          CAST((n_common * 1000000) // sb.n_sh AS BIGINT) AS contain_b_ppm
        FROM pr JOIN sz sa ON sa.source = pr.src_a
                JOIN sz sb ON sb.source = pr.src_b
        ORDER BY src_a, src_b"""

  /** Mirrors Dedup.ngramJaccard exactly: per-doc shingle sizes come from the
    * UNPRUNED shingle sets (the Jaccard denominator is the true union size),
    * while candidate-pair common counts come from the stop-shingle-pruned
    * index (shingles in more than `maxDocFreq` docs are dropped before the
    * self-join — the 100 TB hot-key guard).
    */
  def ngramJaccard(n: Int, threshold: Double, maxDocFreq: Long = Long.MaxValue,
      pairFilter: String = "TRUE"): String = {
    val pruned =
      if (maxDocFreq == Long.MaxValue) "sh"
      else s"""(SELECT s.* FROM sh s JOIN (
                 SELECT sh FROM sh GROUP BY sh HAVING count(*) <= $maxDocFreq) k
               USING (sh))"""
    s"""WITH sh AS (
          SELECT doc_id, unnest(list_distinct(${shinglesSql(n)})) AS sh FROM documents),
        sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        pr AS (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_common
          FROM $pruned a JOIN $pruned b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT a_id, b_id,
            CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) AS jaccard
        FROM pr JOIN sz sa ON sa.doc_id = a_id JOIN sz sb ON sb.doc_id = b_id
        WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= $threshold
          AND ($pairFilter)
        ORDER BY a_id, b_id"""
  }

  /** Mirrors TextAnalysis.duplicatedSpanStats: position-indexed k-grams,
    * corpus-wide occurrence counts (≥ 2 ⇒ duplicated), coverage = distinct
    * positions inside any duplicated window. Counts are exact integers; the
    * final ratio is one int/int double division — engine-identical.
    */
  /** Shared duplicated-span CTE chain (tokens → positioned k-grams →
    * corpus-duplicated shingles → covered positions), reused by the stats
    * and removal oracles.
    */
  private def spanBaseCtes(k: Int): String =
    s"""t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
        sp0 AS (SELECT doc_id, unnest(list_transform(range(len(toks)-$k+1),
                  i -> {'i': i, 'sh': concat_ws(' ', list_slice(toks, i+1, i+$k))})) AS u FROM t),
        sp AS (SELECT doc_id, u.i AS i, u.sh AS sh FROM sp0)"""

  private def spanCtes(k: Int): String =
    s"""${spanBaseCtes(k)},
        dup AS (SELECT sh FROM sp GROUP BY sh HAVING count(*) >= 2),
        cov AS (SELECT DISTINCT doc_id, i + j.range AS pos
                FROM sp JOIN dup USING (sh) CROSS JOIN range($k) j)"""

  /** Mirrors TextAnalysis.longestRepeatStats: per doc, max n in 1..cap such
    * that one of the doc's token n-grams occurs at >= 2 positions
    * corpus-wide (within-doc overlapping positions count — the Lee et al.
    * 2022 self-overlap convention); 0 when every gram is unique. The oracle
    * expands every (position, length) gram explicitly — O(N·cap) rows, fine
    * at verification SFs — where the engine suffix-sorts once and reads the
    * max off adjacent LCPs.
    */
  def textLrs(cap: Int): String =
    s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
        p AS (SELECT doc_id, toks, unnest(range(len(toks))) AS i FROM t),
        gr AS (SELECT doc_id, j.range + 1 AS n,
                      concat_ws(' ', list_slice(toks, i + 1, i + j.range + 1)) AS gram
               FROM p CROSS JOIN range($cap) j
               WHERE i + j.range + 1 <= len(toks)),
        dup AS (SELECT n, gram FROM gr GROUP BY n, gram HAVING count(*) >= 2),
        m AS (SELECT doc_id, max(n) AS lrs
              FROM gr JOIN dup USING (n, gram) GROUP BY doc_id)
        SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
               CAST(coalesce(m.lrs, 0) AS INT) AS lrs
        FROM t LEFT JOIN m USING (doc_id) ORDER BY t.doc_id"""

  /** Mirrors SuffixIndex.probeMaxOverlap: per QUERY doc (`querySql` rows),
    * max n in 1..cap such that one of its token n-grams occurs anywhere in
    * the CORPUS docs (`corpusSql` rows) — query docs never match each
    * other, only the corpus.
    */
  def textLrsProbe(cap: Int, querySql: String, corpusSql: String): String =
    s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
        q AS (SELECT doc_id, toks FROM t WHERE $querySql),
        c AS (SELECT doc_id, toks FROM t WHERE $corpusSql),
        qp AS (SELECT doc_id, toks, unnest(range(len(toks))) AS i FROM q),
        qg AS (SELECT doc_id, j.range + 1 AS n,
                      concat_ws(' ', list_slice(toks, i + 1, i + j.range + 1)) AS gram
               FROM qp CROSS JOIN range($cap) j
               WHERE i + j.range + 1 <= len(toks)),
        cp AS (SELECT doc_id, toks, unnest(range(len(toks))) AS i FROM c),
        cg AS (SELECT DISTINCT j.range + 1 AS n,
                      concat_ws(' ', list_slice(toks, i + 1, i + j.range + 1)) AS gram
               FROM cp CROSS JOIN range($cap) j
               WHERE i + j.range + 1 <= len(toks)),
        m AS (SELECT doc_id, max(n) AS max_overlap
              FROM qg JOIN cg USING (n, gram) GROUP BY doc_id)
        SELECT q.doc_id, CAST(len(q.toks) AS BIGINT) AS n_tokens,
               CAST(coalesce(m.max_overlap, 0) AS INT) AS max_overlap
        FROM q LEFT JOIN m USING (doc_id) ORDER BY q.doc_id"""

  def dedupSpanStats(k: Int): String =
    s"""WITH ${spanCtes(k)},
        n AS (SELECT doc_id, len(toks) AS n_tokens FROM t),
        cnt AS (SELECT doc_id, count(*) AS dup_tokens FROM cov GROUP BY doc_id)
        SELECT n.doc_id, CAST(n.n_tokens AS BIGINT) AS n_tokens,
               CAST(coalesce(c.dup_tokens,0) AS BIGINT) AS dup_tokens,
               CAST(coalesce(c.dup_tokens,0) AS DOUBLE)/CAST(n.n_tokens AS DOUBLE) AS dup_ratio
        FROM n LEFT JOIN cnt c USING (doc_id) ORDER BY doc_id"""

  /** Mirrors TextAnalysis.removeDuplicatedSpans: kept tokens re-assembled
    * in position order; fully-duplicated docs keep an empty string.
    */
  def dedupSpanClean(k: Int): String =
    s"""WITH ${spanCtes(k)},
        tk AS (SELECT doc_id, u.pos AS pos, u.tok AS tok FROM
               (SELECT doc_id, unnest(list_transform(range(len(toks)),
                  i -> {'pos': i, 'tok': toks[i+1]})) AS u FROM t)),
        kept AS (SELECT tk.doc_id, count(*) AS n_kept,
                        string_agg(tok, ' ' ORDER BY tk.pos) AS clean_text
                 FROM tk LEFT JOIN cov ON tk.doc_id = cov.doc_id AND tk.pos = cov.pos
                 WHERE cov.pos IS NULL GROUP BY tk.doc_id)
        SELECT t.doc_id, CAST(coalesce(k.n_kept,0) AS BIGINT) AS n_kept,
               coalesce(k.clean_text, '') AS clean_text
        FROM t LEFT JOIN kept k USING (doc_id) ORDER BY doc_id"""

  /** Mirrors TextAnalysis.removeDuplicatedSpansKeepFirst: the canonical
    * occurrence (min (doc_id, i) struct — lexicographic, id-type-agnostic,
    * the chunk-dedup winner rule) of each duplicated k-gram keeps its
    * tokens; only other copies cut.
    */
  def dedupSpanKeepFirst(k: Int): String =
    s"""WITH ${spanBaseCtes(k)},
        g AS (SELECT sh, min({'d': doc_id, 'i': i}) AS firstk
              FROM sp GROUP BY sh HAVING count(*) >= 2),
        cov AS (SELECT DISTINCT doc_id, i + j.range AS pos
                FROM sp JOIN g USING (sh) CROSS JOIN range($k) j
                WHERE {'d': doc_id, 'i': i} <> firstk),
        tk AS (SELECT doc_id, u.pos AS pos, u.tok AS tok FROM
               (SELECT doc_id, unnest(list_transform(range(len(toks)),
                  i -> {'pos': i, 'tok': toks[i+1]})) AS u FROM t)),
        kept AS (SELECT tk.doc_id, count(*) AS n_kept,
                        string_agg(tok, ' ' ORDER BY tk.pos) AS clean_text
                 FROM tk LEFT JOIN cov ON tk.doc_id = cov.doc_id AND tk.pos = cov.pos
                 WHERE cov.pos IS NULL GROUP BY tk.doc_id)
        SELECT t.doc_id, CAST(coalesce(k.n_kept,0) AS BIGINT) AS n_kept,
               coalesce(k.clean_text, '') AS clean_text
        FROM t LEFT JOIN kept k USING (doc_id) ORDER BY doc_id"""

  /** Shared chunk-dedup CTE chain, mirroring Dedup.chunkDedup: consecutive
    * k-word chunks (ragged tail kept), winner = min packed (doc_id, idx)
    * key per chunk text. Reused by the stats and clean oracles.
    */
  private def chunkCtes(k: Int): String =
    s"""t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
        c0 AS (SELECT doc_id, unnest(list_transform(
                 range(CAST(ceil(len(toks)/$k.0) AS BIGINT)),
                 i -> {'idx': i,
                       'chunk': array_to_string(list_slice(toks, i*$k+1, i*$k+$k), ' ')})) AS u
               FROM t),
        ch AS (SELECT doc_id, u.idx AS idx, u.chunk AS chunk FROM c0),
        fst AS (SELECT chunk, min(doc_id*1048576 + idx) AS firstk
                FROM ch GROUP BY chunk),
        kp AS (SELECT ch.doc_id, ch.idx, ch.chunk,
                      (ch.doc_id*1048576 + ch.idx = firstk) AS kept
               FROM ch JOIN fst USING (chunk))"""

  /** Mirrors SparkEntry dedup_chunk_stats over Dedup.chunkDedup. */
  def dedupChunkStats(k: Int): String =
    s"""WITH ${chunkCtes(k)}
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
               CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) AS kept_ratio
        FROM kp GROUP BY doc_id ORDER BY doc_id"""

  /** Incremental-chunk-dedup oracle: the FULL from-scratch pass restricted
    * to batch docs — hash-match proves the O(batch) index-consulting pass
    * computes exactly the from-scratch answer for the batch.
    */
  def dedupChunkInc(k: Int, batchFrom: Long): String =
    s"""WITH ${chunkCtes(k)}
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
               CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) AS kept_ratio
        FROM kp WHERE doc_id >= $batchFrom GROUP BY doc_id ORDER BY doc_id"""

  /** Mirrors SparkEntry dedup_chunk_clean: kept chunks re-assembled in
    * position order; docs whose every chunk lost keep an empty string.
    */
  def dedupChunkClean(k: Int): String =
    s"""WITH ${chunkCtes(k)},
        kt AS (SELECT doc_id, count(*) AS n_kept,
                      string_agg(chunk, ' ' ORDER BY idx) AS clean_text
               FROM kp WHERE kept GROUP BY doc_id)
        SELECT t.doc_id, CAST(coalesce(k.n_kept,0) AS BIGINT) AS n_kept,
               coalesce(k.clean_text, '') AS clean_text
        FROM t LEFT JOIN kt k USING (doc_id) ORDER BY doc_id"""

  /** Mirrors Dedup.containment: asymmetric |∩|/|A| with unpruned
    * denominators and stop-shingle-pruned common counts, pair kept when
    * either direction clears the threshold.
    */
  def containment(n: Int, threshold: Double, maxDocFreq: Long = Long.MaxValue): String = {
    val pruned =
      if (maxDocFreq == Long.MaxValue) "sh"
      else s"""(SELECT s.* FROM sh s JOIN (
                 SELECT sh FROM sh GROUP BY sh HAVING count(*) <= $maxDocFreq) k
               USING (sh))"""
    s"""WITH sh AS (
          SELECT doc_id, unnest(list_distinct(${shinglesSql(n)})) AS sh FROM documents),
        sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        pr AS (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_common
          FROM $pruned a JOIN $pruned b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT a_id, b_id,
            CAST(n_common AS DOUBLE) / sa.n_sh AS c_a_in_b,
            CAST(n_common AS DOUBLE) / sb.n_sh AS c_b_in_a
        FROM pr JOIN sz sa ON sa.doc_id = a_id JOIN sz sb ON sb.doc_id = b_id
        WHERE greatest(CAST(n_common AS DOUBLE) / sa.n_sh,
                       CAST(n_common AS DOUBLE) / sb.n_sh) >= $threshold
        ORDER BY a_id, b_id"""
  }

  def minhashLsh(n: Int, bands: Int, rowsPerBand: Int): String = {
    val nh = bands * rowsPerBand
    val mins = (0 until nh)
      .map(i => s"min(md5(sh || '#$i')) AS m_$i").mkString(",\n            ")
    val bandSelects = (0 until bands).map { b =>
      val parts = (0 until rowsPerBand)
        .map(r => s"m_${b * rowsPerBand + r}").mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, md5($parts) AS bucket FROM mh"
    }.mkString("\n          UNION ALL ")
    s"""WITH sh AS (
          SELECT doc_id, unnest(list_distinct(${shinglesSql(n)})) AS sh FROM documents),
        mh AS (
          SELECT doc_id,
            $mins
          FROM sh GROUP BY doc_id),
        bands AS (
          $bandSelects)
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        ORDER BY a_id, b_id"""
  }

  /** Mirrors dedup_verified: the LSH candidate pairs re-verified by exact
    * levenshtein (same DP in both engines) — recall stage bounds the pair
    * count, the distance gate restores precision.
    */
  def dedupVerified(n: Int, bands: Int, rowsPerBand: Int, maxDist: Int): String =
    s"""SELECT a_id, b_id, CAST(lev AS INT) AS lev FROM (
          SELECT p.a_id, p.b_id, levenshtein(da.text, db.text) AS lev
          FROM (${minhashLsh(n, bands, rowsPerBand)}) p
          JOIN documents da ON da.doc_id = p.a_id
          JOIN documents db ON db.doc_id = p.b_id)
        WHERE lev <= $maxDist ORDER BY a_id, b_id"""

  /** Pair-level recall/precision of the minhash-LSH candidate set against
    * exact n-gram Jaccard ≥ threshold — both replayed from the base table
    * with the same generators the individual oracles use, so the quality
    * measurement itself is hash-pinned. Counts are integers; the two
    * ratios are single int/int double divisions.
    */
  def minhashRecall(
      n: Int, threshold: Double, maxDocFreq: Long,
      bands: Int, rowsPerBand: Int): String =
    s"""WITH exact AS (SELECT a_id, b_id FROM (${ngramJaccard(n, threshold, maxDocFreq)}) x),
        lsh AS (SELECT a_id, b_id FROM (${minhashLsh(n, bands, rowsPerBand)}) y),
        j AS (
          SELECT CASE WHEN e.a_id IS NOT NULL THEN 1 ELSE 0 END AS e,
                 CASE WHEN s.a_id IS NOT NULL THEN 1 ELSE 0 END AS l
          FROM exact e FULL OUTER JOIN lsh s
            ON e.a_id = s.a_id AND e.b_id = s.b_id)
        SELECT CAST(sum(e) AS BIGINT) AS n_exact,
               CAST(sum(l) AS BIGINT) AS n_lsh,
               CAST(sum(e*l) AS BIGINT) AS n_common,
               CAST(sum(e*l) AS DOUBLE) / CAST(sum(e) AS DOUBLE) AS lsh_recall,
               CAST(sum(e*l) AS DOUBLE) / CAST(sum(l) AS DOUBLE) AS lsh_precision
        FROM j"""

  /** Connected components (min representative per component) over the
    * md5-minhash pair list — transitive closure via recursive CTE; the pair
    * generation is the same deterministic minhashLsh SQL, inlined as a
    * derived table.
    */
  /** Transitive-closure CTE scaffolding over ANY (a_id, b_id) pair source —
    * shared by the minhash component family and the embedding-cluster
    * oracle so closure semantics can never diverge between them.
    */
  private def closureCtes(pairSourceSql: String): String =
    s"""WITH RECURSIVE pairs AS (
          SELECT * FROM ($pairSourceSql) t
        ), edges AS (
          SELECT a_id AS a, b_id AS b FROM pairs
          UNION SELECT b_id, a_id FROM pairs
        ), nodes AS (SELECT DISTINCT a FROM edges),
        reach(a, b) AS (
          SELECT a, a FROM nodes
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        )"""

  private def componentCtes(n: Int, bands: Int, rowsPerBand: Int): String =
    closureCtes(minhashLsh(n, bands, rowsPerBand))

  /** Soft dedup: every doc joins its near-dup cluster size (1 when
    * unpaired) and survives iff u(doc)·size < 2^52 — Splits.inverseKeep's
    * exact multiply-compare, mirrored literally.
    */
  def softDedup(n: Int, bands: Int, rowsPerBand: Int): String =
    s"""${componentCtes(n, bands, rowsPerBand)},
        labels AS (SELECT a AS doc_id, min(b) AS rep_id FROM reach GROUP BY a),
        sizes AS (SELECT rep_id, CAST(count(*) AS BIGINT) AS sz
                  FROM labels GROUP BY 1)
        SELECT d.doc_id, coalesce(s.sz, 1) AS cluster_size,
          CAST(CASE WHEN
            CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':soft'), 1, 13) AS BIGINT)
              * coalesce(s.sz, 1) < 4503599627370496
            THEN 1 ELSE 0 END AS INT) AS kept
        FROM documents d
        LEFT JOIN labels l ON d.doc_id = l.doc_id
        LEFT JOIN sizes s ON l.rep_id = s.rep_id
        ORDER BY d.doc_id"""

  def minhashComponents(n: Int, bands: Int, rowsPerBand: Int): String =
    s"""${componentCtes(n, bands, rowsPerBand)}
        SELECT a AS doc_id, min(b) AS rep_id FROM reach GROUP BY a
        ORDER BY doc_id"""

  /** Leakage-safe split assignment: the split hash is computed from the
    * near-dup COMPONENT representative, not the doc itself, so a duplicate
    * cluster can never straddle train/test (the eval-contamination vector
    * plain per-doc hashing leaves open). Pair-free docs are their own
    * representative. Mirrors Splits.assignSplit's bucket hex compare.
    */
  def leakageSafeSplit(n: Int, bands: Int, rowsPerBand: Int,
      testBuckets: Int, valBuckets: Int): String = {
    val t = f"$testBuckets%02x"
    val v = f"${testBuckets + valBuckets}%02x"
    val rep = "coalesce(c.rep_id, d.doc_id)"
    s"""${componentCtes(n, bands, rowsPerBand)},
        comp AS (SELECT a AS doc_id, min(b) AS rep_id FROM reach GROUP BY a)
        SELECT d.doc_id, $rep AS rep,
          CASE WHEN substr(md5(CAST($rep AS VARCHAR)), 1, 2) < '$t' THEN 'test'
               WHEN substr(md5(CAST($rep AS VARCHAR)), 1, 2) < '$v' THEN 'val'
               ELSE 'train' END AS split
        FROM documents d LEFT JOIN comp c USING (doc_id)
        ORDER BY doc_id"""
  }

  /** Mirrors q_split_leakage_audit: per near-dup pair, do the endpoints
    * share a split under (a) naive per-doc hashing and (b) representative
    * hashing? Pairs and components replay the same deterministic
    * generators; the rep scheme's straddle count is structurally zero.
    */
  def splitLeakageAudit(n: Int, bands: Int, rowsPerBand: Int,
      testBuckets: Int, valBuckets: Int): String = {
    val t = f"$testBuckets%02x"
    val v = f"${testBuckets + valBuckets}%02x"
    def sp(x: String) =
      s"""CASE WHEN substr(md5(CAST($x AS VARCHAR)), 1, 2) < '$t' THEN 'test'
           WHEN substr(md5(CAST($x AS VARCHAR)), 1, 2) < '$v' THEN 'val'
           ELSE 'train' END"""
    s"""${componentCtes(n, bands, rowsPerBand)},
        comp AS (SELECT a AS doc_id, min(b) AS rep_id FROM reach GROUP BY a),
        ann AS (
          SELECT ${sp("p.a_id")} AS na, ${sp("p.b_id")} AS nb,
            ${sp("coalesce(ca.rep_id, p.a_id)")} AS ra,
            ${sp("coalesce(cb.rep_id, p.b_id)")} AS rb
          FROM pairs p
          LEFT JOIN comp ca ON ca.doc_id = p.a_id
          LEFT JOIN comp cb ON cb.doc_id = p.b_id)
        SELECT * FROM (
          SELECT 'naive' AS scheme, CAST(count(*) AS BIGINT) AS n_pairs,
            CAST(sum(CASE WHEN na <> nb THEN 1 ELSE 0 END) AS BIGINT) AS n_straddling
          FROM ann
          UNION ALL
          SELECT 'rep', CAST(count(*) AS BIGINT),
            CAST(sum(CASE WHEN ra <> rb THEN 1 ELSE 0 END) AS BIGINT)
          FROM ann)
        ORDER BY scheme"""
  }

  /** Mirrors text_dup_by_source: per-source duplication burden over the
    * replayed minhash components — clustered share (ppm) and the surviving
    * count after representative dedup.
    */
  def dupBySource(n: Int, bands: Int, rowsPerBand: Int): String =
    s"""${componentCtes(n, bands, rowsPerBand)},
        comp AS (SELECT a AS doc_id, min(b) AS rep_id FROM reach GROUP BY a)
        SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(CASE WHEN c.rep_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_clustered,
          CAST((sum(CASE WHEN c.rep_id IS NOT NULL THEN 1 ELSE 0 END) * 1000000)
            // count(*) AS BIGINT) AS dup_ppm,
          CAST(sum(CASE WHEN c.rep_id IS NULL OR c.rep_id = d.doc_id
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors
        FROM documents d LEFT JOIN comp c USING (doc_id)
        GROUP BY d.source ORDER BY d.source"""

  /** Surviving corpus after minhash dedup (Dedup.keepRepresentatives): drop
    * every doc that belongs to a component but is not its min-id
    * representative; pair-free docs survive as their own trivial cluster.
    */
  def minhashSurvivors(n: Int, bands: Int, rowsPerBand: Int,
      cols: Seq[String]): String =
    s"""${componentCtes(n, bands, rowsPerBand)},
        comp AS (SELECT a AS doc_id, min(b) AS rep_id FROM reach GROUP BY a)
        SELECT ${cols.map("d." + _).mkString(", ")} FROM documents d
        WHERE d.doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id <> rep_id)
        ORDER BY d.doc_id"""

  /** Duplicate-cluster size histogram — the dedup audit artifact (how much
    * of the corpus collapses, and into how many clusters of which size).
    */
  def minhashClusterSizes(n: Int, bands: Int, rowsPerBand: Int): String =
    s"""${componentCtes(n, bands, rowsPerBand)},
        comp AS (SELECT a AS doc_id, min(b) AS rep_id FROM reach GROUP BY a),
        sizes AS (SELECT rep_id, CAST(count(*) AS BIGINT) AS cluster_size
                  FROM comp GROUP BY rep_id)
        SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
        FROM sizes GROUP BY cluster_size ORDER BY cluster_size"""

  /** Incremental-dedup oracle: the full minhashLsh pair list restricted to
    * pairs touching the ingest batch (doc_id >= batchMinId), reshaped to the
    * (new_id, dup_of) orientation `Dedup.incrementalMinhashPairs` emits.
    * Every batch id exceeds every corpus id in the declared split, so the
    * batch member of an ordered pair (a_id < b_id) is always b_id. Matching
    * this oracle proves the batch-joins-index path finds exactly the pairs a
    * full-corpus re-pairing would — the 100 TB ingestion contract.
    */
  def incrementalMinhash(n: Int, bands: Int, rowsPerBand: Int, batchMinId: Long): String =
    s"""SELECT b_id AS new_id, a_id AS dup_of
        FROM (${minhashLsh(n, bands, rowsPerBand)}) t
        WHERE b_id >= $batchMinId
        ORDER BY new_id, dup_of"""

  /** Intra-doc repetition ratio over word n-grams. */
  def repetition(n: Int): String =
    s"""SELECT doc_id,
          CASE WHEN len(s) > 0
               THEN round(1.0 - CAST(len(list_distinct(s)) AS DOUBLE) / len(s), 6)
               ELSE 0.0 END AS rep_ratio
        FROM (SELECT doc_id, ${shinglesSql(n)} AS s FROM documents)
        ORDER BY doc_id"""

  /** Decontamination hit counts: docs (id >= benchMaxId) sharing any word
    * n-gram with the benchmark slice (id < benchMaxId).
    */
  def contamination(n: Int, benchMaxId: Long): String =
    s"""WITH sh AS (
          SELECT doc_id, unnest(list_distinct(${shinglesSql(n)})) AS sh FROM documents),
        bs AS (SELECT DISTINCT sh FROM sh WHERE doc_id < $benchMaxId)
        SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_contaminated
        FROM sh s JOIN bs USING (sh)
        WHERE s.doc_id >= $benchMaxId
        GROUP BY s.doc_id ORDER BY s.doc_id"""

  def simhash(bits: Int): String = {
    val tallies = (0 until bits)
      .map(b => s"sum((hv >> $b) & 1) AS c_$b").mkString(",\n            ")
    val combine = (0 until bits)
      .map(b => s"(CASE WHEN 2*c_$b > n THEN CAST(1 AS BIGINT) << $b ELSE 0 END)")
      .mkString(" +\n            ")
    s"""WITH t AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        h AS (
          SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS hv FROM t),
        agg AS (
          SELECT doc_id, count(*) AS n,
            $tallies
          FROM h GROUP BY doc_id)
        SELECT doc_id,
            $combine AS simhash
        FROM agg ORDER BY doc_id"""
  }

  /** Banded simhash near-dup pairs: band equi-join candidates, exact
    * bit_count(xor) verification — mirrors Dedup.simhashPairs over the same
    * simhash generator.
    */
  def simhashPairs(bits: Int, bands: Int, maxHamming: Int): String = {
    val w = bits / bands
    val mask = (1L << w) - 1
    val bandSql = (0 until bands)
      .map(b => s"SELECT doc_id, simhash, $b AS band, " +
        s"(simhash >> ${b * w}) & $mask AS bucket FROM h")
      .mkString("\n          UNION ALL ")
    s"""WITH h AS (SELECT doc_id, simhash FROM (${simhash(bits)}) s0),
        bd AS (
          $bandSql),
        cand AS (
          SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
              a.simhash AS sa, b.simhash AS sb
          FROM bd a JOIN bd b
            ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id)
        SELECT a_id, b_id, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
        FROM cand WHERE bit_count(xor(sa, sb)) <= $maxHamming
        ORDER BY a_id, b_id"""
  }

  /** Simhash near-dup clusters: the banded pairs closed transitively
    * (shared recursive-closure machinery) and summarized per component.
    */
  def simhashClusters(bits: Int, bands: Int, maxHamming: Int): String =
    s"""${closureCtes(simhashPairs(bits, bands, maxHamming))},
        labels AS (SELECT a AS doc_id, min(b) AS rep_id FROM reach GROUP BY a)
        SELECT rep_id, CAST(count(*) AS BIGINT) AS cluster_size,
          CAST(min(doc_id) AS BIGINT) AS min_member,
          CAST(max(doc_id) AS BIGINT) AS max_member
        FROM labels GROUP BY rep_id ORDER BY rep_id"""

  /** Mirrors Similarity.hardNegatives: top-k cosine neighbors with a
    * DIFFERENT class label (self-pairs are excluded by their own label).
    */
  def annHardNegatives(nQueries: Int, k: Int): String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS ql
                   FROM embeddings WHERE vec_id < $nQueries),
        c AS (SELECT vec_id AS neighbor_id, embedding AS cv, label AS cl
              FROM embeddings),
        s AS (
          SELECT query_id, neighbor_id, ${cosineSql("qv", "cv")} AS cosine
          FROM q, c WHERE ql <> cl),
        r AS (
          SELECT query_id, neighbor_id,
            row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
          FROM s)
        SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank
        FROM r WHERE rank <= $k ORDER BY query_id, rank"""

  /** Mirrors pipeline_coreset_greedy: the k greedy max-coverage rounds as
    * chained CTEs — each round counts uncovered terms per doc, takes the
    * (gain desc, doc_id) argmax, and folds the winner's terms into the
    * covered set.
    */
  def greedyCoverage(k: Int, n: Int = 3): String = {
    val rounds = (1 to k).map { i =>
      val prevCov =
        if (i == 1) "" else s" WHERE t NOT IN (SELECT t FROM c${i - 1})"
      val cov =
        if (i == 1)
          s"""c1 AS (SELECT DISTINCT t FROM toks
               WHERE doc_id IN (SELECT doc_id FROM s1))"""
        else
          s"""c$i AS (SELECT t FROM c${i - 1} UNION
               SELECT t FROM toks
               WHERE doc_id IN (SELECT doc_id FROM s$i))"""
      s"""s$i AS (
           SELECT doc_id, gain FROM (
             SELECT doc_id, count(*) AS gain FROM toks$prevCov
             GROUP BY doc_id)
           ORDER BY gain DESC, doc_id LIMIT 1),
         $cov"""
    }.mkString(",\n        ")
    val arms = (1 to k).map(i =>
      s"SELECT CAST($i AS INT) AS step, doc_id, CAST(gain AS BIGINT) AS gain FROM s$i")
      .mkString(" UNION ALL ")
    s"""WITH toks AS (
          SELECT DISTINCT doc_id, t FROM (
            SELECT doc_id, unnest(list_distinct(${shinglesSql(n)})) AS t
            FROM documents)),
        $rounds
        SELECT * FROM ($arms) ORDER BY step"""
  }

  /** Mirrors embed_kcenter: the Gonzalez farthest-point rounds as chained
    * CTEs — each round min-distances every unselected vector to the
    * selected set and takes the (dist desc, id) argmax.
    */
  def embedKCenter(dim: Int, k: Int, seed: Long): String = {
    def sqd(a: String, b: String) =
      s"list_sum(list_transform(range($dim), j -> ($a[j+1]-$b[j+1])*($a[j+1]-$b[j+1])))"
    val rounds = (2 to k).map { i =>
      s"""d$i AS (
           SELECT e.vec_id, min(${sqd("e.iv", "s.iv")}) AS dmin
           FROM iv e, iv s
           WHERE s.vec_id IN (SELECT vec_id FROM sel${i - 1})
             AND e.vec_id NOT IN (SELECT vec_id FROM sel${i - 1})
           GROUP BY e.vec_id),
         p$i AS (
           SELECT vec_id, dmin FROM d$i
           ORDER BY dmin DESC, vec_id LIMIT 1),
         sel$i AS (SELECT vec_id FROM sel${i - 1}
           UNION ALL SELECT vec_id FROM p$i)"""
    }.mkString(",\n        ")
    val arms = s"SELECT 1 AS step, CAST($seed AS BIGINT) AS vec_id, CAST(0 AS BIGINT) AS dist_sq" +:
      (2 to k).map(i =>
        s"SELECT $i AS step, vec_id, CAST(dmin AS BIGINT) AS dist_sq FROM p$i")
    s"""WITH iv AS (
          SELECT vec_id,
            list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS iv
          FROM embeddings),
        sel1 AS (SELECT CAST($seed AS BIGINT) AS vec_id),
        $rounds
        SELECT CAST(step AS INT) AS step, vec_id, dist_sq
        FROM (${arms.mkString(" UNION ALL ")}) ORDER BY step"""
  }

  /** Mirrors embed_cos_hist: pairwise exact-fold cosines of the 100-vector
    * probe sample, binned by the identical (c+1)·10 floor expression.
    */
  def embedCosHist(nProbe: Int): String =
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings
                   WHERE vec_id < $nProbe),
        p AS (
          SELECT ${cosineSql("a.embedding", "b.embedding")} AS c
          FROM e a JOIN e b ON a.vec_id < b.vec_id)
        SELECT CAST(floor((c + 1.0) * 10.0) AS BIGINT) AS bin,
          CAST(count(*) AS BIGINT) AS n
        FROM p GROUP BY 1 ORDER BY bin"""

  /** Mirrors stream_cms: per-day CMS point estimates for literal probe
    * keys — each probed cell compiles to a literal bucket comparison
    * (Cms.plannedBucket, the same driver-side md5 the Spark reader uses),
    * one conditional-sum branch per (probe, depth row).
    */
  def streamCms(probes: Seq[Long], depth: Int, width: Int): String = {
    val selects = probes.map { p =>
      val conds = (0 until depth).map { j =>
        val b = graft.pipeline.Cms.plannedBucket(j, p.toString, width)
        s"""sum(CASE WHEN CAST('0x' || substr(md5('$j:' ||
           CAST(user_id AS VARCHAR)), 1, 13) AS BIGINT) % $width = $b
           THEN 1 ELSE 0 END)"""
      }
      s"""SELECT window_start, CAST($p AS BIGINT) AS probe_key,
          CAST(least(${conds.mkString(", ")}) AS BIGINT) AS cms_est
          FROM b GROUP BY window_start"""
    }
    s"""WITH b AS (
          SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
            user_id
          FROM events)
        SELECT * FROM (${selects.mkString(" UNION ALL ")})
        ORDER BY window_start, probe_key"""
  }

  /** Mirrors pipeline_contrastive: per anchor the nearest same-label
    * (positive) and nearest cross-label (hard negative) neighbors, both
    * argmaxes tie-broken on neighbor_id. LEFT JOINs from the anchor list so
    * an anchor with an empty pool keeps its row (nulls), matching Spark's
    * max-over-empty-set semantics.
    */
  def pipelineContrastive(nQueries: Int): String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS ql
                   FROM embeddings WHERE vec_id < $nQueries),
        c AS (SELECT vec_id AS neighbor_id, embedding AS cv, label AS cl
              FROM embeddings),
        s AS (
          SELECT query_id, ql, neighbor_id, cl,
            ${cosineSql("qv", "cv")} AS cosine
          FROM q, c WHERE query_id <> neighbor_id),
        p AS (SELECT query_id, neighbor_id, cosine FROM (
            SELECT query_id, neighbor_id, cosine, row_number() OVER (
              PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rn
            FROM s WHERE ql = cl) WHERE rn = 1),
        n AS (SELECT query_id, neighbor_id, cosine FROM (
            SELECT query_id, neighbor_id, cosine, row_number() OVER (
              PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rn
            FROM s WHERE ql <> cl) WHERE rn = 1)
        SELECT q.query_id,
          p.neighbor_id AS pos_id, p.cosine AS pos_cos,
          n.neighbor_id AS neg_id, n.cosine AS neg_cos
        FROM q LEFT JOIN p ON p.query_id = q.query_id
        LEFT JOIN n ON n.query_id = q.query_id
        ORDER BY q.query_id"""

  /** Mirrors embed_norm_outliers: per-vector squared-norm fold quantized to
    * 2^20 fixed point, then a 3σ outlier flag by the cross-multiplied
    * integer compare (nf·n − S)² > 9·(n·Q − S²) — no float mean/σ ever
    * computed, so the flag is engine-exact.
    */
  def embedNormOutliers: String = {
    val norm2 = "list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, x) -> acc + x)"
    s"""WITH e AS (
          SELECT vec_id, CAST(floor($norm2 * 1048576) AS BIGINT) AS nf
          FROM embeddings),
        st AS (
          SELECT count(*) AS n, sum(CAST(nf AS HUGEINT)) AS s,
                 sum(CAST(nf AS HUGEINT) * nf) AS q
          FROM e)
        SELECT vec_id, nf,
          CAST(CASE WHEN (CAST(nf AS HUGEINT) * n - s) * (CAST(nf AS HUGEINT) * n - s)
                      > (CAST(n AS HUGEINT) * q - s * s) * 9
               THEN 1 ELSE 0 END AS INT) AS flag
        FROM e CROSS JOIN st ORDER BY vec_id"""
  }

  /** Sequential-fold cosine between list columns `$a` and `$b`. */
  private def cosineSql(a: String, b: String): String =
    s"""(list_reduce(list_transform(list_zip($a, $b),
           x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (acc, x) -> acc + x)
        / (sqrt(list_reduce(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, x) -> acc + x))
         * sqrt(list_reduce(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, x) -> acc + x))))"""

  /** Mirrors Dedup.semDedup: nearest-centroid assignment (cosine desc,
    * centroid_id tiebreak — the assignToCentroids rule), within-cell pairs
    * only, drop an item iff some lower-id same-cell item is within the
    * threshold (keep-first). Exactly [[semDedupInc]] with the batch
    * opened to every (non-negative) id — ONE SQL body, so the full and
    * incremental twins cannot drift.
    */
  def semDedup(nCentroids: Int, threshold: Double): String =
    semDedupInc(nCentroids, threshold, batchFrom = 0L)

  /** Mirrors dedup_semdedup_inc: the FROM-SCRATCH semDedup over the
    * whole corpus, restricted to batch ids — keep-first + append-only ids
    * make this identical to the incremental verdicts.
    */
  def semDedupInc(nCentroids: Int, threshold: Double, batchFrom: Long): String =
    s"""WITH cent AS (
          SELECT vec_id AS centroid_id, embedding AS centv FROM embeddings
          WHERE vec_id < $nCentroids),
        assigned AS (
          SELECT vec_id, centroid_id FROM (
            SELECT e.vec_id, cent.centroid_id,
              row_number() OVER (PARTITION BY e.vec_id
                ORDER BY ${cosineSql("e.embedding", "centv")} DESC, centroid_id ASC) AS rn
            FROM embeddings e, cent)
          WHERE rn = 1),
        p AS (
          SELECT a.vec_id AS a_id, b.vec_id AS b_id
          FROM assigned a JOIN assigned b USING (centroid_id)
          WHERE a.vec_id < b.vec_id AND b.vec_id >= $batchFrom),
        dropped AS (
          SELECT DISTINCT b_id FROM p
          JOIN embeddings ea ON ea.vec_id = a_id
          JOIN embeddings eb ON eb.vec_id = b_id
          WHERE ${cosineSql("ea.embedding", "eb.embedding")} >= $threshold)
        SELECT a.vec_id, CAST(a.centroid_id AS BIGINT) AS centroid_id,
            CAST(CASE WHEN d.b_id IS NULL THEN 1 ELSE 0 END AS INT) AS kept
        FROM assigned a LEFT JOIN dropped d ON d.b_id = a.vec_id
        WHERE a.vec_id >= $batchFrom
        ORDER BY a.vec_id"""

  /** Mirrors ann_ivf_diff over the deletion-maintained index: the diff of
    * current vs previous committed version is exactly the deleted members
    * ('removed', no 'added'), each with its frozen-centroid cell.
    */
  def ivfDiffDeleted(nCentroids: Int, deletePred: String): String =
    s"""WITH cent AS (
          SELECT vec_id AS centroid_id, embedding AS centv FROM embeddings
          WHERE vec_id < $nCentroids),
        assigned AS (
          SELECT vec_id, centroid_id FROM (
            SELECT e.vec_id, cent.centroid_id,
              row_number() OVER (PARTITION BY e.vec_id
                ORDER BY ${cosineSql("e.embedding", "centv")} DESC, centroid_id ASC) AS rn
            FROM embeddings e, cent)
          WHERE rn = 1)
        SELECT 'removed' AS change, vec_id AS neighbor_id,
            CAST(centroid_id AS BIGINT) AS centroid_id
        FROM assigned WHERE $deletePred
        ORDER BY change, neighbor_id"""

  /** Mirrors ann_ivf_diff_append over the append-maintained index: the
    * diff of current vs previous committed version is exactly the appended
    * batch ('added', no 'removed'), each with its frozen-centroid cell —
    * possible at all because round-12 appends commit staged versions
    * instead of mutating the live one in place.
    */
  def ivfDiffAppended(nCentroids: Int, appendPred: String): String =
    s"""WITH cent AS (
          SELECT vec_id AS centroid_id, embedding AS centv FROM embeddings
          WHERE vec_id < $nCentroids),
        assigned AS (
          SELECT vec_id, centroid_id FROM (
            SELECT e.vec_id, cent.centroid_id,
              row_number() OVER (PARTITION BY e.vec_id
                ORDER BY ${cosineSql("e.embedding", "centv")} DESC, centroid_id ASC) AS rn
            FROM embeddings e, cent)
          WHERE rn = 1)
        SELECT 'added' AS change, vec_id AS neighbor_id,
            CAST(centroid_id AS BIGINT) AS centroid_id
        FROM assigned WHERE $appendPred
        ORDER BY change, neighbor_id"""

  /** Sign of the projection onto pseudo-random hyperplane `p` must match
    * SignBucketsExpr: component signs via Similarity.planeSign
    * (md5-derived ±1), summed in ascending dim order (left-assoc, matching
    * Spark's reduce) over 64 dims.
    */
  private def signBucketSql(vec: String, planes: Int, planeOffset: Int): String = {
    val bitTerms = (0 until planes).map { b =>
      val p = b + planeOffset
      val terms = (0 until 64).map { i =>
        val sign = if (pipeline.Similarity.planeSign(p, i) > 0) "+" else "-"
        s"$sign CAST($vec[${i + 1}] AS DOUBLE)"
      }.mkString(" ")
      s"(CASE WHEN ($terms) >= 0 THEN ${1 << b} ELSE 0 END)"
    }
    bitTerms.mkString("(", " + ", ")")
  }

  def embeddingNearDup(threshold: Double, bands: Int, planesPerBand: Int): String = {
    val bandSelects = (0 until bands).map { b =>
      s"SELECT vec_id, embedding, $b AS band, ${signBucketSql("embedding", planesPerBand, b * planesPerBand)} AS bucket FROM embeddings"
    }.mkString("\n          UNION ALL ")
    s"""WITH v AS (
          $bandSelects),
        cand AS (
          SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id, a.embedding AS va, b.embedding AS vb
          FROM v a JOIN v b ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
        SELECT a_id, b_id
        FROM cand
        WHERE ${cosineSql("va", "vb")} >= $threshold
        ORDER BY a_id, b_id"""
  }

  /** Semantic-dedup clusters: transitive closure over the embedding
    * near-dup pair list, summarized per cluster (rep, size, id range).
    */
  def embeddingClusters(threshold: Double, bands: Int, planesPerBand: Int): String =
    s"""${closureCtes(embeddingNearDup(threshold, bands, planesPerBand))},
        comp AS (SELECT a AS vec_id, min(b) AS rep FROM reach GROUP BY a)
        SELECT rep AS rep_id, CAST(count(*) AS BIGINT) AS cluster_size,
          CAST(min(vec_id) AS BIGINT) AS min_member,
          CAST(max(vec_id) AS BIGINT) AS max_member
        FROM comp GROUP BY rep ORDER BY rep_id"""

  /** Mirrors Similarity.hammingRerank: 64-dim sign bits packed into two
    * 32-bit words (weights CAST(round(power(2,j))) — the identical
    * expression tree Spark evaluates), Hamming shortlist (integer
    * bit_count(xor) sums, ties → neighbor_id), exact sequential-fold cosine
    * rerank of shortlist members only.
    */
  /** 32-bit sign word of `embedding` starting at dimension `off` — the
    * identical expression tree Similarity.signWord evaluates.
    */
  private def signWordSql(off: Int): String =
    s"""list_sum(list_transform(range(32),
          i -> CASE WHEN embedding[i + ${off + 1}] > 0
               THEN CAST(round(power(2.0, i)) AS BIGINT) ELSE 0 END))"""

  /** The Hamming-shortlist + exact-rerank CTE chain shared by the rerank
    * and recall oracles: bit table, integer Hamming scan, shortlist,
    * cosine rerank, final per-query ranks (CTE `hamf`).
    */
  private def hammingCtes(nQueries: Int, shortlist: Int): String =
    s"""hb AS (
          SELECT vec_id, ${signWordSql(0)} AS w0, ${signWordSql(32)} AS w1
          FROM embeddings),
        hs AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            bit_count(xor(q.w0, c.w0)) + bit_count(xor(q.w1, c.w1)) AS hd
          FROM hb q, hb c
          WHERE q.vec_id < $nQueries AND q.vec_id <> c.vec_id),
        hsl AS (
          SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
              row_number() OVER (PARTITION BY query_id
                ORDER BY hd ASC, neighbor_id ASC) AS hrank
            FROM hs)
          WHERE hrank <= $shortlist),
        hrr AS (
          SELECT hsl.query_id, hsl.neighbor_id,
            ${cosineSql("qe.embedding", "ce.embedding")} AS qcos
          FROM hsl JOIN embeddings qe ON qe.vec_id = hsl.query_id
                   JOIN embeddings ce ON ce.vec_id = hsl.neighbor_id),
        hamf AS (
          SELECT query_id, neighbor_id,
            row_number() OVER (PARTITION BY query_id
              ORDER BY qcos DESC, neighbor_id ASC) AS rank
          FROM hrr)"""

  def annHammingRerank(nQueries: Int, shortlist: Int, k: Int): String =
    s"""WITH ${hammingCtes(nQueries, shortlist)}
        SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank
        FROM hamf WHERE rank <= $k ORDER BY query_id, rank"""

  /** Recall@topK of the Hamming-rerank path against exact brute-force
    * cosine — the ann_pq_recall contract applied to 1-bit quantization:
    * the quality measurement itself is hash-pinned.
    */
  def annHammingRecall(nQueries: Int, shortlist: Int, topK: Int): String =
    s"""WITH qx AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
                    WHERE vec_id < $nQueries),
        cx AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
        sx AS (
          SELECT query_id, neighbor_id, ${cosineSql("qv", "cv")} AS cosine
          FROM qx, cx WHERE query_id <> neighbor_id),
        exact AS (
          SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
              row_number() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id ASC) AS rank
            FROM sx) WHERE rank <= $topK),
        ${hammingCtes(nQueries, shortlist)},
        ham AS (
          SELECT query_id, neighbor_id FROM hamf WHERE rank <= $topK),
        common AS (
          SELECT query_id, count(*) AS n_common
          FROM exact JOIN ham USING (query_id, neighbor_id) GROUP BY query_id)
        SELECT q.query_id, CAST(coalesce(c.n_common, 0) AS BIGINT) AS n_common,
               CAST(coalesce(c.n_common, 0) AS DOUBLE) / $topK AS recall
        FROM (SELECT DISTINCT query_id FROM exact) q
        LEFT JOIN common c USING (query_id) ORDER BY q.query_id"""

  def annLshTopK(nQueries: Int, k: Int, bands: Int, planesPerBand: Int): String = {
    def bandSelects(src: String, idAlias: String) = (0 until bands).map { b =>
      s"SELECT vec_id AS $idAlias, $b AS band, ${signBucketSql("embedding", planesPerBand, b * planesPerBand)} AS bucket FROM $src"
    }.mkString("\n          UNION ALL ")
    s"""WITH qb AS (
          ${bandSelects(s"(SELECT * FROM embeddings WHERE vec_id < $nQueries)", "query_id")}),
        cb AS (
          ${bandSelects("embeddings", "neighbor_id")}),
        cand AS (
          SELECT DISTINCT query_id, neighbor_id
          FROM qb JOIN cb ON qb.band = cb.band AND qb.bucket = cb.bucket
          WHERE query_id <> neighbor_id),
        scored AS (
          SELECT query_id, neighbor_id, ${cosineSql("q.embedding", "c.embedding")} AS cosine
          FROM cand
          JOIN embeddings q ON q.vec_id = query_id
          JOIN embeddings c ON c.vec_id = neighbor_id),
        r AS (
          SELECT query_id, neighbor_id,
            row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
          FROM scored)
        SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank
        FROM r WHERE rank <= $k ORDER BY query_id, rank"""
  }

  /** Full IVF search oracle: corpus assigned to nearest centroid, queries
    * probe their `nprobe` nearest centroids, exact cosine ranks only the
    * probed cells' vectors — mirrors Similarity.ivfTopK (centroids = the
    * first `nCentroids` embeddings, queries = the first `nQueries`).
    */
  /** `survivorFilter` (over `e.vec_id`) restricts which vectors exist in
    * the INDEX — the ann_ivf_delete oracle rebuilds over only the
    * survivors; queries still come from the full embeddings table.
    */
  def annIvfTopK(nQueries: Int, nCentroids: Int, k: Int, nprobe: Int,
      survivorFilter: String = "TRUE"): String =
    s"""WITH cent AS (
          SELECT vec_id AS centroid_id, embedding AS centv FROM embeddings
          WHERE vec_id < $nCentroids),
        assigned AS (
          SELECT neighbor_id, centroid_id FROM (
            SELECT e.vec_id AS neighbor_id, cent.centroid_id,
              row_number() OVER (PARTITION BY e.vec_id
                ORDER BY ${cosineSql("e.embedding", "centv")} DESC, centroid_id ASC) AS rn
            FROM embeddings e, cent WHERE ($survivorFilter))
          WHERE rn = 1),
        probes AS (
          SELECT query_id, centroid_id FROM (
            SELECT q.vec_id AS query_id, cent.centroid_id,
              row_number() OVER (PARTITION BY q.vec_id
                ORDER BY ${cosineSql("q.embedding", "centv")} DESC, centroid_id ASC) AS rn
            FROM (SELECT * FROM embeddings WHERE vec_id < $nQueries) q, cent)
          WHERE rn <= $nprobe),
        cand AS (
          SELECT query_id, neighbor_id
          FROM probes JOIN assigned USING (centroid_id)
          WHERE query_id <> neighbor_id),
        scored AS (
          SELECT query_id, neighbor_id, ${cosineSql("q.embedding", "c.embedding")} AS cosine
          FROM cand
          JOIN embeddings q ON q.vec_id = query_id
          JOIN embeddings c ON c.vec_id = neighbor_id),
        r AS (
          SELECT query_id, neighbor_id,
            row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
          FROM scored)
        SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank
        FROM r WHERE rank <= $k ORDER BY query_id, rank"""

  /** Mirrors ann_ivf_recall_curve: the [[annIvfTopK]] chain evaluated at
    * each probe budget (lateral over the nprobe list), intersected with
    * the brute-force top-k per budget.
    */
  def annIvfRecallCurve(nQueries: Int, nCentroids: Int, k: Int,
      nprobes: Seq[Int]): String = {
    val npList = nprobes.mkString(", ")
    val denom = nQueries * k
    s"""WITH qx AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
                    WHERE vec_id < $nQueries),
        cx AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
        sx AS (
          SELECT query_id, neighbor_id, ${cosineSql("qv", "cv")} AS cosine
          FROM qx, cx WHERE query_id <> neighbor_id),
        exact AS (
          SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
              row_number() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id ASC) AS rank
            FROM sx) WHERE rank <= $k),
        cent AS (
          SELECT vec_id AS centroid_id, embedding AS centv FROM embeddings
          WHERE vec_id < $nCentroids),
        assigned AS (
          SELECT neighbor_id, centroid_id FROM (
            SELECT e.vec_id AS neighbor_id, cent.centroid_id,
              row_number() OVER (PARTITION BY e.vec_id
                ORDER BY ${cosineSql("e.embedding", "centv")} DESC, centroid_id ASC) AS rn
            FROM embeddings e, cent)
          WHERE rn = 1),
        nps AS (SELECT unnest([$npList]) AS np),
        probes AS (
          SELECT np, query_id, centroid_id FROM (
            SELECT n.np, q.vec_id AS query_id, cent.centroid_id,
              row_number() OVER (PARTITION BY n.np, q.vec_id
                ORDER BY ${cosineSql("q.embedding", "centv")} DESC, centroid_id ASC) AS rn
            FROM nps n, (SELECT * FROM embeddings WHERE vec_id < $nQueries) q,
              cent)
          WHERE rn <= np),
        cand AS (
          SELECT np, query_id, neighbor_id
          FROM probes JOIN assigned USING (centroid_id)
          WHERE query_id <> neighbor_id),
        scored AS (
          SELECT np, query_id, neighbor_id,
            ${cosineSql("q.embedding", "c.embedding")} AS cosine
          FROM cand
          JOIN embeddings q ON q.vec_id = query_id
          JOIN embeddings c ON c.vec_id = neighbor_id),
        ivf AS (
          SELECT np, query_id, neighbor_id FROM (
            SELECT np, query_id, neighbor_id,
              row_number() OVER (PARTITION BY np, query_id
                ORDER BY cosine DESC, neighbor_id ASC) AS rank
            FROM scored) WHERE rank <= $k),
        common AS (
          SELECT np, CAST(count(*) AS BIGINT) AS n_common
          FROM ivf JOIN exact USING (query_id, neighbor_id) GROUP BY np)
        SELECT CAST(n.np AS INT) AS nprobe,
          coalesce(c.n_common, 0) AS n_common,
          CAST(coalesce(c.n_common, 0) AS DOUBLE) / CAST($denom AS DOUBLE)
            AS recall
        FROM nps n LEFT JOIN common c ON c.np = n.np ORDER BY nprobe"""
  }

  /** BM25 CTE chain (tok → dl → st → tf → df → sc → bm): fixed-point
    * per-(doc,term) scores so the per-doc sum is order-independent. Shared
    * by the bm25 oracle and the hybrid-RRF oracle.
    */
  private def bm25Ctes(probes: Seq[String], docFilter: String = "TRUE"): String = {
    val inList = probes.map(p => s"'$p'").mkString(", ")
    s"""tok AS (
          SELECT doc_id, t AS term
          FROM documents, unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS u(t)
          WHERE t <> '' AND ($docFilter)),
        dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
        st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
        tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok
               WHERE term IN ($inList) GROUP BY 1, 2),
        df AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok
               WHERE term IN ($inList) GROUP BY 1),
        sc AS (
          SELECT tf.doc_id, tf.term, tf.tf,
            CAST(floor(
              ln((CAST(st.n_docs AS DOUBLE) - df.df + 0.5) / (CAST(df.df AS DOUBLE) + 0.5) + 1.0)
              * (CAST(tf.tf AS DOUBLE) * 2.2)
              / (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) / (CAST(st.sum_dl AS DOUBLE) / CAST(st.n_docs AS DOUBLE))))
              * 1000000.0) AS BIGINT) AS iscore
          FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st),
        bm AS (SELECT doc_id, CAST(sum(iscore) AS BIGINT) AS bm25_fp
               FROM sc GROUP BY doc_id)"""
  }

  /** `docFilter` restricts the corpus (the search_index_delete oracle
    * rebuilds over only the surviving docs — it must hit every CTE,
    * including the n_docs/avgdl statistics).
    */
  def bm25(probes: Seq[String], topK: Int, docFilter: String = "TRUE"): String =
    s"""WITH ${bm25Ctes(probes, docFilter)}
        SELECT doc_id, bm25_fp FROM bm
        ORDER BY bm25_fp DESC, doc_id LIMIT $topK"""

  /** Mirrors Stats.poissonBootstrap: per (row, replicate), a Poisson(1)
    * copy count from the 52-bit md5 lattice against the SAME Scala-computed
    * CDF thresholds the Spark plan inlines; replicate means are single
    * divisions of exact decimal/integer sums.
    */
  def poissonBootstrap(replicates: Int): String = {
    val ts = graft.operators.Stats.poissonThresholdsHex
    val cntCase = "CASE " + ts.zipWithIndex
      .map { case (t, k) => s"WHEN d5 < '$t' THEN $k" }
      .mkString(" ") + s" ELSE ${ts.size} END"
    s"""WITH reps AS (SELECT CAST(range AS BIGINT) AS b FROM range($replicates)),
        x AS (
          SELECT CAST(l_orderkey AS VARCHAR) || '-'
                   || CAST(l_linenumber AS VARCHAR) AS k,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                 AS vc
          FROM lineitem),
        d AS (
          SELECT b, vc,
              substr(md5(k || ':' || CAST(b // 6 AS VARCHAR)),
                CAST(1 + 5 * (b % 6) AS INT), 5) AS d5
          FROM x CROSS JOIN reps),
        c AS (SELECT b, vc, $cntCase AS cnt FROM d)
        SELECT b, CAST(sum(cnt) AS BIGINT) AS n_eff,
            CASE WHEN sum(cnt) = 0 THEN 0.0
            ELSE CAST(sum(vc * cnt) AS DOUBLE) / 100.0
              / CAST(sum(cnt) AS DOUBLE)
            END AS mean
        FROM c GROUP BY b ORDER BY b"""
  }

  /** Mirrors Experiment.bhFdr — the same Scala-minted BH critical-z
    * literals, the same Welch-z moment trees, the same step-up windows.
    */
  def bhFdr(groups: Seq[String], alpha: Double = 0.05): String = {
    val zc = graft.pipeline.Experiment.bhCriticalZ(groups.size, alpha)
    val inList = groups.map(g => s"'$g'").mkString(", ")
    val critCase = "CASE " + zc.zipWithIndex
      .map { case (c, i) => s"WHEN rnk = ${i + 1} THEN $c" }
      .mkString(" ") + " END"
    s"""WITH c AS (
          SELECT event_type AS grp,
              CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 2) < '80'
                THEN 1 ELSE 0 END AS is_t,
              CAST(value AS DECIMAL(18,2)) AS v
          FROM events WHERE event_type IN ($inList)),
        m AS (
          SELECT grp,
              sum(CASE WHEN is_t = 1 THEN 1 ELSE 0 END) AS n_t,
              sum(CASE WHEN is_t = 1 THEN v END) AS sy_t,
              sum(CASE WHEN is_t = 1 THEN v * v END) AS ss_t,
              sum(CASE WHEN is_t = 0 THEN 1 ELSE 0 END) AS n_c,
              sum(CASE WHEN is_t = 0 THEN v END) AS sy_c,
              sum(CASE WHEN is_t = 0 THEN v * v END) AS ss_c
          FROM c GROUP BY grp),
        zt AS (
          -- Welch terms: unbiased sample variance, popvar/(n-1) per arm
          SELECT grp, n_t, n_c,
              CASE WHEN n_t <= 1 OR n_c <= 1 THEN 0.0
              WHEN (CAST(ss_t AS DOUBLE) / CAST(n_t AS DOUBLE)
                  - (CAST(sy_t AS DOUBLE) / CAST(n_t AS DOUBLE))
                    * (CAST(sy_t AS DOUBLE) / CAST(n_t AS DOUBLE)))
                / (CAST(n_t AS DOUBLE) - 1.0)
                + (CAST(ss_c AS DOUBLE) / CAST(n_c AS DOUBLE)
                  - (CAST(sy_c AS DOUBLE) / CAST(n_c AS DOUBLE))
                    * (CAST(sy_c AS DOUBLE) / CAST(n_c AS DOUBLE)))
                / (CAST(n_c AS DOUBLE) - 1.0) = 0.0 THEN 0.0
              ELSE (CAST(sy_t AS DOUBLE) / CAST(n_t AS DOUBLE)
                  - CAST(sy_c AS DOUBLE) / CAST(n_c AS DOUBLE))
                / sqrt((CAST(ss_t AS DOUBLE) / CAST(n_t AS DOUBLE)
                    - (CAST(sy_t AS DOUBLE) / CAST(n_t AS DOUBLE))
                      * (CAST(sy_t AS DOUBLE) / CAST(n_t AS DOUBLE)))
                  / (CAST(n_t AS DOUBLE) - 1.0)
                  + (CAST(ss_c AS DOUBLE) / CAST(n_c AS DOUBLE)
                    - (CAST(sy_c AS DOUBLE) / CAST(n_c AS DOUBLE))
                      * (CAST(sy_c AS DOUBLE) / CAST(n_c AS DOUBLE)))
                  / (CAST(n_c AS DOUBLE) - 1.0))
              END AS z
          FROM m),
        r AS (
          SELECT grp, n_t, n_c, z,
              row_number() OVER (ORDER BY abs(z) DESC, grp) AS rnk
          FROM zt),
        r2 AS (SELECT r.*, $critCase AS z_crit FROM r),
        ks AS (
          SELECT max(CASE WHEN abs(z) >= z_crit THEN rnk END) AS kstar
          FROM r2)
        SELECT grp, CAST(n_t AS BIGINT) AS n_t, CAST(n_c AS BIGINT) AS n_c,
            round(z, 6) AS z, CAST(rnk AS BIGINT) AS rank,
            round(z_crit, 6) AS z_crit,
            rnk <= coalesce(kstar, 0) AS rejected
        FROM r2 CROSS JOIN ks ORDER BY rank"""
  }

  /** Mirrors Experiment.powerMde — K = (z_{1−α/2}+z_{1−β})² prints from
    * the SAME Scala double (shortest-roundtrip repr, so DuckDB parses the
    * identical value), moments and grid expressions in the same order.
    */
  def powerMde(pcts: Seq[Int]): String = {
    val k = graft.pipeline.Experiment.powerK80
    val grid = pcts.mkString(", ")
    s"""WITH pu AS (
          SELECT user_id,
              CAST(coalesce(sum(CAST(value AS DECIMAL(18,2))), 0)
                AS DECIMAL(18,2)) AS y
          FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        m AS (
          SELECT count(*) AS n, CAST(sum(y) AS DOUBLE) AS sy,
              CAST(sum(y * y) AS DOUBLE) AS syy
          FROM pu),
        g AS (SELECT unnest([$grid]) AS mde_pct)
        SELECT mde_pct,
            round(sy / CAST(n AS DOUBLE) * CAST(mde_pct AS DOUBLE) / 100.0, 6)
              AS mde_abs,
            CAST(ceil($k * 2.0
              * (CASE WHEN n <= 1 THEN 0.0
                 ELSE (syy / CAST(n AS DOUBLE)
                   - (sy / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))
                   * (CAST(n AS DOUBLE) / (CAST(n AS DOUBLE) - 1.0)) END)
              / ((sy / CAST(n AS DOUBLE) * CAST(mde_pct AS DOUBLE) / 100.0)
                * (sy / CAST(n AS DOUBLE) * CAST(mde_pct AS DOUBLE) / 100.0)))
              AS BIGINT) AS n_per_arm
        FROM m CROSS JOIN g ORDER BY mde_pct"""
  }

  /** Mirrors SearchIndex.rankingEval over the per-term BM25 scores:
    * graded rel = least(tf, 3), ranking (iscore desc, doc_id), nDCG@k in
    * fixed point with the SAME [[graft.pipeline.SearchIndex.dcgWeights]]
    * literals the Spark plan inlines, MRR of the first rel=3 hit, and
    * recall@k of rel ≥ 2 — every output an exact integer.
    */
  def searchEval(probes: Seq[String], k: Int): String = {
    val w = graft.pipeline.SearchIndex.dcgWeights(k)
    def wcase(rank: String) =
      "CASE " + w.zipWithIndex
        .map { case (wi, i) => s"WHEN $rank = ${i + 1} THEN $wi" }
        .mkString(" ") + " ELSE 0 END"
    s"""WITH ${bm25Ctes(probes)},
        r AS (
          SELECT term, doc_id, least(tf, 3) AS rel,
              row_number() OVER (PARTITION BY term
                ORDER BY iscore DESC, doc_id) AS rnk,
              row_number() OVER (PARTITION BY term
                ORDER BY least(tf, 3) DESC, doc_id) AS irank
          FROM sc),
        a AS (
          SELECT term AS query, count(*) AS n_cand,
              sum(CASE WHEN rnk <= $k THEN rel * ${wcase("rnk")} ELSE 0 END)
                AS dcg_fp,
              sum(CASE WHEN irank <= $k THEN rel * ${wcase("irank")} ELSE 0 END)
                AS idcg_fp,
              min(CASE WHEN rel = 3 THEN rnk END) AS rank_first_raw,
              sum(CASE WHEN rel >= 2 THEN 1 ELSE 0 END) AS rel2_total,
              sum(CASE WHEN rel >= 2 AND rnk <= $k THEN 1 ELSE 0 END)
                AS rel2_top
          FROM r GROUP BY term)
        SELECT query, CAST(n_cand AS BIGINT) AS n_cand,
            CAST(dcg_fp AS BIGINT) AS dcg_fp,
            CAST(idcg_fp AS BIGINT) AS idcg_fp,
            CAST(CASE WHEN idcg_fp = 0 THEN 0
              ELSE dcg_fp * 1000000 // idcg_fp END AS BIGINT) AS ndcg_ppm,
            CAST(coalesce(rank_first_raw, 0) AS BIGINT) AS rank_first,
            CAST(CASE WHEN rank_first_raw IS NULL THEN 0
              ELSE 1000000 // rank_first_raw END AS BIGINT) AS rr_ppm,
            CAST(rel2_total AS BIGINT) AS rel2_total,
            CAST(rel2_top AS BIGINT) AS rel2_top,
            CAST(CASE WHEN rel2_total = 0 THEN 0
              ELSE rel2_top * 1000000 // rel2_total END AS BIGINT)
              AS recall2_ppm
        FROM a ORDER BY query"""
  }

  /** Hybrid search: BM25 rank list ⊕ cosine rank list fused with reciprocal
    * rank fusion (score = Σ 1/(rrfK + rank)). Ranks are integers from the
    * engines' bit-identical scoring, so the fused doubles are bit-identical
    * too.
    */
  def hybridRrf(probes: Seq[String], probeVecId: Long, kEach: Int,
      topK: Int, rrfK: Int = 60): String =
    s"""WITH ${bm25Ctes(probes)},
        tr AS (SELECT doc_id,
                 row_number() OVER (ORDER BY bm25_fp DESC, doc_id) AS rt FROM bm),
        qv AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $probeVecId),
        vs AS (SELECT vec_id AS doc_id, ${cosineSql("embedding", "qv")} AS cosine
               FROM embeddings, qv WHERE vec_id <> $probeVecId),
        vr AS (SELECT doc_id,
                 row_number() OVER (ORDER BY cosine DESC, doc_id) AS rv FROM vs),
        trk AS (SELECT * FROM tr WHERE rt <= $kEach),
        vrk AS (SELECT * FROM vr WHERE rv <= $kEach),
        f AS (SELECT coalesce(trk.doc_id, vrk.doc_id) AS doc_id,
                coalesce(1.0 / ($rrfK + rt), 0.0) + coalesce(1.0 / ($rrfK + rv), 0.0) AS rrf
              FROM trk FULL OUTER JOIN vrk ON trk.doc_id = vrk.doc_id)
        SELECT doc_id, round(rrf, 8) AS rrf FROM f
        ORDER BY rrf DESC, doc_id LIMIT $topK"""

  /** Filtered vector search: the ann_topk oracle with a metadata predicate
    * (documents.lang) restricting the candidate set.
    */
  def annTopKFiltered(nQueries: Int, k: Int, lang: String): String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < $nQueries),
        c AS (SELECT vec_id AS neighbor_id, embedding AS cv
              FROM embeddings JOIN documents ON vec_id = doc_id
              WHERE lang = '$lang'),
        s AS (
          SELECT query_id, neighbor_id, ${cosineSql("qv", "cv")} AS cosine
          FROM q, c WHERE query_id <> neighbor_id),
        r AS (
          SELECT query_id, neighbor_id,
            row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
          FROM s)
        SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank
        FROM r WHERE rank <= $k ORDER BY query_id, rank"""

  /** Mirrors the PQ recall@k evaluation: the exact brute-force top-k and
    * the PQ/ADC top-k (both deterministic) joined per query — n_common is
    * the intersection size, recall its /k fraction. An index-quality
    * measurement that is itself hash-pinned, because both rankings are.
    */
  def annPqRecall(nQueries: Int, m: Int, sub: Int, k: Int, iters: Int,
      topK: Int): String =
    s"""WITH qx AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
                    WHERE vec_id < $nQueries),
        cx AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
        sx AS (
          SELECT query_id, neighbor_id, ${cosineSql("qv", "cv")} AS cosine
          FROM qx, cx WHERE query_id <> neighbor_id),
        exact AS (
          SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
              row_number() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id ASC) AS rank
            FROM sx) WHERE rank <= $topK),
        ${pqCtes(nQueries, m, sub, k, iters, Long.MaxValue)},
        adc AS (SELECT l.query_id, n.vec_id AS neighbor_id, sum(l.pd) AS adc_dist
                FROM codes n JOIN lut l ON l.subspace = n.subspace AND l.code = n.code
                WHERE l.query_id != n.vec_id GROUP BY 1,2),
        pq AS (
          SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
              row_number() OVER (PARTITION BY query_id
                ORDER BY adc_dist, neighbor_id) AS rank FROM adc)
          WHERE rank <= $topK),
        common AS (
          SELECT query_id, count(*) AS n_common
          FROM exact JOIN pq USING (query_id, neighbor_id) GROUP BY query_id)
        SELECT q.query_id, CAST(coalesce(c.n_common, 0) AS BIGINT) AS n_common,
               CAST(coalesce(c.n_common, 0) AS DOUBLE) / $topK AS recall
        FROM (SELECT DISTINCT query_id FROM exact) q
        LEFT JOIN common c USING (query_id) ORDER BY q.query_id"""

  /** Mirrors ann_matryoshka_recall: exact top-k by full-dimension cosine vs
    * top-k by the first-$dims prefix (Matryoshka truncation), intersection
    * size per query. Both rankings are deterministic, so the quality
    * measurement itself is hash-pinned — the PQ-recall contract applied to
    * dimensionality truncation.
    */
  def annMatryoshkaRecall(nQueries: Int, dims: Int, topK: Int): String =
    s"""WITH qx AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
                    WHERE vec_id < $nQueries),
        cx AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
        sx AS (
          SELECT query_id, neighbor_id, ${cosineSql("qv", "cv")} AS cosine,
            ${cosineSql(s"qv[1:$dims]", s"cv[1:$dims]")} AS cosine_t
          FROM qx, cx WHERE query_id <> neighbor_id),
        full_k AS (
          SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
              row_number() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id ASC) AS rank
            FROM sx) WHERE rank <= $topK),
        trunc_k AS (
          SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
              row_number() OVER (PARTITION BY query_id
                ORDER BY cosine_t DESC, neighbor_id ASC) AS rank
            FROM sx) WHERE rank <= $topK),
        common AS (
          SELECT query_id, count(*) AS n_common
          FROM full_k JOIN trunc_k USING (query_id, neighbor_id)
          GROUP BY query_id)
        SELECT q.query_id, CAST(coalesce(c.n_common, 0) AS BIGINT) AS n_common,
               CAST(coalesce(c.n_common, 0) AS DOUBLE) / $topK AS recall
        FROM (SELECT DISTINCT query_id FROM full_k) q
        LEFT JOIN common c USING (query_id) ORDER BY q.query_id"""

  def annTopK(nQueries: Int, k: Int): String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < $nQueries),
        c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
        s AS (
          SELECT query_id, neighbor_id, ${cosineSql("qv", "cv")} AS cosine
          FROM q, c WHERE query_id <> neighbor_id),
        r AS (
          SELECT query_id, neighbor_id,
            row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
          FROM s)
        SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank
        FROM r WHERE rank <= $k ORDER BY query_id, rank"""

  /** Int8-quantized ANN oracle: mirrors QuantizeInt8Expr exactly — per-vector
    * maxabs scale, `floor(x * 127 / maxabs + 0.5)` in one left-assoc double
    * expression, all-zero vectors quantize to zeros — then exact integer dot
    * products and the same `dot / (sqrt(qn) * sqrt(cn))` association as
    * Similarity.quantizedTopK. Codes are kept as BIGINT (values are in
    * [-127, 127]; only the dot products matter).
    */
  def annQuantizedTopK(nQueries: Int, k: Int): String = {
    val maxabs = "list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))"
    val quant =
      s"""CASE WHEN $maxabs > 0 THEN
            list_transform(embedding,
              x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / $maxabs + 0.5) AS BIGINT))
          ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END"""
    def idot(a: String, b: String) =
      s"CAST(list_sum(list_transform(list_zip($a, $b), x -> x[1] * x[2])) AS BIGINT)"
    s"""WITH q8 AS (
          SELECT vec_id, $quant AS qv FROM embeddings),
        n AS (
          SELECT vec_id, qv, ${idot("qv", "qv")} AS nrm FROM q8),
        s AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            CAST(${idot("q.qv", "c.qv")} AS DOUBLE)
              / (sqrt(CAST(q.nrm AS DOUBLE)) * sqrt(CAST(c.nrm AS DOUBLE))) AS qcos
          FROM n q, n c
          WHERE q.vec_id < $nQueries AND q.vec_id <> c.vec_id),
        r AS (
          SELECT query_id, neighbor_id,
            row_number() OVER (PARTITION BY query_id ORDER BY qcos DESC, neighbor_id ASC) AS rank
          FROM s)
        SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank
        FROM r WHERE rank <= $k ORDER BY query_id, rank"""
  }

  /** Mirrors the ENTIRE Pq pipeline — fixed-point image, deterministic
    * seeding, every Lloyd round (exact integer argmin, ties → smaller code;
    * floor(sum/count) re-center; empty clusters keep their centroid),
    * encoding, and the ADC probe — from the base table. All arithmetic is
    * exact longs (sums < 2⁵³ keep the re-center division exact), so
    * training + index + probe pin end-to-end by hash.
    */
  /** Shared PQ CTE chain (iv → sv → cb0..cbN → codes → lut), reused by the
    * plain/incremental ADC oracles and the IVF-PQ composition. trainMaxId <
    * MaxValue mirrors the INCREMENTAL index: the codebook is trained on the
    * old corpus (vec_id < trainMaxId) only, then the whole corpus (old +
    * appended batch) is encoded under that frozen codebook.
    */
  private def pqCtes(nQueries: Int, m: Int, sub: Int, k: Int, iters: Int,
      trainMaxId: Long): String = {
    val trainWhere =
      if (trainMaxId == Long.MaxValue) "" else s" WHERE s.vec_id < $trainMaxId"
    def sqd(a: String, b: String) =
      s"list_sum(list_transform(range($sub), j -> ($a[j+1]-$b[j+1])*($a[j+1]-$b[j+1])))"
    val rounds = (1 to iters).map { i =>
      val p = i - 1
      s"""a$i AS (SELECT vec_id, subspace, code, sv FROM (
           SELECT s.vec_id, s.subspace, c.code, s.sv,
                  row_number() OVER (PARTITION BY s.vec_id, s.subspace
                    ORDER BY ${sqd("s.sv", "c.cent")}, c.code) AS rn
           FROM sv s JOIN cb$p c USING (subspace)$trainWhere) WHERE rn = 1),
        m$i AS (SELECT subspace, code, j.range AS pos,
                   CAST(floor(CAST(sum(sv[j.range+1]) AS DOUBLE)/count(*)) AS BIGINT) AS cj
                 FROM a$i, range($sub) j GROUP BY 1,2,3),
        n$i AS (SELECT subspace, code, list(cj ORDER BY pos) AS cent FROM m$i GROUP BY 1,2),
        cb$i AS (SELECT c.subspace, c.code, coalesce(n.cent, c.cent) AS cent
                  FROM cb$p c LEFT JOIN n$i n USING (subspace, code))"""
    }.mkString(",\n        ")
    s"""iv AS (
          SELECT vec_id,
            list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS iv
          FROM embeddings),
        sv AS (SELECT vec_id, s.range AS subspace,
                 list_slice(iv, s.range*$sub+1, (s.range+1)*$sub) AS sv
               FROM iv, range($m) s),
        cb0 AS (SELECT subspace, CAST(vec_id AS INTEGER) AS code, sv AS cent
                FROM sv WHERE vec_id < $k),
        $rounds,
        codes AS (SELECT vec_id, subspace, code FROM (
           SELECT s.vec_id, s.subspace, c.code,
                  row_number() OVER (PARTITION BY s.vec_id, s.subspace
                    ORDER BY ${sqd("s.sv", "c.cent")}, c.code) AS rn
           FROM sv s JOIN cb$iters c USING (subspace)) WHERE rn = 1),
        lut AS (SELECT q.vec_id AS query_id, c.subspace, c.code,
                  ${sqd("q.sv", "c.cent")} AS pd
                FROM sv q JOIN cb$iters c USING (subspace) WHERE q.vec_id < $nQueries)"""
  }

  /** ADC top-k select over an `adc(query_id, neighbor_id, adc_dist)` CTE. */
  private def adcTopKSelect(topK: Int): String =
    s"""SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
               CAST(adc_dist AS BIGINT) AS adc_dist FROM (
          SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS rank FROM adc)
        WHERE rank <= $topK ORDER BY query_id, rank"""

  def annPqAdc(nQueries: Int, m: Int, sub: Int, k: Int, iters: Int, topK: Int,
      trainMaxId: Long = Long.MaxValue): String =
    s"""WITH ${pqCtes(nQueries, m, sub, k, iters, trainMaxId)},
        adc AS (SELECT l.query_id, n.vec_id AS neighbor_id, sum(l.pd) AS adc_dist
                FROM codes n JOIN lut l ON l.subspace = n.subspace AND l.code = n.code
                WHERE l.query_id != n.vec_id GROUP BY 1,2)
        ${adcTopKSelect(topK)}"""

  /** Mirrors embed_kmeans: full-vector k-means IS the m=1 degenerate of the
    * PQ training chain (one subspace spanning all 64 dims), so the oracle
    * reuses [[pqCtes]] verbatim — deterministic seeding, exact-integer
    * Lloyd rounds, floor means — and summarizes each cluster as
    * (code, member count, centroid component sum).
    */
  def embedKmeans(dim: Int, k: Int, iters: Int): String =
    s"""WITH ${pqCtes(0, 1, dim, k, iters, Long.MaxValue)},
        g AS (SELECT code, CAST(count(*) AS BIGINT) AS n_vecs
              FROM codes GROUP BY code),
        cs AS (SELECT code, CAST(list_sum(cent) AS BIGINT) AS cent_sum
               FROM cb$iters)
        SELECT CAST(g.code AS INT) AS code, g.n_vecs, cs.cent_sum
        FROM g JOIN cs USING (code) ORDER BY code"""

  /** Mirrors embed_cluster_quality: the k-means chain of [[embedKmeans]]
    * extended with per-cluster cohesion (sum of member squared-L2 to the
    * centroid) and separation (min squared-L2 to another centroid).
    */
  def embedClusterQuality(dim: Int, k: Int, iters: Int): String = {
    def sqd(a: String, b: String) =
      s"list_sum(list_transform(range($dim), j -> ($a[j+1]-$b[j+1])*($a[j+1]-$b[j+1])))"
    s"""WITH ${pqCtes(0, 1, dim, k, iters, Long.MaxValue)},
        intra AS (
          SELECT c.code, CAST(count(*) AS BIGINT) AS n_vecs,
            sum(${sqd("s.sv", "cb.cent")}) AS intra_sum
          FROM codes c
          JOIN sv s ON s.vec_id = c.vec_id AND s.subspace = c.subspace
          JOIN cb$iters cb ON cb.code = c.code
          GROUP BY c.code),
        sep AS (
          SELECT a.code, min(${sqd("a.cent", "b.cent")}) AS sep_min
          FROM cb$iters a JOIN cb$iters b ON a.code <> b.code
          GROUP BY a.code)
        SELECT CAST(i.code AS INT) AS code, i.n_vecs,
          CAST(i.intra_sum AS BIGINT) AS intra_sum,
          CAST(s.sep_min AS BIGINT) AS sep_min
        FROM intra i JOIN sep s USING (code) ORDER BY code"""
  }

  /** Mirrors Pq.buildIvfPqIndex + ivfPqProbe: coarse cosine cells (the IVF
    * oracle's assignment/probe CTEs) composed with the PQ training/encode/
    * LUT chain; ADC scoring restricted to residents of probed cells.
    */
  /** Shared IVF-PQ prefix: coarse cells, assignment, probes, the PQ chain,
    * and the cell-restricted `adc(query_id, neighbor_id, adc_dist)` CTE.
    */
  private def ivfPqAdcCtes(nQueries: Int, nCentroids: Int, nprobe: Int,
      m: Int, sub: Int, k: Int, iters: Int, trainMaxId: Long): String =
    s"""cent AS (
          SELECT vec_id AS centroid_id, embedding AS centv FROM embeddings
          WHERE vec_id < $nCentroids),
        assigned AS (
          SELECT vec_id, centroid_id FROM (
            SELECT e.vec_id, cent.centroid_id,
              row_number() OVER (PARTITION BY e.vec_id
                ORDER BY ${cosineSql("e.embedding", "centv")} DESC, centroid_id ASC) AS rn
            FROM embeddings e, cent)
          WHERE rn = 1),
        probes AS (
          SELECT query_id, centroid_id FROM (
            SELECT q.vec_id AS query_id, cent.centroid_id,
              row_number() OVER (PARTITION BY q.vec_id
                ORDER BY ${cosineSql("q.embedding", "centv")} DESC, centroid_id ASC) AS rn
            FROM (SELECT * FROM embeddings WHERE vec_id < $nQueries) q, cent)
          WHERE rn <= $nprobe),
        ${pqCtes(nQueries, m, sub, k, iters, trainMaxId)},
        adc AS (
          SELECT l.query_id, n.vec_id AS neighbor_id, sum(l.pd) AS adc_dist
          FROM codes n
          JOIN assigned a ON a.vec_id = n.vec_id
          JOIN probes p ON p.centroid_id = a.centroid_id
          JOIN lut l ON l.query_id = p.query_id
            AND l.subspace = n.subspace AND l.code = n.code
          WHERE l.query_id != n.vec_id GROUP BY 1, 2)"""

  def annIvfPq(nQueries: Int, nCentroids: Int, nprobe: Int, m: Int, sub: Int,
      k: Int, iters: Int, topK: Int, trainMaxId: Long = Long.MaxValue): String =
    s"""WITH ${ivfPqAdcCtes(nQueries, nCentroids, nprobe, m, sub, k, iters, trainMaxId)}
        ${adcTopKSelect(topK)}"""

  /** Mirrors Pq.ivfPqRefine: the ADC shortlist (rank ≤ `shortlist` by
    * compressed distance) re-scored with the exact sequential-fold cosine
    * against RAW vectors — FAISS's refine stage. Same prefix CTEs as
    * [[annIvfPq]]; only the closing selects differ.
    */
  def annIvfPqRefined(nQueries: Int, nCentroids: Int, nprobe: Int, m: Int,
      sub: Int, k: Int, iters: Int, shortlist: Int, topK: Int,
      trainMaxId: Long = Long.MaxValue): String =
    s"""WITH ${ivfPqAdcCtes(nQueries, nCentroids, nprobe, m, sub, k, iters, trainMaxId)},
        sl AS (
          SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id, row_number() OVER (
              PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS arank
            FROM adc)
          WHERE arank <= $shortlist),
        rr AS (
          SELECT sl.query_id, sl.neighbor_id,
            ${cosineSql("qe.embedding", "ce.embedding")} AS qcos
          FROM sl JOIN embeddings qe ON qe.vec_id = sl.query_id
                  JOIN embeddings ce ON ce.vec_id = sl.neighbor_id)
        SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM (
          SELECT query_id, neighbor_id, row_number() OVER (
            PARTITION BY query_id ORDER BY qcos DESC, neighbor_id) AS rank
          FROM rr)
        WHERE rank <= $topK ORDER BY query_id, rank"""

  def annIvfAssign(nCentroids: Int): String =
    s"""WITH cent AS (SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings WHERE vec_id < $nCentroids),
        s AS (
          SELECT e.vec_id, centroid_id, ${cosineSql("e.embedding", "cv")} AS sim
          FROM embeddings e, cent),
        r AS (
          SELECT vec_id, centroid_id,
            row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, centroid_id ASC) AS rn
          FROM s)
        SELECT vec_id, centroid_id FROM r WHERE rn = 1 ORDER BY vec_id"""

  /** Mirrors embed_cluster_purity: the replayed IVF assignment joined to
    * ground-truth labels; per-cluster majority via row_number (= Spark's
    * min(struct(−cnt, label)) argmax), exact ppm purity.
    */
  def clusterPurity(nCentroids: Int): String =
    s"""WITH a AS (SELECT * FROM (${annIvfAssign(nCentroids)}) x),
        cl AS (
          SELECT centroid_id, label, count(*) AS cnt
          FROM a JOIN embeddings e ON a.vec_id = e.vec_id GROUP BY 1, 2),
        r AS (
          SELECT centroid_id, label, cnt,
            row_number() OVER (PARTITION BY centroid_id
              ORDER BY cnt DESC, label ASC) AS rn,
            sum(cnt) OVER (PARTITION BY centroid_id) AS n_members
          FROM cl)
        SELECT centroid_id, CAST(n_members AS BIGINT) AS n_members,
          CAST(label AS INT) AS majority_label,
          CAST(cnt AS BIGINT) AS majority_n,
          CAST((cnt * 1000000) // n_members AS BIGINT) AS purity_ppm
        FROM r WHERE rn = 1 ORDER BY centroid_id"""

  def subwords: String =
    """SELECT doc_id,
         CAST(list_reduce(list_transform(
           string_split(regexp_replace(regexp_replace(text,
             '([0-9])([a-zA-Z])', '\1 \2', 'g'), '([a-zA-Z])([0-9])', '\1 \2', 'g'), ' '),
           p -> CAST(ceil(length(p) / 4.0) AS INT)), (acc, x) -> acc + x) AS INT) AS n_subwords
       FROM documents ORDER BY doc_id"""

  /** Shared quality-score CTE chain (x → y → scored) over a source relation
    * providing (doc_id, text[, carry columns]) — ONE rendering of the
    * semantics-bearing arithmetic so `quality` and `curate` cannot drift
    * from each other or from TextAnalysis.qualityScore.
    */
  private def qualityCtes(from: String, carry: String): String = {
    val stop = graft.pipeline.TextAnalysis.stopwordsSqlList
    s"""x AS (
          SELECT doc_id, $carry
            CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
            CAST(len(list_filter(string_split(text, ' '), t -> t IN ($stop))) AS DOUBLE) AS stop_hits,
            CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS n_distinct,
            CAST(length(text) AS DOUBLE) AS n_chars
          FROM $from),
        y AS (
          SELECT doc_id, $carry
            CASE WHEN n_tok BETWEEN 20 AND 2000 THEN 1.0
                 WHEN n_tok < 20 THEN n_tok / 20.0
                 ELSE 2000.0 / n_tok END AS len_score,
            CASE WHEN (stop_hits / n_tok) BETWEEN 0.01 AND 0.6 THEN 1.0 ELSE 0.5 END AS stop_score,
            n_distinct / n_tok AS diversity,
            CASE WHEN (n_chars / n_tok) BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.5 END AS band_score
          FROM x),
        scored AS (
          SELECT doc_id, $carry
            round(len_score * 0.4 + stop_score * 0.2 + diversity * 0.2 + band_score * 0.2, 6) AS quality
          FROM y)"""
  }

  def quality: String =
    s"""WITH ${qualityCtes("documents", "")}
        SELECT doc_id, quality FROM scored ORDER BY doc_id"""

  /** Curriculum ordering: quality-threshold difficulty buckets (easy =
    * high quality first), deterministic md5 shuffle within a bucket —
    * the seeded-shuffle every epoch of a training run replays exactly.
    */
  def curriculum(topK: Int): String =
    s"""WITH ${qualityCtes("documents", "")},
        b AS (
          SELECT doc_id,
            CAST(CASE WHEN quality >= 0.66 THEN 2
                      WHEN quality >= 0.33 THEN 1 ELSE 0 END AS INT) AS bucket,
            substr(md5(CAST(doc_id AS VARCHAR) || ':epoch0'), 1, 13) AS shuffle_key
          FROM scored)
        SELECT doc_id, bucket, shuffle_key FROM b
        ORDER BY bucket DESC, shuffle_key ASC, doc_id ASC LIMIT $topK"""

  /** Curation pipeline oracle: exact dedup (min doc per md5(text)) →
    * quality score → keep docs at or above their language's median quality.
    * The quality arithmetic is the same expression chain as `quality`
    * (shared stopword list), applied to the deduped set with lang carried.
    */
  def curate: String =
    s"""WITH dd AS (
          SELECT doc_id, lang, text,
            row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
          FROM documents),
        ${qualityCtes("dd WHERE rn = 1", "lang,")},
        med AS (
          SELECT lang, quantile_cont(quality, 0.5) AS m FROM scored GROUP BY lang)
        SELECT s.doc_id, s.lang, s.quality
        FROM scored s JOIN med USING (lang)
        WHERE s.quality >= m
        ORDER BY s.doc_id"""

  /** Mirrors the composed pipeline_train_prep query: curate (dedup →
    * quality ≥ language median) → hash split assignment → per-(split, lang)
    * report. Split boundaries are the same two-hex-char md5 buckets as
    * Splits.assignSplit; min/max of the double quality are
    * order-independent, so the report is hash-exact.
    */
  def trainPrep(testBuckets: Int = 13, valBuckets: Int = 26): String = {
    val testHex = f"$testBuckets%02x"
    val valHex = f"${testBuckets + valBuckets}%02x"
    s"""WITH dd AS (
          SELECT doc_id, lang, text,
            row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
          FROM documents),
        ${qualityCtes("dd WHERE rn = 1", "lang,")},
        med AS (
          SELECT lang, quantile_cont(quality, 0.5) AS m FROM scored GROUP BY lang),
        kept AS (
          SELECT s.doc_id, s.lang, s.quality
          FROM scored s JOIN med USING (lang) WHERE s.quality >= m),
        sp AS (
          SELECT lang, quality,
            CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '$testHex' THEN 'test'
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '$valHex' THEN 'val'
                 ELSE 'train' END AS split
          FROM kept)
        SELECT split, lang, CAST(count(*) AS BIGINT) AS n_docs,
            min(quality) AS min_q, max(quality) AS max_q
        FROM sp GROUP BY 1, 2 ORDER BY split, lang"""
  }

  /** Per-source corpus report composing the quality and langid generators
    * (same expression chains, joined on doc_id): doc counts, fixed-point
    * mean quality, low-quality counts, char volume, and langid-vs-label
    * agreement — the table a curation run consults before dropping or
    * down-weighting a source. Quality doubles are hash-equal cross-engine
    * (text_quality proves it), so floor(q·1e6 + 0.5) is the same long on
    * both sides and the mean is an exact-integer ratio.
    */
  def sourceQuality: String =
    s"""WITH q AS (SELECT doc_id, quality FROM ($quality) qq),
        l AS (SELECT doc_id, predicted_lang FROM ($langId) ll),
        j AS (
          SELECT d.source, d.n_chars,
              CAST(floor(q.quality * 1000000 + 0.5) AS BIGINT) AS q_fp,
              CASE WHEN l.predicted_lang = d.lang THEN 1 ELSE 0 END AS lang_ok
          FROM documents d JOIN q USING (doc_id) JOIN l USING (doc_id))
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(q_fp) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000.0
              AS avg_quality,
            CAST(sum(CASE WHEN q_fp < 500000 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_low_quality,
            CAST(sum(n_chars) AS BIGINT) AS total_chars,
            CAST(sum(lang_ok) AS DOUBLE) / CAST(count(*) AS DOUBLE)
              AS lang_id_agreement
        FROM j GROUP BY source ORDER BY source"""

  def langId: String = {
    val markers = graft.pipeline.TextAnalysis.langMarkersPublic
    val hitCols = markers.map { case (lang, ws) =>
      val inList = ws.map(w => s"'$w'").mkString(", ")
      s"CAST(len(list_filter(string_split(text, ' '), t -> t IN ($inList))) AS INT) AS h_$lang"
    }.mkString(",\n            ")
    // Tie-break must match Spark's array_sort+last: max hits, lexicographically
    // LAST language code wins ties → CASE checks languages in reverse order.
    val langsDesc = markers.map(_._1).sortBy(identity[String]).reverse
    val cases = langsDesc.map { lang =>
      val others = langsDesc.filterNot(_ == lang)
      val geAll = others.map(o => s"h_$lang >= h_$o").mkString(" AND ")
      s"WHEN h_$lang > 0 AND $geAll THEN '$lang'"
    }.mkString("\n            ")
    s"""WITH x AS (
          SELECT doc_id,
            $hitCols
          FROM documents)
        SELECT doc_id,
          CASE
            $cases
            ELSE 'und' END AS predicted_lang
        FROM x ORDER BY doc_id"""
  }

  /** Mirrors text_lang_confusion: the langId CASE replayed per doc, then a
    * (declared, predicted) confusion matrix with per-row precision of the
    * declared label — the audit that tells you where the n-gram heuristic
    * disagrees with the corpus metadata.
    */
  def langConfusion: String =
    s"""WITH pred AS (SELECT doc_id, predicted_lang FROM (${langId.stripSuffix(" ORDER BY doc_id")}) p),
        j AS (
          SELECT d.lang, p.predicted_lang, count(*) AS n
          FROM documents d JOIN pred p USING (doc_id)
          GROUP BY 1, 2),
        tot AS (SELECT lang, sum(n) AS n_lang FROM j GROUP BY lang)
        SELECT j.lang, j.predicted_lang, CAST(j.n AS BIGINT) AS n,
          CAST((j.n * 1000000) // t.n_lang AS BIGINT) AS share_ppm
        FROM j JOIN tot t ON t.lang = j.lang
        ORDER BY j.lang, j.predicted_lang"""

  /** PII redaction oracle — regex constants come STRAIGHT from
    * graft.pipeline.Privacy so the two sides cannot drift. The patterns use
    * only constructs whose semantics agree between Java regex (Spark) and
    * RE2 (DuckDB): character classes, bounded quantifiers, \b, optional
    * groups — no lookaround, no backreferences.
    */
  def piiRedact: String = {
    import graft.pipeline.Privacy._
    s"""SELECT doc_id,
          regexp_replace(regexp_replace(regexp_replace(
            text || ' contact user' || doc_id || '@example.com or 10.0.'
              || (doc_id % 256) || '.7 tel +1 555-010-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
            '$EmailPattern', '<EMAIL>', 'g'),
            '$Ipv4Pattern', '<IP>', 'g'),
            '$PhonePattern', '<PHONE>', 'g') AS redacted
        FROM documents ORDER BY doc_id"""
  }

  /** Hash-split oracle: md5-bucket thresholds rendered from the same
    * two-hex-char scheme as Splits.assignSplit.
    */
  def splitAssign(testBuckets: Int, valBuckets: Int): String = {
    val t = f"$testBuckets%02x"
    val v = f"${testBuckets + valBuckets}%02x"
    s"""SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
          CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '$t' THEN 'test'
               WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '$v' THEN 'val'
               ELSE 'train' END AS split
        FROM documents ORDER BY doc_id"""
  }

  /** Morton-key oracle: the same interleave ZOrderExpr computes, as an
    * explicit bit sum. Reads bits 0..bits-1 only, so magnitude truncation
    * matches the Spark mask for any input.
    */
  def zorder(bits: Int, limit: Int): String =
    s"""SELECT o_orderkey, o_custkey,
          CAST(list_sum(list_transform(range(0, $bits), i ->
            (((CAST(o_custkey AS BIGINT) >> i) & 1) << (2*i)) +
            (((CAST(o_orderkey AS BIGINT) >> i) & 1) << (2*i + 1)))) AS BIGINT) AS zkey
        FROM orders ORDER BY zkey, o_orderkey LIMIT $limit"""

  /** Volume-anomaly oracle: mean/stddev from exact integer window sums —
    * the identical double formula EventOps.anomalies evaluates, never an
    * engine stddev() (whose accumulation order is engine-specific).
    */
  def eventAnomalies(lookback: Int, zThreshold: Double): String =
    s"""WITH h AS (
          SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
            event_type, CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2),
        s AS (
          SELECT window_start, event_type, n,
            sum(n) OVER w AS s1, sum(CAST(n AS DOUBLE) * n) OVER w AS s2, count(n) OVER w AS c
          FROM h
          WINDOW w AS (PARTITION BY event_type ORDER BY window_start
                       ROWS BETWEEN $lookback PRECEDING AND 1 PRECEDING)),
        zz AS (
          SELECT window_start, event_type, n,
            CASE WHEN c >= 2
                  AND (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / c) / (c - 1) > 0
                 THEN round((n - CAST(s1 AS DOUBLE) / c)
                   / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / c) / (c - 1)), 4)
            END AS z
          FROM s)
        SELECT window_start, event_type, n, z,
          coalesce(abs(z) > $zThreshold, false) AS is_anomaly
        FROM zz ORDER BY window_start, event_type"""

  /** Per-doc novelty: fraction of distinct word n-grams with corpus doc
    * frequency 1 — integer counts, one rounded division.
    */
  def novelty(n: Int): String =
    s"""WITH sh AS (
          SELECT doc_id, unnest(list_distinct(${shinglesSql(n)})) AS sh FROM documents),
        dfreq AS (SELECT sh, count(*) AS df FROM sh GROUP BY sh)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
          CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
          round(CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS novelty
        FROM sh JOIN dfreq USING (sh)
        GROUP BY doc_id ORDER BY doc_id"""

  /** Mirrors GraphAnalytics.pageRankInt over the customer→order→part FK
    * graph: one CTE per iteration (the SQL twin of the Spark loop), all
    * integer arithmetic so the ranks hash-match exactly. Node ids are longs
    * with disjoint offsets (customers +2e9, parts +1e9) — no string keys.
    */
  def pageRankInt(iters: Int, topK: Int, scale: Long = 1000000L,
      dampNum: Long = 85, dampDen: Long = 100): String = {
    val base = (scale * (dampDen - dampNum)) / dampDen
    val iterCtes = (1 to iters).map { i =>
      s"""r$i AS (
           SELECT n.node, $base + coalesce(sum(c.contrib), 0) AS pr
           FROM n LEFT JOIN (
             SELECT e.dst AS node, ((r.pr * $dampNum) // $dampDen) // d.out_deg AS contrib
             FROM r${i - 1} r JOIN d ON r.node = d.node JOIN e ON e.src = r.node) c
             ON c.node = n.node
           GROUP BY n.node)"""
    }.mkString(",\n        ")
    s"""WITH e AS (
          SELECT 2000000000 + o_custkey AS src, o_orderkey AS dst FROM orders
          UNION ALL
          SELECT l_orderkey AS src, 1000000000 + l_partkey AS dst FROM lineitem),
        n AS (SELECT DISTINCT node FROM
                (SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)),
        d AS (SELECT src AS node, count(*) AS out_deg FROM e GROUP BY src),
        r0 AS (SELECT node, CAST($scale AS BIGINT) AS pr FROM n),
        $iterCtes
        SELECT node, CAST(pr AS BIGINT) AS pr FROM r$iters
        ORDER BY pr DESC, node ASC LIMIT $topK"""
  }

  /** Mirrors GraphAnalytics.pageRankWeightedInt over the orders/lineitem
    * graph with quantity-weighted order→part edges: per-node damping then
    * per-edge (damped · w) // wsum — the same two-division order Spark
    * evaluates.
    */
  def pageRankWeightedInt(iters: Int, topK: Int, scale: Long = 1000000L,
      dampNum: Long = 85, dampDen: Long = 100): String = {
    val base = (scale * (dampDen - dampNum)) / dampDen
    val damped0 = (scale * dampNum) / dampDen
    val iterCtes = (1 to iters).map { i =>
      val dampedExpr =
        if (i == 1) s"$damped0"
        else s"((r.pr * $dampNum) // $dampDen)"
      s"""r$i AS (
           SELECT n.node, $base + coalesce(sum(c.contrib), 0) AS pr
           FROM n LEFT JOIN (
             SELECT e.dst AS node, ($dampedExpr * e.w) // d.wsum AS contrib
             FROM r${i - 1} r JOIN d ON r.node = d.node JOIN e ON e.src = r.node) c
             ON c.node = n.node
           GROUP BY n.node)"""
    }.mkString(",\n        ")
    s"""WITH e AS (
          SELECT 2000000000 + o_custkey AS src, o_orderkey AS dst,
              CAST(1 AS BIGINT) AS w FROM orders
          UNION ALL
          SELECT l_orderkey AS src, 1000000000 + l_partkey AS dst,
              -- floor before the BIGINT cast: DuckDB DECIMAL->BIGINT rounds
              -- while Spark's decimal->long cast truncates; floor makes the
              -- oracle truncation-identical even for non-integral quantities
              CAST(floor(CAST(l_quantity AS DECIMAL(18,2))) AS BIGINT) AS w
          FROM lineitem),
        n AS (SELECT DISTINCT node FROM
                (SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)),
        d AS (SELECT src AS node, sum(w) AS wsum FROM e GROUP BY src),
        r0 AS (SELECT node, CAST($scale AS BIGINT) AS pr FROM n),
        $iterCtes
        SELECT node, CAST(pr AS BIGINT) AS pr FROM r$iters
        ORDER BY pr DESC, node ASC LIMIT $topK"""
  }

  /** Mirrors GraphAnalytics.kCore over the order→part bipartite graph from
    * lineitem: one CTE per peel round (survivors = nodes with ≥ k surviving
    * neighbors), then a final degree-attach round — the exact shape of the
    * Spark loop, so results hash-match whether or not `rounds` reached the
    * fixpoint. Node ids disjoint: parts offset +1e9.
    */
  def kCore(k: Int, rounds: Int, topK: Int): String = {
    val roundCtes = (1 to rounds).map { i =>
      s"""s$i AS (
           SELECT adj.a AS node FROM adj
           JOIN s${i - 1} x ON adj.a = x.node
           JOIN s${i - 1} y ON adj.b = y.node
           GROUP BY adj.a HAVING count(*) >= $k)"""
    }.mkString(",\n        ")
    s"""WITH e AS (
          SELECT DISTINCT l_orderkey AS u, 1000000000 + l_partkey AS v FROM lineitem),
        adj AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v AS a, u AS b FROM e),
        s0 AS (SELECT DISTINCT a AS node FROM adj),
        $roundCtes
        SELECT adj.a AS node, CAST(count(*) AS BIGINT) AS core_deg FROM adj
        JOIN s$rounds x ON adj.a = x.node
        JOIN s$rounds y ON adj.b = y.node
        GROUP BY adj.a HAVING count(*) >= $k
        ORDER BY core_deg DESC, node ASC LIMIT $topK"""
  }

  /** Benford first-digit expectation log₁₀(1 + 1/d) as a CASE usable
    * verbatim in BOTH engines: the double literals are formatted once here
    * (Double.toString round-trips), so Spark's `expr` and DuckDB parse the
    * identical nearest double and the downstream deviations hash-match.
    */
  def benfordExpectedCase: String =
    (1 to 9).map { d =>
      s"WHEN $d THEN CAST(${math.log10(1 + 1.0 / d)} AS DOUBLE)"
    }.mkString("CASE digit ", " ", " ELSE CAST(0 AS DOUBLE) END")

  /** Mirrors GraphAnalytics.trussEdges over the co-purchase graph: one
    * (triangle, support, filter) CTE triple per peel round, id-oriented
    * triangle enumeration (same set as the degree-oriented Spark
    * enumeration), final round's surviving edges with their support.
    */
  def trussEdges(k: Int, rounds: Int, topK: Int): String = {
    val bar = k - 2
    // Every round CTE is MATERIALIZED: each e$i is referenced three times
    // by the next round's triangle join, and inlining re-evaluates the
    // whole prior peel per reference — at sf0.1 that turned a ~30s chain
    // into an unbounded spill (observed 33 GB of temp before the disk
    // filled). Materialization pins each round to one evaluation.
    val roundCtes = (1 to rounds).map { i =>
      s"""t$i AS MATERIALIZED (
           SELECT e1.u AS a, e1.v AS b, e2.v AS c
           FROM e${i - 1} e1
           JOIN e${i - 1} e2 ON e2.u = e1.u AND e1.v < e2.v
           JOIN e${i - 1} e3 ON e3.u = e1.v AND e3.v = e2.v),
        s$i AS MATERIALIZED (
           SELECT u, v, count(*) AS support FROM (
             SELECT a AS u, b AS v FROM t$i
             UNION ALL SELECT a, c FROM t$i
             UNION ALL SELECT b, c FROM t$i)
           GROUP BY u, v HAVING count(*) >= $bar),
        e$i AS MATERIALIZED (SELECT u, v FROM s$i)"""
    }.mkString(",\n        ")
    s"""WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e0 AS MATERIALIZED (
          SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
          FROM lp a JOIN lp b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        $roundCtes
        SELECT u, v, CAST(support AS BIGINT) AS support FROM s$rounds
        ORDER BY support DESC, u, v LIMIT $topK"""
  }

  /** Mirrors GraphAnalytics.hitsInt over the customer→order→part FK graph:
    * one (auth-raw, auth, hub-raw, hub) CTE quadruple per round, max
    * normalization by scalar subquery, integer floor division throughout —
    * positive operands, so DuckDB's `//` equals Spark's `div`.
    */
  def hits(iters: Int, topK: Int, scale: Long = 1000000L): String = {
    val roundCtes = (1 to iters).map { i =>
      s"""ar$i AS (
           SELECT e.dst AS node, sum(h.score) AS raw
           FROM e JOIN h${i - 1} h ON e.src = h.node GROUP BY e.dst),
        a$i AS (
           SELECT node, (raw * $scale) // (SELECT max(raw) FROM ar$i) AS score
           FROM ar$i),
        hr$i AS (
           SELECT e.src AS node, sum(a.score) AS raw
           FROM e JOIN a$i a ON e.dst = a.node GROUP BY e.src),
        h$i AS (
           SELECT node, (raw * $scale) // (SELECT max(raw) FROM hr$i) AS score
           FROM hr$i)"""
    }.mkString(",\n        ")
    s"""WITH e AS (
          SELECT 2000000000 + o_custkey AS src, o_orderkey AS dst FROM orders
          UNION ALL
          SELECT l_orderkey AS src, 1000000000 + l_partkey AS dst FROM lineitem),
        h0 AS (SELECT DISTINCT src AS node, CAST($scale AS BIGINT) AS score FROM e),
        $roundCtes,
        sides AS (
          SELECT 'auth' AS kind, node, score FROM a$iters
          UNION ALL SELECT 'hub' AS kind, node, score FROM h$iters),
        ranked AS (
          SELECT kind, node, score, row_number() OVER (
            PARTITION BY kind ORDER BY score DESC, node ASC) AS rn
          FROM sides)
        SELECT kind, CAST(node AS BIGINT) AS node, CAST(score AS BIGINT) AS score
        FROM ranked WHERE rn <= $topK
        ORDER BY kind, score DESC, node"""
  }

  /** Mirrors GraphAnalytics.personalizedPageRankInt over the customer→order
    * →part FK graph: pageRankInt's chained CTEs with the teleport base
    * restricted to the seed set and zero-mass nodes filtered from the
    * output. All integer math — hash-exact per round.
    */
  def personalizedPageRank(sources: Seq[Long], iters: Int, topK: Int,
      scale: Long = 1000000L, dampNum: Long = 85, dampDen: Long = 100): String = {
    val base = (scale * (dampDen - dampNum)) / dampDen
    val inSrc = sources.mkString("(", ", ", ")")
    val iterCtes = (1 to iters).map { i =>
      s"""r$i AS (
           SELECT n.node,
             CASE WHEN n.node IN $inSrc THEN $base ELSE 0 END
               + coalesce(sum(c.contrib), 0) AS pr
           FROM n LEFT JOIN (
             SELECT e.dst AS node, ((r.pr * $dampNum) // $dampDen) // d.out_deg AS contrib
             FROM r${i - 1} r JOIN d ON r.node = d.node JOIN e ON e.src = r.node
             WHERE r.pr > 0) c
             ON c.node = n.node
           GROUP BY n.node)"""
    }.mkString(",\n        ")
    s"""WITH e AS (
          SELECT 2000000000 + o_custkey AS src, o_orderkey AS dst FROM orders
          UNION ALL
          SELECT l_orderkey AS src, 1000000000 + l_partkey AS dst FROM lineitem),
        n AS (SELECT DISTINCT node FROM
                (SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)),
        d AS (SELECT src AS node, count(*) AS out_deg FROM e GROUP BY src),
        r0 AS (SELECT node, CAST($scale AS BIGINT) AS pr FROM n WHERE node IN $inSrc),
        $iterCtes
        SELECT node, CAST(pr AS BIGINT) AS ppr FROM r$iters WHERE pr > 0
        ORDER BY ppr DESC, node ASC LIMIT $topK"""
  }

  /** Mirrors GraphAnalytics.labelPropagation over the order↔part bipartite
    * graph: one CTE pair per synchronous round (neighbor-label counts, then
    * argmax with smallest-label tiebreak), then the top community sizes —
    * the exact shape of the Spark loop, so results hash-match whether or
    * not `rounds` reached the fixpoint.
    */
  /** Shared synchronous-LPA CTE chain over the bipartite order–part graph:
    * edges `e`, both-direction adjacency `adj`, and label frames l0…l$rounds
    * (argmax neighbor label, smallest-label tiebreak). Reused by the
    * community-size and modularity oracles so the replayed fixpoint cannot
    * drift between them.
    */
  private def lpaCtes(rounds: Int): String = {
    val roundCtes = (1 to rounds).map { i =>
      s"""c$i AS (SELECT adj.a, l.lbl, count(*) AS cnt
           FROM adj JOIN l${i - 1} l ON adj.b = l.node GROUP BY 1, 2),
        l$i AS (SELECT a AS node, lbl FROM (
           SELECT a, lbl, row_number() OVER (
             PARTITION BY a ORDER BY cnt DESC, lbl ASC) AS rn
           FROM c$i) WHERE rn = 1)"""
    }.mkString(",\n        ")
    s"""e AS (
          SELECT DISTINCT l_orderkey AS u, 1000000000 + l_partkey AS v FROM lineitem),
        adj AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v AS a, u AS b FROM e),
        l0 AS (SELECT DISTINCT a AS node, a AS lbl FROM adj),
        $roundCtes"""
  }

  def labelPropagation(rounds: Int, topK: Int): String =
    s"""WITH ${lpaCtes(rounds)}
        SELECT CAST(lbl AS BIGINT) AS community, CAST(count(*) AS BIGINT) AS n_members
        FROM l$rounds GROUP BY lbl
        ORDER BY n_members DESC, community ASC LIMIT $topK"""

  /** Mirrors graph_modularity: Newman modularity Q = Σ_c (m_c/m −
    * (d_c/2m)²) of the round-$rounds LPA partition, kept integer as
    * q_num = Σ_c (4·m·m_c − d_c²) over q_den = 4m² (HUGEINT here,
    * DECIMAL(38,0) on the Spark side); only the final Q is a double.
    */
  def lpaModularity(rounds: Int): String =
    s"""WITH ${lpaCtes(rounds)},
        lab AS (SELECT node, lbl FROM l$rounds),
        mm AS (SELECT count(*) AS m FROM e),
        intra AS (
          SELECT lu.lbl AS c, count(*) AS m_c
          FROM e JOIN lab lu ON e.u = lu.node JOIN lab lv ON e.v = lv.node
          WHERE lu.lbl = lv.lbl GROUP BY 1),
        deg AS (SELECT a AS node, count(*) AS deg FROM adj GROUP BY a),
        dc AS (
          SELECT lab.lbl AS c, sum(deg.deg) AS d_c
          FROM deg JOIN lab ON deg.node = lab.node GROUP BY 1),
        terms AS (
          SELECT CAST(4 AS HUGEINT) * mm.m * coalesce(intra.m_c, 0)
                   - CAST(dc.d_c AS HUGEINT) * dc.d_c AS term,
                 mm.m AS m
          FROM dc LEFT JOIN intra ON intra.c = dc.c CROSS JOIN mm)
        SELECT CAST(m AS BIGINT) AS m, CAST(count(*) AS BIGINT) AS n_comm,
          CAST(sum(term) AS BIGINT) AS q_num,
          CAST(sum(term) AS DOUBLE)
            / CAST(CAST(4 AS HUGEINT) * m * m AS DOUBLE) AS modularity
        FROM terms GROUP BY m ORDER BY m"""

  /** Mirrors the REAL ImageIO decode over the synthetic PNGs: the pixel
    * pattern (Multimodal.synthesizePng) is a = id mod 256, w = 16+id mod 17,
    * h = 16+(7·id) mod 13, r(x,y) = (a+x) mod 256, g = 255−r,
    * b(x,y) = (a+y) mod 256 — the wrap past 256 happens at most once per
    * axis (w,h ≤ 32), so the channel sums of the DECODED raster reduce to
    * the closed forms below. Any divergence between the oracle and the Spark
    * side means ImageIO produced pixels that differ from the pattern — i.e.
    * this pins a real encode→decode round trip, not a formula echo.
    */
  def mmDecode: String =
    s"""WITH m AS (
          SELECT doc_id,
            CAST(doc_id % 256 AS BIGINT) AS a,
            CAST(16 + doc_id % 17 AS BIGINT) AS w,
            CAST(16 + (doc_id * 7) % 13 AS BIGINT) AS h
          FROM documents),
        sums AS (
          SELECT doc_id, w, h,
            h * (w*a + (w*(w-1))//2 - 256*greatest(0, a+w-256)) AS r_sum,
            w * (h*a + (h*(h-1))//2 - 256*greatest(0, a+h-256)) AS b_sum
          FROM m)
        SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
          CAST(w*h AS BIGINT) AS n_px,
          CAST(r_sum AS BIGINT) AS r_sum,
          CAST(255*w*h - r_sum AS BIGINT) AS g_sum,
          CAST(b_sum AS BIGINT) AS b_sum
        FROM sums ORDER BY doc_id"""

  /** Mirrors mm_decode_jpeg: the lossy round trip preserves DIMENSIONS
    * exactly (closed forms of the generator), and `decoded = TRUE` pins
    * that every payload went through the REAL ImageIO path (the stub
    * fallback emits negative channel sums → decoded = FALSE). Channel sums
    * are encoder-dependent under DCT quantization and are pinned at spec
    * level against a checked-in byte fixture instead.
    */
  def mmDecodeJpeg: String =
    s"""SELECT doc_id,
          CAST(16 + doc_id % 17 AS BIGINT) AS width,
          CAST(16 + (doc_id * 7) % 13 AS BIGINT) AS height,
          CAST((16 + doc_id % 17) * (16 + (doc_id * 7) % 13) AS BIGINT) AS n_px,
          TRUE AS decoded
        FROM documents ORDER BY doc_id"""

  /** Mirrors mm_audio_decode: closed forms of the synthetic WAV sample ramp
    * (Multimodal.synthesizeWav — a = id mod 256, n = 64 + id mod 97,
    * s(i) = ((a+i) mod 256 − 128)·256; the mod sequence wraps at most once
    * for n ≤ 160), pinning what the JDK audio codec actually decodes.
    */
  def mmAudioDecode: String =
    s"""WITH m AS (
          SELECT doc_id,
            CAST(doc_id % 256 AS BIGINT) AS a,
            CAST(64 + doc_id % 97 AS BIGINT) AS n
          FROM documents),
        s AS (
          SELECT doc_id, a, n,
            n*a + (n*(n-1))//2 - 256*greatest(0, a+n-256) AS s8,
            CASE WHEN a+n-1 >= 256 THEN 255 ELSE a+n-1 END AS max8,
            CASE WHEN a+n-1 >= 256 THEN 0 ELSE a END AS min8
          FROM m)
        SELECT doc_id, CAST(8000 AS INT) AS sample_rate,
          CAST(n AS BIGINT) AS n_samples,
          CAST(256*(s8 - 128*n) AS BIGINT) AS sum_samples,
          CAST(256*greatest(abs(max8-128), abs(min8-128)) AS INT) AS peak_abs,
          CAST(n*125 AS BIGINT) AS duration_us
        FROM s ORDER BY doc_id"""

  /** Mirrors mm_audio_frames at the given frame width: wrap-aware range
    * sums of the WAV ramp over [j·W, min(n, (j+1)·W)) — the windowed
    * generalization of [[mmAudioDecode]]'s whole-stream forms. Peak cases:
    * a frame entirely past the mod-256 wrap, straddling it, or before it.
    */
  /** Shared audio-window CTE chain (ending in `s(doc_id, j, lo, hi, s8,
    * mx, mn)` — wrap-aware closed forms over the PCM ramp), reused by the
    * frame-stats and VAD-segmentation oracles.
    */
  private def audioFrameCtes(frameLen: Int): String =
    s"""WITH m AS (
          SELECT doc_id,
            CAST(doc_id % 256 AS BIGINT) AS a,
            CAST(64 + doc_id % 97 AS BIGINT) AS n
          FROM documents),
        fr AS (
          SELECT doc_id, a, n,
            CAST(unnest(range(0, (n + ${frameLen - 1}) // $frameLen)) AS BIGINT) AS j
          FROM m),
        b AS (
          SELECT doc_id, a, j, j*$frameLen AS lo,
            least(n, j*$frameLen + $frameLen) AS hi
          FROM fr),
        s AS (
          SELECT doc_id, j, lo, hi,
            (hi-lo)*a + (hi*(hi-1) - lo*(lo-1))//2
              - 256*(greatest(0, a+hi-256) - greatest(0, a+lo-256)) AS s8,
            CASE WHEN a+lo >= 256 THEN a+hi-1-256
                 WHEN a+hi-1 >= 256 THEN 255 ELSE a+hi-1 END AS mx,
            CASE WHEN a+lo >= 256 THEN a+lo-256
                 WHEN a+hi-1 >= 256 THEN 0 ELSE a+lo END AS mn
          FROM b)"""

  def mmAudioFrames(frameLen: Int): String =
    s"""${audioFrameCtes(frameLen)}
        SELECT doc_id, CAST(j AS INT) AS frame_idx,
          CAST(hi-lo AS BIGINT) AS n_samples,
          CAST(256*(s8 - 128*(hi-lo)) AS BIGINT) AS sum_samples,
          CAST(256*greatest(abs(mx-128), abs(mn-128)) AS INT) AS peak_abs
        FROM s ORDER BY doc_id, frame_idx"""

  /** Mirrors mm_audio_vad: active windows (peak ≥ threshold) grouped into
    * maximal runs by the idx − row_number island trick — the same closed
    * forms as [[mmAudioFrames]] drive the activity decision.
    */
  def mmAudioVad(frameLen: Int, threshold: Int): String =
    s"""${audioFrameCtes(frameLen)},
        act AS (
          SELECT doc_id, j
          FROM s WHERE 256*greatest(abs(mx-128), abs(mn-128)) >= $threshold),
        isl AS (
          SELECT doc_id, j,
            j - row_number() OVER (PARTITION BY doc_id ORDER BY j) AS g
          FROM act)
        SELECT doc_id, CAST(min(j) AS INT) AS seg_start,
          CAST(max(j) AS INT) AS seg_end,
          CAST(count(*) AS BIGINT) AS n_frames
        FROM isl GROUP BY doc_id, g ORDER BY doc_id, seg_start"""

  /** Mirrors mm_video_frames at the given stride: every stride-th frame of
    * the synthetic container (Multimodal.synthesizeVideo — nf = 3 + id mod
    * 5 frames at the doc's fixed w×h, frame f phased a_f = (id+11f) mod
    * 256), each frame's channel sums by the same closed forms as
    * [[mmDecode]].
    */
  def mmVideoFrames(stride: Int): String =
    s"""WITH m AS (
          SELECT doc_id,
            CAST(16 + doc_id % 17 AS BIGINT) AS w,
            CAST(16 + (doc_id * 7) % 13 AS BIGINT) AS h,
            CAST(3 + doc_id % 5 AS BIGINT) AS nf
          FROM documents),
        fr AS (
          SELECT doc_id, w, h,
            CAST(unnest(range(0, nf, $stride)) AS BIGINT) AS f
          FROM m),
        ph AS (
          SELECT doc_id, w, h, f, (doc_id + 11*f) % 256 AS a FROM fr),
        sums AS (
          SELECT doc_id, f, w, h,
            h * (w*a + (w*(w-1))//2 - 256*greatest(0, a+w-256)) AS r_sum,
            w * (h*a + (h*(h-1))//2 - 256*greatest(0, a+h-256)) AS b_sum
          FROM ph)
        SELECT doc_id, CAST(f AS INT) AS frame_idx,
          CAST(w AS INT) AS width, CAST(h AS INT) AS height,
          CAST(r_sum AS BIGINT) AS r_sum,
          CAST(255*w*h - r_sum AS BIGINT) AS g_sum,
          CAST(b_sum AS BIGINT) AS b_sum
        FROM sums ORDER BY doc_id, frame_idx"""

  /** Closed-form replay of Multimodal.averageHash over the synthetic
    * gradient: luminance 2r+b separates into x- and y-marginals
    * (r = (a+x) mod 256 is y-free, b = (a+y) mod 256 is x-free), so each
    * 8×8 cell's sum is 2·ny·Rx(cx) + nx·By(cy) from two O(w)+O(h)
    * marginal aggregations — never a per-pixel expansion. The mean test is
    * the same cross-multiplied integer compare the Spark side runs on real
    * decoded pixels; bit 63 is assembled through the two's-complement
    * sentinel (HUGEINT sum, BIGINT cast) since 1<<63 overflows.
    */
  private def phashCte(docFilter: String = "TRUE"): String =
    s"""WITH m AS (
          SELECT doc_id, CAST(doc_id % 256 AS BIGINT) AS a,
            CAST(16 + doc_id % 17 AS BIGINT) AS w,
            CAST(16 + (doc_id*7) % 13 AS BIGINT) AS h
          FROM documents WHERE ($docFilter)),
        xc AS (
          SELECT doc_id, cx, sum(r) AS rx, count(*) AS nx FROM (
            SELECT doc_id, (x*8)//w AS cx, (a+x)%256 AS r
            FROM (SELECT doc_id, a, w,
                  CAST(unnest(range(w)) AS BIGINT) AS x FROM m))
          GROUP BY doc_id, cx),
        yc AS (
          SELECT doc_id, cy, sum(b) AS by_, count(*) AS ny FROM (
            SELECT doc_id, (y*8)//h AS cy, (a+y)%256 AS b
            FROM (SELECT doc_id, a, h,
                  CAST(unnest(range(h)) AS BIGINT) AS y FROM m))
          GROUP BY doc_id, cy),
        tx AS (SELECT doc_id, sum(rx) AS srx FROM xc GROUP BY doc_id),
        ty AS (SELECT doc_id, sum(by_) AS sby FROM yc GROUP BY doc_id),
        tot AS (SELECT m.doc_id, m.w, m.h, 2*m.h*srx + m.w*sby AS total
                FROM m JOIN tx USING(doc_id) JOIN ty USING(doc_id)),
        bits AS (
          SELECT x.doc_id, y.cy, x.cx,
            CASE WHEN (2*y.ny*x.rx + x.nx*y.by_) * (t.w*t.h)
                      > t.total * (x.nx*y.ny)
              THEN 1 ELSE 0 END AS bit
          FROM xc x JOIN yc y USING (doc_id) JOIN tot t USING (doc_id)),
        hash AS (
          SELECT doc_id, CAST(sum(CASE WHEN bit=0 THEN 0::HUGEINT
            WHEN cy*8+cx = 63 THEN (-9223372036854775808)::HUGEINT
            ELSE CAST(1::BIGINT << CAST(cy*8+cx AS INT) AS HUGEINT)
            END) AS BIGINT) AS ahash
          FROM bits GROUP BY doc_id)"""

  /** Shared per-frame hash CTE chain (ending in `hash(doc_id, f, ahash)`):
    * the per-frame generalization of [[phashCte]] — the sampled frames'
    * gradient phases a_f = (doc_id + 11·f) mod 256 drive the same
    * x/y-marginal hash construction, keyed by (doc, frame).
    */
  private def videoHashCtes(stride: Int): String =
    s"""WITH m AS (
          SELECT doc_id,
            CAST(unnest(range(0, 3 + doc_id % 5, $stride)) AS BIGINT) AS f,
            CAST(16 + doc_id % 17 AS BIGINT) AS w,
            CAST(16 + (doc_id*7) % 13 AS BIGINT) AS h
          FROM documents),
        m2 AS (SELECT doc_id, f, (doc_id + 11*f) % 256 AS a, w, h FROM m),
        xc AS (
          SELECT doc_id, f, cx, sum(r) AS rx, count(*) AS nx FROM (
            SELECT doc_id, f, (x*8)//w AS cx, (a+x)%256 AS r
            FROM (SELECT doc_id, f, a, w,
                  CAST(unnest(range(w)) AS BIGINT) AS x FROM m2))
          GROUP BY doc_id, f, cx),
        yc AS (
          SELECT doc_id, f, cy, sum(b) AS by_, count(*) AS ny FROM (
            SELECT doc_id, f, (y*8)//h AS cy, (a+y)%256 AS b
            FROM (SELECT doc_id, f, a, h,
                  CAST(unnest(range(h)) AS BIGINT) AS y FROM m2))
          GROUP BY doc_id, f, cy),
        tx AS (SELECT doc_id, f, sum(rx) AS srx FROM xc GROUP BY doc_id, f),
        ty AS (SELECT doc_id, f, sum(by_) AS sby FROM yc GROUP BY doc_id, f),
        tot AS (
          SELECT m2.doc_id, m2.f, m2.w, m2.h, 2*m2.h*srx + m2.w*sby AS total
          FROM m2 JOIN tx USING(doc_id, f) JOIN ty USING(doc_id, f)),
        bits AS (
          SELECT x.doc_id, x.f, y.cy, x.cx,
            CASE WHEN (2*y.ny*x.rx + x.nx*y.by_) * (t.w*t.h)
                      > t.total * (x.nx*y.ny)
              THEN 1 ELSE 0 END AS bit
          FROM xc x JOIN yc y USING (doc_id, f)
          JOIN tot t USING (doc_id, f)),
        hash AS (
          SELECT doc_id, f, CAST(sum(CASE WHEN bit=0 THEN 0::HUGEINT
            WHEN cy*8+cx = 63 THEN (-9223372036854775808)::HUGEINT
            ELSE CAST(1::BIGINT << CAST(cy*8+cx AS INT) AS HUGEINT)
            END) AS BIGINT) AS ahash
          FROM bits GROUP BY doc_id, f)"""

  /** Mirrors mm_frame_dedup: [[videoHashCtes]] + the per-video distinct-
    * fingerprint aggregate.
    */
  def mmFrameDedup(stride: Int): String =
    s"""${videoHashCtes(stride)}
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sampled,
          CAST(count(DISTINCT ahash) AS BIGINT) AS n_distinct,
          min(ahash) AS min_hash
        FROM hash GROUP BY doc_id ORDER BY doc_id"""

  /** Mirrors mm_scene_cuts: [[videoHashCtes]] at stride 1 + a lag window
    * per video — consecutive-frame Hamming distance of the perceptual
    * hashes, cut flag at `threshold` bits.
    */
  def mmSceneCuts(threshold: Int): String =
    s"""${videoHashCtes(1)},
        seq AS (
          SELECT doc_id, f, ahash,
            lag(ahash) OVER (PARTITION BY doc_id ORDER BY f) AS prev
          FROM hash)
        SELECT doc_id, CAST(f AS INT) AS frame_idx,
          CAST(bit_count(xor(ahash, prev)) AS INT) AS hamming,
          CAST(bit_count(xor(ahash, prev)) >= $threshold AS INT) AS is_cut
        FROM seq WHERE prev IS NOT NULL
        ORDER BY doc_id, frame_idx"""

  /** Mirrors dedup_cross_modal: the minhash transitive-closure labels and
    * the closed-form perceptual hashes composed into one CTE list, then
    * three Σ C(n,2) group-size aggregations — the same combinatorics the
    * Spark side runs (pair counts without pair materialization).
    */
  def crossModalAgreement(n: Int, bands: Int, rowsPerBand: Int): String =
    s"""${componentCtes(n, bands, rowsPerBand)},
        ${phashCte().trim.stripPrefix("WITH")},
        labels AS (SELECT a AS doc_id, min(b) AS rep_id FROM reach GROUP BY a),
        cells AS (
          SELECT d.doc_id, coalesce(l.rep_id, d.doc_id) AS rep, h.ahash
          FROM documents d
          LEFT JOIN labels l ON l.doc_id = d.doc_id
          JOIN hash h ON h.doc_id = d.doc_id),
        tp AS (SELECT sum(n*(n-1)//2) AS text_pairs
               FROM (SELECT count(*) AS n FROM cells GROUP BY rep)),
        ip AS (SELECT sum(n*(n-1)//2) AS image_pairs
               FROM (SELECT count(*) AS n FROM cells GROUP BY ahash)),
        bp AS (SELECT sum(n*(n-1)//2) AS both_pairs
               FROM (SELECT count(*) AS n FROM cells GROUP BY rep, ahash))
        SELECT CAST(text_pairs AS BIGINT) AS text_pairs,
          CAST(image_pairs AS BIGINT) AS image_pairs,
          CAST(both_pairs AS BIGINT) AS both_pairs,
          CAST(CASE WHEN text_pairs + image_pairs - both_pairs = 0 THEN NULL
            ELSE both_pairs * 1000000
              // (text_pairs + image_pairs - both_pairs) END AS BIGINT)
            AS agree_ppm
        FROM tp, ip, bp"""

  /** Mirrors mm_phash_clusters: exact-hash duplicate groups. `docFilter`
    * restricts the corpus (the mm_phash_delete oracle re-derives every
    * hash over only the surviving docs).
    */
  def mmPhashClusters(docFilter: String = "TRUE"): String =
    s"""${phashCte(docFilter)}
        SELECT ahash, CAST(count(*) AS BIGINT) AS n_docs,
          min(doc_id) AS rep_id
        FROM hash GROUP BY ahash
        ORDER BY n_docs DESC, ahash"""

  /** Mirrors mm_phash_nn via the ALL-PAIRS Hamming scan (the declared
    * query's banded join must lose nothing — pigeonhole recall 1.0 for
    * maxHamming 3 < 4 bands, and this oracle is the proof). The argmin is
    * the composite min_by key hamming·10⁷+nb ≡ Spark's min(struct).
    */
  def mmPhashNn: String =
    s"""${phashCte()},
        pairs AS (
          SELECT a.doc_id AS doc_id, b.doc_id AS nb,
            bit_count(xor(a.ahash, b.ahash)) AS hamming
          FROM hash a JOIN hash b ON a.doc_id <> b.doc_id
          WHERE bit_count(xor(a.ahash, b.ahash)) <= 3)
        SELECT doc_id, CAST(min(hamming) AS INT) AS hamming,
          min_by(nb, hamming*10000000 + nb) AS nn_id
        FROM pairs GROUP BY doc_id ORDER BY doc_id"""

  /** Mirrors mm_ann_pipeline: the closed-form decoded-pixel features of
    * [[mmDecode]] restricted to lang='en', scored by cosine against the
    * literal probe vector with the SAME left-associated double expression
    * order as the Spark side (e-notation literals — DuckDB types bare
    * decimals as DECIMAL, which would silently change the arithmetic).
    */
  def mmAnnPipeline: String =
    s"""WITH m AS (
          SELECT doc_id,
            CAST(doc_id % 256 AS BIGINT) AS a,
            CAST(16 + doc_id % 17 AS BIGINT) AS w,
            CAST(16 + (doc_id * 7) % 13 AS BIGINT) AS h
          FROM documents WHERE lang = 'en'),
        sums AS (
          SELECT doc_id, w, h, w*h AS n_px,
            h * (w*a + (w*(w-1))//2 - 256*greatest(0, a+w-256)) AS r_sum,
            w * (h*a + (h*(h-1))//2 - 256*greatest(0, a+h-256)) AS b_sum
          FROM m),
        f AS (
          SELECT doc_id,
            CAST(w AS DOUBLE) AS f1, CAST(h AS DOUBLE) AS f2,
            CAST((r_sum * 1000000) // n_px AS DOUBLE) AS f3,
            CAST(((255*n_px - r_sum) * 1000000) // n_px AS DOUBLE) AS f4,
            CAST((b_sum * 1000000) // n_px AS DOUBLE) AS f5
          FROM sums),
        sc AS (
          SELECT doc_id,
            f1 * 2.4e1 + f2 * 2.2e1 + f3 * 1.275e8 + f4 * 1.275e8 + f5 * 1.275e8 AS dot,
            f1 * f1 + f2 * f2 + f3 * f3 + f4 * f4 + f5 * f5 AS nf
          FROM f)
        SELECT doc_id,
          CAST(floor(dot / (sqrt(nf) * sqrt(2.4e1*2.4e1 + 2.2e1*2.2e1 + 1.275e8*1.275e8 + 1.275e8*1.275e8 + 1.275e8*1.275e8)) * 1.0e6) AS BIGINT) AS score_fp
        FROM sc
        ORDER BY score_fp DESC, doc_id LIMIT 25"""

  /** Must mirror Multimodal.FakeDecoder exactly (text is ASCII in the test
    * tables, so ascii(substr) == byte values). Retained as the metadata CTE
    * for the resize-planner oracle (the a/v stub path).
    */
  def mmStubMeta: String = {
    val head = (1 to 8).map(i => s"ascii(substr(text, $i, 1))").mkString(" + ")
    s"""SELECT doc_id,
          CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
          CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS format,
          CAST(16 + octet_length(CAST(text AS BLOB)) % 640 AS INT) AS width,
          CAST(16 + ($head) % 480 AS INT) AS height,
          CAST(CASE CAST(doc_id % 3 AS INT)
            WHEN 2 THEN 1 + octet_length(CAST(text AS BLOB)) % 120
            WHEN 1 THEN 1 + octet_length(CAST(text AS BLOB)) % 48000
            ELSE 1 END AS INT) AS n_frames
        FROM documents ORDER BY doc_id"""
  }

  /** Shared CTE chain of the bigram LM scorer — the oracle twin of
    * SparkEntry.lmScored, reused by [[lmScore]] and [[ccnetBuckets]] so
    * the two cannot drift (the same reason the Spark side factors one
    * helper). Ends at `t` = per-occurrence fixed-point surprisal terms.
    */
  private def lmScoreCtes: String =
    s"""bg0 AS (
          SELECT doc_id, unnest(${shinglesSql(2)}) AS bg FROM documents),
        bg AS (SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1 FROM bg0),
        c12 AS (SELECT bg, CAST(count(*) AS BIGINT) AS c12 FROM bg GROUP BY 1),
        c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bg GROUP BY 1),
        v AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS v
              FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)),
        t AS (
          SELECT doc_id,
            CAST(floor(-ln((c12.c12 + 1.0) / CAST(c1.c1 + v.v AS DOUBLE)) * 1000000.0) AS BIGINT) AS fp
          FROM bg JOIN c12 USING (bg) JOIN c1 USING (w1) CROSS JOIN v)"""

  /** Mirrors the bigram LM scoring: per-doc mean surprisal −ln P(w2|w1)
    * under an add-1-smoothed corpus bigram model, positive fixed-point so
    * integer division truncates identically in both engines.
    */
  def lmScore: String =
    s"""WITH $lmScoreCtes
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
          CAST(sum(fp) // count(*) AS BIGINT) AS avg_surprisal_fp
        FROM t GROUP BY doc_id ORDER BY doc_id"""

  /** Mirrors text_ccnet_buckets: the lmScore chain, then per-language
    * terciles of the score (bucket = ⌊3·(rank−1)/n_lang⌋, rank ordered by
    * (score, doc_id) within the language).
    */
  def ccnetBuckets: String =
    s"""WITH $lmScoreCtes,
        sc AS (
          SELECT doc_id, CAST(sum(fp) // count(*) AS BIGINT) AS avg_surprisal_fp
          FROM t GROUP BY doc_id)
        SELECT d.doc_id, d.lang, sc.avg_surprisal_fp,
          CAST((3 * (row_number() OVER (PARTITION BY d.lang
                  ORDER BY sc.avg_surprisal_fp, d.doc_id) - 1))
               // (count(*) OVER (PARTITION BY d.lang)) AS INT) AS bucket
        FROM sc JOIN documents d USING (doc_id)
        ORDER BY d.doc_id"""

  /** Mirrors the PMI collocation mining: top bigrams by fixed-point
    * pointwise mutual information with a support floor.
    */
  def collocations(minSupport: Int, topK: Int): String =
    s"""WITH bg0 AS (
          SELECT unnest(${shinglesSql(2)}) AS bg FROM documents),
        c12 AS (SELECT bg, CAST(count(*) AS BIGINT) AS c12 FROM bg0 GROUP BY 1),
        tot AS (SELECT CAST(sum(c12) AS BIGINT) AS n FROM c12),
        w AS (SELECT string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2, c12 FROM c12),
        c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM w GROUP BY 1),
        c2 AS (SELECT w2, CAST(sum(c12) AS BIGINT) AS c2 FROM w GROUP BY 1)
        SELECT w.w1, w.w2, w.c12,
          CAST(floor(ln((CAST(w.c12 AS DOUBLE) * n) / (CAST(c1.c1 AS DOUBLE) * c2.c2)) * 1000000.0) AS BIGINT) AS pmi_fp
        FROM w JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN tot
        WHERE w.c12 >= $minSupport
        ORDER BY pmi_fp DESC, w1, w2 LIMIT $topK"""

  /** Mirrors Multimodal.resizePlan over the FakeDecoder dims: the same
    * integer cross-multiplication / integer-division arithmetic, applied to
    * the mmStubMeta CTE.
    */
  def mmResize(maxW: Int, maxH: Int): String =
    s"""WITH m AS ($mmStubMeta)
        SELECT doc_id, width, height,
          CAST(CASE
            WHEN width <= $maxW AND height <= $maxH THEN width
            WHEN CAST(width AS BIGINT) * $maxH >= CAST(height AS BIGINT) * $maxW THEN $maxW
            ELSE greatest(1, (CAST(width AS BIGINT) * $maxH) // CAST(height AS BIGINT))
          END AS INT) AS out_w,
          CAST(CASE
            WHEN width <= $maxW AND height <= $maxH THEN height
            WHEN CAST(width AS BIGINT) * $maxH >= CAST(height AS BIGINT) * $maxW
              THEN greatest(1, (CAST(height AS BIGINT) * $maxW) // CAST(width AS BIGINT))
            ELSE $maxH
          END AS INT) AS out_h
        FROM m ORDER BY doc_id"""

  /** Mirrors GraphAnalytics.harmonicInt over the FK graph: min-plus
    * relaxation CTEs keyed (seed, node), then the floor(scale/d) sum.
    */
  private def multiSourceCtes(seeds: Seq[Long], rounds: Int): String = {
    val seedList = seeds.mkString("[", ", ", "]")
    val roundCtes = (1 to rounds).map { i =>
      s"""d$i AS (
           SELECT seed, node, min(dist) AS dist FROM (
             SELECT seed, node, dist FROM d${i - 1}
             UNION ALL
             SELECT f.seed, adj.b AS node, f.dist + 1 AS dist
             FROM adj JOIN d${i - 1} f ON adj.a = f.node)
           GROUP BY seed, node)"""
    }.mkString(",\n        ")
    s"""e AS (
          SELECT 2000000000 + o_custkey AS u, o_orderkey AS v FROM orders
          UNION ALL
          SELECT l_orderkey AS u, 1000000000 + l_partkey AS v FROM lineitem),
        adj AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v AS a, u AS b FROM e),
        d0 AS (SELECT s AS seed, s AS node, 0 AS dist
               FROM (SELECT CAST(unnest($seedList) AS BIGINT) AS s)),
        $roundCtes"""
  }

  /** Mirrors q_corr_matrix: one aggregation pass over all four lineitem
    * measures (sums/squares/cross-moments in HUGEINT), unpivoted to one
    * Pearson row per pair — identical pair order and ratio expression.
    */
  def corrMatrix: String = {
    val ms = Seq(
      "discount" -> "dc", "price" -> "pc", "quantity" -> "qc", "tax" -> "tc")
    val sums = ms.map { case (_, c) => s"sum(CAST($c AS HUGEINT)) AS s_$c" }
    val sqs = ms.map { case (_, c) => s"sum(CAST($c AS HUGEINT) * $c) AS ss_$c" }
    val crosses = ms.combinations(2).map { case Seq((_, a), (_, b)) =>
      s"sum(CAST($a AS HUGEINT) * $b) AS sp_${a}_$b"
    }.toSeq
    val rows = ms.combinations(2).map { case Seq((na, a), (nb, b)) =>
      s"""SELECT '$na' AS var_a, '$nb' AS var_b, n,
            round(CAST(n * sp_${a}_$b - s_$a * s_$b AS DOUBLE)
              / (sqrt(CAST(n * ss_$a - s_$a * s_$a AS DOUBLE))
                 * sqrt(CAST(n * ss_$b - s_$b * s_$b AS DOUBLE))), 6) AS r
          FROM m"""
    }.mkString("\n          UNION ALL ")
    s"""WITH b AS (
          SELECT CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qc,
              CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pc,
              CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS dc,
              CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT) AS tc
          FROM lineitem),
        m AS (
          SELECT count(*) AS n, ${(sums ++ sqs ++ crosses).mkString(",\n            ")}
          FROM b)
        SELECT var_a, var_b, CAST(n AS BIGINT) AS n, r FROM (
          $rows)
        ORDER BY var_a, var_b"""
  }

  /** Mirrors GraphAnalytics.betweennessInt over the orders/lineitem graph:
    * forward level CTEs carry (seed, node, sigma) with an anti-join against
    * the settled set; backward CTEs accumulate the fixed-point dependency
    * (sigma_v·(SCALE+delta_w)) // sigma_w from the deepest level up. CTEs
    * are MATERIALIZED — each level is referenced by the next level, the
    * settled union, AND the backward sweep, and DuckDB's default inlining
    * would re-evaluate the whole prefix per reference (the k-truss lesson).
    */
  def betweenness(seeds: Seq[Long], rounds: Int, topK: Int,
      scale: Long = 1L << 20): String = {
    val seedList = seeds.mkString("[", ", ", "]")
    val fwd = (1 to rounds).map { t =>
      s"""f$t AS MATERIALIZED (
           SELECT x.seed, x.node, x.sigma FROM (
             SELECT f.seed, adj.b AS node, sum(f.sigma) AS sigma
             FROM f${t - 1} f JOIN adj ON adj.a = f.node
             GROUP BY f.seed, adj.b) x
           LEFT JOIN s${t - 1} s ON s.seed = x.seed AND s.node = x.node
           WHERE s.node IS NULL),
         s$t AS MATERIALIZED (
           SELECT * FROM s${t - 1} UNION ALL SELECT seed, node FROM f$t)"""
    }.mkString(",\n        ")
    val bwd = (rounds - 1 to 1 by -1).map { t =>
      s"""c$t AS (
           SELECT v.seed, v.node,
             sum(CAST(CAST(v.sigma AS HUGEINT) * ($scale + w.delta)
               // w.sigma AS BIGINT)) AS delta
           FROM f$t v JOIN adj ON adj.a = v.node
           JOIN d${t + 1} w ON w.seed = v.seed AND w.node = adj.b
           GROUP BY v.seed, v.node),
         d$t AS MATERIALIZED (
           SELECT f.seed, f.node, f.sigma,
             CAST(coalesce(c.delta, 0) AS BIGINT) AS delta
           FROM f$t f LEFT JOIN c$t c ON c.seed = f.seed AND c.node = f.node)"""
    }.mkString(",\n        ")
    val unions = (1 to rounds).map(t => s"SELECT node, delta FROM d$t")
      .mkString("\n          UNION ALL ")
    s"""WITH e AS (
          SELECT 2000000000 + o_custkey AS u, o_orderkey AS v FROM orders
          UNION ALL
          SELECT l_orderkey AS u, 1000000000 + l_partkey AS v FROM lineitem),
        adj AS MATERIALIZED (SELECT DISTINCT a, b FROM (
          SELECT u AS a, v AS b FROM e UNION ALL SELECT v AS a, u AS b FROM e)),
        f0 AS (SELECT s AS seed, s AS node, CAST(1 AS BIGINT) AS sigma
               FROM (SELECT CAST(unnest($seedList) AS BIGINT) AS s)),
        s0 AS (SELECT seed, node FROM f0),
        $fwd,
        d$rounds AS MATERIALIZED (
          SELECT seed, node, sigma, CAST(0 AS BIGINT) AS delta FROM f$rounds),
        $bwd
        SELECT node, CAST(sum(delta) AS BIGINT) AS bc_fp
        FROM ($unions)
        GROUP BY node ORDER BY bc_fp DESC, node ASC LIMIT $topK"""
  }

  /** Mirrors GraphAnalytics.randomWalks over the orders/lineitem graph:
    * DISTINCT symmetric adjacency with row_number neighbor indexes, then
    * one CTE per step choosing index md5(walk:prevStep:node:walk-salt) mod
    * degree, where prevStep = t−1 is the frontier row's step column — the
    * identical hash coordinate Spark computes.
    */
  def randomWalks(seeds: Seq[Long], walksPerSeed: Int, steps: Int): String = {
    val seedRows = seeds
      .flatMap(s => (0 until walksPerSeed).map(w => s"(${s * 100 + w}, ${s})"))
      .mkString(", ")
    val stepCtes = (1 to steps).map { t =>
      s"""w$t AS (
           SELECT c.walk_id, $t AS step, adj.b AS node
           FROM w${t - 1} c
           JOIN deg ON deg.node = c.node
           JOIN adj ON adj.a = c.node AND adj.idx =
             CAST('0x' || substr(md5(CAST(c.walk_id AS VARCHAR) || ':'
               || CAST(c.step AS VARCHAR) || ':' || CAST(c.node AS VARCHAR)
               || ':walk'), 1, 13) AS BIGINT) % deg.deg)"""
    }.mkString(",\n        ")
    val unions = (0 to steps).map(t => s"SELECT * FROM w$t")
      .mkString("\n          UNION ALL ")
    s"""WITH e AS (
          SELECT 2000000000 + o_custkey AS u, o_orderkey AS v FROM orders
          UNION ALL
          SELECT l_orderkey AS u, 1000000000 + l_partkey AS v FROM lineitem),
        sym AS (SELECT DISTINCT a, b FROM (
          SELECT u AS a, v AS b FROM e UNION ALL SELECT v AS a, u AS b FROM e)),
        adj AS (SELECT a, b,
          row_number() OVER (PARTITION BY a ORDER BY b) - 1 AS idx FROM sym),
        deg AS (SELECT a AS node, count(*) AS deg FROM sym GROUP BY a),
        w0 AS (SELECT CAST(walk_id AS BIGINT) AS walk_id, 0 AS step,
                 CAST(node AS BIGINT) AS node
               FROM (VALUES $seedRows) AS t0(walk_id, node)),
        $stepCtes
        SELECT walk_id, CAST(step AS INT) AS step, CAST(node AS BIGINT) AS node
        FROM ($unions) ORDER BY walk_id, step"""
  }

  def harmonic(seeds: Seq[Long], rounds: Int, topK: Int,
      scale: Long = 1000000L): String =
    s"""WITH ${multiSourceCtes(seeds, rounds)}
        SELECT node, CAST(sum($scale // dist) AS BIGINT) AS harmonic,
          CAST(count(*) AS BIGINT) AS n_reached
        FROM d$rounds WHERE dist > 0
        GROUP BY node
        ORDER BY harmonic DESC, node ASC LIMIT $topK"""

  /** Per-seed eccentricity within the BFS horizon + reached count — the
    * multi-source frame's other standard reduction (max(dist) per seed is
    * the diameter lower bound over the sample).
    */
  def eccentricity(seeds: Seq[Long], rounds: Int): String =
    s"""WITH ${multiSourceCtes(seeds, rounds)}
        SELECT seed, CAST(max(dist) AS BIGINT) AS ecc,
          CAST(count(*) AS BIGINT) AS n_reached
        FROM d$rounds WHERE dist > 0
        GROUP BY seed ORDER BY seed"""

  /** Mirrors Embeddings.topPrincipalInt: thousandth-quantized values, the
    * d×d second-moment matrix by a dims×dims position cross, max|·|
    * renormalization with sign-separated positive division (`//` and
    * Spark's `div` agree only on non-negative operands), `rounds` power-
    * iteration CTE pairs.
    */
  def topPrincipal(rounds: Int, dims: Int): String = {
    val roundCtes = (1 to rounds).map { i =>
      s"""w$i AS (
           SELECT cp.j, sum(cp.cp * v.v) AS w
           FROM cp JOIN v${i - 1} v ON cp.k = v.k GROUP BY 1),
        v$i AS (
           SELECT j AS k, CAST(sign(w) AS BIGINT)
             * ((abs(w) * 100000) // (SELECT max(abs(w)) FROM w$i)) AS v
           FROM w$i)"""
    }.mkString(",\n        ")
    s"""WITH q AS (
          SELECT list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
          FROM embeddings),
        dims AS (SELECT unnest(range(1, ${dims + 1})) AS i),
        c AS (
          SELECT dj.i - 1 AS j, dk.i - 1 AS k, sum(q.q[dj.i] * q.q[dk.i]) AS c
          FROM q CROSS JOIN dims dj CROSS JOIN dims dk GROUP BY 1, 2),
        cp AS (
          SELECT j, k, CAST(sign(c) AS BIGINT)
            * ((abs(c) * 1000000) // (SELECT max(abs(c)) FROM c)) AS cp
          FROM c),
        v0 AS (SELECT i - 1 AS k, CAST(100000 AS BIGINT) AS v FROM dims),
        $roundCtes
        SELECT CAST(k AS INT) AS dim, CAST(v AS BIGINT) AS v
        FROM v$rounds ORDER BY dim"""
  }

  /** Mirrors events_markov_stationary: the events_transitions lead()
    * window builds the count matrix, then `rounds` integer power-iteration
    * CTEs — mass moves as (pi·n) // tot, so states without out-transitions
    * evaporate their mass identically on both engines.
    */
  def markovStationary(rounds: Int, scale: Long = 1000000L): String = {
    val roundCtes = (1 to rounds).map { i =>
      s"""p$i AS (
           SELECT tm.to_type AS st, sum((p.pi * tm.n) // tm.tot) AS pi
           FROM tm JOIN p${i - 1} p ON tm.from_type = p.st GROUP BY 1)"""
    }.mkString(",\n        ")
    s"""WITH seq AS (
          SELECT event_type AS from_type,
            lead(event_type) OVER (PARTITION BY user_id
              ORDER BY CAST(ts AS TIMESTAMP), event_id) AS to_type
          FROM events),
        t AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
              FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
        tot AS (SELECT from_type, sum(n) AS tot FROM t GROUP BY 1),
        tm AS (SELECT t.from_type, t.to_type, t.n, tot.tot
               FROM t JOIN tot USING (from_type)),
        states AS (SELECT DISTINCT from_type AS st FROM t
                   UNION SELECT DISTINCT to_type FROM t),
        p0 AS (SELECT st, CAST($scale AS BIGINT) AS pi FROM states),
        $roundCtes
        SELECT st AS event_type, CAST(pi AS BIGINT) AS pi
        FROM p$rounds ORDER BY event_type"""
  }

  /** Mirrors GraphAnalytics.bfs over the customer→order→part FK graph
    * (pageRankInt's node-id scheme): one CTE per expansion round — the
    * visited set grows by the frontier's unvisited neighbors at dist = i.
    * Output is the per-distance census (count + min/max/sum of node ids),
    * which pins the exact reached set without emitting O(V) rows.
    */
  /** Mirrors graph_influence: the [[bfs]] frontier CTEs run over the
    * md5-ACTIVATED directed arcs only (the derandomized IC coin — same
    * 52-bit prefix threshold the Spark side evaluates), seeded by the
    * whole seed set at distance 0.
    */
  def influence(seeds: Seq[Long], pNum: Long, rounds: Int): String = {
    val seedList = seeds.mkString(", ")
    val roundCtes = (1 to rounds).map { i =>
      s"""v$i AS (
           SELECT node, dist FROM v${i - 1}
           UNION ALL
           SELECT node, $i AS dist FROM (
             SELECT DISTINCT act.b AS node FROM act
             JOIN v${i - 1} f ON act.a = f.node AND f.dist = ${i - 1}
             WHERE act.b NOT IN (SELECT node FROM v${i - 1})))"""
    }.mkString(",\n        ")
    s"""WITH e AS (
          SELECT 2000000000 + o_custkey AS u, o_orderkey AS v FROM orders
          UNION ALL
          SELECT l_orderkey AS u, 1000000000 + l_partkey AS v FROM lineitem),
        adj AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v AS a, u AS b FROM e),
        act AS (
          SELECT a, b FROM adj
          WHERE CAST('0x' || substr(md5(CAST(a AS VARCHAR) || ':' ||
            CAST(b AS VARCHAR) || ':ic'), 1, 13) AS BIGINT) < $pNum),
        v0 AS (SELECT CAST(unnest([$seedList]) AS BIGINT) AS node, 0 AS dist),
        $roundCtes
        SELECT CAST(dist AS INT) AS dist, CAST(count(*) AS BIGINT) AS n_nodes,
          CAST(min(node) AS BIGINT) AS min_node, CAST(max(node) AS BIGINT) AS max_node,
          CAST(sum(node) AS BIGINT) AS sum_node
        FROM v$rounds GROUP BY dist ORDER BY dist"""
  }

  def bfs(src: Long, rounds: Int): String = {
    val roundCtes = (1 to rounds).map { i =>
      s"""v$i AS (
           SELECT node, dist FROM v${i - 1}
           UNION ALL
           SELECT node, $i AS dist FROM (
             SELECT DISTINCT adj.b AS node FROM adj
             JOIN v${i - 1} f ON adj.a = f.node AND f.dist = ${i - 1}
             WHERE adj.b NOT IN (SELECT node FROM v${i - 1})))"""
    }.mkString(",\n        ")
    s"""WITH e AS (
          SELECT 2000000000 + o_custkey AS u, o_orderkey AS v FROM orders
          UNION ALL
          SELECT l_orderkey AS u, 1000000000 + l_partkey AS v FROM lineitem),
        adj AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v AS a, u AS b FROM e),
        v0 AS (SELECT CAST($src AS BIGINT) AS node, 0 AS dist),
        $roundCtes
        SELECT CAST(dist AS INT) AS dist, CAST(count(*) AS BIGINT) AS n_nodes,
          CAST(min(node) AS BIGINT) AS min_node, CAST(max(node) AS BIGINT) AS max_node,
          CAST(sum(node) AS BIGINT) AS sum_node
        FROM v$rounds GROUP BY dist ORDER BY dist"""
  }

  /** Mirrors GraphAnalytics.sssp (fixed-round Bellman-Ford) over the
    * weighted customer→order→part graph: customer→order edges weigh 1,
    * order→part edges weigh l_quantity. One CTE per relaxation round —
    * union the previous frame with every out-edge relaxation, keep the
    * per-node min. Integer weights ⇒ hash-exact.
    */
  def sssp(src: Long, rounds: Int, topK: Int): String = {
    val roundCtes = (1 to rounds).map { i =>
      s"""d$i AS (
           SELECT node, min(dist) AS dist FROM (
             SELECT node, dist FROM d${i - 1}
             UNION ALL
             SELECT adj.b AS node, d.dist + adj.w AS dist
             FROM adj JOIN d${i - 1} d ON adj.a = d.node)
           GROUP BY node)"""
    }.mkString(",\n        ")
    s"""WITH e AS (
          SELECT 2000000000 + o_custkey AS u, o_orderkey AS v, CAST(1 AS BIGINT) AS w FROM orders
          UNION ALL
          SELECT l_orderkey AS u, 1000000000 + l_partkey AS v, CAST(l_quantity AS BIGINT) AS w FROM lineitem),
        adj AS (SELECT u AS a, v AS b, w FROM e UNION ALL SELECT v AS a, u AS b, w FROM e),
        d0 AS (SELECT CAST($src AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist),
        $roundCtes
        SELECT node, CAST(dist AS BIGINT) AS dist FROM d$rounds
        ORDER BY dist, node LIMIT $topK"""
  }

  // ── fixpoint-asserting twins of the iterative graph operators ───────────
  //
  // Each mirrors a GraphAnalytics.*Converged run: the CTE chain unrolls the
  // engine's hard CAP, the per-round change statistics reproduce the
  // engine's early-exit test in SQL (survivor-count equality for the
  // monotone peels, changed-rows count for labels/distances), and the
  // summary reads the CAP-round frame — sound because a reached fixpoint is
  // absorbing (round r = round r−1 implies every later round is identical),
  // so frame(cap) = frame(rounds_used) whether or not the engine stopped
  // early. rounds_used counts the CONFIRMING round, exactly like the
  // engine's loop counter.

  /** Mirrors graph_kcore_fixpoint: [[kCore]]'s peel unrolled to `cap` with
    * the count-equality convergence test and the final degree-attach
    * summary. Each s$i is MATERIALIZED — it is referenced three times
    * (both endpoint joins of the next round + the counts row).
    */
  def kCoreFixpoint(k: Int, cap: Int): String = {
    val roundCtes = (1 to cap).map { i =>
      s"""s$i AS MATERIALIZED (
           SELECT adj.a AS node FROM adj
           JOIN s${i - 1} x ON adj.a = x.node
           JOIN s${i - 1} y ON adj.b = y.node
           GROUP BY adj.a HAVING count(*) >= $k)"""
    }.mkString(",\n        ")
    val countRows = (0 to cap).map(i => s"SELECT $i AS r, count(*) AS n FROM s$i")
      .mkString("\n          UNION ALL ")
    s"""WITH e AS (
          SELECT DISTINCT l_orderkey AS u, 1000000000 + l_partkey AS v FROM lineitem),
        adj AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v AS a, u AS b FROM e),
        s0 AS MATERIALIZED (SELECT DISTINCT a AS node FROM adj),
        $roundCtes,
        counts AS ($countRows),
        conv AS (
          SELECT min(c1.r) AS conv_r FROM counts c1
          JOIN counts c0 ON c0.r = c1.r - 1 AND c0.n = c1.n),
        core AS (
          SELECT adj.a AS node, count(*) AS core_deg FROM adj
          JOIN s$cap x ON adj.a = x.node
          JOIN s$cap y ON adj.b = y.node
          GROUP BY adj.a HAVING count(*) >= $k)
        SELECT CAST(coalesce(conv_r, $cap) AS INT) AS rounds_used,
          conv_r IS NOT NULL AS converged,
          (SELECT CAST(count(*) AS BIGINT) FROM core) AS n_core,
          (SELECT CAST(coalesce(sum(core_deg), 0) AS BIGINT) FROM core) AS sum_core_deg,
          (SELECT CAST(coalesce(sum(node), 0) AS BIGINT) FROM core) AS sum_node
        FROM conv"""
  }

  /** Mirrors graph_ktruss_fixpoint: [[trussEdges]]'s cascading support peel
    * over the co-purchase graph RESTRICTED to parts ≡ 0 (mod `mod`) —
    * sparser, so the cascade runs deep (12 rounds at sf0.01 vs 3 on the
    * full graph) while each round stays cheap. Unrolled to `cap` with the
    * edge-count convergence test.
    */
  def trussFixpoint(k: Int, cap: Int, mod: Int): String = {
    val bar = k - 2
    val roundCtes = (1 to cap).map { i =>
      s"""t$i AS MATERIALIZED (
           SELECT e1.u AS a, e1.v AS b, e2.v AS c
           FROM e${i - 1} e1
           JOIN e${i - 1} e2 ON e2.u = e1.u AND e1.v < e2.v
           JOIN e${i - 1} e3 ON e3.u = e1.v AND e3.v = e2.v),
        s$i AS MATERIALIZED (
           SELECT u, v, count(*) AS support FROM (
             SELECT a AS u, b AS v FROM t$i
             UNION ALL SELECT a, c FROM t$i
             UNION ALL SELECT b, c FROM t$i)
           GROUP BY u, v HAVING count(*) >= $bar),
        e$i AS MATERIALIZED (SELECT u, v FROM s$i)"""
    }.mkString(",\n        ")
    val countRows = (0 to cap).map(i => s"SELECT $i AS r, count(*) AS n FROM e$i")
      .mkString("\n          UNION ALL ")
    s"""WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
          WHERE l_partkey % $mod = 0),
        e0 AS MATERIALIZED (
          SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
          FROM lp a JOIN lp b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        $roundCtes,
        counts AS ($countRows),
        conv AS (
          SELECT min(c1.r) AS conv_r FROM counts c1
          JOIN counts c0 ON c0.r = c1.r - 1 AND c0.n = c1.n)
        SELECT CAST(coalesce(conv_r, $cap) AS INT) AS rounds_used,
          conv_r IS NOT NULL AS converged,
          (SELECT CAST(count(*) AS BIGINT) FROM s$cap) AS n_edges,
          (SELECT CAST(coalesce(sum(support), 0) AS BIGINT) FROM s$cap) AS sum_support,
          (SELECT CAST(coalesce(sum(u), 0) + coalesce(sum(v), 0) AS BIGINT) FROM s$cap)
            AS sum_ends
        FROM conv"""
  }

  /** Mirrors graph_lpa_fixpoint: deterministic synchronous LPA over the
    * same restricted co-purchase graph as [[trussFixpoint]], unrolled to
    * `cap` with the changed-labels convergence test (labels are not
    * monotone, so count equality would not do).
    */
  def lpaFixpoint(cap: Int, mod: Int): String = {
    val roundCtes = (1 to cap).map { i =>
      s"""c$i AS (SELECT adj.a, l.lbl, count(*) AS cnt
           FROM adj JOIN l${i - 1} l ON adj.b = l.node GROUP BY 1, 2),
        l$i AS MATERIALIZED (SELECT a AS node, lbl FROM (
           SELECT a, lbl, row_number() OVER (
             PARTITION BY a ORDER BY cnt DESC, lbl ASC) AS rn
           FROM c$i) WHERE rn = 1)"""
    }.mkString(",\n        ")
    val chRows = (1 to cap).map { i =>
      s"""SELECT $i AS r, count(*) AS ch FROM l$i a
           JOIN l${i - 1} b ON a.node = b.node AND a.lbl <> b.lbl"""
    }.mkString("\n          UNION ALL ")
    s"""WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
          WHERE l_partkey % $mod = 0),
        e AS MATERIALIZED (
          SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
          FROM lp a JOIN lp b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        adj AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v AS a, u AS b FROM e),
        l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS lbl FROM adj),
        $roundCtes,
        changes AS ($chRows),
        conv AS (SELECT min(r) AS conv_r FROM changes WHERE ch = 0)
        SELECT CAST(coalesce(conv_r, $cap) AS INT) AS rounds_used,
          conv_r IS NOT NULL AS converged,
          (SELECT CAST(count(*) AS BIGINT) FROM l$cap) AS n_nodes,
          (SELECT CAST(count(DISTINCT lbl) AS BIGINT) FROM l$cap) AS n_communities,
          (SELECT CAST(coalesce(sum(lbl), 0) AS BIGINT) FROM l$cap) AS sum_lbl
        FROM conv"""
  }

  /** Mirrors graph_bfs_fixpoint: unit-weight min-plus relaxation over the
    * FK graph unrolled to `cap`, with the Bellman-Ford termination test
    * (no distance improved AND no node reached — a round can improve
    * distances without growing the frame, so the change test joins on
    * (node, dist), not counts).
    */
  def bfsFixpoint(src: Long, cap: Int): String = {
    val roundCtes = (1 to cap).map { i =>
      s"""d$i AS MATERIALIZED (
           SELECT node, min(dist) AS dist FROM (
             SELECT node, dist FROM d${i - 1}
             UNION ALL
             SELECT adj.b AS node, d.dist + 1 AS dist
             FROM adj JOIN d${i - 1} d ON adj.a = d.node)
           GROUP BY node)"""
    }.mkString(",\n        ")
    val chRows = (1 to cap).map { i =>
      s"""SELECT $i AS r, count(*) AS ch FROM d$i a
           LEFT JOIN d${i - 1} b ON a.node = b.node
           WHERE b.node IS NULL OR a.dist <> b.dist"""
    }.mkString("\n          UNION ALL ")
    s"""WITH e AS (
          SELECT 2000000000 + o_custkey AS u, o_orderkey AS v FROM orders
          UNION ALL
          SELECT l_orderkey AS u, 1000000000 + l_partkey AS v FROM lineitem),
        adj AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v AS a, u AS b FROM e),
        d0 AS (SELECT CAST($src AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist),
        $roundCtes,
        changes AS ($chRows),
        conv AS (SELECT min(r) AS conv_r FROM changes WHERE ch = 0)
        SELECT CAST(coalesce(conv_r, $cap) AS INT) AS rounds_used,
          conv_r IS NOT NULL AS converged,
          (SELECT CAST(count(*) AS BIGINT) FROM d$cap) AS n_reached,
          (SELECT CAST(max(dist) AS INT) FROM d$cap) AS max_dist,
          (SELECT CAST(coalesce(sum(dist), 0) AS BIGINT) FROM d$cap) AS sum_dist,
          (SELECT CAST(coalesce(sum(node), 0) AS BIGINT) FROM d$cap) AS sum_node
        FROM conv"""
  }

  /** Mirrors Dedup.winnowPairs (and, with `restrict`, its incremental
    * twin): the inverted-index self-join over MOSS-winnowed fingerprints —
    * k-shingle md5s, rightmost-min of each w-window, distinct (doc, fp),
    * hot-fp pruning at `maxDocFreq`, pairs sharing ≥ `minShared`
    * fingerprints, exact-integer overlap vs the smaller doc. `restrict`
    * filters the final pair list (the incremental query's
    * pairs-touching-the-batch contract).
    */
  def winnowPairs(k: Int, w: Int, minShared: Long, maxDocFreq: Long,
      restrict: String = "TRUE"): String =
    s"""WITH h AS (
         SELECT doc_id, list_transform(${shinglesSql(k)},
             s -> md5(s)) AS hs
         FROM documents),
       s AS (
         SELECT doc_id, hs, unnest(range(greatest(len(hs) - ${w - 1}, 1))) AS j
         FROM h WHERE len(hs) >= 1),
       q AS (
         SELECT doc_id, list_min(hs[j+1:j+$w]) AS fp FROM s),
       f AS (SELECT DISTINCT doc_id, fp FROM q),
       sz AS (SELECT doc_id, count(*) AS n_fp FROM f GROUP BY doc_id),
       g AS (SELECT * FROM f WHERE fp IN (
               SELECT fp FROM f GROUP BY fp HAVING count(*) <= $maxDocFreq)),
       p AS (
         SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             CAST(count(*) AS BIGINT) AS n_shared
         FROM g a JOIN g b ON a.fp = b.fp AND a.doc_id < b.doc_id
         GROUP BY 1, 2 HAVING count(*) >= $minShared)
       SELECT a_id, b_id, n_shared, sa.n_fp AS a_fp, sb.n_fp AS b_fp,
           (n_shared * 1000000) // least(sa.n_fp, sb.n_fp) AS overlap_ppm
       FROM p
       JOIN sz sa ON sa.doc_id = a_id
       JOIN sz sb ON sb.doc_id = b_id
       WHERE ($restrict)
       ORDER BY a_id, b_id"""

  /** Mirrors TextAnalysis.gopherRules: per-document hard filter flags with
    * exact-integer ppm measurements (integer division both sides). The
    * Gopher 8-word stop list is shared with the Spark side via
    * `gopherStopsSqlList` so the rule and oracle cannot drift.
    */
  def gopherRules(minTok: Int, maxTok: Int): String = {
    val stops = graft.pipeline.TextAnalysis.gopherStopsSqlList
    s"""WITH x AS (
          SELECT doc_id, string_split(text, ' ') AS toks, text FROM documents),
        m AS (
          SELECT doc_id,
            CAST(len(toks) AS BIGINT) AS n_tok,
            CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(toks, t -> CAST(length(t) AS BIGINT))),
              (acc, x) -> acc + x) AS BIGINT) AS sum_wl,
            CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-zA-Z]'))) AS BIGINT) AS n_alpha,
            CAST(len(list_filter(toks, t -> t IN ($stops))) AS BIGINT) AS stop_hits,
            CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS hash_cnt,
            CAST((length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT) AS ell_cnt
          FROM x),
        r AS (
          SELECT doc_id, n_tok,
            sum_wl * 1000000 // n_tok AS mwl_ppm,
            n_alpha * 1000000 // n_tok AS alpha_ppm,
            stop_hits,
            (hash_cnt + ell_cnt) * 1000000 // n_tok AS sym_ppm
          FROM m)
        SELECT doc_id, n_tok, mwl_ppm, alpha_ppm, stop_hits, sym_ppm,
          CAST(n_tok BETWEEN $minTok AND $maxTok AS INT) AS r_len,
          CAST(mwl_ppm BETWEEN 3000000 AND 10000000 AS INT) AS r_mwl,
          CAST(alpha_ppm >= 800000 AS INT) AS r_alpha,
          CAST(stop_hits >= 2 AS INT) AS r_stop,
          CAST(sym_ppm <= 100000 AS INT) AS r_sym,
          CAST(n_tok BETWEEN $minTok AND $maxTok
            AND mwl_ppm BETWEEN 3000000 AND 10000000
            AND alpha_ppm >= 800000 AND stop_hits >= 2
            AND sym_ppm <= 100000 AS INT) AS keep
        FROM r ORDER BY doc_id"""
  }

  /** Mirrors TextAnalysis.dsirWeights: hashed-bigram importance weights,
    * target = lang-'en' documents, add-one smoothing, per-doc terms folded
    * in ascending-bucket order (the sequential-fold float idiom), output
    * floor(w·1e6).
    */
  def dsir(buckets: Int): String = {
    val toks = "string_split(text, ' ')"
    val grams = s"list_transform(range(len($toks)-1), i -> concat_ws(' ', $toks[i+1], $toks[i+2]))"
    s"""WITH g0 AS (
          SELECT doc_id, lang = 'en' AS is_t, unnest($grams) AS gm
          FROM documents WHERE len($toks) >= 2),
        g AS (
          SELECT doc_id, is_t,
            CAST('0x' || substr(md5(gm), 1, 6) AS BIGINT) % $buckets AS b
          FROM g0),
        db AS (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS c FROM g GROUP BY 1, 2),
        rb AS (
          SELECT b, CAST(count(*) AS BIGINT) AS rc,
            CAST(coalesce(sum(CASE WHEN is_t THEN 1 ELSE 0 END), 0) AS BIGINT) AS tc
          FROM g GROUP BY b),
        tot AS (SELECT sum(rc) AS n_r, sum(tc) AS n_t FROM rb),
        lr AS (
          SELECT b,
            ln((CAST(tc AS DOUBLE) + 1.0) / (CAST(n_t AS DOUBLE) + $buckets.0)) -
            ln((CAST(rc AS DOUBLE) + 1.0) / (CAST(n_r AS DOUBLE) + $buckets.0)) AS lr
          FROM rb CROSS JOIN tot),
        terms AS (
          SELECT doc_id, b, CAST(c AS DOUBLE) * lr AS term
          FROM db JOIN lr USING (b)),
        l AS (
          SELECT doc_id, list(term ORDER BY b) AS ts FROM terms GROUP BY doc_id)
        SELECT doc_id,
          CAST(floor(list_reduce(list_prepend(0.0, ts), (a, x) -> a + x)
            * 1000000.0) AS BIGINT) AS w_fp
        FROM l ORDER BY doc_id"""
  }
}
