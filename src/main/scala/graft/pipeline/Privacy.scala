package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: redact e-mail addresses, IPv4
  * addresses, and phone-like digit runs with typed placeholders before any
  * text leaves the pipeline. Pure `regexp_replace` chains (codegen'd, no
  * UDFs) so redaction runs at scan speed — at 100 TB this is a map stage
  * fused into the document scan, shuffling nothing.
  *
  * Pattern notes: the regexes stick to character classes, bounded
  * quantifiers, and word boundaries — constructs whose semantics agree
  * between Java's regex engine (Spark) and RE2 (DuckDB oracle). No
  * lookaround, no backreferences — those diverge or don't exist in RE2.
  * Order matters and is fixed: e-mails first (their local part may contain
  * digits a later pass would chew on), then IPv4 (dotted digit runs would
  * otherwise half-match the phone pattern), then phones.
  */
object Privacy {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  /** Structured 3-3-4 phone shapes with optional +country and () area code.
    * Deliberately NOT a loose "long digit run" pattern — that also matches
    * ISO dates (1995-01-01), which a corpus is full of.
    */
  val PhonePattern = "(\\+?\\d{1,3}[ .-])?\\(?\\d{3}\\)?[ .-]?\\d{3}[ .-]\\d{4}"

  /** Exact md5-derived uniform in [0, 1): the top 52 bits of md5(seed)
    * over 2^52. Both numerator (a ≤52-bit integer) and the division are
    * exactly representable in a double, so Spark and the DuckDB oracle
    * produce bit-identical values — the foundation that makes the DP
    * mechanism below hash-verifiable (the md5-sampling family's pattern).
    */
  def md5Uniform(seed: Column): Column =
    conv(substring(md5(seed.cast("string")), 1, 13), 16, 10).cast("double") /
      lit(4503599627370496.0) // 2^52

  /** Inverse-CDF table of the TRUNCATED two-sided geometric distribution
    * at alpha = 1/2 — the Ghosh–Roughgarden–Sundararajan geometric
    * mechanism (the discrete analog of Laplace; epsilon = ln 2 per unit of
    * query sensitivity): P(k) ∝ 2^{-|k|}, support clipped to
    * [-maxMag, maxMag] and renormalized (tail mass 2^{-maxMag} ≈ 0 at the
    * default). Returned as ascending (cumulative, k) pairs; the SAME
    * doubles are embedded as literals on the Spark side and in the oracle
    * SQL, so the branch comparisons agree exactly on both engines even
    * though 1/3-scaled cumulative sums are not binary rationals.
    */
  def geometricThresholds(maxMag: Int): Seq[(Double, Int)] = {
    require(maxMag >= 1 && maxMag <= 40)
    val weights = (-maxMag to maxMag).map(k => math.pow(0.5, math.abs(k)))
    val total = weights.sum
    var cum = 0.0
    (-maxMag to maxMag).map { k =>
      cum += math.pow(0.5, math.abs(k)) / total
      (cum, k)
    }
  }

  /** Two-sided geometric (discrete Laplace) noise as a pure function of
    * `seed`: md5-uniform inverse-CDF over [[geometricThresholds]]. A REAL
    * release would seed from a secret; the pipeline's value here is the
    * portable, partition-independent mechanism — integer noise, exact
    * branch math, deterministic replay on any engine.
    */
  def geometricNoise(seed: Column, maxMag: Int = 16): Column = {
    val u = md5Uniform(seed)
    val th = geometricThresholds(maxMag)
    th.init.foldLeft(Option.empty[Column]) { case (acc, (t, k)) =>
      Some(acc match {
        case None => when(u < lit(t), lit(k))
        case Some(c) => c.when(u < lit(t), lit(k))
      })
    }.get.otherwise(lit(maxMag))
  }

  def redactEmails(c: Column): Column = regexp_replace(c, EmailPattern, "<EMAIL>")
  def redactIps(c: Column): Column = regexp_replace(c, Ipv4Pattern, "<IP>")
  def redactPhones(c: Column): Column = regexp_replace(c, PhonePattern, "<PHONE>")

  /** Full redaction chain, fixed order (see scaladoc above). */
  def redactPii(c: Column): Column = redactPhones(redactIps(redactEmails(c)))

  /** Deterministic fake PII used by the declared query's fixture (the
    * driver's synthetic documents contain no real PII to scrub): each doc
    * gets an e-mail, an IP, and a phone number derived from its id.
    */
  def withFakePii(text: Column, id: Column): Column =
    concat(text,
      lit(" contact user"), id, lit("@example.com or 10.0."),
      pmod(id, lit(256)), lit(".7 tel +1 555-010-"),
      lpad(pmod(id, lit(10000)).cast("string"), 4, "0"))

  /** k-anonymity generalization decision over a two-level quasi-identifier
    * lattice (Sweeney, "k-anonymity: a model for protecting privacy",
    * IJUFKS 2002): for each (coarse, fine) group, release at the finest
    * level whose equivalence class reaches `k` —
    * level 2 = (coarse, fine) is already k-anonymous,
    * level 1 = only the coarse class is (fine value must generalize away),
    * level 0 = even coarse is below k (suppress).
    * Two aggregations (fine O(groups), coarse O(coarse values)); the
    * coarse counts broadcast back — never a per-row pass.
    */
  /** Distinct-l-diversity audit (Machanavajjhala et al., "l-diversity:
    * privacy beyond k-anonymity", TKDD 2007): a k-anonymous equivalence
    * class still leaks its sensitive attribute when the class is
    * homogeneous — every member shares the value. For each
    * quasi-identifier class: size, distinct sensitive values, and whether
    * distinct-l-diversity holds (d ≥ l). One exact two-key aggregation
    * then an O(classes) rollup — the sensitive column never leaves the
    * group-by, and nothing is per-row after the first shuffle.
    */
  def lDiversity(df: DataFrame, qi: Seq[String], sensitive: Column, l: Long): DataFrame = {
    require(l >= 1)
    df.groupBy(qi.map(col) :+ sensitive.as("sv"): _*)
      .agg(count(lit(1)).as("n"))
      .groupBy(qi.map(col): _*)
      .agg(sum("n").as("n"), count(lit(1)).as("d"))
      .withColumn("diverse", (col("d") >= l).cast("int"))
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian, "t-closeness: privacy
    * beyond k-anonymity and l-diversity", ICDE 2007) for an ORDERED
    * sensitive attribute: a class leaks when its sensitive-value
    * distribution strays from the table-wide one, measured by the earth
    * mover's distance, which for an ordered domain of k values is
    * Σᵢ|cumᵢ(p−q)| / (k−1). Everything stays integer by cross-multiplying
    * the two distributions onto the common denominator n_g·N:
    * cumᵢ = Σ_{j≤i} (c_j·N − g_j·n_g), EMD = Σ|cumᵢ| / (n_g·N·(k−1)).
    * Products run in DECIMAL(38,0) (c·N alone reaches N² at scale); the
    * one closing division is a double of exact integers. Shape: three
    * aggregations, a broadcast (k global counts + totals) grid join, and a
    * per-class window over k rows — nothing global, nothing per-row after
    * the first shuffle.
    */
  def tCloseness(df: DataFrame, qi: Seq[String], sensitive: Column, t: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val sv = df.select(qi.map(col) :+ sensitive.as("sv"): _*)
    val glob = sv.groupBy("sv").agg(count(lit(1)).as("g"))
    val tot = glob.agg(sum("g").as("nn"), count(lit(1)).as("k"))
    val cls = sv.groupBy(qi.map(col): _*).agg(count(lit(1)).as("n_g"))
    val cells = sv.groupBy(qi.map(col) :+ col("sv"): _*).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(qi.map(col): _*).orderBy("sv")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cls.crossJoin(broadcast(glob))
      .join(cells, qi :+ "sv", "left").na.fill(0, Seq("c"))
      .crossJoin(broadcast(tot))
      .withColumn("diff",
        col("c").cast(DecimalType(38, 0)) * col("nn")
          - col("g").cast(DecimalType(38, 0)) * col("n_g"))
      .withColumn("cum", sum(col("diff")).over(w))
      .groupBy(qi.map(col) :+ col("n_g") :+ col("nn") :+ col("k"): _*)
      .agg(sum(abs(col("cum"))).as("emd_num"))
      .withColumn("den",
        col("n_g").cast(DecimalType(38, 0)) * col("nn") * (col("k") - 1))
      // explicit k=1 guard: with a single sensitive value the EMD is the
      // 0/0 form (every class matches the global distribution exactly);
      // ANSI mode would throw on the division, so emit NULL emd/close
      .withColumn("emd",
        when(col("den") === 0, lit(null).cast("double"))
          .otherwise(col("emd_num").cast("double") / col("den").cast("double")))
      .select(qi.map(col) :+ col("n_g") :+
        col("emd_num").cast("long").as("emd_num") :+
        col("emd") :+
        (col("emd") <= t).cast("int").as("close"): _*)
  }

  def kAnonymityLevels(df: DataFrame, coarse: Column, fine: Column, k: Long): DataFrame = {
    require(k >= 1)
    val g2 = df.groupBy(coarse.as("qi_coarse"), fine.as("qi_fine"))
      .agg(count(lit(1)).as("n"))
    val g1 = g2.groupBy("qi_coarse").agg(sum("n").as("n_coarse"))
    g2.join(broadcast(g1), Seq("qi_coarse"))
      .select(col("qi_coarse"), col("qi_fine"), col("n"),
        when(col("n") >= k, 2)
          .when(col("n_coarse") >= k, 1)
          .otherwise(0).cast("int").as("release_level"))
  }
}
