package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond connected components (Dedup.scala).
  *
  * PageRank here is FIXED-POINT INTEGER PageRank: ranks are scaled longs and
  * every step uses integer multiply/divide only. Floating-point PageRank is
  * not hash-verifiable across engines (per-target contribution sums depend on
  * reduction order); with scaled longs the sum is order-independent and the
  * DuckDB oracle (chained CTEs, one per iteration — OracleSqlGen.pageRankInt)
  * matches bit-for-bit. The usual float formulation differs only in rounding
  * ~1e-6 per step, so the integer variant is a faithful ranking.
  *
  * Scale shape (100 TB stance):
  *  - edges are hash-partitioned by `src` ONCE and cached; every iteration's
  *    contribution join reuses that partitioning (no per-round edge shuffle);
  *  - each iteration is exactly one shuffle: the groupBy(dst) that sums the
  *    received contributions. Out-degrees are computed once.
  *  - the rank frame stays (node, long) — O(V) rows, never the edge list.
  *  - iterations are fixed and small (3–20); lineage stays shallow so no
  *    checkpointing is needed (contrast the unbounded CC loop, Dedup.scala,
  *    which checkpoints per round).
  */
object GraphAnalytics {

  /** PageRank over directed `edges` with columns (src: long, dst: long).
    * Multi-edges count once per occurrence (out-degree counts edges, and each
    * edge carries one contribution) — deterministic on both engines.
    *
    * rank_0(v)   = scale
    * rank_i+1(v) = base + Σ_{(u,v)∈E} ((rank_i(u) * dampNum) div dampDen) div outDeg(u)
    * base        = (scale * (dampDen - dampNum)) div dampDen
    */
  def pageRankInt(
      edges: DataFrame,
      iters: Int,
      scale: Long = 1000000L,
      dampNum: Long = 85,
      dampDen: Long = 100): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1, 50], got $iters")
    val e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .repartition(col("src"))
      .cache()
    // deg groups on e's partitioning key — no exchange; stays src-partitioned
    val deg = e.groupBy("src").agg(count(lit(1)).as("out_deg")).cache()
    val base = (scale * (dampDen - dampNum)) / dampDen

    // Ranks are carried ONLY as received mass keyed by dst: any node absent
    // from `recv` has rank = base (no in-edges), so the full O(V) rank frame
    // never enters the loop. Per iteration exactly two exchanges: recv →
    // src-hash for the degree join (e and deg are already src-partitioned,
    // so the edge side never re-shuffles), and the groupBy(dst) sum.
    var recv: Option[DataFrame] = None
    for (_ <- 1 to iters) {
      val contrib = recv match {
        case None => // rank_0 = scale for every node
          deg.select(col("src"),
            expr(s"(($scale * $dampNum) div $dampDen) div out_deg").as("contrib"))
        case Some(r) =>
          deg.join(r.withColumnRenamed("node", "src"), Seq("src"), "left")
            .select(col("src"),
              expr(s"((($base + coalesce(recv, 0L)) * $dampNum) div $dampDen) div out_deg")
                .as("contrib"))
      }
      recv = Some(
        e.join(contrib, "src")
          .groupBy(col("dst").as("node"))
          .agg(sum("contrib").as("recv")))
    }
    // The O(V) node set is joined exactly once, at the end, for the output.
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
    nodes.join(recv.get, Seq("node"), "left")
      .select(col("node"), (lit(base) + coalesce(col("recv"), lit(0L))).as("pr"))
  }
}
