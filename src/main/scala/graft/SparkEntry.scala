package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.GraphOps
import graft.Tables._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 (and the pipeline extensions) is declared
  * here as a named query over the driver's parquet tables, with a DuckDB
  * oracle. All queries end in a total order (SURVEY §4.3) so hash comparison
  * is deterministic.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("r4_search")(spark, "/root/testdata/sf0.001")

  // Decimal casts for cross-engine-exact aggregation (double sums are
  // order-dependent; decimal sums are exact in both Spark and DuckDB).
  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── §2.1 reference read parity ────────────────────────────────────────

    // R1 point lookup (client.ts:188-210): entities ⇐ part.
    "r1_point_lookup" -> ((s, d) => {
      val entities = part(s, d).select(
        format_string("part#%09d", col("p_partkey")).as("name"),
        col("p_type").as("entity_type"))
      GraphOps.getEntity(entities, "part#000000042").orderBy("name")
    }),

    // R2 dependent child scan (client.ts:198-201): observations ⇐ orders.
    "r2_child_scan" -> ((s, d) =>
      GraphOps.observationsFor(orderObservations(s, d), "Customer#000000042")
        .orderBy("content")),

    // R4 flagship relevance-ranked fuzzy search (client.ts:212-266).
    // Query "ur": FURNITURE segment → relevance 2; customers with an URGENT
    // order match via observations → relevance 1.
    "r4_search" -> ((s, d) =>
      GraphOps.searchEntities(
        customerEntities(s, d).drop("c_custkey"),
        orderObservations(s, d), "ur", limit = 50)),

    // R6 hydrate: join + ordered collect_list replaces the N+1 loop
    // (client.ts:248-263); string-joined for a stable oracle compare.
    "r6_hydrate" -> ((s, d) => {
      val hits = customerEntities(s, d)
        .filter(col("c_custkey") < 100)
        .select(col("name"), col("entity_type"))
      GraphOps.hydrate(hits, orderObservations(s, d))
        .select(col("name"), col("entity_type"),
          array_join(col("observations"), ";").as("obs_concat"))
        .orderBy("name")
    }),

    // R7 top-k by recency (client.ts:268-295).
    "r7_recent" -> ((s, d) =>
      GraphOps.recentEntities(orderEntities(s, d), 10)),

    // R8 edge lookup for an entity set (client.ts:407-430), union-of-semi-join
    // form (broadcast-hash, not BNLJ).
    "r8_edges" -> ((s, d) => {
      import s.implicits._
      val names = Seq("order#000000001", "order#000000002", "order#000000003",
        "part#000000005", "part#000000007").toDF("name")
      GraphOps.relationsForEntities(lineitemRelations(s, d), names)
        .orderBy("from_entity", "to_entity")
    }),

    // R9 read_graph composition (client.ts:433-441): edges of the 10 most
    // recent entities.
    "r9_read_graph" -> ((s, d) =>
      GraphOps.readGraphEdges(orderEntities(s, d), lineitemRelations(s, d), 10)
        .orderBy("from_entity", "to_entity")),

    // R11 existence check (client.ts:343-349), as a one-row aggregate.
    "r11_exists" -> ((s, d) =>
      part(s, d).filter(col("p_name") === "cold widget")
        .agg(count(lit(1)).as("n"))
        .select(col("n"), (col("n") > 0).as("found"))),

    // ── aggregation battery (SURVEY §7.2 M4, star-schema surface) ─────────

    // TPC-H Q1-style full-scan aggregation; decimal sums for exactness.
    "q1_agg" -> ((s, d) =>
      lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).as("sum_qty"),
          sum(dec(col("l_extendedprice"))).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"))
  )

  /** DuckDB-equivalent ANSI SQL per query (same column names, same total
    * order). Omitted ⇒ driver records a weaker rows-only check.
    */
  def oracleSql: Map[String, String] = Map(
    "r1_point_lookup" ->
      """SELECT printf('part#%09d', p_partkey) AS name, p_type AS entity_type
         FROM part WHERE printf('part#%09d', p_partkey) = 'part#000000042'
         ORDER BY name""",
    "r2_child_scan" ->
      """SELECT o_orderpriority AS content
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE c_name = 'Customer#000000042' ORDER BY content""",
    "r4_search" ->
      """SELECT name, entity_type, created_at, relevance_score FROM (
           SELECT DISTINCT c.c_name AS name, c.c_mktsegment AS entity_type,
             TIMESTAMP '2024-01-01 00:00:00' + INTERVAL 1 SECOND * c.c_custkey AS created_at,
             CASE WHEN lower(c.c_name) LIKE '%ur%' THEN 3
                  WHEN lower(c.c_mktsegment) LIKE '%ur%' THEN 2 ELSE 1 END AS relevance_score
           FROM customer c
           WHERE lower(c.c_name) LIKE '%ur%' OR lower(c.c_mktsegment) LIKE '%ur%'
              OR EXISTS (SELECT 1 FROM orders o JOIN customer c2 ON o.o_custkey = c2.c_custkey
                         WHERE c2.c_name = c.c_name AND lower(o.o_orderpriority) LIKE '%ur%')
         ) ORDER BY relevance_score DESC, created_at DESC, name ASC LIMIT 50""",
    "r6_hydrate" ->
      """SELECT c.c_name AS name, c.c_mktsegment AS entity_type,
             coalesce(string_agg(o.o_orderpriority, ';' ORDER BY o.o_orderpriority), '') AS obs_concat
         FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
         WHERE c.c_custkey < 100
         GROUP BY c.c_name, c.c_mktsegment ORDER BY name""",
    "r7_recent" ->
      """SELECT printf('order#%09d', o_orderkey) AS name,
             o_orderstatus AS entity_type, o_orderdate AS created_at
         FROM orders ORDER BY created_at DESC, name ASC LIMIT 10""",
    "r8_edges" ->
      """SELECT printf('order#%09d', l_orderkey) AS from_entity,
             printf('part#%09d', l_partkey) AS to_entity,
             'contains' AS relation_type
         FROM lineitem
         WHERE l_orderkey IN (1, 2, 3) OR l_partkey IN (5, 7)
         ORDER BY from_entity, to_entity""",
    "r9_read_graph" ->
      """WITH recent AS (
           SELECT o_orderkey FROM orders
           ORDER BY o_orderdate DESC, printf('order#%09d', o_orderkey) ASC LIMIT 10)
         SELECT printf('order#%09d', l_orderkey) AS from_entity,
             printf('part#%09d', l_partkey) AS to_entity,
             'contains' AS relation_type
         FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM recent)
         ORDER BY from_entity, to_entity""",
    "r11_exists" ->
      """SELECT CAST(count(*) AS BIGINT) AS n, count(*) > 0 AS found
         FROM part WHERE p_name = 'cold widget'""",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
             sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
             sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS sum_disc_price,
             CAST(count(*) AS BIGINT) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus"""
  )
}
