package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing demo for the co-located join strategy (SURVEY §1.3 / scale
  * stance): fact and dim bucketed by the join key join WITHOUT a shuffle
  * exchange — the layout a 100 TB deployment pre-pays once at write time
  * and amortizes across every subsequent join on that key.
  */
class BucketingSpec extends AnyFunSuite with SparkTestBase {

  test("bucketed tables join without an exchange on the bucketed key") {
    val sf = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    Tables.lineitem(spark, sf)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    Tables.orders(spark, sf)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString

    // no shuffle before the join: the only Exchange allowed is none at all
    // (the groupBy reuses the join key partitioning too)
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
      s"unexpected shuffle on the bucketed key:\n$plan")

    // same join unbucketed DOES shuffle both sides
    val unbucketed = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
    unbucketed.collect()
    assert(unbucketed.queryExecution.executedPlan.toString
      .contains("Exchange hashpartitioning"))

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
  }
}
