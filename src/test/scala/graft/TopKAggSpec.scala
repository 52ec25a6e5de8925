package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKAgg.topK

/** Bounded top-k aggregate: semantics vs the window formulation, partial
  * merge correctness, SQL surface.
  */
class TopKAggSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("top-k equals window row_number form on real data, across partitionings") {
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderpriority").as("g"), col("o_totalprice").cast("double").as("v"))
    val windowed = {
      import org.apache.spark.sql.expressions.Window
      o.withColumn("rn", row_number().over(
          Window.partitionBy("g").orderBy(desc("v"))))
        .filter(col("rn") <= 5).groupBy("g")
        .agg(sort_array(collect_list("v"), asc = false).as("top"))
    }
    // 1 and 37 partitions: the latter forces many partial buffers through
    // serialize/deserialize/merge
    Seq(o.coalesce(1), o.repartition(37)).foreach { in =>
      val agg = in.groupBy("g").agg(topK(col("v"), 5).as("top"))
      val diff = agg.exceptAll(windowed).count() + windowed.exceptAll(agg).count()
      assert(diff == 0)
    }
  }

  test("k larger than group; nulls skipped; duplicates kept as multiset") {
    val df = Seq(("a", Some(1.0)), ("a", Some(3.0)), ("a", None),
      ("a", Some(3.0)), ("b", Some(2.0))).toDF("g", "v")
    val out = df.groupBy("g").agg(topK(col("v"), 10).as("top"))
      .as[(String, Seq[Double])].collect().toMap
    assert(out("a") == Seq(3.0, 3.0, 1.0)) // sorted desc, dup kept, null gone
    assert(out("b") == Seq(2.0))
  }

  test("SQL surface: top_k registered (extension + register())") {
    graft.functions.VectorFunctions.register(spark)
    Seq(("x", 1.0), ("x", 5.0), ("x", 3.0)).toDF("g", "v")
      .createOrReplaceTempView("topk_in")
    val r = spark.sql("SELECT top_k(v, 2) AS top FROM topk_in GROUP BY g")
      .as[Seq[Double]].head()
    assert(r == Seq(5.0, 3.0))
  }

  test("non-double inputs cast implicitly; non-literal k rejected cleanly") {
    graft.functions.VectorFunctions.register(spark)
    Seq(("x", 4), ("x", 9)).toDF("g", "v").createOrReplaceTempView("topk_int")
    // int column: implicit cast at analysis, not ClassCastException mid-job
    val r = spark.sql("SELECT top_k(v, 1) FROM topk_int GROUP BY g")
      .as[Seq[Double]].head()
    assert(r == Seq(9.0))
    val e = intercept[Exception] {
      spark.sql("SELECT top_k(v, v) FROM topk_int GROUP BY g").collect()
    }
    assert(e.getMessage.contains("literal"))
  }

  test("partial aggregation: plan reduces before the exchange") {
    val p = Tables.orders(spark, "/root/testdata/sf0.001")
      .groupBy("o_orderpriority")
      .agg(topK(col("o_totalprice").cast("double"), 3))
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate partial + final around one exchange
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("NaN cannot poison the heap: total order, NaN ranks largest (the boxed-queue contract)") {
    // primitive < comparisons would strand a NaN at the heap root and
    // reject every later value; Double.compare keeps the PriorityQueue
    // semantics (NaN largest)
    val rows = Seq(Double.NaN, 5.0, 10.0, 1.0, 7.0).map(v => ("g", v))
      .toDF("g", "v")
    val out = rows.groupBy("g").agg(topK(col("v"), 2).as("tk"))
      .select(explode(col("tk")).as("v")).as[Double].collect()
    assert(out.length === 2)
    assert(out(0).isNaN, s"NaN must rank largest, got ${out.toSeq}")
    assert(out(1) === 10.0, s"10.0 must survive the NaN, got ${out.toSeq}")
  }
}
