package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed exact statistics over integer-valued samples.
  *
  * Everything here follows the engine's determinism contract: counts and
  * cross-multiplied products stay integer (DECIMAL(38,0) where products can
  * outgrow longs), and any double appears only at the output boundary as a
  * division of exact integers — so results are partition/order/engine-exact.
  */
object Stats {

  /** Exact two-sample Kolmogorov–Smirnov distance between the `value`
    * distributions of the rows where `in1` / `in2` hold (value must be an
    * integral column — quantize first). Both ECDFs stay integer cumulative
    * counts via the distributed range-partitioned cumsum
    * ([[Ranking.withGlobalCumSum]] — no single-task global window), and the
    * max runs over |c1·n2 − c2·n1| in DECIMAL(38,0). Returns one row:
    * (n1, n2, d_num, d_stat).
    */
  def ksTest(df: DataFrame, value: Column, in1: Column, in2: Column): DataFrame = {
    val x = df.filter(in1 || in2)
      .select(value.as("v"),
        in1.cast("long").as("is1"), in2.cast("long").as("is2"))
    val g = x.groupBy("v").agg(sum("is1").as("n1"), sum("is2").as("n2"))
    val c2 = Ranking.withGlobalCumSum(
      Ranking.withGlobalCumSum(g, Seq(col("v")), col("n1"), "c1"),
      Seq(col("v")), col("n2"), "c2")
    val tot = x.agg(sum("is1").as("t1"), sum("is2").as("t2"))
    c2.crossJoin(broadcast(tot))
      .select(col("t1"), col("t2"),
        abs(col("c1").cast(DecimalType(38, 0)) * col("t2")
          - col("c2").cast(DecimalType(38, 0)) * col("t1")).as("dn"))
      .groupBy("t1", "t2").agg(max(col("dn")).as("dmax"))
      .select(col("t1").as("n1"), col("t2").as("n2"),
        col("dmax").cast("long").as("d_num"),
        // explicit zero-divisor guard: ANSI mode would otherwise throw on a
        // one-sided input; an empty comparison sample yields NULL, not a crash
        when(col("t1") * col("t2") === 0, lit(null).cast("double"))
          .otherwise(col("dmax").cast("double")
            / (col("t1") * col("t2")).cast("double"))
          .as("d_stat"))
      .orderBy("n1")
  }
}
