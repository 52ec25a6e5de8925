package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Lifecycle discipline for settled (checkpointed/persisted) frames
  * (optimization guide §5: "unpersist when done"; round-16 verdict item 4).
  *
  * Every settled frame in this engine is QUERY-SCOPED: [[graft.Setup]]
  * memoizes only directory paths, so no RDD block created while one declared
  * query runs is ever read by a later query. The ContextCleaner does reclaim
  * them — but only after a GC notices the frames are unreachable, which in a
  * long suite leaves each query taxed by its predecessors' dead blocks (the
  * round-16 suite-tail slowdown: per-query plans fine in isolation, suite
  * total ×0.86).
  *
  * Two tools:
  *  - [[unpersistSettled]] — drop ONE settled frame's blocks the moment its
  *    last consumer inside an operator is done (iterative loops: round N's
  *    labels are dead as soon as round N+1 settles).
  *  - [[sweep]] — harness hygiene between queries: unpersist every block the
  *    finished query left behind. Safe precisely because of the
  *    query-scoped invariant above; called by Bench/BenchProf/Verify only,
  *    never from inside an operator.
  */
object Settle {

  // Unpersisting a locally-checkpointed RDD is DELIBERATE here (the frame is
  // dead by the caller's contract) — drop the per-RDD "lineage has been
  // truncated" warning to ERROR once so a 384-query suite log stays readable.
  try org.apache.logging.log4j.core.config.Configurator.setLevel(
    "org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)
  catch { case _: Throwable => () }

  /** Every settled RDD a frame's plan reads (a loop variable is often a
    * projection/filter OVER the round's checkpoint, not the checkpoint
    * itself). Callers must only hand in frames whose WHOLE plan is dead.
    */
  def rddsOf(df: DataFrame): Seq[RDD[_]] =
    df.queryExecution.analyzed.collect { case l: LogicalRDD => l.rdd }

  /** Non-blocking unpersist of a dead settled frame's blocks. No-op (never
    * an error) when `df` holds no settled frame — callers can hand it
    * whatever their loop variable currently holds.
    */
  def unpersistSettled(df: DataFrame): Unit =
    rddsOf(df).foreach { r => try r.unpersist(false) catch { case _: Throwable => () } }

  /** Drop EVERY persisted RDD (cache and checkpoint blocks alike) plus
    * catalog-cached plans. Harness-only: correct between queries because no
    * frame outlives its query; inside a query it would destroy settled
    * frames mid-plan.
    */
  def sweep(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach { r =>
      try r.unpersist(false) catch { case _: Throwable => () }
    }
  }
}
