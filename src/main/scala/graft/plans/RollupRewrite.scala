package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Transparent materialized-view rewrite for `pipeline.Rollup` summaries.
  *
  * A rollup built by `Rollup.build(base, dims, measures, rollupPath)` is
  * registered against its base table path. Any later aggregate that
  *
  *   - scans the base path (through attribute-only Projects),
  *   - filters, if at all, on grain dims only,
  *   - groups by a subset of the grain dims, and
  *   - computes only count(*) / sum / avg / min / max over measures,
  *     without DISTINCT or FILTER clauses,
  *
  * is rewritten to merge the summary instead: count(*) ⇒ sum(_n),
  * sum(m) ⇒ sum(_sum_m), avg(m) ⇒ sum(_sum_m)/sum(_n), min(m) ⇒
  * min(_min_m), max(m) ⇒ max(_max_m) — the classic partial-aggregate
  * merge, now done at plan time. At 100 TB this turns a
  * fact-table scan into a read of a grain-sized summary; the user query does
  * not change.
  *
  * Numeric note: the summary keeps exact DECIMAL partials, so a rewritten
  * sum(double) is the EXACT sum cast back to double — at least as accurate
  * as the order-dependent double accumulation it replaces, but not always
  * bit-identical to it (spec pins exactness against the decimal ground
  * truth). Output attribute ids are preserved, so parent operators resolve
  * unchanged.
  *
  * The rule is a no-op while the registry is empty — zero overhead for
  * sessions that never register a rollup.
  */
object RollupRegistry {
  final case class Entry(rollupPlan: LogicalPlan, dims: Seq[String], measures: Seq[String])

  private val byBasePath = TrieMap.empty[String, Entry]

  /** Point queries against `basePath` at the summary under `rollupPath`
    * (built with the same dims/measures via Rollup.build/appendDelta).
    * Registration resolves the rollup's COMMITTED VERSION dir (round-12:
    * batch rollups live in VersionedDir layouts): the registered plan is
    * a snapshot; re-register after maintenance to serve the new version.
    */
  def register(spark: SparkSession, basePath: String, rollupPath: String,
      dims: Seq[String], measures: Seq[String]): Unit = {
    val cur = graft.store.VersionedDir.currentDir(rollupPath)
    val plan = spark.read.parquet(cur).queryExecution.analyzed
    byBasePath.put(norm(basePath), Entry(plan, dims, measures))
  }

  def unregister(basePath: String): Unit = byBasePath.remove(norm(basePath))
  def clear(): Unit = byBasePath.clear()
  def isEmpty: Boolean = byBasePath.isEmpty

  private[plans] def lookup(path: String): Option[Entry] = byBasePath.get(norm(path))

  /** file:/tmp/x/, /tmp/x, file:///tmp/x all name the same location. */
  private def norm(p: String): String =
    p.replaceFirst("^file:/{0,2}", "/").stripSuffix("/")
}

object RewriteAggregateToRollup extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (RollupRegistry.isEmpty) plan
    else plan.transform {
      case agg @ Aggregate(groupExprs, resultExprs, child, _) =>
        tryRewrite(groupExprs, resultExprs, child).getOrElse(agg)
    }

  /** Walk through attribute-only Projects and dim-only Filters down to a
    * registered base scan; collect the filter conditions for replay.
    */
  private def baseOf(p: LogicalPlan): Option[(RollupRegistry.Entry, Seq[Expression])] =
    p match {
      case Project(projList, c) if projList.forall(_.isInstanceOf[AttributeReference]) =>
        baseOf(c)
      case Filter(cond, c) =>
        baseOf(c).map { case (e, fs) => (e, cond +: fs) }
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: HadoopFsRelation =>
            fs.location.rootPaths.headOption
              .flatMap(rp => RollupRegistry.lookup(rp.toString))
              .map(e => (e, Nil))
          case _ => None
        }
      case _ => None
    }

  private def tryRewrite(
      groupExprs: Seq[Expression],
      resultExprs: Seq[NamedExpression],
      child: LogicalPlan): Option[LogicalPlan] = {
    baseOf(child).flatMap { case (entry, filters) =>
      val dims = entry.dims.toSet
      val groupOk = groupExprs.forall {
        case a: AttributeReference => dims.contains(a.name)
        case _ => false
      }
      val filterOk = filters.forall(_.references.forall(r => dims.contains(r.name)))
      if (!groupOk || !filterOk) None else {

      // Fresh attribute ids per rewrite site (two rewritten aggregates in
      // one plan must not share ids).
      val fresh = entry.rollupPlan.transformUp {
        case lr: LogicalRelation => lr.newInstance()
      }
      val attrByName = fresh.output.map(a => a.name -> a).toMap
      val nAttr = attrByName("_n")
      def sumOf(e: Expression): AggregateExpression =
        AggregateExpression(Sum(e), Complete, isDistinct = false)
      def measurePartial(e: Expression, prefix: String): Option[Attribute] = {
        val stripped = e match {
          case Cast(a: AttributeReference, _, _, _) => Some(a)
          case a: AttributeReference => Some(a)
          case _ => None
        }
        // .get-based lookup: a summary built before a partial existed
        // (e.g. pre-min/max artifacts) yields None → no rewrite, base scan
        stripped.filter(a => entry.measures.contains(a.name))
          .flatMap(a => attrByName.get(s"$prefix${a.name}"))
      }
      def measureSum(e: Expression): Option[Attribute] = measurePartial(e, "_sum_")

      val rewritten: Seq[Option[NamedExpression]] = resultExprs.map {
        case attr: AttributeReference if dims.contains(attr.name) =>
          Some(Alias(attrByName(attr.name), attr.name)(exprId = attr.exprId))
        case a @ Alias(attr: AttributeReference, name) if dims.contains(attr.name) =>
          Some(Alias(attrByName(attr.name), name)(exprId = a.exprId))
        case a @ Alias(ae: AggregateExpression, name)
            if !ae.isDistinct && ae.filter.isEmpty =>
          val merged: Option[Expression] = ae.aggregateFunction match {
            case Count(Seq(Literal(_, _))) | Count(Nil) =>
              Some(Cast(sumOf(nAttr), LongType))
            case s: Sum =>
              measureSum(s.child).map(p => Cast(sumOf(p), a.dataType))
            case av: Average =>
              measureSum(av.child).map { p =>
                Cast(Divide(Cast(sumOf(p), DoubleType), Cast(sumOf(nAttr), DoubleType)),
                  a.dataType)
              }
            // min/max merge by re-applying themselves over the stored
            // same-typed partials — selection aggregates, exact by nature
            case mn: Min =>
              measurePartial(mn.child, "_min_").map { p =>
                Cast(AggregateExpression(Min(p), Complete, isDistinct = false),
                  a.dataType)
              }
            case mx: Max =>
              measurePartial(mx.child, "_max_").map { p =>
                Cast(AggregateExpression(Max(p), Complete, isDistinct = false),
                  a.dataType)
              }
            case _ => None
          }
          merged.map(m => Alias(m, name)(exprId = a.exprId))
        case _ => None
      }
      if (rewritten.exists(_.isEmpty)) None else {
        val newGroup = groupExprs.map { case a: AttributeReference => attrByName(a.name) }
        val replayed = filters.map(_.transform {
          case ar: AttributeReference => attrByName(ar.name)
        })
        val source = replayed.reduceOption(And.apply).map(Filter(_, fresh)).getOrElse(fresh)
        Some(Aggregate(newGroup, rewritten.map(_.get), source))
      }
      }
    }
  }
}
