package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.{Bridge, DoubleUnaryInput}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** KLL quantile sketch aggregate (`TypedImperativeAggregate` over
  * Datasketches `KllDoublesSketch`): the mergeable-quantiles companion to
  * the persisted HLL distinct-count summary (Profile.hllSummary). Spark
  * ships `approx_percentile` whose sketch lives only inside one
  * aggregation and `hll_sketch_agg` for distinct counts, but no
  * PERSISTABLE quantile sketch — this fills that gap: per-grain sketches
  * survive as binary data, and merging them (across grain keys for a
  * coarser group-by, or across appended batches for incremental
  * maintenance) keeps KLL's normalized-rank-error guarantee (~1.65% at
  * k=200). Quantile estimates are approximate and merge-order-sensitive by
  * the algorithm's nature, so queries over them are rows-only at the
  * oracle gate (the q_hll_rollup contract) and the spec pins estimates to
  * exact percentiles within the published error band.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with DoubleUnaryInput // implicit cast of int/decimal/float children
  with UnaryLike[Expression] {
  require(k >= 8, "KLL k must be >= 8")

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(sk: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) sk.update(v.asInstanceOf[Double])
    sk
  }

  override def merge(sk: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    sk.merge(other)
    sk
  }

  override def eval(sk: KllDoublesSketch): Any = sk.toByteArray

  override def serialize(sk: KllDoublesSketch): Array[Byte] = sk.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** Union of persisted KLL sketches (binary column → binary): the rollup
  * reader's merge step, lossless for the error-bound guarantee.
  */
case class KllMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {
  require(k >= 8, "KLL k must be >= 8")

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(sk: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      sk.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    sk
  }

  override def merge(sk: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    sk.merge(other)
    sk
  }

  override def eval(sk: KllDoublesSketch): Any = sk.toByteArray
  override def serialize(sk: KllDoublesSketch): Array[Byte] = sk.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_merge"

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

/** Quantile estimate from a persisted KLL sketch (binary → double), rank
  * `q` ∈ [0, 1] with the library's INCLUSIVE search criterion. Evaluated
  * once per output group row — off the hot path, so CodegenFallback.
  */
case class KllQuantileExpr(child: Expression, q: Double)
    extends UnaryExpression with CodegenFallback {
  require(q >= 0.0 && q <= 1.0, s"quantile rank must be in [0,1], got $q")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "kll_quantile"

  override def nullSafeEval(input: Any): Any =
    KllDoublesSketch.heapify(Memory.wrap(input.asInstanceOf[Array[Byte]]))
      .getQuantile(q)

  override protected def withNewChildInternal(newChild: Expression): KllQuantileExpr =
    copy(child = newChild)
}

object KllFunctions {
  /** Column API: build a per-group KLL sketch of a double column. */
  def kllSketch(c: Column, k: Int = 200): Column =
    Bridge.column(KllSketchAgg(Bridge.expression(c), k).toAggregateExpression())

  /** Column API: union persisted sketches (binary column). */
  def kllMerge(c: Column, k: Int = 200): Column =
    Bridge.column(KllMergeAgg(Bridge.expression(c), k).toAggregateExpression())

  /** Column API: quantile estimate from a persisted sketch. */
  def kllQuantile(c: Column, q: Double): Column =
    Bridge.column(KllQuantileExpr(Bridge.expression(c), q))
}
