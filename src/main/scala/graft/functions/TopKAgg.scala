package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{Bridge, DoubleUnaryInput}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Bounded top-k aggregate (`TypedImperativeAggregate`): keeps the k largest
  * double values per group in a size-k min-heap, merged map-side.
  *
  * Why not `row_number() OVER (...)  WHERE rn <= k`: the window form shuffles
  * EVERY row to its group's partition and sorts it, paying
  * O(|group| log |group|) per group. This aggregate reduces each map
  * partition to ≤k values before the exchange (partial aggregation), so the
  * shuffle carries O(partitions·k) — at 100 TB with k=3 that is the
  * difference between shuffling the table and shuffling kilobytes. The
  * output is the sorted top-k value array; pair it with `posexplode` for
  * ranked rows.
  *
  * Duplicate values count separately (a multiset top-k), matching the
  * window formulation's semantics for value-only output.
  */
case class TopKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[java.lang.Double]]
  with DoubleUnaryInput // implicit cast of int/decimal/float children
  with UnaryLike[Expression] {
  require(k > 0, "k must be positive")

  override def createAggregationBuffer(): java.util.PriorityQueue[java.lang.Double] =
    new java.util.PriorityQueue[java.lang.Double](k + 1)

  private def push(h: java.util.PriorityQueue[java.lang.Double], v: java.lang.Double): Unit = {
    // min-heap of capped size: admit only values beating the current floor
    if (h.size < k) h.add(v)
    else if (h.peek() < v) { h.poll(); h.add(v) }
  }

  override def update(
      h: java.util.PriorityQueue[java.lang.Double],
      input: InternalRow): java.util.PriorityQueue[java.lang.Double] = {
    val v = child.eval(input)
    if (v != null) push(h, v.asInstanceOf[Double])
    h
  }

  override def merge(
      h: java.util.PriorityQueue[java.lang.Double],
      other: java.util.PriorityQueue[java.lang.Double]): java.util.PriorityQueue[java.lang.Double] = {
    val it = other.iterator()
    while (it.hasNext) push(h, it.next())
    h
  }

  override def eval(h: java.util.PriorityQueue[java.lang.Double]): Any = {
    val arr = new Array[Double](h.size)
    var i = 0
    val it = h.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr)
    // descending: rank 1 = largest
    val out = new Array[Any](arr.length)
    i = 0
    while (i < arr.length) { out(i) = arr(arr.length - 1 - i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(h: java.util.PriorityQueue[java.lang.Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * h.size)
    bb.putInt(h.size)
    val it = h.iterator()
    while (it.hasNext) bb.putDouble(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[java.lang.Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = createAggregationBuffer()
    var i = 0
    while (i < n) { push(h, bb.getDouble); i += 1 }
    h
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "top_k"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKAgg =
    copy(child = newChild)
}

object TopKAgg {
  /** Column API: `topK($"price", 3)` → sorted-descending `array<double>`. */
  def topK(c: Column, k: Int): Column =
    Bridge.column(TopKAgg(Bridge.expression(c), k).toAggregateExpression())

  /** SQL builder: `top_k(col, k)` — k must be a literal. */
  def fromSql(exprs: Seq[Expression]): TopKAgg = {
    require(exprs.length == 2, "top_k(col, k) takes exactly two arguments")
    require(exprs(1).foldable, "top_k(col, k): k must be a literal")
    TopKAgg(exprs(0), exprs(1).eval().asInstanceOf[Number].intValue())
  }
}
