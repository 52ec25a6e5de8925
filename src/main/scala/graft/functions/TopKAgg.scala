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

/** Size-capped primitive min-heap over doubles — the aggregation buffer of
  * [[TopKAgg]]. A flat `Array[Double]` binary heap: the per-row hot path
  * (`push`) is branch + array ops on primitives, no `java.lang.Double`
  * boxing and no `PriorityQueue` node overhead (the boxed-queue buffer was
  * the round-10 bench's constant-overhead finding on `q_topk_agg`).
  *
  * Comparisons use `java.lang.Double.compare` — the TOTAL order the boxed
  * `PriorityQueue[java.lang.Double]` buffer had (NaN sorts largest, −0 <
  * +0). Primitive `<` would make every comparison against a NaN false:
  * once a NaN reached the root, no later value would ever be admitted —
  * silently wrong top-k on any NaN-bearing column.
  */
final class DoubleTopKHeap(val k: Int) {
  val arr = new Array[Double](k)
  var size = 0

  private def lt(a: Double, b: Double): Boolean =
    java.lang.Double.compare(a, b) < 0

  /** Admit `v` iff it beats the current floor (or the heap is unfilled). */
  def push(v: Double): Unit = {
    if (size < k) {
      // sift up from the new leaf
      var i = size
      arr(i) = v
      size += 1
      while (i > 0 && lt(arr(i), arr((i - 1) >> 1))) {
        val p = (i - 1) >> 1
        val t = arr(p); arr(p) = arr(i); arr(i) = t
        i = p
      }
    } else if (lt(arr(0), v)) {
      // replace the min, sift down from the root
      arr(0) = v
      var i = 0
      var continue = true
      while (continue) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < size && lt(arr(l), arr(m))) m = l
        if (r < size && lt(arr(r), arr(m))) m = r
        if (m == i) continue = false
        else {
          val t = arr(m); arr(m) = arr(i); arr(i) = t
          i = m
        }
      }
    }
  }
}

/** Bounded top-k aggregate (`TypedImperativeAggregate`): keeps the k largest
  * double values per group in a size-k primitive min-heap, merged map-side.
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
  extends TypedImperativeAggregate[DoubleTopKHeap]
  with DoubleUnaryInput // implicit cast of int/decimal/float children
  with UnaryLike[Expression] {
  require(k > 0, "k must be positive")

  override def createAggregationBuffer(): DoubleTopKHeap = new DoubleTopKHeap(k)

  override def update(h: DoubleTopKHeap, input: InternalRow): DoubleTopKHeap = {
    val v = child.eval(input)
    if (v != null) h.push(v.asInstanceOf[Double])
    h
  }

  override def merge(h: DoubleTopKHeap, other: DoubleTopKHeap): DoubleTopKHeap = {
    var i = 0
    while (i < other.size) { h.push(other.arr(i)); i += 1 }
    h
  }

  override def eval(h: DoubleTopKHeap): Any = {
    val arr = java.util.Arrays.copyOf(h.arr, h.size)
    java.util.Arrays.sort(arr)
    // descending: rank 1 = largest
    val out = new Array[Any](arr.length)
    var i = 0
    while (i < arr.length) { out(i) = arr(arr.length - 1 - i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(h: DoubleTopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * h.size)
    bb.putInt(h.size)
    var i = 0
    while (i < h.size) { bb.putDouble(h.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): DoubleTopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = createAggregationBuffer()
    var i = 0
    while (i < n) { h.push(bb.getDouble); i += 1 }
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
