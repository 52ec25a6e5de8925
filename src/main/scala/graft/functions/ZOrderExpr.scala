package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{Bridge, LongBinaryInputs}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) key: interleaves the low `bits` bits of two longs —
  * bit i of `left` lands at output bit 2i, bit i of `right` at 2i+1. Sorting
  * or range-partitioning by this key clusters rows that are close in BOTH
  * dimensions into the same parquet files, so min/max footer stats prune
  * scans for predicates on either column — the standard multi-dimensional
  * layout trick for 100 TB tables queried along more than one axis.
  *
  * A native codegen'd expression (a tight shift loop) rather than a 2×bits
  * term builtin-expression tree: giant inlined expression trees cost seconds
  * of janino compilation regardless of data size.
  */
case class ZOrderExpr(left: Expression, right: Expression, bits: Int = 20)
    extends BinaryExpression with LongBinaryInputs {
  require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_key"

  def compute(x: Long, y: Long): Long = {
    val mask = (1L << bits) - 1
    val a = x & mask
    val b = y & mask
    var out = 0L
    var i = 0
    while (i < bits) {
      out |= ((a >>> i) & 1L) << (2 * i)
      out |= ((b >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    out
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("zorder", this, classOf[ZOrderExpr].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$self.compute($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrderFunctions {
  /** Column API: Morton key over the low `bits` bits of two integer columns. */
  def zorderKey(x: Column, y: Column, bits: Int = 20): Column =
    Bridge.column(ZOrderExpr(Bridge.expression(x), Bridge.expression(y), bits))
}
