package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of two pre-scaled non-negative longs:
  * bit i of each input lands at output bits 2i / 2i+1, so sorting by
  * the code clusters rows that are close in BOTH dimensions — the
  * space-filling-curve layout under multi-column data clustering
  * (Delta OPTIMIZE ZORDER BY, Iceberg sort orders). Inputs must be
  * scaled to [[ZOrderLong.Bits]]-bit range by the caller (values are
  * masked, not validated). Codegen'd scalar — no UDF, no boxing.
  */
case class ZOrderLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "z_order"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderLong.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ZOrderLong.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderLong =
    copy(left = newLeft, right = newRight)
}

object ZOrderLong {

  /** Bits kept per dimension (2×31 = 62 output bits, sign-safe). */
  val Bits = 31

  /** Classic bit-twiddling spread: x's low 31 bits to even positions. */
  def spread(x: Long): Long = {
    var v = x & 0x7fffffffL
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      ZOrderLong(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
