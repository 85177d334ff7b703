package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `size(split(text, ' '))` without the array: the split-on-space token
  * count is exactly (number of 0x20 bytes) + 1 — Spark's `split` keeps
  * empty tokens, so every space is a boundary, and a 0x20 byte never
  * occurs inside a UTF-8 multi-byte sequence. One branch-light pass
  * over the bytes, no per-row `UTF8String[]` allocation; on the ×100
  * corpus `size(split(...))` costs ~0.7 s of pure allocation that this
  * deletes from every token-count gate (cur6's Gopher bounds, t8).
  */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "token_count"

  override def nullSafeEval(input: Any): Any =
    TokenCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenCount.count($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}

object TokenCount {

  def count(s: UTF8String): Long = {
    val bytes = s.getBytes
    var n = 1L
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' '.toByte) n += 1L
      i += 1
    }
    n
  }

  def apply(c: Column): Column =
    ColumnBridge.column(TokenCount(ColumnBridge.expression(c)))
}
