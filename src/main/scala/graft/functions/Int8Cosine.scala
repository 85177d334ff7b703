package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** [[QuantizedCosine]]'s int8 sibling: `dot(qa, qb) / sqrt(na * nb)` over
  * scalar-quantized (SQ8) vectors stored as `array<tinyint>`.
  *
  * Cosine is scale-invariant, so per-vector max-abs int8 codes score
  * directly — no dequantization, and the per-vector scale never appears
  * in the formula. The memory story is the point: an SQ8 code is 1 byte
  * per dimension vs 8 for the exact-integer path — an 8× smaller
  * broadcast / shuffle / cache footprint for the ANN candidate tables,
  * which at 10B × 1k-dim vectors is the difference between an in-memory
  * and a spilled scoring join. Same fused-loop codegen as
  * [[QuantizedCosine]]; all sums are exact in long (|dot| ≤ 127²·dims),
  * one IEEE divide, so results stay bit-equal to the SQL oracle.
  */
case class Int8Cosine(qa: Expression, qb: Expression,
    na: Expression, nb: Expression)
    extends QuaternaryExpression {

  // callers are engine-internal (Similarity.cosine8) and always pass
  // (array<byte>, array<byte>, long, long) — no user-facing SQL surface,
  // so no input-type coercion hook is needed
  override def dataType: DataType = DoubleType

  override def first: Expression = qa
  override def second: Expression = qb
  override def third: Expression = na
  override def fourth: Expression = nb

  override def prettyName: String = "int8_cosine"

  /** A ZERO norm (all-zero codes — the documented zero-vector case)
    * scores 0.0, never 0/0 = NaN, which would rank above every real
    * neighbor in desc top-k windows. Overflow is unreachable here:
    * int8 norms are ≤ 127²·dim, so `na * nb` fits a long at any
    * realistic dimensionality.
    */
  override def nullSafeEval(a: Any, b: Any, n1: Any, n2: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var dot = 0L
    var i = 0
    while (i < n) { dot += xs.getByte(i).toLong * ys.getByte(i).toLong; i += 1 }
    val na = n1.asInstanceOf[Long]
    val nb = n2.asInstanceOf[Long]
    if (na == 0L || nb == 0L) 0.0
    else dot.toDouble / math.sqrt((na * nb).toDouble)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, n1, n2) => {
      val dot = ctx.freshName("dot")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |long $dot = 0L;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (long) $a.getByte($i) * (long) $b.getByte($i);
         |}
         |${ev.value} = ($n1 == 0L || $n2 == 0L) ? 0.0
         |  : (double) $dot / java.lang.Math.sqrt((double) ($n1 * $n2));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Int8Cosine =
    copy(qa = newFirst, qb = newSecond, na = newThird, nb = newFourth)
}

object Int8Cosine {
  def apply(qa: Column, qb: Column, na: Column, nb: Column): Column =
    ColumnBridge.column(Int8Cosine(
      ColumnBridge.expression(qa), ColumnBridge.expression(qb),
      ColumnBridge.expression(na), ColumnBridge.expression(nb)))
}
