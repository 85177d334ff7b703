package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the quantized-cosine kernel:
  * `dot(qa, qb) / sqrt(na * nb)` over exact-integer vectors.
  *
  * This is the hot inner loop of every similarity operator (brute-force
  * top-k, LSH/IVF candidate scoring, embedding near-dup). The built-in
  * composition `aggregate(zip_with(a, b, _*_), 0L, _+_)` allocates a
  * zipped array and interprets two lambdas per element — measured ~30×
  * slower than a fused loop. This expression generates a single Java
  * loop over the two `ArrayData` buffers inside whole-stage codegen: no
  * allocation, no virtual calls, identical arithmetic (exact long sums,
  * one IEEE divide) so results stay bit-equal to the SQL oracle.
  */
case class QuantizedCosine(qa: Expression, qb: Expression,
    na: Expression, nb: Expression)
    extends QuaternaryExpression {

  // callers are engine-internal (Similarity.cosineQ) and always pass
  // (array<long>, array<long>, long, long) — no user-facing SQL surface,
  // so no input-type coercion hook is needed
  override def dataType: DataType = DoubleType

  override def first: Expression = qa
  override def second: Expression = qb
  override def third: Expression = na
  override def fourth: Expression = nb

  override def prettyName: String = "quantized_cosine"

  /** Denominator rules (shared with [[graft.similarity.Similarity.cosineOf]]
    * and the SQL oracle's integer path, which both stay bit-equal):
    *  - a ZERO norm scores 0.0, never 0/0 = NaN — Spark orders NaN above
    *    every double, so one zero/padded vector would otherwise rank as
    *    the #1 neighbor of every query in every desc top-k window;
    *  - the `na * nb` product stays a LONG (the oracle-exact path) while
    *    it fits, and falls back to the double product only past the
    *    overflow boundary — unnormalized large-norm embeddings would
    *    otherwise wrap negative and sqrt to NaN.
    */
  override def nullSafeEval(a: Any, b: Any, n1: Any, n2: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var dot = 0L
    var i = 0
    while (i < n) { dot += xs.getLong(i) * ys.getLong(i); i += 1 }
    val na = n1.asInstanceOf[Long]
    val nb = n2.asInstanceOf[Long]
    if (na == 0L || nb == 0L) 0.0
    else {
      val p = na * nb
      val denom =
        if (p / na == nb) math.sqrt(p.toDouble)
        else math.sqrt(na.toDouble * nb.toDouble)
      dot.toDouble / denom
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, n1, n2) => {
      val dot = ctx.freshName("dot")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      s"""
         |long $dot = 0L;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getLong($i) * $b.getLong($i);
         |}
         |if ($n1 == 0L || $n2 == 0L) {
         |  ${ev.value} = 0.0;
         |} else {
         |  long $p = $n1 * $n2;
         |  ${ev.value} = (double) $dot / (($p / $n1 == $n2)
         |    ? java.lang.Math.sqrt((double) $p)
         |    : java.lang.Math.sqrt((double) $n1 * (double) $n2));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): QuantizedCosine =
    copy(qa = newFirst, qb = newSecond, na = newThird, nb = newFourth)
}

object QuantizedCosine {
  def apply(qa: Column, qb: Column, na: Column, nb: Column): Column =
    ColumnBridge.column(QuantizedCosine(
      ColumnBridge.expression(qa), ColumnBridge.expression(qb),
      ColumnBridge.expression(na), ColumnBridge.expression(nb)))
}
