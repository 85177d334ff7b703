package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Fused bloom membership test: all k universal-hash probes of a 32-bit
  * token hash against a driver-built bitmask (`long[]`, 8 KB at
  * m=65536), in ONE codegen'd call. The composed column form pays two
  * boxed `element_at` array-literal lookups per probe (≈0.15 s per probe
  * per 600k rows measured); this expression indexes a primitive `long[]`
  * reference object — a few ns per row, keeping the screen effectively
  * free inside the probe scan's WholeStageCodegen span.
  *
  * Arithmetic is EXACTLY [[graft.sketch.Sketches]]' g_j family
  * (g_j(h) = ((a_j·h + b_j) mod P) mod m, P = 4294967311): the SQL
  * oracles replay it verbatim, and `SketchSpec` pins this expression
  * against the join-form probe bit-for-bit.
  */
case class BloomMaskHit(child: Expression, mask: Array[Long],
    a: Array[Long], b: Array[Long], m: Long) extends UnaryExpression {

  require(a.length == b.length && mask.length * 64L == m,
    s"bloom family shape: |a|=${a.length} |b|=${b.length} |mask|=${mask.length} m=$m")

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_mask_hit"

  override def nullSafeEval(input: Any): Any =
    BloomMaskHit.hit(input.asInstanceOf[Long], mask, a, b, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val maskRef = ctx.addReferenceObj("bloomMask", mask, "long[]")
    val aRef = ctx.addReferenceObj("bloomA", a, "long[]")
    val bRef = ctx.addReferenceObj("bloomB", b, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BloomMaskHit.hit($c, $maskRef, $aRef, $bRef, ${m}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMaskHit =
    copy(child = newChild)
}

object BloomMaskHit {

  /** Prime > 2^32 — same modulus as the Sketches hash family. */
  private val P = 4294967311L

  /** True iff every g_j(h) bit is set in the mask. h ∈ [0, 2^32), so
    * a_j·h + b_j stays positive and below 2^63 for the fixed families —
    * plain `%` is already the nonnegative pmod.
    */
  def hit(h: Long, mask: Array[Long], a: Array[Long], b: Array[Long],
      m: Long): Boolean = {
    var j = 0
    while (j < a.length) {
      val p = ((a(j) * h + b(j)) % P) % m
      if (((mask((p >>> 6).toInt) >>> (p & 63)) & 1L) == 0L) return false
      j += 1
    }
    true
  }

  def apply(c: Column, mask: Array[Long], a: Seq[Long], b: Seq[Long],
      m: Long): Column =
    ColumnBridge.column(
      BloomMaskHit(ColumnBridge.expression(c), mask, a.toArray, b.toArray, m))
}
