package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Fused PQ kernels ([[graft.similarity.Similarity]] PQ block): the
  * HOF composition (`transform`→`aggregate`→`aggregate`) interprets
  * ~M·K·sub lambda calls per row — measured ~100× slower than these
  * single Java loops over the `ArrayData` buffer. Arithmetic is
  * identical (the static tables below are the same integer formulas,
  * evaluated once at class load), so results stay bit-equal to the SQL
  * oracle.
  */
object PqKernel {
  val M = 8
  val K = 16
  val Sub = 8

  /** Derived integer codebook cent(m)(k)(j) — same formula as the
    * oracle: (((m·131 + k·31 + j·17 + 7) mod 97) − 48) · 62.
    */
  val cent: Array[Array[Array[Long]]] = Array.tabulate(M, K, Sub) {
    (m, k, j) => (((m * 131 + k * 31 + j * 17 + 7) % 97) - 48) * 62L
  }

  /** Derived probe component q(i) = (((i·37 + 11) mod 89) − 44) · 68. */
  val probe: Array[Long] = Array.tabulate(M * Sub) {
    i => (((i * 37 + 11) % 89) - 44) * 68L
  }

  /** ADC lookup table: lut(m)(k) = ||probe_m − cent(m,k)||² — the PQ
    * trick that makes scoring O(M) per vector.
    */
  val lut: Array[Array[Long]] = Array.tabulate(M, K) { (m, k) =>
    var s = 0L
    var j = 0
    while (j < Sub) {
      val d = probe(m * Sub + j) - cent(m)(k)(j); s += d * d; j += 1
    }
    s
  }

  /** Encode one quantized vector: per-subspace argmin centroid (ties →
    * smaller k). Short/malformed vectors treat missing dims as 0 rather
    * than throwing — one bad row can't kill a corpus scan. Called from
    * generated code.
    */
  def encode(q: ArrayData): ArrayData = {
    val n = q.numElements()
    val codes = new Array[Int](M)
    var m = 0
    while (m < M) {
      var bestD = Long.MaxValue
      var bestK = -1
      var k = 0
      while (k < K) {
        var d = 0L
        var j = 0
        while (j < Sub) {
          val i = m * Sub + j
          val x = if (i < n) q.getLong(i) else 0L
          val diff = x - cent(m)(k)(j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; bestK = k }
        k += 1
      }
      codes(m) = bestK
      m += 1
    }
    new GenericArrayData(codes)
  }

  /** ADC distance of the derived probe to an encoded vector. */
  def adc(codes: ArrayData): Long = {
    var s = 0L
    var m = 0
    while (m < M) { s += lut(m)(codes.getInt(m)); m += 1 }
    s
  }

  /** ADC distance of an ARBITRARY quantized vector (e.g. an IVF query
    * residual) to an encoded vector: sum over subspaces of
    * ||v_m − cent(m, code_m)||². Missing dims read as 0.
    */
  def adcVec(codes: ArrayData, v: ArrayData): Long = {
    val n = v.numElements()
    var s = 0L
    var m = 0
    while (m < M) {
      val c = cent(m)(codes.getInt(m))
      var j = 0
      while (j < Sub) {
        val i = m * Sub + j
        val x = if (i < n) v.getLong(i) else 0L
        val d = x - c(j)
        s += d * d
        j += 1
      }
      m += 1
    }
    s
  }
}

/** array<long> quantized vector → array<int> PQ codes. */
case class PqEncode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any =
    PqKernel.encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PqKernel.encode($c)")

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  def apply(c: Column): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(c)))
}

/** array<int> PQ codes → exact-integer ADC distance to the derived probe. */
case class PqAdc(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "pq_adc"

  override def nullSafeEval(input: Any): Any =
    PqKernel.adc(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PqKernel.adc($c)")

  override protected def withNewChildInternal(newChild: Expression): PqAdc =
    copy(child = newChild)
}

object PqAdc {
  def apply(c: Column): Column =
    ColumnBridge.column(PqAdc(ColumnBridge.expression(c)))
}

/** (array<int> codes, array<long> vector) → exact-integer ADC distance. */
case class PqAdcVec(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "pq_adc_vec"

  override def nullSafeEval(a: Any, b: Any): Any =
    PqKernel.adcVec(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.PqKernel.adcVec($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcVec =
    copy(left = newLeft, right = newRight)
}

object PqAdcVec {
  def apply(codes: Column, v: Column): Column =
    ColumnBridge.column(PqAdcVec(
      ColumnBridge.expression(codes), ColumnBridge.expression(v)))
}
