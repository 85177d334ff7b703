package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused 32-bit token hash: the first 4 md5 digest bytes as an unsigned
  * long — value-identical to `conv(substring(md5(s), 1, 8), 16, 10)`
  * (the first 8 hex chars ARE the first 4 digest bytes), which is the
  * recipe every dedupe/sketch oracle replays in SQL.
  *
  * The composed form materializes a 32-char hex string, substrings it,
  * and string-parses base-16 per token; this expression digests the
  * UTF-8 bytes and assembles the prefix with shifts — no intermediate
  * strings — inside whole-stage codegen. It is the per-token kernel
  * under MinHash/SimHash signatures, rolling-fingerprint sketches, hash
  * splits, and stratified sampling, where it runs once per (doc, token).
  */
case class TokenHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "token_hash"

  override def nullSafeEval(input: Any): Any =
    TokenHash.md5Prefix32(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenHash.md5Prefix32($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenHash =
    copy(child = newChild)
}

object TokenHash {

  // MessageDigest is stateful; one instance per task thread
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** First 4 md5 bytes of the UTF-8 encoding, big-endian unsigned. */
  def md5Prefix32(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  def apply(c: Column): Column =
    ColumnBridge.column(TokenHash(ColumnBridge.expression(c)))
}
