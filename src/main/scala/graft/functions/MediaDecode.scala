package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** REAL decode for the uncompressed media containers — PCM WAV samples
  * and 24-bit BMP pixels are plain byte layouts, so unlike the
  * compressed codecs (which stay stubbed and gated in
  * [[graft.multimodal.Multimodal]] because no codec libraries exist in
  * this environment), these decoders produce production numbers from
  * production bytes. Together with [[MediaProbe]] this makes the
  * multimodal story: header probe (all formats) → REAL decode
  * (uncompressed formats) → gated stub (compressed codecs only).
  *
  * Both run inside whole-stage codegen as a static call over the raw
  * byte array; a truncated/foreign payload returns null, never throws —
  * one bad blob can't kill a 100 TB scan. Cost is O(payload bytes).
  */
case class WavPcmStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = MediaDecode.wavSchema
  override def prettyName: String = "wav_pcm_stats"
  override def nullSafeEval(input: Any): Any =
    MediaDecode.wavStats(input.asInstanceOf[Array[Byte]])
  // not defineCodeGen: the decoder returns null for foreign payloads, so
  // the generated code must propagate that into the expression's isNull
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MediaDecode.wavStats($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  override def nullable: Boolean = true
  override protected def withNewChildInternal(newChild: Expression): WavPcmStats =
    copy(child = newChild)
}

case class BmpPixelStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = MediaDecode.bmpSchema
  override def prettyName: String = "bmp_pixel_stats"
  override def nullSafeEval(input: Any): Any =
    MediaDecode.bmpStats(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MediaDecode.bmpStats($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  override def nullable: Boolean = true
  override protected def withNewChildInternal(newChild: Expression): BmpPixelStats =
    copy(child = newChild)
}

object WavPcmStats {
  def apply(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      WavPcmStats(org.apache.spark.sql.graft.ColumnBridge.expression(c)))
}

object BmpPixelStats {
  def apply(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      BmpPixelStats(org.apache.spark.sql.graft.ColumnBridge.expression(c)))
}

object MediaDecode {

  val wavSchema: StructType = StructType(Seq(
    StructField("n_samples", IntegerType, nullable = false),
    StructField("peak", IntegerType, nullable = false),
    StructField("sum_abs", LongType, nullable = false)))

  val bmpSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  /** Decode 16-bit PCM samples from a RIFF/WAVE payload: chunk-walk to
    * `fmt ` (require PCM format 1, 16 bits) and `data`, then fold the
    * little-endian signed samples into (count, peak |amplitude|,
    * Σ|amplitude|) — the loudness/clipping screen an audio-curation
    * pipeline runs per clip. Null for non-WAV / compressed / truncated
    * payloads.
    */
  def wavStats(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 44) return null
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return null
    // chunk walk runs in Long: a payload-declared size near 2^31 must not
    // wrap `pos` negative past the bounds guard (one corrupt blob would
    // otherwise throw and kill the scan, breaking the null contract)
    var pos = 12L
    var fmtOk = false
    var dataAt = -1
    var dataLen = 0
    while (pos + 8 <= b.length && (dataAt < 0 || !fmtOk)) {
      val p = pos.toInt
      val id = new String(b, p, 4, "US-ASCII")
      val size = le32(b, p + 4)
      if (size < 0) return null
      if (id == "fmt " && pos + 8 + 16 <= b.length) {
        val audioFormat = le16(b, p + 8)
        val bits = le16(b, p + 8 + 14)
        if (audioFormat != 1 || bits != 16) return null // not uncompressed PCM16
        fmtOk = true
      } else if (id == "data") {
        dataAt = p + 8
        dataLen = math.min(size, b.length - dataAt)
      }
      // chunks are word-aligned: odd sizes carry a pad byte
      pos += 8L + size + (size & 1)
    }
    if (!fmtOk || dataAt < 0) return null
    val n = dataLen / 2
    var i = 0
    var peak = 0
    var sumAbs = 0L
    while (i < n) {
      val s = le16(b, dataAt + 2 * i).toShort.toInt
      val a = math.abs(s)
      if (a > peak) peak = a
      sumAbs += a
      i += 1
    }
    new GenericInternalRow(Array[Any](n, peak, sumAbs))
  }

  /** Decode a 24-bit uncompressed BMP's pixel array: header-validated
    * (BM magic, BITMAPINFOHEADER, biCompression 0, 24 bpp), rows padded
    * to 4 bytes, bottom-up or top-down (orientation doesn't change the
    * channel sums). Returns per-channel pixel sums — the
    * brightness/color-cast screen of an image-curation pipeline. Null
    * for anything that isn't a plain 24-bit BMP.
    */
  def bmpStats(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 54) return null
    if (!(b(0) == 'B' && b(1) == 'M')) return null
    val pixelAt = le32(b, 10)
    val hdrSize = le32(b, 14)
    if (hdrSize < 40) return null
    val w = le32(b, 18)
    val hRaw = le32(b, 22)
    val h = math.abs(hRaw)
    val planes = le16(b, 26)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (w <= 0 || h == 0 || planes != 1 || bpp != 24 || compression != 0) return null
    // row arithmetic in Long: a header width near 2^31 overflows 3*w+3 to
    // a negative Int rowSize that would slip past the bounds check and
    // throw in the pixel loop; rowSize ≤ payload also bounds rowSize*h
    // (each ≤ 2^31) so the Long product below cannot itself overflow
    val rowSizeL = ((3L * w + 3) / 4) * 4
    if (rowSizeL <= 0 || rowSizeL > b.length) return null
    val rowSize = rowSizeL.toInt
    if (pixelAt < 54 || pixelAt.toLong + rowSizeL * h > b.length) return null
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      val base = pixelAt + y * rowSize
      var x = 0
      while (x < w) {
        val o = base + 3 * x
        sb += u8(b, o); sg += u8(b, o + 1); sr += u8(b, o + 2)
        x += 1
      }
      y += 1
    }
    new GenericInternalRow(Array[Any](w, h, sr, sg, sb))
  }
}
