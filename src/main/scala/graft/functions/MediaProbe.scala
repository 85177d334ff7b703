package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL media-container header probe — no codecs, pure byte parsing, so
  * unlike the decode stubs in [[graft.multimodal.Multimodal]] this is
  * production output, not plumbing fake data (and carries no stub gate).
  *
  * Parses, from a `binary` payload column:
  *  - PNG   (IHDR chunk)            → width, height
  *  - JPEG  (SOF0–SOF15 marker scan over entropy-free segments)
  *                                  → width, height
  *  - GIF   (logical screen)        → width, height
  *  - BMP   (BITMAPINFOHEADER)      → width, height
  *  - WAV   (RIFF `fmt ` chunk scan)→ sample_rate, channels
  *  - MP3   (first frame header, after an ID3v2 skip)
  *                                  → sample_rate, channels
  *  - MP4   (`ftyp` box)            → detected only
  * Anything else (or a truncated/corrupt header) degrades to format
  * "bin" with null fields — never an exception, so one bad blob can't
  * kill a 100 TB scan.
  *
  * Runs inside whole-stage codegen as a static call on the raw byte
  * array (no row copy, no UDF serialization); cost is O(header bytes)
  * per row regardless of payload size.
  */
case class MediaProbe(child: Expression) extends UnaryExpression {

  override def dataType: DataType = MediaProbe.schema

  override def prettyName: String = "media_probe"

  override def nullSafeEval(input: Any): Any =
    MediaProbe.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MediaProbe.parse($c)")

  override protected def withNewChildInternal(newChild: Expression): MediaProbe =
    copy(child = newChild)
}

object MediaProbe {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true)))

  private def row(fmt: String, w: Any = null, h: Any = null,
      sr: Any = null, ch: Any = null): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), w, h, sr, ch))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def u16be(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def u16le(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def u32be(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def u32le(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def ascii(b: Array[Byte], i: Int, s: String): Boolean =
    i + s.length <= b.length && s.indices.forall(k => u8(b, i + k) == s.charAt(k))

  /** Total parse: a struct for every input, "bin"/nulls when nothing
    * matches. Java-callable from generated code.
    */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 4) return row("bin")
    // PNG: 8-byte signature, IHDR payload at fixed offset 16
    if (u8(b, 0) == 0x89 && ascii(b, 1, "PNG") && u8(b, 4) == 0x0d &&
        u8(b, 5) == 0x0a && u8(b, 6) == 0x1a && u8(b, 7) == 0x0a) {
      if (b.length >= 24 && ascii(b, 12, "IHDR")) {
        val w = u32be(b, 16); val h = u32be(b, 20)
        if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
          return row("png", w.toInt, h.toInt)
      }
      return row("png")
    }
    if (u8(b, 0) == 0xff && u8(b, 1) == 0xd8) return parseJpeg(b)
    if (ascii(b, 0, "GIF8")) {
      if (b.length >= 10) return row("gif", u16le(b, 6), u16le(b, 8))
      return row("gif")
    }
    if (ascii(b, 0, "BM")) {
      if (b.length >= 26 && u32le(b, 14) >= 40) {
        val w = u32le(b, 18).toInt; val h = u32le(b, 22).toInt
        if (w > 0 && h != 0) return row("bmp", w, math.abs(h))
      }
      return row("bmp")
    }
    if (ascii(b, 0, "RIFF") && ascii(b, 8, "WAVE")) return parseWav(b)
    if (ascii(b, 0, "ID3") ||
        (u8(b, 0) == 0xff && (u8(b, 1) & 0xe0) == 0xe0)) return parseMp3(b)
    if (b.length >= 12 && ascii(b, 4, "ftyp")) return row("mp4")
    row("bin")
  }

  /** Marker scan: segments before the scan data all carry a 2-byte
    * big-endian length, so the walk is O(#segments); dimensions live in
    * any SOF marker (C0–CF minus C4/C8/CC).
    */
  private def parseJpeg(b: Array[Byte]): InternalRow = {
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return row("jpeg")
      while (i < b.length && u8(b, i) == 0xff) i += 1 // fill bytes
      if (i >= b.length) return row("jpeg")
      val marker = u8(b, i); i += 1
      if (marker == 0xd9 || marker == 0xda) return row("jpeg") // EOI / SOS
      if ((marker >= 0xd0 && marker <= 0xd8) || marker == 0x01) {
        // standalone markers: no length field
      } else {
        if (i + 1 >= b.length) return row("jpeg")
        val len = u16be(b, i)
        if (len < 2) return row("jpeg")
        val sof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (sof) {
          if (i + 6 < b.length) {
            val h = u16be(b, i + 3); val w = u16be(b, i + 5)
            if (w > 0 && h > 0) return row("jpeg", w, h)
          }
          return row("jpeg")
        }
        i += len
      }
    }
    row("jpeg")
  }

  /** RIFF chunk walk to `fmt ` (not a fixed offset — real files carry
    * LIST/JUNK chunks first).
    */
  private def parseWav(b: Array[Byte]): InternalRow = {
    var i = 12
    while (i + 8 <= b.length) {
      val size = u32le(b, i + 4)
      if (ascii(b, i, "fmt ") && size >= 16 && i + 8 + 16 <= b.length) {
        val ch = u16le(b, i + 10)
        val sr = u32le(b, i + 12)
        if (ch > 0 && sr > 0 && sr <= Int.MaxValue)
          return row("wav", null, null, sr.toInt, ch)
        return row("wav")
      }
      if (size > Int.MaxValue - 9 - i) return row("wav")
      i += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    row("wav")
  }

  private val Mp3Rates: Array[Array[Int]] = Array(
    Array(11025, 12000, 8000),  // MPEG2.5
    Array(0, 0, 0),             // reserved
    Array(22050, 24000, 16000), // MPEG2
    Array(44100, 48000, 32000)) // MPEG1

  /** ID3v2 skip (syncsafe size), then the first frame sync's version /
    * sample-rate-index / channel-mode bits.
    */
  private def parseMp3(b: Array[Byte]): InternalRow = {
    var i = 0
    if (ascii(b, 0, "ID3")) {
      if (b.length < 10) return row("mp3")
      val size = ((u8(b, 6) & 0x7f) << 21) | ((u8(b, 7) & 0x7f) << 14) |
        ((u8(b, 8) & 0x7f) << 7) | (u8(b, 9) & 0x7f)
      i = 10 + size
    }
    if (i + 3 >= b.length || u8(b, i) != 0xff || (u8(b, i + 1) & 0xe0) != 0xe0)
      return row("mp3")
    val version = (u8(b, i + 1) >> 3) & 0x3
    val rateIdx = (u8(b, i + 2) >> 2) & 0x3
    if (version == 1 || rateIdx == 3) return row("mp3")
    val sr = Mp3Rates(version)(rateIdx)
    val ch = if (((u8(b, i + 3) >> 6) & 0x3) == 3) 1 else 2
    row("mp3", null, null, sr, ch)
  }

  def apply(c: Column): Column =
    ColumnBridge.column(MediaProbe(ColumnBridge.expression(c)))
}
