package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The decompression-bomb guard on [[Multimodal.decodeImage]]: header
  * dimensions are checked BEFORE any pixel decode, so a hostile payload
  * (a few-KB PNG declaring a multi-GB bitmap) is refused without
  * allocating anything — the OutOfMemoryError it used to trigger is an
  * executor-killing Error no catch clause covers.
  */
class DecodeGuardSpec extends AnyFunSuite {

  private def smallPng(): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out))
    out.toByteArray
  }

  /** A syntactically valid PNG prefix whose IHDR declares w×h — the exact
    * shape of a bomb payload's header (dimension fields are trusted by
    * `ImageReader.getWidth/getHeight` without touching pixel data).
    */
  private def pngHeader(w: Int, h: Int): Array[Byte] = {
    def be(i: Int) = Array(
      ((i >> 24) & 0xff).toByte, ((i >> 16) & 0xff).toByte,
      ((i >> 8) & 0xff).toByte, (i & 0xff).toByte)
    val sig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt,
      0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val body = "IHDR".getBytes("US-ASCII") ++ be(w) ++ be(h) ++
      Array[Byte](8, 2, 0, 0, 0) // bit depth 8, truecolor, default methods
    val crc = new java.util.zip.CRC32(); crc.update(body)
    sig ++ be(13) ++ body ++ be(crc.getValue.toInt)
  }

  test("header-declared pixel count above the cap is refused before decode") {
    // the guard path itself, proven on a fully VALID image: an 8-pixel
    // PNG decodes under the default cap but is refused under a 4-pixel
    // cap — only the header check can produce that difference
    val png = smallPng()
    assert(Multimodal.decodeImage(png).isDefined)
    assert(Multimodal.decodeImage(png, maxPixels = 4L).isEmpty)
    // a bomb header (50000×50000 ⇒ ~2.5 GB ARGB) is refused outright
    assert(Multimodal.decodeImage(pngHeader(50000, 50000)).isEmpty)
    // same header at sane dimensions passes the guard and fails only in
    // the pixel decode (no IDAT) — still None, never a throw
    assert(Multimodal.decodeImage(pngHeader(4, 2)).isEmpty)
  }
}
