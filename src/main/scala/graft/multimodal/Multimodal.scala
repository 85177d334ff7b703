package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-sized
  * batches on executors.
  *
  * The Spark-side machinery — schema, partitioning, batch shape, typed
  * mapPartitions pipeline — is real and tested. IMAGE decode is REAL:
  * jpeg/png/gif/bmp go through the JDK's own `javax.imageio` codecs
  * ([[imageStats]], [[imageFeature]]) — no external dependency, no gate.
  * Uncompressed audio/bitmap payloads decode for real in
  * [[graft.functions.MediaDecode]] (PCM WAV, 24-bit BMP). Only the
  * remaining compressed A/V codecs this container doesn't ship (mp3,
  * mp4 demux) are STUBBED: `decodeStub` derives a deterministic fake
  * vector, gated behind [[StubConfKey]]. Swapping in a real decoder
  * (JNI/ONNX/ffmpeg) changes only the function body marked below; every
  * scale property (no driver transfer, columnar in/out, per-partition
  * batching, skew-neutral hash distribution) is already in place.
  */
object Multimodal {

  /** Opt-in gate for the stubbed decode paths. The decode/demux/resize
    * bodies below return deterministic FAKE output (this build ships no
    * media codecs) — production must never mistake that for real
    * decoding, so every stub-backed operator throws at plan time unless
    * the session explicitly sets this conf to "true" (plumbing tests and
    * the oracle queries do; a real decoder swap deletes the gate with the
    * stub body).
    */
  val StubConfKey = "graft.multimodal.allowStubDecode"

  private def requireStubOptIn(spark: org.apache.spark.sql.SparkSession,
      what: String): Unit =
    if (!spark.conf.getOption(StubConfKey).contains("true"))
      throw new UnsupportedOperationException(
        s"$what uses a STUB decoder (no media codecs in this build): its " +
          s"output is deterministic fake data for pipeline plumbing only. " +
          s"Set $StubConfKey=true to acknowledge, or wire a real decoder.")

  case class MediaMeta(
      media_id: Long,
      byte_len: Long,
      sha: String,
      format: String)

  case class MediaFeatures(
      media_id: Long,
      byte_len: Long,
      format: String,
      feature: Seq[Float])

  /** Content metadata as pure column expressions: size, checksum, and a
    * magic-byte format sniff (cheap, codegen'd, pushdown-safe).
    */
  def withMetadata(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      length(col(binCol)).cast("long").as("byte_len"),
      sha2(col(binCol), 256).as("sha"),
      sniffFormat(col(binCol)).as("format"))

  /** Magic-byte sniff on the binary prefix (hex-encoded). */
  def sniffFormat(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val prefix = lower(hex(substring(bin, 1, 4)))
    when(prefix.startsWith("89504e47"), "png")
      .when(prefix.startsWith("ffd8"), "jpeg")
      .when(prefix.startsWith("494433"), "mp3")
      .when(prefix.startsWith("000000"), "mp4")
      .otherwise("bin")
  }

  /** REAL container-header probe ([[graft.functions.MediaProbe]]):
    * format plus width/height (png/jpeg/gif/bmp) or sample_rate/channels
    * (wav/mp3) parsed from the payload bytes inside whole-stage codegen.
    * Unlike the decode paths below this is NOT a stub and carries no
    * gate — header fields are production output with no codecs needed.
    */
  def probed(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      length(col(binCol)).cast("long").as("byte_len"),
      graft.functions.MediaProbe(col(binCol)).as("__p"))
      .select(col("media_id"), col("byte_len"),
        col("__p.format").as("format"),
        col("__p.width").as("width"), col("__p.height").as("height"),
        col("__p.sample_rate").as("sample_rate"),
        col("__p.channels").as("channels"))

  /** Deterministic fake "decode": 8 pseudo-features from byte statistics.
    * REAL DECODER GOES HERE — replace the body with e.g. an ONNX session
    * call per batch; the signature (bytes in, float vector out) and the
    * partition-level batching around it stay unchanged.
    */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val n = bytes.length
    if (n == 0) return Array.fill(8)(0f)
    val window = bytes.take(256)
    val sum = window.foldLeft(0L)((a, b) => a + (b & 0xff))
    Array.tabulate(8) { i =>
      val slice = window.drop(i * 32).take(32)
      val s = slice.foldLeft(0L)((a, b) => a + (b & 0xff))
      ((s % 997).toFloat / 997f) + (sum % 13) * 0f
    }
  }

  /** 8-dim feature vector from a REAL image decode: geometry + channel
    * statistics, each normalized to [0,1]-ish range. Deterministic given
    * the payload bytes (ImageIO decode is deterministic per JDK).
    */
  private[multimodal] def imageFeature(
      img: java.awt.image.BufferedImage): Array[Float] = {
    val (n, mr, mg, mb, ml) = pixelStats(img)
    val w = img.getWidth.toFloat; val h = img.getHeight.toFloat
    Array(w / 16384f, h / 16384f, math.min(1.0, n / 1e8).toFloat,
      (mr / 255.0).toFloat, (mg / 255.0).toFloat, (mb / 255.0).toFloat,
      (ml / 255.0).toFloat, w / (w + h))
  }

  /** Feature-extraction pipeline: binary column in, feature vector out.
    * Runs as a typed mapPartitions — one decoder instance per partition
    * (where a real decoder would amortize model load), rows streamed, no
    * collect, no driver round trip.
    *
    * Rows the JDK's own codecs decode (jpeg/png/gif/bmp) get a REAL
    * feature vector ([[imageFeature]]); only undecodable payloads (mp3,
    * mp4, opaque blobs) fall to the gated stub — which is why the
    * opt-in gate still applies to this entry point as a whole. Callers
    * with an all-image corpus should use [[imageStats]], which is fully
    * real and ungated.
    */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    requireStubOptIn(spark, "extractFeatures")
    import spark.implicits._
    val prepared = df.select(
      col(idCol).cast("long").as("media_id"),
      col(binCol).as("bytes"))
      .as[(Long, Array[Byte])]
    prepared.mapPartitions { rows =>
      // per-partition decoder setup would happen here (model load, etc.)
      rows.map { case (id, bytes) =>
        val fmt = sniffFormatBytes(bytes)
        val feat = decodeImage(bytes).map(imageFeature).getOrElse(decodeStub(bytes))
        MediaFeatures(id, bytes.length.toLong, fmt, feat.toSeq)
      }
    }
  }

  case class ImageStats(
      media_id: Long,
      byte_len: Long,
      decoded: Boolean,
      width: Option[Int],
      height: Option[Int],
      n_pixels: Option[Long],
      mean_r: Option[Double],
      mean_g: Option[Double],
      mean_b: Option[Double],
      mean_luma: Option[Double])

  // ImageIO's default stream wrapper spools to a disk cache file per
  // image — at corpus scale that is one /tmp write per row. Byte-array
  // inputs never need it; turn it off once, process-wide.
  javax.imageio.ImageIO.setUseCache(false)

  /** Decompression-bomb ceiling: decode refuses images whose HEADER
    * declares more pixels than this (100 MP ≈ 400 MB of ARGB bitmap).
    * A crawl routinely carries hostile payloads — a 25k×25k PNG is a
    * few KB on the wire but a ~2.5 GB bitmap once decoded, and the
    * resulting OutOfMemoryError is an executor-killing Error no
    * exception handler should swallow. The guard reads width/height
    * from the format header BEFORE any pixel decode happens.
    */
  private[multimodal] val MaxDecodePixels: Long = 100L * 1000 * 1000

  /** Decode an image payload with the JDK's own codecs (`javax.imageio`
    * ships JPEG, PNG, GIF, BMP readers in every JRE — no external
    * dependency). Returns None for bytes no registered reader accepts,
    * including truncated/corrupt payloads a crawl always carries, and
    * for headers declaring more than [[MaxDecodePixels]] (bomb guard —
    * dimensions come from the header via `ImageReader.getWidth/getHeight`,
    * so the refusal costs no decode work).
    */
  private[multimodal] def decodeImage(bytes: Array[Byte],
      maxPixels: Long = MaxDecodePixels): Option[java.awt.image.BufferedImage] =
    try {
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      if (in == null) None
      else
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(in)
          if (!readers.hasNext) None
          else {
            val reader = readers.next()
            try {
              reader.setInput(in, true, true)
              val w = reader.getWidth(0).toLong
              val h = reader.getHeight(0).toLong
              if (w <= 0 || h <= 0 || w * h > maxPixels) None
              else Option(reader.read(0))
            } finally reader.dispose()
          }
        } finally in.close()
    } catch { case _: java.io.IOException | _: RuntimeException => None }

  /** Per-image channel statistics from a decoded bitmap, reduced row by
    * row (one `int[width]` scanline buffer — full-bitmap arrays never
    * materialize, so a 100-megapixel outlier costs memory proportional to
    * its WIDTH, not its area).
    */
  private[multimodal] def pixelStats(
      img: java.awt.image.BufferedImage): (Long, Double, Double, Double, Double) = {
    val w = img.getWidth; val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val p = row(x)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    val mr = sr.toDouble / n; val mg = sg.toDouble / n; val mb = sb.toDouble / n
    (n, mr, mg, mb, 0.2126 * mr + 0.7152 * mg + 0.0722 * mb)
  }

  /** REAL image decode — mm5. JPEG/PNG (plus GIF/BMP) payloads decode to
    * per-image pixel statistics via the JDK's `javax.imageio` codecs: no
    * external library, no stub, NO GATE — this is production output.
    * Typed mapPartitions, same scale shape as [[extractFeatures]]: rows
    * stream through the executor, bitmaps live only inside the decode
    * call, nothing visits the driver. Undecodable rows are KEPT with
    * `decoded=false` and null stats — silently dropping corrupt payloads
    * would skew downstream counts on a real crawl.
    */
  def imageStats(df: DataFrame, idCol: String, binCol: String): Dataset[ImageStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"), col(binCol).as("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodeImage(bytes) match {
          case Some(img) =>
            val (n, mr, mg, mb, ml) = pixelStats(img)
            ImageStats(id, bytes.length.toLong, decoded = true,
              Some(img.getWidth), Some(img.getHeight), Some(n),
              Some(mr), Some(mg), Some(mb), Some(ml))
          case None =>
            ImageStats(id, bytes.length.toLong, decoded = false,
              None, None, None, None, None, None, None)
        }
      })
  }

  case class MediaFrame(
      media_id: Long, frame_idx: Int, frame_ms: Long, frame: Array[Byte])

  /** Frame sampling: the UDTF-shaped explode of a video payload — one row
    * per sampled frame at a fixed stride, capped. Real demuxing is
    * STUBBED (deterministic byte slice per frame index); the fan-out
    * shape, output schema, and executor-side batching are the production
    * machinery. Frames explode row counts (a 2 h video at 1 fps is 7200
    * rows), so sampling runs inside `flatMap` on executors and frame
    * bytes never visit the driver.
    */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
      everyMs: Long = 1000L, maxFrames: Int = 16): Dataset[MediaFrame] = {
    val spark = df.sparkSession
    requireStubOptIn(spark, "sampleFrames")
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"), col(binCol).as("bytes"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        // REAL DEMUXER GOES HERE — replace the frame count + slice with
        // container parsing; everything around it stays unchanged
        val n = math.min(maxFrames, math.max(1, bytes.length / 64))
        (0 until n).iterator.map { i =>
          val start = (i * 64) % math.max(bytes.length, 1)
          MediaFrame(id, i, i * everyMs,
            bytes.slice(start, math.min(start + 64, bytes.length)))
        }
      }
  }

  /** Resize: binary→binary transform that stays columnar end to end.
    * STUBBED as a deterministic byte decimation toward a target budget —
    * a real image library call replaces only the function body.
    */
  def resizeStub(bytes: Array[Byte], targetBytes: Int): Array[Byte] = {
    if (bytes.length <= targetBytes || targetBytes <= 0) bytes
    else {
      val stride = math.max(1, bytes.length / targetBytes)
      bytes.indices.collect { case i if i % stride == 0 => bytes(i) }.toArray
    }
  }

  /** Batched resize over a binary column (media_id, resized). */
  def resized(df: DataFrame, idCol: String, binCol: String,
      targetBytes: Int): DataFrame = {
    val spark = df.sparkSession
    requireStubOptIn(spark, "resized")
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"), col(binCol).as("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => (id, resizeStub(b, targetBytes)) })
      .toDF("media_id", "resized")
  }

  private def sniffFormatBytes(b: Array[Byte]): String = {
    def hx(n: Int) = b.take(n).map(x => f"${x & 0xff}%02x").mkString
    if (b.length >= 4 && hx(4) == "89504e47") "png"
    else if (b.length >= 2 && hx(2) == "ffd8") "jpeg"
    else if (b.length >= 3 && hx(3) == "494433") "mp3"
    else if (b.length >= 3 && hx(3) == "000000") "mp4"
    else "bin"
  }
}
