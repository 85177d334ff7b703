package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-sized
  * batches on executors.
  *
  * The Spark-side machinery — schema, partitioning, batch shape, typed
  * mapPartitions pipeline — is real and tested. The actual media decode is
  * STUBBED (this container ships no image/audio codecs): `decodeStub`
  * derives a deterministic fake feature vector from the bytes. Swapping in
  * a real decoder (JNI/ONNX/ffmpeg) changes only the function body marked
  * below; every scale property (no driver transfer, columnar in/out,
  * per-partition batching, skew-neutral hash distribution) is already in
  * place.
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

  /** Feature-extraction pipeline: binary column in, feature vector out.
    * Runs as a typed mapPartitions — one decoder instance per partition
    * (where a real decoder would amortize model load), rows streamed, no
    * collect, no driver round trip.
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
        MediaFeatures(id, bytes.length.toLong, fmt, decodeStub(bytes).toSeq)
      }
    }
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
