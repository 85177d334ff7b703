package graft.lake

import java.security.MessageDigest

import org.apache.hadoop.fs.{FileSystem, Path}

/** S15: content-addressed file archive (reference repository/archive.py,
  * core/conventions/path.py:144-212): blobs live at
  * `archive/ab/cd/ef/{sha256}/blob`, with optional metadata JSON and
  * extracted text side files. Paths derive from the checksum alone, so
  * archiving is idempotent and dedupes identical payloads for free.
  *
  * Driver-side IO plumbing over the Hadoop FS API (works on HDFS/S3/local
  * alike); entity emission for archived files feeds the normal statement
  * import path (S12).
  */
object Archive {

  /** Relative blob path for a checksum — the executor-side twin of
    * [[Archive.keyPath]] (tasks address blobs without a driver handle).
    */
  def blobRel(checksum: String): String = {
    require(checksum.matches("[0-9a-f]{64}"), s"invalid checksum: $checksum")
    s"${checksum.substring(0, 2)}/${checksum.substring(2, 4)}/${checksum.substring(4, 6)}/$checksum/blob"
  }
}

class Archive(fs: FileSystem, root: Path) {

  def checksumOf(bytes: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(bytes)
      .map(b => f"${b & 0xff}%02x").mkString

  /** `ab/cd/ef/<sha256>` prefix path for a checksum (reference F9). */
  def keyPath(checksum: String): Path = {
    require(checksum.matches("[0-9a-f]{64}"), s"invalid checksum: $checksum")
    new Path(root, Archive.blobRel(checksum)).getParent
  }

  /** Streaming put: spools the body to a temp file while hashing, then
    * renames it into its content address — driver memory stays O(buffer)
    * regardless of blob size. The HTTP PUT route uses this; the byte[]
    * overload would buffer a multi-GB upload whole on the driver.
    * Idempotent per content like [[put]].
    */
  def putStream(in: java.io.InputStream): String = {
    FsOps.mkdirs(fs, root)
    val spool = new Path(root, s".upload-${java.util.UUID.randomUUID()}.tmp")
    // the spool delete guards the WHOLE body, copy loop included: a
    // client disconnect mid-PUT aborts the request-body read, and
    // without the outer finally each failed upload would leave an
    // .upload-*.tmp in the archive root forever
    try {
      val md = MessageDigest.getInstance("SHA-256")
      val out = fs.create(spool, true)
      try {
        val buf = new Array[Byte](256 * 1024)
        var n = in.read(buf)
        while (n >= 0) { md.update(buf, 0, n); out.write(buf, 0, n); n = in.read(buf) }
      } finally out.close()
      val checksum = md.digest().map(b => f"${b & 0xff}%02x").mkString
      val dir = keyPath(checksum)
      val blob = new Path(dir, "blob")
      if (!fs.exists(blob)) {
        fs.mkdirs(dir)
        if (!fs.rename(spool, blob) && !fs.exists(blob))
          throw new IllegalStateException(s"archive write race at $blob")
      }
      checksum
    } finally fs.delete(spool, false) // no-op when the rename consumed it
  }

  /** Store a blob; returns its checksum. Idempotent per content. */
  def put(bytes: Array[Byte]): String = {
    val checksum = checksumOf(bytes)
    val dir = keyPath(checksum)
    val blob = new Path(dir, "blob")
    if (!fs.exists(blob)) {
      fs.mkdirs(dir)
      val tmp = new Path(dir, s".blob.tmp")
      val out = fs.create(tmp, true)
      try out.write(bytes) finally out.close()
      if (!fs.rename(tmp, blob) && !fs.exists(blob))
        throw new IllegalStateException(s"archive write race at $blob")
    }
    checksum
  }

  def get(checksum: String): Option[Array[Byte]] = {
    val blob = new Path(keyPath(checksum), "blob")
    if (!fs.exists(blob)) None
    else {
      val in = fs.open(blob)
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        Some(out.toByteArray)
      } finally in.close()
    }
  }

  def exists(checksum: String): Boolean =
    fs.exists(new Path(keyPath(checksum), "blob"))

  /** Public URL for a blob given a dataset's prefix (reference J6/F14). */
  def publicUrl(prefix: String, checksum: String): String =
    s"${prefix.stripSuffix("/")}/${checksum.substring(0, 2)}/${checksum.substring(2, 4)}/${checksum.substring(4, 6)}/$checksum/blob"
}
