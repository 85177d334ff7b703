package graft.lake

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

/** Per-file zone-map extraction from parquet footers (the data-skipping
  * statistics Delta keeps in its transaction log). Read once at commit
  * time — O(fresh files) footer reads per batch, amortized to zero on the
  * scan path where they pay off.
  */
object FileStats {

  /** Max "changed" timestamp of a statement file in epoch MICROS:
    * greatest(max(last_seen), max(deleted_at)) over all row groups — a
    * file whose value is below a changed-since cutoff cannot contain a
    * row passing `first_seen >= c OR last_seen >= c OR deleted_at >= c`
    * (first_seen <= last_seen by construction). None when the footer
    * carries no usable stats (treat as always-read).
    */
  def maxChangedMicros(conf: Configuration, file: Path): Option[Long] = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      var max = Long.MinValue
      val blocks = reader.getFooter.getBlocks
      blocks.forEach { b =>
        b.getColumns.forEach { c =>
          val name = c.getPath.toDotString
          if (name == "last_seen" || name == "deleted_at") {
            val st = c.getStatistics
            if (st != null && st.hasNonNullValue) st.genericGetMax match {
              case l: java.lang.Long => max = math.max(max, l.longValue())
              case _ => ()
            }
          }
        }
      }
      if (max == Long.MinValue) None else Some(max)
    } finally reader.close()
  }
}
