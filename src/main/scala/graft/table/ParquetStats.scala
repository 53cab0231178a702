package graft.table

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary

import scala.jdk.CollectionConverters._

/** Driver-side parquet-footer statistics: per-bucket row counts and
  * `conv_id` min/max come from the footers of the files a MERGE just wrote —
  * O(files) metadata reads instead of a dedicated aggregation job per batch
  * (the job was 20–30% of steady-state batch time). This is exactly how a
  * lakehouse builds its manifests: from file metadata, not a second scan.
  */
object ParquetStats {

  case class DirStats(rows: Long, minKey: String, maxKey: String)

  /** Stats of one bucket directory (all `*.parquet` files under it). */
  def dirStats(conf: Configuration, dir: String, keyColumn: String): DirStats = {
    val p = new HPath(dir)
    val fs = p.getFileSystem(conf)
    val files: Array[FileStatus] =
      fs.listStatus(p).filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    var rows = 0L
    var minK: String = null
    var maxK: String = null
    files.foreach { st =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromStatus(st, conf))
      try {
        val footer = reader.getFooter
        footer.getBlocks.asScala.foreach { block =>
          rows += block.getRowCount
          block.getColumns.asScala.find(_.getPath.toDotString == keyColumn).foreach { col =>
            val s = col.getStatistics
            if (s != null && !s.isEmpty && s.hasNonNullValue) {
              (s.genericGetMin, s.genericGetMax) match {
                case (mn: Binary, mx: Binary) =>
                  val lo = mn.toStringUsingUTF8
                  val hi = mx.toStringUsingUTF8
                  if (minK == null || lo < minK) minK = lo
                  if (maxK == null || hi > maxK) maxK = hi
                case _ =>
              }
            }
          }
        }
      } finally reader.close()
    }
    DirStats(rows, if (minK == null) "" else minK, if (maxK == null) "" else maxK)
  }

  /** Stats for every `_bucket=N` subdirectory of a partitioned write. */
  def bucketDirStats(conf: Configuration, writeDir: String,
                     keyColumn: String): Map[Int, DirStats] = {
    val p = new HPath(writeDir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return Map.empty
    fs.listStatus(p).iterator
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"${IceLite.BucketCol}="))
      .map { st =>
        val b = st.getPath.getName.substring(IceLite.BucketCol.length + 1).toInt
        b -> dirStats(conf, st.getPath.toString, keyColumn)
      }.toMap
  }
}
