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

  /** `minLsn`/`maxLsn` are the `_lsn` zone map of the directory (the LSN
    * range its rows span). When the column's footer statistics are absent
    * the range degrades to (Long.MinValue, Long.MaxValue) — "unknown, never
    * skip" — so stats-based pruning stays conservative, never wrong.
    */
  case class DirStats(rows: Long, minKey: String, maxKey: String,
                      minLsn: Long = Long.MinValue, maxLsn: Long = Long.MaxValue)

  /** Stats of one bucket directory (all `*.parquet` files under it). */
  def dirStats(conf: Configuration, dir: String, keyColumn: String): DirStats = {
    val p = new HPath(dir)
    val fs = p.getFileSystem(conf)
    val files: Array[FileStatus] =
      fs.listStatus(p).filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    var rows = 0L
    var minK: String = null
    var maxK: String = null
    var minL = Long.MaxValue
    var maxL = Long.MinValue
    var lsnSeen = true // flips false if ANY block lacks _lsn stats → unknown
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
          block.getColumns.asScala.find(_.getPath.toDotString == IceLite.LsnCol) match {
            case Some(col) =>
              val s = col.getStatistics
              if (s != null && !s.isEmpty && s.hasNonNullValue)
                (s.genericGetMin, s.genericGetMax) match {
                  case (mn: java.lang.Long, mx: java.lang.Long) =>
                    if (mn < minL) minL = mn
                    if (mx > maxL) maxL = mx
                  case _ => lsnSeen = false
                }
              else lsnSeen = false
            case None => lsnSeen = false
          }
        }
      } finally reader.close()
    }
    val (lo, hi) = if (lsnSeen && minL != Long.MaxValue) (minL, maxL)
                   else (Long.MinValue, Long.MaxValue)
    DirStats(rows, if (minK == null) "" else minK, if (maxK == null) "" else maxK, lo, hi)
  }

  /** Exact maximum of an INT64 column from footer statistics alone — for
    * driver-side cutoffs (e.g. the two-phase harness midpoint) that
    * otherwise cost a full-scan aggregation job per query. `path` may be a
    * single parquet file or a directory of them. Returns None (caller falls
    * back to the scan) when any block lacks statistics for the column, so
    * the answer is footer-exact or not given, never approximate.
    */
  def columnMaxLong(conf: Configuration, path: String, column: String): Option[Long] = {
    val p = new HPath(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return None
    val files: Array[FileStatus] =
      if (fs.getFileStatus(p).isFile) Array(fs.getFileStatus(p))
      else fs.listStatus(p).filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    if (files.isEmpty) return None
    var mx = Long.MinValue
    var seen = true
    files.foreach { st =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromStatus(st, conf))
      try reader.getFooter.getBlocks.asScala.foreach { block =>
        block.getColumns.asScala.find(_.getPath.toDotString == column) match {
          case Some(col) =>
            val s = col.getStatistics
            if (s != null && !s.isEmpty && s.hasNonNullValue)
              s.genericGetMax match {
                case v: java.lang.Long => if (v > mx) mx = v
                case _ => seen = false
              }
            else seen = false
          case None => seen = false
        }
      } finally reader.close()
    }
    if (seen && mx != Long.MinValue) Some(mx) else None
  }

  /** Stats for every `_bucket=N` subdirectory of a partitioned write.
    * Footer reads run on the JVM common pool: a 64-bucket delta write means
    * 64 independent footer opens, and reading them sequentially on the
    * driver was a visible slice of every apply's fixed cost (each open is
    * ~ms of filesystem latency, not CPU).
    */
  def bucketDirStats(conf: Configuration, writeDir: String,
                     keyColumn: String): Map[Int, DirStats] = {
    val p = new HPath(writeDir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return Map.empty
    val dirs = fs.listStatus(p)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"${IceLite.BucketCol}="))
    dirs.map { st =>
      val b = st.getPath.getName.substring(IceLite.BucketCol.length + 1).toInt
      b -> java.util.concurrent.CompletableFuture.supplyAsync(
        () => dirStats(conf, st.getPath.toString, keyColumn))
    }.map { case (b, f) => b -> f.get() }.toMap
  }
}
