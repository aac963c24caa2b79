package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the table-maintenance op every long-lived
  * parquet table needs: streaming sinks, per-micro-batch publishes, and
  * incremental appends all accrete files far smaller than the ideal
  * scan unit, and at 100 TB the resulting task-per-tiny-file overhead
  * (plus NameNode/listing pressure) dominates read cost.
  *
  * The partition count is derived from the table's ACTUAL on-disk bytes
  * (FS listing — metadata only, no data read), not row counts, so the
  * rewrite hits the target file size regardless of schema width or
  * compression ratio. The rewrite stages into a hidden sibling dir and
  * swaps via two renames; for a fully transactional swap under
  * concurrent readers, compact into an [[AtomicPublish]] root instead
  * (a compaction is just a republish with fewer files).
  */
object Compaction {

  final case class CompactionResult(filesBefore: Int, filesAfter: Int,
      bytes: Long, partitions: Int)

  private def dataFiles(spark: SparkSession, path: Path) = {
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(path).filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
  }

  /** Partitions needed to land ~`targetBytes` per output file. */
  def compactionPartitions(spark: SparkSession, dir: String,
      targetBytes: Long): Int = {
    val bytes = dataFiles(spark, new Path(dir)).map(_.getLen).sum
    math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
  }

  /** Rewrite `dir` into ~`targetBytes` files. Returns before/after
    * counts. The swap is rename-based (stage → old aside → stage in →
    * drop old); a reader racing the swap should use an AtomicPublish
    * root, where compaction is a manifest-pointer republish instead. */
  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): CompactionResult = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = dataFiles(spark, path)
    val bytes = before.map(_.getLen).sum
    val parts = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val staged = new Path(path.getParent, s".compact_${path.getName}")
    spark.read.parquet(dir)
      .repartition(parts)
      .write.mode("overwrite").parquet(staged.toString)
    val old = new Path(path.getParent, s".old_${path.getName}")
    fs.rename(path, old)
    fs.rename(staged, path)
    fs.delete(old, true)
    CompactionResult(before.length,
      dataFiles(spark, path).length, bytes, parts)
  }
}
