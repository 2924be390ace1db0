package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Maintenance for the append-only parquet ledger: each pipeline batch
  * appends one tiny file (K2), so a minute-cadence deployment grows
  * ~1440 files/day — the classic small-file problem. Compaction
  * rewrites the ledger into a few right-sized files via a
  * write-to-side-dir + rename swap (Hadoop FileSystem API, works on
  * local fs and HDFS; on object stores swap the rename for a manifest
  * flip).
  *
  * Concurrency contract: run between batches, never concurrently with
  * appends — the row-count verification guards the rewrite itself, but
  * a row appended during the final swap window would be lost (schedule
  * compaction from the same loop that runs batches, as the spec does).
  * A failed swap rolls the original directory back; if rollback itself
  * fails, the `.old` staging dir is left in place and a later compact
  * refuses to run until it is recovered manually.
  */
object LedgerMaintenance {

  final case class CompactionStats(
      rowsBefore: Long, rowsAfter: Long, filesBefore: Int, filesAfter: Int)

  def compact(spark: SparkSession, ledgerDir: String,
      targetFiles: Int = 1): CompactionStats = {
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(ledgerDir)
    val fs = dir.getFileSystem(hadoopConf)

    def parquetFiles(p: Path): Int =
      fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet"))

    val before = spark.read.parquet(ledgerDir)
    val rowsBefore = before.count()
    val filesBefore = parquetFiles(dir)

    val tmp = new Path(ledgerDir + ".compact")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    before.coalesce(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)

    // verify the rewrite before swapping anything
    val rowsAfter = spark.read.parquet(tmp.toString).count()
    require(rowsAfter == rowsBefore,
      s"compaction would lose rows: $rowsBefore -> $rowsAfter; aborting")

    val old = new Path(ledgerDir + ".old")
    // a leftover .old means an earlier compaction failed mid-swap and
    // may hold the only copy of the history — never delete it blindly
    require(!fs.exists(old),
      s"$old exists (prior failed compaction?) — recover it before compacting")
    require(fs.rename(dir, old), s"could not stage $dir aside")
    if (!fs.rename(tmp, dir)) {
      val restored = fs.rename(old, dir) // roll the live ledger back
      throw new IllegalStateException(
        s"could not swap compacted ledger in" +
          (if (restored) " (original restored)"
           else s" AND rollback failed — ledger preserved at $old"))
    }
    fs.delete(old, true)

    CompactionStats(rowsBefore, rowsAfter, filesBefore, parquetFiles(dir))
  }
}
