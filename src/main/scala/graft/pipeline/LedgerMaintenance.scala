package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Maintenance for the append-only parquet ledger: each pipeline batch
  * appends one tiny file (K2), so a minute-cadence deployment grows
  * ~1440 files/day — the classic small-file problem. Compaction
  * rewrites the ledger into a few right-sized files via a
  * write-to-side-dir + atomic-ish rename swap (Hadoop FileSystem API,
  * works on local fs and HDFS; on object stores swap the rename for a
  * manifest flip).
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
    if (fs.exists(old)) fs.delete(old, true)
    require(fs.rename(dir, old), s"could not stage $dir aside")
    require(fs.rename(tmp, dir), s"could not swap compacted ledger in")
    fs.delete(old, true)

    CompactionStats(rowsBefore, rowsAfter, filesBefore, parquetFiles(dir))
  }
}
