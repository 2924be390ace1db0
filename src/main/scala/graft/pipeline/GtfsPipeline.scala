package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.{st_point, st_x, st_y}
import graft.sources.GtfsRt

/** The reference pipeline as a Spark library (SURVEY.md §3.1, §7.2.7):
  * fetch (isolated failures, retries) → decode → flatten/enrich →
  * time-partitioned parquet sink + ledger append → quality gates.
  *
  * Deliberate fixes over the reference (SURVEY.md §4.3): typed UTC
  * timestamps end-to-end (no ISO strings, no localtime freshness bug),
  * explicit schema (no dtype inference), Hive-style partition layout
  * for Catalyst partition pruning. Geometry is a WKB binary column
  * (st_point) readable by GeoParquet consumers; the `geo` footer
  * metadata key is a documented limitation (SURVEY.md §7.4 #1).
  */
object GtfsPipeline {

  /** Enriched vehicle record (FIXTURES.md §B.1: 11 reference fields
    * with feed_id + typed batch timestamp). */
  final case class VehiclePosition(
      feed_id: String,
      timestamp: Timestamp,
      vehicle_id: Option[String],
      latitude: Option[Double],
      longitude: Option[Double],
      speed: Option[Double],
      bearing: Option[Double],
      trip_id: Option[String],
      route_id: Option[String],
      current_stop_sequence: Option[Int],
      current_status: Option[Int])

  /** Ledger row (FIXTURES.md §B.2 — typed twin of the SQLite DDL at
    * gtfs_rt_assets.py:146-158). */
  final case class LedgerEntry(
      batch_id: String,
      file_path: String,
      timestamp: Timestamp,
      record_count: Long,
      created_at: Timestamp,
      bbox_minx: Option[Double], bbox_miny: Option[Double],
      bbox_maxx: Option[Double], bbox_maxy: Option[Double])

  final case class BatchReport(
      batchId: String,
      feedsOk: Seq[String], feedsFailed: Map[String, String],
      recordCount: Long, ledgerPath: String, dataPath: String,
      skipped: Boolean = false)

  final case class QualityReport(
      totalRecords: Long, freshRecords: Long,
      latestBatch: Option[String], orphanLedgerRows: Long) {
    /** The reference's three assertions (gtfs_rt_assets.py:243-245)
      * plus the FK orphan check done relationally (anti join). */
    def assertHealthy(): Unit = {
      assert(totalRecords > 0, "ledger must contain records")
      assert(freshRecords > 0, "no records within the last hour")
      assert(orphanLedgerRows == 0, s"$orphanLedgerRows ledger rows without files")
    }
  }

  /** One batch run: the Spark equivalent of the three-asset Dagster
    * graph (gtfs_rt_assets.py:248-251). Fetch happens driver-side (a
    * handful of feeds, api_utils.py semantics); decode + everything
    * after is distributed. */
  /** `idempotent = true` makes re-running a batch safe: the ledger is
    * the commit log — a batch whose batch_id already has a ledger row
    * is skipped (report.skipped). Combined with [[recoverOrphanData]]
    * for the crashed-between-write-and-commit case, this gives
    * effectively-once batch semantics over plain parquet. */
  def runBatch(
      spark: SparkSession,
      feeds: Seq[FeedConfig],
      source: FeedSource,
      dataDir: String,
      ledgerDir: String,
      batchTime: Timestamp,
      idempotent: Boolean = false): BatchReport = {
    import spark.implicits._

    // Format batch_id in the SESSION timezone: the year/month/day/hour
    // partition columns below evaluate under spark.sql.session.timeZone,
    // while java.text formatting defaults to the JVM zone — they must
    // agree or the batch_id string disagrees with its own partition path.
    val sessionTz = spark.conf.get("spark.sql.session.timeZone")
    val batchIdFmt = new java.text.SimpleDateFormat("yyyyMMdd_HHmmss")
    batchIdFmt.setTimeZone(java.util.TimeZone.getTimeZone(sessionTz))
    val batchId = batchIdFmt.format(batchTime)

    // committed-batch short-circuit BEFORE any fetch work
    if (idempotent && isCommitted(spark, ledgerDir, batchId)) {
      return BatchReport(batchId, Seq.empty, Map.empty, 0L, ledgerDir, dataDir,
        skipped = true)
    }

    // 1. fetch with per-feed isolation (T2/T3) — failures are data (A5)
    val results = feeds.map(FeedSource.fetchWithRetry(source, _))
    val (ok, failed) = results.partition(_.payload.isDefined)

    // 2. distributed decode + flatten + enrich (S4, P1-P3). A feed
    //    whose bytes fail to decode (truncated/corrupt protobuf —
    //    untrusted HTTP input) is isolated like a fetch failure (T3):
    //    its error is reported, the batch continues without it.
    val raw: Dataset[(String, Array[Byte])] =
      spark.createDataset(ok.map(r => (r.feedId, r.payload.get)))
    val decoded: Dataset[(String, Seq[VehiclePosition], String)] =
      raw.map { case (feedId, bytes) =>
        try (feedId, GtfsRt.decodeFeed(bytes).map { v =>
          VehiclePosition(feedId, batchTime, v.vehicle_id, v.latitude,
            v.longitude, v.speed, v.bearing, v.trip_id, v.route_id,
            v.current_stop_sequence, v.current_status)
        }, "")
        catch { case scala.util.control.NonFatal(e) =>
          // NonFatal only: corrupt input is data, but an executor OOM or
          // LinkageError must fail the task, not masquerade as a bad feed
          (feedId, Seq.empty[VehiclePosition], s"decode: ${e.getMessage}")
        }
      }.persist()
    val decodeFailed: Map[String, String] = decoded
      .filter(_._3.nonEmpty).map(t => (t._1, t._3)).collect().toMap
    val records: Dataset[VehiclePosition] = decoded.flatMap(_._2)

    // persisted: the emptiness guard, the sink write and the bbox
    // aggregate would otherwise each re-run the distributed decode
    val df = records.toDF()
      // P4: geometry only when both coordinates present
      .withColumn("geom",
        when(col("longitude").isNotNull && col("latitude").isNotNull,
          st_point(col("longitude"), col("latitude"))))
      .withColumn("year", year(col("timestamp")))
      .withColumn("month", month(col("timestamp")))
      .withColumn("day", dayofmonth(col("timestamp")))
      .withColumn("hour", hour(col("timestamp")))
      .withColumn("batch_id", lit(batchId))
      .persist()
    val feedsOk = ok.map(_.feedId).filterNot(decodeFailed.contains)
    val feedsFailed =
      failed.map(r => r.feedId -> r.error.get).toMap ++ decodeFailed
    try {
      if (df.isEmpty) { // P6 empty-batch guard (gtfs_rt_assets.py:114-116)
        return BatchReport(batchId, feedsOk, feedsFailed, 0L, ledgerDir, dataDir)
      }

      // 3. K1: Hive-partitioned sink → Catalyst partition pruning for free
      df.write.mode(SaveMode.Append)
        .partitionBy("year", "month", "day", "hour")
        .parquet(dataDir)
      // GeoParquet `geo` footer metadata so external readers recognize
      // the WKB geometry column (ref gtfs_rt_assets.py:128,141).
      // Partition-scoped: stamp only what this batch wrote — the store
      // grows without bound, the batch doesn't.
      val touched = df.select("year", "month", "day", "hour").distinct()
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      graft.sources.GeoParquet.stampPartitions(dataDir, touched, "geom")

      // 4. K2 + A1/A2: one-row ledger append with bbox aggregate.
      //    bbox over WKB via st_x/st_y — all-null geometry ⇒ null bbox
      //    (the gtfs_rt_assets.py:161-170 path).
      val stats = df.agg(
        count(lit(1)).as("n"),
        min(st_x(col("geom"))).as("minx"), min(st_y(col("geom"))).as("miny"),
        max(st_x(col("geom"))).as("maxx"), max(st_y(col("geom"))).as("maxy"))
        .as[(Long, Option[Double], Option[Double], Option[Double], Option[Double])]
        .head()
      val entry = LedgerEntry(batchId, s"$dataDir (batch $batchId)", batchTime,
        stats._1, new Timestamp(System.currentTimeMillis()),
        stats._2, stats._3, stats._4, stats._5)
      spark.createDataset(Seq(entry)).write.mode(SaveMode.Append).parquet(ledgerDir)

      BatchReport(batchId, feedsOk, feedsFailed, stats._1, ledgerDir, dataDir)
    } finally { df.unpersist(); decoded.unpersist() }
  }

  /** True iff the ledger directory exists and holds at least one
    * parquet file (an existing-but-empty dir is an EMPTY ledger, not a
    * schema-inference error). */
  private[graft] def ledgerHasData(spark: SparkSession, ledgerDir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(ledgerDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) &&
      fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
  }

  /** True iff the ledger already holds a commit row matching `batchId`
    * (any comparable type — the batch pipeline uses strings, the
    * streaming sink epoch longs). The ledger read is tiny (metadata
    * table); the predicate pushes to the parquet scan. */
  def isCommitted(spark: SparkSession, ledgerDir: String, batchId: Any): Boolean =
    ledgerHasData(spark, ledgerDir) &&
      !spark.read.parquet(ledgerDir)
        .filter(col("batch_id") === lit(batchId)).limit(1).isEmpty

  /** Snapshot-isolated read of the data store (round 7, VERDICT_r06
    * #7 — IndexCommit's manifest principle applied to the pipeline's
    * data+ledger pair). The write protocol is data-then-ledger, so the
    * ledger row IS the batch's commit manifest: a reader that filters
    * the store to ledger-committed batch_ids can never observe the
    * crash window between the data write and the ledger append — it
    * sees exactly the pre-batch snapshot until the commit row lands,
    * with no coordination and no reliance on [[recoverOrphanData]]
    * having run first.
    *
    * Cost shape at 100 TB: the committed-id set is bounded by #batches
    * (metadata-sized), broadcast into a left-semi join that Catalyst
    * executes as a map-side filter riding the scan — no shuffle, and
    * hour-partition pruning on time predicates still applies before
    * it. An empty or absent ledger yields the empty snapshot (nothing
    * is committed yet, so nothing is visible). */
  def committedData(spark: SparkSession, dataDir: String,
      ledgerDir: String): DataFrame = {
    val data = spark.read.parquet(dataDir)
    if (!ledgerHasData(spark, ledgerDir)) data.limit(0)
    else data.join(
      broadcast(spark.read.parquet(ledgerDir).select(col("batch_id")).distinct()),
      Seq("batch_id"), "left_semi")
  }

  /** Crash recovery for the write-then-commit protocol: data rows whose
    * batch_id never reached the ledger (the run died between the data
    * write and the ledger append) are removed, so an idempotent re-run
    * starts clean. Only the hour partitions that actually contain
    * orphan rows are rewritten (dynamic partition overwrite — sibling
    * batches in the same hour survive); a partition left with zero
    * surviving rows is deleted directly. Returns orphan rows removed. */
  def recoverOrphanData(spark: SparkSession, dataDir: String,
      ledgerDir: String): Long = {
    val fsPath = new org.apache.hadoop.fs.Path(dataDir)
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(fsPath)) return 0L

    // No ledger DIRECTORY ⇒ nothing to reconcile against — refuse to
    // treat the whole store as orphaned (a wrong ledgerDir must not be
    // interpreted as "delete everything"). But an existing dir with no
    // parquet yet IS an empty ledger (crash during the very first
    // commit): every data batch is then uncommitted by protocol.
    if (!fs.exists(new org.apache.hadoop.fs.Path(ledgerDir))) return 0L
    val data = spark.read.parquet(dataDir)
    val committed =
      if (ledgerHasData(spark, ledgerDir))
        spark.read.parquet(ledgerDir).select(col("batch_id")).distinct()
      else data.select(col("batch_id")).limit(0)

    val orphanBatches = data.select(col("batch_id")).distinct()
      .join(committed, Seq("batch_id"), "left_anti")
      .collect().map(_.get(0)).toSet // bounded: #batches, not #rows
      // (.get not .getString: the streaming sink's batch_id is a long)
    if (orphanBatches.isEmpty) return 0L

    val affected = data
      .filter(col("batch_id").isin(orphanBatches.toSeq: _*))
    val nOrphans = affected.count()
    val partitions = affected
      .select("year", "month", "day", "hour").distinct().collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)))

    // localCheckpoint: materializes the survivor rows AND cuts the plan
    // loose from the source files, so writing back over those same
    // files is not a read-from-overwritten-path conflict
    val survivors = data
      .filter(partitions.map { case (y, m, d, h) =>
        col("year") === y && col("month") === m &&
          col("day") === d && col("hour") === h
      }.reduce(_ || _))
      .filter(!col("batch_id").isin(orphanBatches.toSeq: _*))
      .localCheckpoint()
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      if (!survivors.isEmpty) {
        survivors.write.mode(SaveMode.Overwrite)
          .partitionBy("year", "month", "day", "hour").parquet(dataDir)
        // rewritten files need their GeoParquet footer restored — only
        // the partitions this recovery rewrote
        graft.sources.GeoParquet.stampPartitions(dataDir, partitions, "geom")
      }
      // partitions whose every row was orphaned produce no survivor
      // rows — dynamic overwrite never touches them; delete directly
      val survivorParts = survivors
        .select("year", "month", "day", "hour").distinct().collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
      partitions.filterNot(survivorParts).foreach { case (y, m, d, h) =>
        fs.delete(new org.apache.hadoop.fs.Path(
          s"$dataDir/year=$y/month=$m/day=$d/hour=$h"), true)
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
    nOrphans
  }

  /** The reference's post-materialization quality check
    * (gtfs_rt_assets.py:200-245) as relational ops over the ledger:
    * global SUM (A3), last-hour freshness SUM (A4/P5) in typed UTC
    * arithmetic, top-1 latest (O1), and the file⇄ledger FK check as a
    * left anti join instead of os.path.exists (SURVEY.md §2.3). */
  def qualityCheck(spark: SparkSession, dataDir: String, ledgerDir: String,
      now: Timestamp): QualityReport = {
    import spark.implicits._
    val ledger = spark.read.parquet(ledgerDir)

    val total = ledger.agg(coalesce(sum(col("record_count")), lit(0L)))
      .as[Long].head()
    val fresh = ledger
      .filter(col("timestamp") >= lit(now) - expr("INTERVAL 1 HOUR"))
      .agg(coalesce(sum(col("record_count")), lit(0L))).as[Long].head()
    val latest = ledger.orderBy(col("timestamp").desc, col("batch_id").desc)
      .select(col("batch_id")).limit(1).as[String].collect().headOption

    // orphan detection: ledger batches with no backing data partitions
    val dataBatches = spark.read.parquet(dataDir)
      .select(col("batch_id")).distinct()
    val orphans = ledger.select(col("batch_id"))
      .join(dataBatches, Seq("batch_id"), "left_anti").count()

    QualityReport(total, fresh, latest, orphans)
  }
}
