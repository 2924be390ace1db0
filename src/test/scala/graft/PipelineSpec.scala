package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import graft.pipeline._
import graft.sources.GtfsRt
import graft.sources.GtfsRt.RawVehicle
import org.apache.spark.sql.functions._

/** End-to-end pipeline slice (SURVEY.md §7.1): fetch → decode → enrich
  * → partitioned sink + ledger → quality gates, with per-feed failure
  * isolation and the all-null-geometry edge from the reference
  * (gtfs_rt_assets.py:161-170). */
class PipelineSpec extends SparkSpec {

  private def vehicles(n: Int, withCoords: Boolean): Seq[RawVehicle] =
    (1 to n).map { i =>
      RawVehicle(Some(s"v$i"),
        if (withCoords) Some(40.5 + i * 0.001) else None,
        if (withCoords) Some(-74.0 + i * 0.001) else None,
        Some(3.0 + i), Some(90.0), Some(s"t$i"), Some("M34"), Some(i), Some(2))
    }

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("batch run: healthy + failing feeds, sink, ledger, quality gates") {
    val dir = tmp("gtfs")
    val good = s"$dir/feed_good.pb"
    Files.write(Paths.get(good), GtfsRt.encodeFeed(vehicles(25, withCoords = true)))
    val feeds = Seq(
      FeedConfig("good", good),
      FeedConfig("bad", s"$dir/missing.pb!boom"))
    val now = Timestamp.valueOf("2024-06-01 12:00:30")

    val report = GtfsPipeline.runBatch(spark, feeds, new FileFeedSource,
      s"$dir/data", s"$dir/ledger", now)

    assert(report.feedsOk == Seq("good"))
    assert(report.feedsFailed.keySet == Set("bad")) // T3 isolation
    assert(report.recordCount == 25)

    // partition layout (K1) must be Hive-style for pruning
    assert(Files.exists(Paths.get(s"$dir/data/year=2024/month=6/day=1/hour=12")))

    val q = GtfsPipeline.qualityCheck(spark, s"$dir/data", s"$dir/ledger", now)
    assert(q.totalRecords == 25 && q.freshRecords == 25 && q.orphanLedgerRows == 0)
    q.assertHealthy()

    // ledger bbox matches the encoded coordinate window (A1); float32
    // wire precision ⇒ compare loosely
    val ledger = spark.read.parquet(s"$dir/ledger").head()
    assert(math.abs(ledger.getAs[Double]("bbox_miny") - 40.501) < 1e-3)
    assert(math.abs(ledger.getAs[Double]("bbox_maxx") - (-73.975)) < 1e-3)
  }

  test("corrupt feed bytes are isolated like fetch failures (T3)") {
    val dir = tmp("gtfs_corrupt")
    val good = s"$dir/good.pb"
    Files.write(Paths.get(good), GtfsRt.encodeFeed(vehicles(10, withCoords = true)))
    val corrupt = s"$dir/corrupt.pb"
    // entity claims 127 payload bytes but only 3 follow
    Files.write(Paths.get(corrupt), Array[Byte](0x12, 0x7f, 1, 2, 3))
    val now = Timestamp.valueOf("2024-06-01 12:00:30")

    val report = GtfsPipeline.runBatch(spark,
      Seq(FeedConfig("good", good), FeedConfig("corrupt", corrupt)),
      new FileFeedSource, s"$dir/data", s"$dir/ledger", now)

    assert(report.feedsOk == Seq("good"))
    assert(report.feedsFailed.keySet == Set("corrupt"))
    assert(report.feedsFailed("corrupt").contains("decode"))
    assert(report.recordCount == 10) // the good feed still landed
  }

  test("idempotent re-run: committed batch skipped, counts unchanged") {
    val dir = tmp("gtfs_idem")
    val path = s"$dir/feed.pb"
    Files.write(Paths.get(path), GtfsRt.encodeFeed(vehicles(10, withCoords = true)))
    val feeds = Seq(FeedConfig("f", path))
    val t0 = Timestamp.valueOf("2024-06-01 12:00:30")

    val first = GtfsPipeline.runBatch(spark, feeds, new FileFeedSource,
      s"$dir/data", s"$dir/ledger", t0, idempotent = true)
    assert(!first.skipped && first.recordCount == 10)
    val again = GtfsPipeline.runBatch(spark, feeds, new FileFeedSource,
      s"$dir/data", s"$dir/ledger", t0, idempotent = true)
    assert(again.skipped)
    assert(spark.read.parquet(s"$dir/data").count() == 10) // no duplicates
    assert(spark.read.parquet(s"$dir/ledger").count() == 1)
    // non-idempotent mode still appends (the pre-existing behavior)
    GtfsPipeline.runBatch(spark, feeds, new FileFeedSource,
      s"$dir/data", s"$dir/ledger", t0)
    assert(spark.read.parquet(s"$dir/data").count() == 20)
  }

  test("orphan recovery: uncommitted batch rows removed, committed survive") {
    val dir = tmp("gtfs_orphan")
    val path = s"$dir/feed.pb"
    Files.write(Paths.get(path), GtfsRt.encodeFeed(vehicles(10, withCoords = true)))
    val feeds = Seq(FeedConfig("f", path))
    // committed batch at 12:00 + a second committed batch in the SAME hour
    val t0 = Timestamp.valueOf("2024-06-01 12:00:30")
    val t1 = Timestamp.valueOf("2024-06-01 12:30:30")
    GtfsPipeline.runBatch(spark, feeds, new FileFeedSource,
      s"$dir/data", s"$dir/ledger", t0)
    GtfsPipeline.runBatch(spark, feeds, new FileFeedSource,
      s"$dir/data", s"$dir/ledger", t1)
    // simulate a crash between data write and ledger commit: write a
    // batch into the same hour, then delete its ledger row by keeping
    // only the first two
    val t2 = Timestamp.valueOf("2024-06-01 12:45:30")
    GtfsPipeline.runBatch(spark, feeds, new FileFeedSource,
      s"$dir/data", s"$dir/ledger", t2)
    val keep = spark.read.parquet(s"$dir/ledger")
      .filter(col("batch_id").isin("20240601_120030", "20240601_123030"))
      .localCheckpoint()
    keep.write.mode("overwrite").parquet(s"$dir/ledger2")

    val removed = GtfsPipeline.recoverOrphanData(spark, s"$dir/data", s"$dir/ledger2")
    assert(removed == 10, s"expected 10 orphan rows removed, got $removed")
    val after = spark.read.parquet(s"$dir/data")
    assert(after.count() == 20)
    assert(after.select("batch_id").distinct().count() == 2)
    // recovery is idempotent
    assert(GtfsPipeline.recoverOrphanData(spark, s"$dir/data", s"$dir/ledger2") == 0)
    // rewritten partition keeps its GeoParquet footer
    val f = Files.walk(Paths.get(s"$dir/data")).iterator()
    var found = false
    while (f.hasNext) {
      val p = f.next()
      if (p.toString.endsWith(".parquet"))
        found = found || graft.sources.GeoParquet.readGeoMetadata(p).isDefined
    }
    assert(found)
  }

  test("snapshot isolation: a mid-crash reader sees exactly the pre-batch state") {
    val dir = tmp("gtfs_snapshot")
    val path = s"$dir/feed.pb"
    Files.write(Paths.get(path), GtfsRt.encodeFeed(vehicles(10, withCoords = true)))
    val feeds = Seq(FeedConfig("f", path))
    val t0 = Timestamp.valueOf("2024-06-01 12:00:30")
    GtfsPipeline.runBatch(spark, feeds, new FileFeedSource,
      s"$dir/data", s"$dir/ledger", t0)
    val preBatch = GtfsPipeline.committedData(spark, s"$dir/data", s"$dir/ledger")
      .collect().map(_.getAs[String]("batch_id")).toSet

    // crash window: batch 2's DATA is on disk, its ledger row is not
    // (run it against a throwaway ledger — data-then-ledger order means
    // this is exactly the state after a crash before the commit row)
    val t1 = Timestamp.valueOf("2024-06-01 12:30:30")
    GtfsPipeline.runBatch(spark, feeds, new FileFeedSource,
      s"$dir/data", s"$dir/ledger_elsewhere", t1)

    // a raw reader sees the torn state; the snapshot reader does not
    assert(spark.read.parquet(s"$dir/data")
      .select("batch_id").distinct().count() == 2)
    val snap = GtfsPipeline.committedData(spark, s"$dir/data", s"$dir/ledger")
    assert(snap.select("batch_id").distinct().collect()
      .map(_.getString(0)).toSet == preBatch,
      "mid-crash snapshot must equal the pre-batch state")
    assert(snap.count() == 10)

    // once the commit row lands, the batch becomes visible
    spark.read.parquet(s"$dir/ledger_elsewhere")
      .write.mode("append").parquet(s"$dir/ledger")
    assert(GtfsPipeline.committedData(spark, s"$dir/data", s"$dir/ledger")
      .select("batch_id").distinct().count() == 2)

    // an absent/empty ledger yields the EMPTY snapshot, never raw rows
    assert(GtfsPipeline.committedData(spark, s"$dir/data", s"$dir/no_ledger")
      .isEmpty)
    // and the snapshot read plans as a broadcast semi-join (map-side
    // filter on the scan), not a shuffle
    val plan = GtfsPipeline.committedData(spark, s"$dir/data", s"$dir/ledger")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"snapshot read must broadcast the committed-id set:\n$plan")
  }

  test("all-null-geometry batch: null bbox, pipeline still healthy") {
    val dir = tmp("gtfs_nullgeo")
    val path = s"$dir/feed.pb"
    Files.write(Paths.get(path), GtfsRt.encodeFeed(vehicles(10, withCoords = false)))
    val now = Timestamp.valueOf("2024-06-01 13:00:00")
    GtfsPipeline.runBatch(spark, Seq(FeedConfig("nogeo", path)),
      new FileFeedSource, s"$dir/data", s"$dir/ledger", now)

    val ledger = spark.read.parquet(s"$dir/ledger").head()
    assert(ledger.isNullAt(ledger.fieldIndex("bbox_minx"))) // :169-170 path
    assert(ledger.getAs[Long]("record_count") == 10)
    val q = GtfsPipeline.qualityCheck(spark, s"$dir/data", s"$dir/ledger", now)
    q.assertHealthy()
  }

  test("freshness gate fails when data is older than an hour (fixed TZ semantics)") {
    val dir = tmp("gtfs_stale")
    val path = s"$dir/feed.pb"
    Files.write(Paths.get(path), GtfsRt.encodeFeed(vehicles(5, withCoords = true)))
    val batchTime = Timestamp.valueOf("2024-06-01 10:00:00")
    GtfsPipeline.runBatch(spark, Seq(FeedConfig("f", path)),
      new FileFeedSource, s"$dir/data", s"$dir/ledger", batchTime)

    val later = Timestamp.valueOf("2024-06-01 12:00:00")
    val q = GtfsPipeline.qualityCheck(spark, s"$dir/data", s"$dir/ledger", later)
    assert(q.totalRecords == 5 && q.freshRecords == 0)
    assertThrows[AssertionError](q.assertHealthy())
  }

  test("ledger compaction: files shrink, rows survive, appends continue") {
    val dir = tmp("gtfs_compact")
    val path = s"$dir/feed.pb"
    Files.write(Paths.get(path), GtfsRt.encodeFeed(vehicles(5, withCoords = true)))
    val feeds = Seq(FeedConfig("f", path))
    (0 until 4).foreach { i =>
      GtfsPipeline.runBatch(spark, feeds, new FileFeedSource,
        s"$dir/data", s"$dir/ledger", Timestamp.valueOf(f"2024-06-01 12:0$i:00"))
    }
    val stats = LedgerMaintenance.compact(spark, s"$dir/ledger")
    assert(stats.rowsBefore == 4 && stats.rowsAfter == 4)
    assert(stats.filesBefore >= 4 && stats.filesAfter == 1)
    // ledger still queryable and appendable after the swap
    GtfsPipeline.runBatch(spark, feeds, new FileFeedSource,
      s"$dir/data", s"$dir/ledger", Timestamp.valueOf("2024-06-01 12:09:00"))
    val q = GtfsPipeline.qualityCheck(spark, s"$dir/data", s"$dir/ledger",
      Timestamp.valueOf("2024-06-01 12:09:00"))
    assert(q.totalRecords == 25)
    assert(q.latestBatch.contains("20240601_120900"))
  }

  test("two batches accumulate; latest points at the newest batch (O1)") {
    val dir = tmp("gtfs_two")
    val path = s"$dir/feed.pb"
    Files.write(Paths.get(path), GtfsRt.encodeFeed(vehicles(8, withCoords = true)))
    val feeds = Seq(FeedConfig("f", path))
    val t1 = Timestamp.valueOf("2024-06-01 12:00:00")
    val t2 = Timestamp.valueOf("2024-06-01 12:01:00")
    GtfsPipeline.runBatch(spark, feeds, new FileFeedSource, s"$dir/data", s"$dir/ledger", t1)
    GtfsPipeline.runBatch(spark, feeds, new FileFeedSource, s"$dir/data", s"$dir/ledger", t2)

    val q = GtfsPipeline.qualityCheck(spark, s"$dir/data", s"$dir/ledger", t2)
    assert(q.totalRecords == 16)
    assert(q.latestBatch.contains("20240601_120100"))

    // decoded records survive the sink with HasField-null fidelity
    val data = spark.read.parquet(s"$dir/data")
    assert(data.count() == 16)
    assert(data.filter(col("vehicle_id").isNull).count() == 0)
  }
}
