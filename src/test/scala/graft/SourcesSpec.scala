package graft

import java.nio.file.Files

import graft.pipeline.GtfsPipeline
import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._

/** Source/sink completeness beyond parquet: CSV, JSON, ORC roundtrips
  * with explicit schemas, and the streaming snapshot pipeline
  * (readStream → foreachBatch → partitioned store + ledger). */
class SourcesSpec extends SparkSpec {

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private lazy val sample = Tables(spark, sf0001).events
    .select("event_id", "user_id", "event_type", "value")

  test("csv roundtrip with explicit schema") {
    val dir = tmp("csv")
    sample.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(sample.schema).csv(dir)
    assert(back.count() == sample.count())
    assert(back.schema == sample.schema)
    assert(back.agg(sum("event_id")).head().getLong(0) ==
      sample.agg(sum("event_id")).head().getLong(0))
  }

  test("json roundtrip") {
    val dir = tmp("json")
    sample.write.mode("overwrite").json(dir)
    val back = spark.read.schema(sample.schema).json(dir)
    assert(back.count() == sample.count())
    assert(back.select("event_id").collect().map(_.getLong(0)).sorted.toSeq ==
      sample.select("event_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("orc roundtrip preserves types exactly") {
    val dir = tmp("orc")
    val full = Tables(spark, sf0001).events
    full.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == full.schema)
    assert(back.count() == full.count())
  }

  test("events normalization is independent of caller session time zone (ADVICE r06)") {
    // A fresh dir forces a fresh Tables cache key, so .events rebuilds its
    // plan under the poisoned session TZ — the shape a bare spark-shell
    // entry point would hit.
    val dir = tmp("tzdir")
    Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val utcRows = Tables(spark, sf0001).events
      .select("event_id", "ts").orderBy("event_id").limit(5)
      .collect().map(r => (r.getLong(0), r.get(1).toString)).toSeq
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val rows = Tables(spark, dir).events
        .select("event_id", "ts").orderBy("event_id").limit(5)
        .collect().map(r => (r.getLong(0), r.get(1).toString)).toSeq
      assert(rows == utcRows) // wall-clock times did not shift
      // Tables pinned the session back to UTC as a side effect
      assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  test("partitioned parquet write enables partition pruning") {
    val dir = tmp("part")
    val e = Tables(spark, sf0001).events
      .withColumn("day", dayofmonth(col("ts")))
    e.write.mode("overwrite").partitionBy("day").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("day") === 5)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() == e.filter(col("day") === 5).count())
    // partition filter must appear as such, not as a data filter
    assert(scan.contains("PartitionFilters") || scan.contains("day#"))
  }

  test("streaming snapshot pipeline: micro-batches land partitioned + ledgered") {
    val in = tmp("stream_in"); val data = tmp("stream_data")
    val ledger = tmp("stream_ledger"); val ckpt = tmp("stream_ckpt")
    val events = Tables(spark, sf0001).events
    val schema = events.schema

    // batch 1: two days of events
    events.filter(dayofmonth(col("ts")) <= 2)
      .write.mode("append").parquet(in)
    val q1 = StreamingOps.snapshotPipeline(spark, in, schema, data, ledger, ckpt)
    q1.awaitTermination()

    val afterFirst = spark.read.parquet(data).count()
    assert(afterFirst == events.filter(dayofmonth(col("ts")) <= 2).count())

    // batch 2: more files arrive; checkpoint resumes, no reprocessing
    events.filter(dayofmonth(col("ts")) === 3)
      .write.mode("append").parquet(in)
    val q2 = StreamingOps.snapshotPipeline(spark, in, schema, data, ledger, ckpt)
    q2.awaitTermination()

    val total = spark.read.parquet(data).count()
    assert(total == events.filter(dayofmonth(col("ts")) <= 3).count())

    val led = spark.read.parquet(ledger)
    assert(led.count() >= 2) // one row per non-empty micro-batch
    assert(led.agg(sum("record_count")).head().getLong(0) == total)

    // Hive layout exists (year=2024/...)
    assert(new java.io.File(data).listFiles().exists(_.getName.startsWith("year=")))
  }

  test("foreachBatch replay is idempotent: a committed batchId never double-appends") {
    val data = tmp("idem_data"); val ledger = tmp("idem_ledger")
    val batch = Tables(spark, sf0001).events
      .filter(dayofmonth(col("ts")) === 1)
      .withColumn("year", year(col("ts"))).withColumn("month", month(col("ts")))
      .withColumn("day", dayofmonth(col("ts"))).withColumn("hour", hour(col("ts")))
    val n = batch.count()
    assert(StreamingOps.appendSnapshotBatch(batch, 7L, data, ledger))
    // at-least-once replay of the SAME epoch must be a no-op
    assert(!StreamingOps.appendSnapshotBatch(batch, 7L, data, ledger))
    assert(spark.read.parquet(data).count() == n)
    assert(spark.read.parquet(ledger).count() == 1)
    // the next epoch still appends
    assert(StreamingOps.appendSnapshotBatch(batch, 8L, data, ledger))
    assert(spark.read.parquet(data).count() == 2 * n)
    // data rows carry their batch_id, so a write-without-commit crash
    // leaves attributable orphans recoverOrphanData can remove
    assert(spark.read.parquet(data).select("batch_id").distinct().count() == 2)
    assert(GtfsPipeline.recoverOrphanData(spark, data, ledger) == 0)
  }

  test("continuous processing-time trigger: one long-lived query fires repeated micro-batches") {
    val in = tmp("cont_in"); val data = tmp("cont_data")
    val ledger = tmp("cont_ledger"); val ckpt = tmp("cont_ckpt")
    val events = Tables(spark, sf0001).events
    val schema = events.schema

    events.filter(dayofmonth(col("ts")) === 1).write.mode("append").parquet(in)
    // the reference's cadence is "1 minute"; the spec shrinks the tick
    // so two real trigger firings happen in test time
    val q = StreamingOps.snapshotPipeline(spark, in, schema, data, ledger, ckpt,
      continuousEvery = Some("50 milliseconds"))
    try {
      q.processAllAvailable() // first firing drains day 1
      events.filter(dayofmonth(col("ts")) === 2).write.mode("append").parquet(in)
      q.processAllAvailable() // a later firing picks up the new files
      assert(q.isActive, "ProcessingTime query must keep running")
    } finally q.stop()

    val led = spark.read.parquet(ledger)
    assert(led.select("batch_id").distinct().count() >= 2,
      "expected at least two non-empty micro-batches from one query")
    assert(spark.read.parquet(data).count() ==
      events.filter(dayofmonth(col("ts")) <= 2).count())
  }
}
