package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.Det._

/** The reference's data-quality queries (SURVEY.md §3.2, §7.1) recast
  * over the events table with a deterministic "now" (= max event ts,
  * so the oracle is reproducible): global sum A3, last-hour freshness
  * sum A4/P5, latest-row top-1 O1 (ref: gtfs_rt_assets.py:200-245).
  * The full pipeline (partitioned sink, ledger, anti-join orphan
  * check, assertions) runs in PipelineSpec / GtfsPipeline.
  */
object PipelineQueries {

  /** A3: global record/sum totals over the "ledger" (events stand-in),
    * with the `?? 0` coalesce semantics. */
  val globalTotals: Q = Q(
    "p01_global_totals",
    s"""SELECT CAST(count(*) AS BIGINT) AS n_records,
       |       CAST(coalesce(sum(CAST(value AS DECIMAL(25,6))), 0) AS DOUBLE) AS total_value
       |FROM events""".stripMargin) { (s, dir) =>
    Tables(s, dir).events.agg(
      count(lit(1)).as("n_records"),
      coalesce(sum(col("value").cast("decimal(25,6)")), lit(0))
        .cast("double").as("total_value"))
  }

  /** A4/P5: freshness — records within 1 hour of the dataset's max
    * timestamp (typed interval arithmetic; the reference's
    * localtime-vs-UTC string comparison bug is deliberately fixed,
    * SURVEY.md §4.3 #1–2). */
  val freshness: Q = Q(
    "p02_freshness",
    s"""WITH m AS (SELECT max(ts) AS mx FROM events)
       |SELECT CAST(count(*) AS BIGINT) AS n_fresh,
       |       ${dsumSql("value")} AS fresh_value
       |FROM events, m
       |WHERE ts >= mx - INTERVAL 1 HOUR""".stripMargin) { (s, dir) =>
    val e = Tables(s, dir).events
    val m = e.agg(max(col("ts")).as("mx"))
    e.crossJoin(broadcast(m))
      .filter(col("ts") >= col("mx") - expr("INTERVAL 1 HOUR"))
      .agg(count(lit(1)).as("n_fresh"), dsum(col("value")).as("fresh_value"))
  }

  /** O1: latest record (TakeOrderedAndProject, not a full sort). */
  val latest: Q = Q(
    "p03_latest",
    """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
      |FROM events
      |ORDER BY ts DESC, event_id DESC
      |LIMIT 1""".stripMargin) { (s, dir) =>
    Tables(s, dir).events
      .select(col("event_id"), col("ts"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
      .limit(1)
  }

  /** Per-hour "ledger" rows: the K1/K2 time-bucketed write recast as a
    * query — count + value bbox per hour bucket (A1 analog). */
  val hourlyLedger: Q = Q(
    "p04_hourly_ledger",
    s"""SELECT CAST(epoch_ms(date_trunc('hour', ts)) AS BIGINT) AS hour_ms,
       |       CAST(count(*) AS BIGINT) AS record_count,
       |       min(value) AS min_value, max(value) AS max_value
       |FROM events
       |GROUP BY 1
       |ORDER BY hour_ms""".stripMargin) { (s, dir) =>
    Tables(s, dir).events
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("record_count"),
        min(col("value")).as("min_value"), max(col("value")).as("max_value"))
      .select(epochMs(col("hour")).as("hour_ms"),
        col("record_count"), col("min_value"), col("max_value"))
      .orderBy("hour_ms")
  }

  val all: Seq[Q] = Seq(globalTotals, freshness, latest, hourlyLedger)
}
