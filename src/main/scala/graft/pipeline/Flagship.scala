package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The reference pipeline's flatten/enrich projection recast over the
  * events table (SURVEY.md §7.1 minimum slice): filter (P1 analog),
  * null-guarded projection (P2/P4), constant enrichment (P3), and the
  * time-bucket derivation (F2) that drives partitioned writes
  * (ref: gtfs_rt_assets.py:33-47,79,136-138).
  */
object Flagship {
  def entry(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .filter(col("event_type").isNotNull)
      .select(
        col("event_id"),
        col("ts"),
        col("user_id"),
        col("event_type"),
        when(col("value").isNotNull && col("user_id").isNotNull, col("value"))
          .as("value"),
        lit("events_feed").as("feed_id"),
        year(col("ts")).as("year"),
        month(col("ts")).as("month"),
        dayofmonth(col("ts")).as("day"),
        hour(col("ts")).as("hour"))
}
