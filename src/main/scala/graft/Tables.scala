package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Accessors for the harness parquet tables (TESTDATA.md, FIXTURES.md §A).
  *
  * Plain `spark.read.parquet` scans: Catalyst gets filter pushdown + column
  * pruning for free, and at cluster scale these would be partitioned
  * directories rather than single files — nothing here assumes one file.
  */
final class Tables(val spark: SparkSession, val dir: String) {
  /** Footer/schema discovery runs once per (session, dir, table) — the
    * resolved DataFrame (immutable plan) is reused across the catalog's
    * 80+ queries instead of re-listing and re-inferring per query. */
  def table(name: String): DataFrame =
    Tables.cache.computeIfAbsent((spark, dir, name),
      _ => spark.read.parquet(s"$dir/$name.parquet"))

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")
  /** events.ts arrives as either parquet TIMESTAMP(NANOS) — which Spark's
    * reader rejects outright, so it is read as raw nanos (legacy conf) and
    * converted to µs — or, in later harness drops, native TIMESTAMP(MICROS)
    * that needs only the NTZ cast. Adapt on the RESOLVED schema, not an
    * assumed one: both shapes normalize to timestamp_ntz at µs, where
    * DuckDB agrees (FIXTURES.md §A). */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // ADVICE r06: the timestamp_ntz cast below reads the LTZ-resolved ts
    // through the SESSION time zone — a caller that never set it (a new
    // entry point, a bare spark-shell) would silently shift wall-clock
    // times if the harness ships TIMESTAMP(MICROS, adjustedToUTC=true).
    // Pin it here, next to the conf the same read path already requires,
    // so normalization never depends on caller session config.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = table("events")
    val tsIsLong = raw.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType
    if (tsIsLong)
      raw.withColumn("ts",
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
    else
      raw.withColumn("ts", col("ts").cast("timestamp_ntz"))
  }
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}

object Tables {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  /** True iff `df` is one of the stable per-(session,dir,table) frames
    * this cache returned — operator-level memoizers key on these. */
  private[graft] def isCanonical(df: DataFrame): Boolean =
    cache.values.stream().anyMatch(_ eq df)

  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)
}
