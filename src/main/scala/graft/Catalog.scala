package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A named catalog query: the Spark-side builder plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. `oracle == None` ⇒ the op is not SQL-expressible (streaming,
  * engine-specific hashing, ...) and the driver records a weaker
  * rows-only check; correctness then lives in ScalaTest specs.
  */
final case class Q(
    name: String,
    oracle: Option[String],
    build: (SparkSession, String) => DataFrame)

object Q {
  def apply(name: String, oracle: String)(build: (SparkSession, String) => DataFrame): Q =
    Q(name, Some(oracle), build)
  def noOracle(name: String)(build: (SparkSession, String) => DataFrame): Q =
    Q(name, None, build)
}

/** Shared helpers that keep Spark results bit-identical to the DuckDB
  * oracle (SURVEY.md §7.4 #4 — determinism under the hash-compare
  * harness).
  *
  * The core trick: a distributed double-sum is order-dependent in its low
  * bits, so both engines cast to DECIMAL before summing (exact integer
  * arithmetic, order-independent) and cast the final value back to
  * DOUBLE. Per-row double arithmetic (products, comparisons) is IEEE-754
  * and identical in both engines, so it needs no protection.
  */
object Det {
  /** Exact distributed sum of a double column (order-independent). */
  def dsum(c: Column): Column = sum(c.cast("decimal(25,6)")).cast("double")
  /** SQL twin of [[dsum]]. */
  def dsumSql(expr: String): String =
    s"CAST(sum(CAST(($expr) AS DECIMAL(25,6))) AS DOUBLE)"

  /** Exact distributed mean of a double column. */
  def davg(c: Column): Column =
    (sum(c.cast("decimal(25,6)")).cast("double") / count(lit(1)))
  def davgSql(expr: String): String =
    s"(CAST(sum(CAST(($expr) AS DECIMAL(25,6))) AS DOUBLE) / count(*))"

  /** Portable 6-decimal rounding: floor(x·1e6 + 0.5)/1e6 — every step is
    * an exact IEEE-754 op, so Spark and DuckDB produce bit-identical
    * doubles (their native round() functions use different decimal
    * conversion paths and can disagree on landmine values). Use for any
    * float result whose accumulation error is far below 5e-7 (cosine
    * similarity, norms, ratios) — NOT for large multi-row sums, which
    * use the DECIMAL cast instead. */
  def round6(c: Column): Column = floor(c * 1000000d + 0.5d) / 1000000d
  def round6Sql(expr: String): String =
    s"(floor(($expr) * 1000000.0 + 0.5) / 1000000.0)"

  /** Epoch milliseconds of a (NTZ) timestamp under the UTC session —
    * twin of DuckDB's epoch_ms(). unix_millis only accepts LTZ, and the
    * harness tables are read as NTZ, so cast first (identity under UTC). */
  def epochMs(c: Column): Column = unix_millis(c.cast("timestamp"))

  /** Canonical normalized-content fingerprint (lowercase, whitespace
    * collapse, trim, md5) — the ONE definition shared by normalized
    * dedup, fingerprint sharding and the API facade so they can never
    * drift. SQL twin:
    * md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))). */
  def normFingerprint(c: Column): Column =
    md5(trim(regexp_replace(lower(c), "\\s+", " ")).cast("binary"))
}

/** The full operator catalog the driver measures (SparkEntry.queries). */
object Catalog {
  private def modules: Seq[Seq[Q]] = Seq(
    operators.Relational.all,
    operators.Analytics.all,
    operators.TpchMore.all,
    operators.Extras.all,
    operators.Joins.all,
    operators.Windows.all,
    functions.Scalars.all,
    operators.Dedup.all,
    operators.IncrementalDedup.all,
    operators.Corpus.all,
    operators.Similarity.all,
    operators.SemDedup.all,
    operators.Pq.all,
    operators.IncrementalAnn.all,
    operators.TextAnalysis.all,
    operators.LexIndex.all,
    operators.Selection.all,
    operators.Classifier.all,
    operators.Bpe.all,
    operators.ScaleOps.all,
    operators.SpanDedup.all,
    operators.LineDedup.all,
    operators.Multimodal.all,
    streaming.WindowedAggs.all,
    pipeline.PipelineQueries.all,
    pipeline.TrainingData.all,
  )

  lazy val all: Seq[Q] = {
    val qs = modules.flatten
    val dup = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"duplicate catalog query names: ${dup.mkString(",")}")
    qs
  }

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  lazy val oracles: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
