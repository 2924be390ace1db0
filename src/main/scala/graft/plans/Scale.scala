package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-out building blocks (SURVEY.md §7.0 100 TB stance): skew-safe
  * salted joins and bucketed co-located joins. These are the knobs a
  * 1000-executor deployment turns when AQE's automatic skew handling
  * isn't enough; ScaleSpec proves semantics match the plain join and
  * that bucketing removes the shuffle.
  */
object Scale {

  /** Skew-safe inner equi-join: left rows scatter across `buckets`
    * deterministic salt values (hash of a unique column, NOT rand() —
    * retries/resumes must be stable); the build side replicates to
    * every salt. Result set is identical to the unsalted join, but a
    * hot key's rows spread over `buckets` reducers instead of one.
    */
  def saltedJoin(
      left: DataFrame, leftKey: String, saltBy: String,
      right: DataFrame, rightKey: String,
      buckets: Int): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(col(saltBy)), lit(buckets)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(expr(s"sequence(0, ${buckets - 1})")))
    salted.join(replicated,
      salted(leftKey) === replicated(rightKey)
        && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** Write a bucketed+sorted table so later equi-joins on `key`
    * co-locate without a shuffle (Exchange-free sort-merge join). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int): Unit =
    writeBucketed(df, table, Seq(key), numBuckets)

  /** Multi-key variant: bucket+sort by the full composite join key
    * (e.g. the LSH band probe's (band, sig)) so the bucketing hash
    * matches the join's clustering exactly on every Spark version.
    * `location` makes the table EXTERNAL at `location/table` (the
    * catalog-entry path: data lands under an explicit directory, not
    * the session's default warehouse). */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      numBuckets: Int, location: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
    location.fold(w)(l => w.option("path", s"$l/$table")).saveAsTable(table)
  }

  /** Input-skew guard (round 15, guide §2.5): parquet reader
    * parallelism is row-group-bound, so a table written as one file
    * with one row group scans as ONE task no matter how many cores the
    * session has — and everything upstream of the first exchange
    * (shingling, tokenizing, sketch updates, wide aggregations) runs
    * single-threaded on it. That is the guide's "one huge unsplittable
    * file" input-skew case; the sanctioned fix when the source cannot
    * be rewritten is "repartition immediately after the read".
    *
    * Scale-adaptive by construction, not a local[32] constant: the
    * trigger compares the SCAN's actual partition count (physical
    * planning only — nothing executes) against the session's
    * parallelism. A production table (many files / many row groups)
    * already scans wide, the guard is a no-op, and no shuffle is
    * added; only a pathologically-laid-out input pays one round-robin
    * exchange of the projected rows. Deterministic: round-robin
    * repartition sorts its input first (SPARK-23207 semantics), and
    * every downstream consumer in this catalog is partition-order
    * invariant (PartitionInvarianceSpec). Callers hand in the
    * NARROWEST projection they need, so the exchange moves the proxy
    * columns, not the full row (guide §2.3). */
  def spreadScan(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target)
  }
}
