package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.Det._

/** Operational / layout diagnostics for the 100 TB regime — the checks
  * an operator of a petabyte pipeline runs BEFORE a query melts an
  * executor, as first-class oracled queries:
  *
  *   - n52: per-key skew audit (the "will this join need salting?"
  *     question j11 answers reactively, asked proactively);
  *   - n53: Z-order file layout + min-max pruning audit (the reason a
  *     100 TB scan can read 1% of its files — the same footer min/max
  *     machinery `sources.GeoParquet` stamps for geometry, applied to
  *     sort-key file statistics).
  */
object ScaleOps {

  // ---------------------------------------------------------------------
  // n52: key-distribution skew audit
  // ---------------------------------------------------------------------

  /** Per-key count histogram in power-of-two buckets: for each bucket
    * b, the number of distinct keys whose row count c has
    * floor(log2(c)) = b, the rows they carry, and their share of the
    * table. The shape that tells you BEFORE a join whether the key is
    * salting-grade skewed (mass in high buckets) or well-spread.
    *
    * Scale shape: one partial-aggregated count per key (the shuffle any
    * keyed op pays anyway), then a second aggregation over KEYS (≪
    * rows) and a broadcast 1-row total. log2 boundaries land on powers
    * of two — exact in IEEE doubles, so floor() agrees across engines.
    */
  def keyHistogram(df: DataFrame, key: String): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("n_rows"))
    counts
      .select(floor(log2(col("cnt"))).as("bucket"), col("cnt"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("bucket_rows"))
      .crossJoin(broadcast(total))
      .select(col("bucket"),
        pow(lit(2.0), col("bucket")).cast("long").as("lo_cnt"),
        col("n_keys"), col("bucket_rows"),
        round6(col("bucket_rows").cast("double") / col("n_rows")).as("row_share"))
  }

  /** One-row skew summary: key count, row count, hottest-key load, the
    * max/mean ratio (the salting trigger — j11 fires when this is
    * large), and the share of rows on keys hotter than 2× the mean.
    * Library + spec form (the catalog hash-checks the histogram). */
  def skewSummary(df: DataFrame, key: String): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("n_rows"),
      max(col("cnt")).as("max_cnt"))
    counts.crossJoin(broadcast(stats))
      .agg(
        first(col("n_keys")).as("n_keys"),
        first(col("n_rows")).as("n_rows"),
        first(col("max_cnt")).as("max_cnt"),
        round6(first(col("max_cnt")) * first(col("n_keys")).cast("double") /
          first(col("n_rows"))).as("skew_ratio"),
        sum(when(col("cnt") * col("n_keys") > lit(2L) * col("n_rows"), col("cnt"))
          .otherwise(lit(0L))).as("hot_rows"))
      .select(col("n_keys"), col("n_rows"), col("max_cnt"), col("skew_ratio"),
        round6(col("hot_rows").cast("double") / col("n_rows")).as("hot_share"))
  }

  /** Catalog entry: the skew histogram of events.user_id — the fact
    * table's natural join key, exactly what j11's salted join would be
    * asked to defend against. */
  val skewAudit: Q = Q(
    "n52_skew_audit",
    s"""WITH counts AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id),
       |total AS (SELECT sum(cnt) AS n_rows FROM counts),
       |hist AS (SELECT CAST(floor(log2(cnt)) AS BIGINT) AS bucket,
       |                CAST(count(*) AS BIGINT) AS n_keys,
       |                CAST(sum(cnt) AS BIGINT) AS bucket_rows
       |         FROM counts GROUP BY 1)
       |SELECT bucket,
       |       CAST(pow(2.0, bucket) AS BIGINT) AS lo_cnt,
       |       n_keys, bucket_rows,
       |       ${round6Sql("CAST(bucket_rows AS DOUBLE) / n_rows")} AS row_share
       |FROM hist CROSS JOIN total
       |ORDER BY bucket""".stripMargin) { (s, dir) =>
    keyHistogram(Tables(s, dir).events, "user_id").orderBy("bucket")
  }

  // ---------------------------------------------------------------------
  // n53: Z-order layout + min-max pruning audit
  // ---------------------------------------------------------------------

  /** Bits per dimension in the interleave. NOTE the interleave reads
    * only the low ZBits of each key: keys ≥ 2^ZBits silently ALIAS
    * (hash-consistent across engines — both truncate identically — but
    * the z-curve's locality degrades, so layout quality drops without
    * an error). 16 bits cover the harness tables (l_partkey tops out
    * at 65535 around sf≈0.35); a production deployment quantizes wider
    * domains to ZBits first (rank- or range-quantization) or calls
    * [[assertZDomain]] so a too-wide domain fails loudly instead of
    * silently aliasing. */
  val ZBits = 16

  /** Fail loudly when a key column exceeds the interleave domain — one
    * cheap max() agg over the two key columns (keys-not-rows). Call
    * before [[zorderLayout]] at an untested scale factor. */
  def assertZDomain(df: DataFrame, x: String, y: String): Unit = {
    val row = df.agg(max(col(x)).as("mx"), max(col(y)).as("my")).head()
    val lim = 1L << ZBits
    // max() over an empty (or all-null) frame is null: no keys exist to
    // exceed the domain, so the layout is trivially safe — pass, don't NPE
    (Option(row.getAs[Number](0)), Option(row.getAs[Number](1))) match {
      case (Some(mxN), Some(myN)) =>
        val (mx, my) = (mxN.longValue, myN.longValue)
        require(mx < lim && my < lim,
          s"z-order keys exceed $ZBits-bit domain: max($x)=$mx, max($y)=$my, " +
            s"limit=$lim — quantize the keys or widen ZBits")
      case _ => ()
    }
  }

  /** Morton (Z-order) interleave of two non-negative keys, x on even
    * bits and y on odd bits — 2·ZBits output bits, built from shifts
    * and masks only so the whole expression stays inside whole-stage
    * codegen. Only the low ZBits of each key participate (see
    * [[ZBits]] on aliasing). */
  def zValue(x: Column, y: Column): Column =
    (0 until ZBits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** SQL twin of [[zValue]] — the identical shift/mask arithmetic as
    * DuckDB text, generated from the same bit loop so the two can
    * never drift. */
  def zValueSql(x: String, y: String): String =
    (0 until ZBits).flatMap { i =>
      Seq(s"((($x >> $i) & 1) << ${2 * i})", s"((($y >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" | ")

  /** The 100 TB layout path: range-partition by z-value into `nfiles`
    * output tasks and sort within each, so every written file covers a
    * tight z-range (⇒ tight min/max footer stats on BOTH dimensions).
    * Spark samples range boundaries (nondeterministic splits), which is
    * fine for a real sink but not for a hash oracle — the catalog entry
    * below uses an explicit ntile assignment instead and audits the
    * same per-file extents. */
  def zorderLayout(df: DataFrame, x: String, y: String, nfiles: Int): DataFrame = {
    val z = zValue(col(x), col(y)).as("z")
    df.withColumn("z", z).repartitionByRange(nfiles, col("z"))
      .sortWithinPartitions("z")
  }

  /** Per-file layout audit under a deterministic z-order assignment:
    * ntile(nfiles) over the total z order → per-file row count and
    * min/max extents of both dimensions, plus `hit` = whether a probe
    * range on x alone intersects the file's x-extent (the min-max
    * pruning decision a reader makes from footer stats — z-ordering is
    * WHY only a few files are hit even though the probe ignores y). */
  def zorderAudit(df: DataFrame, x: String, y: String, nfiles: Int,
      tieBreak: Seq[String], probeLo: Long, probeHi: Long): DataFrame = {
    val w = Window.orderBy(col("z") +: tieBreak.map(col): _*)
    df.withColumn("z", zValue(col(x), col(y)))
      .withColumn("file_id", ntile(nfiles).over(w).cast("long"))
      .groupBy("file_id")
      .agg(
        count(lit(1)).as("cnt"),
        min(col(x)).as("x_min"), max(col(x)).as("x_max"),
        min(col(y)).as("y_min"), max(col(y)).as("y_max"),
        min(col("z")).as("z_min"), max(col("z")).as("z_max"))
      .withColumn("hit", col("x_min") <= probeHi && col("x_max") >= probeLo)
  }

  private val NFiles = 32
  private val ProbeLo = 500L
  private val ProbeHi = 520L

  /** Catalog entry: z-order lineitem on (l_partkey, l_suppkey) into 32
    * files and audit the layout. The DuckDB twin recomputes the full
    * interleave with the generated shift/mask expression and the same
    * ntile assignment, so file boundaries, extents, and every pruning
    * decision are hash-checked. ZorderSpec holds the layout to its
    * point: the probe must prune most files here and nearly none under
    * the natural (orderkey) layout. */
  val zorderLineitem: Q = Q(
    "n53_zorder_layout",
    s"""WITH z AS (SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber,
       |                  ${zValueSql("l_partkey", "l_suppkey")} AS z
       |           FROM lineitem),
       |f AS (SELECT *, CAST(ntile($NFiles)
       |                       OVER (ORDER BY z, l_orderkey, l_linenumber) AS BIGINT) AS file_id
       |      FROM z)
       |SELECT file_id, CAST(count(*) AS BIGINT) AS cnt,
       |       min(l_partkey) AS x_min, max(l_partkey) AS x_max,
       |       min(l_suppkey) AS y_min, max(l_suppkey) AS y_max,
       |       min(z) AS z_min, max(z) AS z_max,
       |       (min(l_partkey) <= $ProbeHi AND max(l_partkey) >= $ProbeLo) AS hit
       |FROM f
       |GROUP BY file_id
       |ORDER BY file_id""".stripMargin) { (s, dir) =>
    zorderAudit(
      Tables(s, dir).lineitem
        .select("l_partkey", "l_suppkey", "l_orderkey", "l_linenumber"),
      "l_partkey", "l_suppkey", NFiles,
      Seq("l_orderkey", "l_linenumber"), ProbeLo, ProbeHi)
      .orderBy("file_id")
  }

  val all: Seq[Q] = Seq(skewAudit, zorderLineitem)
}
