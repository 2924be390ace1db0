package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.Det._

/** Remaining general-engine surface: outer explode, multiset set ops,
  * arg-max aggregation, nth_value, calendar-spine gap filling,
  * null-safe comparison/division, map functions. */
object Extras {

  /** explode_outer: rows with empty arrays survive with NULL (DuckDB
    * oracle models it by substituting [NULL] for empty lists). */
  val explodeOuter: Q = Q(
    "x01_explode_outer",
    """SELECT doc_id, word
      |FROM (SELECT doc_id,
      |             unnest(CASE WHEN len(l) = 0 THEN [NULL] ELSE l END) AS word
      |      FROM (SELECT doc_id,
      |                   list_filter(string_split(text, ' '), w -> w = 'spark') AS l
      |            FROM documents) t1) t2
      |ORDER BY doc_id, word NULLS FIRST""".stripMargin) { (s, dir) =>
    Tables(s, dir).documents
      .select(col("doc_id"),
        filter(split(col("text"), " "), w => w === "spark").as("l"))
      .select(col("doc_id"), explode_outer(col("l")).as("word"))
      .orderBy(col("doc_id"), col("word").asc_nulls_first)
  }

  /** INTERSECT ALL / EXCEPT ALL multiset semantics. */
  val multisetOps: Q = Q(
    "x02_multiset_ops",
    """WITH a AS (SELECT l_returnflag AS f FROM lineitem WHERE l_linenumber <= 2),
      |     b AS (SELECT l_returnflag AS f FROM lineitem WHERE l_linenumber >= 2),
      |     i AS (SELECT f FROM a INTERSECT ALL SELECT f FROM b),
      |     e AS (SELECT f FROM a EXCEPT ALL SELECT f FROM b)
      |SELECT 'intersect' AS op, f, CAST(count(*) AS BIGINT) AS n FROM i GROUP BY f
      |UNION ALL
      |SELECT 'except' AS op, f, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY f
      |ORDER BY op, f""".stripMargin) { (s, dir) =>
    val li = Tables(s, dir).lineitem
    val a = li.filter(col("l_linenumber") <= 2).select(col("l_returnflag").as("f"))
    val b = li.filter(col("l_linenumber") >= 2).select(col("l_returnflag").as("f"))
    val i = a.intersectAll(b).groupBy("f").agg(count(lit(1)).as("n"))
      .withColumn("op", lit("intersect"))
    val e = a.exceptAll(b).groupBy("f").agg(count(lit(1)).as("n"))
      .withColumn("op", lit("except"))
    i.unionByName(e).select("op", "f", "n").orderBy("op", "f")
  }

  /** Arg-max aggregation: each customer's latest order (max_by over a
    * composite sortable key — deterministic under date ties). */
  val latestPerGroup: Q = Q(
    "x03_max_by",
    """SELECT o_custkey,
      |       max_by(o_orderkey, epoch_ms(o_orderdate) * 100000 + o_orderkey) AS latest_order,
      |       max(o_orderdate) AS latest_date
      |FROM orders
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
    Tables(s, dir).orders
      .groupBy("o_custkey")
      .agg(
        max_by(col("o_orderkey"),
          epochMs(col("o_orderdate")) * 100000 + col("o_orderkey"))
          .as("latest_order"),
        max(col("o_orderdate")).as("latest_date"))
      .orderBy("o_custkey")
  }

  /** nth_value over a full frame: 2nd-highest price per priority. */
  val nthValue: Q = Q(
    "x04_nth_value",
    """SELECT DISTINCT o_orderpriority,
      |       nth_value(o_totalprice, 2)
      |         OVER (PARTITION BY o_orderpriority
      |               ORDER BY o_totalprice DESC, o_orderkey
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |         AS second_highest
      |FROM orders
      |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables(s, dir).orders
      .select(col("o_orderpriority"),
        nth_value(col("o_totalprice"), 2).over(w).as("second_highest"))
      .distinct()
      .orderBy("o_orderpriority")
  }

  /** Calendar-spine gap filling: every day in January 2024 with its
    * event count, zero-filled — rows generated from nothing
    * (sequence/generate_series) then left-joined. */
  val dateSpine: Q = Q(
    "x05_date_spine",
    """WITH spine AS (
      |  SELECT CAST(epoch_ms(d) AS BIGINT) AS day_ms
      |  FROM generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-31',
      |                       INTERVAL 1 DAY) t(d)),
      |daily AS (
      |  SELECT CAST(epoch_ms(date_trunc('day', ts)) AS BIGINT) AS day_ms,
      |         count(*) AS n
      |  FROM events GROUP BY 1)
      |SELECT s.day_ms, CAST(coalesce(n, 0) AS BIGINT) AS n
      |FROM spine s LEFT JOIN daily USING (day_ms)
      |ORDER BY day_ms""".stripMargin) { (s, dir) =>
    val spine = s.sql(
      """SELECT explode(sequence(to_timestamp('2024-01-01'),
        |                        to_timestamp('2024-01-31'),
        |                        interval 1 day)) AS d""".stripMargin)
      .select(epochMs(col("d")).as("day_ms"))
    val daily = Tables(s, dir).events
      .groupBy(epochMs(date_trunc("day", col("ts"))).as("day_ms"))
      .agg(count(lit(1)).as("n"))
    spine.join(daily, Seq("day_ms"), "left")
      .select(col("day_ms"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("day_ms")
  }

  /** Null-safe comparison (<=> / IS NOT DISTINCT FROM) and null-safe
    * division via NULLIF. */
  val nullSafeOps: Q = Q(
    "x06_null_safe",
    """SELECT event_id,
      |       (nullif(event_type, 'error') IS NOT DISTINCT FROM 'click') AS is_click,
      |       value / nullif(CAST(user_id % 5 AS DOUBLE), 0) AS safe_ratio
      |FROM events
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    Tables(s, dir).events
      .select(col("event_id"),
        (nullif(col("event_type"), lit("error")) <=> "click").as("is_click"),
        (col("value") / nullif((col("user_id") % 5).cast("double"), lit(0)))
          .as("safe_ratio"))
      .orderBy("event_id")
  }

  /** Map construction + access (map_from_arrays / element_at). DuckDB's
    * map subscript yields a one-element LIST (crashed the driver's
    * checker in round 1) — the oracle unwraps it with `[1]`. */
  val mapFuncs: Q = Q(
    "x07_map_funcs",
    """SELECT n_nationkey,
      |       array_to_string(map_keys(map(['key', 'region'], [n_nationkey, n_regionkey])), ',') AS ks_csv,
      |       map(['key', 'region'], [n_nationkey, n_regionkey])['region'][1] AS region_val
      |FROM nation
      |ORDER BY n_nationkey""".stripMargin) { (s, dir) =>
    val m = map_from_arrays(
      array(lit("key"), lit("region")),
      array(col("n_nationkey"), col("n_regionkey")))
    Tables(s, dir).nation
      .select(col("n_nationkey"),
        array_join(map_keys(m), ",").as("ks_csv"),
        element_at(m, "region").as("region_val"))
      .orderBy("n_nationkey")
  }

  /** posexplode / unnest WITH ORDINALITY (position-preserving
    * generator; DuckDB zips parallel unnests). */
  val posExplode: Q = Q(
    "x08_posexplode",
    """SELECT doc_id,
      |       CAST(unnest(generate_series(1, len(l))) AS BIGINT) AS pos,
      |       unnest(l) AS word
      |FROM (SELECT doc_id, string_split(text, ' ') AS l
      |      FROM documents WHERE doc_id < 20) t
      |ORDER BY doc_id, pos""".stripMargin) { (s, dir) =>
    Tables(s, dir).documents
      .filter(col("doc_id") < 20)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("word"))
      .orderBy("doc_id", "pos")
  }

  /** Fixed-width histogram via arithmetic bucketing (grouping rows
    * generated from a continuous measure). */
  val histogram: Q = Q(
    "x09_histogram",
    """SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
      |       CAST(count(*) AS BIGINT) AS n,
      |       min(o_totalprice) AS lo, max(o_totalprice) AS hi
      |FROM orders
      |GROUP BY 1
      |ORDER BY bucket""".stripMargin) { (s, dir) =>
    Tables(s, dir).orders
      .groupBy(floor(col("o_totalprice") / 50000.0).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
      .orderBy("bucket")
  }

  /** Second moments — sample variance/stddev and Pearson correlation —
    * rebuilt from DECIMAL-exact power sums so the distributed result is
    * order-independent (the builtin var_samp/corr accumulate doubles in
    * partition order and drift in low bits). */
  val momentsExact: Q = Q(
    "x10_moments",
    s"""SELECT l_returnflag,
       |       CAST(count(*) AS BIGINT) AS n,
       |       (${dsumSql("l_quantity * l_quantity")}
       |         - ${dsumSql("l_quantity")} * ${dsumSql("l_quantity")} / count(*))
       |         / (count(*) - 1) AS var_qty,
       |       (${dsumSql("l_quantity * l_extendedprice")}
       |         - ${dsumSql("l_quantity")} * ${dsumSql("l_extendedprice")} / count(*))
       |         / (count(*) - 1) AS cov_qty_price
       |FROM lineitem
       |GROUP BY l_returnflag
       |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    val n = count(lit(1))
    val sq = dsum(col("l_quantity"))
    val sp = dsum(col("l_extendedprice"))
    val sqq = dsum(col("l_quantity") * col("l_quantity"))
    val sqp = dsum(col("l_quantity") * col("l_extendedprice"))
    Tables(s, dir).lineitem
      .groupBy("l_returnflag")
      .agg(n.as("n"),
        ((sqq - sq * sq / n) / (n - 1)).as("var_qty"),
        ((sqp - sq * sp / n) / (n - 1)).as("cov_qty_price"))
      .orderBy("l_returnflag")
  }

  /** Ordered funnel analysis: users progressing click → view →
    * purchase in event-time order (each stage strictly after the
    * previous stage's FIRST occurrence). Three narrow aggregations
    * chained by per-user joins — the standard product-analytics shape;
    * at scale each stage shuffles only (user_id, ts) pairs. */
  val funnel: Q = Q(
    "x11_funnel",
    """WITH c AS (SELECT user_id, min(ts) AS c_ts FROM events
      |           WHERE event_type = 'click' GROUP BY user_id),
      |v AS (SELECT e.user_id, min(e.ts) AS v_ts
      |      FROM events e JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'view' AND e.ts > c.c_ts
      |      GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(e.ts) AS p_ts
      |      FROM events e JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'purchase' AND e.ts > v.v_ts
      |      GROUP BY e.user_id)
      |SELECT * FROM (
      |  SELECT 1 AS stage, 'click' AS name, CAST((SELECT count(*) FROM c) AS BIGINT) AS n_users
      |  UNION ALL
      |  SELECT 2, 'view_after_click', CAST((SELECT count(*) FROM v) AS BIGINT)
      |  UNION ALL
      |  SELECT 3, 'purchase_after_view', CAST((SELECT count(*) FROM p) AS BIGINT))
      |ORDER BY stage""".stripMargin) { (s, dir) =>
    val e = Tables(s, dir).events
    val c = e.filter(col("event_type") === "click")
      .groupBy("user_id").agg(min(col("ts")).as("c_ts"))
    val v = e.filter(col("event_type") === "view")
      .join(c, Seq("user_id")).filter(col("ts") > col("c_ts"))
      .groupBy("user_id").agg(min(col("ts")).as("v_ts"))
    val p = e.filter(col("event_type") === "purchase")
      .join(v, Seq("user_id")).filter(col("ts") > col("v_ts"))
      .groupBy("user_id").agg(min(col("ts")).as("p_ts"))
    def stage(n: Int, name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(n).as("stage"), lit(name).as("name"), col("n_users"))
    stage(1, "click", c)
      .unionByName(stage(2, "view_after_click", v))
      .unionByName(stage(3, "purchase_after_view", p))
      .orderBy("stage")
  }

  /** Exact interpolated quantiles per group, with the
    * Greenwald–Khanna summary (approx_percentile — rank error bounded
    * by N/accuracy, NOT a t-digest) held to a rank-error band the same
    * way f09 bounds HLL: the boolean column must be TRUE, so a sketch
    * estimate drifting outside the exact [q−0.01, q+0.01] quantile
    * envelope flips the bit and fails the oracle hash. Exact
    * percentile sorts within each (small) group; the sketch is the
    * 100 TB path — one pass, mergeable, no sort. All nine exact
    * quantiles come from ONE percentile aggregate (each extra exact
    * percentile expression buffers its own copy of every value). */
  val quantiles: Q = Q(
    "x12_quantiles",
    s"""SELECT l_returnflag,
       |       ${round6Sql("quantile_cont(l_extendedprice, 0.25)")} AS p25,
       |       ${round6Sql("quantile_cont(l_extendedprice, 0.50)")} AS p50,
       |       ${round6Sql("quantile_cont(l_extendedprice, 0.95)")} AS p95,
       |       TRUE AS sketch_within_band
       |FROM lineitem
       |GROUP BY l_returnflag
       |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    // one buffer for all nine exact quantiles: [band-lo, exact, band-hi]
    // triplets at 0.25 / 0.50 / 0.95
    val nine = expr(
      "percentile(l_extendedprice, array(0.24D, 0.25D, 0.26D, " +
        "0.49D, 0.50D, 0.51D, 0.94D, 0.95D, 0.96D))")
    val sketch = expr(
      "approx_percentile(l_extendedprice, array(0.25D, 0.50D, 0.95D), 10000)")
    Tables(s, dir).lineitem
      .groupBy("l_returnflag")
      .agg(nine.as("ex"), sketch.as("sk"))
      .select(col("l_returnflag"),
        round6(element_at(col("ex"), 2)).as("p25"),
        round6(element_at(col("ex"), 5)).as("p50"),
        round6(element_at(col("ex"), 8)).as("p95"),
        (element_at(col("sk"), 1).between(element_at(col("ex"), 1), element_at(col("ex"), 3)) &&
         element_at(col("sk"), 2).between(element_at(col("ex"), 4), element_at(col("ex"), 6)) &&
         element_at(col("sk"), 3).between(element_at(col("ex"), 7), element_at(col("ex"), 9)))
          .as("sketch_within_band"))
      .orderBy("l_returnflag")
  }

  /** Pairwise Pearson correlation matrix over numeric columns — the
    * column-profiling step a feature-audit runs before training. ONE
    * corpus pass computes every sufficient statistic (n, Σx, Σx², Σxy
    * for all pairs) in a single map-side-combinable aggregation; the
    * k(k−1)/2 pair rows then expand map-side from the 1-row frame (no
    * second scan, no per-pair jobs).
    *
    * `exact = true` (the catalog/oracle configuration) DECIMAL-casts
    * every sum — order-independent, bit-identical to DuckDB, and
    * measured ~17× the CPU of plain double sums (high-precision
    * Decimal accumulation leaves the compact-long fast path within
    * ~1 k rows of Σx² magnitude). `exact = false` is the PRODUCTION
    * profile path: plain double sums, codegen-fast, deterministic only
    * up to float reassociation — fine for profiling (correlations are
    * read at ~2 significant digits), not for hash-compared audits.
    * ExtrasSpec pins |fast − exact| ≤ 1e-6 on the harness table. */
  def correlationMatrix(df: org.apache.spark.sql.DataFrame, cols: Seq[String],
      exact: Boolean = true): org.apache.spark.sql.DataFrame = {
    require(cols.size >= 2, "correlation needs at least two columns")
    val idxPairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (i, j)
    def s(c: org.apache.spark.sql.Column) = if (exact) dsum(c) else sum(c)
    val n = count(lit(1)).cast("double")
    val aggs =
      cols.indices.map(i => s(col(cols(i))).as(sumName(i))) ++
        (for { i <- cols.indices; j <- cols.indices if i <= j }
          yield s(col(cols(i)) * col(cols(j))).as(sumName(i, j)))
    // input-skew guard (round 15, guide §2.5): 14 DECIMAL-cast sums
    // over every row are the query's whole cost, and a single-row-group
    // input scans as one task — spread the projected proxy columns so
    // the partial aggregation parallelizes; exact decimal sums are
    // partition-order invariant, so the result is bit-identical
    val stats = graft.plans.Scale.spreadScan(df.select(cols.map(col): _*))
      .agg(n.as("n"), aggs: _*)
    def corr(i: Int, j: Int) = round6(
      (col("n") * col(sumName(i, j)) - col(sumName(i)) * col(sumName(j))) /
        sqrt((col("n") * col(sumName(i, i)) - col(sumName(i)) * col(sumName(i))) *
          (col("n") * col(sumName(j, j)) - col(sumName(j)) * col(sumName(j)))))
    stats.select(explode(array(idxPairs.map { case (i, j) =>
      struct(lit(cols(i)).as("col_x"), lit(cols(j)).as("col_y"),
        corr(i, j).as("corr"))
    }: _*)).as("p"))
      .select(col("p.col_x").as("col_x"), col("p.col_y").as("col_y"),
        col("p.corr").as("corr"))
  }

  val CorrCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  val correlation: Q = {
    val cols = CorrCols
    val idxPairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (i, j)
    def corrSql(i: Int, j: Int) = round6Sql(
      s"(n * ${sumName(i, j)} - ${sumName(i)} * ${sumName(j)}) / " +
        s"sqrt((n * ${sumName(i, i)} - ${sumName(i)} * ${sumName(i)}) * " +
        s"(n * ${sumName(j, j)} - ${sumName(j)} * ${sumName(j)}))")
    Q(
      "x13_correlation",
      s"""WITH s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
         |${cols.indices.map(i => s"           ${dsumSql(cols(i))} AS ${sumName(i)},").mkString("\n")}
         |${(for { i <- cols.indices; j <- cols.indices if i <= j }
               yield s"           ${dsumSql(s"${cols(i)} * ${cols(j)}")} AS ${sumName(i, j)}")
               .mkString(",\n")}
         |           FROM lineitem)
         |${idxPairs.map { case (i, j) =>
             s"SELECT '${cols(i)}' AS col_x, '${cols(j)}' AS col_y, ${corrSql(i, j)} AS corr FROM s"
           }.mkString("\nUNION ALL\n")}
         |ORDER BY col_x, col_y""".stripMargin) { (s, dir) =>
      correlationMatrix(Tables(s, dir).lineitem, cols, exact = true)
        .orderBy("col_x", "col_y")
    }
  }

  /** Stable generated column name for Σx / Σxy sufficient stats —
    * keyed by COLUMN INDEX (ADVICE r09: the old stripPrefix("l_")
    * scheme silently collided for caller columns like "l_tax" vs
    * "tax", corrupting the generic-API answer). */
  private def sumName(is: Int*): String = "s_" + is.mkString("_")

  /** x14: distinct-per-window — the last sketch shape on the
    * DECISIONS round-4+ candidate list (f09 = grouped HLL, n35/n36 =
    * heavy hitters; this is the time-windowed axis a streaming audit
    * sweeps). Per (day, event_type): exact distinct users, plus the
    * f09-style banded BOOLEAN over approx_count_distinct — both
    * engines run their OWN HLL and each must land within the band, so
    * the hash attests the sketch's accuracy contract without
    * demanding cross-engine register equality. HLL++ merges are
    * max-of-registers (commutative, associative, idempotent), so the
    * estimate — and a fortiori the boolean — is partition-order
    * invariant, unlike approx_percentile's order-sensitive KLL (the
    * x12 caveat).
    *
    * Scale: one shuffle on (day, event_type); count(DISTINCT) adds
    * the standard expand — at 100 TB the production path drops the
    * exact arm and keeps the sketch (partial HLL merge, no expand),
    * which this entry's band certifies against. */
  val windowDistinct: Q = Q(
    "x14_window_distinct",
    s"""SELECT CAST(epoch_ms(date_trunc('day', ts)) AS BIGINT) AS wstart_ms,
       |       event_type,
       |       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       |       (abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
       |          <= count(DISTINCT user_id) * 0.15) AS approx_within_3rsd
       |FROM events
       |GROUP BY 1, 2
       |ORDER BY wstart_ms, event_type""".stripMargin) { (s, dir) =>
    Tables(s, dir).events
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        (abs(approx_count_distinct(col("user_id")) - countDistinct(col("user_id")))
          <= countDistinct(col("user_id")) * 0.15).as("approx_within_3rsd"))
      .select(epochMs(col("window.start")).as("wstart_ms"),
        col("event_type"), col("exact_users"), col("approx_within_3rsd"))
      .orderBy("wstart_ms", "event_type")
  }

  val all: Seq[Q] = Seq(explodeOuter, multisetOps, latestPerGroup, nthValue,
    dateSpine, nullSafeOps, mapFuncs, posExplode, histogram, momentsExact,
    funnel, quantiles, correlation, windowDistinct)
}
