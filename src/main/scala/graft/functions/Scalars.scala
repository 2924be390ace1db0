package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.Det._

/** Scalar-function catalog (SURVEY.md §2.8: F1–F7 plus the array/map/
  * JSON surface the reference lacks). All codegen'd builtins — no UDFs.
  *
  * Oracle-parity notes: only functions with identical semantics in both
  * engines are oracle-checked (ASCII string ops, IEEE math, epoch
  * arithmetic). JSON extraction is regexp-based in both engines so the
  * comparison never depends on a DuckDB extension being loadable.
  */
object Scalars {

  /** String functions over part (F5-adjacent). */
  val stringFuncs: Q = Q(
    "f01_string_funcs",
    """SELECT p_partkey,
      |       upper(p_name) AS uname,
      |       CAST(length(p_name) AS BIGINT) AS name_len,
      |       substr(p_name, 1, 8) AS prefix,
      |       p_brand || '|' || p_type AS brand_type,
      |       replace(p_type, ' ', '_') AS type_slug,
      |       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad
      |FROM part
      |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    Tables(s, dir).part.select(
      col("p_partkey"),
      upper(col("p_name")).as("uname"),
      length(col("p_name")).cast("long").as("name_len"),
      substring(col("p_name"), 1, 8).as("prefix"),
      concat(col("p_brand"), lit("|"), col("p_type")).as("brand_type"),
      regexp_replace(col("p_type"), " ", "_").as("type_slug"),
      lpad(col("p_size").cast("string"), 4, "0").as("size_pad"))
      .orderBy("p_partkey")
  }

  /** Date/time functions over orders (F1–F4). */
  val dateFuncs: Q = Q(
    "f02_date_funcs",
    """SELECT o_orderkey,
      |       CAST(year(o_orderdate) AS BIGINT) AS yr,
      |       CAST(month(o_orderdate) AS BIGINT) AS mo,
      |       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
      |       strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
      |       CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_ts,
      |       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    Tables(s, dir).orders.select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("yr"),
      month(col("o_orderdate")).cast("long").as("mo"),
      date_trunc("month", col("o_orderdate")).as("month_start"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("iso_day"),
      (col("o_orderdate") + expr("INTERVAL 30 DAY")).as("due_ts"),
      datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
        .cast("long").as("days_since"))
      .orderBy("o_orderkey")
  }

  /** JSON field extraction from events.props via regexp (identical RE
    * semantics both engines; avoids DuckDB's json extension). */
  val jsonExtract: Q = Q(
    "f03_json_extract",
    """SELECT event_id,
      |       CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS k
      |FROM events
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    Tables(s, dir).events.select(
      col("event_id"),
      regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1)
        .cast("long").as("k"))
      .orderBy("event_id")
  }

  /** Math functions (IEEE-exact ops raw; libm-backed ops via round6).
    * floor/ceil are BIGINT in Spark but DOUBLE in DuckDB — cast the
    * oracle to BIGINT so the driver's dtype-sensitive hash agrees
    * (values were already equal; round-1 f04 failed on dtype alone). */
  val mathFuncs: Q = Q(
    "f04_math_funcs",
    s"""SELECT o_orderkey,
       |       abs(o_totalprice - 100000) AS dist,
       |       CAST(floor(o_totalprice) AS BIGINT) AS fl,
       |       CAST(ceil(o_totalprice) AS BIGINT) AS ce,
       |       sqrt(o_totalprice) AS rt,
       |       ${round6Sql("ln(o_totalprice)")} AS log_price,
       |       CAST(o_orderkey % 7 AS BIGINT) AS mod7
       |FROM orders
       |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    Tables(s, dir).orders.select(
      col("o_orderkey"),
      abs(col("o_totalprice") - 100000).as("dist"),
      floor(col("o_totalprice")).as("fl"),
      ceil(col("o_totalprice")).as("ce"),
      sqrt(col("o_totalprice")).as("rt"),
      round6(log(col("o_totalprice"))).as("log_price"),
      (col("o_orderkey") % 7).as("mod7"))
      .orderBy("o_orderkey")
  }

  /** Higher-order array functions over embeddings: length, element
    * access, L2 norm via transform+fold in double precision. */
  val arrayFuncs: Q = Q(
    "f05_array_funcs",
    s"""SELECT vec_id,
       |       CAST(len(embedding) AS BIGINT) AS dim,
       |       CAST(embedding[1] AS DOUBLE) AS first_elem,
       |       ${round6Sql("sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x)))")} AS l2_norm
       |FROM embeddings
       |ORDER BY vec_id""".stripMargin) { (s, dir) =>
    Tables(s, dir).embeddings.select(
      col("vec_id"),
      size(col("embedding")).cast("long").as("dim"),
      element_at(col("embedding"), 1).cast("double").as("first_elem"),
      round6(sqrt(aggregate(
        transform(col("embedding"), x => x.cast("double") * x),
        lit(0.0), (acc, x) => acc + x))).as("l2_norm"))
      .orderBy("vec_id")
  }

  /** explode/unnest + word-frequency top-50. */
  val explodeWords: Q = Q(
    "f06_explode_words",
    """SELECT word, CAST(count(*) AS BIGINT) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
      |GROUP BY word
      |ORDER BY n DESC, word
      |LIMIT 50""".stripMargin) { (s, dir) =>
    Tables(s, dir).documents
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(50)
  }

  /** printf-style formatting (integer-only conversions — float
    * formatting rounds differently across engines). */
  val formatString: Q = Q(
    "f07_format_string",
    """SELECT p_partkey, printf('%s#%05d', p_brand, p_size) AS tag
      |FROM part
      |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    Tables(s, dir).part.select(
      col("p_partkey"),
      format_string("%s#%05d", col("p_brand"), col("p_size")).as("tag"))
      .orderBy("p_partkey")
  }

  /** Conditional null handling: nullif/coalesce/nvl2-style chains over
    * the P4 both-coordinates-present pattern (gtfs_rt_assets.py:122-127). */
  val nullHandling: Q = Q(
    "f08_null_handling",
    """SELECT event_id,
      |       coalesce(nullif(event_type, 'error'), 'bad') AS etype,
      |       CASE WHEN value IS NOT NULL AND user_id IS NOT NULL
      |            THEN value ELSE NULL END AS guarded_value
      |FROM events
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    Tables(s, dir).events.select(
      col("event_id"),
      coalesce(nullif(col("event_type"), lit("error")), lit("bad")).as("etype"),
      when(col("value").isNotNull && col("user_id").isNotNull, col("value"))
        .otherwise(lit(null)).as("guarded_value"))
      .orderBy("event_id")
  }

  /** HLL approximate distinct next to the exact count. The sketches are
    * engine-specific (Spark's HLL++ differs from DuckDB's), so the raw
    * estimate cannot be hash-compared — instead both engines emit the
    * exact count plus a boolean asserting the estimate sits within 3×
    * the documented rsd (5% default ⇒ 15% bound). DuckDB's boolean is
    * the constant the property must evaluate to; an out-of-bounds Spark
    * estimate flips the column and fails the hash match. */
  val approxDistinct: Q = Q(
    "f09_approx_distinct",
    """SELECT l_returnflag,
      |       CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
      |       TRUE AS approx_within_3rsd
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables(s, dir).lineitem
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        (abs(approx_count_distinct(col("l_partkey")) - countDistinct(col("l_partkey")))
          <= countDistinct(col("l_partkey")) * 0.15).as("approx_within_3rsd"))
      .orderBy("l_returnflag")
  }

  val all: Seq[Q] = Seq(stringFuncs, dateFuncs, jsonExtract, mathFuncs,
    arrayFuncs, explodeWords, formatString, nullHandling, approxDistinct)
}
