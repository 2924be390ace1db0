package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Q, Tables}
import graft.Det._

/** Relational core: filter/project, global + grouped aggregation,
  * distinct aggregates, HAVING, rollup/cube/grouping sets, set ops,
  * sort/limit/top-k, CASE, scalar subquery.
  *
  * The reference's own surface is tiny (SURVEY.md §2: P1–P7 filters,
  * A1–A5 global aggregates, O1 top-1, U1 union-all); this catalog is the
  * general engine built over it. All aggregates over doubles go through
  * [[graft.Det]] so results are order-independent and hash-match DuckDB.
  */
object Relational {

  /** P1/P2/P3-style filter + projection with a computed column
    * (ref: gtfs_rt_assets.py:33-47). Pushed filters + pruned columns —
    * the scan must read only 6 of 11 lineitem columns. */
  val filterProject: Q = Q(
    "r01_filter_project",
    """SELECT l_orderkey, l_linenumber, l_quantity,
      |       l_extendedprice * (1 - l_discount) AS revenue
      |FROM lineitem
      |WHERE l_shipdate < TIMESTAMP '1997-09-01' AND l_returnflag = 'R'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    Tables(s, dir).lineitem
      .filter(col("l_shipdate") < lit("1997-09-01").cast("timestamp")
        && col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** A1/A2-style global min/max/count/sum in one pass
    * (ref: gtfs_rt_assets.py:160-168 bbox + :182 count). */
  val globalAgg: Q = Q(
    "r02_global_agg",
    """SELECT CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
      |       min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
      |       CAST(min(l_shipdate) AS TIMESTAMP) AS min_ship,
      |       CAST(max(l_shipdate) AS TIMESTAMP) AS max_ship
      |FROM lineitem""".stripMargin) { (s, dir) =>
    Tables(s, dir).lineitem.agg(
      count(lit(1)).as("n"),
      dsum(col("l_quantity")).as("sum_qty"),
      min(col("l_quantity")).as("min_qty"),
      max(col("l_quantity")).as("max_qty"),
      min(col("l_shipdate")).as("min_ship"),
      max(col("l_shipdate")).as("max_ship"))
  }

  /** TPC-H Q1-shaped grouped aggregation (partial + final hash agg). */
  val pricingSummary: Q = Q(
    "r03_pricing_summary",
    s"""SELECT l_returnflag, l_linestatus,
       |       ${dsumSql("l_quantity")} AS sum_qty,
       |       ${dsumSql("l_extendedprice")} AS sum_base,
       |       ${dsumSql("l_extendedprice * (1 - l_discount)")} AS sum_disc,
       |       ${davgSql("l_quantity")} AS avg_qty,
       |       CAST(count(*) AS BIGINT) AS n
       |FROM lineitem
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    Tables(s, dir).lineitem
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc"),
        davg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Exact COUNT(DISTINCT) per group (expands to two-phase agg). */
  val countDistinctQ: Q = Q(
    "r04_count_distinct",
    """SELECT o_orderstatus,
      |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
      |       CAST(count(*) AS BIGINT) AS n
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
    Tables(s, dir).orders
      .groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("n_cust"), count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
  }

  /** GROUP BY + HAVING on an exact mean. */
  val having: Q = Q(
    "r05_having",
    s"""SELECT l_suppkey, ${davgSql("l_quantity")} AS avg_qty,
       |       CAST(count(*) AS BIGINT) AS n
       |FROM lineitem
       |GROUP BY l_suppkey
       |HAVING ${davgSql("l_quantity")} > 25.5
       |ORDER BY l_suppkey""".stripMargin) { (s, dir) =>
    Tables(s, dir).lineitem
      .groupBy("l_suppkey")
      .agg(davg(col("l_quantity")).as("avg_qty"), count(lit(1)).as("n"))
      .filter(col("avg_qty") > 25.5)
      .orderBy("l_suppkey")
  }

  /** O1-style top-k without full sort → Catalyst TakeOrderedAndProject
    * (ref: gtfs_rt_assets.py:217-222 ORDER BY ... DESC LIMIT 1). */
  val topK: Q = Q(
    "r06_topk",
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 10""".stripMargin) { (s, dir) =>
    Tables(s, dir).orders
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
  }

  /** ROLLUP with subtotal rows made sort-stable via COALESCE. */
  val rollupQ: Q = Q(
    "r07_rollup",
    s"""SELECT coalesce(l_returnflag, 'ALL') AS rf,
       |       coalesce(l_linestatus, 'ALL') AS ls,
       |       ${dsumSql("l_quantity")} AS sum_qty,
       |       CAST(count(*) AS BIGINT) AS n
       |FROM lineitem
       |GROUP BY ROLLUP(l_returnflag, l_linestatus)
       |ORDER BY rf, ls""".stripMargin) { (s, dir) =>
    Tables(s, dir).lineitem
      .rollup("l_returnflag", "l_linestatus")
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("sum_qty"), col("n"))
      .orderBy("rf", "ls")
  }

  /** CUBE over two keys. */
  val cubeQ: Q = Q(
    "r08_cube",
    s"""SELECT coalesce(l_returnflag, 'ALL') AS rf,
       |       coalesce(l_linestatus, 'ALL') AS ls,
       |       CAST(count(*) AS BIGINT) AS n
       |FROM lineitem
       |GROUP BY CUBE(l_returnflag, l_linestatus)
       |ORDER BY rf, ls""".stripMargin) { (s, dir) =>
    Tables(s, dir).lineitem
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"))
      .orderBy("rf", "ls")
  }

  /** GROUPING SETS via Spark SQL over the parquet path directly. */
  val groupingSets: Q = Q(
    "r09_grouping_sets",
    s"""SELECT coalesce(l_returnflag, 'ALL') AS rf,
       |       coalesce(l_linestatus, 'ALL') AS ls,
       |       ${dsumSql("l_extendedprice")} AS sum_base
       |FROM lineitem
       |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
       |ORDER BY rf, ls""".stripMargin) { (s, dir) =>
    s.sql(
      s"""SELECT coalesce(l_returnflag, 'ALL') AS rf,
         |       coalesce(l_linestatus, 'ALL') AS ls,
         |       ${dsumSql("l_extendedprice")} AS sum_base
         |FROM parquet.`$dir/lineitem.parquet`
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         |ORDER BY rf, ls""".stripMargin)
  }

  /** U1 union-all across inputs (ref: gtfs_rt_assets.py:83-89). */
  val unionAll: Q = Q(
    "r10_union_all",
    """SELECT c_nationkey AS nk, 'cust' AS side FROM customer
      |UNION ALL
      |SELECT s_nationkey AS nk, 'supp' AS side FROM supplier
      |ORDER BY nk, side""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.customer.select(col("c_nationkey").as("nk"), lit("cust").as("side"))
      .unionByName(
        t.supplier.select(col("s_nationkey").as("nk"), lit("supp").as("side")))
      .orderBy("nk", "side")
  }

  /** UNION DISTINCT. */
  val unionDistinct: Q = Q(
    "r11_union_distinct",
    """SELECT c_nationkey AS nk FROM customer
      |UNION
      |SELECT s_nationkey AS nk FROM supplier
      |ORDER BY nk""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.customer.select(col("c_nationkey").as("nk"))
      .union(t.supplier.select(col("s_nationkey").as("nk")))
      .distinct()
      .orderBy("nk")
  }

  /** INTERSECT. */
  val intersectQ: Q = Q(
    "r12_intersect",
    """SELECT c_nationkey AS nk FROM customer
      |INTERSECT
      |SELECT s_nationkey AS nk FROM supplier
      |ORDER BY nk""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.customer.select(col("c_nationkey").as("nk"))
      .intersect(t.supplier.select(col("s_nationkey").as("nk")))
      .orderBy("nk")
  }

  /** EXCEPT. */
  val exceptQ: Q = Q(
    "r13_except",
    """SELECT c_nationkey AS nk FROM customer
      |EXCEPT
      |SELECT s_nationkey AS nk FROM supplier
      |ORDER BY nk""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.customer.select(col("c_nationkey").as("nk"))
      .except(t.supplier.select(col("s_nationkey").as("nk")))
      .orderBy("nk")
  }

  /** DISTINCT projection. */
  val distinctQ: Q = Q(
    "r14_distinct",
    """SELECT DISTINCT l_returnflag, l_linestatus
      |FROM lineitem
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    Tables(s, dir).lineitem
      .select("l_returnflag", "l_linestatus")
      .distinct()
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Multi-key sort with mixed direction + LIMIT. */
  val sortMulti: Q = Q(
    "r15_sort_multi",
    """SELECT o_orderkey, o_orderpriority, o_totalprice
      |FROM orders
      |ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin) { (s, dir) =>
    Tables(s, dir).orders
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
      .orderBy(col("o_orderpriority").asc, col("o_totalprice").desc,
        col("o_orderkey"))
      .limit(100)
  }

  /** CASE WHEN banding + grouped agg. */
  val caseWhen: Q = Q(
    "r16_case_when",
    s"""SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
       |            WHEN o_totalprice < 150000 THEN 'mid'
       |            ELSE 'high' END AS band,
       |       CAST(count(*) AS BIGINT) AS n,
       |       ${dsumSql("o_totalprice")} AS total
       |FROM orders
       |GROUP BY 1
       |ORDER BY band""".stripMargin) { (s, dir) =>
    Tables(s, dir).orders
      .groupBy(
        when(col("o_totalprice") < 50000, "low")
          .when(col("o_totalprice") < 150000, "mid")
          .otherwise("high").as("band"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy("band")
  }

  /** Scalar subquery: rows above the (exact) global mean. Spark side is
    * a broadcast single-row cross join — no collect() (100 TB stance). */
  val scalarSubquery: Q = Q(
    "r17_scalar_subquery",
    s"""SELECT o_orderkey, o_totalprice
       |FROM orders
       |WHERE o_totalprice > (SELECT ${davgSql("o_totalprice")} FROM orders)
       |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val o = Tables(s, dir).orders
    val thr = o.agg(davg(col("o_totalprice")).as("thr"))
    o.crossJoin(broadcast(thr))
      .filter(col("o_totalprice") > col("thr"))
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** A3's `?? 0` empty-sum semantics: COALESCE(SUM(...), 0) over an
    * empty filter result (ref: gtfs_rt_assets.py:188-190 `or 0`). */
  val sumCoalesceEmpty: Q = Q(
    "r18_sum_coalesce_empty",
    """SELECT CAST(coalesce(sum(CAST(l_quantity AS DECIMAL(25,6))), 0) AS DOUBLE) AS total,
      |       CAST(count(*) AS BIGINT) AS n
      |FROM lineitem
      |WHERE l_quantity < 0""".stripMargin) { (s, dir) =>
    Tables(s, dir).lineitem
      .filter(col("l_quantity") < 0)
      .agg(
        coalesce(sum(col("l_quantity").cast("decimal(25,6)")), lit(0))
          .cast("double").as("total"),
        count(lit(1)).as("n"))
  }

  val all: Seq[Q] = Seq(
    filterProject, globalAgg, pricingSummary, countDistinctQ, having, topK,
    rollupQ, cubeQ, groupingSets, unionAll, unionDistinct, intersectQ,
    exceptQ, distinctQ, sortMulti, caseWhen, scalarSubquery, sumCoalesceEmpty)
}
