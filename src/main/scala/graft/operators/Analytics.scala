package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.Det._

/** TPC-H-shaped analytical queries plus the remaining general-engine
  * surface: pivot, exact median, deterministic mode/array_agg/
  * string_agg, percent_rank/cume_dist, correlated subqueries,
  * string-distance functions. These exercise multi-join + agg + top-k
  * compositions the way a reference user's real workload would.
  */
object Analytics {

  /** Q3-shaped: unshipped-revenue top-10 (filter both sides of a
    * fact⋈fact join, aggregate, TakeOrdered). */
  val shippingPriority: Q = Q(
    "a01_shipping_priority",
    s"""SELECT l_orderkey,
       |       ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
       |       CAST(o_orderdate AS TIMESTAMP) AS o_orderdate
       |FROM customer
       |JOIN orders   ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-03-15'
       |  AND l_shipdate > TIMESTAMP '1996-03-15'
       |GROUP BY l_orderkey, o_orderdate
       |ORDER BY revenue DESC, l_orderkey
       |LIMIT 10""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.customer.filter(col("c_mktsegment") === "BUILDING")
      .join(t.orders, col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
      .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > lit("1996-03-15").cast("timestamp"))
      .groupBy("l_orderkey", "o_orderdate")
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Q5-shaped: local-supplier revenue per nation in one region. */
  val localSupplierVolume: Q = Q(
    "a02_local_supplier_volume",
    s"""SELECT n_name,
       |       ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue
       |FROM customer
       |JOIN orders   ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
       |JOIN nation   ON c_nationkey = n_nationkey
       |JOIN region   ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |GROUP BY n_name
       |ORDER BY n_name""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"))
      .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.supplier),
        col("l_suppkey") === col("s_suppkey")
          && col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy("n_name")
  }

  /** Q10-shaped: returned-item losses per customer, top 20. */
  val returnedItems: Q = Q(
    "a03_returned_items",
    s"""SELECT c_custkey, c_name, n_name,
       |       ${dsumSql("l_extendedprice * (1 - l_discount)")} AS lost_revenue
       |FROM customer
       |JOIN orders   ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |JOIN nation   ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |GROUP BY c_custkey, c_name, n_name
       |ORDER BY lost_revenue DESC, c_custkey
       |LIMIT 20""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"))
      .join(t.lineitem.filter(col("l_returnflag") === "R"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("lost_revenue"))
      .orderBy(col("lost_revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** Q17-shaped: correlated scalar subquery — lineitems far below their
    * part's mean quantity. Spark side decorrelates explicitly into a
    * per-part aggregate join (what Catalyst does to the SQL form). */
  val smallQuantityOrders: Q = Q(
    "a04_small_qty",
    s"""SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
       |       ${dsumSql("l_extendedprice")} AS revenue
       |FROM lineitem l1
       |WHERE l_quantity < (SELECT 0.5 * (CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) / count(*))
       |                    FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
       |GROUP BY l_partkey
       |ORDER BY l_partkey""".stripMargin) { (s, dir) =>
    val li = Tables(s, dir).lineitem
    val perPart = li.groupBy(col("l_partkey").as("pk"))
      .agg((lit(0.5) * davg(col("l_quantity"))).as("half_avg"))
    li.join(perPart, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < col("half_avg"))
      .groupBy("l_partkey")
      .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("revenue"))
      .orderBy("l_partkey")
  }

  /** Q18-shaped: large-volume orders via HAVING-backed semi join. */
  val largeOrders: Q = Q(
    "a05_large_orders",
    s"""WITH big AS (SELECT l_orderkey
       |             FROM lineitem GROUP BY l_orderkey
       |             HAVING sum(CAST(l_quantity AS DECIMAL(25,6))) > 150)
       |SELECT c_name, o_orderkey, o_totalprice
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |WHERE o_orderkey IN (SELECT l_orderkey FROM big)
       |ORDER BY o_totalprice DESC, o_orderkey
       |LIMIT 100""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val big = t.lineitem.groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("decimal(25,6)")).as("qty"))
      .filter(col("qty") > 150)
      .select("l_orderkey")
    t.orders
      .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .select("c_name", "o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** PIVOT: order counts per priority × status (fixed pivot values so
    * column sets are stable; oracle via conditional aggregation). */
  val pivotQ: Q = Q(
    "a06_pivot",
    """SELECT o_orderpriority,
      |       CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS f_cnt,
      |       CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS o_cnt,
      |       CAST(count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS p_cnt
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    Tables(s, dir).orders
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("o_orderpriority"), col("F").as("f_cnt"),
        col("O").as("o_cnt"), col("P").as("p_cnt"))
      .orderBy("o_orderpriority")
  }

  /** Exact median + interpolated quantile semantics per group. */
  val medianQ: Q = Q(
    "a07_median",
    """SELECT l_returnflag,
      |       median(l_quantity) AS med_qty,
      |       min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables(s, dir).lineitem
      .groupBy("l_returnflag")
      .agg(median(col("l_quantity")).as("med_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"))
      .orderBy("l_returnflag")
  }

  /** Deterministic mode (most frequent value, smallest wins ties) via
    * count + row_number — the reproducible form of mode(). */
  val modeQ: Q = Q(
    "a08_mode",
    """SELECT l_returnflag, l_quantity AS mode_qty
      |FROM (SELECT l_returnflag, l_quantity,
      |             row_number() OVER (PARTITION BY l_returnflag
      |                                ORDER BY count(*) DESC, l_quantity) AS rn
      |      FROM lineitem
      |      GROUP BY l_returnflag, l_quantity) t
      |WHERE rn = 1
      |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("cnt").desc, col("l_quantity"))
    Tables(s, dir).lineitem
      .groupBy("l_returnflag", "l_quantity")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_returnflag"), col("l_quantity").as("mode_qty"))
      .orderBy("l_returnflag")
  }

  /** Deterministic array_agg + string_agg (sorted collect). The array
    * is emitted joined to CSV so the driver's hash compare never
    * depends on list-vs-ndarray representation differences. */
  val arrayAgg: Q = Q(
    "a09_array_agg",
    """SELECT n_regionkey,
      |       CAST(len(list_sort(list(n_name))) AS BIGINT) AS n_nations,
      |       string_agg(n_name, ',' ORDER BY n_name) AS nation_csv
      |FROM nation
      |GROUP BY n_regionkey
      |ORDER BY n_regionkey""".stripMargin) { (s, dir) =>
    Tables(s, dir).nation
      .groupBy("n_regionkey")
      .agg(
        size(sort_array(collect_list(col("n_name")))).cast("long").as("n_nations"),
        array_join(sort_array(collect_list(col("n_name"))), ",").as("nation_csv"))
      .orderBy("n_regionkey")
  }

  /** percent_rank / cume_dist over a total order. */
  val percentRank: Q = Q(
    "a10_percent_rank",
    """SELECT s_suppkey, s_acctbal,
      |       percent_rank() OVER (ORDER BY s_acctbal, s_suppkey) AS pr,
      |       cume_dist()    OVER (ORDER BY s_acctbal, s_suppkey) AS cd
      |FROM supplier
      |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
    val w = Window.orderBy("s_acctbal", "s_suppkey")
    Tables(s, dir).supplier
      .select(col("s_suppkey"), col("s_acctbal"),
        percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd"))
      .orderBy("s_suppkey")
  }

  /** String-distance functions (identical DP semantics both engines). */
  val stringDistance: Q = Q(
    "a11_string_distance",
    """SELECT p_partkey,
      |       CAST(levenshtein(p_brand, p_type) AS BIGINT) AS lev,
      |       CAST(levenshtein(substr(p_name, 1, 10), p_brand) AS BIGINT) AS lev_name
      |FROM part
      |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    Tables(s, dir).part.select(
      col("p_partkey"),
      levenshtein(col("p_brand"), col("p_type")).cast("long").as("lev"),
      levenshtein(substring(col("p_name"), 1, 10), col("p_brand"))
        .cast("long").as("lev_name"))
      .orderBy("p_partkey")
  }

  /** Conditional aggregation (count_if / filtered sums). */
  val conditionalAgg: Q = Q(
    "a12_conditional_agg",
    s"""SELECT o_orderpriority,
       |       CAST(count(CASE WHEN o_totalprice > 200000 THEN 1 END) AS BIGINT) AS n_big,
       |       ${dsumSql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END")} AS f_total
       |FROM orders
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    Tables(s, dir).orders
      .groupBy("o_orderpriority")
      .agg(
        count(when(col("o_totalprice") > 200000, 1)).as("n_big"),
        dsum(when(col("o_orderstatus") === "F", col("o_totalprice"))
          .otherwise(0)).as("f_total"))
      .orderBy("o_orderpriority")
  }

  /** Q7-shaped: bilateral trade volume between two nations by year
    * (two aliased dimension joins + a symmetric pair predicate). */
  val nationVolume: Q = Q(
    "a13_nation_volume",
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |       CAST(year(l_shipdate) AS BIGINT) AS yr,
       |       ${dsumSql("l_extendedprice * (1 - l_discount)")} AS volume
       |FROM lineitem
       |JOIN orders   ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |WHERE (n1.n_name = 'FRANCE' AND n2.n_name = 'GERMANY')
       |   OR (n1.n_name = 'GERMANY' AND n2.n_name = 'FRANCE')
       |GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
       |ORDER BY supp_nation, cust_nation, yr""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val n1 = t.nation.select(col("n_nationkey").as("n1k"), col("n_name").as("supp_nation"))
    val n2 = t.nation.select(col("n_nationkey").as("n2k"), col("n_name").as("cust_nation"))
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1k"))
      .join(broadcast(n2), col("c_nationkey") === col("n2k"))
      .filter((col("supp_nation") === "FRANCE" && col("cust_nation") === "GERMANY")
        || (col("supp_nation") === "GERMANY" && col("cust_nation") === "FRANCE"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("yr"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("volume"))
      .orderBy("supp_nation", "cust_nation", "yr")
  }

  /** Q8-shaped market share: one nation's fraction of regional revenue
    * per year — a ratio of two exact sums over the same groups. */
  val marketShare: Q = Q(
    "a14_market_share",
    s"""WITH base AS (
       |  SELECT year(o_orderdate) AS yr,
       |         l_extendedprice * (1 - l_discount) AS vol,
       |         n_name
       |  FROM lineitem
       |  JOIN orders   ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation   ON c_nationkey = n_nationkey
       |  JOIN region   ON n_regionkey = r_regionkey
       |  WHERE r_name = 'EUROPE')
       |SELECT CAST(yr AS BIGINT) AS yr,
       |       ${dsumSql("CASE WHEN n_name = 'GERMANY' THEN vol ELSE 0 END")}
       |         / ${dsumSql("vol")} AS share
       |FROM base
       |GROUP BY yr
       |ORDER BY yr""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val base = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region.filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(year(col("o_orderdate")).cast("long").as("yr"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("vol"),
        col("n_name"))
    base.groupBy("yr")
      .agg((dsum(when(col("n_name") === "GERMANY", col("vol")).otherwise(0))
        / dsum(col("vol"))).as("share"))
      .orderBy("yr")
  }

  /** Q2-shaped: cheapest-supplier-per-part via a per-group min window
    * (the decorrelated form of the classic correlated min subquery). */
  val minCostSupplier: Q = Q(
    "a15_min_cost_supplier",
    """WITH shipped AS (
      |  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
      |ranked AS (
      |  SELECT l_partkey, s_suppkey, s_name, s_acctbal,
      |         min(s_acctbal) OVER (PARTITION BY l_partkey) AS min_bal
      |  FROM shipped JOIN supplier ON l_suppkey = s_suppkey)
      |SELECT l_partkey AS p_key, min(s_suppkey) AS suppkey, min_bal AS acctbal
      |FROM ranked
      |WHERE s_acctbal = min_bal
      |GROUP BY l_partkey, min_bal
      |ORDER BY p_key""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val shipped = t.lineitem.select("l_partkey", "l_suppkey").distinct()
    val w = Window.partitionBy("l_partkey")
    shipped
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .withColumn("min_bal", min(col("s_acctbal")).over(w))
      .filter(col("s_acctbal") === col("min_bal"))
      .groupBy(col("l_partkey").as("p_key"), col("min_bal").as("acctbal"))
      .agg(min(col("s_suppkey")).as("suppkey"))
      .select("p_key", "suppkey", "acctbal")
      .orderBy("p_key")
  }

  /** Q20-shaped: suppliers whose shipped volume of any single part
    * exceeds a threshold share of that part's total (nested agg +
    * semi join back to supplier). */
  val excessSuppliers: Q = Q(
    "a16_excess_suppliers",
    """WITH per AS (
      |  SELECT l_suppkey, l_partkey,
      |         sum(CAST(l_quantity AS DECIMAL(25,6))) AS sq
      |  FROM lineitem GROUP BY l_suppkey, l_partkey),
      |tot AS (
      |  SELECT l_partkey, sum(CAST(l_quantity AS DECIMAL(25,6))) AS tq
      |  FROM lineitem GROUP BY l_partkey),
      |heavy AS (
      |  SELECT DISTINCT l_suppkey FROM per JOIN tot USING (l_partkey)
      |  WHERE CAST(sq AS DOUBLE) > 0.5 * CAST(tq AS DOUBLE))
      |SELECT s_suppkey, s_name
      |FROM supplier
      |WHERE s_suppkey IN (SELECT l_suppkey FROM heavy)
      |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val per = t.lineitem.groupBy("l_suppkey", "l_partkey")
      .agg(sum(col("l_quantity").cast("decimal(25,6)")).as("sq"))
    val tot = t.lineitem.groupBy(col("l_partkey").as("tp"))
      .agg(sum(col("l_quantity").cast("decimal(25,6)")).as("tq"))
    val heavy = per.join(tot, col("l_partkey") === col("tp"))
      .filter(col("sq").cast("double") > lit(0.5) * col("tq").cast("double"))
      .select("l_suppkey").distinct()
    t.supplier
      .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
      .orderBy("s_suppkey")
  }

  val all: Seq[Q] = Seq(shippingPriority, localSupplierVolume, returnedItems,
    smallQuantityOrders, largeOrders, pivotQ, medianQ, modeQ, arrayAgg,
    percentRank, stringDistance, conditionalAgg, nationVolume, marketShare,
    minCostSupplier, excessSuppliers)
}
