package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.Det._

/** The rest of the TPC-H-shaped suite (a17–a24: Q4, Q6, Q14, Q12, Q13,
  * Q19, Q21, Q22 shapes), adapted to the harness schema — lineitem has
  * no commit/receipt dates, ship modes or containers, so each query
  * keeps the reference query's *plan shape* (the part that matters for
  * the engine) with predicates over the columns that exist. Joins
  * follow the PERF.md invariants: dims broadcast, facts shuffle on
  * their keys, EXISTS/NOT EXISTS as semi/anti joins.
  */
object TpchMore {

  /** Q4-shaped: order-priority distribution for orders with at least
    * one late-shipped line (EXISTS → left_semi on the fact). */
  val priorityCount: Q = Q(
    "a17_order_priority",
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.orders
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .join(t.lineitem,
        col("l_orderkey") === col("o_orderkey")
          && col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** Q6-shaped: forecast-revenue — a single scan whose predicates must
    * all reach the parquet reader (PushedFilters), then one global agg. */
  val forecastRevenue: Q = Q(
    "a18_forecast_revenue",
    s"""SELECT ${dsumSql("l_extendedprice * l_discount")} AS revenue,
       |       CAST(count(*) AS BIGINT) AS n_lines
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
       |  AND l_shipdate < TIMESTAMP '1998-01-01'
       |  AND l_discount BETWEEN 0.05 AND 0.07
       |  AND l_quantity < 24""".stripMargin) { (s, dir) =>
    Tables(s, dir).lineitem
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1998-01-01").cast("timestamp")
        && col("l_discount").between(0.05, 0.07)
        && col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** Q14-shaped: promo revenue share — conditional aggregation over a
    * fact ⋈ broadcast-dim join, one month of ship dates. */
  val promoShare: Q = Q(
    "a19_promo_share",
    s"""SELECT (100.0 * ${dsumSql(
         "CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
       |        / ${dsumSql("l_extendedprice * (1 - l_discount)")}) AS promo_pct
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE l_shipdate >= TIMESTAMP '1997-03-01'
       |  AND l_shipdate < TIMESTAMP '1997-04-01'""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.lineitem
      .filter(col("l_shipdate") >= lit("1997-03-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) *
        dsum(when(col("p_type") === "PROMO",
          col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(0)) /
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("promo_pct"))
  }

  /** Q12-shaped: late-line priority split per line status — the
    * high/low-priority conditional counts over a fact⋈fact join. */
  val shipmodePriority: Q = Q(
    "a20_late_priority",
    """SELECT l_linestatus,
      |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
      |  AND l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    t.orders.join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAY")
        && col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(isHigh, 1).otherwise(0)).cast("long").as("high_line_count"),
        sum(when(!isHigh, 1).otherwise(0)).cast("long").as("low_line_count"))
      .orderBy("l_linestatus")
  }

  /** Q13-shaped: distribution of orders-per-customer — left outer join
    * (customers with zero orders survive), two-level aggregation. */
  val custOrderDistribution: Q = Q(
    "a21_order_distribution",
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
      |FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      |      FROM customer LEFT JOIN orders
      |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |      GROUP BY c_custkey) t
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.customer
      .join(t.orders,
        col("c_custkey") === col("o_custkey")
          && col("o_orderpriority") =!= "1-URGENT", "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Q19-shaped: disjunctive bracket predicates — three OR'd
    * brand/size/quantity brackets that must still evaluate as one
    * hash join pass (no union-of-scans). */
  val bracketRevenue: Q = Q(
    "a22_bracket_revenue",
    s"""SELECT ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
       |       CAST(count(*) AS BIGINT) AS n_lines
       |FROM lineitem JOIN part ON p_partkey = l_partkey
       |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val bracket =
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 15)
        && col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#2" && col("p_size").between(1, 25)
        && col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(1, 35)
        && col("l_quantity").between(20, 30))
    t.lineitem.join(broadcast(t.part), col("p_partkey") === col("l_partkey"))
      .filter(bracket)
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** Q21-shaped: suppliers that were the only returner in multi-
    * supplier orders — EXISTS (another supplier in the order) AND NOT
    * EXISTS (another supplier who also returned) as semi + anti joins
    * on the fact table itself. */
  val soleReturner: Q = Q(
    "a23_sole_returner",
    """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |WHERE l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val li = t.lineitem
    val l1 = li.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_suppkey"))
    val l2 = li.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
    val l3 = li.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
    l1
      .join(l2, col("l_orderkey") === col("o2") && col("l_suppkey") =!= col("s2"),
        "left_semi")
      .join(l3, col("l_orderkey") === col("o3") && col("l_suppkey") =!= col("s3"),
        "left_anti")
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  /** Q22-shaped: well-funded "inactive" customers per country code
    * (custkey mod 7) — scalar-subquery threshold + NOT EXISTS anti
    * join. The harness generator gives every customer orders, so
    * "inactive" here means no urgent 1998 order (same anti-join plan,
    * non-empty answer). */
  val inactiveRich: Q = Q(
    "a24_inactive_rich",
    s"""SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
       |       ${dsumSql("c_acctbal")} AS totacctbal
       |FROM (SELECT CAST(c_custkey % 7 AS BIGINT) AS cntrycode, c_acctbal, c_custkey
       |      FROM customer
       |      WHERE c_custkey % 7 IN (1, 3, 5)
       |        AND c_acctbal > (SELECT ${davgSql("c_acctbal")} FROM customer
       |                         WHERE c_acctbal > 0 AND c_custkey % 7 IN (1, 3, 5))) t
       |WHERE NOT EXISTS (SELECT 1 FROM orders
       |                  WHERE o_custkey = c_custkey
       |                    AND o_orderpriority = '1-URGENT'
       |                    AND o_orderdate >= TIMESTAMP '1998-01-01')
       |GROUP BY cntrycode
       |ORDER BY cntrycode""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val inCodes = (col("c_custkey") % 7).isin(1, 3, 5)
    val threshold = t.customer
      .filter(col("c_acctbal") > 0 && inCodes)
      .agg(davg(col("c_acctbal")).as("thr"))
    val urgent98 = t.orders
      .filter(col("o_orderpriority") === "1-URGENT"
        && col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    t.customer.filter(inCodes)
      .crossJoin(broadcast(threshold))
      .filter(col("c_acctbal") > col("thr"))
      .join(urgent98, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy((col("c_custkey") % 7).cast("long").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy("cntrycode")
  }

  /** Q1-shaped: the pricing summary — full-scan grouped decimal sums,
    * the canonical map-side-combinable aggregation. */
  val pricingSummary: Q = Q(
    "a25_pricing_summary",
    s"""SELECT l_returnflag, l_linestatus,
       |       ${dsumSql("l_quantity")} AS sum_qty,
       |       ${dsumSql("l_extendedprice")} AS sum_base_price,
       |       ${dsumSql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
       |       ${dsumSql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
       |       CAST(count(*) AS BIGINT) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2001-08-01'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    Tables(s, dir).lineitem
      .filter(col("l_shipdate") <= lit("2001-08-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Q9-shaped: product-type profit by nation and year (no partsupp in
    * the harness schema, so supply cost is proxied from p_retailprice —
    * the plan shape is the point: fact ⋈ two broadcast dims ⋈ fact,
    * grouped decimal sums over an expression of both sides). */
  val productProfit: Q = Q(
    "a26_product_profit",
    s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |       ${dsumSql(
            "l_extendedprice * (1 - l_discount) - 0.5 * p_retailprice * l_quantity")} AS sum_profit
       |FROM lineitem
       |JOIN part ON p_partkey = l_partkey
       |JOIN supplier ON s_suppkey = l_suppkey
       |JOIN nation ON n_nationkey = s_nationkey
       |JOIN orders ON o_orderkey = l_orderkey
       |WHERE p_name LIKE '%widget%'
       |GROUP BY n_name, year(o_orderdate)
       |ORDER BY nation, o_year""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.lineitem
      .join(broadcast(t.part.filter(col("p_name").contains("widget"))),
        col("p_partkey") === col("l_partkey"))
      .join(broadcast(t.supplier), col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(t.nation), col("n_nationkey") === col("s_nationkey"))
      .join(t.orders, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))
        - lit(0.5) * col("p_retailprice") * col("l_quantity")).as("sum_profit"))
      .orderBy("nation", "o_year")
  }

  /** Q11-shaped: important stock — per-part value vs a global
    * threshold (grouped agg + broadcast scalars). The inputs (value,
    * total) are decimal-exact sums cast to DOUBLE; the threshold
    * comparison itself runs in DOUBLE space in BOTH engines with the
    * same left-to-right order (total × 1.25, then ÷ np — the 1.25 is
    * an explicit DOUBLE in the SQL twin so DuckDB can't pick a DECIMAL
    * multiply), so the two sides are bit-identical IEEE ops, not
    * "decimal-exact" end to end. The cut is scale-free — parts worth
    * more than 1.25× the mean part value (the synthetic values are
    * near-uniform, max ≈ 1.75× mean, so this keeps roughly the top
    * decile) — and doesn't collapse to empty as the part count grows
    * (Q11's fixed fraction would). */
  val importantStock: Q = Q(
    "a27_important_stock",
    s"""WITH v AS (SELECT l_partkey,
       |                  ${dsumSql("l_extendedprice * (1 - l_discount)")} AS value
       |           FROM lineitem GROUP BY l_partkey),
       |t AS (SELECT ${dsumSql("l_extendedprice * (1 - l_discount)")} AS total
       |      FROM lineitem),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS np FROM v)
       |SELECT l_partkey, value
       |FROM v, t, n
       |WHERE value > total * CAST(1.25 AS DOUBLE) / np
       |ORDER BY value DESC, l_partkey""".stripMargin) { (s, dir) =>
    val li = Tables(s, dir).lineitem
    val v = li.groupBy("l_partkey")
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("value"))
    val t = li.agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
      .as("total"))
    val n = v.agg(count(lit(1)).as("np"))
    v.crossJoin(broadcast(t)).crossJoin(broadcast(n))
      .filter(col("value") > col("total") * lit(1.25) / col("np"))
      .select("l_partkey", "value")
      .orderBy(col("value").desc, col("l_partkey"))
  }

  /** Q15-shaped: top supplier — quarterly revenue per supplier, kept
    * where revenue equals the global max (broadcast scalar equality on
    * decimal-exact sums — the view-based original, subquery-free). */
  val topSupplier: Q = Q(
    "a28_top_supplier",
    s"""WITH rev AS (SELECT l_suppkey,
       |                    ${dsumSql("l_extendedprice * (1 - l_discount)")} AS total_rev
       |             FROM lineitem
       |             WHERE l_shipdate >= TIMESTAMP '1997-01-01'
       |               AND l_shipdate < TIMESTAMP '1997-04-01'
       |             GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, total_rev
       |FROM supplier JOIN rev ON s_suppkey = l_suppkey
       |WHERE total_rev = (SELECT max(total_rev) FROM rev)
       |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val rev = t.lineitem
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("total_rev"))
    val mx = rev.agg(max(col("total_rev")).as("mx"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_rev") === col("mx"))
      .join(broadcast(t.supplier), col("s_suppkey") === col("l_suppkey"))
      .select("s_suppkey", "s_name", "total_rev")
      .orderBy("s_suppkey")
  }

  /** Q16-shaped: parts/supplier relationship — distinct-supplier counts
    * per (brand, size) with an excluded brand, ordered by count. */
  val partsSuppliers: Q = Q(
    "a29_parts_suppliers",
    """SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
      |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM part JOIN lineitem ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#13' AND p_size <= 25
      |GROUP BY p_brand, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.lineitem
      .join(broadcast(t.part.filter(col("p_brand") =!= "Brand#13"
        && col("p_size") <= 25)), col("p_partkey") === col("l_partkey"))
      .groupBy("p_brand", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .select(col("p_brand"), col("p_size").cast("long").as("p_size"),
        col("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
  }

  val all: Seq[Q] = Seq(priorityCount, forecastRevenue, promoShare,
    shipmodePriority, custOrderDistribution, bracketRevenue, soleReturner,
    inactiveRich, pricingSummary, productProfit, importantStock,
    topSupplier, partsSuppliers)
}
