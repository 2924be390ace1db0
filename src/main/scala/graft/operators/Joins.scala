package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.Det._

/** Join matrix (SURVEY.md §2.3 — absent in the reference, full surface in
  * the engine): broadcast/shuffled equi joins of every type, multi-way
  * star join, theta join, scale-safe range join (bucketed, not
  * nested-loop), and an as-of join expressed as union + window
  * (SURVEY.md §7.3) with DuckDB's native ASOF JOIN as the oracle.
  *
  * Scale stance: dimension tables (region/nation/supplier/customer) are
  * broadcast explicitly; fact⋈fact joins shuffle on their keys and are
  * AQE-eligible. The range join avoids the O(n²) BroadcastNestedLoopJoin
  * plan by equi-joining on a time bucket (candidate pairs bounded).
  */
object Joins {

  /** Broadcast star: customer ⋈ nation ⋈ region, grouped by region. */
  val broadcastStar: Q = Q(
    "j01_broadcast_star",
    s"""SELECT r_name, CAST(count(*) AS BIGINT) AS n_cust,
       |       ${dsumSql("c_acctbal")} AS acctbal
       |FROM customer
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name
       |ORDER BY r_name""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("acctbal"))
      .orderBy("r_name")
  }

  /** Fact ⋈ fact equi join (shuffle on l_orderkey/o_orderkey; AQE picks
    * broadcast when the build side is small enough). */
  val factJoin: Q = Q(
    "j02_fact_join",
    s"""SELECT o_orderpriority,
       |       ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
       |       CAST(count(*) AS BIGINT) AS n
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
  }

  /** 5-way star join: lineitem⋈orders⋈customer⋈nation⋈region. */
  val star5Way: Q = Q(
    "j03_star_5way",
    s"""SELECT r_name, o_orderstatus,
       |       ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue
       |FROM lineitem
       |JOIN orders   ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation   ON c_nationkey = n_nationkey
       |JOIN region   ON n_regionkey = r_regionkey
       |GROUP BY r_name, o_orderstatus
       |ORDER BY r_name, o_orderstatus""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "o_orderstatus")
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy("r_name", "o_orderstatus")
  }

  /** LEFT OUTER join + grouped agg with COALESCE on the null side. */
  val leftJoin: Q = Q(
    "j04_left_join",
    """SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders,
      |       CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(25,6))), 0) AS DOUBLE) AS total
      |FROM customer
      |LEFT JOIN orders ON o_custkey = c_custkey
      |GROUP BY c_custkey
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.customer
      .join(t.orders, col("o_custkey") === col("c_custkey"), "left")
      .groupBy("c_custkey")
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(col("o_totalprice").cast("decimal(25,6)")), lit(0))
          .cast("double").as("total"))
      .orderBy("c_custkey")
  }

  /** LEFT SEMI join (EXISTS). */
  val semiJoin: Q = Q(
    "j05_semi_join",
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.customer
      .join(t.orders.filter(col("o_orderstatus") === "F"),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** LEFT ANTI join (NOT EXISTS) — the reference's orphan-file FK check
    * shape (SURVEY.md §2.3; gtfs_rt_assets.py:225-226). */
  val antiJoin: Q = Q(
    "j06_anti_join",
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.customer
      .join(t.orders, col("o_custkey") === col("c_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** FULL OUTER join of two aggregated sides. */
  val fullOuter: Q = Q(
    "j07_full_outer",
    """WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_cust
      |           FROM customer GROUP BY c_nationkey),
      |     s AS (SELECT s_nationkey AS nk, count(*) AS n_supp
      |           FROM supplier GROUP BY s_nationkey)
      |SELECT coalesce(c.nk, s.nk) AS nk,
      |       CAST(coalesce(n_cust, 0) AS BIGINT) AS n_cust,
      |       CAST(coalesce(n_supp, 0) AS BIGINT) AS n_supp
      |FROM c FULL OUTER JOIN s ON c.nk = s.nk
      |ORDER BY nk""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val c = t.customer.groupBy(col("c_nationkey").as("cnk"))
      .agg(count(lit(1)).as("n_cust"))
    val sp = t.supplier.groupBy(col("s_nationkey").as("snk"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(sp, col("cnk") === col("snk"), "full_outer")
      .select(
        coalesce(col("cnk"), col("snk")).as("nk"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy("nk")
  }

  /** Theta join (equi + residual inequality): nation pairs per region. */
  val thetaJoin: Q = Q(
    "j08_theta_join",
    """SELECT a.n_name AS n1, b.n_name AS n2
      |FROM nation a
      |JOIN nation b ON a.n_regionkey = b.n_regionkey
      |             AND a.n_nationkey < b.n_nationkey
      |ORDER BY n1, n2""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val a = t.nation.select(
      col("n_nationkey").as("k1"), col("n_name").as("n1"),
      col("n_regionkey").as("r1"))
    val b = t.nation.select(
      col("n_nationkey").as("k2"), col("n_name").as("n2"),
      col("n_regionkey").as("r2"))
    a.join(b, col("r1") === col("r2") && col("k1") < col("k2"))
      .select("n1", "n2")
      .orderBy("n1", "n2")
  }

  /** Range join: event pairs within 5 s of each other.
    *
    * Scale path: equi join on a 5 s time bucket (each right row probes
    * its own bucket and both neighbors) then residual |Δt| ≤ 5000 ms —
    * candidate pairs stay bounded instead of the O(n²) nested loop a
    * naive theta join would plan. Each qualifying pair matches exactly
    * one (bucketA = explodedB) combination, so no dedup is needed.
    * Oracle: DuckDB plans the same predicate as an IEJoin. */
  val rangeJoin: Q = Q(
    "j09_range_join",
    """SELECT a.event_id AS id1, b.event_id AS id2,
      |       CAST(epoch_ms(b.ts) - epoch_ms(a.ts) AS BIGINT) AS dt_ms
      |FROM events a
      |JOIN events b ON a.event_id < b.event_id
      |             AND abs(epoch_ms(b.ts) - epoch_ms(a.ts)) <= 5000
      |ORDER BY id1, id2""".stripMargin) { (s, dir) =>
    val e = Tables(s, dir).events
      .select(col("event_id"), graft.Det.epochMs(col("ts")).as("ms"))
    val a = e.select(
      col("event_id").as("id1"), col("ms").as("ms1"),
      floor(col("ms") / 5000L).as("bucket"))
    val b = e.select(
      col("event_id").as("id2"), col("ms").as("ms2"),
      explode(sequence(floor(col("ms") / 5000L) - 1,
        floor(col("ms") / 5000L) + 1)).as("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id1") < col("id2")
        && abs(col("ms2") - col("ms1")) <= 5000L)
      .select(col("id1"), col("id2"), (col("ms2") - col("ms1")).as("dt_ms"))
      .orderBy("id1", "id2")
  }

  /** As-of join: each purchase matched to the latest click of the same
    * user at or before it. Spark has no built-in; implemented as
    * union + running `last(..., ignoreNulls)` window (SURVEY.md §7.3) —
    * one shuffle on user_id, no join blowup, scales linearly. Oracle:
    * DuckDB's native ASOF LEFT JOIN. Only click_ts is emitted (not the
    * click id) so same-timestamp click ties cannot make the result
    * nondeterministic. */
  val asofJoin: Q = Q(
    "j10_asof_join",
    """SELECT p.event_id, p.user_id,
      |       CAST(p.ts AS TIMESTAMP) AS purchase_ts,
      |       CAST(c.ts AS TIMESTAMP) AS click_ts
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.event_id""".stripMargin) { (s, dir) =>
    val e = Tables(s, dir).events
    val clicks = e.filter(col("event_type") === "click").select(
      col("user_id"), col("ts"), lit(0).as("kind"),
      lit(null).cast("long").as("event_id"), col("ts").as("cts"))
    val purchases = e.filter(col("event_type") === "purchase").select(
      col("user_id"), col("ts"), lit(1).as("kind"),
      col("event_id"), lit(null).cast("timestamp_ntz").as("cts"))
    // clicks sort before purchases at equal ts (kind 0 < 1) ⇒ frame
    // includes same-timestamp clicks, matching ASOF's `>=`.
    val w = Window.partitionBy("user_id").orderBy("ts", "kind")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("click_ts", last(col("cts"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("event_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("click_ts"))
      .orderBy("event_id")
  }

  /** Skew-safe salted join in the measured catalog: identical result
    * set to the plain join (the oracle), but hot keys spread across 8
    * salt buckets (graft.plans.Scale) — AQE handles moderate skew on
    * its own; this is the explicit-control path for pathological keys. */
  val saltedJoinQ: Q = Q(
    "j11_salted_join",
    s"""SELECT s_name, CAST(count(*) AS BIGINT) AS n,
       |       ${dsumSql("l_quantity")} AS qty
       |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       |GROUP BY s_name
       |ORDER BY s_name""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    graft.plans.Scale.saltedJoin(
      t.lineitem.select("l_suppkey", "l_orderkey", "l_quantity"), "l_suppkey",
      "l_orderkey", t.supplier.select("s_suppkey", "s_name"), "s_suppkey",
      buckets = 8)
      .groupBy("s_name")
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
      .orderBy("s_name")
  }

  /** The NATIVE as-of join (custom LogicalPlan + SparkStrategy +
    * merge-join BinaryExecNode, graft.plans.AsOfJoin) on the same
    * purchases-to-latest-click task — checked against the same DuckDB
    * ASOF oracle as j10, so the custom physical operator is held to
    * the exact same answer as the builtin-only rewrite. */
  val asofNative: Q = Q(
    "j12_asof_native",
    """SELECT p.event_id, p.user_id,
      |       CAST(p.ts AS TIMESTAMP) AS purchase_ts,
      |       CAST(c.ts AS TIMESTAMP) AS click_ts
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.event_id""".stripMargin) { (s, dir) =>
    val e = Tables(s, dir).events
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    graft.plans.AsOfJoin.asof(purchases, clicks,
      "user_id", "c_user", "ts", "c_ts")
      .select(col("event_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("c_ts").as("click_ts"))
      .orderBy("event_id")
  }

  val all: Seq[Q] = Seq(broadcastStar, factJoin, star5Way, leftJoin,
    semiJoin, antiJoin, fullOuter, thetaJoin, rangeJoin, asofJoin,
    saltedJoinQ, asofNative)
}
