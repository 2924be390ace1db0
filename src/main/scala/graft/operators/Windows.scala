package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.Det._

/** Window-function surface (SURVEY.md §2.5 — the reference only has a
  * top-1-by-timestamp; the engine provides the standard catalog).
  *
  * Determinism: every window ORDER BY is made total with a unique key
  * tiebreak; windowed double sums go through the DECIMAL cast so frame
  * aggregation trees (DuckDB uses segment trees) cannot perturb low
  * bits. Rank-ish outputs are cast to BIGINT on both sides (Spark emits
  * INT, DuckDB BIGINT).
  */
object Windows {

  /** Per-group top-k via row_number (generalizes O1,
    * gtfs_rt_assets.py:217-222). */
  val rowNumberTopK: Q = Q(
    "w01_rownum_topk",
    """SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
      |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
      |             row_number() OVER (PARTITION BY o_orderpriority
      |                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |      FROM orders) t
      |WHERE rn <= 3
      |ORDER BY o_orderpriority, rn""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(s, dir).orders
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .orderBy("o_orderpriority", "rn")
  }

  /** rank vs dense_rank with genuine ties (integer p_size). */
  val rankDense: Q = Q(
    "w02_rank_dense",
    """SELECT p_brand, p_partkey, p_size,
      |       CAST(rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS BIGINT) AS rnk,
      |       CAST(dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS BIGINT) AS drnk
      |FROM part
      |ORDER BY p_brand, rnk, p_partkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("p_brand").orderBy(col("p_size").desc)
    Tables(s, dir).part
      .select(col("p_brand"), col("p_partkey"), col("p_size"))
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("drnk", dense_rank().over(w).cast("long"))
      .orderBy("p_brand", "rnk", "p_partkey")
  }

  /** lag/lead: inter-event gap per user in milliseconds. */
  val lagLead: Q = Q(
    "w03_lag_lead",
    """SELECT user_id, event_id,
      |       CAST(epoch_ms(ts) - epoch_ms(lag(ts) OVER w) AS BIGINT) AS gap_ms,
      |       CAST(epoch_ms(lead(ts) OVER w) - epoch_ms(ts) AS BIGINT) AS next_ms
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables(s, dir).events
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("gap_ms",
        epochMs(col("ts")) - epochMs(lag(col("ts"), 1).over(w)))
      .withColumn("next_ms",
        epochMs(lead(col("ts"), 1).over(w)) - epochMs(col("ts")))
      .drop("ts")
      .orderBy("user_id", "event_id")
  }

  /** Running sum over an explicit ROWS frame (DECIMAL-exact). */
  val runningSum: Q = Q(
    "w04_running_sum",
    """SELECT o_custkey, o_orderkey,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(25,6)))
      |            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |         AS running_total
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, dir).orders
      .select(col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast("decimal(25,6)")).over(w)
          .cast("double").as("running_total"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** RANGE frame over a numeric (epoch-ms) order key: count of the same
    * customer's orders in the preceding 30 days. Value-defined frames
    * are row-order independent ⇒ deterministic. */
  val rangeFrame: Q = Q(
    "w05_range_frame",
    """SELECT o_custkey, o_orderkey,
      |       CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY epoch_ms(o_orderdate)
      |                           RANGE BETWEEN 2592000000 PRECEDING AND CURRENT ROW) AS BIGINT)
      |         AS n_30d
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("o_custkey").orderBy(epochMs(col("o_orderdate")))
      .rangeBetween(-2592000000L, 0L)
    Tables(s, dir).orders
      .select(col("o_custkey"), col("o_orderkey"),
        count(lit(1)).over(w).as("n_30d"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** ntile quartiles over a total global order. */
  val ntileQ: Q = Q(
    "w06_ntile",
    """SELECT c_custkey, c_acctbal,
      |       CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile
      |FROM customer
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val w = Window.orderBy("c_acctbal", "c_custkey")
    Tables(s, dir).customer
      .select(col("c_custkey"), col("c_acctbal"),
        ntile(4).over(w).cast("long").as("quartile"))
      .orderBy("c_custkey")
  }

  /** first_value/last_value over a full frame with a total order —
    * the deterministic form of the reference's latest-row lookup (O1). */
  val firstLast: Q = Q(
    "w07_first_last",
    """SELECT user_id, first_ev, last_ev
      |FROM (SELECT user_id,
      |             first_value(event_id) OVER wf AS first_ev,
      |             last_value(event_id)  OVER wf AS last_ev,
      |             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |      FROM events
      |      WINDOW wf AS (PARTITION BY user_id ORDER BY ts, event_id
      |                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) t
      |WHERE rn = 1
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    val ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables(s, dir).events
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("first_ev", first(col("event_id")).over(full))
      .withColumn("last_ev", last(col("event_id")).over(full))
      .withColumn("rn", row_number().over(ord))
      .filter(col("rn") === 1)
      .select("user_id", "first_ev", "last_ev")
      .orderBy("user_id")
  }

  val all: Seq[Q] = Seq(rowNumberTopK, rankDense, lagLead, runningSum,
    rangeFrame, ntileQ, firstLast)
}
