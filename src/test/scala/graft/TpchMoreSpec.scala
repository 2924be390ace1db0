package graft

import org.apache.spark.sql.functions.{col, lit}

/** Plan-shape assertions for the a17–a29 TPC-H-shaped suite (values
  * are oracle-checked by the driver; these pin the *plans*). */
class TpchMoreSpec extends SparkSpec {

  private def plan(name: String): String =
    Catalog.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  test("a18: all scan predicates reach the parquet reader") {
    val p = plan("a18_forecast_revenue")
    assert(p.contains("PushedFilters"))
    // shipdate bounds + discount + quantity all pushed
    assert(p.contains("l_shipdate") && p.contains("l_quantity"))
    assert(!p.toLowerCase.contains("cartesian"))
  }

  test("a17/a23: EXISTS and NOT EXISTS plan as semi/anti joins, not subquery loops") {
    val q4 = plan("a17_order_priority")
    assert(q4.contains("LeftSemi"), "Q4 EXISTS must be a semi join")
    val q21 = plan("a23_sole_returner")
    assert(q21.contains("LeftSemi") && q21.contains("LeftAnti"),
      "Q21 needs one semi and one anti join on the fact")
  }

  test("a24: threshold is a 1-row broadcast, inactivity an anti join") {
    val p = plan("a24_inactive_rich")
    assert(p.contains("LeftAnti"))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "scalar threshold should broadcast")
  }

  test("a19/a22: part dimension is broadcast against the fact") {
    assert(plan("a19_promo_share").contains("BroadcastHashJoin"))
    assert(plan("a22_bracket_revenue").contains("BroadcastHashJoin"))
  }

  test("a21: customers with only filtered-out orders still count as zero") {
    val rows = Catalog.queries("a21_order_distribution")(spark, sf0001).collect()
    val total = rows.map(_.getAs[Long]("custdist")).sum
    assert(total == Tables(spark, sf0001).customer.count(), "every customer binned once")
  }

  test("a26: all three dimensions broadcast; only the fact-fact join shuffles") {
    val p = plan("a26_product_profit")
    // part/supplier/nation ride BroadcastExchange; lineitem⋈orders is
    // the one key shuffle
    assert(p.contains("BroadcastExchange"))
    assert(!p.toLowerCase.contains("cartesianproduct"))
  }

  test("a28: exactly one supplier wins; scalar max rides a broadcast") {
    val p = plan("a28_top_supplier")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "max-revenue scalar should broadcast")
    val rows = Catalog.queries("a28_top_supplier")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // ties on the exact decimal max would all surface — with this data
    // the max is unique, and every surviving row carries that max
    val revs = rows.map(_.getAs[Double]("total_rev")).distinct
    assert(revs.length == 1)
  }

  test("a25: pricing summary bins every pre-cutoff line exactly once") {
    val rows = Catalog.queries("a25_pricing_summary")(spark, sf0001).collect()
    val binned = rows.map(_.getAs[Long]("count_order")).sum
    val expected = Tables(spark, sf0001).lineitem
      .filter(col("l_shipdate") <= lit("2001-08-01").cast("timestamp")).count()
    assert(binned == expected)
  }
}
