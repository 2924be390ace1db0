package graft

import org.apache.spark.sql.functions._

/** The injected optimizer rule: provably-1-row join sides broadcast
  * even with size-based broadcasting disabled and no explicit hint. */
class TinyAggBroadcastSpec extends SparkSpec {
  import spark.implicits._

  private def withConf[A](pairs: (String, String)*)(f: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("unhinted scalar-threshold join broadcasts the 1-row aggregate side") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val fact = (1 to 5000).map(i => (i.toLong, i * 1.5)).toDF("id", "v")
      val threshold = fact.agg(avg(col("v")).as("thr")) // maxRows = 1
      val joined = fact.crossJoin(threshold).filter(col("v") > col("thr"))
      assert(joined.count() > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
        s"1-row side must broadcast, got:\n${plan.take(1500)}")
      assert(!plan.contains("CartesianProduct"),
        "without the rule this degenerates to a cartesian product")
    }
  }

  test("equi-join against a LIMIT 1 side broadcasts too") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val fact = (1 to 5000).map(i => (i.toLong % 10, i.toLong)).toDF("k", "x")
      val top = fact.orderBy(col("x").desc).limit(1)
        .select(col("k").as("tk"))
      val joined = fact.join(top, col("k") === col("tk"))
      assert(joined.count() > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"LIMIT 1 side must hash-broadcast, got:\n${plan.take(1500)}")
    }
  }

  test("explicit user hints are never overridden") {
    val a = (1 to 100).map(i => (i.toLong, i)).toDF("k", "x")
    val b = (1 to 100).map(i => (i.toLong, i)).toDF("bk", "y").limit(1)
    // user explicitly says merge-join the tiny side: rule must not touch it
    val joined = a.join(b.hint("merge"), col("k") === col("bk"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"),
      s"user hint must win, got:\n${plan.take(1200)}")
  }
}
