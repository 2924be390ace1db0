package graft

import org.apache.spark.sql.functions._

/** Catalog-wide invariants + spot checks on hand-computable values. */
class CatalogSpec extends SparkSpec {

  test("catalog has unique names and every oracle key is a query") {
    assert(Catalog.all.map(_.name).distinct.size == Catalog.all.size)
    // regression floor: the round-7 catalog holds 177 entries; a
    // refactor that silently drops a family must fail here, not in
    // the driver's correctness gate
    assert(Catalog.all.size >= 177, s"catalog shrank to ${Catalog.all.size}")
    assert(Catalog.oracles.keySet.subsetOf(Catalog.queries.keySet))
  }

  test("every query runs on sf0.001 and is schema-stable across runs") {
    Catalog.all.foreach { q =>
      val a = q.build(spark, sf0001)
      val b = q.build(spark, sf0001)
      assert(a.schema == b.schema, s"${q.name} schema unstable")
    }
  }

  test("r02 global agg matches a direct computation") {
    val row = Catalog.queries("r02_global_agg")(spark, sf0001).head()
    val li = Tables(spark, sf0001).lineitem
    assert(row.getAs[Long]("n") == li.count())
    assert(row.getAs[Double]("min_qty") ==
      li.agg(min("l_quantity")).head().getDouble(0))
  }

  test("r06 topk equals sort prefix (O1 property, SURVEY §5.2)") {
    val top = Catalog.queries("r06_topk")(spark, sf0001)
      .select("o_orderkey").collect().map(_.getLong(0)).toSeq
    val full = Tables(spark, sf0001).orders
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select("o_orderkey").limit(10).collect().map(_.getLong(0)).toSeq
    assert(top == full)
  }

  test("r10 union-all cardinality = sum of parts (U1 property)") {
    val t = Tables(spark, sf0001)
    val n = Catalog.queries("r10_union_all")(spark, sf0001).count()
    assert(n == t.customer.count() + t.supplier.count())
  }

  test("approx_count_distinct stays within the 3-rsd bound the oracle checks") {
    Catalog.queries("f09_approx_distinct")(spark, sf0001).collect().foreach { r =>
      assert(r.getAs[Boolean]("approx_within_3rsd"),
        s"estimate out of bounds for ${r.getAs[String]("l_returnflag")}")
    }
  }

  test("deterministic: EVERY catalog query twice gives byte-identical rows") {
    // the driver hash-compares against DuckDB, so any nondeterminism
    // (unstable sort ties, accumulation order, cache interplay) is a
    // latent correctness failure — sweep the whole catalog at sf0.001
    val flaky = Catalog.all.flatMap { q =>
      val a = q.build(spark, sf0001).collect().map(_.toString).toSeq
      val b = q.build(spark, sf0001).collect().map(_.toString).toSeq
      if (a == b) None else Some(q.name)
    }
    assert(flaky.isEmpty, s"nondeterministic queries: ${flaky.mkString(", ")}")
  }
}
