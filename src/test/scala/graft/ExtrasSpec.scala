package graft

import graft.operators.Extras

/** Extras-family library paths not covered by the oracle entries. */
class ExtrasSpec extends SparkSpec {

  test("correlationMatrix: fast double path agrees with the exact decimal path") {
    val li = Tables(spark, sf0001).lineitem
    def rows(exact: Boolean): Map[(String, String), Double] =
      Extras.correlationMatrix(li, Extras.CorrCols, exact = exact)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val e = rows(exact = true)
    val f = rows(exact = false)
    assert(e.keySet == f.keySet && e.size == 6)
    e.foreach { case (k, v) =>
      assert(math.abs(v - f(k)) <= 1e-6, s"$k: exact $v vs fast ${f(k)}")
      assert(v >= -1.0 && v <= 1.0, s"$k out of range: $v")
    }
  }

  test("correlationMatrix: a column correlates with itself-scaled at exactly 1") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = (1 to 100).map(i => (i.toDouble, i * 2.0 + 3.0, 101.0 - i))
      .toDF("a", "b", "c")
    val got = Extras.correlationMatrix(df, Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(math.abs(got(("a", "b")) - 1.0) < 1e-9, "perfect positive")
    assert(math.abs(got(("a", "c")) + 1.0) < 1e-9, "perfect negative")
  }

  test("correlationMatrix: prefix-colliding column names stay distinct (ADVICE r09)") {
    import spark.implicits._
    // "l_tax" and "tax" collided under the old stripPrefix("l_") alias
    // scheme; "a_b" vs "a"/"b" is the composite-name collision. Both
    // must produce correct per-pair answers.
    val df = (1 to 100).map(i =>
      (i.toDouble, 201.0 - 2 * i, i * 3.0, (i % 7).toDouble))
      .toDF("l_tax", "tax", "a_b", "a")
    val got = Extras.correlationMatrix(df, Seq("l_tax", "tax", "a_b", "a"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got.size == 6)
    assert(math.abs(got(("l_tax", "tax")) + 1.0) < 1e-9, "perfect negative")
    assert(math.abs(got(("l_tax", "a_b")) - 1.0) < 1e-9, "perfect positive")
    assert(math.abs(got(("l_tax", "a"))) < 0.3, "near-independent mod series")
  }
}
