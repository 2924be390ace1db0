package graft

import graft.api.Graft._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** User-facing API facade + SparkSessionExtensions registration. */
class ApiSpec extends SparkSpec {

  test("document ops compose: dedup -> dropNearDuplicates shrinks corpus") {
    val docs = Tables(spark, sf0001).documents
    val pairs = docs.nearDuplicates(threshold = 0.6)
    val n = pairs.count()
    assert(n > 0)
    val cleaned = docs.dropNearDuplicates(threshold = 0.6)
    assert(cleaned.count() < docs.count())
    // cleaned corpus has no remaining near-dup pair at the threshold
    assert(cleaned.nearDuplicates(threshold = 0.6).count() == 0)
  }

  test("distinctDocuments is idempotent") {
    val docs = Tables(spark, sf0001).documents
    val once = docs.distinctDocuments()
    assert(once.distinctDocuments().count() == once.count())
  }

  test("cosineTopK API matches the catalog query") {
    val e = Tables(spark, sf0001).embeddings
    val api = e.cosineTopK(e.filter(col("vec_id") < 32), k = 5)
      .orderBy("q_id", "rn").collect().toSeq
    val cat = Catalog.queries("n10_cosine_topk")(spark, sf0001).collect().toSeq
    assert(api == cat)
  }

  test("GraftExtensions: custom functions resolve in a fresh session via SQL") {
    val active = SparkSession.getActiveSession
    try {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        "SELECT st_x(st_point(CAST(3.5 AS DOUBLE), CAST(1.0 AS DOUBLE))) AS x").head()
      assert(r.getDouble(0) == 3.5)
    } finally {
      active.foreach { s =>
        SparkSession.setActiveSession(s)
        SparkSession.setDefaultSession(s)
      }
    }
  }
}
