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

  test("media ops: perceptual dedup groups recompressed copies via the facade") {
    import spark.implicits._
    val img = graft.operators.Multimodal.renderRaster(
      "the quick brown fox jumps over the lazy dog")
    val media = Seq(
      (1L, graft.operators.Netpbm.encodeP6(img, style = 0)),
      (2L, graft.operators.Netpbm.encodeP6(img, style = 1)), // re-encoded copy
      (3L, "junk, not an image".getBytes)) // undecodable: drops, no failure
      .toDF("doc_id", "media")
    val groups = media.perceptualDuplicateGroups().collect()
    assert(groups.length == 1)
    assert(groups.head.getAs[String]("members") == "1;2")
    assert(groups.head.getAs[Long]("representative") == 1L)
    assert(media.perceptualHashes().count() == 2)
  }

  test("curation model ops: trainBpe/tokenCounts and quality log-odds compose") {
    val docs = Tables(spark, sf0001).documents
    val merges = docs.trainBpe(nMerges = 5)
    assert(merges.length == 5)
    val counts = docs.bpeTokenCounts(merges)
    assert(counts.count() == docs.count())
    val model = docs.filter(col("doc_id") % 2 === 0).weakQualityModel()
    val scored = docs.qualityLogOdds(model)
    assert(scored.count() == docs.count())
    assert(scored.schema.fieldNames.toSet == Set("doc_id", "logodds"))
  }

  test("pq index ops: facade search equals the operator API") {
    val e = Tables(spark, sf0001).embeddings
    val q = e.filter(col("vec_id") < 8)
    val idx = e.buildPqIndex()
    val api = q.searchPqIndex(idx).select("q_id", "nb_id", "rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val op = graft.operators.Pq.searchPqIndex(q, idx).select("q_id", "nb_id", "rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(api == op && api.nonEmpty)
  }

  test("drift triggers: facade embeddingDrift/ivfCellSkew match the catalog entries") {
    import org.apache.spark.sql.functions.{transform => atransform, when => fwhen}
    val e = Tables(spark, sf0001).embeddings
    val edited = e.withColumn("embedding",
      fwhen(col("vec_id") % 8 === 5 && col("vec_id") >= 32,
        atransform(col("embedding"), x => -x)).otherwise(col("embedding")))
    // the general two-frame drift form equals n103's one-pass CASE
    // form on its row-aligned input (DECIMAL sums are order-free)
    val api = e.embeddingDrift(edited).collect().map(_.toSeq).toSet
    val entry = Catalog.queries("n103_embedding_drift")(spark, sf0001)
      .collect().map(_.toSeq).toSet
    assert(api == entry && api.nonEmpty)
    // skew facade: 8 cells, loads sum to the corpus, skew averages 1
    val anchors = e.filter(col("vec_id") % 2 === 0).orderBy("vec_id").limit(8)
      .select(col("vec_id").as("cell"), col("embedding").as("cv"))
    val skew = edited.ivfCellSkew(anchors).collect()
    assert(skew.length == 8)
    assert(skew.map(_.getAs[Long]("cnt")).sum == edited.count())
    val meanSkew = skew.map(_.getAs[Double]("skew")).sum / 8
    assert(math.abs(meanSkew - 1.0) < 0.01)
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
