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

  test("nearDuplicatesCapped facade: wide cap equals the st29 entry; a binding cap only drops pairs") {
    val docs = Tables(spark, sf0001).documents
    val wide = docs.nearDuplicatesCapped(threshold = 0.6, maxBucket = 64)
      .orderBy("d1", "d2").collect().toSeq
    val cat = Catalog.queries("st29_stream_neardup_capped")(spark, sf0001)
      .collect().toSeq
    assert(wide == cat)
    // a binding cap never invents pairs and never changes a jac value
    val capped = docs.nearDuplicatesCapped(threshold = 0.6, maxBucket = 2)
      .collect().toSeq
    assert(capped.toSet.subsetOf(wide.toSet))
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

  test("psi + ndcg facades match the n107/n108 catalog entries") {
    import org.apache.spark.sql.functions.{transform => atransform, when => fwhen}
    val e = Tables(spark, sf0001).embeddings
    // the general two-frame PSI form equals n107's one-pass three-side
    // form on its row-aligned edits (bins/smoothing/rounding shared)
    def edit(pred: org.apache.spark.sql.Column,
        f: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      e.withColumn("embedding",
        fwhen(pred, atransform(col("embedding"), f)).otherwise(col("embedding")))
    val negated = edit(col("vec_id") % 8 === 5 && col("vec_id") >= 32, x => -x)
    val shifted = edit(col("vec_id") % 3 === 2 && col("vec_id") >= 32,
      x => x + lit(1.0f))
    val entry = Catalog.queries("n107_psi_drift")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    def facadeOf(cur: org.apache.spark.sql.DataFrame) =
      e.psiDrift(cur).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val (negF, shiftF) = (facadeOf(negated), facadeOf(shifted))
    entry.foreach { case (ed, dim, psi) =>
      val got = if (ed == "negate") negF(dim) else shiftF(dim)
      // the shift edit adds 1.0 in FLOAT in the lane's convention but
      // the entry bins the DOUBLE sum; both land in the same 0.25-wide
      // bin for every representable float, so the counts — and the
      // PSI — are identical
      assert(got == psi, s"$ed dim $dim: facade $got vs entry $psi")
    }
    // ndcg facade == n108, and a ranking equal to the ideal scores 1.0
    import spark.implicits._
    val docs = Tables(spark, sf0001).documents
    val queries = graft.operators.TextAnalysis.bm25QuerySet.toDF("q_id", "term")
    val api = docs.bm25Ndcg(queries, 10).collect().map(_.toSeq).toSet
    val n108 = Catalog.queries("n108_ndcg_eval")(spark, sf0001)
      .collect().map(_.toSeq).toSet
    assert(api == n108 && api.nonEmpty)
    val rel = graft.operators.TextAnalysis.cappedTfRelevance(docs, queries)
    val wI = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("rel").desc, col("doc_id"))
    val ideal = rel.withColumn("rank",
      org.apache.spark.sql.functions.row_number().over(wI).cast("long"))
      .select("q_id", "doc_id", "rank")
    graft.operators.TextAnalysis.ndcgAtK(ideal, rel, 10).collect()
      .foreach(r => assert(r.getAs[Double]("ndcg") == 1.0,
        s"ideal ranking must score exactly 1.0, got $r"))
  }

  test("hybridTopK facade fuses exactly the n110 rrf system's ranking") {
    import spark.implicits._
    val t = Tables(spark, sf0001)
    val queries = graft.operators.TextAnalysis.bm25QuerySet.toDF("q_id", "term")
    val qIds = graft.operators.TextAnalysis.bm25QuerySet.map(_._1).distinct
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "cand", "rrf", "rrf_rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSet
    val api = rows(t.documents.hybridTopK(queries, t.embeddings))
    // reference: n110's rrf system rebuilt from the catalog operators
    val lex = graft.operators.TextAnalysis.bm25TopK(t.documents, queries, 10)
      .select(col("q_id"), col("doc_id").as("cand"), col("rank").as("r"))
    val sem = graft.operators.Pq.searchPqIndex(
        t.embeddings.filter(col("vec_id").isin(qIds: _*)),
        graft.operators.Pq.buildAccumulatedIndex(t.embeddings))
      .select(col("q_id"), col("nb_id").as("cand"), col("rn").as("r"))
    val ref = rows(graft.operators.Similarity.rrfFuse(lex, sem, 10))
    assert(api == ref && api.nonEmpty, s"api ${api.size} vs ref ${ref.size}")
    // non-vacuity: the semantic arm actually moved the fused ranking
    val lexOrder = lex.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(api.map(r => (r._1, r._2, r._4)) != lexOrder,
      "fused ranking must differ from the lexical arm alone")
  }

  test("lastClickAttribution facade equals the st28 oracled entry") {
    import graft.api.Graft._
    val t = Tables(spark, sf0001)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "user_id", "purchase_ts", "click_ts", "p_value")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.get(2).toString,
          r.get(3).toString, r.getDouble(4))).toSet
    val api = rows(t.events.lastClickAttribution())
    val ref = rows(Catalog.queries("st28_attribution_lastclick")(spark, sf0001))
    assert(api == ref && api.nonEmpty, s"api ${api.size} vs st28 ${ref.size}")
  }

  test("tenant-scoped hybridTopK pre-filters BOTH arms (n111's facade form)") {
    import spark.implicits._
    val t = Tables(spark, sf0001)
    val queries = graft.operators.TextAnalysis.bm25QuerySet.toDF("q_id", "term")
    val qIds = graft.operators.TextAnalysis.bm25QuerySet.map(_._1).distinct
    val allowed = t.embeddings.filter(col("label") % 5 === 2)
      .select(col("vec_id").as("doc_id"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "cand", "rrf", "rrf_rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSet
    val api = rows(t.documents.hybridTopK(queries, t.embeddings, allowed, 10))
    // reference from the public ops: tenant-filtered corpus BM25
    // (tenant-scoped stats by construction) + shared-config PQ with
    // codes semi-filtered to the tenant
    val lex = graft.operators.TextAnalysis.bm25TopK(
        t.documents.join(allowed, Seq("doc_id"), "left_semi"), queries, 10)
      .select(col("q_id"), col("doc_id").as("cand"), col("rank").as("r"))
    val sem = graft.operators.Pq.searchPqIndex(
        t.embeddings.filter(col("vec_id").isin(qIds: _*)),
        graft.operators.Pq.filterPqIndex(
          graft.operators.Pq.buildAccumulatedIndex(t.embeddings),
          allowed.select(col("doc_id").as("vec_id"))))
      .select(col("q_id"), col("nb_id").as("cand"), col("rn").as("r"))
    val ref = rows(graft.operators.Similarity.rrfFuse(lex, sem, 10))
    assert(api == ref && api.nonEmpty, s"api ${api.size} vs ref ${ref.size}")
    // the filter is real: every fused candidate is in-tenant
    val tenant = allowed.collect().map(_.getLong(0)).toSet
    assert(api.forall(r => tenant.contains(r._2)),
      "an out-of-tenant candidate leaked through a fusion arm")
    // and the unfiltered facade would have served out-of-tenant
    // candidates (non-vacuity of the leak check)
    val unfiltered = rows(t.documents.hybridTopK(queries, t.embeddings))
    assert(unfiltered.exists(r => !tenant.contains(r._2)),
      "non-vacuity: the unfiltered ranking must contain out-of-tenant ids")
  }

  test("packShards/takedownPackedShards facade drives the n112 store end-to-end") {
    import spark.implicits._
    import graft.api.Graft._
    val base = java.nio.file.Files.createTempDirectory("api_packed").toString
    val docs = Seq(
      (1L, "sA", "alpha beta gamma"),
      (2L, "sA", "delta epsilon zeta"),
      (3L, "sB", "to be forgotten")).toDF("doc_id", "source", "text")
    docs.packShards(base, blockLen = 4L)
    val n = docs.takedownPackedShards(base, Seq(3L).toDF("doc_id"), 4L)
    assert(n == 1L, s"one shard affected, got $n")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("source", "example_idx", "block_fp", "block_text")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
          r.getString(3))).toSet
    val store = rows(graft.operators.Corpus.readPackedShards(spark, base))
    assert(store == rows(graft.operators.Corpus.tokenBlocks(
      docs.filter(col("doc_id") =!= 3L), 4L, withText = true)) &&
      store.nonEmpty,
      "facade store must equal a fresh pack of the live corpus")
    assert(!store.exists(_._4.contains("forgotten")),
      "the taken-down doc's tokens must be gone")
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
