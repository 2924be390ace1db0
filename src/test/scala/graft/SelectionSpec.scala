package graft

import org.apache.spark.sql.functions._
import graft.operators.Selection

/** Semantic checks for the data-selection family (n73–n76) beyond the
  * DuckDB hash oracles: DSIR prefers target-like documents, the CCNet
  * buckets order by LM score within language, the epoch shuffle is a
  * reproducible permutation, and soft-dedup weights conserve mass. */
class SelectionSpec extends SparkSpec {

  private lazy val docs = Tables(spark, sf0001).documents

  test("DSIR: selection is K distinct docs and favors the target slice") {
    val sel = Selection.dsir(docs, docs.filter(col("lang") === "en"), 100)
      .collect()
    assert(sel.length == 100)
    val ids = sel.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length == 100, "sampling is without replacement")
    // mean log-importance-weight of target-lang docs exceeds the rest:
    // the hashed-ngram distributions separate en from non-en
    val lamByLang = Selection.dsir(docs, docs.filter(col("lang") === "en"),
        Int.MaxValue)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy(col("lang") === "en")
      .agg(avg("lam")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(lamByLang(true) > lamByLang(false),
      s"target-slice mean lam ${lamByLang(true)} should exceed ${lamByLang(false)}")
    // and the selected set is en-enriched vs the corpus base rate
    val enRate = docs.filter(col("lang") === "en").count().toDouble / docs.count()
    val selEn = docs.filter(col("doc_id").isin(ids.toSeq: _*))
      .filter(col("lang") === "en").count().toDouble / ids.length
    assert(selEn > enRate, s"selected en rate $selEn <= base rate $enRate")
  }

  test("DSIR: deterministic across runs (same seed), shifts with the seed") {
    val a = Selection.dsir(docs, docs.filter(col("lang") === "en"), 50)
      .select("doc_id", "rn").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = Selection.dsir(docs, docs.filter(col("lang") === "en"), 50)
      .select("doc_id", "rn").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b)
    val c = Selection.dsir(docs, docs.filter(col("lang") === "en"), 50,
        seed = "dsir-epoch1")
      .select("doc_id", "rn").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a != c, "a new seed must draw a different sample")
  }

  test("CCNet buckets: per-language, ordered by LM score, en scores highest") {
    val sc = Selection.ccnetPerplexityBuckets(docs,
      docs.filter(col("lang") === "en"))
    val rows = sc.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => Set("head", "middle", "tail")(r.getAs[String]("bucket"))))
    // within every language, min(head avg_logp) >= max(tail avg_logp)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val head = rs.filter(_.getAs[String]("bucket") == "head").map(_.getAs[Double]("avg_logp"))
      val tail = rs.filter(_.getAs[String]("bucket") == "tail").map(_.getAs[Double]("avg_logp"))
      if (head.nonEmpty && tail.nonEmpty)
        assert(head.min >= tail.max, s"$lang: head/tail out of order")
    }
    // the slice the LM was trained on scores itself highest on average
    val byLang = rows.groupBy(_.getAs[String]("lang"))
      .map { case (l, rs) => l -> rs.map(_.getAs[Double]("avg_logp")).sum / rs.size }
    assert(byLang("en") == byLang.values.max,
      s"en should have the best mean LM score: $byLang")
  }

  test("epoch shuffle: a reproducible permutation with contiguous shard positions") {
    val s1 = Selection.epochShuffle(docs, 16, "epoch1").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(s1.map(_._1).distinct.length == docs.count(), "every doc placed once")
    s1.groupBy(_._2).foreach { case (shard, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq,
        s"shard $shard positions not contiguous")
    }
    val s2 = Selection.epochShuffle(docs, 16, "epoch1").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(s1.sortBy(_._1).toSeq == s2.sortBy(_._1).toSeq, "same epoch = same order")
    val s3 = Selection.epochShuffle(docs, 16, "epoch2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(s1.sortBy(_._1).toSeq != s3.sortBy(_._1).toSeq, "new epoch = new permutation")
  }

  test("soft dedup: weights conserve one unit of mass per duplicate group") {
    import spark.implicits._
    val planted = docs.select("doc_id", "text").limit(10)
      .union(Seq((9001L, "dup dup dup"), (9002L, "dup  dup dup"),
        (9003L, "DUP dup dup")).toDF("doc_id", "text"))
    val w = Selection.softDedupWeights(planted).collect()
    val dupGroup = w.filter(r => r.getAs[Long]("doc_id") >= 9001L)
    assert(dupGroup.length == 3)
    assert(dupGroup.forall(_.getAs[Long]("dup_count") == 3L),
      "normalization must unify whitespace/case variants")
    assert(dupGroup.forall(r =>
      math.abs(r.getAs[Double]("weight") - 1.0 / 3) < 1e-6))
    // Σ weights == number of distinct fingerprints
    val total = w.map(_.getAs[Double]("weight")).sum
    val distinctFp = planted.select(Det.normFingerprint(col("text"))).distinct().count()
    assert(math.abs(total - distinctFp) < 1e-3, s"mass $total vs groups $distinctFp")
  }

  test("temperature mix: alpha<1 boosts the low-resource source, alpha=1 is proportional (n84)") {
    import spark.implicits._
    // head source: 30 docs x 10 tokens; tail source: 3 docs x 10 tokens
    val docs = ((1 to 30).map(i => (i.toLong, ("w " * 10).trim, "head")) ++
      (101 to 103).map(i => (i.toLong, ("w " * 10).trim, "tail")))
      .toDF("doc_id", "text", "source")
    def shares(alpha: Double): Map[String, Long] =
      Selection.temperatureMix(docs, total = 20L, alpha = alpha, seed = "s0")
        .groupBy("source").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val prop = shares(1.0)
    val temp = shares(0.3)
    // proportional: tail gets floor(20 * 3/33) = 1
    assert(prop("tail") == 1L && prop("head") == 18L)
    // alpha=0.3 boosts tail above its proportional share
    assert(temp("tail") > prop("tail"))
    assert(temp("head") < prop("head"))
    // targets never exceed a source's population
    assert(temp.values.forall(_ <= 30L))
  }

  test("temperature mix: deterministic per seed, reshuffled by a new seed (n84)") {
    import spark.implicits._
    val docs = (1 to 40).map(i => (i.toLong, ("w " * 5).trim, s"s${i % 4}"))
      .toDF("doc_id", "text", "source")
    def ids(seed: String) =
      Selection.temperatureMix(docs, total = 12L, alpha = 0.5, seed = seed)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val a = ids("epoch0"); val b = ids("epoch0"); val c = ids("epoch1")
    assert(a == b, "same seed must reproduce the identical draw")
    assert(a != c, "a new seed must draw a different sample")
  }
}
