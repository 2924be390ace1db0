package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Round-4 text-operator invariants: the streaming-safe Gopher
  * predicate must equal the audit frame's verdict, and the map-side
  * bigram extraction must agree with the obvious row-level model. */
class TextOpsSpec extends SparkSpec {

  import spark.implicits._

  test("gopherPass column ≡ gopherRules.passes on the corpus") {
    val docs = Tables(spark, sf0001).documents
    val viaRules = TextAnalysis.gopherRules(docs)
      .filter(col("passes")).select("doc_id")
    val viaCol = docs.filter(TextAnalysis.gopherPass(col("text")))
      .select("doc_id")
    assert(viaRules.exceptAll(viaCol).count() == 0)
    assert(viaCol.exceptAll(viaRules).count() == 0)
    assert(viaCol.count() > 0, "gate must pass something (non-vacuous)")
  }

  test("bigrams: adjacency, order preserved, degenerate docs empty") {
    val df = Seq((1L, "a b c"), (2L, "solo"), (3L, ""), (4L, "x y"),
      (5L, "r r r")).toDF("doc_id", "text")
    val got = TextAnalysis.bigrams(df).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    // multiset semantics: repeated bigrams stay (they carry count mass)
    assert(got.sorted == Seq(
      (1L, "a", "b"), (1L, "b", "c"),
      (4L, "x", "y"),
      (5L, "r", "r"), (5L, "r", "r")).sorted)
  }

  test("n51 bigram model: conditionals sum to 1 and dup docs score identically") {
    // on any corpus, sum over w2 of p(w2|w1) = 1 for every prefix w1
    val docs = Tables(spark, sf0001).documents
    val big = TextAnalysis.bigrams(docs)
    val pre = big.groupBy("w1").agg(count(lit(1)).as("c1"))
    val bi = big.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val bad = bi.groupBy("w1").agg(sum("c2").as("s"))
      .join(pre, Seq("w1"))
      .filter(col("s") =!= col("c1"))
      .count()
    assert(bad == 0, "MLE conditional must sum to exactly 1 per prefix")
    // two identical documents must receive the identical score
    val scored = Catalog.queries("n51_bigram_logprob")(spark, sf0001)
    val withFp = Tables(spark, sf0001).documents
      .select(col("doc_id"), md5(col("text").cast("binary")).as("fp"))
      .join(scored, Seq("doc_id"))
    val inconsistent = withFp.groupBy("fp")
      .agg(countDistinct("avg_logp").as("k"))
      .filter(col("k") > 1).count()
    assert(inconsistent == 0)
  }

  test("bm25: tf raises, idf separates rare from common, length normalizes (n83)") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq(
      // 'rare' appears in doc 1 only; 'common' in all four
      (1L, "rare common filler fillerb"),
      (2L, "common common filler fillerb"),          // tf(common)=2
      (3L, "common filler fillerb fillerc"),          // tf(common)=1, same length
      (4L, "common filler fillerb fillerc fillerd fillere fillerf fillerg")) // tf=1, longer
      .toDF("doc_id", "text")
    val queries = Seq((1L, "rare"), (2L, "common")).toDF("q_id", "term")
    val got = TextAnalysis.bm25TopK(docs, queries, k = 10)
      .collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("doc_id")) ->
        (r.getAs[Long]("rank"), r.getAs[Double]("score"))).toMap
    // query 1 matches only doc 1
    assert(got.keys.filter(_._1 == 1L).map(_._2).toSet == Set(1L))
    // query 2: tf=2 beats tf=1 at equal length; longer doc ranks below
    // the equal-tf shorter doc (length normalization)
    assert(got((2L, 2L))._1 == 1L)
    assert(got((2L, 4L))._2 < got((2L, 3L))._2)
    // the rare term outscores the common term for its one holder
    assert(got((1L, 1L))._2 > got((2L, 2L))._2)
  }
}
