package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dedup operator semantics (SURVEY.md §5.2; north-star ops). */
class DedupSpec extends SparkSpec {

  test("LSH near-dup output equals exact jaccard>=0.6 pairs (recall 1.0)") {
    val lsh = Catalog.queries("n04_lsh_neardup")(spark, sf0001)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact answer from the inverted-index query at a matching threshold
    val exact = Catalog.queries("n05_ngram_jaccard")(spark, sf0001)
      .filter(col("jac") >= 0.6)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact, s"LSH missed ${(exact -- lsh).size}, extra ${(lsh -- exact).size}")
  }

  test("dedup is idempotent: re-deduping representatives is a no-op") {
    val first = Catalog.queries("n01_dedup_exact")(spark, sf0001)
    val reps = first.count()
    val docs = Tables(spark, sf0001).documents
    val kept = docs.join(first.select("doc_id"), Seq("doc_id"), "left_semi")
    val again = kept.groupBy(md5(col("text").cast("binary"))).count().count()
    assert(again == reps)
  }

  test("minhash signature: near-dup pairs collide on most components") {
    val sig = Catalog.queries("n03_minhash_sig")(spark, sf0001)
    val pairs = Catalog.queries("n04_lsh_neardup")(spark, sf0001)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture should contain near-dups")
    val sigMap = sig.collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(1)).map(_.getString(2)).toSeq).toMap
    pairs.foreach { case (a, b) =>
      val matches = sigMap(a).zip(sigMap(b)).count { case (x, y) => x == y }
      assert(matches >= 10, s"pair ($a,$b) only $matches/16 minhash matches")
    }
  }

  test("simhash: near-dup pairs have far lower hamming than random pairs") {
    val fp = Dedup.simhashFingerprints(Tables(spark, sf0001).documents)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(fp(a) ^ fp(b))
    val near = Catalog.queries("n04_lsh_neardup")(spark, sf0001)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(near.nonEmpty)
    val nearAvg = near.map { case (a, b) => ham(a, b) }.sum.toDouble / near.length
    val ids = fp.keys.toArray.sorted
    val randomPairs = ids.take(60).flatMap(a => ids.slice(200, 260).map(b => (a, b)))
    val randAvg = randomPairs.map { case (a, b) => ham(a, b) }.sum.toDouble /
      randomPairs.length
    assert(nearAvg < randAvg / 2,
      s"near-dup avg hamming $nearAvg not well below random $randAvg")
    // and the banded candidate query returns exactly the hamming<=3 pairs it defines
    val out = Catalog.queries("n06_simhash")(spark, sf0001).collect()
    out.foreach(r => assert(r.getAs[Long]("hamming") <= 3))
  }

  test("shingles: doc shorter than 3 tokens yields no shingles") {
    import spark.implicits._
    val tiny = Seq((1L, "only two"), (2L, "a b c")).toDF("doc_id", "text")
    val sh = Dedup.shingles(tiny).collect()
    assert(sh.forall(_.getLong(0) == 2L))
    assert(sh.length == 1 && sh.head.getString(1) == "a b c")
  }
}
