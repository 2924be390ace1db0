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

  test("clearShingleCache: caches rebuild transparently after a clear") {
    val docs = Tables(spark, sf0001).documents
    val before = Dedup.shingles(docs).count()
    Dedup.clearShingleCache(spark)
    assert(Dedup.shingles(docs).count() == before)
  }

  test("derived-corpus cache: distinctDocuments survivors share ONE shingle index") {
    import graft.api.Graft._
    val docs = Tables(spark, sf0001).documents
    // two separate invocations build two distinct DataFrame objects for
    // the same logical corpus (st05's per-call situation) — the cache
    // must return the identical memoized index, not churn the ad-hoc
    // slot (VERDICT_r03 #6)
    val k1 = docs.distinctDocuments(normalize = true)
    val k2 = docs.distinctDocuments(normalize = true)
    assert(k1 ne k2)
    val s1 = Dedup.shingles(k1)
    assert(s1 eq Dedup.shingles(k2), "derived corpora rebuilt the index")
    // an unrelated ad-hoc corpus must NOT evict the derived entry
    import spark.implicits._
    Dedup.shingles(Seq((1L, "a b c d")).toDF("doc_id", "text"))
    assert(s1 eq Dedup.shingles(k1), "ad-hoc corpus evicted the derived entry")
    // and a clear still resets it cleanly
    Dedup.clearShingleCache(spark)
    assert(s1 ne Dedup.shingles(docs.distinctDocuments(normalize = true)))
  }

  test("banded LSH (4x4): subset of exact pairs, recall reported") {
    val banded = Catalog.queries("n17_lsh_banded")(spark, sf0001)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Catalog.queries("n05_ngram_jaccard")(spark, sf0001)
      .filter(col("jac") >= 0.6)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // verify stage makes precision exactly 1; recall may be < 1 by design
    assert((banded -- exact).isEmpty, s"spurious pairs: ${(banded -- exact).take(3)}")
    assert(exact.nonEmpty)
    info(s"banded 4x4 recall = ${banded.size.toDouble / exact.size} " +
      s"(${banded.size}/${exact.size})")
  }

  test("df-cap: planted hot shingle — capped answers identical, pair rows bounded") {
    import spark.implicits._
    // 60 docs all sharing a 5-word boilerplate header (3 hot shingles,
    // df = 60 — the "shared header across 10^8 docs" skew shape) plus a
    // unique 12-word body each. Docs 0/1 and 10/11 are planted near-dups
    // (bodies differ in the final word only).
    val header = "terms of service apply here"
    def body(i: Int) = (0 until 12).map(w => s"w${i}_$w").mkString(" ")
    val texts = (0 until 60).map {
      case 1  => s"$header ${body(0).split(' ').dropRight(1).mkString(" ")} tail1"
      case 11 => s"$header ${body(10).split(' ').dropRight(1).mkString(" ")} tail11"
      case i  => s"$header ${body(i)}"
    }
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => ((r.getLong(0), r.getLong(1)),
        math.round(r.getAs[Double]("jac") * 1e9))).toSet

    val uncapped = pairSet(Dedup.jaccardPairs(docs, threshold = 0.5))
    val capped   = pairSet(Dedup.jaccardPairs(docs, threshold = 0.5, dfCap = Some(5L)))
    assert(uncapped.nonEmpty, "planted near-dups must qualify")
    assert(uncapped.map(_._1) == Set((0L, 1L), (10L, 11L)))
    assert(capped == uncapped, "stop-shingle pruning changed the answer")

    // containment + LSH paths agree too (exact values, not just pair ids)
    val cu = Dedup.containmentPairs(docs, 0.5).collect().map(_.toSeq).toSet
    val cc = Dedup.containmentPairs(docs, 0.5, Some(5L)).collect().map(_.toSeq).toSet
    assert(cc == cu)
    val lu = pairSet(Dedup.nearDuplicatePairs(docs, 0.6))
    val lc = pairSet(Dedup.nearDuplicatePairs(docs, 0.6, Some(5L)))
    assert(lc == lu && lu.map(_._1) == Set((0L, 1L), (10L, 11L)))

    // The bound itself: pair rows generated by the inverted-index stage.
    // Hot header shingles contribute C(60,2) rows EACH uncapped; zero capped.
    val sh = Dedup.shingles(docs)
    def pairRows(index: org.apache.spark.sql.DataFrame): Long =
      index.select($"doc_id".as("d1"), $"sh")
        .join(index.select($"doc_id".as("d2"), $"sh"), Seq("sh"))
        .filter($"d1" < $"d2").count()
    val hot = sh.groupBy("sh").count().filter($"count" > 5).select("sh")
    val rowsUncapped = pairRows(sh)
    val rowsCapped = pairRows(sh.join(hot, Seq("sh"), "left_anti"))
    assert(rowsUncapped >= 3L * 59 * 60 / 2,
      s"fixture lost its skew: $rowsUncapped")
    assert(rowsCapped < 100,
      s"capped pair stage should be tiny, got $rowsCapped (uncapped $rowsUncapped)")
  }
}
