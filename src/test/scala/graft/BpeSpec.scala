package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE vocabulary induction: the fold-based merge against hand-traced
  * cases (overlap, repetition, multi-char tokens), the trainer against
  * a hand-computed merge sequence, and the pair statistics against a
  * Scala model of the same counts. */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  private def mergeOne(word: String, c1: String, c2: String): Seq[String] = {
    val df = Seq(word).toDF("w")
      .select(expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
        .as("syms"))
      .select(Bpe.mergePair(col("syms"), lit(c1), lit(c2)).as("m"))
    df.collect()(0).getSeq[String](0)
  }

  test("mergePair: left-to-right non-overlapping merge semantics") {
    assert(mergeOne("abab", "a", "b") == Seq("ab", "ab"))
    assert(mergeOne("aaa", "a", "a") == Seq("aa", "a"))
    assert(mergeOne("aaaa", "a", "a") == Seq("aa", "aa"))
    assert(mergeOne("abc", "b", "c") == Seq("a", "bc"))
    assert(mergeOne("abc", "x", "y") == Seq("a", "b", "c"))
    assert(mergeOne("a", "a", "a") == Seq("a"))
  }

  test("mergePair composes across rounds (multi-char symbols)") {
    // round 1 merges (l, o); round 2 merges (lo, w) on the result
    val df = Seq("low").toDF("w")
      .select(expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
        .as("syms"))
      .select(Bpe.mergePair(col("syms"), lit("l"), lit("o")).as("syms"))
      .select(Bpe.mergePair(col("syms"), lit("lo"), lit("w")).as("syms"))
    assert(df.collect()(0).getSeq[String](0) == Seq("low"))
  }

  test("pairStats matches a Scala model of frequency-weighted adjacent counts") {
    val docs = Seq(
      (1L, "low low lower"),
      (2L, "newest newest low")).toDF("doc_id", "text")
    val got = Bpe.pairStats(Bpe.symbolize(Bpe.wordFreqs(docs)))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // Scala model
    val words = Seq("low", "low", "lower", "newest", "newest", "low")
    val model = words
      .flatMap(w => w.sliding(2).map(p => (p.substring(0, 1), p.substring(1))))
      .groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    assert(got == model)
    assert(got(("l", "o")) == 4L && got(("e", "s")) == 2L)
  }

  test("train recovers the hand-computed merge sequence on a planted corpus") {
    // "aa" dominates: corpus = aaab ×3, ab ×1.
    // round 1: pairs (a,a)=6? — aaab has (a,a),(a,a),(a,b): f=3 each →
    // (a,a)=6, (a,b)=3+1=4 → merge (a,a) → aaab = [aa,a,b], ab = [a,b]
    // round 2: (aa,a)=3, (a,b)=3+1=4 → merge (a,b) → [aa,ab], [ab]
    // round 3: (aa,ab)=3 → merge (aa,ab)
    val docs = Seq((1L, "aaab aaab aaab ab")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, nMerges = 3)
    assert(merges == Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
  }

  test("trainWithStats carries the hand-computed argmax counts per round") {
    // same corpus as above; wf: aaab f=3, ab f=1 — counts traced by hand
    val docs = Seq((1L, "aaab aaab aaab ab")).toDF("doc_id", "text")
    val merges = Bpe.trainWithStats(docs, nMerges = 3)
    assert(merges == Seq(("a", "a", 6L), ("a", "b", 4L), ("aa", "ab", 3L)))
  }

  test("tokenCounts applies the merge list in order (hand-computed)") {
    val docs = Seq((1L, "aaab aaab aaab ab")).toDF("doc_id", "text")
    def counts(n: Int): Long =
      Bpe.tokenCounts(docs, Bpe.train(docs, n)).head().getLong(1)
    // 2 merges: aaab → [aa, ab] (2), ab → [ab] (1) ⇒ 3·2 + 1 = 7
    assert(counts(2) == 7L)
    // 3rd merge (aa, ab) collapses aaab to one token ⇒ 3·1 + 1 = 4
    assert(counts(3) == 4L)
  }

  test("train stops early when no pairs remain") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // round 1 merges (a,b); afterwards every word is a single symbol
    val merges = Bpe.train(docs, nMerges = 5)
    assert(merges == Seq(("a", "b")))
  }

  test("local trainer == distributed cadenced trainer on the real corpus (12 rounds)") {
    // the driver-local loop (capped-vocab production shape) and the
    // checkpoint-cadence distributed fold must produce the identical
    // merge SEQUENCE — argmax, tiebreak, rewrite, counts, all rounds;
    // 12 rounds crosses a checkpoint boundary (cadence 8)
    val docs = Tables(spark, sf0001).documents
    val local = Bpe.trainWithStats(docs, 12)
    val dist = Bpe.trainWithStatsDistributed(docs, 12)
    assert(local == dist)
  }

  test("50-merge budget: full sequence is deterministic and pairs never exhaust early") {
    val docs = Tables(spark, sf0001).documents
    val merges = Bpe.trainWithStats(docs, Bpe.TrainRoundsFull)
    assert(merges.length == Bpe.TrainRoundsFull, "pairs exhausted before the budget")
    assert(merges.map { case (a, b, _) => a + b }.distinct.length == merges.length,
      "every merge must create a distinct token")
    val again = Bpe.trainWithStats(docs, Bpe.TrainRoundsFull)
    assert(merges == again)
  }
}
