package graft

import org.apache.spark.sql.functions._
import graft.operators.SpanDedup

/** Exact-substring span dedup (n44/n45): planted-copy surgery,
  * keep-first canonicalization, within-doc repeats, idempotence and
  * the hot-window cap's conservativeness. */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private val W = SpanDedup.W // 8

  // unique token vocabularies so nothing collides by accident
  private def toks(prefix: String, n: Int): IndexedSeq[String] =
    (0 until n).map(i => s"$prefix$i")

  test("a copied run is removed from the later doc only, exactly") {
    val a = toks("a", 30) // canonical doc
    val run = a.slice(5, 21) // 16-token copied run
    val pre = toks("p", 4); val post = toks("q", 5)
    val b = pre ++ run ++ post
    val docs = Seq((1L, a.mkString(" ")), (2L, b.mkString(" ")))
      .toDF("doc_id", "text")

    val spans = SpanDedup.duplicateSpans(docs).collect()
    // only doc 2 carries a span: tokens 4..19 (the copied run),
    // 16 - W + 1 = 9 fully-contained windows
    assert(spans.map(_.getLong(0)).toSet == Set(2L))
    val s = spans.head
    assert((s.getLong(1), s.getLong(2), s.getLong(3)) == (4L, 19L, 9L))

    val out = SpanDedup.dropDuplicateSpans(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == a.mkString(" "), "canonical doc untouched")
    assert(out(2L) == (pre ++ post).mkString(" "), "run excised, rest intact")
  }

  test("a within-doc repeat drops the second occurrence") {
    val run = toks("r", 12)
    val mid = toks("m", 6)
    val d = run ++ mid ++ run
    val docs = Seq((7L, d.mkString(" "))).toDF("doc_id", "text")
    val out = SpanDedup.dropDuplicateSpans(docs).collect().head.getString(1)
    assert(out == (run ++ mid).mkString(" "))
  }

  test("surgery is idempotent: a second pass finds nothing") {
    val a = toks("a", 30)
    val b = toks("p", 4) ++ a.slice(5, 21) ++ toks("q", 5)
    val docs = Seq((1L, a.mkString(" ")), (2L, b.mkString(" ")))
      .toDF("doc_id", "text")
    val once = SpanDedup.dropDuplicateSpans(docs)
    assert(SpanDedup.duplicateSpans(once).isEmpty)
  }

  test("adjacent duplicate windows merge into one span") {
    // b copies a 2W-token run: windows at 0..W inside the copy are all
    // duplicates, pos gaps of 1 <= W, so exactly ONE merged span
    val a = toks("a", 2 * W)
    val docs = Seq((1L, a.mkString(" ")),
      (2L, (toks("z", 3) ++ a).mkString(" "))).toDF("doc_id", "text")
    val spans = SpanDedup.duplicateSpans(docs)
      .filter($"doc_id" === 2L).collect()
    assert(spans.length == 1)
    val s = spans.head
    assert((s.getLong(1), s.getLong(2)) == (3L, (3 + 2 * W - 1).toLong))
  }

  test("maxDf cap is conservative: capped removals are a subset") {
    // one run copied into MANY docs => its windows are hot
    val run = toks("h", W)
    val docs = ((1L, run.mkString(" ")) +:
      (2L to 12L).map(i => (i, (toks(s"u$i", 3) ++ run).mkString(" "))))
      .toDF("doc_id", "text")
    val exact = SpanDedup.duplicateSpans(docs)
      .select("doc_id", "span_start").as[(Long, Long)].collect().toSet
    val capped = SpanDedup.duplicateSpans(docs, maxDf = Some(5L))
      .select("doc_id", "span_start").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty && capped.isEmpty, "hot window capped away")
    assert(capped.subsetOf(exact))
    // a cold duplicate alongside survives the cap
    val cold = toks("c", W)
    val docs2 = docs.union(Seq(
      (20L, cold.mkString(" ")),
      (21L, (toks("v", 2) ++ cold).mkString(" "))).toDF("doc_id", "text"))
    val capped2 = SpanDedup.duplicateSpans(docs2, maxDf = Some(5L))
      .select("doc_id").as[Long].collect().toSet
    assert(capped2 == Set(21L))
  }

  test("extra columns pass through surgery unchanged") {
    val a = toks("a", 20)
    val docs = Seq((1L, a.mkString(" "), "en", "web"),
      (2L, a.mkString(" "), "fr", "book"))
      .toDF("doc_id", "text", "lang", "source")
    val out = SpanDedup.dropDuplicateSpans(docs)
    assert(out.columns.toSeq == Seq("doc_id", "text", "lang", "source"))
    val r = out.filter($"doc_id" === 2L).collect().head
    assert(r.getString(2) == "fr" && r.getString(3) == "book")
    assert(r.getString(1) == "", "full-duplicate doc rewrites to empty text")
  }

  test("docs shorter than the window are never touched") {
    val docs = Seq((1L, "x y z"), (2L, "x y z")).toDF("doc_id", "text")
    assert(SpanDedup.duplicateSpans(docs).isEmpty)
    val out = SpanDedup.dropDuplicateSpans(docs)
      .select("text").as[String].collect()
    assert(out.forall(_ == "x y z"))
  }

  test("rowRemoveSpans is token-identical to the batch surgery on the harness corpus") {
    import graft.operators.TextAnalysis
    val docs = Tables(spark, sf0001).documents
    val bench = TextAnalysis.windowHashes(docs.filter($"doc_id" % 10 === 0))
      .select($"win_hash".as("h")).distinct()
    val train = docs.filter($"doc_id" % 10 =!= 0)
    val batch = SpanDedup.decontaminateRewrite(train, bench)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val hashes = bench.collect().map(_.getLong(0)).sorted
    val roww = train.select("doc_id", "text").collect().map { r =>
      val toks = r.getString(1).split(" ", -1)
      val matched = TextAnalysis.rollingHashes(toks, SpanDedup.W)
        .iterator.zipWithIndex
        .collect { case (h, i) if java.util.Arrays.binarySearch(hashes, h) >= 0 => i }
        .toArray
      r.getLong(0) -> SpanDedup.rowRemoveSpans(toks, matched).mkString(" ")
    }.toMap
    assert(roww == batch && batch.nonEmpty)
    assert(batch.values.exists(_.isEmpty) ||
      batch.exists { case (id, t) => t != train.filter($"doc_id" === id).head.getString(1) },
      "fixture must actually contaminate something")
  }

  test("decontaminateRewrite removes exactly the quoted benchmark passage (n92)") {
    import graft.operators.TextAnalysis
    // W=8 token benchmark passage quoted verbatim inside a train doc
    val passage = "q1 q2 q3 q4 q5 q6 q7 q8"
    val bench = Seq((100L, s"intro words then $passage and some tail here"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, s"novel head tokens $passage novel tail tokens close out fine"),
      (2L, "entirely novel document with no overlap at all whatsoever here"))
      .toDF("doc_id", "text")
    val benchHashes = TextAnalysis.windowHashes(bench)
      .select($"win_hash".as("h")).distinct()
    val out = SpanDedup.decontaminateRewrite(train, benchHashes)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!out(1L).contains("q1") && !out(1L).contains("q8"),
      s"passage must be removed: ${out(1L)}")
    assert(out(1L).contains("novel head tokens") &&
      out(1L).contains("novel tail tokens close out fine"),
      s"novel remainder must survive: ${out(1L)}")
    assert(out(2L) == "entirely novel document with no overlap at all whatsoever here")
    // clean output carries no contaminated window anymore (idempotence)
    val again = SpanDedup.decontaminateRewrite(
      Seq((1L, out(1L))).toDF("doc_id", "text"), benchHashes)
      .select("text").as[String].collect().head
    assert(again == out(1L))
  }
}
