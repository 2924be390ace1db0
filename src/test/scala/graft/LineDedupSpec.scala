package graft

import graft.operators.LineDedup
import org.apache.spark.sql.functions.col

/** Line-level boilerplate removal (n81): delimiter lining on real
  * multi-line text, chunk lining round-trip, df-floor semantics
  * (every occurrence goes, including the first), order preservation
  * and the all-boilerplate empty-husk case. */
class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private val banner = "accept all cookies to continue"
  private val nav = "home products about contact"

  private def docsDF(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("delimiter lining numbers lines in arrival order, keeps empties") {
    val docs = docsDF(1L -> s"alpha\n\nbeta")
    val lines = LineDedup.linesByDelim(docs).orderBy("line_no")
      .collect().map(r => (r.getLong(1), r.getString(2)))
    assert(lines.toSeq == Seq((1L, "alpha"), (2L, ""), (3L, "beta")))
  }

  test("boilerplate lines (df >= minDocs) are stripped from EVERY doc, first occurrence included") {
    val docs = docsDF(
      1L -> s"$banner\nunique one",
      2L -> s"$banner\nunique two\n$nav",
      3L -> s"unique three\n$nav")
    val out = LineDedup.dropBoilerplate(
        LineDedup.linesByDelim(docs), minDocs = 2L, sep = "\n")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((2L, 1L, "unique one")))
    assert(out(2L) == ((3L, 2L, "unique two")))
    assert(out(3L) == ((2L, 1L, "unique three")))
  }

  test("a within-doc repeat alone is NOT boilerplate (df counts distinct docs)") {
    val docs = docsDF(
      1L -> s"$banner\n$banner\nunique one",
      2L -> "unique two")
    val out = LineDedup.dropBoilerplate(
        LineDedup.linesByDelim(docs), minDocs = 2L, sep = "\n")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((0L, s"$banner\n$banner\nunique one")),
      "one doc repeating a line twice stays intact")
  }

  test("an all-boilerplate doc survives as an empty husk") {
    val docs = docsDF(
      1L -> s"$banner\n$nav",
      2L -> s"$banner\nunique two\n$nav")
    val out = LineDedup.dropBoilerplate(
        LineDedup.linesByDelim(docs), minDocs = 2L, sep = "\n")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((2L, 2L, "")))
    assert(out(2L) == ((3L, 2L, "unique two")))
  }

  test("surviving lines keep their original order") {
    val docs = docsDF(
      1L -> s"z last words\n$banner\na first words\nm middle words",
      2L -> banner)
    val out = LineDedup.dropBoilerplate(
        LineDedup.linesByDelim(docs), minDocs = 2L, sep = "\n")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out(1L) == "z last words\na first words\nm middle words")
  }

  test("chunk lining round-trips: nothing boilerplate => clean_text == text") {
    val docs = docsDF(
      1L -> (1 to 19).map(i => s"a$i").mkString(" "), // partial tail chunk
      2L -> (1 to 8).map(i => s"b$i").mkString(" "),  // exactly one chunk
      3L -> "c1 c2 c3")                               // shorter than one chunk
    val out = LineDedup.dropBoilerplate(
        LineDedup.linesByChunk(docs, k = 8), minDocs = 2L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    val in = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    in.foreach { case (id, text) =>
      assert(out(id) == ((0L, text)), s"doc $id must rebuild byte-identically")
    }
  }

  test("incremental screen: index screen == full dropBoilerplate restricted to the batch") {
    val prior = docsDF(
      1L -> s"$banner\nold one",
      2L -> s"$banner\nold two\n$nav",
      3L -> s"old three\n$nav")
    val batch = docsDF(
      10L -> s"$banner\nnew one",       // banner boiler from PRIOR df alone
      11L -> s"fresh line\nnew two",
      12L -> s"fresh line\nnew three")  // 'fresh line' boiler from batch df alone
    val lines = (d: org.apache.spark.sql.DataFrame) => LineDedup.linesByDelim(d)
    val got = LineDedup.screenAgainstLineIndex(
        lines(batch), LineDedup.buildLineIndex(lines(prior)), minDocs = 2L, sep = "\n")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(got(10L) == ((1L, "new one")))
    assert(got(11L) == ((1L, "new two")))
    assert(got(12L) == ((1L, "new three")))
    // equivalence: full corpus dropBoilerplate restricted to batch rows
    val full = LineDedup.dropBoilerplate(
        lines(prior.unionByName(batch)), minDocs = 2L, sep = "\n")
      .filter(col("doc_id") >= 10L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(got == full, "screen must equal the full recompute on the batch")
  }

  test("appendLineIndex == rebuilding the index over the union") {
    val a = docsDF(1L -> s"$banner\nu1", 2L -> s"$banner\nu2")
    val b = docsDF(10L -> s"$banner\n$nav", 11L -> s"$nav\nu3")
    val lines = (d: org.apache.spark.sql.DataFrame) => LineDedup.linesByDelim(d)
    val appended = LineDedup.appendLineIndex(
        LineDedup.buildLineIndex(lines(a)), lines(b))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rebuilt = LineDedup.buildLineIndex(lines(a.unionByName(b)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(appended == rebuilt)
  }

  test("chunk-repeated content across docs is caught by the chunk liner") {
    val shared = (1 to 8).map(i => s"s$i") // one full shared chunk, aligned
    val docs = docsDF(
      1L -> (shared ++ (1 to 8).map(i => s"a$i")).mkString(" "),
      2L -> (shared ++ (1 to 8).map(i => s"b$i")).mkString(" "))
    val boiler = LineDedup.boilerplateLines(
      LineDedup.linesByChunk(docs, k = 8), minDocs = 2L).collect()
    assert(boiler.length == 1)
    assert((boiler.head.getLong(1), boiler.head.getLong(2)) == ((2L, 2L)))
    val out = LineDedup.dropBoilerplate(
        LineDedup.linesByChunk(docs, k = 8), minDocs = 2L)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out(1L) == (1 to 8).map(i => s"a$i").mkString(" "))
    assert(out(2L) == (1 to 8).map(i => s"b$i").mkString(" "))
  }
}
