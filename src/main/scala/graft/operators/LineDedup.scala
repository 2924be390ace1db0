package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Line/paragraph-level boilerplate removal — the CCNet-family
  * structural dedup (Wenzek et al. 2020 §3.1 dedups paragraph hashes;
  * Dolma and RefinedWeb run the same shape per line): hash each
  * structural unit, count how many DISTINCT documents it appears in
  * corpus-wide, and strip every occurrence of units above a
  * document-frequency floor — nav menus, cookie banners, license
  * headers. Differs from the span family ([[SpanDedup]]) on both axes:
  * units are aligned structural lines (not sliding token windows), and
  * the criterion is corpus document-frequency (boilerplate: ALL
  * occurrences go, including the first), not keep-first occurrence
  * dedup.
  *
  * Spark-first shape (scale notes in PERF.md):
  *
  *  1. line extraction is map-side only (split + posexplode, no
  *     shuffle);
  *  2. the df count groups by the line's md5 — fixed 32-byte keys,
  *     map-side combinable, one shuffle;
  *  3. the boilerplate set (df ≥ minDocs) is orders of magnitude
  *     smaller than the line stream; the mark-join runs on the hash
  *     key and AQE broadcasts the filtered aggregate when it fits —
  *     no hint, so a genuinely huge boilerplate set at 100 TB
  *     degrades to a shuffle join instead of an OOM;
  *  4. document rebuild is one groupBy(doc_id): counts and the
  *     order-restored clean text come out of a single aggregate
  *     (array_sort over (line_no, line) structs — no window, no
  *     second pass).
  */
object LineDedup {

  /** (doc_id, line_no, line) for delimiter-structured text (real
    * corpora: '\n' for lines, "\n\n" for CCNet paragraphs). line_no is
    * 1-based arrival order. Map-side only. */
  def linesByDelim(docs: DataFrame, delim: String = "\n"): DataFrame =
    docs
      .select(col("doc_id"), posexplode(split(col("text"), java.util.regex.Pattern.quote(delim), -1)))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("line_no"), col("col").as("line"))

  /** (doc_id, line_no, line) via fixed `k`-token tumbling chunks — the
    * structural liner for corpora with no newline structure (the
    * harness documents are flat token streams; a k-token chunk is the
    * deterministic stand-in for a line, same role the fixed window
    * plays in [[TextAnalysis.windowHashes]]). The last chunk keeps its
    * partial tail, so rebuild with nothing dropped is byte-identical
    * to the input. */
  def linesByChunk(docs: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"chunk width must be positive, got $k")
    docs
      .select(col("doc_id"), split(col("text"), " ", -1).as("__tk"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(1, CAST(ceil(size(__tk) / ${k}.0D) AS INT)), " +
          s"i -> array_join(slice(__tk, (i - 1) * $k + 1, $k), ' '))")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("line_no"), col("col").as("line"))
  }

  private def lineHash(c: Column): Column = md5(c.cast("binary"))

  /** Corpus boilerplate catalog over a (doc_id, line_no, line) frame:
    * (line_hash, n_docs, n_occurrences) for every unit appearing in at
    * least `minDocs` distinct documents. One md5-keyed shuffle. */
  def boilerplateLines(lines: DataFrame, minDocs: Long): DataFrame =
    lines
      .groupBy(lineHash(col("line")).as("line_hash"))
      .agg(
        count_distinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") >= minDocs)

  /** Strip boilerplate (df ≥ `minDocs`) from a lined corpus and
    * rebuild each document: (doc_id, n_lines, n_dropped, clean_text)
    * with `clean_text` the surviving lines re-joined by `sep` in
    * original order (empty string when every line was boilerplate —
    * the document row itself always survives; dropping empty husks is
    * the caller's quality gate, not dedup's job). */
  def dropBoilerplate(lines: DataFrame, minDocs: Long, sep: String = " "): DataFrame = {
    val boiler = boilerplateLines(lines, minDocs)
      .select(col("line_hash"), lit(1).as("__b"))
    lines
      .join(boiler, lineHash(col("line")) === col("line_hash"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).cast("long").as("n_lines"),
        sum(when(col("__b").isNotNull, 1L).otherwise(0L)).cast("long").as("n_dropped"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("__b").isNull, struct(col("line_no"), col("line"))))),
            x => x.getField("line")),
          sep).as("clean_text"))
  }

  // ---------------------------------------------------------------
  // incremental lifecycle (the IncrementalDedup cadence for lines)
  // ---------------------------------------------------------------

  /** Corpus line-df index over a lined frame: (line_hash, n_docs) for
    * EVERY unit (no threshold — the floor is applied at screen time,
    * so one persisted index serves any minDocs). Persistable like the
    * dedup index components; at rest it is written bucketed by
    * line_hash so screens co-locate. */
  def buildLineIndex(lines: DataFrame): DataFrame =
    lines
      .groupBy(lineHash(col("line")).as("line_hash"))
      .agg(count_distinct(col("doc_id")).as("n_docs"))

  /** Fold a NEW batch into an existing line index WITHOUT re-reading
    * the prior corpus: doc_ids are unique across snapshots (pipeline
    * contract, same as [[IncrementalDedup.appendToIndex]]), so
    * distinct-doc counts ADD per hash. One batch-sized aggregation +
    * one hash-keyed merge. */
  def appendLineIndex(index: DataFrame, newLines: DataFrame): DataFrame =
    index
      .join(buildLineIndex(newLines)
        .withColumnRenamed("n_docs", "__new"), Seq("line_hash"), "full_outer")
      .select(col("line_hash"),
        (coalesce(col("n_docs"), lit(0L)) + coalesce(col("__new"), lit(0L)))
          .as("n_docs"))

  /** Strip boilerplate from a NEW batch against the ACCUMULATED
    * corpus: a unit is boilerplate when its prior-index df plus its
    * within-batch df reaches `minDocs` — identical to running
    * [[dropBoilerplate]] over prior ∪ batch and keeping the batch's
    * rows (LineDedupSpec proves the equivalence), except the prior
    * corpus text is never re-read: only the hash-keyed index rows
    * matching the batch's lines move. */
  def screenAgainstLineIndex(newLines: DataFrame, index: DataFrame,
      minDocs: Long, sep: String = " "): DataFrame = {
    val combined = buildLineIndex(newLines)
      .withColumnRenamed("n_docs", "__batch")
      .join(index.withColumnRenamed("n_docs", "__prior"), Seq("line_hash"), "left")
      .filter(coalesce(col("__prior"), lit(0L)) + col("__batch") >= minDocs)
      .select(col("line_hash"), lit(1).as("__b"))
    newLines
      .join(combined, lineHash(col("line")) === col("line_hash"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).cast("long").as("n_lines"),
        sum(when(col("__b").isNotNull, 1L).otherwise(0L)).cast("long").as("n_dropped"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("__b").isNull, struct(col("line_no"), col("line"))))),
            x => x.getField("line")),
          sep).as("clean_text"))
  }

  // ---------------------------------------------------------------
  // catalog entry
  // ---------------------------------------------------------------

  /** Chunk width for the harness corpus (flat token streams — see
    * [[linesByChunk]]); 8 tokens keeps the planted cross-document
    * duplicates visible as repeated chunks. */
  val ChunkTokens: Int = 8

  /** Boilerplate floor: a chunk seen in ≥ 2 distinct docs is
    * boilerplate (the CCNet setting — any cross-document repeat of a
    * structural unit is template noise). */
  val MinDocs: Long = 2L

  val lineBoilerplate: Q = Q(
    "n81_line_boilerplate",
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |lines AS (SELECT doc_id, CAST(i AS BIGINT) AS line_no,
       |                 list_aggregate(tk[(i - 1) * $ChunkTokens + 1 : i * $ChunkTokens],
       |                                'string_agg', ' ') AS line
       |          FROM toks,
       |               unnest(generate_series(1, CAST(ceil(len(tk) / $ChunkTokens.0) AS INT))) AS t(i)),
       |boiler AS (SELECT md5(line) AS line_hash
       |           FROM lines GROUP BY md5(line)
       |           HAVING count(DISTINCT doc_id) >= $MinDocs),
       |marked AS (SELECT doc_id, line_no, line,
       |                  md5(line) IN (SELECT line_hash FROM boiler) AS b
       |           FROM lines)
       |SELECT doc_id,
       |       CAST(count(*) AS BIGINT) AS n_lines,
       |       CAST(count(*) FILTER (WHERE b) AS BIGINT) AS n_dropped,
       |       coalesce(string_agg(line, ' ' ORDER BY line_no) FILTER (WHERE NOT b),
       |                '') AS clean_text
       |FROM marked
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    dropBoilerplate(linesByChunk(Tables(s, dir).documents, ChunkTokens), MinDocs)
      .orderBy("doc_id")
  }

  /** n86: the incremental screen over the harness split — prior corpus
    * = doc_id % 4 <> 0 (its index built once), new batch = % 4 == 0
    * screened against prior df + batch df at the n81 floor. */
  val incrementalBoilerplate: Q = Q(
    "n86_incremental_boilerplate",
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |lines AS (SELECT doc_id, CAST(i AS BIGINT) AS line_no,
       |                 list_aggregate(tk[(i - 1) * $ChunkTokens + 1 : i * $ChunkTokens],
       |                                'string_agg', ' ') AS line
       |          FROM toks,
       |               unnest(generate_series(1, CAST(ceil(len(tk) / $ChunkTokens.0) AS INT))) AS t(i)),
       |prior AS (SELECT md5(line) AS line_hash, count(DISTINCT doc_id) AS pd
       |          FROM lines WHERE doc_id % 4 <> 0 GROUP BY md5(line)),
       |batch AS (SELECT * FROM lines WHERE doc_id % 4 = 0),
       |bdf AS (SELECT md5(line) AS line_hash, count(DISTINCT doc_id) AS bd
       |        FROM batch GROUP BY md5(line)),
       |boiler AS (SELECT b.line_hash
       |           FROM bdf b LEFT JOIN prior p ON p.line_hash = b.line_hash
       |           WHERE coalesce(p.pd, 0) + b.bd >= $MinDocs),
       |marked AS (SELECT doc_id, line_no, line,
       |                  md5(line) IN (SELECT line_hash FROM boiler) AS b
       |           FROM batch)
       |SELECT doc_id,
       |       CAST(count(*) AS BIGINT) AS n_lines,
       |       CAST(count(*) FILTER (WHERE b) AS BIGINT) AS n_dropped,
       |       coalesce(string_agg(line, ' ' ORDER BY line_no) FILTER (WHERE NOT b),
       |                '') AS clean_text
       |FROM marked
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir).documents
    val index = buildLineIndex(
      linesByChunk(docs.filter(col("doc_id") % 4 =!= 0), ChunkTokens))
    screenAgainstLineIndex(
      linesByChunk(docs.filter(col("doc_id") % 4 === 0), ChunkTokens),
      index, MinDocs)
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(lineBoilerplate, incrementalBoilerplate)
}
