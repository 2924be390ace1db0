package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Exact-substring span deduplication — the document-surgery dedup a
  * large-scale training pipeline runs ON TOP of whole-document dedup
  * (Lee et al. 2022, "Deduplicating Training Data Makes Language
  * Models Better": remove every repeated substring over a length
  * floor, keeping one canonical occurrence). Whole-document ops (n01,
  * n04) drop documents; this family rewrites them — boilerplate
  * headers, license blocks and quoted passages vanish while the
  * novel remainder survives.
  *
  * Spark-first shape, on the SHARED Rabin–Karp stream
  * ([[TextAnalysis.windowHashes]] — same tokenizer, window width and
  * mod-p chain as n25/n26, so the fingerprint can never drift):
  *
  *  1. every `W`-token window hash → `row_number` over
  *     `(win_hash | doc_id, pos)`: occurrence #1 is canonical,
  *     the rest are duplicates (keep-first, globally deterministic);
  *  2. per document, merge duplicate window positions into maximal
  *     token spans (gaps-and-islands: break when the next window
  *     starts more than `W` after the previous — covered token
  *     ranges no longer overlap or touch);
  *  3. surgery: drop every token covered by a span via one
  *     higher-order `filter` over the token array — no explode, no
  *     per-token shuffle.
  *
  * Scale: the only wide stage shuffles `(doc_id, pos, win_hash)` —
  * 24 bytes per token, the same footprint n26's contamination screen
  * already carries at 100 TB. The skew hazard is a hot window
  * (site-wide boilerplate ⇒ one giant hash group to sort); the
  * `maxDf` cap drops groups above the cap from span-marking —
  * conservative (fewer removals, never a wrong one), the exact
  * analog of [[Dedup.dropHotShingles]].
  */
object SpanDedup {

  /** Window width in tokens — shared with n25/n26 via
    * [[TextAnalysis.RollingWindow]]; also the minimum duplicated run
    * this family can see. */
  val W: Int = TextAnalysis.RollingWindow

  /** Maximal duplicated token spans per document (keep-first):
    * (doc_id, span_start, span_end, n_windows) with token indices
    * 0-based inclusive. The canonical (first) occurrence of a run is
    * NOT reported — only the repeats that surgery should remove.
    *
    * `maxDf`: ignore window hashes occurring more than this many
    * times corpus-wide (hot-group skew guard; None = exact). */
  def duplicateSpans(docs: DataFrame, maxDf: Option[Long] = None): DataFrame = {
    val byHash = Window.partitionBy("win_hash").orderBy("doc_id", "pos")
    val marked = TextAnalysis.windowHashes(docs)
      .withColumn("rn", row_number().over(byHash))
    val capped = maxDf match {
      case Some(cap) =>
        // count() over the same window reuses byHash's one sort
        marked.withColumn("df", count(lit(1)).over(
          Window.partitionBy("win_hash")))
          .filter(col("df") <= cap).drop("df")
      case None => marked
    }
    mergeIslands(capped.filter(col("rn") > 1).select("doc_id", "pos"))
  }

  /** Input docs + `__tk` (token array), `spans` (merged duplicate
    * spans, null when none) and `__kept` (tokens outside every span).
    * The span list per doc is small (merged islands), so the join
    * broadcasts nothing large and the surgery is a map-side
    * higher-order filter. */
  private def withKept(docs: DataFrame, maxDf: Option[Long]): DataFrame =
    withKeptSpans(docs, duplicateSpans(docs, maxDf))

  /** Rewrite `text` with every duplicated span removed (keep-first:
    * the corpus-wide first occurrence of each run survives). All
    * other columns pass through unchanged. */
  def dropDuplicateSpans(docs: DataFrame, maxDf: Option[Long] = None): DataFrame =
    withKept(docs, maxDf)
      .withColumn("text", concat_ws(" ", col("__kept")))
      .drop("__tk", "spans", "__n_dup", "__kept")

  // ---------------------------------------------------------------
  // catalog entries
  // ---------------------------------------------------------------

  /** DuckDB twin of the span pipeline: n25's window-hash CTE (same
    * tokenizer/md5-prefix/mod-p Horner fold), then the identical
    * rank → islands → merge chain. */
  private val spansCte =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |pos_ AS (SELECT doc_id, tk,
       |                unnest(generate_series(1, greatest(len(tk) - ${W - 1}, 0))) AS p
       |         FROM toks),
       |wh AS (SELECT doc_id, CAST(p - 1 AS BIGINT) AS pos,
       |              list_reduce(list_transform(tk[p:p+${W - 1}],
       |                t -> ('0x' || substr(md5(t), 1, 8))::BIGINT % ${TextAnalysis.P}),
       |                (a, b) -> (a * ${TextAnalysis.B} + b) % ${TextAnalysis.P}) AS win_hash
       |       FROM pos_),
       |rk AS (SELECT doc_id, pos,
       |              row_number() OVER (PARTITION BY win_hash ORDER BY doc_id, pos) AS rn
       |       FROM wh),
       |dup AS (SELECT doc_id, pos FROM rk WHERE rn > 1),
       |brk AS (SELECT doc_id, pos,
       |               CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= $W
       |                    THEN 0 ELSE 1 END AS b
       |        FROM dup),
       |isl AS (SELECT doc_id, pos,
       |               sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS g
       |        FROM brk),
       |spans AS (SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
       |                 CAST(max(pos) + ${W - 1} AS BIGINT) AS span_end,
       |                 CAST(count(*) AS BIGINT) AS n_windows
       |          FROM isl GROUP BY doc_id, g)""".stripMargin

  val dupSpans: Q = Q(
    "n44_dup_spans",
    s"""$spansCte
       |SELECT doc_id, span_start, span_end, n_windows
       |FROM spans
       |ORDER BY doc_id, span_start""".stripMargin) { (s, dir) =>
    duplicateSpans(Tables(s, dir).documents)
      .orderBy("doc_id", "span_start")
  }

  /** Per-document surgery result, hash-proving the rewritten text
    * itself: token counts before/after plus the md5 of the cleaned
    * text (so the oracle checks every byte of the surgery, not just
    * the bookkeeping). */
  val substringDedup: Q = Q(
    "n45_substring_dedup",
    s"""$spansCte,
       |tok AS (SELECT doc_id, tk, unnest(generate_series(1, len(tk))) AS p
       |        FROM toks),
       |keep AS (SELECT t.doc_id, t.p, t.tk[t.p] AS tokn
       |         FROM tok t
       |         WHERE NOT EXISTS (SELECT 1 FROM spans s
       |                           WHERE s.doc_id = t.doc_id
       |                             AND t.p - 1 BETWEEN s.span_start AND s.span_end)),
       |ka AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
       |              string_agg(tokn, ' ' ORDER BY p) AS clean
       |       FROM keep GROUP BY doc_id),
       |ds AS (SELECT doc_id,
       |              CAST(sum(span_end - span_start + 1) AS BIGINT) AS n_dup
       |       FROM spans GROUP BY doc_id)
       |SELECT d.doc_id,
       |       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       |       CAST(coalesce(ds.n_dup, 0) AS BIGINT) AS n_dup_tokens,
       |       CAST(coalesce(ka.n_kept, 0) AS BIGINT) AS n_kept,
       |       md5(coalesce(ka.clean, '')) AS clean_fp
       |FROM documents d
       |LEFT JOIN ds ON ds.doc_id = d.doc_id
       |LEFT JOIN ka ON ka.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    withKept(Tables(s, dir).documents, maxDf = None)
      .select(
        col("doc_id"),
        size(col("__tk")).cast("long").as("n_tokens"),
        coalesce(col("__n_dup"), lit(0L)).as("n_dup_tokens"),
        size(col("__kept")).cast("long").as("n_kept"),
        md5(concat_ws(" ", col("__kept")).cast("binary")).as("clean_fp"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------
  // n92: span-level DECONTAMINATION surgery — the refinement of the
  // doc-level screens (n26/n39 count, st11 drops whole docs): remove
  // only the contaminated ≥W-token runs and keep the novel remainder.
  // The eval-overlap policy most pipelines actually want — dropping a
  // long document for one quoted benchmark question wastes data;
  // keeping it verbatim leaks the eval.
  // ---------------------------------------------------------------

  /** Merge matched window positions (doc_id, pos) into maximal token
    * spans — the shared gaps-and-islands chain of [[duplicateSpans]]
    * and [[contaminationSpans]]. */
  private def mergeIslands(hits: DataFrame): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    hits
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) <= W, 0L)
          .otherwise(1L))
      .withColumn("isl", sum(col("brk")).over(byDoc))
      .groupBy(col("doc_id"), col("isl"))
      .agg(
        min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(W - 1).cast("long")).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select("doc_id", "span_start", "span_end", "n_windows")
  }

  /** Maximal contaminated token spans per document: every W-token
    * window whose Rabin–Karp hash appears in `benchHashes` (a (h)
    * frame — the held-out set's window hashes, n26/n39's fingerprint),
    * merged to spans.
    *
    * Scale: the only corpus-proportional stage is the window-hash
    * stream the contamination screens already carry; the bench join is
    * hash-keyed (broadcast under st11's size cap, index-probe above
    * it) and hits are bounded by the contamination rate. */
  def contaminationSpans(docs: DataFrame, benchHashes: DataFrame): DataFrame =
    mergeIslands(
      TextAnalysis.windowHashes(docs)
        .join(benchHashes.select(col("h").as("win_hash")).distinct(),
          Seq("win_hash"), "left_semi")
        .select("doc_id", "pos"))

  /** Rewrite `text` with every contaminated span removed; other
    * columns pass through. Same map-side higher-order surgery as
    * [[dropDuplicateSpans]]. */
  def decontaminateRewrite(docs: DataFrame, benchHashes: DataFrame): DataFrame =
    withKeptSpans(docs, contaminationSpans(docs, benchHashes))
      .withColumn("text", concat_ws(" ", col("__kept")))
      .drop("__tk", "spans", "__n_dup", "__kept")

  /** [[withKept]] generalized to an explicit span frame. */
  private def withKeptSpans(docs: DataFrame, spanFrame: DataFrame): DataFrame = {
    val spans = spanFrame
      .groupBy("doc_id")
      .agg(
        collect_list(struct(
          col("span_start").as("lo"), col("span_end").as("hi"))).as("spans"),
        sum(col("span_end") - col("span_start") + 1).as("__n_dup"))
    docs
      .withColumn("__tk", split(col("text"), " ", -1))
      .join(spans, Seq("doc_id"), "left")
      .withColumn("__kept",
        when(col("spans").isNull, col("__tk")).otherwise(expr(
          "filter(__tk, (t, i) -> NOT exists(spans, sp -> i >= sp.lo AND i <= sp.hi))")))
  }

  /** Row-level twin of [[contaminationSpans]] + the surgery filter,
    * for the STREAMING gate (st13 — a stateless map over arrivals, the
    * same shape as Dedup.rowBandSigs for st05): given a doc's tokens
    * and the ascending positions of its benchmark-matched windows,
    * return the tokens outside every merged span. SpanDedupSpec pins
    * it token-for-token against the batch plan on the harness corpus,
    * so stream and batch surgery can never drift. */
  private[graft] def rowRemoveSpans(tokens: Array[String],
      matchedPos: Array[Int], w: Int = W): Array[String] = {
    if (matchedPos.isEmpty) return tokens
    val covered = new Array[Boolean](tokens.length)
    var lo = matchedPos(0)
    var hi = matchedPos(0) + w - 1
    def mark(): Unit = {
      var i = lo
      while (i <= math.min(hi, tokens.length - 1)) { covered(i) = true; i += 1 }
    }
    var k = 1
    while (k < matchedPos.length) {
      val p = matchedPos(k)
      if (p - (hi - w + 1) <= w) hi = p + w - 1 // gap ≤ W: same island
      else { mark(); lo = p; hi = p + w - 1 }
      k += 1
    }
    mark()
    tokens.indices.iterator.filterNot(covered).map(tokens).toArray
  }

  /** Entry: even docs are the benchmark, odd docs the training batch;
    * per-doc surgery result hash-proving the rewritten bytes (n45's
    * output shape — n_tokens, contaminated-token count, kept count,
    * md5 of the clean text). */
  val decontaminateSpansQ: Q = Q(
    "n92_decontaminate_rewrite",
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |pos_ AS (SELECT doc_id, tk,
       |                unnest(generate_series(1, greatest(len(tk) - ${W - 1}, 0))) AS p
       |         FROM toks),
       |wh AS (SELECT doc_id, CAST(p - 1 AS BIGINT) AS pos,
       |              list_reduce(list_transform(tk[p:p+${W - 1}],
       |                t -> ('0x' || substr(md5(t), 1, 8))::BIGINT % ${TextAnalysis.P}),
       |                (a, b) -> (a * ${TextAnalysis.B} + b) % ${TextAnalysis.P}) AS win_hash
       |       FROM pos_),
       |bench AS (SELECT DISTINCT win_hash FROM wh WHERE doc_id % 2 = 0),
       |hit AS (SELECT doc_id, pos FROM wh
       |        WHERE doc_id % 2 = 1 AND win_hash IN (SELECT win_hash FROM bench)),
       |brk AS (SELECT doc_id, pos,
       |               CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= $W
       |                    THEN 0 ELSE 1 END AS b
       |        FROM hit),
       |isl AS (SELECT doc_id, pos,
       |               sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS g
       |        FROM brk),
       |spans AS (SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
       |                 CAST(max(pos) + ${W - 1} AS BIGINT) AS span_end
       |          FROM isl GROUP BY doc_id, g),
       |tok AS (SELECT doc_id, tk, unnest(generate_series(1, len(tk))) AS p
       |        FROM toks WHERE doc_id % 2 = 1),
       |keep AS (SELECT t.doc_id, t.p, t.tk[t.p] AS tokn
       |         FROM tok t
       |         WHERE NOT EXISTS (SELECT 1 FROM spans s
       |                           WHERE s.doc_id = t.doc_id
       |                             AND t.p - 1 BETWEEN s.span_start AND s.span_end)),
       |ka AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
       |              string_agg(tokn, ' ' ORDER BY p) AS clean
       |       FROM keep GROUP BY doc_id),
       |ds AS (SELECT doc_id,
       |              CAST(sum(span_end - span_start + 1) AS BIGINT) AS n_contam
       |       FROM spans GROUP BY doc_id)
       |SELECT d.doc_id,
       |       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       |       CAST(coalesce(ds.n_contam, 0) AS BIGINT) AS n_contam_tokens,
       |       CAST(coalesce(ka.n_kept, 0) AS BIGINT) AS n_kept,
       |       md5(coalesce(ka.clean, '')) AS clean_fp
       |FROM documents d
       |LEFT JOIN ds ON ds.doc_id = d.doc_id
       |LEFT JOIN ka ON ka.doc_id = d.doc_id
       |WHERE d.doc_id % 2 = 1
       |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir).documents
    val bench = TextAnalysis.windowHashes(docs.filter(col("doc_id") % 2 === 0))
      .select(col("win_hash").as("h")).distinct()
    val train = docs.filter(col("doc_id") % 2 === 1)
    withKeptSpans(train, contaminationSpans(train, bench))
      .select(
        col("doc_id"),
        size(col("__tk")).cast("long").as("n_tokens"),
        coalesce(col("__n_dup"), lit(0L)).as("n_contam_tokens"),
        size(col("__kept")).cast("long").as("n_kept"),
        md5(concat_ws(" ", col("__kept")).cast("binary")).as("clean_fp"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(dupSpans, substringDedup, decontaminateSpansQ)
}
