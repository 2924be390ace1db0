package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.Det._

/** Persisted/incremental LEXICAL ranking index — the search-side
  * counterpart of [[IncrementalDedup]]'s dedup index and [[Pq]]'s ANN
  * index, completing the persisted-index story across all three
  * retrieval modalities. A curation service that BM25-probes its
  * corpus (contamination hunting, targeted selection, n83's query
  * shape) does not re-tokenize 100 TB per query batch: it maintains a
  * postings index at rest and scores FROM THE INDEX.
  *
  * Components (both derived from one tokenize pass over a batch):
  *   - `postings` (term, doc_id, tf): the inverted file. At rest:
  *     bucketed by term (the probe-side join key — LexIndexSpec proves
  *     the bucketed probe joins exchange-free, the IncrementalDedup
  *     layout rule).
  *   - `doclens` (doc_id, dl): document lengths; N and avgdl are one
  *     1-row aggregate away, so corpus stats never need the text.
  *
  * Append semantics: doc_ids are unique across snapshots (the n86
  * invariant), so appending a batch is a pure union of both
  * components — df/N/avgdl recomputed from the accumulated index are
  * EXACTLY the full-rebuild values. That exactness is the oracle:
  * the n91 entry builds from the even half, appends the odd half and
  * must hash-match n83's full-corpus answer computed from raw text.
  *
  * Scale shape of a probe: query terms (a bounded literal set —
  * the decontamination-lookup shape) semi-filter the postings on the
  * term key; df is an aggregate of that filtered sliver; the only
  * corpus-proportional object touched is the doclens frame (one
  * column, no text). Nothing re-reads or re-tokenizes documents. */
object LexIndex {

  /** The persistable index pair. */
  final case class Bm25Index(postings: DataFrame, doclens: DataFrame)

  /** Build from a (doc_id, text) batch: ONE tokenize pass feeds both
    * components (tf is a map-side-combinable count keyed (term,
    * doc_id); dl is a per-row projection aggregated trivially). */
  def buildIndex(docs: DataFrame): Bm25Index = {
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    Bm25Index(
      postings = toks.groupBy("term", "doc_id")
        .agg(count(lit(1)).cast("long").as("tf")),
      doclens = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("dl")))
  }

  /** Append a new batch: component unions (exact — doc_ids unique
    * across snapshots, so df/N/avgdl over the union equal the full
    * rebuild's; LexIndexSpec proves it). */
  def appendIndex(index: Bm25Index, newDocs: DataFrame): Bm25Index = {
    val b = buildIndex(newDocs)
    Bm25Index(
      postings = index.postings.unionByName(b.postings),
      doclens = index.doclens.unionByName(b.doclens))
  }

  /** Delete documents (takedowns/opt-outs) — the n93 tombstone
    * semantics, EXACT here with no conservative residue: both
    * components are doc-keyed, and df/N/avgdl are derived from them at
    * probe time, so a delete-carrying index scores identically to a
    * rebuild on the surviving corpus (LexIndexSpec pins it). */
  def deleteFromIndex(index: Bm25Index, tombstones: DataFrame): Bm25Index = {
    val dead = broadcast(tombstones.select("doc_id").distinct())
    Bm25Index(
      postings = index.postings.join(dead, Seq("doc_id"), "left_anti"),
      doclens = index.doclens.join(dead, Seq("doc_id"), "left_anti"))
  }

  /** Metadata PRE-filter of a serving index — n109's tenant/language/
    * licence scope applied to the LEXICAL family: keep only the docs
    * in `allowed` (an id-keyed metadata/ACL frame). Both components
    * are doc-keyed and df/N/avgdl derive at probe time, so the
    * filtered index scores identically to one built from the filtered
    * corpus — TENANT-SCOPED BM25 stats (the per-tenant-index
    * semantics), not shared-corpus stats; n111 oracles exactly that.
    * The left_semi dual of [[deleteFromIndex]] — but unlike a
    * tombstone set, an `allowed` set is corpus-proportional (a 20%
    * tenant of 100 TB), so NO broadcast hint: the join keys on
    * doc_id, the components' own bucketing ([[publishBucketed]])
    * co-locates it, and at rest the label belongs IN the index rows
    * where a pushed predicate prunes at scan (the n109 zone-map
    * note). */
  def filterIndex(index: Bm25Index, allowed: DataFrame): Bm25Index = {
    val keep = allowed.select("doc_id").distinct()
    Bm25Index(
      postings = index.postings.join(keep, Seq("doc_id"), "left_semi"),
      doclens = index.doclens.join(keep, Seq("doc_id"), "left_semi"))
  }

  /** Upsert a batch (insert-or-replace, keyed by doc_id) — the U in
    * the index's CRUD axis: re-ingestion of EDITED documents (a
    * re-crawl that found changed pages, a takedown-and-redact cycle
    * that reinstates cleaned text) plus brand-new docs in one batch.
    * Composition of the two exact primitives: tombstone the batch's
    * ids (a no-op for ids not yet indexed — the insert arm), then
    * append the batch's fresh components. Because the delete is exact
    * (doc-keyed components, stats derived at probe time), the result
    * scores identically to a full rebuild over the edited corpus —
    * n99 oracles exactly that. Cost: one broadcast anti-join
    * (batch-sized tombstone set) + one tokenize pass over the BATCH
    * only; the at-rest corpus is never re-read. */
  def upsertIndex(index: Bm25Index, docs: DataFrame): Bm25Index =
    appendIndex(deleteFromIndex(index, docs.select("doc_id")), docs)

  /** Write both components as parquet under `path` (the manifest-less
    * small cousin of IncrementalDedup.writeIndex — two tables, no
    * cross-component invariant to protect beyond the append rule).
    *
    * Compaction cadence (ADVICE r10 #3): materializing a
    * [[deleteFromIndex]] result MUST write to a FRESH path and swap —
    * the delete-filtered frames still read lazily from the source
    * path, and Spark refuses to overwrite a path it is reading (worse,
    * some filesystems corrupt instead of refusing). Same rule as
    * [[IncrementalDedup.compactAndRewrite]]'s pointer-flip. */
  def writeIndex(index: Bm25Index, path: String): Unit = {
    index.postings.write.mode("overwrite").parquet(s"$path/postings")
    index.doclens.write.mode("overwrite").parquet(s"$path/doclens")
  }

  def readIndex(spark: SparkSession, path: String): Bm25Index =
    Bm25Index(
      postings = spark.read.parquet(s"$path/postings"),
      doclens = spark.read.parquet(s"$path/doclens"))

  /** Publish as bucketed tables: postings by term (the probe key),
    * doclens by doc_id (the score-join key). */
  def publishBucketed(index: Bm25Index, prefix: String,
      numBuckets: Int = 32, location: Option[String] = None): Unit = {
    graft.plans.Scale.writeBucketed(index.postings, s"${prefix}_postings",
      Seq("term"), numBuckets, location)
    graft.plans.Scale.writeBucketed(index.doclens, s"${prefix}_doclens",
      Seq("doc_id"), numBuckets, location)
  }

  def readBucketed(spark: SparkSession, prefix: String): Bm25Index =
    Bm25Index(
      postings = spark.table(s"${prefix}_postings"),
      doclens = spark.table(s"${prefix}_doclens"))

  // -------------------------------------------------------------------
  // Segmented serving layout (st15's at-rest form): per-batch segment
  // directories under `base/batches/<id>`, each made visible by a
  // `base/_committed_batch_<id>` marker written after its components.
  // Serving unions the committed segments (append exactness makes the
  // union indistinguishable from a rebuild), which at 100 TB grows a
  // read-amplification tail: thousands of small segments listed,
  // opened and unioned per query. `compactServing` is the LSM answer —
  // fold the committed segments into ONE base segment, marker-last,
  // without ever blocking the ingest lane.

  // Marker parses tolerate stray non-numeric siblings (an operator's
  // `_committed_batch_1_bak` must be ignored, not crash the lane —
  // NumberFormatException escaping here would kill a streaming query).
  private def markerIds(fs: org.apache.hadoop.fs.FileSystem,
      base: String, prefix: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(base)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith(prefix)).map(_.stripPrefix(prefix))
      .filter(s => s.nonEmpty && s.forall(_.isDigit))
      .map(_.toLong).toSeq.sorted
  }

  private def committedBatchIds(fs: org.apache.hadoop.fs.FileSystem,
      base: String): Seq[Long] =
    markerIds(fs, base, "_committed_batch_")

  private def compactionUpto(fs: org.apache.hadoop.fs.FileSystem,
      base: String): Option[Long] =
    markerIds(fs, base, "_compacted_upto_").lastOption

  /** Whether `base` holds ANY committed serving segment (a compacted
    * base or a committed batch) — the explicit emptiness probe the
    * ingest lane uses instead of catching [[readServing]]'s require
    * (an exception-typed protocol would swallow unrelated errors). */
  def hasCommittedSegments(spark: SparkSession, base: String): Boolean = {
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    compactionUpto(fs, base).nonEmpty || committedBatchIds(fs, base).nonEmpty
  }

  /** Shape of the committed serving view: (number of segments the next
    * [[readServing]] will union, compaction watermark or -1). The
    * st19 lane serves these as evidence columns — the oracle pins the
    * values the LSM cadence predicts, so a fold that silently never
    * ran (n_segs too high) or a prune that broke the view flips the
    * driver hash, not just a spec.
    *
    * `excluding` removes the IN-FLIGHT batch id from the committed
    * set before counting: a lane that serves `n_segs = layout + 1`
    * (committed + the batch it is serving) and writes its own
    * `_committed_batch_` marker before its replay guard would
    * otherwise double-count that batch when a crash between the two
    * markers replays it (ADVICE r13 #1 — the st26 cross-arm window).
    * Callers whose single marker IS the replay guard never see their
    * own id committed, so the default is a no-op for them. */
  def servingLayout(spark: SparkSession, base: String,
      excluding: Option[Long] = None): (Long, Long) = {
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val upto = compactionUpto(fs, base)
    val tail = committedBatchIds(fs, base)
      .filter(id => upto.forall(id > _) && !excluding.contains(id))
    ((if (upto.isDefined) 1L else 0L) + tail.size, upto.getOrElse(-1L))
  }

  /** Committed batch segments NEWER than the compaction watermark —
    * the quantity an LSM cadence gates on (fold when the tail reaches
    * the configured fan-in). */
  def tailSegmentCount(spark: SparkSession, base: String): Int = {
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val upto = compactionUpto(fs, base)
    committedBatchIds(fs, base).count(id => upto.forall(id > _))
  }

  /** The serving view of a segmented index directory: the newest
    * compacted base segment (if any) plus every committed batch
    * segment NEWER than it. A torn compaction (components without the
    * `_compacted_upto_` marker) is invisible, exactly like a torn
    * batch. */
  def readServing(spark: SparkSession, base: String): Bm25Index = {
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val upto = compactionUpto(fs, base)
    val tail = committedBatchIds(fs, base).filter(id => upto.forall(id > _))
    val segs =
      upto.map(u => readIndex(spark, s"$base/compacted/$u")).toSeq ++
        tail.map(id => readIndex(spark, s"$base/batches/$id"))
    require(segs.nonEmpty, s"no committed segments under $base")
    segs.reduce((a, b) => Bm25Index(
      a.postings.unionByName(b.postings),
      a.doclens.unionByName(b.doclens)))
  }

  /** Fold every committed segment into one base segment at
    * `base/compacted/<maxId>`, then publish it with a marker-last
    * `_compacted_upto_<maxId>` flag. Readers before the marker see the
    * old layout; readers after see one segment plus any batches that
    * committed DURING the compaction — no reader ever blocks, no
    * serving gap. The folded batch directories stay on disk for
    * in-flight readers; `pruneCompacted` removes them once the marker
    * is visible everywhere (the two-phase delete every LSM runs).
    * Returns the compaction watermark, or None if there is nothing
    * committed to fold. */
  def compactServing(spark: SparkSession, base: String): Option[Long] = {
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val ids = committedBatchIds(fs, base)
    val prior = compactionUpto(fs, base)
    val fold = ids.filter(id => prior.forall(id > _))
    if (fold.isEmpty) prior
    else {
      val maxId = fold.max
      val segs = prior.map(u => readIndex(spark, s"$base/compacted/$u")).toSeq ++
        fold.map(id => readIndex(spark, s"$base/batches/$id"))
      val whole = segs.reduce((a, b) => Bm25Index(
        a.postings.unionByName(b.postings),
        a.doclens.unionByName(b.doclens)))
      // fresh path (never the prior compacted dir: its frames are
      // being read right here — the writeIndex swap rule)
      writeIndex(whole, s"$base/compacted/$maxId")
      fs.create(new org.apache.hadoop.fs.Path(
        s"$base/_compacted_upto_$maxId"), true).close()
      Some(maxId)
    }
  }

  /** Second phase of the compaction's two-phase delete: drop folded
    * batch segment DATA dirs (and older compacted bases) at or below
    * the newest compaction watermark. Safe once no reader holds the
    * pre-marker view. The `_committed_batch_` markers are kept — they
    * are the ingest lane's at-least-once replay guard (a redelivered
    * batch id must stay skippable forever), and both the serving read
    * and the next compaction already exclude ids ≤ the watermark. */
  def pruneCompacted(spark: SparkSession, base: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    compactionUpto(fs, base).foreach { upto =>
      committedBatchIds(fs, base).filter(_ <= upto).foreach { id =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$base/batches/$id"), true)
      }
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$base/compacted"))
        .map(_.getPath.getName).filter(n => n.nonEmpty && n.forall(_.isDigit))
        .map(_.toLong).filter(_ < upto)
        .foreach(u => fs.delete(
          new org.apache.hadoop.fs.Path(s"$base/compacted/$u"), true))
      // superseded compaction watermarks go with the bases they
      // described — only the max marker is ever meaningful, and on a
      // compact-regularly lane the root listing must stay bounded
      // (batch replay markers, by contrast, are kept forever: they are
      // the ingest lane's at-least-once skip guard)
      markerIds(fs, base, "_compacted_upto_").filter(_ < upto)
        .foreach(u => fs.delete(
          new org.apache.hadoop.fs.Path(s"$base/_compacted_upto_$u"), false))
    }
  }

  /** BM25 top-k FROM THE INDEX: identical math (and identical
    * determinism rules — round6 per contribution, DECIMAL sum, (score
    * desc, doc_id) ties) to [[TextAnalysis.bm25TopK]], but every input
    * frame comes from the index; the corpus text is never touched.
    * queries = (q_id, term) bags. */
  def bm25FromIndex(index: Bm25Index, queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // Literal query sets (the decontamination-lookup shape: a bounded
    // in-memory (q_id, term) bag) become a PUSHED-DOWN In() predicate
    // on the postings scan instead of a broadcast-join stage (round
    // 15, guide §6): the term filter then prunes at the parquet reader
    // (PushedFilters: In(term, ...)) — and one fewer broadcast
    // exchange per probe. Frames that are not literal (a term table
    // computed by a query) keep the broadcast semi-join; inner-join on
    // distinct terms ≡ term IN (set) row for row.
    val literalTerms: Option[Seq[String]] =
      queries.queryExecution.optimizedPlan match {
        case lr: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
          val i = lr.output.indexWhere(_.name == "term")
          if (i < 0) None
          else Some(lr.data.map(_.getUTF8String(i))
            .filter(_ != null).map(_.toString).distinct)
        case _ => None
      }
    val tf = literalTerms match {
      case Some(ts) => index.postings.filter(col("term").isin(ts: _*))
      case None =>
        val terms = queries.select("term").distinct()
        index.postings.join(broadcast(terms), Seq("term"))
    }
    val stats = index.doclens.agg(count(lit(1)).as("n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    // df as a window count over the sliver (round 15, guide §2.3/§2.4):
    // (term, doc_id) is unique in every index's postings (the build
    // groupBy + the append/serving views' latest-segment resolution),
    // so count-rows-per-term ≡ count_distinct(doc_id) per term — one
    // exchange on term instead of the old self-aggregate + join-back,
    // and the postings sliver is scanned once, not twice.
    val contrib = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .join(index.doclens, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .join(queries, Seq("term"))
      .select(col("q_id"), col("doc_id"),
        round6(
          log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)) *
            (col("tf") * (k1 + 1.0)) /
            (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / col("avgdl"))))
          .as("c"))
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("doc_id"))
    // one exchange for the score aggregate AND the rank window (round
    // 15, guide §2.4): hash(q_id) satisfies the (q_id, doc_id)
    // grouping (subset clustering) and the window partitioning — the
    // old plan exchanged twice; the DECIMAL score sum is
    // partition-order invariant, so results are bit-identical
    contrib.repartition(col("q_id"))
      .groupBy("q_id", "doc_id")
      .agg(dsum(col("c")).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** n91: build the index from the even half, APPEND the odd half,
    * score the n83 query set from the accumulated index — the oracle
    * is n83's full-corpus answer computed from raw text, so one wrong
    * df, a lost posting row, or a stats drift anywhere in
    * build/append/score flips the hash. */
  /** Shared DuckDB twin body for the index-scoring entries: BM25
    * top-`k` from raw text over `corpus` (a derived view of
    * `documents`) — one SQL definition so n91 (full corpus), n97
    * (post-tombstone survivors) and n99 (post-upsert text) cannot
    * drift. `corpusSelect` is the view body: a doc_id/text SELECT.
    * The core form omits the final ORDER BY so [[bm25SnapshotSql]]
    * can UNION snapshot branches (DuckDB accepts a WITH chain inside
    * each derived-table branch). */
  private[graft] def bm25SqlCore(k: Int, corpusSelect: String): String = {
    val qVals = TextAnalysis.bm25QuerySet
      .map { case (q, t) => s"($q, '$t')" }.mkString(", ")
    s"""WITH q(q_id, term) AS (VALUES $qVals),
       |corpus AS ($corpusSelect),
       |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM corpus),
       |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       |       FROM tok WHERE term IN (SELECT term FROM q)
       |       GROUP BY doc_id, term),
       |dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
       |dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
       |       FROM corpus),
       |st AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
       |sc AS (SELECT q.q_id, t.doc_id,
       |              ${round6Sql(
             "ln(1.0 + (st.n - dfreq.df + 0.5) / (dfreq.df + 0.5)) * " +
             "(t.tf * (1.2 + 1.0)) / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / st.avgdl))")} AS c
       |       FROM tf t JOIN dfreq USING (term) JOIN dl USING (doc_id)
       |       CROSS JOIN st JOIN q ON q.term = t.term),
       |agg AS (SELECT q_id, doc_id, ${dsumSql("c")} AS score
       |        FROM sc GROUP BY q_id, doc_id),
       |rk AS (SELECT q_id, doc_id, score,
       |              row_number() OVER (PARTITION BY q_id
       |                                 ORDER BY score DESC, doc_id) AS rank
       |       FROM agg)
       |SELECT CAST(q_id AS BIGINT) AS q_id, CAST(rank AS BIGINT) AS rank,
       |       doc_id, score
       |FROM rk WHERE rank <= $k""".stripMargin
  }

  private def bm25SqlBody(k: Int, corpusSelect: String): String =
    bm25SqlCore(k, corpusSelect) + "\nORDER BY q_id, rank"

  private def bm25SqlFor(k: Int, corpusWhere: String): String =
    bm25SqlBody(k, s"SELECT doc_id, text FROM documents WHERE $corpusWhere")

  /** DuckDB twin for SNAPSHOT-VERSIONED serving (st15's batch twin):
    * one BM25 branch per committed snapshot — branch `i` scores the
    * corpus prefix `where`, tagged `snap = i` — unioned with a total
    * order. Every intermediate commit of the append chain is
    * hash-attested, not just the final state. */
  private[graft] def bm25SnapshotSql(k: Int, snaps: Seq[String]): String = {
    val branches = snaps.zipWithIndex.map { case (where, i) =>
      s"SELECT CAST($i AS BIGINT) AS snap, * FROM (\n" +
        bm25SqlCore(k, s"SELECT doc_id, text FROM documents WHERE $where") +
        "\n)"
    }
    branches.mkString("", "\nUNION ALL\n", "\nORDER BY snap, q_id, rank")
  }

  /** DuckDB twin for the COMPACTING serving ladder (st19's batch
    * twin): [[bm25SnapshotSql]] plus per-branch layout evidence —
    * `(where, n_segs, base_upto)` per snapshot, the values the LSM
    * cadence (fold every `compactEvery` tail segments, prune after)
    * independently predicts. The Spark side reads n_segs/base_upto
    * from the ACTUAL on-disk layout at serve time, so the hash attests
    * both the answers and that the fold/prune really happened when the
    * cadence says they must. */
  private[graft] def bm25CompactSnapshotSql(
      k: Int, snaps: Seq[(String, Long, Long)]): String = {
    val branches = snaps.zipWithIndex.map { case ((where, nSegs, upto), i) =>
      s"SELECT CAST($i AS BIGINT) AS snap, CAST($nSegs AS BIGINT) AS n_segs," +
        s" CAST($upto AS BIGINT) AS base_upto, * FROM (\n" +
        bm25SqlCore(k, s"SELECT doc_id, text FROM documents WHERE $where") +
        "\n)"
    }
    branches.mkString("", "\nUNION ALL\n", "\nORDER BY snap, q_id, rank")
  }

  // -------------------------------------------------------------------
  // Takedown-aware serving (st21): the segmented layout plus a per-batch
  // OPS LOG under `base/ops/<id>` recording (doc_id, op ∈ add|del). The
  // serving view resolves document liveness CDC-style — last operation
  // wins, with the add arm winning a same-batch tie (st14's
  // takedown-first-then-re-insert rule) — and serves each live doc's
  // postings from its LATEST add segment only (n99's upsert semantics:
  // a re-inserted doc must not double its term frequencies by
  // surviving in two segments). Because df/N/avgdl are derived from
  // the surviving components at probe time (the n97 exactness
  // argument), the takedown-filtered view scores identically to a
  // full rebuild over the live corpus.

  /** The serving view of a segmented index with an ops log:
    * (live index, dead count). Liveness per doc: latest add batch ≥
    * latest del batch (ties → add). Dead = ever-added docs currently
    * taken down — the evidence the st21 lane serves per snapshot.
    *
    * Scale shape: the ops log is takedown-traffic-sized (tiny next to
    * the corpus); liveness is a doc-keyed aggregation of it, and the
    * (doc_id, batch)-keyed join against segment components co-locates
    * with the doc-bucketed layout — no corpus re-tokenization, no
    * corpus-proportional driver state. */
  def readTakedownServing(spark: SparkSession, base: String,
      extraId: Option[Long] = None): (Bm25Index, Long) = {
    val (idx, _, nDead) = readTakedownServingDetail(spark, base, extraId)
    (idx, nDead)
  }

  /** [[readTakedownServing]] plus the resolved DEAD id frame — for
    * callers (the hybrid lane) that feed the same liveness resolution
    * to a second index family; pre-round-15 they re-derived the whole
    * ops fold a third time. */
  private[graft] def readTakedownServingDetail(spark: SparkSession,
      base: String, extraId: Option[Long] = None): (Bm25Index, DataFrame, Long) = {
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // extraId: the ingest lane's own in-flight batch — components
    // written but marker not yet (the marker-last torn-batch contract
    // requires serving BEFORE committing)
    val ids = (committedBatchIds(fs, base) ++ extraId).distinct.sorted
    require(ids.nonEmpty, s"no committed segments under $base")
    def tagged(id: Long): Bm25Index = {
      val ix = readIndex(spark, s"$base/batches/$id")
      Bm25Index(ix.postings.withColumn("src", lit(id)),
        ix.doclens.withColumn("src", lit(id)))
    }
    val segs = ids.map(tagged).reduce((a, b) => Bm25Index(
      a.postings.unionByName(b.postings),
      a.doclens.unionByName(b.doclens)))
    // materialized once (round 15): the id-sized liveness proxy feeds
    // the dead count AND both component joins of the serving view —
    // see readTakedownCompactServing's note
    val lastOps = opsLogLiveness(spark, base, ids).localCheckpoint()
    val alive = lastOps.filter(col("last_add").isNotNull &&
      (col("last_del").isNull || col("last_add") >= col("last_del")))
      .select(col("doc_id"), col("last_add").as("src"))
    val dead = deadDocs(lastOps)
    (Bm25Index(
      segs.postings.join(alive, Seq("doc_id", "src")).drop("src"),
      segs.doclens.join(alive, Seq("doc_id", "src")).drop("src")),
      dead, dead.count())
  }

  /** Last-op-wins liveness resolution of an ops frame
    * ((doc_id, op, batch)): (doc_id, last_add, last_del). THE single
    * derivation every consumer of an ops log must share — the BM25
    * serving view above, the hybrid lane's ANN arm (st23) and the
    * compacting-takedown view (st24) all fold this frame, so no two
    * consumers can disagree about which documents are alive. */
  def livenessOf(ops: DataFrame): DataFrame =
    ops.groupBy("doc_id").agg(
      max(when(col("op") === "add", col("batch"))).as("last_add"),
      max(when(col("op") === "del", col("batch"))).as("last_del"))

  /** [[livenessOf]] over the `base/ops/<id>` log for the given batch
    * ids. */
  def opsLogLiveness(spark: SparkSession, base: String,
      ids: Seq[Long]): DataFrame = {
    require(ids.nonEmpty, s"no ops batches under $base")
    livenessOf(ids.map(id => spark.read.parquet(s"$base/ops/$id")
        .select(col("doc_id"), col("op"), lit(id).as("batch")))
      .reduce(_ unionByName _))
  }

  /** The dead set of a liveness frame: ever-added docs currently taken
    * down — the `n_dead` evidence and the ANN arm's tombstone input. */
  def deadDocs(lastOps: DataFrame): DataFrame =
    lastOps.filter(col("last_add").isNotNull &&
      col("last_del").isNotNull && col("last_del") > col("last_add"))
      .select("doc_id")

  /** Committed (and optionally one in-flight) batch ids of a takedown
    * serving tree — the id list [[opsLogLiveness]] folds. */
  def takedownBatchIds(spark: SparkSession, base: String,
      extraId: Option[Long] = None): Seq[Long] = {
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    (committedBatchIds(fs, base) ++ extraId).distinct.sorted
  }

  // -------------------------------------------------------------------
  // Takedown-aware COMPACTION (st24): the fold that makes the right to
  // be forgotten PHYSICAL. The takedown serving view above is exact but
  // conservative on disk — a tombstoned doc's postings stay in their
  // segment, and the tombstone itself lives in the ops log forever,
  // which at 100 TB is both a read-amplification tail AND a compliance
  // leak (the retained doc_id of a deletion request is itself data to
  // forget). The LSM fold is where both die: it materializes the
  // liveness-resolved view (live docs only, each from its latest add
  // segment) as the new base at `base/compacted/<maxId>`, re-stamps the
  // survivors' liveness as `base/ops_base/<maxId>` (doc_id only — adds
  // at the watermark), and the two-phase prune then drops the folded
  // segment dirs, the folded ops logs (tombstones included) and the
  // superseded base. Replay markers are kept (the at-least-once skip
  // guard never references doc content).

  /** The serving view of a compacting takedown tree: newest compacted
    * base (live-only by construction, stamped at the watermark) plus
    * tail batches and tail ops, liveness re-resolved across both —
    * exactly [[readTakedownServing]]'s contract on the folded layout.
    * Returns (live index, n_dead, n_dead_on_disk): `n_dead` counts
    * docs the CURRENT view knows to be dead (tombstones the fold has
    * GC'd no longer count — the forget, hash-attested as the evidence
    * trajectory dropping); `n_dead_on_disk` counts dead docs whose
    * rows still physically sit in a surviving segment dir — the
    * quantity the next fold will zero. */
  def readTakedownCompactServing(spark: SparkSession, base: String,
      extraId: Option[Long] = None): (Bm25Index, Long, Long) = {
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val upto = compactionUpto(fs, base)
    val tail = (committedBatchIds(fs, base) ++ extraId).distinct.sorted
      .filter(id => upto.forall(id > _))
    val ops = (upto.map(u => spark.read.parquet(s"$base/ops_base/$u")
        .select(col("doc_id"), lit("add").as("op"), lit(u).as("batch"))).toSeq ++
      tail.map(id => spark.read.parquet(s"$base/ops/$id")
        .select(col("doc_id"), col("op"), lit(id).as("batch"))))
      .reduce(_ unionByName _)
    // round 15 (guide §1.2/§5): the liveness fold is the subtree EVERY
    // consumer of this view re-derives — the serve's two component
    // joins, both evidence counts, and (pre-round-15) a second full
    // view construction inside the fold. Materialize it once: it is
    // the id-sized PROXY frame (doc_id + two batch longs — the
    // "decide with small rows" object of guide §8), never the
    // corpus-sized postings, so pinning it is production-shaped.
    val lastOps = livenessOf(ops).localCheckpoint()
    val alive = lastOps.filter(col("last_add").isNotNull &&
      (col("last_del").isNull || col("last_add") >= col("last_del")))
      .select(col("doc_id"), col("last_add").as("src"))
    val dead = deadDocs(lastOps)
    def tagged(path: String, src: Long): Bm25Index = {
      val ix = readIndex(spark, path)
      Bm25Index(ix.postings.withColumn("src", lit(src)),
        ix.doclens.withColumn("src", lit(src)))
    }
    val segList = upto.map(u => tagged(s"$base/compacted/$u", u)).toSeq ++
      tail.map(id => tagged(s"$base/batches/$id", id))
    require(segList.nonEmpty, s"no committed segments under $base")
    val segs = segList.reduce((a, b) => Bm25Index(
      a.postings.unionByName(b.postings),
      a.doclens.unionByName(b.doclens)))
    // both evidence numbers in ONE job (round 15, guide §1.2 — the old
    // two counts each re-ran the ops fold and the segment listing):
    // nDead = |dead|; nDeadOnDisk = |dead ∩ segment doc_ids| — count
    // of non-null markers after a left join of dead against the
    // distinct segment ids. dead is distinct by construction (a
    // groupBy output), so row counts are set sizes.
    val segDocs = segs.doclens.select("doc_id").distinct()
      .withColumn("__on_disk", lit(1))
    val cnt = dead.join(segDocs, Seq("doc_id"), "left")
      .agg(count(lit(1)).as("n_dead"), count(col("__on_disk")).as("n_disk"))
      .head()
    (Bm25Index(
      segs.postings.join(alive, Seq("doc_id", "src")).drop("src"),
      segs.doclens.join(alive, Seq("doc_id", "src")).drop("src")),
      cnt.getLong(0), cnt.getLong(1))
  }

  /** Fold a compacting takedown tree: materialize the liveness-resolved
    * view as the new base (dead docs' rows are NOT copied — this is
    * the physical removal), write the survivors' liveness summary to
    * `ops_base/<maxId>`, publish marker-last. The folded batch dirs,
    * their ops logs (the tombstone GC) and the superseded base stay on
    * disk for in-flight readers until [[pruneTakedownCompacted]] — the
    * same two-phase delete [[compactServing]] runs. Returns the new
    * watermark, or the prior one when there is nothing to fold. */
  def compactTakedownServing(spark: SparkSession,
      base: String): Option[Long] =
    compactTakedownServing(spark, base, None)

  /** `precomputed`: the caller's just-served liveness-resolved view,
    * reusable when NO ops batch was committed or folded between the
    * serve's read and this fold (the serving lanes' structure: serve
    * with the in-flight id as `extraId`, write the replay marker, fold
    * — the committed set the fold sees is exactly the set the serve
    * resolved). Passing it skips a second full view construction
    * (round 15, guide §1.2: the fold re-derived every segment scan +
    * liveness join the serve had just executed). */
  private[graft] def compactTakedownServing(spark: SparkSession,
      base: String, precomputed: Option[Bm25Index]): Option[Long] = {
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val prior = compactionUpto(fs, base)
    val fold = committedBatchIds(fs, base).filter(id => prior.forall(id > _))
    if (fold.isEmpty) prior
    else {
      val maxId = fold.max
      val live = precomputed
        .getOrElse(readTakedownCompactServing(spark, base)._1)
      // fresh path (never the prior base: its frames are being read
      // right here — the writeIndex swap rule)
      writeIndex(live, s"$base/compacted/$maxId")
      // survivors summary = the doc ids of the base we JUST
      // materialized — read back from the committed artifact instead
      // of re-running the live view's segment scans + liveness join a
      // third time (round 15; same bytes by construction)
      spark.read.parquet(s"$base/compacted/$maxId/doclens")
        .select("doc_id")
        .write.mode("overwrite").parquet(s"$base/ops_base/$maxId")
      fs.create(new org.apache.hadoop.fs.Path(
        s"$base/_compacted_upto_$maxId"), true).close()
      Some(maxId)
    }
  }

  /** Second phase of the takedown fold's two-phase delete:
    * [[pruneCompacted]]'s sweep plus the ops GC — folded `ops/<id>`
    * logs (tombstoned doc_ids included) and superseded `ops_base`
    * summaries are dropped. `_committed_batch_` markers are kept: the
    * at-least-once replay guard carries batch ids only, never doc
    * content, so it is not a compliance surface. */
  def pruneTakedownCompacted(spark: SparkSession, base: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    pruneCompacted(spark, base)
    compactionUpto(fs, base).foreach { upto =>
      committedBatchIds(fs, base).filter(_ <= upto).foreach { id =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$base/ops/$id"), true)
      }
      val ob = new org.apache.hadoop.fs.Path(s"$base/ops_base")
      if (fs.exists(ob))
        fs.listStatus(ob).map(_.getPath.getName)
          .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong)
          .filter(_ < upto)
          .foreach(u => fs.delete(
            new org.apache.hadoop.fs.Path(s"$base/ops_base/$u"), true))
    }
  }

  /** DuckDB twin for COMPACTING TAKEDOWN serving (st24's batch twin):
    * one BM25 branch per snapshot over the LIVE corpus predicate, plus
    * FOUR evidence columns — the layout the LSM cadence predicts
    * (n_segs, base_upto) and the two dead counts (n_dead: what the
    * post-GC view still knows to be dead; n_dead_disk: dead rows
    * physically surviving in segment dirs). The forget is the
    * trajectory: a tombstone the fold ate stops counting, and a fold
    * that silently kept dead rows (or never ran) flips the hash. */
  private[graft] def bm25TakedownCompactSnapshotSql(k: Int,
      snaps: Seq[(String, String, String, Long, Long)]): String = {
    val branches = snaps.zipWithIndex.map {
      case ((live, dead, deadDisk, nSegs, upto), i) =>
        s"SELECT CAST($i AS BIGINT) AS snap," +
          s" CAST($nSegs AS BIGINT) AS n_segs," +
          s" CAST($upto AS BIGINT) AS base_upto," +
          s" CAST((SELECT count(*) FROM documents WHERE $dead) AS BIGINT)" +
          " AS n_dead," +
          s" CAST((SELECT count(*) FROM documents WHERE $deadDisk) AS BIGINT)" +
          " AS n_dead_disk, * FROM (\n" +
          bm25SqlCore(k, s"SELECT doc_id, text FROM documents WHERE $live") +
          "\n)"
    }
    branches.mkString("", "\nUNION ALL\n", "\nORDER BY snap, q_id, rank")
  }

  /** DuckDB twin for TAKEDOWN-AWARE serving (st21's batch twin): one
    * BM25 branch per snapshot over the LIVE corpus predicate, plus the
    * dead-count evidence the lane reads from its ops log — so a
    * takedown that kept serving, a re-insert that never came back (or
    * came back double-counted), or a liveness rule drifting from
    * last-op-wins all flip the driver hash. */
  private[graft] def bm25TakedownSnapshotSql(
      k: Int, snaps: Seq[(String, String)]): String = {
    val branches = snaps.zipWithIndex.map { case ((live, dead), i) =>
      s"SELECT CAST($i AS BIGINT) AS snap, " +
        s"CAST((SELECT count(*) FROM documents WHERE $dead) AS BIGINT) AS n_dead," +
        " * FROM (\n" +
        bm25SqlCore(k, s"SELECT doc_id, text FROM documents WHERE $live") +
        "\n)"
    }
    branches.mkString("", "\nUNION ALL\n", "\nORDER BY snap, q_id, rank")
  }

  /** The accumulated (even-build + odd-append) index, shared by n91
    * and n97 — the serving path both score from. */
  private def accumulatedIndex(s: SparkSession, dir: String): Bm25Index = {
    val docs = Tables(s, dir).documents
    appendIndex(buildIndex(docs.filter(col("doc_id") % 2 === 0)),
      docs.filter(col("doc_id") % 2 === 1))
  }

  val bm25IndexQ: Q =
    Q("n91_bm25_index", bm25SqlFor(10, "TRUE")) { (s, dir) =>
      import s.implicits._
      val queries = TextAnalysis.bm25QuerySet.toDF("q_id", "term")
      bm25FromIndex(accumulatedIndex(s, dir), queries, 10)
        .select(col("q_id"), col("rank"), col("doc_id"), col("score"))
        .orderBy("q_id", "rank")
    }

  /** n97: tombstone-deleted BM25 index, driver-hash-attested (the
    * delete axis was spec-pinned only — LexIndexSpec's delete ==
    * rebuild — since round 10; this entry puts the claim through the
    * DuckDB gate like n93 did for the dedup index). Build + append the
    * full index, DELETE doc_id ≡ 0 (mod 4), score the n83 query set:
    * the oracle computes BM25 from raw text over the SURVIVORS only,
    * so a tombstoned posting leaking into tf, a stale df, or N/avgdl
    * still counting deleted docs flips the hash — the corpus stats are
    * derived from the doc-keyed components at probe time, which is
    * exactly why the delete is exact with no conservative residue. */
  val bm25DeleteQ: Q =
    Q("n97_bm25_delete", bm25SqlFor(10, "doc_id % 4 <> 0")) { (s, dir) =>
      import s.implicits._
      val tombstones = Tables(s, dir).documents
        .filter(col("doc_id") % 4 === 0).select("doc_id")
      val queries = TextAnalysis.bm25QuerySet.toDF("q_id", "term")
      bm25FromIndex(deleteFromIndex(accumulatedIndex(s, dir), tombstones),
        queries, 10)
        .select(col("q_id"), col("rank"), col("doc_id"), col("score"))
        .orderBy("q_id", "rank")
    }

  /** n99: UPSERTED BM25 index — the U axis completing the index's
    * CRUD story (C=build/append n91, R=probe, D=tombstone n97). The
    * base index deliberately omits the ≡ 3 (mod 4) docs; the upsert
    * batch then carries BOTH arms at once: REPLACE (docs ≡ 2 (mod 5)
    * already indexed, re-ingested with edited text — doubled, so tf
    * and dl change but the term set does not: a leaked stale posting
    * is indistinguishable from a correct one except through the
    * score) and INSERT (the ≡ 3 (mod 4) docs, whose tombstone
    * pre-delete must be a no-op). The oracle computes BM25 from raw
    * text over the EDITED corpus (CASE-doubled text), so a stale tf
    * surviving the replace, a double-counted doc inflating N/avgdl,
    * or an insert dropped by its own no-op delete flips the hash. */
  val bm25UpsertQ: Q =
    Q("n99_bm25_upsert", bm25SqlBody(10,
      "SELECT doc_id, CASE WHEN doc_id % 5 = 2 THEN text || ' ' || text " +
        "ELSE text END AS text FROM documents")) { (s, dir) =>
      import s.implicits._
      val docs = Tables(s, dir).documents
      val base = appendIndex(
        buildIndex(docs.filter(col("doc_id") % 2 === 0)),
        docs.filter(col("doc_id") % 2 === 1 && col("doc_id") % 4 =!= 3))
      val batch = docs
        .filter(col("doc_id") % 5 === 2 || col("doc_id") % 4 === 3)
        .withColumn("text",
          when(col("doc_id") % 5 === 2, concat(col("text"), lit(" "), col("text")))
            .otherwise(col("text")))
      val queries = TextAnalysis.bm25QuerySet.toDF("q_id", "term")
      bm25FromIndex(upsertIndex(base, batch), queries, 10)
        .select(col("q_id"), col("rank"), col("doc_id"), col("score"))
        .orderBy("q_id", "rank")
    }

  /** n95: fused INDEX-SERVING retrieval (VERDICT r10 #3) — the
    * production composition n90 deliberately did not exercise: BOTH
    * fusion arms on the scale path, no exact corpus-proportional
    * cosine stage anywhere.
    *
    *   - Lexical arm: [[bm25FromIndex]] over the accumulated postings
    *     index (built from the even half, appended with the odd —
    *     n91's serving cadence). Query terms semi-filter the postings;
    *     the corpus text is never re-tokenized at query time.
    *   - Semantic arm: n13's IVF serving path (first-16 anchors, the
    *     oracle-locked configuration; nprobe 4) — each query
    *     exact-reranks only its probed cells' members, ~nprobe/ncells
    *     of brute force. Query vectors are the query ids' embeddings
    *     (vec_id == doc_id by corpus construction, the n90 id bridge).
    *   - Fusion: [[Similarity.rrfFuse]] — RRF with the paper's
    *     absent-system convention, fixed-order two-term sum, id ties.
    *
    * The oracle regenerates both arms and the fusion in DuckDB from
    * raw tables, so a drift anywhere — one BM25 df off, one IVF cell
    * misassigned, a fused rank swapped — flips the hash. At 100 TB the
    * only corpus-proportional work is the one-time index build
    * (postings publish + IVF assignment), both at-rest components;
    * per-query cost is query-df-bounded (lexical) plus
    * probed-cell-bounded (semantic). */
  val fusedServingQ: Q = {
    val depth = Similarity.HybridDepth
    val out = Similarity.HybridOut
    val nCells = 16
    val nProbe = 4
    val qVals = TextAnalysis.bm25QuerySet
      .map { case (q, t) => s"($q, '$t')" }.mkString(", ")
    val qIds = TextAnalysis.bm25QuerySet.map(_._1).distinct.sorted
    def dot(a: String, b: String): String =
      s"list_sum(list_transform(generate_series(1, 64), " +
        s"i -> CAST($a.embedding[i] AS DOUBLE) * $b.embedding[i]))"
    Q(
      "n95_fused_serving",
      s"""WITH q(q_id, term) AS (VALUES $qVals),
         |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
         |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         |       FROM tok WHERE term IN (SELECT term FROM q)
         |       GROUP BY doc_id, term),
         |dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
         |dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
         |       FROM documents),
         |st AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
         |sc AS (SELECT q.q_id, t.doc_id,
         |              ${round6Sql(
               "ln(1.0 + (st.n - dfreq.df + 0.5) / (dfreq.df + 0.5)) * " +
               "(t.tf * (1.2 + 1.0)) / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / st.avgdl))")} AS c
         |       FROM tf t JOIN dfreq USING (term) JOIN dl USING (doc_id)
         |       CROSS JOIN st JOIN q ON q.term = t.term),
         |agg AS (SELECT q_id, doc_id, ${dsumSql("c")} AS score
         |        FROM sc GROUP BY q_id, doc_id),
         |lexk AS (SELECT q_id, doc_id AS cand, r FROM (
         |           SELECT q_id, doc_id,
         |                  row_number() OVER (PARTITION BY q_id
         |                                     ORDER BY score DESC, doc_id) AS r
         |           FROM agg) WHERE r <= $depth),
         |e AS (SELECT vec_id, embedding,
         |             sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
         |      FROM embeddings),
         |c AS (SELECT vec_id AS cent_id, embedding, nrm FROM e WHERE vec_id < $nCells),
         |asg AS (SELECT vec_id, cell FROM (
         |    SELECT e.vec_id, c.cent_id AS cell,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${round6Sql(s"${dot("e", "c")} / (e.nrm * c.nrm)")} DESC,
         |                      c.cent_id) AS arn
         |    FROM e CROSS JOIN c) WHERE arn = 1),
         |probes AS (SELECT q_id, cell FROM (
         |    SELECT e.vec_id AS q_id, c.cent_id AS cell,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${round6Sql(s"${dot("e", "c")} / (e.nrm * c.nrm)")} DESC,
         |                      c.cent_id) AS prn
         |    FROM e CROSS JOIN c
         |    WHERE e.vec_id IN (SELECT q_id FROM q)) WHERE prn <= $nProbe),
         |pairs AS (SELECT p.q_id, a.vec_id AS nb_id,
         |                 ${round6Sql(s"${dot("qe", "ne")} / (qe.nrm * ne.nrm)")} AS cos
         |          FROM probes p
         |          JOIN asg a ON a.cell = p.cell AND a.vec_id <> p.q_id
         |          JOIN e ne ON ne.vec_id = a.vec_id
         |          JOIN e qe ON qe.vec_id = p.q_id),
         |semk AS (SELECT q_id, nb_id AS cand, r FROM (
         |           SELECT q_id, nb_id,
         |                  row_number() OVER (PARTITION BY q_id
         |                                     ORDER BY cos DESC, nb_id) AS r
         |           FROM pairs) WHERE r <= $depth),
         |fused AS (SELECT COALESCE(l.q_id, s.q_id) AS q_id,
         |                 COALESCE(l.cand, s.cand) AS cand,
         |                 ${round6Sql(
               s"COALESCE(1.0 / (${Similarity.RrfK} + l.r), 0) + " +
               s"COALESCE(1.0 / (${Similarity.RrfK} + s.r), 0)")} AS rrf
         |          FROM lexk l FULL JOIN semk s
         |            ON s.q_id = l.q_id AND s.cand = l.cand)
         |SELECT CAST(q_id AS BIGINT) AS q_id, cand, rrf,
         |       CAST(rrf_rank AS BIGINT) AS rrf_rank FROM (
         |  SELECT q_id, cand, rrf,
         |         row_number() OVER (PARTITION BY q_id
         |                            ORDER BY rrf DESC, cand) AS rrf_rank
         |  FROM fused) WHERE rrf_rank <= $out
         |ORDER BY q_id, rrf_rank""".stripMargin) { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val queries = TextAnalysis.bm25QuerySet.toDF("q_id", "term")
      // the SAME accumulated serving index n91/n97 score from — a
      // drifted serving cadence here would silently change what this
      // entry's oracle attests
      val lexk = bm25FromIndex(accumulatedIndex(s, dir), queries, depth)
        .select(col("q_id"), col("doc_id").as("cand"), col("rank").as("r"))
      val e = t.embeddings
      val cents = e.filter(col("vec_id") < nCells)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cv"))
      val semk = Similarity.ivfSearch(e, cents,
          e.filter(col("vec_id").isin(qIds: _*)), nProbe, depth, useHeap = false)
        .select(col("q_id"), col("nb_id").as("cand"), col("rn").as("r"))
      Similarity.rrfFuse(lexk, semk, out)
        .select("q_id", "cand", "rrf", "rrf_rank")
        .orderBy("q_id", "rrf_rank")
    }
  }

  /** n111: metadata-FILTERED hybrid serving (VERDICT r12 #5) — the
    * tenant-scoped production query: n109's metadata pre-filter on
    * BOTH of n95's fusion arms, then RRF. The filter is an id-keyed
    * metadata frame (embeddings.label % 5 = 2, ~20% of the corpus;
    * vec_id == doc_id, the n90 id bridge — the ACL-table shape).
    *
    *   - Lexical arm: [[filterIndex]] over the n91/n95 accumulated
    *     serving index, then [[bm25FromIndex]] — a PRE-filter, so
    *     df/N/avgdl are the TENANT corpus's stats (the per-tenant-
    *     index semantics; a post-filter of shared-corpus ranks would
    *     both under-fill the depth and score against the wrong N).
    *   - Semantic arm: n109's filtered IVF path — the predicate lands
    *     on the candidate side BEFORE any distance work (selectivity ·
    *     nprobe/ncells of brute force), assignment under the
    *     unfiltered first-16 anchors (filter-then-assign ≡
    *     assign-then-filter, per-vector). Queries are NOT filtered —
    *     a query comes from anywhere; its answers must be in-tenant.
    *   - Fusion: [[Similarity.rrfFuse]], n95's depths.
    *
    * The oracle re-derives both FILTERED arms and the fusion from raw
    * tables, so a one-sided filter (tenant honored lexically, leaked
    * semantically — the production bug this entry exists to catch)
    * moves the fused ranking and flips the hash. */
  val filteredHybridQ: Q = {
    val depth = Similarity.HybridDepth
    val out = Similarity.HybridOut
    val nCells = 16
    val nProbe = 4
    val filterWhere = "label % 5 = 2"
    val qIds = TextAnalysis.bm25QuerySet.map(_._1).distinct.sorted
    val qIdsCsv = qIds.mkString(", ")
    def dot(a: String, b: String): String =
      s"list_sum(list_transform(generate_series(1, 64), " +
        s"i -> CAST($a.embedding[i] AS DOUBLE) * $b.embedding[i]))"
    Q(
      "n111_filtered_hybrid",
      s"""WITH lexk AS (SELECT q_id, doc_id AS cand, rank AS r FROM (
         |${bm25SqlCore(depth,
           "SELECT d.doc_id, d.text FROM documents d " +
             s"JOIN embeddings em ON em.vec_id = d.doc_id WHERE em.$filterWhere")}
         |)),
         |e AS (SELECT vec_id, label, embedding,
         |             sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
         |      FROM embeddings),
         |c AS (SELECT vec_id AS cent_id, embedding, nrm FROM e WHERE vec_id < $nCells),
         |asg AS (SELECT vec_id, cell FROM (
         |    SELECT f.vec_id, c.cent_id AS cell,
         |           row_number() OVER (PARTITION BY f.vec_id
         |             ORDER BY ${round6Sql(s"${dot("f", "c")} / (f.nrm * c.nrm)")} DESC,
         |                      c.cent_id) AS arn
         |    FROM (SELECT * FROM e WHERE $filterWhere) f CROSS JOIN c)
         |    WHERE arn = 1),
         |probes AS (SELECT q_id, cell FROM (
         |    SELECT e.vec_id AS q_id, c.cent_id AS cell,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${round6Sql(s"${dot("e", "c")} / (e.nrm * c.nrm)")} DESC,
         |                      c.cent_id) AS prn
         |    FROM e CROSS JOIN c WHERE e.vec_id IN ($qIdsCsv)) WHERE prn <= $nProbe),
         |pairs AS (SELECT p.q_id, a.vec_id AS nb_id,
         |                 ${round6Sql(s"${dot("qe", "ne")} / (qe.nrm * ne.nrm)")} AS cos
         |          FROM probes p
         |          JOIN asg a ON a.cell = p.cell AND a.vec_id <> p.q_id
         |          JOIN e ne ON ne.vec_id = a.vec_id
         |          JOIN e qe ON qe.vec_id = p.q_id),
         |semk AS (SELECT q_id, nb_id AS cand, r FROM (
         |           SELECT q_id, nb_id,
         |                  row_number() OVER (PARTITION BY q_id
         |                                     ORDER BY cos DESC, nb_id) AS r
         |           FROM pairs) WHERE r <= $depth),
         |fused AS (SELECT COALESCE(l.q_id, s.q_id) AS q_id,
         |                 COALESCE(l.cand, s.cand) AS cand,
         |                 ${round6Sql(
           s"COALESCE(1.0 / (${Similarity.RrfK} + l.r), 0) + " +
             s"COALESCE(1.0 / (${Similarity.RrfK} + s.r), 0)")} AS rrf
         |          FROM lexk l FULL JOIN semk s
         |            ON s.q_id = l.q_id AND s.cand = l.cand)
         |SELECT CAST(q_id AS BIGINT) AS q_id, cand, rrf,
         |       CAST(rrf_rank AS BIGINT) AS rrf_rank FROM (
         |  SELECT q_id, cand, rrf,
         |         row_number() OVER (PARTITION BY q_id
         |                            ORDER BY rrf DESC, cand) AS rrf_rank
         |  FROM fused) WHERE rrf_rank <= $out
         |ORDER BY q_id, rrf_rank""".stripMargin) { (s, dir) =>
      import s.implicits._
      val queries = TextAnalysis.bm25QuerySet.toDF("q_id", "term")
      val emb = Tables(s, dir).embeddings
      val allowed = emb.filter(expr(filterWhere))
        .select(col("vec_id").as("doc_id"))
      val lexk = bm25FromIndex(
          filterIndex(accumulatedIndex(s, dir), allowed), queries, depth)
        .select(col("q_id"), col("doc_id").as("cand"), col("rank").as("r"))
      val cents = emb.filter(col("vec_id") < nCells)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cv"))
      val semk = Similarity.ivfSearch(emb.filter(expr(filterWhere)), cents,
          emb.filter(col("vec_id").isin(qIds: _*)), nProbe, depth,
          useHeap = false)
        .select(col("q_id"), col("nb_id").as("cand"), col("rn").as("r"))
      Similarity.rrfFuse(lexk, semk, out)
        .select("q_id", "cand", "rrf", "rrf_rank")
        .orderBy("q_id", "rrf_rank")
    }
  }

  /** Test hook: the n101 serving root for this (session, corpus dir),
    * if the entry has run. */
  private[graft] def servingBase(s: SparkSession, dir: String): Option[String] =
    ServingLoc.get(s, s"n101:$dir")

  /** Cold-mode hook (Bench/Lab): wipe the segmented serving CONTENTS so
    * the n101 lifecycle re-runs from genuinely empty state — a
    * surviving compaction watermark would fake a ~0-cost compact — but
    * keep the directory itself ([[ServingLoc]]'s location-reuse rule). */
  def clearServingState(spark: SparkSession): Unit =
    ServingLoc.clearContents(spark, "n101:")

  /** n101: the LSM serving lifecycle promoted to the DuckDB gate (the
    * n89/n97 promotion pattern — LexIndexSpec pins each transition;
    * this entry makes the driver's hash attest the ANSWER served
    * through the segmented+compacted+pruned layout). One entry runs
    * the whole cadence a 100 TB serving index lives by:
    *
    *   ingest seg0 (evens) → ingest seg1 (≡1 mod 4) → compactServing
    *   (fold both into one base, marker-last) → pruneCompacted
    *   (two-phase delete; replay markers stay) → ingest seg2 (≡3 mod
    *   4, landing ON TOP of the compacted base) → readServing → BM25.
    *
    * The oracle is full-corpus BM25 from raw text, so a posting lost
    * in the fold, a pruned segment still being served, a torn marker
    * surfacing early, or a post-compaction batch missed by the serving
    * view flips the hash. The lifecycle is deliberately
    * replay-idempotent across reps (LexIndexSpec proves it): rep 2
    * re-commits already-folded batch ids (data overwritten, ids ≤
    * watermark excluded from both serve and fold), folds the tail
    * batch, prunes it, re-commits it; from rep 3 the state is stable
    * at one base + one tail — every rep serves the identical answer,
    * which is exactly the redelivery story an at-least-once ingest
    * lane needs. */
  val servingCompactQ: Q =
    Q("n101_serving_compact", bm25SqlFor(10, "TRUE")) { (s, dir) =>
      import s.implicits._
      val docs = Tables(s, dir).documents
      val base = ServingLoc.of(s, s"n101:$dir", "graft_bm25_serving")
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sessionState.newHadoopConf())
      def commit(id: Long, batch: DataFrame): Unit = {
        writeIndex(buildIndex(batch), s"$base/batches/$id")
        fs.create(new org.apache.hadoop.fs.Path(
          s"$base/_committed_batch_$id"), true).close()
      }
      commit(0, docs.filter(col("doc_id") % 2 === 0))
      commit(1, docs.filter(col("doc_id") % 4 === 1))
      compactServing(s, base)
      pruneCompacted(s, base)
      commit(2, docs.filter(col("doc_id") % 4 === 3))
      val queries = TextAnalysis.bm25QuerySet.toDF("q_id", "term")
      bm25FromIndex(readServing(s, base), queries, 10)
        .select(col("q_id"), col("rank"), col("doc_id"), col("score"))
        .orderBy("q_id", "rank")
    }

  val all: Seq[Q] =
    Seq(bm25IndexQ, fusedServingQ, filteredHybridQ, bm25DeleteQ,
      bm25UpsertQ, servingCompactQ)
}
