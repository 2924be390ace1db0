package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.Det._

/** Corpus-curation operators beyond dedup itself (north star): duplicate
  * clustering (connected components over the near-dup pair graph),
  * benchmark-contamination screening (window-fingerprint overlap against
  * a held-out set), and deterministic stratified sampling.
  */
object Corpus {

  /** Connected components by minimum-label propagation with pointer
    * jumping: each round every node takes the min label over itself and
    * its neighbors, then follows its label's label (path halving) — so
    * convergence is O(log diameter) rounds, not O(diameter). Each round
    * ends in an EAGER checkpoint: without lineage truncation an
    * iterative DataFrame algorithm accretes an exponentially growing
    * plan that OOMs the driver long before the data is large — the
    * checkpoint is what makes the loop scale, same as it would on a
    * cluster. Nothing is collected; each round is two hash joins and
    * one aggregation.
    *
    * Checkpoint durability (VERDICT_r08 next #6): the default
    * `localCheckpoint` pins each round's blocks in EXECUTOR memory/disk
    * and loses them if an executor dies — fine single-node, but on a
    * 1000-executor cluster a lost executor kills the job mid-iteration
    * because truncated lineage cannot recompute. Pass `checkpointDir`
    * (any fault-tolerant filesystem path — HDFS/object store on a real
    * cluster) to use RELIABLE checkpoints instead: each round persists
    * to storage and survives executor loss, at the cost of one
    * write+read per round. That is the production path for long CC
    * runs; the local default is the right bench/test shape. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25,
      checkpointDir: Option[String] = None): DataFrame = {
    val ckpt: DataFrame => DataFrame = checkpointDir match {
      case Some(dir) =>
        pairs.sparkSession.sparkContext.setCheckpointDir(dir)
        df => df.checkpoint() // eager, reliable (survives executor loss)
      case None =>
        df => df.localCheckpoint() // eager, executor-memory blocks
    }
    val edges = ckpt(pairs.select(col("d1").as("a"), col("d2").as("b"))
      .union(pairs.select(col("d2").as("a"), col("d1").as("b"))))
    var labels = ckpt(edges.select(col("a").as("node")).distinct()
      .withColumn("lbl", col("node")))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // 1. min over self + neighborhood
      val nbr = edges.join(labels.withColumnRenamed("node", "b"), Seq("b"))
        .groupBy(col("a").as("node")).agg(min(col("lbl")).as("nbrLbl"))
      val stepped = labels.join(nbr, Seq("node"), "left")
        .select(col("node"),
          least(col("lbl"), coalesce(col("nbrLbl"), col("lbl"))).as("lbl"))
      // 2. pointer jump: follow the label's own label
      val parents = stepped.select(col("node").as("lbl"), col("lbl").as("lbl2"))
      val next = ckpt(stepped.join(parents, Seq("lbl"), "left")
        .select(col("node"),
          least(col("lbl"), coalesce(col("lbl2"), col("lbl"))).as("lbl")))
      val changed = next.join(labels.withColumnRenamed("lbl", "old"), Seq("node"))
        .filter(col("lbl") =!= col("old")).limit(1).count()
      labels = next
      converged = changed == 0
      i += 1
    }
    require(converged, s"label propagation did not converge in $maxIter rounds")
    labels
  }

  /** Shared DuckDB CTE chain: exact-Jaccard 0.6 near-dup graph →
    * recursive min-reachable-label components, ending in
    * `clusters(doc_id, cluster_id)` — the oracle twin of
    * jaccardPairs(0.6) |> connectedComponents (n07, n19). */
  private val clustersSql =
    s"""WITH RECURSIVE
       |w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sh AS (SELECT DISTINCT doc_id,
       |              unnest(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
       |                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
       |       FROM w),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |common AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
       |           FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |           GROUP BY a.doc_id, b.doc_id),
       |pairs AS (SELECT d1, d2 FROM common
       |          JOIN sizes s1 ON s1.doc_id = d1
       |          JOIN sizes s2 ON s2.doc_id = d2
       |          WHERE CAST(c AS DOUBLE) / (s1.n + s2.n - c) >= 0.6),
       |edges AS (SELECT d1 AS a, d2 AS b FROM pairs
       |          UNION ALL SELECT d2, d1 FROM pairs),
       |reach AS (SELECT a AS node, a AS lbl FROM edges
       |          UNION
       |          SELECT e.a, r.lbl FROM edges e JOIN reach r ON r.node = e.b),
       |clusters AS (SELECT node AS doc_id, min(lbl) AS cluster_id
       |             FROM reach GROUP BY node)""".stripMargin

  /** The Spark side of `clustersSql`. Memoized per (session, canonical
    * docs frame) — n07 and n19 both need the component labels, and the
    * iterative CC is the single most expensive stage in the catalog
    * (~4 s at sf0.1); its result is a tiny already-localCheckpointed
    * label frame, so holding it costs nothing. Same policy as
    * Dedup.shingles: canonical Tables frames only, ad-hoc corpora are
    * rebuilt every call (correct, just uncached). */
  private def buildClusters(docs: DataFrame): DataFrame = {
    def compute() = connectedComponents(
      Dedup.jaccardPairs(docs, threshold = 0.6).select("d1", "d2"))
      .select(col("node").as("doc_id"), col("lbl").as("cluster_id"))
    // derived-corpus tier (mirrors Dedup.shingles tier 2): frames
    // registered as a deterministic transform of a canonical table —
    // n42's parity halves — memoize under their logical key, so the
    // expensive CC shares one build across entries and bench reps
    val derivedKey = Dedup.derivedKeyOf(docs)
    if (!graft.Tables.isCanonical(docs) && derivedKey.isEmpty) compute()
    else {
      // two-level locking (same as Dedup.shingles): the global lock only
      // guards the session→cache map — the multi-second eager CC build
      // runs under the per-session lock, so concurrent sessions never
      // serialize behind each other's computation. Same clear/build
      // race guard as Dedup.shingles (ADVICE r03): re-validate the
      // dead flag under the per-cache lock and retry if a concurrent
      // clearClusterCache drained this cache object.
      while (true) {
        val cache = clusterCaches.synchronized {
          val dead = clusterCaches.entrySet().iterator()
          while (dead.hasNext) {
            if (dead.next().getKey.sparkContext.isStopped) dead.remove()
          }
          var c = clusterCaches.get(docs.sparkSession)
          if (c == null) {
            c = new ClusterCache
            clusterCaches.put(docs.sparkSession, c)
          }
          c
        }
        cache.synchronized {
          if (!cache.dead)
            return derivedKey match {
              case Some(key) =>
                cache.derived.computeIfAbsent(key, _ => compute())
              case None =>
                cache.memo.computeIfAbsent(docs, _ => compute())
            }
        }
      }
      throw new IllegalStateException("unreachable")
    }
  }
  private final class ClusterCache {
    val memo = new java.util.HashMap[DataFrame, DataFrame]()
    val derived = new java.util.HashMap[(DataFrame, String), DataFrame]()
    var dead = false
  }
  private val clusterCaches =
    new java.util.WeakHashMap[SparkSession, ClusterCache]()

  /** Unpersist and forget every memoized cluster-label frame for
    * `spark` — the cluster-side twin of Dedup.clearShingleCache (the
    * labels are localCheckpointed RDD blocks pinned in executor
    * storage; a service cycling corpus dirs reclaims them here). Dead
    * flag + lock ordering as in clearShingleCache: a racing build
    * either completes first and is drained here, or observes dead and
    * retries into a fresh cache. */
  def clearClusterCache(spark: SparkSession): Unit = {
    val cache = clusterCaches.synchronized(clusterCaches.remove(spark))
    if (cache != null) cache.synchronized {
      cache.dead = true
      cache.memo.values.forEach { df =>
        try df.unpersist() catch { case _: Throwable => () }
      }
      cache.derived.values.forEach { df =>
        try df.unpersist() catch { case _: Throwable => () }
      }
      cache.memo.clear()
      cache.derived.clear()
    }
  }

  /** Duplicate clusters over the exact-Jaccard near-dup graph at
    * threshold 0.6: every document that has at least one near-dup,
    * with its cluster id (= smallest doc_id in the component). Oracle:
    * DuckDB recursive CTE computing min reachable label. */
  val dupClusters: Q = Q(
    "n07_dup_clusters",
    s"""$clustersSql
       |SELECT doc_id, cluster_id
       |FROM clusters
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    buildClusters(Tables(s, dir).documents).orderBy("doc_id")
  }

  /** Cluster-representative selection: for each duplicate cluster keep
    * the BEST document (longest n_chars, doc_id tiebreak) instead of
    * the arbitrary min-id — what a curation pipeline actually ships
    * (drop near-dups, keep the highest-quality witness). One map-side-
    * combinable max_by aggregation over the cluster labels; no window,
    * no second shuffle of document bodies. */
  val clusterReps: Q = Q(
    "n19_cluster_reps",
    s"""$clustersSql,
       |j AS (SELECT c.cluster_id, c.doc_id, d.n_chars
       |      FROM clusters c JOIN documents d USING (doc_id)),
       |r AS (SELECT cluster_id, doc_id, n_chars,
       |             row_number() OVER (PARTITION BY cluster_id
       |                                ORDER BY n_chars DESC, doc_id) AS rn,
       |             count(*) OVER (PARTITION BY cluster_id) AS n_docs
       |      FROM j)
       |SELECT cluster_id, doc_id AS rep_doc_id,
       |       CAST(n_chars AS BIGINT) AS rep_chars,
       |       CAST(n_docs AS BIGINT) AS n_docs
       |FROM r WHERE rn = 1
       |ORDER BY cluster_id""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir).documents
    buildClusters(docs)
      .join(docs.select("doc_id", "n_chars"), Seq("doc_id"))
      .groupBy("cluster_id")
      .agg(
        max_by(struct(col("doc_id"), col("n_chars")),
          struct(col("n_chars"), -col("doc_id"))).as("best"),
        count(lit(1)).as("n_docs"))
      .select(col("cluster_id"), col("best.doc_id").as("rep_doc_id"),
        col("best.n_chars").cast("long").as("rep_chars"), col("n_docs"))
      .orderBy("cluster_id")
  }

  /** Sequence packing (context-window binning): assign documents, in
    * deterministic doc_id order within each source shard, to
    * fixed-token-budget bins by exclusive-prefix-sum division — the
    * training-batch assembly step. bin = floor(tokens_before / budget),
    * the same streaming heuristic Spark itself uses for
    * maxPartitionBytes file binning (a bin may overflow by at most one
    * document; no bin is left needlessly open).
    *
    * Scale note: the prefix sum partitions by the shard key (`source`),
    * so parallelism is the shard count and no global ordering exists —
    * exactly how a 100 TB corpus is packed (per input shard), not a
    * single unpartitioned window. */
  /** Library form of n18: append (n_tokens, bin) to any (doc_id, text)
    * frame, packing per `shardCol` in doc_id order. */
  def packSequences(docs: DataFrame, budget: Long,
      shardCol: String = "source"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(shardCol).orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("__graft_prior",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin", expr(s"__graft_prior div $budget"))
      .drop("__graft_prior")
  }

  val seqPack: Q = {
    val budget = 2048
    Q(
      "n18_seq_pack",
      s"""WITH t AS (SELECT doc_id, source,
         |                 len(string_split(text, ' ')) AS n_tokens
         |          FROM documents),
         |c AS (SELECT doc_id, source, n_tokens,
         |             coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
         |      FROM t)
         |SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
         |       CAST(prior // $budget AS BIGINT) AS bin
         |FROM c
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      packSequences(Tables(s, dir).documents, budget)
        .select(col("doc_id"), col("source"), col("n_tokens"), col("bin"))
        .orderBy("doc_id")
    }
  }

  /** Overlapping-window document chunking (round 7) — the sequence-
    * prep step UPSTREAM of n18's packing: long documents split into
    * fixed-token windows with a stride (the pretraining/RAG chunker),
    * each chunk carrying its position and a content fingerprint so
    * downstream dedup/packing key on chunks exactly as they key on
    * documents. Map-side only: one `transform` builds the per-doc
    * chunk structs in the scan stage and one explode emits them —
    * zero shuffles; at 100 TB the op is embarrassingly parallel and
    * output size is input × W/S (the overlap factor, W=16 S=8 ⇒ 2×).
    * Chunk starts are 0, S, 2S, … while start < n, so tail chunks may
    * be short but coverage is total and deterministic. */
  def chunkWindows(docs: DataFrame, window: Int, stride: Int): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("__toks"))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .filter(col("__n") >= 1)
      .select(col("doc_id"), col("__n"), explode(expr(
        s"""transform(sequence(0, CAST((__n - 1) div $stride AS INT)),
           |  i -> named_struct(
           |    'chunk_idx', CAST(i AS BIGINT),
           |    'start_tok', CAST(i * $stride AS BIGINT),
           |    'n_tok', CAST(least($window, __n - i * $stride) AS BIGINT),
           |    'fp', md5(array_join(
           |      slice(__toks, i * $stride + 1,
           |            CAST(least($window, __n - i * $stride) AS INT)), ' '))))""".stripMargin))
        .as("c"))
      .select(col("doc_id"), col("c.chunk_idx").as("chunk_idx"),
        col("c.start_tok").as("start_tok"), col("c.n_tok").as("n_tok"),
        col("c.fp").as("fp"))

  val chunkQ: Q = {
    val (w, s) = (16, 8)
    Q(
      "n72_chunk_windows",
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS l,
         |                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n
         |           FROM documents),
         |c AS (SELECT doc_id, n, unnest(generate_series(0, CAST((n - 1) // $s AS INTEGER))) AS i
         |      FROM t WHERE n >= 1)
         |SELECT c.doc_id,
         |       CAST(c.i AS BIGINT) AS chunk_idx,
         |       CAST(c.i * $s AS BIGINT) AS start_tok,
         |       CAST(least($w, c.n - c.i * $s) AS BIGINT) AS n_tok,
         |       md5(array_to_string(t.l[c.i * $s + 1 : c.i * $s + least($w, c.n - c.i * $s)], ' ')) AS fp
         |FROM c JOIN t ON t.doc_id = c.doc_id
         |ORDER BY c.doc_id, chunk_idx""".stripMargin) { (ss, dir) =>
      chunkWindows(Tables(ss, dir).documents, w, s)
        .orderBy("doc_id", "chunk_idx")
    }
  }

  /** Concat-and-chunk example materialization (round 9) — the final
    * mile DOWNSTREAM of n18's binning: per shard, concatenate each
    * document's tokens plus an EOS sentinel in deterministic doc_id
    * order, then cut the stream into EXACT `blockLen`-token training
    * examples that CROSS document boundaries — the GPT-style packing a
    * trainer actually consumes (n18's bins keep documents whole and may
    * under-fill; these blocks are exact-length by construction, only
    * each shard's final block runs short).
    *
    * Spark-first shape, NO per-token explode and NO global sort:
    *
    *  1. one window prefix-sum per shard assigns each doc its global
    *     token offset (the n18 shuffle, reused semantics);
    *  2. a doc spanning examples lo..hi emits one SLICE row per
    *     spanned example via a map-side `transform`+explode — row
    *     count ≈ docs + total_tokens/blockLen, never per-token;
    *  3. one groupBy (shard, example) reassembles each block from its
    *     slices (array_sort by global start — contributions are
    *     contiguous, so the order key is unique) and fingerprints the
    *     exact token text.
    *
    * Scale: parallelism = shard count × examples; both wide stages key
    * on the shard, so a 100 TB corpus materializes per input shard with
    * two shuffles total, and the md5 block fingerprint makes the
    * examples content-addressable for resume/dedup downstream. */
  def tokenBlocks(docs: DataFrame, blockLen: Long, eos: String = "<eos>",
      shardCol: String = "source", withText: Boolean = false): DataFrame = {
    require(blockLen > 0, s"block length must be positive, got $blockLen")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(shardCol).orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs
      .select(col(shardCol), col("doc_id"),
        concat(split(col("text"), " ", -1), array(lit(eos))).as("__tk"))
      .withColumn("__n", size(col("__tk")).cast("long"))
      .withColumn("__prior", coalesce(sum(col("__n")).over(w), lit(0L)))
      .select(col(shardCol), col("doc_id"), explode(expr(
        s"""transform(sequence(__prior div $blockLen, (__prior + __n - 1) div $blockLen),
           |  e -> named_struct(
           |    'example_idx', e,
           |    'gstart', greatest(e * $blockLen, __prior),
           |    'piece', array_join(slice(__tk,
           |      CAST(greatest(e * $blockLen - __prior, 0) + 1 AS INT),
           |      CAST(least((e + 1) * $blockLen, __prior + __n)
           |           - greatest(e * $blockLen, __prior) AS INT)), ' '),
           |    'n_tok', least((e + 1) * $blockLen, __prior + __n)
           |             - greatest(e * $blockLen, __prior)))""".stripMargin)).as("s"))
      .groupBy(col(shardCol), col("s.example_idx").as("example_idx"))
      .agg(
        sum(col("s.n_tok")).cast("long").as("n_tokens"),
        count_distinct(col("doc_id")).as("n_docs"),
        // the exact example text a trainer consumes; `withText = false`
        // (the audit entries) keeps only its fingerprint
        array_join(
          transform(
            array_sort(collect_list(struct(col("s.gstart"), col("s.piece")))),
            x => x.getField("piece")),
          " ").as("block_text"))
      .withColumn("block_fp", md5(col("block_text").cast("binary")))
      .select(col(shardCol) +: col("example_idx") +: col("n_tokens") +:
        col("n_docs") +: col("block_fp") +:
        (if (withText) Seq(col("block_text")) else Nil): _*)
  }

  /** Corpus card (round 9) — the one-row dataset summary a pipeline
    * publishes with every corpus release (the "data card" statistics
    * block): volume (docs, tokens, vocabulary), redundancy (normalized
    * duplicate rate) and composition balance (language / source
    * Shannon entropies). Everything is a composition of aggregates the
    * engine already trusts: exact integer counts, one
    * distinct-fingerprint count, one distinct-token count, and two
    * |keys|-row entropy folds whose p·ln p terms are round6'd then
    * DECIMAL-summed (order-independent, cross-engine identical).
    *
    * Scale shape: three corpus-proportional aggregations (doc stats,
    * vocab distinct, fingerprint distinct inside the doc-stat agg) —
    * all map-side combinable — plus two key-count-sized groupBys; the
    * final assembly crosses 1-row frames (allowlisted tiny-side
    * broadcasts, the n60 audit pattern). */
  def corpusCard(docs: DataFrame): DataFrame = {
    val base = docs.select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("__ntok"),
      graft.Det.normFingerprint(col("text")).as("__fp"),
      col("lang"), col("source"))
    val stats = base.agg(
      count(lit(1)).as("n_docs"),
      sum(col("__ntok")).as("n_tokens"),
      count_distinct(col("__fp")).as("__n_distinct"))
    val vocab = docs
      .select(explode(split(col("text"), " ")).as("__tok"))
      .agg(count_distinct(col("__tok")).as("vocab_size"))
    def entropy(keyCol: String): DataFrame = {
      val cnt = base.groupBy(keyCol).agg(count(lit(1)).as("__c"))
      val tot = cnt.agg(sum(col("__c")).as("__t"))
      cnt.crossJoin(broadcast(tot))
        .select(graft.Det.round6(
          (col("__c").cast("double") / col("__t")) *
            log(col("__c").cast("double") / col("__t"))).as("__term"))
        .agg(graft.Det.dsum(col("__term")).as("__s"))
        .select((-col("__s")).as(s"${keyCol}_entropy"))
    }
    stats.crossJoin(broadcast(vocab))
      .crossJoin(broadcast(entropy("lang")))
      .crossJoin(broadcast(entropy("source")))
      .select(
        col("n_docs"), col("n_tokens"), col("vocab_size"),
        graft.Det.round6(lit(1.0) -
          col("__n_distinct").cast("double") / col("n_docs")).as("dup_rate"),
        graft.Det.round6(
          col("n_tokens").cast("double") / col("n_docs")).as("mean_doc_tokens"),
        col("lang_entropy"), col("source_entropy"))
  }

  val corpusCardQ: Q = Q(
    "n85_corpus_card",
    s"""WITH base AS (SELECT doc_id,
       |                    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
       |                    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
       |                    lang, source
       |             FROM documents),
       |st AS (SELECT count(*) AS n_docs, sum(ntok) AS n_tokens,
       |              count(DISTINCT fp) AS n_distinct
       |       FROM base),
       |vb AS (SELECT count(DISTINCT tok) AS vocab_size
       |       FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)),
       |lc AS (SELECT lang, count(*) AS c FROM base GROUP BY lang),
       |lt AS (SELECT sum(c) AS t FROM lc),
       |le AS (SELECT -${dsumSql(round6Sql(
             "(CAST(c AS DOUBLE) / t) * ln(CAST(c AS DOUBLE) / t)"))} AS lang_entropy
       |       FROM lc CROSS JOIN lt),
       |sc AS (SELECT source, count(*) AS c FROM base GROUP BY source),
       |stt AS (SELECT sum(c) AS t FROM sc),
       |se AS (SELECT -${dsumSql(round6Sql(
             "(CAST(c AS DOUBLE) / t) * ln(CAST(c AS DOUBLE) / t)"))} AS source_entropy
       |       FROM sc CROSS JOIN stt)
       |SELECT CAST(st.n_docs AS BIGINT) AS n_docs,
       |       CAST(st.n_tokens AS BIGINT) AS n_tokens,
       |       CAST(vb.vocab_size AS BIGINT) AS vocab_size,
       |       ${round6Sql("1.0 - CAST(st.n_distinct AS DOUBLE) / st.n_docs")} AS dup_rate,
       |       ${round6Sql("CAST(st.n_tokens AS DOUBLE) / st.n_docs")} AS mean_doc_tokens,
       |       le.lang_entropy, se.source_entropy
       |FROM st CROSS JOIN vb CROSS JOIN le CROSS JOIN se""".stripMargin) { (s, dir) =>
    corpusCard(Tables(s, dir).documents)
  }

  /** Shared DuckDB twin body for [[tokenBlocks]] over a filtered
    * corpus — one definition so n82 (full corpus) and n112's
    * post-takedown snapshots cannot drift. No final ORDER BY so
    * snapshot branches can union. */
  private[graft] def tokenBlocksSqlCore(L: Long, corpusWhere: String): String =
    s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS tk
       |           FROM documents WHERE $corpusWhere),
       |c AS (SELECT doc_id, source, tk, CAST(len(tk) + 1 AS BIGINT) AS n,
       |             coalesce(sum(len(tk) + 1) OVER (PARTITION BY source ORDER BY doc_id
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
       |      FROM t),
       |tok AS (SELECT source, doc_id, prior + p - 1 AS gpos,
       |               CASE WHEN p <= len(tk) THEN tk[p] ELSE '<eos>' END AS tokn
       |        FROM c, unnest(generate_series(1, CAST(n AS INT))) AS u(p))
       |SELECT source,
       |       CAST(gpos // $L AS BIGINT) AS example_idx,
       |       CAST(count(*) AS BIGINT) AS n_tokens,
       |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |       md5(string_agg(tokn, ' ' ORDER BY gpos)) AS block_fp
       |FROM tok
       |GROUP BY source, gpos // $L""".stripMargin

  val tokenBlocksQ: Q = {
    val L = 512
    Q(
      "n82_token_blocks",
      tokenBlocksSqlCore(L, "TRUE") + "\nORDER BY source, example_idx") {
      (ss, dir) =>
        tokenBlocks(Tables(ss, dir).documents, L)
          .orderBy("source", "example_idx")
    }
  }

  // ---------------------------------------------------------------------
  // n112: PACKED-ARTIFACT TAKEDOWN PROPAGATION (VERDICT r12 #1) — the
  // last place a right-to-be-forgotten request must reach: the packed
  // training shards a trainer actually consumes. The index families
  // forget via tombstone + fold (st24/st25); packed blocks CROSS
  // document boundaries ([[tokenBlocks]]), so a takedown cannot be a
  // row filter — the affected SHARDS must repack. The shard is the
  // rewrite quantum: packing is per-shard independent (the prefix sum
  // partitions by `source`), so a takedown rewrites exactly the shards
  // holding the dead docs and no others — takedown-traffic-sized, not
  // corpus-sized, at 100 TB.
  // ---------------------------------------------------------------------

  /** Materialize the packed training store: [[tokenBlocks]] examples
    * laid out one partition per shard (`blocks/source=<shard>/`) — the
    * layout that makes [[takedownPackedShards]]'s partial rewrite a
    * native partition overwrite. */
  def writePackedShards(docs: DataFrame, base: String, blockLen: Long,
      eos: String = "<eos>", shardCol: String = "source"): Unit =
    tokenBlocks(docs, blockLen, eos, shardCol, withText = true)
      .write.mode("overwrite")
      .partitionBy(shardCol)
      .parquet(s"$base/blocks")

  /** The packed store's current state. The shard column is the
    * partition directory, restored to its position by name. */
  def readPackedShards(spark: SparkSession, base: String): DataFrame =
    spark.read.parquet(s"$base/blocks")

  /** Propagate takedowns into the packed store: repack ONLY the shards
    * holding tombstoned docs from the LIVE corpus (the caller's
    * current at-rest view, dead docs excluded here by anti-join), via
    * Spark's DYNAMIC partition overwrite — partitions absent from the
    * written frame are untouched, so unaffected shards keep their
    * exact bytes on disk (CorpusSpec pins file-level identity).
    * Within an affected shard the survivors' tokens re-pack (block
    * boundaries shift — packing crosses doc boundaries, that is the
    * point), and the dead docs' tokens leave the disk with the
    * overwritten partition files.
    *
    * A shard whose EVERY doc died needs explicit deletion: dynamic
    * overwrite only replaces partitions present in the write, and an
    * all-dead shard writes nothing — its stale blocks would linger.
    *
    * Scale: `tombstones` and the affected-shard list are
    * takedown-traffic-sized (the st14/n93 broadcast-tombstone budget;
    * the driver-side shard list is the same capped shape), the
    * survivors scan is affected-shards-only (partition pruning on the
    * corpus' own source layout), and the repack is the per-shard
    * [[tokenBlocks]] plan. Returns the number of shards rewritten or
    * deleted — the n_affected evidence n112's oracle pins. */
  def takedownPackedShards(spark: SparkSession, base: String,
      corpus: DataFrame, tombstones: DataFrame, blockLen: Long,
      eos: String = "<eos>", shardCol: String = "source"): Long = {
    val dead = tombstones.select("doc_id").distinct()
    val affected = corpus
      .join(broadcast(dead), Seq("doc_id"), "left_semi")
      .select(shardCol).distinct()
      .collect().map(_.getString(0)).sorted
    if (affected.nonEmpty)
      repackShards(spark, base,
        corpus.join(broadcast(dead), Seq("doc_id"), "left_anti"),
        affected.toSeq, blockLen, eos, shardCol)
    affected.length.toLong
  }

  /** Repack an explicit shard set from the LIVE corpus view — the
    * shared core of [[takedownPackedShards]] (shards touched by dels)
    * and the st27 CDC lane (adds AND dels both change a shard's
    * packing, so the lane repacks every shard its batch touches).
    * Dynamic partition overwrite rewrites exactly the listed shards;
    * a listed shard with NO surviving docs writes nothing and is
    * deleted explicitly (the lingering-stale-blocks corner). */
  def repackShards(spark: SparkSession, base: String, liveCorpus: DataFrame,
      affected: Seq[String], blockLen: Long, eos: String = "<eos>",
      shardCol: String = "source"): Unit = {
    if (affected.nonEmpty) {
      // materialized once (round 15, guide §1.2): the affected-shard
      // survivor slice is takedown-traffic-sized and feeds BOTH the
      // repack write and the empty-shard sweep's distinct-collect —
      // it re-executed its corpus join per consumer before
      val survivors = liveCorpus.filter(col(shardCol).isin(affected: _*))
        .localCheckpoint()
      tokenBlocks(survivors, blockLen, eos, shardCol, withText = true)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(shardCol)
        .parquet(s"$base/blocks")
      val still = survivors.select(shardCol).distinct()
        .collect().map(_.getString(0)).toSet
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(spark.sessionState.newHadoopConf())
      (affected.toSet -- still).foreach { src =>
        fs.delete(new org.apache.hadoop.fs.Path(
          s"$base/blocks/$shardCol=$src"), true): Unit
      }
    }
  }

  /** n112: the takedown lifecycle over the packed store, every
    * snapshot hash-attested. Three acts on a ServingLoc tree
    * (self-cleared — the n105 determinism rule): pack the full corpus;
    * take down doc_id ≡ 0 (mod 97) and propagate; take down ≡ 0
    * (mod 101) from the survivors and propagate again. Each snapshot
    * reads the REAL store back (results/<i>, materialized before the
    * next rewrite) with `n_affected` evidence — the shard-rewrite
    * count the takedown-traffic-sized contract predicts, re-derived
    * independently by the oracle from the dead docs' shard spread.
    * The oracle's per-snapshot branch is the full [[tokenBlocksSqlCore]]
    * over the live corpus, so a dead doc's tokens surviving in ANY
    * block (or a stale block in an untouched shard leaking forward)
    * flips the hash. Byte-identity of unaffected shards and
    * dead-bytes-off-disk are spec-pinned (CorpusSpec — file-level
    * checks DuckDB cannot express). */
  val packedTakedownQ: Q = {
    val L = 512
    val d1 = "doc_id % 97 = 0"
    val d2 = "doc_id % 101 = 0"
    val snaps = Seq(
      ("TRUE", "TRUE"),
      (s"NOT ($d1)", d1),
      (s"NOT ($d1) AND NOT ($d2)", s"($d2) AND NOT ($d1)"))
    val branches = snaps.zipWithIndex.map { case ((live, affectedW), i) =>
      s"""SELECT CAST($i AS BIGINT) AS snap,
         |  CAST((SELECT count(DISTINCT source) FROM documents
         |        WHERE $affectedW) AS BIGINT) AS n_affected,
         |  * FROM (
         |${tokenBlocksSqlCore(L, live)}
         |)""".stripMargin
    }
    Q(
      "n112_packed_takedown",
      branches.mkString("", "\nUNION ALL\n",
        "\nORDER BY snap, source, example_idx")) { (s, dir) =>
      val docs = Tables(s, dir).documents.select("doc_id", "source", "text")
      val base = ServingLoc.of(s, s"n112:$dir", "graft_packed_takedown")
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sessionState.newHadoopConf())
      fs.listStatus(new org.apache.hadoop.fs.Path(base))
        .foreach(st => fs.delete(st.getPath, true))
      val dead1 = docs.filter(expr(d1)).select("doc_id")
      val dead2 = docs.filter(expr(d2)).select("doc_id")
      val live1 = docs.join(broadcast(dead1), Seq("doc_id"), "left_anti")
      def snapshot(i: Int, nAffected: Long): Unit =
        readPackedShards(s, base)
          .select(lit(i.toLong).as("snap"), lit(nAffected).as("n_affected"),
            col("source"), col("example_idx"), col("n_tokens"),
            col("n_docs"), col("block_fp"))
          .write.mode("overwrite").parquet(s"$base/results/$i")
      writePackedShards(docs, base, L)
      snapshot(0, docs.select("source").distinct().count())
      snapshot(1, takedownPackedShards(s, base, docs, dead1, L))
      snapshot(2, takedownPackedShards(s, base, live1, dead2, L))
      s.read.parquet((0 to 2).map(i => s"$base/results/$i"): _*)
        .select("snap", "n_affected", "source", "example_idx",
          "n_tokens", "n_docs", "block_fp")
        .orderBy("snap", "source", "example_idx")
    }
  }

  /** INCREMENTAL cluster maintenance (round 4, completing the
    * VERDICT r03 #1 theme for n07): fold a batch of NEW near-dup pairs
    * into an existing (node, lbl) cluster store WITHOUT re-running
    * connected components over the prior graph.
    *
    * Contraction: each pair endpoint maps to its current super-node
    * (its stored label, or itself if unlabeled — new docs and prior
    * singletons). CC runs over the CONTRACTED edge set only — sized by
    * the new batch, not the corpus. Contracting whole components
    * preserves connectivity, and min-labels compose (an old label IS
    * its component's min member, so the min over merged super-nodes is
    * the global min) — the result equals a full rebuild over
    * old ∪ new edges, proven in CorpusSpec both on planted merge
    * topologies and against the harness corpus.
    *
    * The store update is two joins: members of touched clusters
    * relabel through their old label (at 100 TB: the store is bucketed
    * by lbl, so this is a broadcast of the tiny relabel map against a
    * co-located store — no corpus shuffle), and nodes new to the store
    * append. Pairs between two members of one existing cluster
    * contract to self-loops and are dropped — re-delivered or
    * redundant pairs are no-ops by construction. */
  def mergeClusterLabels(labels: DataFrame, newPairs: DataFrame): DataFrame = {
    // the pair set is referenced twice (contracted edges + new-node
    // scan) and typically carries an expensive lineage (an LSH probe);
    // materialize once — without this the whole probe re-executes for
    // the anti-join (measured 2× cost on n42)
    val pairs = newPairs.select(col("d1"), col("d2")).localCheckpoint()
    val contracted = pairs
      .join(labels.select(col("node").as("d1"), col("lbl").as("s1")), Seq("d1"), "left")
      .join(labels.select(col("node").as("d2"), col("lbl").as("s2")), Seq("d2"), "left")
      .select(coalesce(col("s1"), col("d1")).as("d1"),
        coalesce(col("s2"), col("d2")).as("d2"))
      .filter(col("d1") =!= col("d2"))
    val comp = connectedComponents(contracted)
    // members of touched clusters follow their old label's new label
    val relabeled = labels
      .join(comp.select(col("node").as("lbl"), col("lbl").as("nl")), Seq("lbl"), "left")
      .select(col("node"), coalesce(col("nl"), col("lbl")).as("lbl"))
    // nodes new to the store: new batch docs and prior singletons
    val freshNodes = pairs.select(col("d1").as("node"))
      .union(pairs.select(col("d2").as("node"))).distinct()
      .join(labels.select("node"), Seq("node"), "left_anti")
    val freshLabeled = freshNodes
      .join(comp, Seq("node"), "left")
      .select(col("node"), coalesce(col("lbl"), col("node")).as("lbl"))
    relabeled.unionByName(freshLabeled)
  }

  /** Incremental duplicate clusters over the parity split: prior
    * labels from the even half's graph, then ONE merge of the new
    * batch's pairs — cross pairs from the persisted-index probe
    * ([[IncrementalDedup.nearDupPairsAgainstIndex]]) plus the
    * intra-batch pairs. Oracle: n07's full-rebuild recursive CTE over
    * the whole corpus — the incremental path must reproduce the
    * from-scratch answer exactly. */
  val incrementalClusters: Q = Q(
    "n42_incremental_clusters",
    s"""$clustersSql
       |SELECT doc_id, cluster_id
       |FROM clusters
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir).documents
    val prior = docs.filter(col("doc_id") % 2 === 0)
    val fresh = docs.filter(col("doc_id") % 2 === 1)
    Dedup.registerDerivedCorpus(prior, docs, "parity=0")
    Dedup.registerDerivedCorpus(fresh, docs, "parity=1")
    // the prior snapshot's labels come from the memoized cluster store
    // (derived-corpus tier) — in a real deployment these ARE the
    // persisted store; rebuilding them per call would make the
    // "incremental" entry pay full-rebuild cost every time
    val priorLabels = buildClusters(prior)
      .select(col("doc_id").as("node"), col("cluster_id").as("lbl"))
    val cross = IncrementalDedup.nearDupPairsAgainstIndex(
      fresh, IncrementalDedup.buildIndex(prior), threshold = 0.6)
      .select(col("d_new").as("d1"), col("d_prior").as("d2"))
    val intra = Dedup.nearDuplicatePairs(fresh, 0.6).select("d1", "d2")
    mergeClusterLabels(priorLabels, cross.unionByName(intra))
      .select(col("node").as("doc_id"), col("lbl").as("cluster_id"))
      .orderBy("doc_id")
  }

  /** Benchmark-contamination screen: training docs sharing at least one
    * 8-token window fingerprint (n25's mod-p Rabin–Karp hash) with the
    * held-out set (stand-in: doc_id % 10 == 0). Returns the
    * contaminated doc with how many distinct held-out windows it hit —
    * the decontamination list a training pipeline drops before a run.
    * Shuffle is on the 8-byte window hash; document bodies never move. */
  val contamination: Q = Q(
    "n26_contamination",
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |pos AS (SELECT doc_id, tk,
       |               unnest(generate_series(1, greatest(len(tk) - ${TextAnalysis.RollingWindow - 1}, 0))) AS p
       |        FROM toks),
       |wh AS (SELECT doc_id,
       |              list_reduce(list_transform(tk[p:p+${TextAnalysis.RollingWindow - 1}],
       |                t -> ('0x' || substr(md5(t), 1, 8))::BIGINT % ${TextAnalysis.P}),
       |                (a, b) -> (a * ${TextAnalysis.B} + b) % ${TextAnalysis.P}) AS h
       |       FROM pos),
       |bench AS (SELECT DISTINCT h FROM wh WHERE doc_id % 10 = 0),
       |train AS (SELECT DISTINCT doc_id, h FROM wh WHERE doc_id % 10 <> 0)
       |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_shared
       |FROM train t JOIN bench b ON t.h = b.h
       |GROUP BY t.doc_id
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val wh = TextAnalysis.windowHashes(Tables(s, dir).documents)
      .select(col("doc_id"), col("win_hash").as("h"))
    val bench = wh.filter(col("doc_id") % 10 === 0)
      .select(col("h")).distinct()
    val train = wh.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"), col("h")).distinct()
    train.join(bench, Seq("h"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      .orderBy("doc_id")
  }

  /** Deterministic 10% stratified sample per language: rank docs inside
    * each stratum by a content-independent pseudo-random key
    * (md5 of the doc id — resume-safe, no RNG) and keep the first
    * ⌈n/10⌉. The standard training-mix downsampler. */
  val stratifiedSample: Q = Q(
    "n27_stratified_sample",
    """WITH ranked AS (
      |  SELECT doc_id, lang,
      |         row_number() OVER (PARTITION BY lang
      |                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
      |         count(*) OVER (PARTITION BY lang) AS n
      |  FROM documents)
      |SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn
      |FROM ranked
      |WHERE rn <= ceil(n * 0.1)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("lang")
    Tables(s, dir).documents
      .select(col("doc_id"), col("lang"))
      .withColumn("rn", row_number().over(wRank))
      .withColumn("n", count(lit(1)).over(wAll))
      .filter(col("rn") <= ceil(col("n") * 0.1))
      .select(col("doc_id"), col("lang"), col("rn").cast("long").as("rn"))
      .orderBy("doc_id")
  }

  /** Sqrt-scaled per-source cap — head-domain suppression, the
    * CommonCrawl-pipeline guard against a handful of mega-domains
    * dominating the training mix: each source keeps at most
    * ⌈√n_source⌉ documents, so representation grows SUBLINEARLY in
    * domain size (a 10⁶-doc domain keeps 10³, a 100-doc domain keeps
    * 10 — the long tail survives, the head is suppressed). Priority
    * inside a source is deterministic and quality-shaped: longest
    * documents first (n_chars DESC, doc_id tiebreak). sqrt/ceil are
    * IEEE-correctly-rounded in both engines, so the cap boundary is
    * bit-identical. Scale shape: one count-over-source and one
    * rank-over-source window — parallelism is the source count; a
    * pathological single mega-source serializes its own partition's
    * sort, at which point the n10h heap-aggregation path is the
    * documented fallback (PERF.md). */
  val sourceCap: Q = Q(
    "n69_source_cap",
    """WITH ranked AS (
      |  SELECT doc_id, source,
      |         row_number() OVER (PARTITION BY source
      |                            ORDER BY n_chars DESC, doc_id) AS rk,
      |         count(*) OVER (PARTITION BY source) AS n_source
      |  FROM documents)
      |SELECT doc_id, source, CAST(rk AS BIGINT) AS rk,
      |       CAST(n_source AS BIGINT) AS n_source,
      |       CAST(ceil(sqrt(CAST(n_source AS DOUBLE))) AS BIGINT) AS cap
      |FROM ranked
      |WHERE rk <= ceil(sqrt(CAST(n_source AS DOUBLE)))
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("n_chars").desc, col("doc_id"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("source")
    Tables(s, dir).documents
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("rk", row_number().over(wRank).cast("long"))
      .withColumn("n_source", count(lit(1)).over(wAll))
      .withColumn("cap", ceil(sqrt(col("n_source").cast("double"))))
      .filter(col("rk") <= col("cap"))
      .select(col("doc_id"), col("source"), col("rk"),
        col("n_source").cast("long").as("n_source"), col("cap"))
      .orderBy("doc_id")
  }

  /** Deterministic resampling to a TARGET DOMAIN MIXTURE — the
    * training-mix assembler: given integer mixture parts per key
    * (e.g. en:3, de:1, …), keep the largest corpus whose composition
    * is EXACTLY proportional to the parts. All arithmetic is integer
    * (m = min over keys of count div part; target per key = part × m)
    * so both engines agree bit-for-bit — no float-ratio parity risk.
    * Selection inside each key is the n27 pattern: rank by
    * md5(doc_id) (content-independent, resume-safe), keep the first
    * `target`. Keys absent from `parts` are dropped; `parts` keys
    * absent from the data contribute nothing to `m`'s min (document
    * your mixture against reality).
    *
    * Scale: one tiny count agg, a 1-row `m` scalar broadcast, and ONE
    * rank window per key — the skew hazard is a dominant key (rank
    * sorts that key's partition range); at 100 TB pre-partition by a
    * salted key range and merge ranks, or accept the sort (it is a
    * disk-backed range sort, not a single-machine pinch). */
  def mixtureResample(docs: DataFrame, parts: Seq[(String, Long)],
      keyCol: String = "source"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val w = parts.toDF(keyCol, "__p")
    val m = docs.groupBy(keyCol).agg(count(lit(1)).as("__n"))
      .join(broadcast(w), keyCol)
      .agg(min(expr("__n div __p")).as("__m"))
    val tgt = broadcast(w).crossJoin(broadcast(m))
      .select(col(keyCol), (col("__p") * col("__m")).as("__tgt"))
    val rk = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol)
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs
      .withColumn("__rk", row_number().over(rk))
      .join(broadcast(tgt), keyCol)
      .filter(col("__rk") <= col("__tgt"))
      .drop("__rk", "__tgt")
  }

  val mixture: Q = {
    val parts = Seq("en" -> 3L, "de" -> 1L, "es" -> 1L, "fr" -> 1L, "zh" -> 1L)
    val values = parts.map { case (k, p) => s"('$k', $p)" }.mkString(", ")
    Q(
      "n46_mixture_resample",
      s"""WITH w(lang, p) AS (VALUES $values),
         |c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
         |m AS (SELECT min(n // p) AS m FROM c JOIN w USING (lang)),
         |t AS (SELECT w.lang, w.p * m.m AS tgt FROM w, m),
         |r AS (SELECT doc_id, lang, source,
         |             row_number() OVER (PARTITION BY lang
         |               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
         |      FROM documents)
         |SELECT r.doc_id, r.lang, r.source
         |FROM r JOIN t ON r.lang = t.lang AND r.rk <= t.tgt
         |ORDER BY r.doc_id""".stripMargin) { (s, dir) =>
      mixtureResample(
        Tables(s, dir).documents.select("doc_id", "lang", "source"),
        parts, keyCol = "lang")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    }
  }

  /** TIERED dedup composition (n114 — VERDICT r13 #2): n07/n19's
    * cluster-representative stage feeding n08's pairwise containment on
    * the REPRESENTATIVES only — the production pipeline shape whose
    * effect PERF.md had argued but never hash-attested. The round-13
    * skew ladder measured WHY the tier exists: uncapped all-pairs
    * containment reads exponent 0.94 over two decades on the Zipfian
    * corpus because the planted mega-cluster's shingles carry
    * df = cluster size (Σdf² pays cluster² pair rows per shared type);
    * the tier collapses that cluster to ONE witness before any pairwise
    * stage, so the containment join never sees the hot bucket — the
    * intra-mega-cluster pairs n113's df-cap DROPS are here removed by
    * construction, with the containment stage still exact over the
    * survivors. The oracle recomputes the same tiering (clusters →
    * best-witness rep per cluster + all unclustered docs → containment
    * over that corpus) plus `n_survivors` evidence, so a tier that
    * silently failed to collapse a cluster (survivor count too high)
    * or dropped a singleton flips the hash, not just a number in
    * PERF.md. Scale: stage 1 reuses n07's memoized cluster labels (at
    * true scale the graph itself runs LSH-banded + df-capped — n04's
    * measured 0.72 configuration); stage 2's Σdf² is over the DEDUPED
    * corpus. Measured on the 100× skew corpus in PERF.md round 14. */
  val tieredContainment: Q = Q(
    "n114_tiered_containment",
    s"""$clustersSql,
       |r AS (SELECT c.cluster_id, c.doc_id,
       |             row_number() OVER (PARTITION BY c.cluster_id
       |                                ORDER BY d.n_chars DESC, c.doc_id) AS rn
       |      FROM clusters c JOIN documents d USING (doc_id)),
       |survivors AS (SELECT doc_id FROM r WHERE rn = 1
       |              UNION ALL
       |              SELECT doc_id FROM documents
       |              WHERE doc_id NOT IN (SELECT doc_id FROM clusters)),
       |sh2 AS (SELECT s.doc_id, s.sh FROM sh s JOIN survivors USING (doc_id)),
       |sizes2 AS (SELECT doc_id, count(*) AS n FROM sh2 GROUP BY doc_id),
       |common2 AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
       |            FROM sh2 a JOIN sh2 b
       |              ON a.sh = b.sh AND a.doc_id < b.doc_id
       |            GROUP BY a.doc_id, b.doc_id)
       |SELECT CASE WHEN s1.n <= s2.n THEN d1 ELSE d2 END AS contained,
       |       CASE WHEN s1.n <= s2.n THEN d2 ELSE d1 END AS container,
       |       CAST(least(s1.n, s2.n) AS BIGINT) AS n_contained,
       |       CAST(greatest(s1.n, s2.n) AS BIGINT) AS n_container,
       |       CAST(c AS DOUBLE) / least(s1.n, s2.n) AS containment,
       |       (SELECT CAST(count(*) AS BIGINT) FROM survivors) AS n_survivors
       |FROM common2
       |JOIN sizes2 s1 ON s1.doc_id = d1
       |JOIN sizes2 s2 ON s2.doc_id = d2
       |WHERE CAST(c AS DOUBLE) / least(s1.n, s2.n) >= 0.2
       |ORDER BY contained, container""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir).documents
    val clusters = buildClusters(docs)
    val reps = clusters
      .join(docs.select("doc_id", "n_chars"), Seq("doc_id"))
      .groupBy("cluster_id")
      .agg(max_by(col("doc_id"),
        struct(col("n_chars"), -col("doc_id"))).as("doc_id"))
      .select("doc_id")
    val singletons = docs.select("doc_id")
      .join(clusters.select("doc_id"), Seq("doc_id"), "left_anti")
    val survivors = reps.unionByName(singletons)
    // single-row scalar attach (the documented no-collect broadcast
    // shape, Relational.scala) — the tier-size evidence column
    val nSurv = survivors.agg(count(lit(1)).as("n_survivors"))
    Dedup.containmentPairsTiered(docs, survivors, threshold = 0.2)
      .crossJoin(broadcast(nSurv))
      .orderBy("contained", "container")
  }

  val all: Seq[Q] = Seq(dupClusters, contamination, stratifiedSample,
    seqPack, chunkQ, tokenBlocksQ, packedTakedownQ, corpusCardQ,
    clusterReps, incrementalClusters, mixture, sourceCap,
    tieredContainment)
}
