package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Deduplication operators for LLM-scale data pipelines (north star,
  * SURVEY.md §7.2.6): exact, normalized-exact, MinHash signatures,
  * MinHash+LSH near-dup with exact verification, exact n-gram Jaccard
  * via an inverted shingle index, and SimHash (Spark-only).
  *
  * Portability: MinHash uses md5 (identical lowercase-hex output in
  * Spark and DuckDB) and exploits that fixed-length hex strings order
  * exactly like their numeric values — so `min(md5(seed||shingle))` is
  * a fully oracle-checkable MinHash. Production note: at 100 TB you'd
  * swap md5 for xxhash64 (same plan shape, cheaper hash); the plan is
  * what matters — shingle explode → per-(doc,seed) min → band grouping
  * → candidate self-join bounded by band buckets → exact verify only on
  * candidates. No all-pairs stage exists anywhere.
  */
object Dedup {

  private val NumHashes = 16
  // 16 bands × 1 row: a pair is a candidate if ANY minhash component
  // collides — P(miss | J) = (1−J)^16, i.e. ≤ 4.3e-7 at the 0.6
  // threshold (2 rows/band would be 2.8% there — too weak for an
  // exact-answer oracle). Precision is the verify stage's job; the
  // candidate set stays bounded by the shingle-sharing pair count the
  // inverted index (n05) already handles.
  private val BandRows  = 1

  /** doc_id + deduplicated word-3-gram shingle set, exploded,
    * Spark-cached (each dedup query reads it ~3 times).
    *
    * Caching policy: PER SESSION (keyed on the owning SparkSession —
    * concurrent sessions cannot churn each other's slots; entries of
    * stopped sessions are evicted on the next access, since the cached
    * frames pin their session and defeat weak-key collection alone).
    * Within a session, three tiers:
    *   1. frames from the Tables cache (identity-stable across catalog
    *      queries) are memoized so n03/n04/n05 share one materialized
    *      index per run — bounded by #tables × #dirs;
    *   2. DERIVED corpora registered via [[registerDerivedCorpus]]
    *      (e.g. `distinctDocuments` of a canonical table — st05's
    *      survivor frame) are memoized under their logical
    *      (canonical parent, transform) key, so a deterministic
    *      transform re-built as a fresh DataFrame object still shares
    *      one shingle index instead of churning the ad-hoc slot
    *      (VERDICT_r03 #6) — bounded by #parents × #transform tags;
    *   3. everything else occupies a single ad-hoc slot that is
    *      unpersisted when the next ad-hoc corpus arrives.
    *
    * Clear/build race (ADVICE r03): a concurrent [[clearShingleCache]]
    * marks the cache object dead under its own lock; this method
    * re-validates the flag inside the per-cache lock and retries the
    * whole lookup, so a late build can never pin a frame inside an
    * orphaned (already-drained) cache. */
  def shingles(docs: DataFrame): DataFrame = {
    while (true) {
      val cache = sessionCaches.synchronized {
        // The cached DataFrames strongly reference their session, which
        // pins the WeakHashMap key — so weak-key eviction alone cannot
        // fire. Explicitly drop entries for stopped sessions here.
        val dead = sessionCaches.entrySet().iterator()
        while (dead.hasNext) {
          if (dead.next().getKey.sparkContext.isStopped) dead.remove()
        }
        var c = sessionCaches.get(docs.sparkSession)
        if (c == null) { c = new ShingleCache; sessionCaches.put(docs.sparkSession, c) }
        c
      }
      cache.synchronized {
        if (!cache.dead) {
          val derivedKey =
            derivedCorpora.synchronized(Option(derivedCorpora.get(docs)))
          val result =
            if (graft.Tables.isCanonical(docs))
              cache.memo.computeIfAbsent(docs, buildShingles(_).cache())
            else derivedKey match {
              case Some(key) =>
                cache.derived.computeIfAbsent(key, _ => buildShingles(docs).cache())
              case None => cache.adhoc match {
                case Some((k, v)) if k eq docs => v
                case prev =>
                  prev.foreach { case (_, v) =>
                    try v.unpersist() catch { case _: Throwable => () }
                  }
                  val v = buildShingles(docs).cache()
                  cache.adhoc = Some((docs, v))
                  v
              }
            }
          return result
        }
        // cache was cleared between fetch and lock — retry with a fresh one
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Register `derived` as the result of deterministic `transform`
    * applied to `parent`, so [[shingles]] memoizes its index under the
    * logical (root canonical parent, transform chain) key: a re-built
    * DataFrame object for the same logical corpus (st05 rebuilds its
    * survivor frame on every invocation; n43 rebuilds its whole
    * curation chain) shares the cached index. Parents CHAIN: a parent
    * that is itself registered resolves to its root with the
    * transforms concatenated, so multi-stage pipelines (filter →
    * dedup → near-dup drop) stay cache-keyed end to end. Unregistered
    * non-canonical parents fall through to the ad-hoc slot; the
    * registry holds the derived frame weakly. */
  private[graft] def registerDerivedCorpus(derived: DataFrame,
      parent: DataFrame, transform: String): Unit = {
    val key =
      if (graft.Tables.isCanonical(parent)) Some((parent, transform))
      else derivedKeyOf(parent).map { case (root, pt) => (root, s"$pt|$transform") }
    key.foreach { k =>
      derivedCorpora.synchronized { derivedCorpora.put(derived, k): Unit }
    }
  }
  private val derivedCorpora =
    new java.util.WeakHashMap[DataFrame, (DataFrame, String)]()

  /** The logical (canonical parent, transform) identity of a frame
    * registered via [[registerDerivedCorpus]], if any — shared with
    * the cluster memoizer so BOTH per-session caches key derived
    * corpora the same way. */
  private[graft] def derivedKeyOf(df: DataFrame): Option[(DataFrame, String)] =
    derivedCorpora.synchronized(Option(derivedCorpora.get(df)))

  private def buildShingles(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(w) >= 3
          |     THEN transform(sequence(1, size(w) - 2),
          |            i -> concat(element_at(w, i), ' ',
          |                        element_at(w, i + 1), ' ',
          |                        element_at(w, i + 2)))
          |     ELSE array() END""".stripMargin)).as("sh"))
      .distinct()

  private final class ShingleCache {
    val memo = new java.util.HashMap[DataFrame, DataFrame]()
    val derived = new java.util.HashMap[(DataFrame, String), DataFrame]()
    var adhoc: Option[(DataFrame, DataFrame)] = None
    /** Set (under this cache's lock) once the cache is drained by
      * [[clearShingleCache]]; a racing [[shingles]] lookup re-checks it
      * and retries instead of writing into the orphaned object. */
    var dead = false
  }
  private val sessionCaches =
    new java.util.WeakHashMap[SparkSession, ShingleCache]()

  /** Unpersist and forget every shingle frame cached for `spark` —
    * long-lived-session hygiene (the cache is bounded by
    * #tables × #dirs, but a service that cycles corpora can reclaim
    * executor storage deterministically instead of waiting for
    * session end). The dead flag is flipped under the per-cache lock
    * BEFORE draining, so an in-flight shingles() call either completes
    * against the still-live cache (and its frame is drained here, the
    * lock orders the two) or observes dead and retries against a fresh
    * cache — no frame can stay pinned in an unreachable cache. */
  def clearShingleCache(spark: SparkSession): Unit = {
    val cache = sessionCaches.synchronized(sessionCaches.remove(spark))
    if (cache != null) cache.synchronized {
      cache.dead = true
      (cache.memo.values.iterator().asScala ++
        cache.derived.values.iterator().asScala ++
        cache.adhoc.map(_._2).iterator)
        .foreach(df => try df.unpersist() catch { case _: Throwable => () })
      cache.memo.clear()
      cache.derived.clear()
      cache.adhoc = None
    }
  }

  // -------------------------------------------------------------------
  // Row-level twins of the shingle/minhash pipeline, for the streaming
  // state store (StreamingOps.streamingNearDupPairs). ONE definition of
  // the constants and hash chain lives here so batch and stream can
  // never drift: the stream's band signatures are bit-identical to
  // bandSignatures' (xxhash64 chain, seed 42, Int-then-String), pinned
  // by StreamingSpec against the batch plan.
  // -------------------------------------------------------------------

  /** The distinct word-3-gram shingle set of one document — row-level
    * twin of [[buildShingles]] (split keeps trailing empties, exactly
    * like Spark's regex split with limit −1). */
  private[graft] def rowShingles(text: String): Array[String] = {
    val w = text.split(" ", -1)
    if (w.length < 3) Array.empty
    else w.sliding(3).map(_.mkString(" ")).toArray.distinct
  }

  private def chainHash(j: Int, sh: org.apache.spark.unsafe.types.UTF8String): Long = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.{IntegerType, StringType}
    // xxhash64(lit(j), sh): fold the 42L seed through each argument
    val h1 = XxHash64Function.hash(j, IntegerType, 42L)
    XxHash64Function.hash(sh, StringType, h1)
  }

  /** (band signatures, sorted distinct shingle hashes) for one
    * document — row-level twin of [[minhashWideFast]] +
    * [[bandSignatures]] (BandRows = 1 ⇒ sig b = mh_b). The shingle
    * hashes (xxhash64, seed 42) stand in for the shingle strings in
    * the stream's state store; Jaccard over them equals Jaccard over
    * the strings barring a 64-bit collision inside one pair's union
    * (~1e-19 per pair). */
  private[graft] def rowBandSigs(shingles: Array[String]): (Array[Long], Array[Long]) = {
    import org.apache.spark.unsafe.types.UTF8String
    val utf8 = shingles.map(UTF8String.fromString)
    val sigs = Array.tabulate(NumHashes) { j =>
      var m = Long.MaxValue
      var i = 0
      while (i < utf8.length) {
        val h = chainHash(j, utf8(i)); if (h < m) m = h; i += 1
      }
      m
    }
    val hashes = utf8.map(s =>
      org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(s, org.apache.spark.sql.types.StringType, 42L)).sorted
    (sigs, hashes)
  }

  private[graft] def numHashes: Int = NumHashes

  /** Shared DuckDB CTEs for the shingle set (1-based list indexing),
    * over any (doc_id, text) relation. */
  private[graft] def shinglesSqlFor(table: String): String =
    s"""w AS (SELECT doc_id, string_split(text, ' ') AS w FROM $table),
       |sh AS (SELECT DISTINCT doc_id,
       |              unnest(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
       |                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
       |       FROM w),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)""".stripMargin
  private val shinglesSql = shinglesSqlFor("documents")

  /** Exact dedup: group by content fingerprint, keep the smallest
    * doc_id as representative. Grouping on md5(text) rather than text
    * keeps shuffle rows narrow at scale (the 16-byte digest shuffles,
    * not the document body). */
  val exactDedup: Q = Q(
    "n01_dedup_exact",
    """SELECT md5(text) AS fp, min(doc_id) AS doc_id,
      |       CAST(count(*) AS BIGINT) AS n_dups
      |FROM documents
      |GROUP BY md5(text)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables(s, dir).documents
      .groupBy(md5(col("text").cast("binary")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_dups"))
      .orderBy("doc_id")
  }

  /** Normalized exact dedup: lower + whitespace collapse + trim before
    * fingerprinting (catches trivially-mutated duplicates). */
  val normDedup: Q = Q(
    "n02_dedup_norm",
    """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
      |       min(doc_id) AS doc_id,
      |       CAST(count(*) AS BIGINT) AS n_dups
      |FROM documents
      |GROUP BY 1
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables(s, dir).documents
      .groupBy(graft.Det.normFingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_dups"))
      .orderBy("doc_id")
  }

  /** MinHash signature as 16 columns (mh0..mh15) in ONE aggregation
    * pass — no 16× row explosion, one shuffle on doc_id. Each of 4 md5
    * digests contributes four independent 32-bit slices (8 hex chars
    * each): component 4a+b = min over substr(md5(a:sh), 8b+1, 8).
    * Fixed-width lowercase hex orders exactly like the numeric value,
    * so `min` is a true MinHash — at 1/4 the digest cost of hashing
    * per-component (the former hot loop of the whole dedup family).
    *
    * All 16 components come from ONE codegen'd `md5_slices` call per
    * shingle (4 digests, no intermediate concat/hex strings) —
    * bit-identical to the expression-tree formulation it replaced
    * (ExpressionsSpec), and the n03/n17 oracles pin the bytes. */
  private def minhashWide(sh: DataFrame): DataFrame = {
    val sliced = sh.select(col("doc_id"),
      graft.functions.GraftFunctions.md5_slices(col("sh")).as("sl"))
    sliced.groupBy("doc_id").agg(
      min(element_at(col("sl"), 1)).as("mh0"),
      (1 until NumHashes).map(j =>
        min(element_at(col("sl"), j + 1)).as(s"mh$j")): _*)
  }

  /** Same wide-signature plan with xxhash64 instead of md5: the LSH
    * banding path only needs uniform hashes that collide on equality,
    * not DuckDB-portable ones, and xxhash64 is ~an order of magnitude
    * cheaper per shingle (16 hashes/shingle is the hot loop of the
    * whole dedup family). md5 stays only where the oracle checks the
    * signature bytes themselves (n03). */
  private def minhashWideFast(sh: DataFrame): DataFrame =
    sh.groupBy("doc_id").agg(
      min(xxhash64(lit(0), col("sh"))).as("mh0"),
      (1 until NumHashes).map(j =>
        min(xxhash64(lit(j), col("sh"))).as(s"mh$j")): _*)

  /** Per-(doc, seed) MinHash rows, unpivoted from the wide signature. */
  private def minhash(docs: DataFrame): DataFrame = {
    val stackExpr = (0 until NumHashes)
      .map(j => s"${j}L, mh$j").mkString(s"stack($NumHashes, ", ", ", ") AS (j, mh)")
    minhashWide(shingles(docs)).select(col("doc_id"), expr(stackExpr))
  }

  /** MinHash signature rows (doc_id, seed j, hash) — oracle-checked
    * bit-for-bit against DuckDB computing the identical md5-slice
    * MinHash (j = 4a+b ⇒ slice b of digest a). */
  val minhashSignature: Q = Q(
    "n03_minhash_sig",
    s"""WITH $shinglesSql
       |SELECT doc_id, CAST(j AS BIGINT) AS j,
       |       min(substr(md5(CAST(j // 4 AS VARCHAR) || ':' || sh), (j % 4) * 8 + 1, 8)) AS mh
       |FROM sh CROSS JOIN (SELECT unnest(generate_series(0, ${NumHashes - 1})) AS j) seeds
       |GROUP BY doc_id, j
       |ORDER BY doc_id, j""".stripMargin) { (s, dir) =>
    minhash(Tables(s, dir).documents)
      .select(col("doc_id"), col("j").cast("long").as("j"), col("mh"))
      .orderBy("doc_id", "j")
  }

  /** Near-duplicate pairs: MinHash → LSH banding → exact Jaccard verify
    * on candidates only. The oracle is the *exact* all-qualifying-pairs
    * answer (inverted-index SQL), so a recall miss in the LSH pipeline
    * shows up as a hash mismatch — the check is stricter than rows>0.
    * 16 bands × 1 row ⇒ P(miss | J=0.6) = 0.4¹⁶ ≈ 4.3e-7. */
  val lshNearDup: Q = Q(
    "n04_lsh_neardup",
    s"""WITH $shinglesSql,
       |common AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
       |           FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |           GROUP BY a.doc_id, b.doc_id)
       |SELECT d1, d2,
       |       CAST(c AS DOUBLE) / (s1.n + s2.n - c) AS jac
       |FROM common
       |JOIN sizes s1 ON s1.doc_id = d1
       |JOIN sizes s2 ON s2.doc_id = d2
       |WHERE CAST(c AS DOUBLE) / (s1.n + s2.n - c) >= 0.6
       |ORDER BY d1, d2""".stripMargin) { (s, dir) =>
    nearDuplicatePairs(Tables(s, dir).documents, threshold = 0.6)
      .orderBy("d1", "d2")
  }

  /** LSH candidate pairs (banding only, no verify): docs must have
    * (doc_id, text); returns distinct (d1, d2) with d1 < d2. */
  private[graft] def lshCandidates(docs: DataFrame): DataFrame =
    lshCandidatesFrom(shingles(docs))

  /** LSH band signatures (doc_id, band, sig) straight off the wide
    * xxhash64 minhash row — zero extra shuffles beyond the single
    * minhash aggregation. Deterministic across sessions (xxhash64 is a
    * pure function of the shingle bytes), so signatures persisted by
    * one run collide correctly with signatures computed by a later run
    * over the same shingle filter — the property
    * [[IncrementalDedup]]'s persisted band index relies on. */
  private[operators] def bandSignatures(sh: DataFrame): DataFrame = {
    val nBands = NumHashes / BandRows
    val wide = minhashWideFast(sh)
    wide.select(col("doc_id"),
      explode(array((0 until nBands).map { b =>
        // single-row bands keep the raw long (cheaper join key than a
        // concat string); multi-row bands concat their components
        val sig =
          if (BandRows == 1) col(s"mh$b")
          else xxhash64((0 until BandRows).map(r => col(s"mh${BandRows * b + r}")): _*)
        struct(lit(b).as("band"), sig.as("sig"))
      }: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** Banding over an explicit shingle frame — the capped path hands a
    * df-capped index here, because a corpus-wide hot shingle doesn't
    * just poison the verify: it wins the minhash minimum for ~1/(m+1)
    * of documents per seed and turns band buckets quadratic. MinHash
    * over the non-hot shingle set (standard stop-shingle MinHash)
    * bounds the buckets; the verify still counts over FULL sets. */
  private def lshCandidatesFrom(sh: DataFrame): DataFrame = {
    val bands = bandSignatures(sh)
    val b1 = bands.select(col("doc_id").as("d1"), col("band"), col("sig"))
    val b2 = bands.select(col("doc_id").as("d2"), col("band"), col("sig"))
    b1.join(b2, Seq("band", "sig"))
      .filter(col("d1") < col("d2"))
      .select("d1", "d2").distinct()
  }

  /** Shingle df-cap (stop-shingle pruning, the 100 TB skew guard).
    *
    * The inverted-index family's pair stage costs Σ_sh df(sh)² shuffled
    * rows; one boilerplate shingle shared by 10⁸ docs contributes 10¹⁶
    * pair rows on a single shuffle key. With a cap, shingles with
    * df > cap are excluded from PAIR GENERATION only — final counts and
    * set sizes still use the full shingle sets, so reported (c, n1, n2,
    * jac) values are exact, never approximations over pruned sets.
    *
    * Answer preservation: a qualifying pair is missed only if EVERY
    * common shingle is hot (df > cap). A pair with jac ≥ t shares
    * c ≥ t·min(n1,n2) shingles, so whenever the number of distinct hot
    * shingle types H satisfies H < t·min_doc_shingle_count, every
    * qualifying pair retains a non-hot witness and the capped answer is
    * provably identical (hot shingles are by definition few — df > cap
    * bounds H ≤ |index|/cap). DedupSpec plants a corpus-wide hot
    * boilerplate shingle and proves both equality and the pair-row
    * bound. */
  private def dropHotShingles(sh: DataFrame, dfCap: Long): DataFrame = {
    val hot = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") > dfCap).select("sh")
    // hot set is small by construction (≤ |index| / cap) → broadcast anti
    sh.join(broadcast(hot), Seq("sh"), "left_anti")
  }

  /** Exact common-shingle counts for an explicit candidate pair set:
    * explode each candidate by d1's full shingle set and match d2's.
    * Cost |cand|·|sh/doc| — bounded by the candidate set, immune to
    * shingle df skew. Pairs with no common shingle drop out (jac = 0). */
  private def verifyCommon(sh: DataFrame, candidates: DataFrame): DataFrame = {
    val s1 = sh.select(col("doc_id").as("d1"), col("sh"))
    val s2 = sh.select(col("doc_id").as("d2"), col("sh"))
    candidates.join(s1, Seq("d1")).join(s2, Seq("d2", "sh"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("c"))
  }

  /** (d1, d2, c, n1, n2) for all pairs sharing ≥1 (non-hot) shingle —
    * the shared pair stage of n05/n08. Uncapped: classic inverted-index
    * self-join. Capped: pair generation on the df-capped index, exact
    * counts re-derived from the FULL index per candidate. */
  private def commonCounts(sh: DataFrame, dfCap: Option[Long]): DataFrame = {
    val common = dfCap match {
      case None =>
        val a = sh.select(col("doc_id").as("d1"), col("sh"))
        val b = sh.select(col("doc_id").as("d2"), col("sh"))
        a.join(b, Seq("sh")).filter(col("d1") < col("d2"))
          .groupBy("d1", "d2").agg(count(lit(1)).as("c"))
      case Some(cap) =>
        val lite = dropHotShingles(sh, cap)
        val a = lite.select(col("doc_id").as("d1"), col("sh"))
        val b = lite.select(col("doc_id").as("d2"), col("sh"))
        val candidates = a.join(b, Seq("sh")).filter(col("d1") < col("d2"))
          .select("d1", "d2").distinct()
        verifyCommon(sh, candidates)
    }
    withSizes(common, sh.groupBy("doc_id").agg(count(lit(1)).as("n")))
  }

  /** Append n1/n2 from a (doc_id, n) sizes frame to a (d1, d2, c)
    * common-counts frame — the shared join tail of every Jaccard
    * form in this file. */
  private def withSizes(common: DataFrame, sizes: DataFrame): DataFrame =
    common
      .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), Seq("d1"))
      .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), Seq("d2"))

  /** jac = c / (n1 + n2 − c) over a [[withSizes]]-shaped frame,
    * filtered at `threshold` — THE batch-side Jaccard definition;
    * every pair form routes through here so the arithmetic can never
    * drift between the twins that share a DuckDB oracle body. */
  private def jacAtLeast(pairs: DataFrame, threshold: Double): DataFrame =
    pairs
      .withColumn("jac", col("c").cast("double") / (col("n1") + col("n2") - col("c")))
      .filter(col("jac") >= threshold)

  /** Library form of the MinHash+LSH near-dup pipeline: docs must have
    * (doc_id, text); returns (d1, d2, jac) with jac ≥ threshold.
    *
    * Verify stage, uncapped: common-shingle counts come from the
    * inverted index (shuffle on shingle, Σdf² pair rows) and are then
    * intersected with the LSH candidate set. The alternative — exploding
    * each candidate pair by its full shingle list — shuffles
    * |cand|·|sh/doc| rows, measured ~5× more than Σdf² on the harness
    * corpus. Every LSH candidate pair shares ≥1 shingle (its colliding
    * minhash), so the index side is a superset and the intersection
    * loses nothing.
    *
    * With `dfCap` set the trade inverts twice: (1) banding runs over
    * the df-capped shingle set — a hot shingle otherwise wins the
    * minhash minimum for ~1/(m+1) of docs per seed, making band
    * buckets themselves quadratic; (2) the verify switches to the
    * candidate-explode form (bounded by the LSH candidate set) instead
    * of the Σdf² index self-join. Counts stay exact because the verify
    * uses the FULL shingle sets; as everywhere with the cap, a pair
    * whose entire overlap is hot shingles is dropped (see
    * [[dropHotShingles]]). */
  def nearDuplicatePairs(docs: DataFrame, threshold: Double,
                         dfCap: Option[Long] = None): DataFrame = {
    val sh = shingles(docs)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))

    val common = dfCap match {
      case None =>
        val s1 = sh.select(col("doc_id").as("d1"), col("sh"))
        val s2 = sh.select(col("doc_id").as("d2"), col("sh"))
        s1.join(s2, Seq("sh")).filter(col("d1") < col("d2"))
          .groupBy("d1", "d2").agg(count(lit(1)).as("c"))
          .join(lshCandidatesFrom(sh), Seq("d1", "d2"), "left_semi")
      case Some(cap) =>
        verifyCommon(sh, lshCandidatesFrom(dropHotShingles(sh, cap)))
    }
    jacAtLeast(withSizes(common, sizes), threshold)
      .select("d1", "d2", "jac")
  }

  /** BATCH TWIN of the SATURATION-CAPPED streaming near-dup lane
    * ([[graft.streaming.StreamingOps.streamingNearDupPairs]] with
    * `maxBucket` set) — st29's Spark side, and the n113 pattern
    * finished on the STREAMING state axis (VERDICT r14 #1): the capped
    * lane's exact-answer equality was previously attested only by one
    * StreamingSpec test; as a catalog entry the driver hash re-attests
    * it every round.
    *
    * Semantics replicated exactly, with arrival order = doc_id order
    * (the per-key-ordered-log delivery contract the stream documents;
    * same-batch ties already sort by doc_id in the lane):
    *   - a (band, sig) bucket holds only its first `maxBucket`
    *     arrivals — later colliders neither enter NOR verify (the
    *     saturation gate runs before any per-arrival work);
    *   - a pair emits only from its FIRST colliding band over the FULL
    *     signature vectors, so a pair whose first band is saturated
    *     for either member is dropped, never re-emitted from a later
    *     live band (the stream's exactly-once rule, preserved here);
    *   - the Jaccard value is exact over the full shingle sets
    *     (verify-on-candidates, the same count the lane's hash-set
    *     intersection computes barring a 64-bit collision).
    *
    * Scale shape: band membership is one shuffle on (band, sig) with a
    * rank window — the per-bucket sort is bounded by the bucket, and
    * the self-join fan-out is capped at C(maxBucket, 2) per bucket, so
    * a 1,100-copy mega-cluster (one bucket here) costs O(cap²) instead
    * of O(cluster²): the exact blowup the uncapped lane's state and
    * emission pay (PERF.md round-14 skew ladder). With a cap wider
    * than every bucket the answer is IDENTICAL to the uncapped lane
    * and to the exact pair set (16×1 banding recall, n04's argument) —
    * which is what the DuckDB oracle checks at the harness SFs. */
  def nearDuplicatePairsCapped(docs: DataFrame, threshold: Double,
                               maxBucket: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nBands = NumHashes / BandRows
    val sh = shingles(docs)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // full signature vector per doc — xxhash64 chain, bit-identical to
    // the lane's rowBandSigs (StreamingSpec pins the chain to SQL
    // xxhash64); BandRows = 1 ⇒ sig b = mh b
    val withSigs = minhashWideFast(sh).select(col("doc_id"),
      array((0 until nBands).map(b => col(s"mh$b")): _*).as("sigs"))
    val bands = withSigs.select(col("doc_id"), col("sigs"),
      posexplode(col("sigs")).as(Seq("band", "sig")))
    val member = bands.withColumn("rk",
        row_number().over(Window.partitionBy("band", "sig").orderBy("doc_id")))
      .filter(col("rk") <= maxBucket)
      .drop("rk")
    // pairs among capped co-members; first-colliding-band over the FULL
    // vectors decides which single bucket may emit the pair
    val cand = member.select(col("band"), col("sig"),
        col("doc_id").as("d1"), col("sigs").as("sigs1"))
      .join(member.select(col("band"), col("sig"),
        col("doc_id").as("d2"), col("sigs").as("sigs2")), Seq("band", "sig"))
      .filter(col("d1") < col("d2"))
      .filter(col("band") ===
        array_position(zip_with(col("sigs1"), col("sigs2"), _ === _), true) - 1)
      .select("d1", "d2")
    jacAtLeast(withSizes(verifyCommon(sh, cand), sizes), threshold)
      .select("d1", "d2", "jac")
  }

  /** PRODUCTION-SHAPED LSH banding, hash-oracled (DECISIONS.md #4):
    * unlike n04 (16 bands × 1 row — recall ≈ 1 so the exact answer can
    * be its oracle), this entry runs the configuration a 100 TB corpus
    * would: 4 bands × 4 rows, P(candidate | J) = 1−(1−J⁴)⁴ < 1. A
    * recall-lossy pipeline can't be checked against the exact answer —
    * instead the DuckDB twin recomputes the SAME banding (md5-slice
    * minhash components are bit-portable, proven by n03; band signature
    * = '|'-joined components) so candidate generation itself is
    * hash-checked, then both engines verify exact Jaccard ≥ 0.6 on the
    * shared candidate set. */
  val lshBanded: Q = {
    val bandRows = 4
    val nBands = NumHashes / bandRows
    Q(
      "n17_lsh_banded",
      s"""WITH $shinglesSql,
         |mh AS (SELECT doc_id, j,
         |              min(substr(md5(CAST(j // 4 AS VARCHAR) || ':' || sh),
         |                         (j % 4) * 8 + 1, 8)) AS mh
         |       FROM sh CROSS JOIN (SELECT unnest(generate_series(0, ${NumHashes - 1})) AS j) seeds
         |       GROUP BY doc_id, j),
         |bands AS (SELECT doc_id, j // $bandRows AS band,
         |                 string_agg(mh, '|' ORDER BY j) AS sig
         |          FROM mh GROUP BY doc_id, j // $bandRows),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |         FROM bands a JOIN bands b
         |           ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
         |common AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
         |           FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |           GROUP BY a.doc_id, b.doc_id),
         |verified AS (SELECT co.d1, co.d2,
         |                    CAST(co.c AS DOUBLE) / (s1.n + s2.n - co.c) AS jac
         |             FROM common co
         |             JOIN cand USING (d1, d2)
         |             JOIN sizes s1 ON s1.doc_id = co.d1
         |             JOIN sizes s2 ON s2.doc_id = co.d2)
         |SELECT d1, d2, jac FROM verified
         |WHERE jac >= 0.6
         |ORDER BY d1, d2""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir).documents
      val sh = shingles(docs)
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val wide = minhashWide(sh)
      val bands = wide.select(col("doc_id"),
        explode(array((0 until nBands).map { b =>
          struct(lit(b).as("band"),
            concat_ws("|", (0 until bandRows).map(r => col(s"mh${bandRows * b + r}")): _*)
              .as("sig"))
        }: _*)).as("bs"))
        .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
      val cand = bands.select(col("doc_id").as("d1"), col("band"), col("sig"))
        .join(bands.select(col("doc_id").as("d2"), col("band"), col("sig")),
          Seq("band", "sig"))
        .filter(col("d1") < col("d2"))
        .select("d1", "d2").distinct()
      val s1 = sh.select(col("doc_id").as("d1"), col("sh"))
      val s2 = sh.select(col("doc_id").as("d2"), col("sh"))
      val common = s1.join(s2, Seq("sh")).filter(col("d1") < col("d2"))
        .groupBy("d1", "d2").agg(count(lit(1)).as("c"))
        .join(cand, Seq("d1", "d2"), "left_semi")
      jacAtLeast(withSizes(common, sizes), 0.6)
        .select("d1", "d2", "jac")
        .orderBy("d1", "d2")
    }
  }

  /** Exact n-gram Jaccard similarity join via the inverted shingle
    * index (shuffle on shingle, never all-pairs); threshold 0.5. */
  val ngramJaccard: Q = Q(
    "n05_ngram_jaccard",
    s"""WITH $shinglesSql,
       |common AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
       |           FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |           GROUP BY a.doc_id, b.doc_id)
       |SELECT d1, d2, CAST(c AS BIGINT) AS n_common,
       |       CAST(c AS DOUBLE) / (s1.n + s2.n - c) AS jac
       |FROM common
       |JOIN sizes s1 ON s1.doc_id = d1
       |JOIN sizes s2 ON s2.doc_id = d2
       |WHERE CAST(c AS DOUBLE) / (s1.n + s2.n - c) >= 0.5
       |ORDER BY d1, d2""".stripMargin) { (s, dir) =>
    jaccardPairs(Tables(s, dir).documents, threshold = 0.5).orderBy("d1", "d2")
  }

  /** Library form of the exact inverted-index Jaccard join: docs must
    * have (doc_id, text); returns (d1, d2, n_common, jac). `dfCap`
    * enables stop-shingle pruning for skewed corpora (see
    * [[dropHotShingles]] for the preservation argument). */
  def jaccardPairs(docs: DataFrame, threshold: Double,
                   dfCap: Option[Long] = None): DataFrame =
    jacAtLeast(commonCounts(shingles(docs), dfCap), threshold)
      .select(col("d1"), col("d2"), col("c").as("n_common"), col("jac"))

  /** 60-bit token-level SimHash fingerprint per document: one
    * aggregation with 60 vote columns (no 60× row explosion — at 100 TB
    * the explode formulation would shuffle 60× the token count). */
  def simhashFingerprints(docs: DataFrame): DataFrame = {
    // token -> 60-bit hash (15 hex chars of md5 fits in a signed long)
    val tokens = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .distinct()
      .withColumn("h", conv(substring(md5(col("tok").cast("binary")), 1, 15), 16, 10)
        .cast("long"))
    val votes = (0 until 60).map(b =>
      sum(when(expr(s"shiftright(h, $b) % 2 != 0"), 1).otherwise(-1)).as(s"v$b"))
    val fpExpr = (0 until 60)
      .map(b => s"IF(v$b >= 0, ${1L << b}L, 0L)").mkString(" + ")
    tokens.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), expr(fpExpr).as("simhash"))
  }

  /** SimHash near-pair candidates with hamming distance ≤ 3, banded
    * 4×15 bits (pigeonhole-sound: 4+ differing bits can still collide
    * on a band, ≤3 always do on some band — so the filter is exact).
    * Oracle: the identical pipeline in DuckDB — hex-cast of md5's
    * first 15 hex chars (= Spark's conv(...,16,10)), 60 generated vote
    * columns, bit_count(xor) for hamming. */
  val simhash: Q = Q(
    "n06_simhash",
    s"""WITH toks AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
       |              FROM documents),
       |h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks),
       |votes AS (SELECT doc_id,
       |${(0 until 60).map(b =>
            s"  sum(CASE WHEN (h >> $b) % 2 != 0 THEN 1 ELSE -1 END) AS v$b")
            .mkString(",\n")}
       |FROM h GROUP BY doc_id),
       |fp AS (SELECT doc_id,
       |${(0 until 60).map(b =>
            s"  CASE WHEN v$b >= 0 THEN ${1L << b} ELSE 0 END")
            .mkString("  ", "\n  + ", "")} AS simhash
       |FROM votes),
       |banded AS (SELECT doc_id, simhash, unnest(generate_series(0, 3)) AS band FROM fp),
       |chunked AS (SELECT doc_id, simhash, band,
       |                   (simhash >> (band * 15)) % 32768 AS chunk
       |            FROM banded),
       |pairs AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
       |                 a.simhash AS h1, b.simhash AS h2
       |          FROM chunked a JOIN chunked b
       |            ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
       |SELECT d1, d2, CAST(bit_count(xor(h1, h2)) AS BIGINT) AS hamming
       |FROM pairs
       |WHERE bit_count(xor(h1, h2)) <= 3
       |ORDER BY d1, d2""".stripMargin) { (s, dir) =>
    val fp = simhashFingerprints(Tables(s, dir).documents)
    // 4 bands of 15 bits: pairs sharing any band are hamming-candidates
    val banded = fp.withColumn("band", explode(expr("sequence(0, 3)")))
      .withColumn("chunk",
        expr("shiftright(simhash, CAST(band * 15 AS INT)) % 32768"))
    val p1 = banded.select(col("doc_id").as("d1"), col("simhash").as("h1"),
      col("band"), col("chunk"))
    val p2 = banded.select(col("doc_id").as("d2"), col("simhash").as("h2"),
      col("band"), col("chunk"))
    p1.join(p2, Seq("band", "chunk")).filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        bit_count(col("h1").bitwiseXOR(col("h2"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy("d1", "d2")
  }

  /** Containment similarity join: one row per unordered pair whose
    * SMALLER shingle set sits ≥ threshold inside the larger
    * (|A ∩ B| / min(|A|,|B|)) — catches a short document quoted inside
    * a long one, which symmetric Jaccard misses (the union term drowns
    * the overlap). Same inverted-index plan as n05: shuffle on the
    * shingle, d1 < d2 halves the Σdf² pair rows (ties on size don't
    * emit mirrored duplicates). Returns (contained, container,
    * n_contained, n_container, containment). */
  def containmentPairs(docs: DataFrame, threshold: Double,
                       dfCap: Option[Long] = None): DataFrame =
    containmentFrom(commonCounts(shingles(docs), dfCap), threshold)

  /** Shared (contained, container, n_contained, n_container,
    * containment) projection over a [[commonCounts]]-shaped frame —
    * one implementation for the corpus-wide and tiered forms. */
  private def containmentFrom(counts: DataFrame,
      threshold: Double): DataFrame =
    counts
      .withColumn("containment",
        col("c").cast("double") / least(col("n1"), col("n2")))
      .filter(col("containment") >= threshold)
      .select(
        when(col("n1") <= col("n2"), col("d1")).otherwise(col("d2")).as("contained"),
        when(col("n1") <= col("n2"), col("d2")).otherwise(col("d1")).as("container"),
        least(col("n1"), col("n2")).as("n_contained"),
        greatest(col("n1"), col("n2")).as("n_container"),
        col("containment"))

  val containment: Q = Q(
    "n08_containment",
    s"""WITH $shinglesSql,
       |common AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
       |           FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |           GROUP BY a.doc_id, b.doc_id)
       |SELECT CASE WHEN s1.n <= s2.n THEN d1 ELSE d2 END AS contained,
       |       CASE WHEN s1.n <= s2.n THEN d2 ELSE d1 END AS container,
       |       CAST(least(s1.n, s2.n) AS BIGINT) AS n_contained,
       |       CAST(greatest(s1.n, s2.n) AS BIGINT) AS n_container,
       |       CAST(c AS DOUBLE) / least(s1.n, s2.n) AS containment
       |FROM common
       |JOIN sizes s1 ON s1.doc_id = d1
       |JOIN sizes s2 ON s2.doc_id = d2
       |WHERE CAST(c AS DOUBLE) / least(s1.n, s2.n) >= 0.5
       |ORDER BY contained, container""".stripMargin) { (s, dir) =>
    containmentPairs(Tables(s, dir).documents, threshold = 0.5)
      .orderBy("contained", "container")
  }

  /** Containment pairs over an explicit SURVIVOR subset of `docs` —
    * the tier-2 stage of a tiered dedup pipeline (n114). Reuses the
    * memoized corpus shingle index semi-filtered by the survivor ids
    * instead of re-shingling the subset corpus: the tier-1 stage
    * (cluster reps) already built that index for its pair graph, and
    * an ad-hoc `shingles(subset)` would re-scan and re-explode the
    * corpus once per consumer of the shingle frame (three in this
    * plan) — measured 18 s vs ~6 s at sf0.1 for the same answer. At
    * rest the survivor set is corpus-proportional (most docs survive
    * dedup), so it is a shuffled semi-join, not a broadcast. */
  def containmentPairsTiered(docs: DataFrame, survivors: DataFrame,
      threshold: Double): DataFrame =
    containmentFrom(
      commonCounts(shingles(docs).join(survivors.select("doc_id"),
        Seq("doc_id"), "left_semi"), dfCap = None),
      threshold)

  /** STOP-SHINGLE containment (the unscreened-pair-family skew guard):
    * counts AND set sizes over the df-capped vocabulary — the IR
    * stopword treatment applied to shingles. Hot shingles (df > cap:
    * boilerplate and mega-cluster content by definition at 100 TB)
    * carry no discriminative signal; measuring containment over the
    * informative vocabulary is the standard production configuration.
    *
    * Why NOT [[commonCounts]]'s capped verify here: that form (pair
    * generation on the capped index, exact counts re-derived over the
    * FULL sets per candidate) is designed for LSH-BOUNDED candidate
    * sets, where the explode-by-full-shingle-list stage is small. An
    * unscreened pair family's candidate set is corpus-sized, and the
    * explode multiplies it by the per-doc shingle count — measured on
    * the 100× Zipfian corpus it filled 79 GB of shuffle and died,
    * while this one-pass bounded form completes (PERF.md round-13
    * skew ladders). With df ≤ cap the per-shingle pair fan-out is
    * bounded, so Σdf² is capped per key — no hot bucket exists. */
  def containmentPairsStopShingle(docs: DataFrame, threshold: Double,
      dfCap: Long): DataFrame = {
    val lite = dropHotShingles(shingles(docs), dfCap)
    val sizes = lite.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = lite.select(col("doc_id").as("d1"), col("sh"))
    val b = lite.select(col("doc_id").as("d2"), col("sh"))
    a.join(b, Seq("sh")).filter(col("d1") < col("d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("c"))
      .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), Seq("d1"))
      .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), Seq("d2"))
      .withColumn("containment",
        col("c").cast("double") / least(col("n1"), col("n2")))
      .filter(col("containment") >= threshold)
      .select(
        when(col("n1") <= col("n2"), col("d1")).otherwise(col("d2")).as("contained"),
        when(col("n1") <= col("n2"), col("d2")).otherwise(col("d1")).as("container"),
        least(col("n1"), col("n2")).as("n_contained"),
        greatest(col("n1"), col("n2")).as("n_container"),
        col("containment"))
  }

  /** n113: df-capped (stop-shingle) containment — n08 under the
    * configuration a 100 TB corpus actually runs (cap = 256). The
    * round-13 100× SKEW ladder is why this is a first-class entry:
    * uncapped n08 read exponent 0.94 over two decades on the Zipfian
    * corpus (the planted 1100-doc near-dup cluster's shingles carry
    * df = cluster size, so the Σdf² inverted-index self-join pays
    * cluster² pair rows per shared shingle type). The twin encodes
    * the SAME stop-shingle semantics, so the driver hash attests the
    * exact capped answer, never an approximation; at the harness SFs
    * no shingle exceeds the cap, lite ≡ full and n113 ≡ n08 — the
    * equality is itself evidence the capped PLAN computes the same
    * thing where no skew exists. Intra-mega-cluster pairs are the
    * dropped class under skew — exactly what cluster-rep dedup
    * (n07/n19) removes BEFORE any pairwise stage in a tiered
    * pipeline. */
  val containmentCapped: Q = {
    val cap = 256
    Q(
      "n113_containment_capped",
      s"""WITH $shinglesSql,
         |hot AS (SELECT sh FROM (SELECT sh, count(*) AS df FROM sh GROUP BY sh)
         |        WHERE df > $cap),
         |lite AS (SELECT doc_id, sh FROM sh
         |         WHERE sh NOT IN (SELECT sh FROM hot)),
         |lsizes AS (SELECT doc_id, count(*) AS n FROM lite GROUP BY doc_id),
         |common AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
         |           FROM lite a JOIN lite b
         |             ON a.sh = b.sh AND a.doc_id < b.doc_id
         |           GROUP BY a.doc_id, b.doc_id)
         |SELECT CASE WHEN s1.n <= s2.n THEN d1 ELSE d2 END AS contained,
         |       CASE WHEN s1.n <= s2.n THEN d2 ELSE d1 END AS container,
         |       CAST(least(s1.n, s2.n) AS BIGINT) AS n_contained,
         |       CAST(greatest(s1.n, s2.n) AS BIGINT) AS n_container,
         |       CAST(c AS DOUBLE) / least(s1.n, s2.n) AS containment
         |FROM common
         |JOIN lsizes s1 ON s1.doc_id = d1
         |JOIN lsizes s2 ON s2.doc_id = d2
         |WHERE CAST(c AS DOUBLE) / least(s1.n, s2.n) >= 0.5
         |ORDER BY contained, container""".stripMargin) { (s, dir) =>
      containmentPairsStopShingle(Tables(s, dir).documents,
          threshold = 0.5, dfCap = cap.toLong)
        .orderBy("contained", "container")
    }
  }

  /** MinHash estimate calibration: for every pair sharing enough
    * content to matter (exact Jaccard ≥ 0.05 via the inverted index),
    * the signature-only Jaccard ESTIMATE (matching components / 16)
    * side by side with the exact value and the absolute error. This is
    * the measurement that justifies the entire LSH family's existence:
    * E[est] = J per component (the MinHash identity), so the observed
    * errors sit inside the Binomial(16, J) envelope — and at 100 TB,
    * where the exact join is unaffordable corpus-wide, this calibration
    * on a sampled slice is how a pipeline validates its banding
    * thresholds before committing to them. The DuckDB twin recomputes
    * signatures (n03's md5-slice machinery), exact Jaccard, AND the
    * match counts, so estimate and error are hash-checked bit-for-bit.
    *
    * Scale shape: the estimate side joins the 16-column wide signature
    * frame (one row per doc) onto the BOUNDED calibration pair set —
    * never all signature pairs; the exact side is the same Σdf²
    * inverted-index join n05 pays (cap-able via [[dropHotShingles]]
    * on a skewed corpus). */
  val minhashEstimate: Q = {
    val minJac = 0.05
    Q(
      "n55_minhash_estimate",
      s"""WITH $shinglesSql,
         |mh AS (SELECT doc_id, j,
         |              min(substr(md5(CAST(j // 4 AS VARCHAR) || ':' || sh),
         |                         (j % 4) * 8 + 1, 8)) AS mh
         |       FROM sh CROSS JOIN (SELECT unnest(generate_series(0, ${NumHashes - 1})) AS j) seeds
         |       GROUP BY doc_id, j),
         |common AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
         |           FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |           GROUP BY a.doc_id, b.doc_id),
         |jacs AS (SELECT d1, d2, CAST(c AS DOUBLE) / (s1.n + s2.n - c) AS jac
         |         FROM common
         |         JOIN sizes s1 ON s1.doc_id = d1
         |         JOIN sizes s2 ON s2.doc_id = d2
         |         WHERE CAST(c AS DOUBLE) / (s1.n + s2.n - c) >= $minJac),
         |est AS (SELECT j.d1, j.d2,
         |               CAST(sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS BIGINT) AS matches
         |        FROM jacs j
         |        JOIN mh a ON a.doc_id = j.d1
         |        JOIN mh b ON b.doc_id = j.d2 AND b.j = a.j
         |        GROUP BY j.d1, j.d2)
         |SELECT d1, d2, jac, matches,
         |       CAST(matches AS DOUBLE) / $NumHashes AS est,
         |       abs(CAST(matches AS DOUBLE) / $NumHashes - jac) AS abs_err
         |FROM jacs JOIN est USING (d1, d2)
         |ORDER BY d1, d2""".stripMargin) { (s, dir) =>
      val sh = shingles(Tables(s, dir).documents)
      val jacs = jacAtLeast(commonCounts(sh, None), minJac)
        .select("d1", "d2", "jac")
      val m = minhashWide(sh)
      val m1 = m.select(col("doc_id").as("d1") +:
        (0 until NumHashes).map(j => col(s"mh$j").as(s"a_mh$j")): _*)
      val m2 = m.select(col("doc_id").as("d2") +:
        (0 until NumHashes).map(j => col(s"mh$j").as(s"b_mh$j")): _*)
      val matches = (0 until NumHashes)
        .map(j => when(col(s"a_mh$j") === col(s"b_mh$j"), 1L).otherwise(0L))
        .reduce(_ + _)
      jacs.join(m1, Seq("d1")).join(m2, Seq("d2"))
        .withColumn("matches", matches)
        .select(col("d1"), col("d2"), col("jac"), col("matches"),
          (col("matches").cast("double") / NumHashes).as("est"),
          abs(col("matches").cast("double") / NumHashes - col("jac")).as("abs_err"))
        .orderBy("d1", "d2")
    }
  }

  val all: Seq[Q] = Seq(exactDedup, normDedup, minhashSignature,
    lshNearDup, ngramJaccard, simhash, containment, containmentCapped,
    lshBanded, minhashEstimate)
}
