package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.Det._

/** Product quantization for ANN (Jégou et al. 2011, "Product
  * Quantization for Nearest Neighbor Search"): split the 64-dim
  * embedding into M = 4 contiguous 16-dim subspaces, k-means each
  * subspace independently (K = 16 codes here — see the K constant for
  * why not the production 256; L2 distance — PQ is a EUCLIDEAN
  * quantizer, unlike the cosine IVF family), encode every vector as 4
  * code ids (4 bytes instead of the 256-byte float embedding), and
  * answer queries with the ASYMMETRIC distance computation: the query
  * stays un-quantized, per-subspace distance TABLES (query → each of
  * the K centroids) are built once, and a database vector's distance
  * is just 4 table lookups summed.
  *
  * Scale shape (100 TB): training touches M·K tiny centroids
  * (broadcast); encoding is one broadcast-assignment pass over the
  * corpus (all M subspaces in ONE Lloyd state frame keyed by `m`, so
  * the loop runs one job per round, not M); the search never reads
  * embeddings — it joins the 4-byte code table against a broadcast
  * (q, m, cent) distance table of |Q|·M·K rows and ranks by a
  * fixed-order 4-term sum. That 16×-smaller scan side is the entire
  * point of PQ at scale.
  *
  * Determinism/oracle: seeding = first K vec_ids' sub-vectors; L2
  * distances are identical left-to-right folds in both engines;
  * assignment ties break by (round6(d2), cent_id); means are
  * decimal-exact and float-cast (the n16 Lloyd rules). The DuckDB twin
  * regenerates the ENTIRE chain — both Lloyd rounds per subspace, the
  * codebook, the codes, the distance tables, the 4-term ADC sum — from
  * the same generated SQL, so the approximate answer itself is
  * hash-checked (n11/n16's standard).
  */
object Pq {

  val M = 4        // subspaces
  val SubDim = 16  // dims per subspace (M * SubDim = 64)
  val K = 16       // codes per subspace (production PQ uses 256; 16
                   //   keeps the oracle's 2-round Lloyd chain tractable
                   //   while the harness embeddings — random, clusterless,
                   //   PQ's worst case — still rank far above chance)
  val Iters = 2    // Lloyd rounds per subspace

  private val NumQueries = 32
  private val TopK = 5

  /** Deterministic L2² between two equal-length float vectors: the
    * exact left-to-right double fold, as the codegen'd [[graft
    * .functions.L2Sq]] expression — bit-identical to the
    * `aggregate(zip_with(...))` tree it replaced (same FP sequence;
    * the native loop exists because Lloyd assignment at K = 256
    * evaluates it ~corpus × K times per round, and higher-order-
    * function dispatch was the hot path's cost) and to DuckDB's
    * list_reduce twin. */
  private def d2(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.l2_sq(a, b)

  // ---------------------------------------------------------------------
  // Session memoizer for shared PQ training artifacts (round 7 —
  // VERDICT_r06 #2's "memoize the shared coarse-centroid frame", and the
  // enabler for the n70 recall-calibration entries, which reuse the
  // exact codebooks/codes n62/n62r train). Same design rules as
  // Dedup's shingle memoizer: per-session (WeakHashMap keyed by
  // SparkSession; cached frames pin the session, so stopped sessions
  // are dropped explicitly), keyed on CANONICAL Tables frames only
  // (identity-stable across catalog queries; anything else builds
  // fresh), dead-flag + retry so a racing clear can never strand a
  // cached frame in a drained cache. This mirrors production shape —
  // an IVF-PQ deployment trains once and serves many queries (n64's
  // persisted index is the at-rest form; this is the in-session form).
  // Bench/scale-slope cold modes clear it like the other memoizers.
  // ---------------------------------------------------------------------

  private final class PqCache {
    val memo = new java.util.HashMap[(DataFrame, String), DataFrame]()
    var dead = false
  }
  private val pqCaches =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, PqCache]()

  private def memoized(vecs: DataFrame, tag: String)(build: => DataFrame): DataFrame = {
    if (!graft.Tables.isCanonical(vecs)) return build
    while (true) {
      val cache = pqCaches.synchronized {
        val it = pqCaches.entrySet().iterator()
        while (it.hasNext) {
          if (it.next().getKey.sparkContext.isStopped) it.remove()
        }
        var c = pqCaches.get(vecs.sparkSession)
        if (c == null) { c = new PqCache; pqCaches.put(vecs.sparkSession, c) }
        c
      }
      cache.synchronized {
        if (!cache.dead) {
          val key = (vecs, tag)
          var v = cache.memo.get(key)
          if (v == null) { v = build.cache(); cache.memo.put(key, v) }
          return v
        }
        // cache cleared between fetch and lock — retry with a fresh one
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Unpersist and forget every PQ frame cached for `spark` — wired
    * into Bench's and Lab's cold modes next to the dedup/cluster
    * memoizer clears. */
  def clearPqCache(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cache = pqCaches.synchronized(pqCaches.remove(spark))
    if (cache != null) cache.synchronized {
      cache.dead = true
      cache.memo.values.forEach(df =>
        try df.unpersist() catch { case _: Throwable => () })
      cache.memo.clear()
    }
  }

  /** (m, cent_id, cv) sub-vector seeds: the first k vec_ids' slices,
    * all M subspaces in one frame. */
  private def seedCentroids(vecs: DataFrame, k: Int): DataFrame =
    vecs.orderBy("vec_id").limit(k)
      .select(col("vec_id").as("cent_id"), explode(expr(
        s"transform(sequence(0, ${M - 1}), " +
          s"m -> named_struct('m', m, 'cv', slice(embedding, m * $SubDim + 1, $SubDim)))"))
        .as("s"))
      .select(col("s.m").as("m"), col("cent_id"), col("s.cv").as("cv"))

  /** (vec_id, m, sv): every vector's M sub-vectors — map-side explode,
    * the shared input of training, encoding and the query tables. */
  private def subVectors(vecs: DataFrame): DataFrame =
    vecs.select(col("vec_id"), explode(expr(
      s"transform(sequence(0, ${M - 1}), " +
        s"m -> named_struct('m', m, 'sv', slice(embedding, m * $SubDim + 1, $SubDim)))"))
      .as("s"))
      .select(col("vec_id"), col("s.m").as("m"), col("s.sv").as("sv"))

  /** One assignment pass: each (vector, subspace) to its nearest
    * centroid by (round6(L2²), cent_id). Returns (vec_id, m, cell, sv). */
  private def assign(sub: DataFrame, cents: DataFrame): DataFrame =
    sub.join(broadcast(cents), Seq("m"))
      .select(col("vec_id"), col("m"), col("cent_id"), col("sv"),
        round6(d2(col("sv"), col("cv"))).as("dist"))
      .groupBy("vec_id", "m")
      .agg(min_by(struct(col("cent_id"), col("sv")),
        struct(col("dist"), col("cent_id"))).as("best"))
      .select(col("vec_id"), col("m"),
        col("best.cent_id").as("cell"), col("best.sv").as("sv"))

  /** Per-subspace k-means codebooks: (m, cent_id, cv) after `iters`
    * Lloyd rounds. All M subspaces train in ONE state frame — one
    * broadcast-assignment job + one (m, cell, pos) mean aggregation
    * per round regardless of M. `k` defaults to the oracle-tractable
    * 16; pass 256 for production 8-bit codes (n62 does — seeds clamp
    * to the corpus size when it is smaller). */
  def codebooks(vecs: DataFrame, iters: Int = Iters, k: Int = K): DataFrame = {
    val sub = subVectors(vecs)
    var cents = seedCentroids(vecs, k).localCheckpoint()
    (1 to iters).foreach { _ =>
      // float → DOUBLE → decimal: Spark rounds a FLOAT's 9-digit
      // shortest string to the decimal scale, DuckDB rounds the binary
      // value — they disagree on .5e-6-boundary elements (observed:
      // 109/512 centroid floats off by ulps before this, 2/160 ADC
      // rows flipping round6). Both engines round the same DOUBLE the
      // same way; the twin casts CAST(x AS DOUBLE) identically.
      val refreshed = assign(sub, cents)
        .select(col("m"), col("cell").as("cent_id"), posexplode(col("sv")))
        .groupBy("m", "cent_id", "pos")
        .agg((sum(col("col").cast("double").cast("decimal(25,6)")).cast("double") /
          count(lit(1))).as("mu"))
        .groupBy("m", "cent_id")
        .agg(array_sort(collect_list(struct(col("pos"), col("mu")))).as("pm"))
        .select(col("m"), col("cent_id"),
          transform(col("pm"), s => s.getField("mu")).cast("array<float>").as("cv"))
      // empty cells keep their previous centroid (k must not shrink)
      cents = cents.select(col("m"), col("cent_id"), col("cv").as("prev"))
        .join(refreshed, Seq("m", "cent_id"), "left")
        .select(col("m"), col("cent_id"),
          coalesce(col("cv"), col("prev")).as("cv"))
        .localCheckpoint()
    }
    cents
  }

  /** PQ codes: (vec_id, m, code) — the 4-byte-per-vector representation
    * the 100 TB search scans instead of embeddings. */
  def encode(vecs: DataFrame, books: DataFrame): DataFrame =
    assign(subVectors(vecs), books)
      .select(col("vec_id"), col("m"), col("cell").as("code"))

  // Shared (memoized) training artifacts — one trained model per
  // (canonical corpus, parameters) per session, reused across the
  // catalog's PQ family exactly as a deployment reuses one index.
  private def sharedBooks(vecs: DataFrame, k: Int): DataFrame =
    memoized(vecs, s"books:$k")(codebooks(vecs, Iters, k))
  /** `books` must be [[sharedBooks]](vecs, k) — passed in so the
    * non-canonical (unmemoized) path encodes against the caller's
    * already-built codebooks instead of training a second time. */
  private def sharedCodes(vecs: DataFrame, k: Int, books: DataFrame): DataFrame =
    memoized(vecs, s"codes:$k")(encode(vecs, books))
  private def sharedRawAsg(vecs: DataFrame, nCells: Int): DataFrame =
    memoized(vecs, s"rawasg:$nCells")(assignCoarse(vecs,
      vecs.filter(col("vec_id") < nCells)
        .select(col("vec_id").as("cell"), col("embedding").as("cv"))))
  private def sharedCoarse(vecs: DataFrame, nCells: Int): DataFrame =
    memoized(vecs, s"coarse:$nCells")(coarseCentroids(vecs, nCells))
  // The residual helpers take their upstream frames as parameters (the
  // [[sharedCodes]] contract): on the canonical path each layer
  // memoizes under its own key; on the unmemoized path the caller's
  // already-built frames are reused instead of re-trained.
  private def sharedCoarseAsg(vecs: DataFrame, nCells: Int,
      anchors: DataFrame): DataFrame =
    memoized(vecs, s"coarseasg:$nCells")(assignCoarse(vecs, anchors))
  private def sharedResVecs(vecs: DataFrame, nCells: Int,
      anchors: DataFrame, asg: DataFrame): DataFrame =
    memoized(vecs, s"resvecs:$nCells")(residualVecs(vecs, anchors, asg))
  private def sharedResBooks(vecs: DataFrame, nCells: Int, k: Int,
      res: DataFrame): DataFrame =
    memoized(vecs, s"resbooks:$nCells:$k")(codebooks(res, Iters, k))
  private def sharedResCodes(vecs: DataFrame, nCells: Int, k: Int,
      res: DataFrame, books: DataFrame): DataFrame =
    memoized(vecs, s"rescodes:$nCells:$k")(encode(res, books))

  /** Asymmetric-distance top-k: exact per-subspace distance tables for
    * each query (|Q|·M·K rows, broadcast), then a lookup join against
    * the code table and a FIXED-ORDER 4-term sum (a floating sum under
    * groupBy would be partition-order-dependent — the m-pivot keeps it
    * deterministic and oracle-matchable). */
  def adcTopK(codes: DataFrame, books: DataFrame, queries: DataFrame,
      k: Int): DataFrame = {
    val qsub = subVectors(queries).select(
      col("vec_id").as("q_id"), col("m"), col("sv").as("qs"))
    val dtab = qsub.join(books, Seq("m"))
      .select(col("q_id"), col("m"), col("cent_id"), d2(col("qs"), col("cv")).as("d"))
    val perM = codes
      .join(broadcast(dtab),
        codes("m") === dtab("m") && codes("code") === dtab("cent_id"))
      .select(col("q_id"), col("vec_id"), codes("m").as("m"), col("d"))
      .groupBy("q_id", "vec_id")
      .agg(max(when(col("m") === 0, col("d"))).as("d0"),
        (1 until M).map(m => max(when(col("m") === m, col("d"))).as(s"d$m")): _*)
    val adc = round6((0 until M).map(m => col(s"d$m")).reduce(_ + _))
    val w = Window.partitionBy("q_id").orderBy(col("adc"), col("nb_id"))
    perM
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("nb_id"), adc.as("adc"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  // ---------------------------------------------------------------------
  // DuckDB twin: the same chain as generated SQL.
  // ---------------------------------------------------------------------

  /** Strict LEFT-FOLD L2² (list_reduce, not list_sum): DuckDB's
    * list_sum may re-associate the accumulation, which differs from
    * Spark's sequential `aggregate` fold by an ulp — enough to flip
    * round6 on a .xxxxxx5-boundary ADC value (observed: 2/160 rows at
    * sf0.01 before this). list_reduce folds in index order, matching
    * Spark bit-for-bit. */
  private def d2Sql(a: String, b: String, dim: Int = SubDim): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      s"list_transform(generate_series(1, $dim), " +
      s"i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * " +
      s"(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)))), (acc, x) -> acc + x)"

  private def roundSql(r: Int): String =
    s"""asg$r AS (SELECT vec_id, m, cell, sv FROM (
       |    SELECT s.vec_id, s.m, c.cent_id AS cell, s.sv,
       |           row_number() OVER (PARTITION BY s.vec_id, s.m
       |             ORDER BY ${round6Sql(d2Sql("s.sv", "c.cv"))}, c.cent_id) AS rn
       |    FROM tsub s JOIN c${r - 1} c ON c.m = s.m) WHERE rn = 1),
       |mm$r AS (SELECT a.m, a.cell AS cent_id, d.i,
       |               CAST(sum(CAST(CAST(a.sv[d.i] AS DOUBLE) AS DECIMAL(25,6))) AS DOUBLE)
       |                 / count(*) AS mu
       |        FROM asg$r a
       |        CROSS JOIN (SELECT unnest(generate_series(1, $SubDim)) AS i) d
       |        GROUP BY 1, 2, 3),
       |cv$r AS (SELECT m, cent_id, list(CAST(mu AS REAL) ORDER BY i) AS cv
       |        FROM mm$r GROUP BY m, cent_id),
       |c$r AS (SELECT p.m, p.cent_id, coalesce(n.cv, p.cv) AS cv
       |       FROM c${r - 1} p LEFT JOIN cv$r n
       |         ON n.m = p.m AND n.cent_id = p.cent_id)""".stripMargin

  /** The shared twin chain: sub-vectors, k seeds, the full Lloyd loop,
    * the code table, and the per-query distance tables — everything up
    * to the ADC ranking, which n56 (all pairs) and n62 (IVF-restricted)
    * finish differently. `trainWhere` restricts SEEDING and the Lloyd
    * rounds to a sub-corpus (n64's frozen-codebook semantics: train on
    * the prior snapshot, encode everything); codes and query tables
    * always cover the full corpus. */
  /** `embSrc` swaps the EMBEDDING VALUES feeding the encode side (the
    * `sub` rows that become `codes`, and `asg` in [[ivfPqIndexSql]]) —
    * the upsert twin (n100) routes a CASE-edited corpus through it.
    * The default emits byte-identical SQL to the historical text.
    * Callers passing a non-default source must keep every TRAINED
    * artifact's inputs unedited: train rows (`trainWhere`), centroid
    * seeds, coarse anchors and query vectors all read through the same
    * CTEs, so the edit predicate must exclude them (n100's edits are
    * odd non-query ids; train/anchors are even, queries < NumQueries). */
  private def lloydChainSql(k: Int, trainWhere: String = "true",
      embSrc: String = "embeddings"): String =
    s"""sub AS (SELECT vec_id, md.m,
       |                    list_slice(embedding, md.m * $SubDim + 1,
       |                               (md.m + 1) * $SubDim) AS sv
       |             FROM $embSrc
       |             CROSS JOIN (SELECT unnest(generate_series(0, ${M - 1})) AS m) md),
       |tsub AS (SELECT * FROM sub WHERE $trainWhere),
       |c0 AS (SELECT m, vec_id AS cent_id, sv AS cv FROM sub
       |       WHERE vec_id IN (SELECT vec_id FROM embeddings WHERE $trainWhere
       |                        ORDER BY vec_id LIMIT $k)),
       |${(1 to Iters).map(roundSql).mkString(",\n")},
       |codes AS (SELECT vec_id, m, cell AS code FROM (
       |    SELECT s.vec_id, s.m, c.cent_id AS cell,
       |           row_number() OVER (PARTITION BY s.vec_id, s.m
       |             ORDER BY ${round6Sql(d2Sql("s.sv", "c.cv"))}, c.cent_id) AS rn
       |    FROM sub s JOIN c$Iters c ON c.m = s.m) WHERE rn = 1),
       |dtab AS (SELECT q.vec_id AS q_id, q.m, c.cent_id,
       |                ${d2Sql("q.sv", "c.cv")} AS d
       |         FROM sub q JOIN c$Iters c ON c.m = q.m
       |         WHERE q.vec_id < $NumQueries)""".stripMargin

  private val adcSumSql: String = round6Sql((0 until M)
    .map(m => s"max(CASE WHEN cd.m = $m THEN dt.d END)")
    .mkString(" + "))

  private val pqSql: String =
    s"""WITH ${lloydChainSql(K)},
       |adc AS (SELECT dt.q_id, cd.vec_id, $adcSumSql AS adc
       |        FROM codes cd
       |        JOIN dtab dt ON dt.m = cd.m AND dt.cent_id = cd.code
       |        WHERE dt.q_id <> cd.vec_id
       |        GROUP BY 1, 2),
       |ranked AS (SELECT q_id, vec_id AS nb_id, adc,
       |                  row_number() OVER (PARTITION BY q_id
       |                                     ORDER BY adc, vec_id) AS rn
       |           FROM adc)
       |SELECT q_id, nb_id, adc, CAST(rn AS BIGINT) AS rn
       |FROM ranked WHERE rn <= $TopK
       |ORDER BY q_id, rn""".stripMargin

  /** Catalog entry: the full PQ pipeline — train, encode, ADC search —
    * hash-checked end to end. PqSpec additionally bounds recall vs the
    * exact L2 answer (the property a hash oracle can't state). */
  val pqAdc: Q = Q("n56_pq_adc", pqSql) { (s, dir) =>
    val e = Tables(s, dir).embeddings
    val books = sharedBooks(e, K)
    adcTopK(sharedCodes(e, K, books), books,
      e.filter(col("vec_id") < NumQueries), TopK)
      .orderBy("q_id", "rn")
  }

  // ---------------------------------------------------------------------
  // n62: IVF-PQ — the standard 100 TB ANN shape (VERDICT r04 #2).
  // ---------------------------------------------------------------------

  val IvfCells = 8   // coarse cells (deterministic anchors: first 8 ids)
  val IvfProbe = 2   // cells probed per query
  val KProd = 256    // production codebook: 8-bit codes per subspace

  private val FullDim = M * SubDim

  /** Coarse L2 cell assignment: (vec_id, cell) — each vector to its
    * nearest anchor by (round6(L2²), cell) over the FULL embedding.
    * L2 throughout (anchor assignment, probe selection, ADC) so the
    * composed search optimizes one metric end to end — unlike the
    * cosine IVF family (n13/n16), which pairs with cosine re-rank. */
  private def assignCoarse(vecs: DataFrame, cents: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cell"),
        round6(d2(col("embedding"), col("cv"))).as("dist"))
      .groupBy("vec_id")
      .agg(min_by(col("cell"), struct(col("dist"), col("cell"))).as("cell"))

  /** Probe selection with the rank kept: each query's cells ordered by
    * (round6(L2²), cell), restricted to rn ≤ maxProbe. Keeping rn lets
    * the n70 calibration sweep derive every nProbe level from ONE
    * ranked frame. */
  private def probeCoarseRanked(queries: DataFrame, cents: DataFrame,
      maxProbe: Int): DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(col("dist"), col("cell"))
    queries.select(col("vec_id").as("q_id"), col("embedding"))
      .crossJoin(broadcast(cents))
      .select(col("q_id"), col("cell"),
        round6(d2(col("embedding"), col("cv"))).as("dist"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= maxProbe)
      .select("q_id", "cell", "rn")
  }

  /** Probe selection: each query's `nProbe` nearest cells by the same
    * rounded-L2 order. */
  private def probeCoarse(queries: DataFrame, cents: DataFrame,
      nProbe: Int): DataFrame =
    probeCoarseRanked(queries, cents, nProbe).select("q_id", "cell")

  /** IVF-PQ top-k: coarse cells prune the corpus, PQ/ADC ranks inside
    * the probed cells. This is the composition a 100 TB deployment
    * runs: the corpus at rest is 8-bit PQ codes PARTITIONED BY coarse
    * cell, a query reads only its nProbe cells' code partitions
    * (partition pruning — nProbe/nCells of the code table, which is
    * itself 16× smaller than the embeddings), and the scan side of the
    * ADC join never touches a float vector. Candidate generation and
    * ranking are both candidate-bounded; nothing rescans the corpus.
    *
    * Deterministic end to end (round6 + id tiebreaks at every argmin),
    * so the whole composition — anchors, assignment, probes, Lloyd
    * codebooks, codes, distance tables, restricted ADC — hash-checks
    * against the DuckDB twin. */
  def ivfPqTopK(vecs: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = IvfCells, nProbe: Int = IvfProbe,
      kCodes: Int = KProd): DataFrame = {
    val cents = vecs.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cell"), col("embedding").as("cv"))
    val asg = sharedRawAsg(vecs, nCells)
    val cand = probeCoarse(queries, cents, nProbe)
      .join(asg, Seq("cell"))
      .select(col("q_id"), col("vec_id"))
      .filter(col("q_id") =!= col("vec_id"))
    val books = sharedBooks(vecs, kCodes)
    val codes = sharedCodes(vecs, kCodes, books)
    // candidate-restricted ADC: codes flow through the (q_id, vec_id)
    // candidate set FIRST, so only probed cells' codes reach the
    // distance-table lookup (the partition-pruning read, as a join)
    val withCodes = cand.join(codes, Seq("vec_id"))
      .select(col("q_id"), col("vec_id"), col("m"), col("code"))
    restrictedAdc(withCodes, books, queries, k)
  }

  /** The shared tail of every cell-restricted search (n62/n64): per-
    * query distance tables against `books`, a broadcast lookup join
    * over the candidate (q_id, vec_id, m, code) rows, the fixed-order
    * M-term ADC sum, and the (adc, nb_id) ranking. */
  /** Unranked ADC values (q_id, nb_id, adc) for a candidate code set —
    * the shared pivot [[restrictedAdc]] ranks, split out (round 15) so
    * the n70 calibration sweeps can compute the pivot ONCE over the
    * maximal candidate set and derive every nProbe level by rank
    * filtering. */
  private def adcValues(candCodes: DataFrame, books: DataFrame,
      queries: DataFrame): DataFrame = {
    val qsub = subVectors(queries).select(
      col("vec_id").as("q_id"), col("m"), col("sv").as("qs"))
    val dtab = qsub.join(books, Seq("m"))
      .select(col("q_id"), col("m"), col("cent_id"), d2(col("qs"), col("cv")).as("d"))
    val perM = candCodes
      .join(broadcast(dtab.withColumnRenamed("m", "__dm")
          .withColumnRenamed("cent_id", "__dc")
          .withColumnRenamed("q_id", "__dq")),
        candCodes("m") === col("__dm") && candCodes("code") === col("__dc") &&
          candCodes("q_id") === col("__dq"))
      .select(col("q_id"), col("vec_id"), col("m"), col("d"))
      // one exchange for the pivot AND the rank window (round 15,
      // guide §2.4): hash(q_id) satisfies the (q_id, vec_id) grouping
      // (subset clustering) and the window's q_id partitioning, so the
      // explicit repartition establishes the partitioning once — the
      // old plan exchanged on (q_id, vec_id) for the aggregate and
      // AGAIN on q_id for the ranking
      .repartition(col("q_id"))
      .groupBy("q_id", "vec_id")
      .agg(max(when(col("m") === 0, col("d"))).as("d0"),
        (1 until M).map(m => max(when(col("m") === m, col("d"))).as(s"d$m")): _*)
    val adc = round6((0 until M).map(m => col(s"d$m")).reduce(_ + _))
    perM.select(col("q_id"), col("vec_id").as("nb_id"), adc.as("adc"))
  }

  private def restrictedAdc(candCodes: DataFrame, books: DataFrame,
      queries: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(col("adc"), col("nb_id"))
    adcValues(candCodes, books, queries)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  private val ivfPqSql: String =
    s"""WITH ${lloydChainSql(KProd)},
       |cc AS (SELECT vec_id AS cell, embedding AS cv FROM embeddings
       |       WHERE vec_id < $IvfCells),
       |asg AS (SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, c.cell,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${round6Sql(d2Sql("e.embedding", "c.cv", FullDim))}, c.cell) AS rn
       |    FROM embeddings e CROSS JOIN cc c) WHERE rn = 1),
       |probes AS (SELECT q_id, cell FROM (
       |    SELECT e.vec_id AS q_id, c.cell,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${round6Sql(d2Sql("e.embedding", "c.cv", FullDim))}, c.cell) AS rn
       |    FROM embeddings e CROSS JOIN cc c
       |    WHERE e.vec_id < $NumQueries) WHERE rn <= $IvfProbe),
       |cand AS (SELECT p.q_id, a.vec_id FROM probes p
       |         JOIN asg a ON a.cell = p.cell
       |         WHERE a.vec_id <> p.q_id),
       |adc AS (SELECT cn.q_id, cd.vec_id, $adcSumSql AS adc
       |        FROM cand cn
       |        JOIN codes cd ON cd.vec_id = cn.vec_id
       |        JOIN dtab dt ON dt.m = cd.m AND dt.cent_id = cd.code
       |                    AND dt.q_id = cn.q_id
       |        GROUP BY 1, 2),
       |ranked AS (SELECT q_id, vec_id AS nb_id, adc,
       |                  row_number() OVER (PARTITION BY q_id
       |                                     ORDER BY adc, vec_id) AS rn
       |           FROM adc)
       |SELECT q_id, nb_id, adc, CAST(rn AS BIGINT) AS rn
       |FROM ranked WHERE rn <= $TopK
       |ORDER BY q_id, rn""".stripMargin

  /** Catalog entry: IVF-PQ with K = 256 8-bit codes — coarse anchors,
    * assignment, probes, the 256-centroid Lloyd chain, encoding, and
    * the cell-restricted ADC ranking, hash-checked end to end. PqSpec
    * additionally proves the pruning (candidates ≪ corpus) and bounds
    * recall vs the in-cell exact-L2 answer. */
  val ivfPqAdc: Q = Q("n62_ivf_pq", ivfPqSql) { (s, dir) =>
    val e = Tables(s, dir).embeddings
    ivfPqTopK(e, e.filter(col("vec_id") < NumQueries), TopK)
      .orderBy("q_id", "rn")
  }

  // ---------------------------------------------------------------------
  // n64: the PERSISTED IVF-PQ index — the serving lifecycle of the n62
  // composition. Train once on the prior corpus (anchors + codebooks),
  // persist codes PARTITIONED BY coarse cell, append new batches by
  // encoding them against the FROZEN codebooks (standard IVF-PQ
  // practice — retraining is a rebuild, the n57/n59 compaction trade),
  // and search by reading only the probed cells' code partitions.
  // ---------------------------------------------------------------------

  /** The persisted IVF-PQ index: coarse anchors (cell, cv), per-
    * subspace codebooks (m, cent_id, cv), and the cell-partitioned
    * code table (vec_id, cell, m, code) — 4 bytes + a cell id per
    * vector, the only thing a search scans. */
  final case class PqIndex(anchors: DataFrame, books: DataFrame,
      codes: DataFrame)

  /** Train on `vecs`: anchors = first `nCells` vec_ids (oracle-locked,
    * the n41 pattern — the Lloyd loop is hash-oracled separately),
    * codebooks = the shared one-frame Lloyd trainer, codes = every
    * vector's (cell, 4 sub-codes). */
  def buildPqIndex(vecs: DataFrame, nCells: Int = IvfCells,
      kCodes: Int = KProd): PqIndex = {
    val anchors = vecs.orderBy("vec_id").limit(nCells)
      .select(col("vec_id").as("cell"), col("embedding").as("cv"))
    val books = codebooks(vecs, Iters, kCodes)
    val codes = encode(vecs, books)
      .join(assignCoarse(vecs, anchors), Seq("vec_id"))
    PqIndex(anchors, books, codes)
  }

  /** Append a new batch with the index's FROZEN anchors + codebooks:
    * one broadcast encode/assign pass over the batch — the prior
    * corpus's codes are untouched, its embeddings never re-read. */
  def appendPqIndex(index: PqIndex, newVecs: DataFrame): PqIndex =
    index.copy(codes = index.codes.unionByName(
      encode(newVecs, index.books)
        .join(assignCoarse(newVecs, index.anchors), Seq("vec_id"))))

  /** Delete vectors (takedowns) — the n93 tombstone semantics. EXACT
    * for search: `codes` is the only per-vector component, so a
    * delete-carrying index answers identically to one rebuilt by
    * re-encoding the survivors under the SAME frozen anchors/books
    * (PqSpec pins it). Anchors and codebooks are the index's trained
    * configuration and are intentionally untouched — like the dedup
    * index's hot list, narrowing them on delete would change every
    * remaining vector's quantization. */
  def deletePqIndex(index: PqIndex, tombstones: DataFrame): PqIndex =
    index.copy(codes = index.codes.join(
      broadcast(tombstones.select(col("vec_id")).distinct()),
      Seq("vec_id"), "left_anti"))

  /** Keep only the vectors in `allowed` — the metadata pre-filter
    * (n109/n111's tenant scope) under the FROZEN configuration: codes
    * are the only per-vector component, so the filtered index answers
    * identically to re-encoding the allowed vectors under the same
    * anchors/books (the n98 exactness, delete's left_semi dual).
    * Unlike a tombstone set, an allowed set is corpus-proportional
    * (a 20% tenant of 100 TB) — NO broadcast hint; the join keys on
    * vec_id and at rest the label lives in the cell-partitioned code
    * rows where a pushed predicate prunes at scan. */
  def filterPqIndex(index: PqIndex, allowed: DataFrame): PqIndex =
    index.copy(codes = index.codes.join(
      allowed.select(col("vec_id")).distinct(), Seq("vec_id"), "left_semi"))

  /** Upsert a batch (insert-or-replace by vec_id) — the U axis for
    * the ANN index: re-embedded documents (an embedding-model refresh
    * over a slice, an edited doc re-encoded) land as one batch.
    * Composition of the exact primitives: tombstone the batch's ids
    * (no-op for new ids), then ONE encode/assign pass over the batch
    * under the FROZEN anchors + books — the trained configuration is
    * never narrowed or retrained, so every untouched code row is
    * byte-identical and the replaced vectors may legitimately move
    * cells (re-assignment under frozen anchors IS the re-insert).
    * n100 oracles the result against a from-scratch encode of the
    * edited corpus under the same frozen configuration. */
  def upsertPqIndex(index: PqIndex, newVecs: DataFrame): PqIndex =
    appendPqIndex(deletePqIndex(index, newVecs.select("vec_id")), newVecs)

  /** Search the index: probe selection against the broadcast anchors,
    * then the restricted ADC over ONLY the probed cells' code rows —
    * with the at-rest cell partitioning, that cell join is partition
    * pruning. */
  def searchPqIndex(queries: DataFrame, index: PqIndex,
      nProbe: Int = IvfProbe, k: Int = TopK): DataFrame = {
    val candCodes = probeCoarse(queries, index.anchors, nProbe)
      .join(index.codes, Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"), col("m"), col("code"))
    restrictedAdc(candCodes, index.books, queries, k)
  }

  /** Persist under [[IndexCommit]]'s manifest layout; `codes` is
    * additionally partitioned by `cell` on disk, so a probe's cell
    * filter becomes directory-level partition pruning. */
  def writePqIndex(index: PqIndex, path: String): Unit = {
    val spark = index.anchors.sparkSession
    IndexCommit.clear(spark, path)
    index.anchors.write.mode("overwrite").parquet(s"$path/anchors/b_base")
    index.books.write.mode("overwrite").parquet(s"$path/books/b_base")
    index.codes.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/codes/b_base")
    IndexCommit.commitManifest(spark, path, "base")
  }

  /** Append a batch's codes on disk (frozen anchors/books read from
    * the index, batch codes land cell-partitioned in their own
    * manifested dir — atomic commit, O(batch) retry). */
  def appendToPqIndex(newVecs: DataFrame, path: String,
      label: String = ""): Unit = {
    val spark = newVecs.sparkSession
    val index = readPqIndex(spark, path)
    val lbl =
      if (label.nonEmpty) label
      else s"a${IndexCommit.committedLabels(spark, path).size}"
    encode(newVecs, index.books)
      .join(assignCoarse(newVecs, index.anchors), Seq("vec_id"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/codes/b_$lbl")
    IndexCommit.commitManifest(spark, path, lbl)
  }

  /** Whether a committed index exists at `path` — the ingest lane's
    * initialization probe (train-on-first-batch must key off the
    * INDEX's state, not the batchId: a skipped empty batch 0 or a
    * fresh path under a reused checkpoint would otherwise wedge every
    * subsequent append on the missing-index require). */
  def hasPqIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): Boolean =
    IndexCommit.committedLabels(spark, path).nonEmpty

  def readPqIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): PqIndex = {
    val labels = IndexCommit.committedLabels(spark, path)
    require(labels.nonEmpty, s"no committed index at $path")
    // codes are cell-partitioned WITHIN each batch dir, so the dirs
    // cannot share one multi-path read (conflicting partition roots);
    // read per batch — each infers its own cell= layout — and union
    val codes = IndexCommit.componentDirs(spark, path, "codes", labels)
      .map(d => spark.read.parquet(d))
      .reduce(_.unionByName(_))
    PqIndex(
      IndexCommit.readComponent(spark, path, "anchors", labels),
      IndexCommit.readComponent(spark, path, "books", labels),
      codes)
  }

  /** DuckDB twin of the accumulated-index search; `survivors` filters
    * the candidate rows (over `a.vec_id`) so the tombstone entry (n98)
    * shares one SQL body with n64 — a delete-carrying index must
    * answer exactly like a search over the surviving codes under the
    * SAME frozen anchors/books. */
  /** `trainWhere` picks the training snapshot (default: the even half —
    * n64's frozen-configuration family; n102 retrains on "true" = the
    * whole current corpus). `anchorSrc` is where the coarse anchors'
    * VECTORS are read (ids always come from `embeddings` — the edit
    * predicates never change ids); n102 points it at the edited source
    * so the retrained twin derives every artifact from the drifted
    * corpus. The `survivors` predicate resolves over bare `embeddings`
    * columns inside an `IN (SELECT vec_id FROM embeddings WHERE …)`
    * subquery (round 14 — enables label-referencing tenant predicates
    * like n115's), so the emitted SQL is no longer byte-identical to
    * the historical `a.vec_id`-substituted text; semantics are
    * unchanged for every pre-existing entry. */
  private[graft] def ivfPqIndexSqlCore(survivors: String = "TRUE",
      embSrc: String = "embeddings",
      trainWhere: String = "vec_id % 2 = 0",
      anchorSrc: String = "embeddings"): String = {
    s"""WITH ${lloydChainSql(KProd, trainWhere, embSrc)},
       |cc AS (SELECT vec_id AS cell, embedding AS cv FROM $anchorSrc
       |       WHERE vec_id IN (SELECT vec_id FROM embeddings WHERE $trainWhere
       |                        ORDER BY vec_id LIMIT $IvfCells)),
       |asg AS (SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, c.cell,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${round6Sql(d2Sql("e.embedding", "c.cv", FullDim))}, c.cell) AS rn
       |    FROM $embSrc e CROSS JOIN cc c) WHERE rn = 1),
       |probes AS (SELECT q_id, cell FROM (
       |    SELECT e.vec_id AS q_id, c.cell,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${round6Sql(d2Sql("e.embedding", "c.cv", FullDim))}, c.cell) AS rn
       |    FROM embeddings e CROSS JOIN cc c
       |    WHERE e.vec_id < $NumQueries) WHERE rn <= $IvfProbe),
       |cand AS (SELECT p.q_id, a.vec_id FROM probes p
       |         JOIN asg a ON a.cell = p.cell
       |         WHERE a.vec_id <> p.q_id
       |           AND a.vec_id IN (SELECT vec_id FROM embeddings
       |                            WHERE $survivors)),
       |adc AS (SELECT cn.q_id, cd.vec_id, $adcSumSql AS adc
       |        FROM cand cn
       |        JOIN codes cd ON cd.vec_id = cn.vec_id
       |        JOIN dtab dt ON dt.m = cd.m AND dt.cent_id = cd.code
       |                    AND dt.q_id = cn.q_id
       |        GROUP BY 1, 2),
       |ranked AS (SELECT q_id, vec_id AS nb_id, adc,
       |                  row_number() OVER (PARTITION BY q_id
       |                                     ORDER BY adc, vec_id) AS rn
       |           FROM adc)
       |SELECT q_id, nb_id, adc, CAST(rn AS BIGINT) AS rn
       |FROM ranked WHERE rn <= $TopK""".stripMargin
  }

  private def ivfPqIndexSql(survivors: String = "TRUE",
      embSrc: String = "embeddings",
      trainWhere: String = "vec_id % 2 = 0",
      anchorSrc: String = "embeddings"): String =
    ivfPqIndexSqlCore(survivors, embSrc, trainWhere, anchorSrc) +
      "\nORDER BY q_id, rn"

  /** DuckDB twin for SNAPSHOT-VERSIONED ANN serving (st16's batch
    * twin, the [[graft.operators.LexIndex.bm25SnapshotSql]] shape on
    * the vector side): one IVF-PQ search branch per committed
    * snapshot — branch `i` trains the frozen configuration on the
    * FIRST batch (`trainWhere`) and restricts candidates to the
    * arrived prefix `snaps(i)`, tagged `snap = i` — unioned with a
    * total order. Every intermediate commit of the append chain is
    * hash-attested, not just the final index. */
  private[graft] def ivfPqSnapshotSql(snaps: Seq[String],
      trainWhere: String): String = {
    val branches = snaps.zipWithIndex.map { case (survivors, i) =>
      s"SELECT CAST($i AS BIGINT) AS snap, * FROM (\n" +
        ivfPqIndexSqlCore(survivors, "embeddings", trainWhere, "embeddings") +
        "\n)"
    }
    branches.mkString("", "\nUNION ALL\n", "\nORDER BY snap, q_id, rn")
  }

  /** DuckDB twin for TAKEDOWN-AWARE ANN serving (st22's batch twin):
    * [[ivfPqSnapshotSql]] plus per-branch `n_dead` evidence — the
    * count of ever-added vectors currently tombstoned, read by the
    * lane from its real ops log at serve time. The survivor predicate
    * excludes the dead set from CANDIDATES only; training/encoding
    * stay over the arrived corpus (the n98 frozen-configuration
    * contract — a delete never narrows the config). */
  private[graft] def ivfPqTakedownSnapshotSql(
      snaps: Seq[(String, String)], trainWhere: String): String = {
    val branches = snaps.zipWithIndex.map { case ((survivors, dead), i) =>
      s"SELECT CAST($i AS BIGINT) AS snap, " +
        s"CAST((SELECT count(*) FROM embeddings WHERE $dead) AS BIGINT)" +
        " AS n_dead, * FROM (\n" +
        ivfPqIndexSqlCore(survivors, "embeddings", trainWhere, "embeddings") +
        "\n)"
    }
    branches.mkString("", "\nUNION ALL\n", "\nORDER BY snap, q_id, rn")
  }

  // ---------------------------------------------------------------------
  // st20 serving-generation protocol: generation g's index (an ordinary
  // IndexCommit tree) lives under `base/gens/<g>`; `base/_gen_<g>`
  // markers name the serving generation (current = max, 0 implied when
  // none) and are written marker-last AFTER the folded generation
  // materializes — the n105 fold+swap shape with the swap pointer made
  // explicit, so a stateless foreachBatch (and a restarted stream)
  // resolves the serving tree from disk alone.
  // ---------------------------------------------------------------------

  def pqGenPath(base: String, g: Long): String = s"$base/gens/$g"

  /** The serving generation: max committed `_gen_<g>` marker, 0 when
    * none (the training batch's implied generation). */
  def currentPqGen(spark: org.apache.spark.sql.SparkSession,
      base: String): Long = {
    val fs = IndexCommit.fsOf(spark, base)
    val p = new org.apache.hadoop.fs.Path(base)
    if (!fs.exists(p)) 0L
    else fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("_gen_")).map(_.stripPrefix("_gen_"))
      .filter(s => s.nonEmpty && s.forall(_.isDigit)).map(_.toLong)
      .maxOption.getOrElse(0L)
  }

  /** Manifested append segments in a generation tree (committed labels
    * minus the base) — the quantity the fold cadence gates on and the
    * `n_appends` evidence column serves. */
  def pqAppendCount(spark: org.apache.spark.sql.SparkSession,
      genPath: String): Int =
    math.max(0, IndexCommit.committedLabels(spark, genPath).size - 1)

  /** Fold-path index materialization (round 15, guide §1.2): a
    * generation fold rewrites anchors and codebooks VERBATIM — they
    * are the index's frozen trained configuration, read from
    * `fromGen`'s base moments earlier. Copy their files byte-for-byte
    * instead of running two Spark write jobs whose plans just re-scan
    * the same parquet; only `codes` (the per-vector component — the
    * object the fold actually compacts, and on the takedown path the
    * tombstone-filtered one) goes through a Spark write. Identical
    * artifacts, same manifest-last commit protocol. */
  private def writeFoldedPqIndex(spark: org.apache.spark.sql.SparkSession,
      fromGen: String, codes: DataFrame, toGen: String): Unit = {
    IndexCommit.clear(spark, toGen)
    val fs = IndexCommit.fsOf(spark, toGen)
    val conf = spark.sessionState.newHadoopConf()
    Seq("anchors", "books").foreach { comp =>
      val src = new org.apache.hadoop.fs.Path(s"$fromGen/$comp/b_base")
      val dst = new org.apache.hadoop.fs.Path(s"$toGen/$comp/b_base")
      fs.mkdirs(dst)
      fs.listStatus(src).filter(_.isFile).foreach { st =>
        org.apache.hadoop.fs.FileUtil.copy(fs, st.getPath, fs,
          new org.apache.hadoop.fs.Path(dst, st.getPath.getName),
          false, conf): Unit
      }
    }
    codes.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$toGen/codes/b_base")
    IndexCommit.commitManifest(spark, toGen, "base")
  }

  /** The in-lane fold+swap: when the serving generation carries at
    * least `compactEvery` appends, materialize the whole index to the
    * NEXT generation path (an action — phase one), commit the new
    * `_gen_` marker (the swap point), then prune every older
    * generation dir and marker (phase two). Crash-windows self-heal:
    * before the marker, the next gate refolds (writePqIndex clears its
    * torn target); after the marker but before the prune, stale
    * generations linger harmlessly until the next fold's sweep — the
    * sweep prunes every numeric gen ≤ the folded one, not just g. */
  def foldPqServingIfDue(spark: org.apache.spark.sql.SparkSession,
      base: String, compactEvery: Int): Unit = {
    val g = currentPqGen(spark, base)
    val cur = pqGenPath(base, g)
    if (compactEvery > 0 && hasPqIndex(spark, cur) &&
        pqAppendCount(spark, cur) >= compactEvery) {
      writeFoldedPqIndex(spark, cur, readPqIndex(spark, cur).codes,
        pqGenPath(base, g + 1))
      val fs = IndexCommit.fsOf(spark, base)
      fs.create(new org.apache.hadoop.fs.Path(s"$base/_gen_${g + 1}"),
        true).close()
      val gensDir = new org.apache.hadoop.fs.Path(s"$base/gens")
      if (fs.exists(gensDir))
        fs.listStatus(gensDir).map(_.getPath.getName)
          .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong)
          .filter(_ <= g).foreach { og =>
            IndexCommit.clear(spark, pqGenPath(base, og))
            fs.delete(new org.apache.hadoop.fs.Path(s"$base/_gen_$og"),
              false): Unit
          }
    }
  }

  // ---------------------------------------------------------------------
  // st25: takedown-aware generation folds — the ANN side of st24's
  // physical forget. The serve path never narrows the trained config on
  // a takedown (n98); the generation fold is where dead vectors' CODES
  // leave the disk (they are not copied into the next generation) and
  // where their tombstones are GC'd from the ops log (ops_base/<w>
  // re-stamps the survivors at the fold watermark). Layout: st20's
  // gens/<g> + _gen_<g> markers for the index, st24's ops/<id> +
  // ops_base/<w> for liveness.
  // ---------------------------------------------------------------------

  /** The ops watermark: the newest COMMITTED survivors summary's batch
    * id. "Committed" means the machinery's OWN `_opsbase_<w>` marker
    * (written by [[foldPqTakedownIfDue]] strictly AFTER the summary's
    * parquet job returns — the same marker-last protocol as `_gen_` /
    * `_compacted_upto_`). The survivors write is a plain Spark
    * overwrite, which creates the destination dir before job commit, so
    * a crash mid-write leaves a torn `ops_base/<w>`. Trusting the bare
    * dir name would make the torn (possibly empty) summary the
    * watermark: older ops logs stop being read, a vector absent from
    * the partial summary loses its add record, and a later del for it
    * is silently dropped — a permanent forget leak. Earlier rounds
    * gated on the job committer's `_SUCCESS` artifact instead; that is
    * absent under `mapreduce.fileoutputcommitter.marksuccessfuljobs=
    * false` and most object-store committers, where no summary would
    * ever become the watermark — safe direction, but ops logs never GC
    * and torn dirs accumulate unboundedly (ADVICE r13 #4). The own
    * marker makes commitment independent of committer configuration; a
    * dir with neither artifact (a torn write) is invisible and swept
    * by [[prunePqTakedownFolded]] once a later fold commits a higher
    * watermark (served batch ids only grow).
    *
    * Migration: a summary committed by a pre-marker build carries
    * `_SUCCESS` but no `_opsbase_` marker — and its pre-watermark
    * `ops/<id>` logs may already be pruned, so treating it as
    * uncommitted would LOSE its add records (a later del for such a
    * vector would be silently dropped — the permanent forget leak)
    * and crash the liveness read on the missing logs. Legacy
    * summaries therefore still count via their `_SUCCESS`; only
    * marker-less AND `_SUCCESS`-less dirs are torn. New folds write
    * the marker, so fresh trees never depend on committer
    * configuration. */
  def pqOpsWatermark(spark: org.apache.spark.sql.SparkSession,
      base: String): Option[Long] = {
    val fs = IndexCommit.fsOf(spark, base)
    val bp = new org.apache.hadoop.fs.Path(base)
    val p = new org.apache.hadoop.fs.Path(s"$base/ops_base")
    if (!fs.exists(bp) || !fs.exists(p)) None
    else {
      val markers = fs.listStatus(bp).map(_.getPath.getName)
        .filter(_.startsWith("_opsbase_")).map(_.stripPrefix("_opsbase_"))
        .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong)
        .filter(w => fs.exists(new org.apache.hadoop.fs.Path(
          s"$base/ops_base/$w")))
      val legacy = fs.listStatus(p).map(_.getPath.getName)
        .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong)
        .filter(w => fs.exists(new org.apache.hadoop.fs.Path(
          s"$base/ops_base/$w/_SUCCESS")))
      (markers ++ legacy).maxOption
    }
  }

  /** Liveness of a compacting-takedown ANN tree: the SAME last-op-wins
    * fold every ops-log consumer shares
    * ([[graft.operators.LexIndex.livenessOf]] — DECISIONS r12 #9),
    * over the survivors summary plus the tail ops logs. Returns
    * (dead vec_ids frame, n_dead). `servedIds`: committed serve batch
    * ids plus the in-flight one. */
  def readPqTakedownLiveness(spark: org.apache.spark.sql.SparkSession,
      base: String, servedIds: Seq[Long]): (DataFrame, Long) = {
    val upto = pqOpsWatermark(spark, base)
    val tail = servedIds.distinct.sorted.filter(id => upto.forall(id > _))
    val ops = (upto.map(u => spark.read.parquet(s"$base/ops_base/$u")
        .select(col("vec_id").as("doc_id"), lit("add").as("op"),
          lit(u).as("batch"))).toSeq ++
      tail.map(id => spark.read.parquet(s"$base/ops/$id")
        .select(col("vec_id").as("doc_id"), col("op"),
          lit(id).as("batch"))))
      .reduce(_ unionByName _)
    val lastOps = graft.operators.LexIndex.livenessOf(ops)
    // materialized once (round 15, guide §1.2): the tombstone frame is
    // takedown-traffic-sized and feeds the evidence count, the serve's
    // candidate anti-join AND (via the caller passing it back in) the
    // generation fold — pre-round-15 each consumer re-ran the ops fold
    val dead = graft.operators.LexIndex.deadDocs(lastOps)
      .select(col("doc_id").as("vec_id")).localCheckpoint()
    (dead, dead.count())
  }

  /** The takedown-aware generation fold: when the serving generation
    * carries `compactEvery` appends, materialize the
    * TOMBSTONE-FILTERED index to the next generation (dead codes are
    * not copied — the physical removal; anchors/books rewritten
    * verbatim, the n98/n105 exactness), commit the `_gen_` marker,
    * THEN write the survivors summary to `ops_base/<maxServed>`.
    * Ordering is load-bearing: the marker must land BEFORE the
    * watermark advance — a crash between ops_base and a trailing
    * marker would leave serving on the UNFOLDED generation while the
    * liveness fold (which reads only ops newer than the watermark)
    * had already forgotten the old tombstones, i.e. dead codes would
    * serve. With marker-first, every window is conservative: before
    * the marker the fold is invisible (rewritten idempotently next
    * gate); between marker and ops_base the folded generation serves
    * (dead codes physically gone) while the un-GC'd ops logs keep the
    * tombstones counted — honest evidence, healed by the next fold;
    * after ops_base COMMITS (the marker-last `_opsbase_` gate in
    * [[pqOpsWatermark]] — the parquet write itself is NOT atomic, a
    * markerless dir is invisible), [[prunePqTakedownFolded]] (every
    * batch) sweeps. */
  def foldPqTakedownIfDue(spark: org.apache.spark.sql.SparkSession,
      base: String, compactEvery: Int, servedIds: Seq[Long],
      deadOpt: Option[DataFrame] = None): Unit = {
    val g = currentPqGen(spark, base)
    val cur = pqGenPath(base, g)
    if (compactEvery > 0 && hasPqIndex(spark, cur) &&
        pqAppendCount(spark, cur) >= compactEvery && servedIds.nonEmpty) {
      // deadOpt: the caller's just-computed tombstone frame for the
      // SAME servedIds and unchanged ops/watermark state (the serving
      // lanes' structure — serve, then fold, no ops write between).
      // Passing it skips a second full liveness fold (round 15).
      val dead = deadOpt.getOrElse(
        readPqTakedownLiveness(spark, base, servedIds)._1)
      val live = deletePqIndex(readPqIndex(spark, cur), dead)
      writeFoldedPqIndex(spark, cur, live.codes, pqGenPath(base, g + 1))
      val fs = IndexCommit.fsOf(spark, base)
      fs.create(new org.apache.hadoop.fs.Path(s"$base/_gen_${g + 1}"),
        true).close()
      // survivors = the ids of the codes we JUST materialized to the
      // next generation — read back from the committed artifact
      // instead of re-running the tombstone anti-join (round 15; same
      // bytes by construction, and the _gen_ marker is already up so
      // the read targets a committed manifest)
      readPqIndex(spark, pqGenPath(base, g + 1))
        .codes.select("vec_id").distinct()
        .write.mode("overwrite").parquet(s"$base/ops_base/${servedIds.max}")
      // marker-last: the summary becomes the watermark only once its
      // parquet job has fully returned (ADVICE r13 #4 — the committer's
      // _SUCCESS artifact is configuration-dependent; this marker isn't)
      fs.create(new org.apache.hadoop.fs.Path(
        s"$base/_opsbase_${servedIds.max}"), true).close()
    }
  }

  /** Two-phase-delete sweep for the takedown fold, safe to run every
    * batch (st24's rule — the linger window after a post-marker crash
    * must be one micro-batch, not one fold cadence): drop generations
    * below the serving one, ops logs at or below the watermark, and
    * superseded survivors summaries. Serve replay markers are kept. */
  def prunePqTakedownFolded(spark: org.apache.spark.sql.SparkSession,
      base: String, servedIds: Seq[Long]): Unit = {
    val fs = IndexCommit.fsOf(spark, base)
    val g = currentPqGen(spark, base)
    val gensDir = new org.apache.hadoop.fs.Path(s"$base/gens")
    if (fs.exists(gensDir))
      fs.listStatus(gensDir).map(_.getPath.getName)
        .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong)
        .filter(_ < g).foreach { og =>
          IndexCommit.clear(spark, pqGenPath(base, og))
          fs.delete(new org.apache.hadoop.fs.Path(s"$base/_gen_$og"),
            false): Unit
        }
    pqOpsWatermark(spark, base).foreach { upto =>
      servedIds.filter(_ <= upto).foreach { id =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$base/ops/$id"), true)
      }
      val ob = new org.apache.hadoop.fs.Path(s"$base/ops_base")
      if (fs.exists(ob))
        fs.listStatus(ob).map(_.getPath.getName)
          .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong)
          .filter(_ < upto)
          .foreach { u =>
            fs.delete(new org.apache.hadoop.fs.Path(s"$base/ops_base/$u"),
              true): Unit
          }
      // markers swept INDEPENDENTLY of their dirs (ADVICE r14 #2): the
      // fold writes dir-then-marker and this sweep deletes dir-then-
      // marker, so a crash between the two deletes leaves an orphan
      // _opsbase_<u> whose dir no enumeration of ops_base/ can ever
      // surface again — a permanent small-file leak. Any marker below
      // the watermark is superseded by construction (the watermark's
      // own marker+summary are never below `upto`), so sweep by marker
      // name, not by surviving dir.
      fs.globStatus(new org.apache.hadoop.fs.Path(s"$base/_opsbase_*"))
        .map(_.getPath)
        .foreach { p =>
          val id = p.getName.stripPrefix("_opsbase_")
          if (id.nonEmpty && id.forall(_.isDigit) && id.toLong < upto)
            fs.delete(p, false): Unit
        }
    }
  }

  /** Dead ids whose code rows still physically sit in the serving
    * generation — the `n_dead_disk` evidence the next fold zeroes. */
  def pqDeadCodesOnDisk(index: PqIndex, dead: DataFrame): Long =
    index.codes.select("vec_id").distinct()
      .join(broadcast(dead.select("vec_id").distinct()),
        Seq("vec_id"), "left_semi").count()

  /** DuckDB twin for the TAKEDOWN-COMPACTING ANN ladder (st25's batch
    * twin): [[ivfPqTakedownSnapshotSql]]'s branch body plus the four
    * evidence columns — st20's layout pair (n_appends, gen) and
    * st24's dead pair (n_dead from the post-GC view, n_dead_disk in
    * the serving generation's codes). The forget's signature is the
    * trajectory: tombstones the fold ate stop counting. */
  private[graft] def ivfPqTakedownCompactSnapshotSql(
      snaps: Seq[(String, String, String, Long, Long)],
      trainWhere: String): String = {
    val branches = snaps.zipWithIndex.map {
      case ((survivors, dead, deadDisk, nApp, gen), i) =>
        s"SELECT CAST($i AS BIGINT) AS snap," +
          s" CAST($nApp AS BIGINT) AS n_appends," +
          s" CAST($gen AS BIGINT) AS gen," +
          s" CAST((SELECT count(*) FROM embeddings WHERE $dead) AS BIGINT)" +
          " AS n_dead," +
          s" CAST((SELECT count(*) FROM embeddings WHERE $deadDisk) AS BIGINT)" +
          " AS n_dead_disk, * FROM (\n" +
          ivfPqIndexSqlCore(survivors, "embeddings", trainWhere, "embeddings") +
          "\n)"
    }
    branches.mkString("", "\nUNION ALL\n", "\nORDER BY snap, q_id, rn")
  }

  /** DuckDB twin for the COMPACTING ANN serving ladder (st20's batch
    * twin): [[ivfPqSnapshotSql]] plus per-branch layout evidence —
    * `(survivors, n_appends, gen)` per snapshot, the values the
    * fold+swap cadence (fold when the serving generation carries
    * `compactEvery` appends, prune the old generation after the new
    * marker) independently predicts. The Spark side reads
    * n_appends/gen from the ACTUAL generation tree at serve time, so
    * the hash attests both the answers and that the fold/swap really
    * happened when the cadence says they must. */
  private[graft] def ivfPqCompactSnapshotSql(
      snaps: Seq[(String, Long, Long)], trainWhere: String): String = {
    val branches = snaps.zipWithIndex.map { case ((survivors, nApp, gen), i) =>
      s"SELECT CAST($i AS BIGINT) AS snap, CAST($nApp AS BIGINT) AS n_appends," +
        s" CAST($gen AS BIGINT) AS gen, * FROM (\n" +
        ivfPqIndexSqlCore(survivors, "embeddings", trainWhere, "embeddings") +
        "\n)"
    }
    branches.mkString("", "\nUNION ALL\n", "\nORDER BY snap, q_id, rn")
  }

  /** The st16 snapshot ladder's accumulated indexes: configuration
    * (anchors + books) trained on the FIRST micro-batch and FROZEN,
    * each later batch encoded under it — the streaming-ingest
    * contract, where the trainer cannot see future arrivals. Memoized
    * under the canonical corpus frame like [[accumulatedPqIndex]]. */
  private[graft] def snapshotPqIndexes(s: org.apache.spark.sql.SparkSession,
      dir: String): Seq[PqIndex] = {
    val e = Tables(s, dir).embeddings
    val batches = (0 to 2).map(i => e.filter(col("vec_id") % 3 === i))
    val anchors = memoized(e, "st16:anchors")(
      batches(0).orderBy("vec_id").limit(IvfCells)
        .select(col("vec_id").as("cell"), col("embedding").as("cv")))
    val books = memoized(e, "st16:books")(codebooks(batches(0), Iters, KProd))
    val codes = (0 to 2).map(i => memoized(e, s"st16:codes$i")(
      encode(batches(i), books)
        .join(assignCoarse(batches(i), anchors), Seq("vec_id"))))
    codes.scanLeft(Option.empty[DataFrame]) {
      case (acc, c) => Some(acc.fold(c)(_.unionByName(c)))
    }.flatten.map(c => PqIndex(anchors, books, c))
  }

  // ---------------------------------------------------------------------
  // st18: drift-GATED snapshot serving — n106's gate in streaming form.
  // The drift payload is a COVARIATE SHIFT (+1.0 to every dimension of
  // the third micro-batch — an upstream encoder change): unlike the
  // n100-family negation edit, whose mean displacement is the edited
  // subset's own sampling mean (~N^(-1/2), indistinguishable from the
  // disjoint-batch composition noise a streaming prefix comparison
  // inherently carries — measured: noise 0.016-0.018 vs signal
  // 0.015 at the test SFs), a constant shift holds its magnitude at
  // every corpus size. Measured prefix-vs-batch0 L∞ drift: snap 0
  // exactly 0.0, snap 1 ≤ 0.018 (pure composition noise), snap 2
  // ≈ 0.35 at all three SFs — the 0.1 threshold sits ≥ 5.5× from both
  // sides, and the noise side only shrinks as N grows.
  // ---------------------------------------------------------------------

  // queries (vec_id < NumQueries) are excluded from the edit — the
  // standing query set is fixed, the DriftEditWhere convention (and
  // the twin's dtab derives query vectors from embSrc, so an edited
  // query would silently diverge from the lane's unshifted probes)
  private[graft] val ShiftEditWhere =
    s"vec_id % 3 = 2 AND vec_id >= $NumQueries"
  /** The shifted corpus: float-exact in both engines (the double add
    * is exact for float inputs, so the single rounding back to REAL
    * equals Spark's float addition). */
  private[graft] val ShiftEditSrc: String =
    s"(SELECT vec_id, CASE WHEN $ShiftEditWhere " +
      "THEN CAST(list_transform(embedding, " +
      "x -> CAST(CAST(x AS DOUBLE) + 1.0 AS REAL)) AS FLOAT[]) " +
      "ELSE embedding END AS embedding FROM embeddings)"
  private[graft] def shiftEdited(e: DataFrame): DataFrame =
    e.withColumn("embedding",
      when(expr(ShiftEditWhere),
        transform(col("embedding"), x => x + lit(1.0f)))
        .otherwise(col("embedding")))

  /** st18's gate threshold (L∞ of per-dimension mean drift between the
    * arrived prefix and the first batch). See the margin measurements
    * in the section comment; [[DriftRetrainThreshold]]'s Scaladoc
    * covers why a production band is sample-size-calibrated. */
  val DriftServeThreshold = 0.1

  /** DuckDB twin for DRIFT-GATED snapshot ANN serving (st18): one
    * branch per committed prefix; each branch computes the prefix's
    * drift trigger from raw embeddings and selects the FROZEN
    * first-batch-config arm or the RETRAINED-on-the-prefix arm by the
    * same comparison the lane makes — so the gate's decision at every
    * snapshot is hash-attested, not just the served rows. */
  private[graft] def gatedSnapshotSql(threshold: Double): String = {
    def trigSql(prefix: String): String =
      s"""(SELECT max(abs(${round6Sql("cur.m - base.m")})) AS t FROM
         |  (SELECT pos, ${dsumSql("x")} / count(*) AS m FROM
         |     (SELECT e.vec_id, d.i AS pos,
         |             CASE WHEN $ShiftEditWhere
         |                  THEN CAST(CAST(CAST(e.embedding[d.i] AS DOUBLE)
         |                       + 1.0 AS REAL) AS DOUBLE)
         |                  ELSE CAST(e.embedding[d.i] AS DOUBLE) END AS x
         |      FROM embeddings e
         |      CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) d)
         |   WHERE $prefix GROUP BY pos) cur
         |  JOIN
         |  (SELECT pos, ${dsumSql("x")} / count(*) AS m FROM
         |     (SELECT e.vec_id, d.i AS pos,
         |             CAST(e.embedding[d.i] AS DOUBLE) AS x
         |      FROM embeddings e
         |      CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) d)
         |   WHERE vec_id % 3 = 0 GROUP BY pos) base USING (pos))""".stripMargin
    val branches = (0 to 2).flatMap { i =>
      val prefix = if (i == 2) "TRUE" else s"vec_id % 3 <= $i"
      val trig = s"t_$i"
      val cmp = s"(SELECT t FROM $trig) > $threshold"
      def arm(firedArm: Boolean, core: String): String = {
        val guard = if (firedArm) cmp else s"NOT ($cmp)"
        val fired = if (firedArm) 1 else 0
        s"""SELECT CAST($i AS BIGINT) AS snap, CAST($fired AS BIGINT) AS fired,
           |       (SELECT t FROM $trig) AS trig, q_id, nb_id, adc, rn
           |FROM (
           |$core
           |) WHERE $guard""".stripMargin
      }
      Seq(
        arm(firedArm = false, ivfPqIndexSqlCore(survivors = prefix,
          embSrc = ShiftEditSrc, trainWhere = "vec_id % 3 = 0",
          anchorSrc = ShiftEditSrc)),
        arm(firedArm = true, ivfPqIndexSqlCore(survivors = prefix,
          embSrc = ShiftEditSrc, trainWhere = prefix,
          anchorSrc = ShiftEditSrc)))
    }
    val trigs = (0 to 2).map { i =>
      val prefix = if (i == 2) "TRUE" else s"vec_id % 3 <= $i"
      s"t_$i AS ${trigSql(prefix)}"
    }.mkString(",\n")
    s"WITH $trigs\n" + branches.mkString("", "\nUNION ALL\n",
      "\nORDER BY snap, q_id, rn")
  }

  /** st18's frozen-config snapshot indexes: the st16 ladder over the
    * SHIFTED corpus — anchors/books from the (unshifted) first batch,
    * every batch's codes encoded under them as they arrive. */
  private[graft] def shiftSnapshotPqIndexes(
      s: org.apache.spark.sql.SparkSession, dir: String): Seq[PqIndex] = {
    val e = Tables(s, dir).embeddings
    val b0 = e.filter(col("vec_id") % 3 === 0)
    val batches = (0 to 2).map(i => shiftEdited(e).filter(col("vec_id") % 3 === i))
    val anchors = memoized(e, "st16:anchors")(
      b0.orderBy("vec_id").limit(IvfCells)
        .select(col("vec_id").as("cell"), col("embedding").as("cv")))
    val books = memoized(e, "st16:books")(codebooks(b0, Iters, KProd))
    val codes = (0 to 2).map(i => memoized(e, s"st18:codes$i")(
      encode(batches(i), books)
        .join(assignCoarse(batches(i), anchors), Seq("vec_id"))))
    codes.scanLeft(Option.empty[DataFrame]) {
      case (acc, c) => Some(acc.fold(c)(_.unionByName(c)))
    }.flatten.map(c => PqIndex(anchors, books, c))
  }

  /** st18's fired arm: the configuration retrained over the full
    * arrived (shifted) corpus, memoized like the other trained
    * artifacts (bench cold mode clears it). */
  private[graft] def shiftRetrainedPqIndex(
      s: org.apache.spark.sql.SparkSession, dir: String): PqIndex = {
    val e = Tables(s, dir).embeddings
    val cur = shiftEdited(e)
    val anchors = memoized(e, "st18:ranchors")(retrainAnchorsOf(cur))
    val books = memoized(e, "st18:rbooks")(codebooks(cur, Iters, KProd))
    val codes = memoized(e, "st18:rcodes")(
      encode(cur, books).join(assignCoarse(cur, anchors), Seq("vec_id")))
    PqIndex(anchors, books, codes)
  }

  /** Catalog entry: the persisted-index lifecycle — train on the even
    * snapshot (anchors, 256-code books), append the odd snapshot with
    * FROZEN books, search mixed queries over the accumulated index.
    * The twin trains its Lloyd chain on the even half only and encodes
    * everything, so a leak of the new batch into training (the frozen-
    * codebook contract) flips the hash as surely as a wrong ADC value.
    * PqSpec proves the file round-trip (manifest layout, cell-
    * partitioned codes) returns the identical answer. */
  /** The accumulated (even-train + odd-append, frozen books) index —
    * the [[buildPqIndex]]/[[appendPqIndex]] composition with the
    * trained artifacts memoized under the canonical corpus frame
    * (logical keys — prior/fresh are derived, not canonical). Kept
    * textually in step with those methods; the oracle pins the answer
    * and PqSpec pins the unmemoized public API against the same
    * search, so drift between the two flips a hash, not just a spec.
    * Shared by n64 and n98 (train once; bench cold mode clears the
    * memoizer for both). */
  /** The even-train + odd-append composition over an arbitrary
    * embeddings frame — the unmemoized public form of
    * [[accumulatedPqIndex]] (the API facade's hybrid entry point;
    * PqSpec pins the memoized twin equal to this composition). */
  def buildAccumulatedIndex(e: DataFrame): PqIndex =
    appendPqIndex(buildPqIndex(e.filter(col("vec_id") % 2 === 0)),
      e.filter(col("vec_id") % 2 === 1))

  private[graft] def accumulatedPqIndex(s: org.apache.spark.sql.SparkSession,
      dir: String): PqIndex = {
    val e = Tables(s, dir).embeddings
    val prior = e.filter(col("vec_id") % 2 === 0)
    val fresh = e.filter(col("vec_id") % 2 === 1)
    val anchors = memoized(e, "n64:anchors")(
      prior.orderBy("vec_id").limit(IvfCells)
        .select(col("vec_id").as("cell"), col("embedding").as("cv")))
    val books = memoized(e, "n64:books")(codebooks(prior, Iters, KProd))
    val codes = memoized(e, "n64:codes")(
      encode(prior, books).join(assignCoarse(prior, anchors), Seq("vec_id"))
        .unionByName(
          encode(fresh, books).join(assignCoarse(fresh, anchors), Seq("vec_id"))))
    PqIndex(anchors, books, codes)
  }

  val ivfPqIndexQ: Q = Q("n64_pq_index", ivfPqIndexSql()) { (s, dir) =>
    val e = Tables(s, dir).embeddings
    searchPqIndex(e.filter(col("vec_id") < NumQueries),
      accumulatedPqIndex(s, dir))
      .orderBy("q_id", "rn")
  }

  /** n98: tombstone-deleted PQ index, driver-hash-attested (the
    * delete axis was spec-pinned only — PqSpec's delete == re-encode —
    * since round 10). DELETE vec_id ≡ 2 (mod 8) from the accumulated
    * index's codes and search: the oracle restricts the candidate set
    * to the survivors while training/encoding over the ORIGINAL
    * corpus — the frozen-configuration contract (anchors and books
    * parameterize every surviving code and are never narrowed by a
    * delete; vec_id 2 is itself a coarse anchor, so the entry also
    * proves deleting an anchor's VECTOR leaves its CELL intact). A
    * tombstoned code still scoring, or a survivor re-encoded under
    * narrowed configuration, flips the hash. */
  val ivfPqDeleteQ: Q =
    Q("n98_pq_delete", ivfPqIndexSql("vec_id % 8 <> 2")) { (s, dir) =>
      val e = Tables(s, dir).embeddings
      val tombstones = e.filter(col("vec_id") % 8 === 2).select("vec_id")
      searchPqIndex(e.filter(col("vec_id") < NumQueries),
        deletePqIndex(accumulatedPqIndex(s, dir), tombstones))
        .orderBy("q_id", "rn")
    }

  /** The n100/n102/n103/n104 drift edit, shared so the upsert, retrain
    * and audit axes describe the SAME drifted corpus: the ≡ 5 (mod 8)
    * non-query vectors re-embedded as their negations (exact in FP on
    * both engines; queries and the even training half of the FROZEN
    * family untouched). */
  private[operators] val DriftEditWhere =
    s"vec_id % 8 = 5 AND vec_id >= $NumQueries"
  private[operators] val DriftEditSrc: String =
    s"(SELECT vec_id, CASE WHEN $DriftEditWhere " +
      "THEN list_transform(embedding, x -> -x) " +
      "ELSE embedding END AS embedding FROM embeddings)"
  private[operators] def driftEditPred: Column =
    col("vec_id") % 8 === 5 && col("vec_id") >= NumQueries
  private[operators] def driftEdited(e: DataFrame): DataFrame =
    e.withColumn("embedding",
      when(driftEditPred, transform(col("embedding"), x => -x))
        .otherwise(col("embedding")))

  /** n100: UPSERTED PQ index — the U axis (C=train/append n64,
    * R=search, D=tombstone n98). The ≡ 5 (mod 8) non-query vectors are
    * re-embedded as their NEGATIONS (exact in FP on both engines) and
    * upserted into the accumulated index: tombstone + one
    * encode/assign pass under the FROZEN anchors/books. The edit
    * predicate is odd and ≥ NumQueries by construction, so every
    * trained artifact's inputs (even-half Lloyd training, even coarse
    * anchors, query vectors) are untouched — the oracle re-derives the
    * whole chain with only the encode-side embeddings CASE-edited. A
    * negated vector typically changes coarse cell (re-assignment under
    * frozen anchors IS the re-insert); a stale code surviving the
    * replace, a fresh code encoded under retrained books, or an
    * untouched row perturbed in any way flips the hash. */
  val ivfPqUpsertQ: Q =
    Q("n100_pq_upsert", ivfPqIndexSql(embSrc = DriftEditSrc)) { (s, dir) =>
      val e = Tables(s, dir).embeddings
      val edited = e
        .filter(col("vec_id") % 8 === 5 && col("vec_id") >= NumQueries)
        .withColumn("embedding", transform(col("embedding"), x => -x))
      searchPqIndex(e.filter(col("vec_id") < NumQueries),
        upsertPqIndex(accumulatedPqIndex(s, dir), edited))
        .orderBy("q_id", "rn")
    }

  /** The RETRAINED index over the drifted corpus (n102) — the
    * maintenance axis the frozen-configuration family deliberately
    * lacks: anchors re-picked and codebooks re-trained from the
    * CURRENT corpus (training snapshot = everything, the post-upsert
    * state), then a full re-encode. Memoized under the canonical
    * corpus frame like [[accumulatedPqIndex]] (one retrained model per
    * session; bench cold mode clears it). */
  private def retrainedPqIndex(s: org.apache.spark.sql.SparkSession,
      dir: String): PqIndex = {
    val e = Tables(s, dir).embeddings
    val edited = driftEdited(e)
    val anchors = memoized(e, "n102:anchors")(retrainAnchorsOf(edited))
    val books = memoized(e, "n102:books")(codebooks(edited, Iters, KProd))
    val codes = memoized(e, "n102:codes")(
      encode(edited, books).join(assignCoarse(edited, anchors), Seq("vec_id")))
    PqIndex(anchors, books, codes)
  }

  /** Retrain-time coarse anchors: the first [[IvfCells]] ids of the
    * CURRENT corpus (the retrain sees everything — unlike n64's
    * even-half frozen pick). */
  private def retrainAnchorsOf(current: DataFrame): DataFrame =
    current.orderBy("vec_id").limit(IvfCells)
      .select(col("vec_id").as("cell"), col("embedding").as("cv"))

  /** [[retrainedPqIndex]]'s un-memoized general form — retrain the
    * whole configuration from `current` (anchors re-picked, books
    * re-trained, full re-encode). n106's gate passes this lazily for
    * the arm whose trigger never fires; PqSpec pins it equal to the
    * memoized n102 index on the drifted corpus. */
  private[graft] def retrainPqIndexOn(current: DataFrame): PqIndex = {
    val anchors = retrainAnchorsOf(current)
    val books = codebooks(current, Iters, KProd)
    PqIndex(anchors, books,
      encode(current, books).join(assignCoarse(current, anchors), Seq("vec_id")))
  }

  /** n102: drift-triggered RETRAIN — the last index-maintenance axis
    * after create (n64), search (R), upsert (n100), delete (n98) and
    * compaction (n59). n100 proves an upsert under the FROZEN
    * configuration; its books were trained on the pre-drift even half
    * and have never seen a negated vector, so quantization quality
    * decays as drift accumulates (PqSpec measures it: retrained books
    * cut sub-vector quantization MSE on the drifted corpus). The
    * repair is a retrain: re-pick anchors and re-run Lloyd over the
    * CURRENT corpus (trainWhere = true — both parities, negated rows
    * included), re-encode everything, serve the same queries. The twin
    * re-derives the ENTIRE chain (seeds, both Lloyd rounds, anchors,
    * codes, ADC) from the drifted source, so a retrain that leaks the
    * frozen books, trains on the stale snapshot, or misses one
    * re-encoded row flips the hash. At 100 TB retrain is the expensive
    * scheduled path (full Lloyd + re-encode, one broadcast-assignment
    * pass per round over the corpus) that the cheap per-batch axes
    * (n100/n98) make RARE — n103's drift monitor is the trigger. */
  val ivfPqRetrainQ: Q =
    Q("n102_pq_retrain",
      ivfPqIndexSql(embSrc = DriftEditSrc, trainWhere = "true",
        anchorSrc = DriftEditSrc)) { (s, dir) =>
      val e = Tables(s, dir).embeddings
      searchPqIndex(e.filter(col("vec_id") < NumQueries),
        retrainedPqIndex(s, dir))
        .orderBy("q_id", "rn")
    }

  /** n104: IVF cell-skew audit — the structural "when to retrain"
    * signal ([[ivfPqRetrainQ]]'s trigger, alongside n103's embedding
    * drift). Re-assign the DRIFTED corpus under the frozen accumulated
    * anchors and report each cell's load against the uniform ideal
    * (skew = cnt · nCells / corpus): negated vectors abandon the cells
    * that held them and pile into whichever anchors sit nearest their
    * mirrored positions, so post-drift skew is visibly bimodal. One
    * broadcast-assignment pass + an 8-group count — at 100 TB this is
    * a cheap scheduled audit over the codes' cell column (no
    * embeddings read in production; here it re-assigns so the oracle
    * exercises the assignment itself). */
  val ivfCellSkewQ: Q = {
    val sql =
      s"""WITH cc AS (SELECT vec_id AS cell, embedding AS cv FROM embeddings
         |       WHERE vec_id IN (SELECT vec_id FROM embeddings WHERE vec_id % 2 = 0
         |                        ORDER BY vec_id LIMIT $IvfCells)),
         |asg AS (SELECT vec_id, cell FROM (
         |    SELECT e.vec_id, c.cell,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${round6Sql(d2Sql("e.embedding", "c.cv", FullDim))}, c.cell) AS rn
         |    FROM $DriftEditSrc e CROSS JOIN cc c) WHERE rn = 1),
         |tot AS (SELECT count(*) AS n FROM asg)
         |SELECT cell, CAST(count(*) AS BIGINT) AS cnt,
         |       ${round6Sql(s"count(*) * $IvfCells.0 / (SELECT n FROM tot)")} AS skew
         |FROM asg GROUP BY cell
         |ORDER BY cell""".stripMargin
    Q("n104_ivf_cell_skew", sql) { (s, dir) =>
      val e = Tables(s, dir).embeddings
      cellSkew(driftEdited(e), accumulatedPqIndex(s, dir).anchors)
    }
  }

  /** Per-cell load of `vecs` under `anchors` against the uniform
    * ideal (skew = cnt · nCells / corpus) — n104's operator, exposed
    * on the API facade. One broadcast coarse-assignment pass + an
    * nCells-group count; the total is a window over the tiny grouped
    * frame (a crossJoin against counts.agg(...) would plan the
    * corpus-proportional assignment subtree TWICE). Returns
    * (cell, cnt, skew) ordered by cell. */
  def cellSkew(vecs: DataFrame, anchors: DataFrame): DataFrame = {
    val nCells = anchors.count().toDouble
    val counts = assignCoarse(vecs, anchors)
      .groupBy("cell").agg(count(lit(1)).as("cnt"))
    counts
      .select(col("cell"), col("cnt"),
        round6(col("cnt") * lit(nCells) /
          sum(col("cnt")).over(Window.partitionBy())).as("skew"))
      .orderBy("cell")
  }

  /** n106's trigger threshold: L∞ over the 64 per-dimension mean
    * drifts ([[graft.operators.Similarity.embeddingDrift]]'s output).
    * An identical corpus yields EXACTLY 0.0 (DECIMAL-exact means of
    * the same rows subtract to zero bits), while the shared drift edit
    * lands ≥ 47× above this at every test SF (measured max |drift|:
    * 0.0099 / 0.0101 / 0.0047 at sf 0.001/0.01/0.1) — so the gate's
    * decision is data-determined with wide margins on both sides. A
    * FIXED threshold is the catalog's determinism simplification:
    * per-dim means of an undrifted corpus concentrate as ~N^(-1/2),
    * so a production deployment scales the band with sample size
    * (z-score per dimension) — same gate shape, calibrated τ. */
  val DriftRetrainThreshold = 1e-4

  /** One scenario of the drift-gated maintainer: audit `current`
    * against the training-time snapshot `base` (n103's statistic,
    * collected to one scalar — a 64-row aggregate is a driver-side
    * decision by design: cheap audit → scheduled branch → expensive
    * retrain), then serve `queries` from the RETRAINED index if the
    * trigger fired, the standing FROZEN one if not. Both index
    * arguments are by-name — the untaken branch's plan is never
    * built, which is the point of the gate (the retrain is the
    * corpus-proportional path the trigger makes rare). */
  private def driftGatedArm(scenario: String, base: DataFrame,
      current: DataFrame, queries: DataFrame,
      frozen: => PqIndex, retrained: => PqIndex): DataFrame = {
    val trig = Similarity.embeddingDrift(base, current)
      .agg(max(abs(col("drift"))).as("t")).collect()(0).getDouble(0)
    val fired = trig > DriftRetrainThreshold
    searchPqIndex(queries, if (fired) retrained else frozen)
      .select(lit(scenario).as("scenario"),
        lit(if (fired) 1L else 0L).as("fired"), lit(trig).as("trig"),
        col("q_id"), col("nb_id"), col("adc"), col("rn"))
  }

  /** n106: the drift→retrain loop END-TO-END (VERDICT r11 #1) — the
    * round-11 trigger/retrain pieces composed into one gated
    * maintainer, both branches oracle-attested in a single entry. Two
    * scenarios run the same gate:
    *
    *   - STABLE: current == training snapshot → trigger reads exactly
    *     0.0 → the gate serves the standing frozen index (n64's
    *     accumulated even-train/odd-append state) untouched;
    *   - DRIFTED: the shared ≡5 (mod 8) negation edit → trigger reads
    *     ≥ 47× the threshold → the gate RETRAINS on the current corpus
    *     (n102's path) and the served answers provably move (PqSpec
    *     pins them ≠ the frozen-config n100 serving).
    *
    * The twin re-derives the trigger (per-dim DECIMAL-exact mean
    * drift, round6, L∞) and BOTH index arms per scenario, selecting
    * rows by the same comparison — so a gate that fires on the wrong
    * side, serves the wrong index, or reports a perturbed trigger
    * value flips the hash. Output carries the gate's evidence
    * (`fired`, `trig`) on every row.
    *
    * Scale: the trigger is one posexplode + 64-group aggregate over
    * the corpus (n103's cost — the cheap scheduled audit); the
    * retrain, when and only when it fires, is the deliberate
    * corpus-proportional path (full Lloyd + re-encode, n64's training
    * class). The gate is exactly how a 100 TB deployment keeps the
    * expensive path rare. */
  val driftGatedRetrainQ: Q = {
    val dims = "(SELECT unnest(generate_series(1, 64)) AS i)"
    val trigSql = (cur: String) =>
      s"""(SELECT max(abs(drift)) AS t FROM (
         |  SELECT ${round6Sql(s"${davgSql(cur)} - ${davgSql("x")}")} AS drift
         |  FROM (SELECT e.vec_id, d.i AS pos,
         |               CAST(e.embedding[d.i] AS DOUBLE) AS x,
         |               CASE WHEN $DriftEditWhere
         |                    THEN -CAST(e.embedding[d.i] AS DOUBLE)
         |                    ELSE CAST(e.embedding[d.i] AS DOUBLE) END AS cur
         |        FROM embeddings e CROSS JOIN $dims d)
         |  GROUP BY pos))""".stripMargin
    def armSql(scenario: String, trig: String, firedArm: Boolean,
        core: String): String = {
      val cmp = s"(SELECT t FROM $trig) > $DriftRetrainThreshold"
      val guard = if (firedArm) cmp else s"NOT ($cmp)"
      val fired = if (firedArm) 1 else 0
      s"""SELECT '$scenario' AS scenario, CAST($fired AS BIGINT) AS fired,
         |       (SELECT t FROM $trig) AS trig, q_id, nb_id, adc, rn
         |FROM (
         |$core
         |) WHERE $guard""".stripMargin
    }
    val sql =
      s"""WITH t_s AS ${trigSql("x")},
         |t_d AS ${trigSql("cur")}
         |${armSql("stable", "t_s", firedArm = false, ivfPqIndexSqlCore())}
         |UNION ALL
         |${armSql("stable", "t_s", firedArm = true,
          ivfPqIndexSqlCore(trainWhere = "true"))}
         |UNION ALL
         |${armSql("drifted", "t_d", firedArm = false,
          ivfPqIndexSqlCore(embSrc = DriftEditSrc))}
         |UNION ALL
         |${armSql("drifted", "t_d", firedArm = true,
          ivfPqIndexSqlCore(embSrc = DriftEditSrc, trainWhere = "true",
            anchorSrc = DriftEditSrc))}
         |ORDER BY scenario, q_id, rn""".stripMargin
    Q("n106_drift_gated_retrain", sql) { (s, dir) =>
      val e = Tables(s, dir).embeddings
      val qs = e.filter(col("vec_id") < NumQueries)
      driftGatedArm("stable", e, e, qs,
        frozen = accumulatedPqIndex(s, dir),
        retrained = retrainPqIndexOn(e))
        .unionByName(driftGatedArm("drifted", e, driftEdited(e), qs,
          frozen = upsertPqIndex(accumulatedPqIndex(s, dir),
            e.filter(driftEditPred)
              .withColumn("embedding", transform(col("embedding"), x => -x))),
          retrained = retrainedPqIndex(s, dir)))
        .orderBy("scenario", "q_id", "rn")
    }
  }

  /** Test hook: the n105 serving root for this (session, corpus dir),
    * if the entry has run. */
  private[graft] def pqServingBase(s: org.apache.spark.sql.SparkSession,
      dir: String): Option[String] =
    ServingLoc.get(s, s"n105:$dir")

  /** Cold-mode hook (Bench/Lab): wipe the n105 lifecycle CONTENTS so a
    * cold sample re-runs ingest + fold from genuinely empty state, but
    * keep the directory itself ([[ServingLoc]]'s location-reuse rule). */
  def clearPqServingState(spark: org.apache.spark.sql.SparkSession): Unit =
    ServingLoc.clearContents(spark, "n105:")

  /** n105: the PQ at-rest fold + swap lifecycle promoted to the DuckDB
    * gate (n101's promotion on the vector side — PqSpec pins the
    * materialize-to-fresh-path cadence; this entry makes the driver's
    * hash attest the ANSWER served through it). One entry runs the
    * cadence a 100 TB code store lives by:
    *
    *   ingest base (batch 0 trains the frozen configuration) → append
    *   two segments under it → FOLD the accumulated index to a fresh
    *   path (anchors/books/codes rewritten as one base — the
    *   compaction that bounds per-serve segment listing) → PRUNE the
    *   live segment tree (the swap: readers now point at the fold) →
    *   serve the standing queries from the folded index.
    *
    * A code row lost in the fold, a pruned segment still being read,
    * or the fold perturbing any quantized value flips the hash
    * against the from-raw-embeddings twin. Unlike n101's
    * at-least-once ingest (replay markers kept across reps), this
    * lifecycle is deterministic-rebuild per invocation — base write
    * clears, appends overwrite fixed labels — so every bench rep
    * serves the identical answer by construction; st16 owns the
    * redelivery story. */
  val pqServingCompactQ: Q =
    Q("n105_pq_serving_compact",
      ivfPqIndexSql(trainWhere = "vec_id % 3 = 0")) { (s, dir) =>
      val e = Tables(s, dir).embeddings
      val base = ServingLoc.of(s, s"n105:$dir", "graft_pq_serving")
      val live = s"$base/live"
      val folded = s"$base/compacted"
      writePqIndex(buildPqIndex(e.filter(col("vec_id") % 3 === 0)), live)
      appendToPqIndex(e.filter(col("vec_id") % 3 === 1), live, label = "a1")
      appendToPqIndex(e.filter(col("vec_id") % 3 === 2), live, label = "a2")
      // the fold materializes BEFORE the prune (write is an action;
      // clear afterwards is the two-phase swap)
      writePqIndex(readPqIndex(s, live), folded)
      IndexCommit.clear(s, live)
      searchPqIndex(e.filter(col("vec_id") < NumQueries),
        readPqIndex(s, folded))
        .orderBy("q_id", "rn")
    }

  // ---------------------------------------------------------------------
  // n62r: RESIDUAL-encoded IVF-PQ — true IVFADC (Jégou et al. 2011 §IV,
  // VERDICT r05 #2). n62 PQ-encodes raw vectors; IVFADC encodes the
  // residual x − c(x) of each vector against its coarse centroid. The
  // residuals of a cell are centered near the origin with far less
  // spread than the raw corpus, so the SAME 4-byte code budget spends
  // its K codes on a tighter distribution — that contraction is what
  // makes coarse-cell + short-code search accurate at scale. The query
  // side pays for it with PER-CELL distance tables: the query's
  // residual differs in every probed cell (q − c_cell), so dtab is
  // keyed (q_id, cell, m, cent_id) — |Q|·nProbe·M·K rows, still a
  // broadcast (65k rows at production parameters).
  // ---------------------------------------------------------------------

  /** x − c element-wise, computed in DOUBLE and rounded once to float.
    * Both engines double-round identically (IEEE round-to-nearest);
    * a float-precision subtraction could double-round differently in
    * one engine on far-apart exponents. */
  private def residualExpr(vec: String, cent: String): Column =
    expr(s"zip_with($vec, $cent, (a, b) -> " +
      "CAST(CAST(a AS DOUBLE) - CAST(b AS DOUBLE) AS FLOAT))")

  /** TRAINED coarse quantizer: full-dim Lloyd over the corpus, seeded
    * by the first `nCells` vec_ids. Residual encoding NEEDS this —
    * with raw data-point anchors the residual x − c has MORE variance
    * than x on clusterless data (measured +25 % quantization MSE on
    * the harness embeddings: the "nearest" of 8 random anchors in
    * 64-dim is barely closer than a random one, so subtracting it ADDS
    * noise). With cell-mean centroids the residual variance is the
    * within-cell variance = total − between-cell, ≤ raw by
    * construction — the contraction IVFADC's accuracy comes from.
    * Same determinism rules as [[codebooks]]: (round6(L2²), cell)
    * assignment ties, decimal-exact means, empty cells keep their
    * previous centroid. */
  def coarseCentroids(vecs: DataFrame, nCells: Int = IvfCells,
      iters: Int = Iters): DataFrame = {
    var cents = vecs.orderBy("vec_id").limit(nCells)
      .select(col("vec_id").as("cell"), col("embedding").as("cv"))
      .localCheckpoint()
    (1 to iters).foreach { _ =>
      val refreshed = vecs.join(assignCoarse(vecs, cents), Seq("vec_id"))
        .select(col("cell"), posexplode(col("embedding")))
        .groupBy("cell", "pos")
        .agg((sum(col("col").cast("double").cast("decimal(25,6)")).cast("double") /
          count(lit(1))).as("mu"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("pos"), col("mu")))).as("pm"))
        .select(col("cell"),
          transform(col("pm"), s => s.getField("mu")).cast("array<float>").as("cv"))
      cents = cents.select(col("cell"), col("cv").as("prev"))
        .join(refreshed, Seq("cell"), "left")
        .select(col("cell"), coalesce(col("cv"), col("prev")).as("cv"))
        .localCheckpoint()
    }
    cents
  }

  /** The twin's full-dim coarse Lloyd chain: cc0 seeds → casg/ccv/cc
    * per round → final centroids as `cc`. Mirrors [[coarseCentroids]]
    * exactly (same tiebreaks, same decimal means, same empty-cell
    * coalesce). */
  private def coarseChainSql: String = {
    def round(r: Int): String =
      s"""casg$r AS (SELECT vec_id, cell FROM (
         |    SELECT e.vec_id, c.cell,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${round6Sql(d2Sql("e.embedding", "c.cv", FullDim))}, c.cell) AS rn
         |    FROM embeddings e CROSS JOIN cc${r - 1} c) WHERE rn = 1),
         |cmm$r AS (SELECT a.cell, d.i,
         |                CAST(sum(CAST(CAST(e.embedding[d.i] AS DOUBLE) AS DECIMAL(25,6))) AS DOUBLE)
         |                  / count(*) AS mu
         |         FROM casg$r a JOIN embeddings e ON e.vec_id = a.vec_id
         |         CROSS JOIN (SELECT unnest(generate_series(1, $FullDim)) AS i) d
         |         GROUP BY 1, 2),
         |ccv$r AS (SELECT cell, list(CAST(mu AS REAL) ORDER BY i) AS cv
         |         FROM cmm$r GROUP BY cell),
         |cc$r AS (SELECT p.cell, coalesce(n.cv, p.cv) AS cv
         |        FROM cc${r - 1} p LEFT JOIN ccv$r n ON n.cell = p.cell)""".stripMargin
    s"""cc0 AS (SELECT vec_id AS cell, embedding AS cv FROM embeddings
       |        WHERE vec_id IN (SELECT vec_id FROM embeddings
       |                         ORDER BY vec_id LIMIT $IvfCells)),
       |${(1 to Iters).map(round).mkString(",\n")},
       |cc AS (SELECT cell, cv FROM cc$Iters)""".stripMargin
  }

  /** Residual corpus: (vec_id, embedding = x − anchor(cell(x))). The
    * output column keeps the name `embedding` so the shared trainer/
    * encoder ([[codebooks]]/[[encode]]) run on it unchanged. */
  private def residualVecs(vecs: DataFrame, anchors: DataFrame,
      asg: DataFrame): DataFrame =
    vecs.join(asg, Seq("vec_id"))
      .join(broadcast(anchors), Seq("cell"))
      .select(col("vec_id"), residualExpr("embedding", "cv").as("embedding"))

  /** IVFADC top-k: coarse cells prune as in n62, but codes quantize
    * RESIDUALS and each (query, probed cell) gets its own residual
    * distance table. Same scale shape as n62 — the scan side is still
    * the 4-byte code table, partition-pruned by cell; the only new
    * cost is the nProbe× wider (still broadcast) query table. */
  def ivfPqResidualTopK(vecs: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = IvfCells, nProbe: Int = IvfProbe,
      kCodes: Int = KProd): DataFrame = {
    val anchors = sharedCoarse(vecs, nCells)
    val asg = sharedCoarseAsg(vecs, nCells, anchors)
    val res = sharedResVecs(vecs, nCells, anchors, asg)
    val books = sharedResBooks(vecs, nCells, kCodes, res)
    val codes = sharedResCodes(vecs, nCells, kCodes, res, books)
    val probes = probeCoarse(queries, anchors, nProbe)
    val cand = probes.join(asg, Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("cell"), col("vec_id"))
    residualRestrictedAdc(cand, codes,
      residualDtab(queries, anchors, books, probes), k)
  }

  /** Per-(query, probed cell) residual distance tables: the query's
    * residual differs in every probed cell (q − c_cell), so the table
    * is keyed (q_id, cell, m, cent_id) — |Q|·nProbe·M·K rows, still a
    * broadcast. `probes` bounds which (q, cell) residuals exist. */
  private def residualDtab(queries: DataFrame, anchors: DataFrame,
      books: DataFrame, probes: DataFrame): DataFrame = {
    val qres = probes
      .join(queries.select(col("vec_id").as("q_id"), col("embedding")), Seq("q_id"))
      .join(broadcast(anchors), Seq("cell"))
      .select(col("q_id"), col("cell"), residualExpr("embedding", "cv").as("qr"))
    val qsub = qres.select(col("q_id"), col("cell"), explode(expr(
      s"transform(sequence(0, ${M - 1}), " +
        s"m -> named_struct('m', m, 'sv', slice(qr, m * $SubDim + 1, $SubDim)))"))
      .as("s"))
      .select(col("q_id"), col("cell"), col("s.m").as("m"), col("s.sv").as("qs"))
    qsub.join(books, Seq("m"))
      .select(col("q_id"), col("cell"), col("m"), col("cent_id"),
        d2(col("qs"), col("cv")).as("d"))
  }

  /** The residual ADC tail: candidate (q_id, cell, vec_id) rows pick up
    * their codes, look up the (q, cell)-keyed residual distance table,
    * and rank by the fixed-order M-term sum. */
  /** Unranked residual-ADC values — see [[adcValues]] (round 15). */
  private def residualAdcValues(cand: DataFrame, codes: DataFrame,
      dtab: DataFrame): DataFrame = {
    val withCodes = cand.join(codes, Seq("vec_id"))
    val perM = withCodes
      .join(broadcast(dtab
          .withColumnRenamed("q_id", "__dq").withColumnRenamed("cell", "__dcell")
          .withColumnRenamed("m", "__dm").withColumnRenamed("cent_id", "__dc")),
        withCodes("q_id") === col("__dq") && withCodes("cell") === col("__dcell") &&
          withCodes("m") === col("__dm") && withCodes("code") === col("__dc"))
      .select(col("q_id"), col("vec_id"), withCodes("m").as("m"), col("d"))
      .repartition(col("q_id"))
      .groupBy("q_id", "vec_id")
      .agg(max(when(col("m") === 0, col("d"))).as("d0"),
        (1 until M).map(m => max(when(col("m") === m, col("d"))).as(s"d$m")): _*)
    val adc = round6((0 until M).map(m => col(s"d$m")).reduce(_ + _))
    perM.select(col("q_id"), col("vec_id").as("nb_id"), adc.as("adc"))
  }

  private def residualRestrictedAdc(cand: DataFrame, codes: DataFrame,
      dtab: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(col("adc"), col("nb_id"))
    residualAdcValues(cand, codes, dtab)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** DuckDB residual x − c as a list comprehension — the same
    * double-subtract-then-float-round as [[residualExpr]]. */
  private def residualSql(vec: String, cent: String): String =
    s"list_transform(generate_series(1, $FullDim), " +
      s"i -> CAST(CAST($vec[i] AS DOUBLE) - CAST($cent[i] AS DOUBLE) AS REAL))"

  private val ivfPqResidualSql: String = {
    val md = s"(SELECT unnest(generate_series(0, ${M - 1})) AS m) md"
    s"""WITH $coarseChainSql,
       |asgc AS (SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, c.cell,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${round6Sql(d2Sql("e.embedding", "c.cv", FullDim))}, c.cell) AS rn
       |    FROM embeddings e CROSS JOIN cc c) WHERE rn = 1),
       |remb AS (SELECT e.vec_id, ${residualSql("e.embedding", "c.cv")} AS embedding
       |         FROM embeddings e
       |         JOIN asgc a ON a.vec_id = e.vec_id
       |         JOIN cc c ON c.cell = a.cell),
       |sub AS (SELECT vec_id, md.m,
       |               list_slice(embedding, md.m * $SubDim + 1,
       |                          (md.m + 1) * $SubDim) AS sv
       |        FROM remb CROSS JOIN $md),
       |tsub AS (SELECT * FROM sub),
       |c0 AS (SELECT m, vec_id AS cent_id, sv AS cv FROM sub
       |       WHERE vec_id IN (SELECT vec_id FROM remb ORDER BY vec_id LIMIT $KProd)),
       |${(1 to Iters).map(roundSql).mkString(",\n")},
       |codes AS (SELECT vec_id, m, cell AS code FROM (
       |    SELECT s.vec_id, s.m, c.cent_id AS cell,
       |           row_number() OVER (PARTITION BY s.vec_id, s.m
       |             ORDER BY ${round6Sql(d2Sql("s.sv", "c.cv"))}, c.cent_id) AS rn
       |    FROM sub s JOIN c$Iters c ON c.m = s.m) WHERE rn = 1),
       |probes AS (SELECT q_id, cell FROM (
       |    SELECT e.vec_id AS q_id, c.cell,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${round6Sql(d2Sql("e.embedding", "c.cv", FullDim))}, c.cell) AS rn
       |    FROM embeddings e CROSS JOIN cc c
       |    WHERE e.vec_id < $NumQueries) WHERE rn <= $IvfProbe),
       |qres AS (SELECT p.q_id, p.cell, ${residualSql("e.embedding", "c.cv")} AS qr
       |         FROM probes p
       |         JOIN embeddings e ON e.vec_id = p.q_id
       |         JOIN cc c ON c.cell = p.cell),
       |qsub AS (SELECT q_id, cell, md.m,
       |                list_slice(qr, md.m * $SubDim + 1,
       |                           (md.m + 1) * $SubDim) AS qs
       |         FROM qres CROSS JOIN $md),
       |dtab AS (SELECT q.q_id, q.cell, q.m, c.cent_id, ${d2Sql("q.qs", "c.cv")} AS d
       |         FROM qsub q JOIN c$Iters c ON c.m = q.m),
       |cand AS (SELECT p.q_id, p.cell, a.vec_id FROM probes p
       |         JOIN asgc a ON a.cell = p.cell
       |         WHERE a.vec_id <> p.q_id),
       |adc AS (SELECT cn.q_id, cd.vec_id, $adcSumSql AS adc
       |        FROM cand cn
       |        JOIN codes cd ON cd.vec_id = cn.vec_id
       |        JOIN dtab dt ON dt.m = cd.m AND dt.cent_id = cd.code
       |                    AND dt.q_id = cn.q_id AND dt.cell = cn.cell
       |        GROUP BY 1, 2),
       |ranked AS (SELECT q_id, vec_id AS nb_id, adc,
       |                  row_number() OVER (PARTITION BY q_id
       |                                     ORDER BY adc, vec_id) AS rn
       |           FROM adc)
       |SELECT q_id, nb_id, adc, CAST(rn AS BIGINT) AS rn
       |FROM ranked WHERE rn <= $TopK
       |ORDER BY q_id, rn""".stripMargin
  }

  /** Catalog entry: true IVFADC — coarse anchors, residual corpus,
    * 256-code Lloyd chain ON RESIDUALS, residual encoding, per-(query,
    * cell) residual distance tables, cell-restricted ADC — hash-checked
    * end to end against a twin that regenerates the entire residual
    * chain. PqSpec proves the property the hash can't state: at equal
    * bytes, residual codes carry strictly less quantization error than
    * n62's raw codes, and in-cell recall does not regress. */
  val ivfPqResidual: Q = Q("n62r_ivf_pq_residual", ivfPqResidualSql) { (s, dir) =>
    val e = Tables(s, dir).embeddings
    ivfPqResidualTopK(e, e.filter(col("vec_id") < NumQueries), TopK)
      .orderBy("q_id", "rn")
  }

  // ---------------------------------------------------------------------
  // n70/n70r: multi-probe recall calibration (VERDICT_r05 #4 / r06 #5)
  // — the n55 estimate-vs-exact calibration pattern on vectors. For
  // nProbe ∈ {1, 2, 4, 8} the sweep measures, against the EXACT L2
  // top-k ground truth: the candidate volume (the cost axis), the
  // cell-recall ceiling (exact neighbors whose home cell is probed —
  // the best ANY in-cell ranker could do at that probe level), and the
  // realized ADC recall. The gap between hits_cell and hits_adc
  // attributes loss to quantization; the gap between hits_cell and
  // n_exact attributes it to probe selection. n70 measures n62's raw
  // codes, n70r measures n62r's residual codes — at equal bytes, the
  // residual-vs-raw recall difference is now a measured table, not
  // just PqSpec's MSE assertion. All outputs are integer counts, so
  // the whole calibration hash-checks against the DuckDB replay.
  // ---------------------------------------------------------------------

  private val ProbeSweep = Seq(1, 2, 4, 8)

  /** Exact L2 top-k ground truth: the documented all-pairs baseline
    * over the broadcast query set (n10/n12's intentional tiny-build-
    * side shape — |Q| = 32 rows broadcast, corpus streamed). Memoized
    * under the corpus frame — n70 and n70r grade against the SAME
    * ground truth, so it is computed once per session. */
  private def sharedExactTopK(vecs: DataFrame, queries: DataFrame, k: Int): DataFrame =
    memoized(vecs, s"exact:$k")(exactTopK(vecs, queries, k))

  private def exactTopK(vecs: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(col("dist"), col("nb_id"))
    vecs.select(col("vec_id").as("nb_id"), col("embedding"))
      .crossJoin(broadcast(queries
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"))))
      .filter(col("q_id") =!= col("nb_id"))
      .select(col("q_id"), col("nb_id"),
        round6(d2(col("embedding"), col("qe"))).as("dist"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("q_id", "nb_id")
  }

  /** One sweep row: 1-row count aggregates crossed into
    * (n_probe, n_exact, n_cand, hits_cell, hits_adc) — the a27/n60
    * tiny-scalar pattern. `exc` is exact ∪ home-cell; `probes` the
    * (q_id, cell) set at this level; `adcTop` the realized top-k. */
  private def recallRow(p: Int, exact: DataFrame, exc: DataFrame,
      probes: DataFrame, cand: DataFrame, adcTop: DataFrame): DataFrame = {
    val nExact = exact.groupBy().agg(count(lit(1)).as("n_exact"))
    val nCand = cand.groupBy().agg(count(lit(1)).as("n_cand"))
    val hitsCell = exc
      .join(probes.withColumnRenamed("cell", "nb_cell"),
        Seq("q_id", "nb_cell"), "left_semi")
      .groupBy().agg(count(lit(1)).as("hits_cell"))
    val hitsAdc = adcTop.join(exact, Seq("q_id", "nb_id"), "left_semi")
      .groupBy().agg(count(lit(1)).as("hits_adc"))
    nExact.crossJoin(nCand).crossJoin(hitsCell).crossJoin(hitsAdc)
      .select(lit(p.toLong).as("n_probe"), col("n_exact"), col("n_cand"),
        col("hits_cell"), col("hits_adc"))
  }

  private val pqRecallSql: String = {
    def candP(p: Int) =
      s"""cand$p AS (SELECT p.q_id, a.vec_id FROM probes8 p
         |           JOIN asg a ON a.cell = p.cell
         |           WHERE p.rn <= $p AND a.vec_id <> p.q_id)""".stripMargin
    def topP(p: Int) =
      s"""adcx$p AS (SELECT cn.q_id, cd.vec_id, $adcSumSql AS adc
         |          FROM cand$p cn
         |          JOIN codes cd ON cd.vec_id = cn.vec_id
         |          JOIN dtab dt ON dt.m = cd.m AND dt.cent_id = cd.code
         |                      AND dt.q_id = cn.q_id
         |          GROUP BY 1, 2),
         |top$p AS (SELECT q_id, vec_id AS nb_id FROM (
         |    SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
         |             ORDER BY adc, vec_id) AS rn FROM adcx$p) WHERE rn <= $TopK)""".stripMargin
    def rowP(p: Int) =
      s"""SELECT CAST($p AS BIGINT) AS n_probe,
         |       (SELECT CAST(count(*) AS BIGINT) FROM exact) AS n_exact,
         |       (SELECT CAST(count(*) AS BIGINT) FROM cand$p) AS n_cand,
         |       (SELECT CAST(count(*) AS BIGINT) FROM exc e
         |        JOIN probes8 pp ON pp.q_id = e.q_id AND pp.cell = e.nb_cell
         |        WHERE pp.rn <= $p) AS hits_cell,
         |       (SELECT CAST(count(*) AS BIGINT) FROM top$p t
         |        JOIN exact x ON x.q_id = t.q_id AND x.nb_id = t.nb_id) AS hits_adc""".stripMargin
    s"""WITH ${lloydChainSql(KProd)},
       |cc AS (SELECT vec_id AS cell, embedding AS cv FROM embeddings
       |       WHERE vec_id < $IvfCells),
       |asg AS (SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, c.cell,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${round6Sql(d2Sql("e.embedding", "c.cv", FullDim))}, c.cell) AS rn
       |    FROM embeddings e CROSS JOIN cc c) WHERE rn = 1),
       |probes8 AS (SELECT q_id, cell, rn FROM (
       |    SELECT e.vec_id AS q_id, c.cell,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${round6Sql(d2Sql("e.embedding", "c.cv", FullDim))}, c.cell) AS rn
       |    FROM embeddings e CROSS JOIN cc c
       |    WHERE e.vec_id < $NumQueries) WHERE rn <= $IvfCells),
       |exact AS (SELECT q_id, nb_id FROM (
       |    SELECT q.vec_id AS q_id, n.vec_id AS nb_id,
       |           row_number() OVER (PARTITION BY q.vec_id
       |             ORDER BY ${round6Sql(d2Sql("q.embedding", "n.embedding", FullDim))}, n.vec_id) AS rn
       |    FROM embeddings q JOIN embeddings n ON n.vec_id <> q.vec_id
       |    WHERE q.vec_id < $NumQueries) WHERE rn <= $TopK),
       |exc AS (SELECT x.q_id, x.nb_id, a.cell AS nb_cell
       |        FROM exact x JOIN asg a ON a.vec_id = x.nb_id),
       |${ProbeSweep.map(candP).mkString(",\n")},
       |${ProbeSweep.map(topP).mkString(",\n")}
       |${ProbeSweep.map(rowP).mkString("\nUNION ALL\n")}
       |ORDER BY n_probe""".stripMargin
  }

  /** Catalog entry: the raw-code (n62-model) recall sweep. */
  val pqRecall: Q = Q("n70_pq_recall", pqRecallSql) { (s, dir) =>
    val e = Tables(s, dir).embeddings
    val q = e.filter(col("vec_id") < NumQueries)
    val cents = e.filter(col("vec_id") < IvfCells)
      .select(col("vec_id").as("cell"), col("embedding").as("cv"))
    val asg = sharedRawAsg(e, IvfCells)
    val books = sharedBooks(e, KProd)
    val codes = sharedCodes(e, KProd, books)
    val probes8 = probeCoarseRanked(q, cents, IvfCells).localCheckpoint()
    val exact = sharedExactTopK(e, q, TopK)
    val exc = exact.join(
      asg.withColumnRenamed("vec_id", "nb_id").withColumnRenamed("cell", "nb_cell"),
      Seq("nb_id"))
    // ONE ADC pass for the whole sweep (round 15, guide §1.2): a
    // pair's ADC value is probe-level-independent, and each vector
    // lives in exactly one cell, so the maximal candidate set with its
    // probe rank attached derives every nProbe level by rank filter +
    // re-rank — the old body re-ran the distance-table pivot per level
    // (4× the sweep's dominant work).
    val candAll = probes8.join(asg, Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"), col("rn"))
      .localCheckpoint()
    val adcAll = adcValues(
        candAll.join(codes, Seq("vec_id"))
          .select(col("q_id"), col("vec_id"), col("m"), col("code")),
        books, q)
      .join(candAll.select(col("q_id"), col("vec_id").as("nb_id"), col("rn")),
        Seq("q_id", "nb_id"))
      .localCheckpoint()
    val wTop = Window.partitionBy("q_id").orderBy(col("adc"), col("nb_id"))
    ProbeSweep.map { p =>
      val probes = probes8.filter(col("rn") <= p).select("q_id", "cell")
      val cand = candAll.filter(col("rn") <= p).select("q_id", "vec_id")
      val adcTop = adcAll.filter(col("rn") <= p)
        .withColumn("topk", row_number().over(wTop))
        .filter(col("topk") <= TopK)
        .select("q_id", "nb_id")
      recallRow(p, exact, exc, probes, cand, adcTop)
    }.reduce(_.unionAll(_)).orderBy("n_probe")
  }

  private val pqRecallResidualSql: String = {
    val md = s"(SELECT unnest(generate_series(0, ${M - 1})) AS m) md"
    def candP(p: Int) =
      s"""cand$p AS (SELECT p.q_id, p.cell, a.vec_id FROM probes8 p
         |           JOIN asgc a ON a.cell = p.cell
         |           WHERE p.rn <= $p AND a.vec_id <> p.q_id)""".stripMargin
    def topP(p: Int) =
      s"""adcx$p AS (SELECT cn.q_id, cd.vec_id, $adcSumSql AS adc
         |          FROM cand$p cn
         |          JOIN codes cd ON cd.vec_id = cn.vec_id
         |          JOIN dtab dt ON dt.m = cd.m AND dt.cent_id = cd.code
         |                      AND dt.q_id = cn.q_id AND dt.cell = cn.cell
         |          GROUP BY 1, 2),
         |top$p AS (SELECT q_id, vec_id AS nb_id FROM (
         |    SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
         |             ORDER BY adc, vec_id) AS rn FROM adcx$p) WHERE rn <= $TopK)""".stripMargin
    def rowP(p: Int) =
      s"""SELECT CAST($p AS BIGINT) AS n_probe,
         |       (SELECT CAST(count(*) AS BIGINT) FROM exact) AS n_exact,
         |       (SELECT CAST(count(*) AS BIGINT) FROM cand$p) AS n_cand,
         |       (SELECT CAST(count(*) AS BIGINT) FROM exc e
         |        JOIN probes8 pp ON pp.q_id = e.q_id AND pp.cell = e.nb_cell
         |        WHERE pp.rn <= $p) AS hits_cell,
         |       (SELECT CAST(count(*) AS BIGINT) FROM top$p t
         |        JOIN exact x ON x.q_id = t.q_id AND x.nb_id = t.nb_id) AS hits_adc""".stripMargin
    s"""WITH $coarseChainSql,
       |asgc AS (SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, c.cell,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${round6Sql(d2Sql("e.embedding", "c.cv", FullDim))}, c.cell) AS rn
       |    FROM embeddings e CROSS JOIN cc c) WHERE rn = 1),
       |remb AS (SELECT e.vec_id, ${residualSql("e.embedding", "c.cv")} AS embedding
       |         FROM embeddings e
       |         JOIN asgc a ON a.vec_id = e.vec_id
       |         JOIN cc c ON c.cell = a.cell),
       |sub AS (SELECT vec_id, md.m,
       |               list_slice(embedding, md.m * $SubDim + 1,
       |                          (md.m + 1) * $SubDim) AS sv
       |        FROM remb CROSS JOIN $md),
       |tsub AS (SELECT * FROM sub),
       |c0 AS (SELECT m, vec_id AS cent_id, sv AS cv FROM sub
       |       WHERE vec_id IN (SELECT vec_id FROM remb ORDER BY vec_id LIMIT $KProd)),
       |${(1 to Iters).map(roundSql).mkString(",\n")},
       |codes AS (SELECT vec_id, m, cell AS code FROM (
       |    SELECT s.vec_id, s.m, c.cent_id AS cell,
       |           row_number() OVER (PARTITION BY s.vec_id, s.m
       |             ORDER BY ${round6Sql(d2Sql("s.sv", "c.cv"))}, c.cent_id) AS rn
       |    FROM sub s JOIN c$Iters c ON c.m = s.m) WHERE rn = 1),
       |probes8 AS (SELECT q_id, cell, rn FROM (
       |    SELECT e.vec_id AS q_id, c.cell,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${round6Sql(d2Sql("e.embedding", "c.cv", FullDim))}, c.cell) AS rn
       |    FROM embeddings e CROSS JOIN cc c
       |    WHERE e.vec_id < $NumQueries) WHERE rn <= $IvfCells),
       |qres AS (SELECT p.q_id, p.cell, ${residualSql("e.embedding", "c.cv")} AS qr
       |         FROM probes8 p
       |         JOIN embeddings e ON e.vec_id = p.q_id
       |         JOIN cc c ON c.cell = p.cell),
       |qsub AS (SELECT q_id, cell, md.m,
       |                list_slice(qr, md.m * $SubDim + 1,
       |                           (md.m + 1) * $SubDim) AS qs
       |         FROM qres CROSS JOIN $md),
       |dtab AS (SELECT q.q_id, q.cell, q.m, c.cent_id, ${d2Sql("q.qs", "c.cv")} AS d
       |         FROM qsub q JOIN c$Iters c ON c.m = q.m),
       |exact AS (SELECT q_id, nb_id FROM (
       |    SELECT q.vec_id AS q_id, n.vec_id AS nb_id,
       |           row_number() OVER (PARTITION BY q.vec_id
       |             ORDER BY ${round6Sql(d2Sql("q.embedding", "n.embedding", FullDim))}, n.vec_id) AS rn
       |    FROM embeddings q JOIN embeddings n ON n.vec_id <> q.vec_id
       |    WHERE q.vec_id < $NumQueries) WHERE rn <= $TopK),
       |exc AS (SELECT x.q_id, x.nb_id, a.cell AS nb_cell
       |        FROM exact x JOIN asgc a ON a.vec_id = x.nb_id),
       |${ProbeSweep.map(candP).mkString(",\n")},
       |${ProbeSweep.map(topP).mkString(",\n")}
       |${ProbeSweep.map(rowP).mkString("\nUNION ALL\n")}
       |ORDER BY n_probe""".stripMargin
  }

  /** Catalog entry: the residual-code (n62r-model) recall sweep — the
    * raw-vs-residual comparison at equal bytes, as data. */
  val pqRecallResidual: Q = Q("n70r_pq_recall_residual", pqRecallResidualSql) { (s, dir) =>
    val e = Tables(s, dir).embeddings
    val q = e.filter(col("vec_id") < NumQueries)
    val anchors = sharedCoarse(e, IvfCells)
    val asg = sharedCoarseAsg(e, IvfCells, anchors)
    val res = sharedResVecs(e, IvfCells, anchors, asg)
    val books = sharedResBooks(e, IvfCells, KProd, res)
    val codes = sharedResCodes(e, IvfCells, KProd, res, books)
    val probes8 = probeCoarseRanked(q, anchors, IvfCells).localCheckpoint()
    val dtab8 = residualDtab(q, anchors, books, probes8.select("q_id", "cell"))
    val exact = sharedExactTopK(e, q, TopK)
    val exc = exact.join(
      asg.withColumnRenamed("vec_id", "nb_id").withColumnRenamed("cell", "nb_cell"),
      Seq("nb_id"))
    // ONE residual-ADC pass for the whole sweep (round 15 — see the
    // raw sweep above): a pair's (q, cell)-keyed residual ADC is
    // probe-level-independent because each vector has one cell
    val candAll = probes8.join(asg, Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("cell"), col("vec_id"), col("rn"))
      .localCheckpoint()
    val adcAll = residualAdcValues(
        candAll.select("q_id", "cell", "vec_id"), codes, dtab8)
      .join(candAll.select(col("q_id"), col("vec_id").as("nb_id"), col("rn")),
        Seq("q_id", "nb_id"))
      .localCheckpoint()
    val wTop = Window.partitionBy("q_id").orderBy(col("adc"), col("nb_id"))
    ProbeSweep.map { p =>
      val probes = probes8.filter(col("rn") <= p).select("q_id", "cell")
      val cand = candAll.filter(col("rn") <= p).select("q_id", "cell", "vec_id")
      val adcTop = adcAll.filter(col("rn") <= p)
        .withColumn("topk", row_number().over(wTop))
        .filter(col("topk") <= TopK)
        .select("q_id", "nb_id")
      recallRow(p, exact, exc, probes, cand, adcTop)
    }.reduce(_.unionAll(_)).orderBy("n_probe")
  }

  /** Mean L2² quantization error of `codes` against `books`, where
    * `truth` holds the vectors the codes claim to represent (raw
    * corpus for n62, residual corpus for n62r) — the PqSpec comparison
    * surface for raw-vs-residual at equal bytes. */
  def quantizationMse(truth: DataFrame, codes: DataFrame,
      books: DataFrame): Double =
    codes.join(books.withColumnRenamed("cent_id", "code"), Seq("m", "code"))
      .join(subVectors(truth), Seq("vec_id", "m"))
      .agg(avg(d2(col("sv"), col("cv"))))
      .head().getDouble(0)

  /** The raw/residual training surfaces, exposed for PqSpec's equal-
    * bytes comparison: (corpus the codes represent, its codebooks). */
  def rawPqParts(vecs: DataFrame): (DataFrame, DataFrame) = {
    val books = codebooks(vecs, Iters, KProd)
    (vecs, books)
  }

  def residualPqParts(vecs: DataFrame): (DataFrame, DataFrame) = {
    val anchors = coarseCentroids(vecs)
    val res = residualVecs(vecs, anchors, assignCoarse(vecs, anchors))
    val books = codebooks(res, Iters, KProd)
    (res, books)
  }

  val all: Seq[Q] = Seq(pqAdc, ivfPqAdc, ivfPqResidual, ivfPqIndexQ,
    pqRecall, pqRecallResidual, ivfPqDeleteQ, ivfPqUpsertQ,
    ivfPqRetrainQ, ivfCellSkewQ, pqServingCompactQ, driftGatedRetrainQ)
}
