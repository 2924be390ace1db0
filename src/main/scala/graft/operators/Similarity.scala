package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.Det._

/** Similarity search over the embeddings table (north star,
  * SURVEY.md §7.2.6): brute-force cosine top-k as the exact baseline,
  * and a random-hyperplane-LSH bucketed variant as the scale path.
  *
  * Numeric parity: dot products and norms are computed in double
  * precision with per-element IEEE ops identical in both engines; the
  * 64-element accumulation error (~1e-15) is absorbed by the portable
  * floor-based round6, and ranking ties broken by neighbor id, so
  * top-k membership is deterministic.
  *
  * Scale stance: queries are broadcast against the corpus (no shuffle
  * of the big side); at 100 TB the corpus side stays partition-local
  * and only per-query top-k heaps move. The LSH variant bounds
  * candidate generation by bucket, the standard trade of recall for a
  * ~|bucket|/|corpus| cost reduction.
  */
object Similarity {

  private val NumQueries = 32
  private val TopK = 5

  /** Per-row L2 norm in double precision. */
  private def l2(c: Column): Column =
    sqrt(aggregate(transform(c, x => x.cast("double") * x),
      lit(0.0), (acc, x) => acc + x))

  /** Bounded per-query top-k over scored rows (q_id, nb_id, cos) via
    * the typed [[graft.functions.TopKByScore]] Aggregator: map-side
    * partial heaps mean at most k rows per query PER PARTITION reach
    * the shuffle, and parallelism is the corpus partitioning, not the
    * query count. This is the library default; the per-q_id window
    * formulation (sorts every query's full candidate set in one
    * partition — parallelism capped at |queries|) is kept for the
    * oracle catalog entries, and SimilaritySpec proves the two paths
    * identical (same (cos desc, nb_id) order, same rn). */
  private def heapTopK(scored: DataFrame, k: Int): DataFrame = {
    val session = scored.sparkSession
    import session.implicits._
    scored.select(col("q_id").cast("long"), col("nb_id").cast("long"),
        col("cos").cast("double"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(new graft.functions.TopKByScore(k).toColumn.name("topk"))
      .flatMap { case (q, nbs) =>
        nbs.iterator.zipWithIndex.map { case ((nb, c), i) =>
          (q, nb, c, (i + 1).toLong)
        }
      }
      .toDF("q_id", "nb_id", "cos", "rn")
  }

  /** Per-query top-k dispatch: heap aggregator (scale path) or window
    * (oracle-entry path) — bit-identical outputs either way. */
  private def topKPerQuery(scored: DataFrame, k: Int, useHeap: Boolean): DataFrame =
    if (useHeap) heapTopK(scored, k)
    else {
      val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("nb_id"))
      scored.withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= k)
    }

  /** Shared exact re-rank for ANN variants: candidate pairs with
    * (q_id, qv, vec_id, embedding) → top-k per query by rounded cosine
    * with the catalog's deterministic (cos desc, nb_id) tiebreak. */
  private[operators] def rerank(candidates: DataFrame, k: Int,
      excludeSelf: Boolean = true, useHeap: Boolean = false): DataFrame = {
    val scored = candidates
      .filter(if (excludeSelf) col("q_id") =!= col("vec_id") else lit(true))
      .select(col("q_id"), col("vec_id").as("nb_id"),
        round6(graft.functions.GraftFunctions.cosine_sim(col("qv"), col("embedding")))
          .as("cos"))
    topKPerQuery(scored, k, useHeap).orderBy("q_id", "rn")
  }

  /** DuckDB twin of the brute-force cosine top-k — shared verbatim by
    * n10 (window rank) and n10h (heap rank): both Spark paths must
    * hash-match the SAME oracle answer. */
  private val cosineTopKSql =
    s"""WITH e AS (SELECT vec_id, embedding,
       |                  sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
       |           FROM embeddings),
       |q AS (SELECT * FROM e WHERE vec_id < $NumQueries),
       |pairs AS (
       |  SELECT q.vec_id AS q_id, e.vec_id AS nb_id,
       |         ${round6Sql(
              "list_sum(list_transform(generate_series(1, len(q.embedding)), " +
              "i -> CAST(q.embedding[i] AS DOUBLE) * e.embedding[i])) / (q.nrm * e.nrm)")} AS cos
       |  FROM q CROSS JOIN e
       |  WHERE q.vec_id <> e.vec_id),
       |ranked AS (SELECT q_id, nb_id, cos,
       |                  row_number() OVER (PARTITION BY q_id
       |                                     ORDER BY cos DESC, nb_id) AS rn
       |           FROM pairs)
       |SELECT q_id, nb_id, cos, CAST(rn AS BIGINT) AS rn
       |FROM ranked WHERE rn <= $TopK
       |ORDER BY q_id, rn""".stripMargin

  /** Exact brute-force cosine top-k for a fixed query set (vec_id <
    * 32), k = 5. Broadcast queries × corpus scan; per-query top-k via
    * row_number (TakeOrdered per partition at scale). */
  val cosineTopK: Q = Q(
    "n10_cosine_topk",
    cosineTopKSql) { (s, dir) =>
    val e = Tables(s, dir).embeddings
    cosineTopK(e, e.filter(col("vec_id") < NumQueries), TopK, useHeap = false)
      .orderBy("q_id", "rn")
  }

  /** Driver-checked heap path (VERDICT_r03 #8): the SAME query as n10
    * run through the bounded TopKByScore aggregator (useHeap = true —
    * the library's scale default, ≤ k rows per (query, partition) at
    * the shuffle) against the SAME DuckDB oracle, so the scale path is
    * hash-checked by the driver, not only by SimilaritySpec's
    * window == heap equality proof. */
  val cosineTopKHeap: Q = Q(
    "n10h_cosine_topk_heap",
    cosineTopKSql) { (s, dir) =>
    val e = Tables(s, dir).embeddings
    cosineTopK(e, e.filter(col("vec_id") < NumQueries), TopK, useHeap = true)
      .orderBy("q_id", "rn")
  }

  /** Library form of brute-force cosine top-k: corpus and queries must
    * have (vec_id, embedding); returns (q_id, nb_id, cos, rn). The
    * query set is broadcast; the corpus streams partition-local.
    *
    * `excludeSelf` (default true) drops corpus rows whose vec_id equals
    * the query's — correct when the queries are drawn from the corpus
    * (the catalog case). Pass false when the query id space is
    * unrelated to the corpus, or equal ids would silently drop valid
    * neighbors.
    *
    * `useHeap` (default true) ranks through the bounded TopKByScore
    * aggregator — at a 10⁶-query batch the per-q_id window would ship
    * every candidate row to one partition per query; the heap keeps
    * parallelism at the corpus partitioning and shuffles ≤ k rows per
    * (query, partition). The window path remains for the oracle
    * entries (identical output, proven in SimilaritySpec/ApiSpec). */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      excludeSelf: Boolean = true, useHeap: Boolean = true): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("qv"),
      graft.functions.GraftFunctions.norm_float(col("embedding")).as("nrm_q"))
    // norm-factored codegen'd cosine: per-side norms computed once (the
    // corpus norm inside the pre-join projection, the query norm in the
    // broadcast side), so the |corpus|×|queries| loop is dot-only —
    // bit-identical to the fused cosine_sim fold (SimilaritySpec)
    val scored = corpus
      .select(col("vec_id"), col("embedding"),
        graft.functions.GraftFunctions.norm_float(col("embedding")).as("nrm_c"))
      .crossJoin(broadcast(q))
      .filter(if (excludeSelf) col("q_id") =!= col("vec_id") else lit(true))
      .select(col("q_id"), col("vec_id").as("nb_id"),
        round6(graft.functions.GraftFunctions.dot_float(col("qv"), col("embedding")) /
          (col("nrm_q") * col("nrm_c"))).as("cos"))
    topKPerQuery(scored, k, useHeap)
  }

  /** Deterministic ±1 hyperplane weights per (table, bit, dim) — md5
    * sign bits, no RNG, so every run (and every executor) agrees. */
  private def hyperplaneWeights(nTables: Int, nBits: Int, dim: Int): Array[Array[Seq[Double]]] =
    Array.tabulate(nTables, nBits) { (t, b) =>
      (0 until dim).map { i =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$t:$b:$i".getBytes("UTF-8"))
        if ((hex(0) & 0x80) == 0) 1.0 else -1.0
      }
    }

  /** Per-row LSH signatures as pure column expressions: one packed-long
    * sig column per table, computed inside the scan stage — no shuffle,
    * no 64× posexplode, no weight-table join (the round-1 formulation
    * paid 3 shuffles of n×dim rows for the same bits). */
  private def hyperplaneSigCols(emb: Column, nTables: Int, nBits: Int, dim: Int): Seq[Column] = {
    val w = hyperplaneWeights(nTables, nBits, dim)
    (0 until nTables).map { t =>
      (0 until nBits).map { b =>
        val proj = aggregate(
          zip_with(emb, typedlit(w(t)(b)), (x, wt) => x.cast("double") * wt),
          lit(0.0), (acc, x) => acc + x)
        when(proj >= 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _).as(s"sig$t")
    }
  }

  /** (vec_id, t, sig) rows: each vector's bucket in each LSH table. */
  private def hyperplaneSigs(vecs: DataFrame, nTables: Int, nBits: Int, dim: Int): DataFrame =
    vecs.select(col("vec_id") +: hyperplaneSigCols(col("embedding"), nTables, nBits, dim): _*)
      .select(col("vec_id"), posexplode(array((0 until nTables).map(t => col(s"sig$t")): _*)))
      .withColumnRenamed("pos", "t").withColumnRenamed("col", "sig")

  /** Approximate NN via random-hyperplane LSH: 4 tables × 10-bit
    * signatures; candidates = bucket collisions in any table; exact
    * cosine re-rank on candidates only.
    *
    * Oracle-checked end to end: the hyperplanes are deterministic
    * (md5 sign bits), the projections are identical left-to-right
    * double folds in both engines, and the re-rank is the proven n10
    * pattern — so even the *approximate* operator hash-matches a
    * DuckDB twin with the weight matrices inlined as literals. */
  val annLsh: Q = {
    val (nT, nB, dim) = (4, 10, 64)
    val w = hyperplaneWeights(nT, nB, dim)
    def wLit(t: Int, b: Int): String =
      w(t)(b).map(x => if (x > 0) "1" else "-1").mkString("[", ",", "]")
    def sigSql(t: Int): String = (0 until nB).map { b =>
      s"""CASE WHEN list_sum(list_transform(generate_series(1, $dim),
         |  i -> CAST(embedding[i] AS DOUBLE) * (${wLit(t, b)})[i])) >= 0
         |  THEN ${1L << b} ELSE 0 END""".stripMargin
    }.mkString("(", "\n + ", ")")
    val dot = s"list_sum(list_transform(generate_series(1, $dim), " +
      "i -> CAST(qe.embedding[i] AS DOUBLE) * e.embedding[i]))"
    Q(
      "n11_ann_lsh",
      s"""WITH e AS (SELECT vec_id, embedding,
         |                  sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
         |           FROM embeddings),
         |sigs AS (SELECT vec_id,
         |${(0 until nT).map(t => s"  ${sigSql(t)} AS sig$t").mkString(",\n")}
         |FROM embeddings),
         |su AS (SELECT vec_id, ts.t,
         |              CASE ts.t ${(0 until nT).map(t => s"WHEN $t THEN sig$t").mkString(" ")} END AS sig
         |       FROM sigs CROSS JOIN (SELECT unnest(generate_series(0, ${nT - 1})) AS t) ts),
         |cand AS (SELECT DISTINCT q.vec_id AS q_id, s.vec_id AS nb_id
         |         FROM su q JOIN su s ON q.t = s.t AND q.sig = s.sig
         |         WHERE q.vec_id < $NumQueries AND q.vec_id <> s.vec_id),
         |pairs AS (SELECT c.q_id, c.nb_id,
         |                 ${round6Sql(s"$dot / (qe.nrm * e.nrm)")} AS cos
         |          FROM cand c
         |          JOIN e ON e.vec_id = c.nb_id
         |          JOIN e qe ON qe.vec_id = c.q_id),
         |ranked AS (SELECT q_id, nb_id, cos,
         |                  row_number() OVER (PARTITION BY q_id
         |                                     ORDER BY cos DESC, nb_id) AS rn
         |           FROM pairs)
         |SELECT q_id, nb_id, cos, CAST(rn AS BIGINT) AS rn
         |FROM ranked WHERE rn <= $TopK
         |ORDER BY q_id, rn""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).embeddings
      val sigs = hyperplaneSigs(e, nT, nB, dim)

      val qs = sigs.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("t"), col("sig"))
      val cand = qs.join(sigs, Seq("t", "sig"))
        .filter(col("q_id") =!= col("vec_id"))
        .select("q_id", "vec_id").distinct()

      val q = e.select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      rerank(cand.join(e, Seq("vec_id")).join(broadcast(q), Seq("q_id")), TopK)
    }
  }

  /** Embedding near-duplicate pairs: all (v1 < v2) with cosine ≥
    * threshold.
    *
    * `exact = true`: O(n²/2) upper-triangle self-join with the smaller
    * side broadcast — the correct baseline, and the only formulation
    * with guaranteed recall on arbitrary data.
    *
    * `exact = false`: the 100 TB scale path — hyperplane-LSH buckets
    * (nTables × nBits) generate candidate pairs, then the same exact
    * cosine verify runs on candidates only. Candidate cost ≈
    * Σ_bucket |bucket|² per table instead of n²/2. Recall per pair is
    * 1-(1-p^nBits)^nTables with p = 1-θ/π: at cos 0.9 the default
    * (8 tables × 8 bits) catches >99.99%; at cos 0.5 hyperplane LSH
    * is mathematically useless (p ≈ 0.67 ⇒ per-table collision 2%) —
    * near-duplicate thresholds are ≥0.8 in practice, which is why the
    * catalog's 0.5-threshold oracle entry (n12) stays exact.
    *
    * `probeBits` (LSH path only): multi-probe expansion — each vector
    * additionally probes the `probeBits` buckets at hamming distance 1
    * from its signature (low bits flipped; probeBits = nBits covers all
    * 1-bit neighbors). Per-table collision probability rises from p^n
    * to p^n + probeBits·p^(n-1)(1−p) at a (probeBits+1)× candidate-side
    * expansion — the standard recall dial that avoids doubling
    * nTables (and thus re-hashing the corpus). */
  def nearDuplicateVectors(vecs: DataFrame, threshold: Double,
      exact: Boolean = true, nTables: Int = 8, nBits: Int = 8,
      dim: Int = -1, probeBits: Int = 0): DataFrame = {
    // norms factored out of the per-pair loop: the n²/2 (or candidate)
    // projection below does ONE multiply-add per element instead of
    // three, and dot/(nrm1*nrm2) is bit-identical to cosine_sim's
    // fused dot/(√Σa²·√Σb²) — same FP op sequence (SimilaritySpec).
    val a = vecs.select(col("vec_id").as("v1"), col("embedding").as("e1"),
      graft.functions.GraftFunctions.norm_float(col("embedding")).as("nrm1"))
    val b = vecs.select(col("vec_id").as("v2"), col("embedding").as("e2"),
      graft.functions.GraftFunctions.norm_float(col("embedding")).as("nrm2"))
    val pairs =
      // The O(n²) pair loop's parallelism equals the STREAM side's
      // partition count — a small corpus read from one parquet file
      // would run the whole quadratic compute single-threaded. Spread
      // the stream side across the cluster first (a shuffle of n rows,
      // amortized over n²/2 pair evaluations).
      if (exact)
        a.repartition(vecs.sparkSession.sparkContext.defaultParallelism)
          .join(broadcast(b), col("v1") < col("v2"))
      else {
        // dim must match the data: a too-short weight literal null-pads
        // zip_with, null-poisons every projection, and collapses all
        // vectors into one bucket (silent all-pairs). Derive from the
        // first row unless the caller pins it.
        val d =
          if (dim > 0) dim
          else vecs.select(size(col("embedding"))).head().getInt(0)
        require(probeBits >= 0 && probeBits <= nBits,
          s"probeBits $probeBits out of [0, $nBits]")
        val sigs = hyperplaneSigs(vecs, nTables, nBits, d)
        // expand ONE side: pair (a < b) is caught via a-expanded ∩ b-exact
        val s1 =
          if (probeBits == 0)
            sigs.select(col("vec_id").as("v1"), col("t"), col("sig"))
          else sigs.select(col("vec_id").as("v1"), col("t"),
            explode(array(col("sig") +:
              (0 until probeBits).map(bit =>
                col("sig").bitwiseXOR(lit(1L << bit))): _*)).as("sig"))
        val s2 = sigs.select(col("vec_id").as("v2"), col("t"), col("sig"))
        s1.join(s2, Seq("t", "sig")).filter(col("v1") < col("v2"))
          .select("v1", "v2").distinct()
          .join(a, Seq("v1")).join(b, Seq("v2"))
      }
    pairs
      .select(col("v1"), col("v2"),
        round6(graft.functions.GraftFunctions.dot_float(col("e1"), col("e2")) /
          (col("nrm1") * col("nrm2"))).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Catalog entry: exact variant at threshold 0.5 (see
    * [[nearDuplicateVectors]] for why the oracle-checked entry cannot
    * be the LSH path on this corpus). */
  val embeddingNearDup: Q = Q(
    "n12_embedding_neardup",
    s"""WITH e AS (SELECT vec_id, embedding,
       |                  sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
       |           FROM embeddings)
       |SELECT a.vec_id AS v1, b.vec_id AS v2,
       |       ${round6Sql(
            "list_sum(list_transform(generate_series(1, len(a.embedding)), " +
            "i -> CAST(a.embedding[i] AS DOUBLE) * b.embedding[i])) / (a.nrm * b.nrm)")} AS cos
       |FROM e a JOIN e b ON a.vec_id < b.vec_id
       |WHERE ${round6Sql(
            "list_sum(list_transform(generate_series(1, len(a.embedding)), " +
            "i -> CAST(a.embedding[i] AS DOUBLE) * b.embedding[i])) / (a.nrm * b.nrm)")} >= 0.5
       |ORDER BY v1, v2""".stripMargin) { (s, dir) =>
    nearDuplicateVectors(Tables(s, dir).embeddings, threshold = 0.5, exact = true)
      .orderBy("v1", "v2")
  }

  /** IVF-style ANN: coarse quantization into 16 cells (deterministic
    * anchors: the first 16 vectors — a k-means refinement would slot in
    * without changing the plan), each vector assigned to its nearest
    * cell; a query probes its 4 nearest cells and exact-reranks only
    * those cells' members. Cost ≈ nprobe/ncells of brute force; the
    * recall/cost dial is (ncells, nprobe). Deterministic end to end
    * (round6 similarities, id tiebreaks), so the full approximate
    * pipeline — assignment, probing, re-rank — is oracle-checked
    * against its DuckDB twin; SimilaritySpec additionally checks
    * recall vs n10. */
  val annIvf: Q = {
    val nCells = 16
    val nProbe = 4
    def dot(a: String, b: String): String =
      s"list_sum(list_transform(generate_series(1, 64), " +
        s"i -> CAST($a.embedding[i] AS DOUBLE) * $b.embedding[i]))"
    Q(
      "n13_ann_ivf",
      s"""WITH e AS (SELECT vec_id, embedding,
         |                  sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
         |           FROM embeddings),
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
         |    FROM e CROSS JOIN c WHERE e.vec_id < $NumQueries) WHERE prn <= $nProbe),
         |pairs AS (SELECT p.q_id, a.vec_id AS nb_id,
         |                 ${round6Sql(s"${dot("qe", "ne")} / (qe.nrm * ne.nrm)")} AS cos
         |          FROM probes p
         |          JOIN asg a ON a.cell = p.cell AND a.vec_id <> p.q_id
         |          JOIN e ne ON ne.vec_id = a.vec_id
         |          JOIN e qe ON qe.vec_id = p.q_id),
         |ranked AS (SELECT q_id, nb_id, cos,
         |                  row_number() OVER (PARTITION BY q_id
         |                                     ORDER BY cos DESC, nb_id) AS rn
         |           FROM pairs)
         |SELECT q_id, nb_id, cos, CAST(rn AS BIGINT) AS rn
         |FROM ranked WHERE rn <= $TopK
         |ORDER BY q_id, rn""".stripMargin) { (s, dir) =>
      annIvfBuild(s, dir, nCells, nProbe)
    }
  }

  /** n109: metadata-FILTERED ANN serving — the production vector-search
    * shape the plain top-k entries don't cover: every query wants its
    * k nearest neighbors AMONG the vectors satisfying a metadata
    * predicate (here `label % 5 = 2`, ~20% of the corpus — the
    * "tenant/language/licence filter" of a real deployment). The
    * filter composes with the n13 IVF path as a PRE-filter: the
    * predicate lands on the candidate side before any distance work,
    * so the per-query cost is (selectivity · nprobe / ncells) of brute
    * force — not a post-filter that computes k-of-unfiltered and then
    * discards (which under-fills k and wastes every discarded
    * distance). Assignment under the unfiltered first-16 anchors is
    * per-vector, so filter-then-assign ≡ assign-then-filter; the entry
    * uses the cheaper order.
    *
    * Scale: at rest the label column lives IN the index rows
    * (cell-partitioned parquet carries label alongside the code), so
    * the predicate prunes at scan via row-group zone maps before the
    * rerank; the query side is a broadcast. The oracle re-derives
    * assignment + probes + filtered rerank from raw tables.
    *
    * Determinism: n13's exactly — round6'd cosines, (cos desc, nb_id)
    * total order. */
  val annIvfFiltered: Q = {
    val nCells = 16
    val nProbe = 4
    val filterWhere = "label % 5 = 2"
    def dot(a: String, b: String): String =
      s"list_sum(list_transform(generate_series(1, 64), " +
        s"i -> CAST($a.embedding[i] AS DOUBLE) * $b.embedding[i]))"
    Q(
      "n109_filtered_ann",
      s"""WITH e AS (SELECT vec_id, label, embedding,
         |                  sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
         |           FROM embeddings),
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
         |    FROM e CROSS JOIN c WHERE e.vec_id < $NumQueries) WHERE prn <= $nProbe),
         |pairs AS (SELECT p.q_id, a.vec_id AS nb_id,
         |                 ${round6Sql(s"${dot("qe", "ne")} / (qe.nrm * ne.nrm)")} AS cos
         |          FROM probes p
         |          JOIN asg a ON a.cell = p.cell AND a.vec_id <> p.q_id
         |          JOIN e ne ON ne.vec_id = a.vec_id
         |          JOIN e qe ON qe.vec_id = p.q_id),
         |ranked AS (SELECT q_id, nb_id, cos,
         |                  row_number() OVER (PARTITION BY q_id
         |                                     ORDER BY cos DESC, nb_id) AS rn
         |           FROM pairs)
         |SELECT q_id, nb_id, cos, CAST(rn AS BIGINT) AS rn
         |FROM ranked WHERE rn <= $TopK
         |ORDER BY q_id, rn""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).embeddings
      val cents = e.filter(col("vec_id") < nCells)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cv"))
      ivfSearch(e.filter(expr(filterWhere)), cents,
          e.filter(col("vec_id") < NumQueries), nProbe, TopK,
          useHeap = false)
        .orderBy("q_id", "rn")
    }
  }

  /** Lloyd-refined IVF centroids (spherical k-means): deterministic
    * init (first k vectors), then `iters` rounds of assign-by-cosine →
    * element-wise mean per cell. Each round: one broadcast assignment
    * pass + a (cell, pos) aggregation — no all-pairs anywhere; the
    * loop localCheckpoints per round (iterative-lineage rule).
    * Returns (cent_id, cv). Normalization is unnecessary — cosine
    * assignment is scale-invariant. */
  def ivfCentroids(vecs: DataFrame, k: Int, iters: Int = 3): DataFrame = {
    val cos = graft.functions.GraftFunctions.cosine_sim _
    // seed with the k smallest vec_ids (works for ANY id space, not
    // just dense 0-based ids)
    var cents = vecs.orderBy("vec_id").limit(k)
      .select(col("vec_id").as("cent_id"),
        col("embedding").cast("array<float>").as("cv"))
      .localCheckpoint()
    (1 to iters).foreach { _ =>
      // argmax by (csim desc, cent_id asc) as a max_by partial
      // aggregation — map-side combinable, no k-copies-of-the-embedding
      // window shuffle
      val assigned = vecs.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("embedding"), col("cent_id"),
          round6(cos(col("embedding"), col("cv"))).as("csim"))
        .groupBy("vec_id")
        .agg(max_by(struct(col("cent_id"), col("embedding")),
          struct(col("csim"), -col("cent_id"))).as("best"))
        .select(col("best.cent_id").as("cent_id"), col("best.embedding").as("embedding"))
      // element-wise EXACT mean per cell (decimal-cast sums — the float
      // fold would make centroids partition-order-dependent), then
      // reassemble in position order
      val refreshed = assigned
        .select(col("cent_id"), posexplode(col("embedding")))
        .groupBy("cent_id", "pos")
        // float → DOUBLE → decimal (round-4 hardening, found via n56):
        // Spark rounds a FLOAT's 9-digit shortest string to the decimal
        // scale, DuckDB rounds the binary value — boundary elements
        // disagree by one 1e-6 step and shift cell means by ~1e-8,
        // which round6 can surface on a .5-boundary. Rounding the same
        // DOUBLE (twin: CAST(x AS DOUBLE) first) removes the hazard.
        .agg((sum(col("col").cast("double").cast("decimal(25,6)")).cast("double") /
          count(lit(1))).as("m"))
        .groupBy("cent_id")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cent_id"),
          transform(col("pm"), s => s.getField("m")).cast("array<float>").as("cv"))
      // a cell that attracted no members keeps its previous centroid —
      // k must not silently shrink across iterations
      cents = cents.select(col("cent_id"), col("cv").as("prev"))
        .join(refreshed, Seq("cent_id"), "left")
        .select(col("cent_id"), coalesce(col("cv"), col("prev")).as("cv"))
        .localCheckpoint()
    }
    cents
  }

  /** IVF search against a given centroid set (assignment + probes +
    * exact re-rank inside probed cells). `excludeSelf` as in
    * [[cosineTopK]] — keep the default only when query ids live in the
    * corpus id space. */
  def ivfSearch(e: DataFrame, cents: DataFrame, queries: DataFrame,
      nProbe: Int, k: Int, excludeSelf: Boolean = true,
      useHeap: Boolean = true): DataFrame =
    rerank(probeCells(queries, cents, nProbe)
      .join(assignCells(e, cents), Seq("cell")), k, excludeSelf, useHeap)

  /** Cell assignment (vec_id, embedding, cell): each vector to its
    * best centroid by rounded cosine, (csim desc, cent_id) tiebreak.
    * The corpus half of [[ivfSearch]], shared with the persisted-index
    * path ([[IncrementalAnn]]) so assignment semantics cannot drift. */
  private[graft] def assignCells(e: DataFrame, cents: DataFrame): DataFrame = {
    val cos = graft.functions.GraftFunctions.cosine_sim _
    val wAssign = Window.partitionBy("vec_id")
      .orderBy(col("csim").desc, col("cent_id"))
    e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cent_id"),
        round6(cos(col("embedding"), col("cv"))).as("csim"))
      .withColumn("arn", row_number().over(wAssign))
      .filter(col("arn") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"))
  }

  /** Probe selection (q_id, qv, cell): each query's nProbe best cells.
    * The query half of [[ivfSearch]]. */
  private[operators] def probeCells(queries: DataFrame, cents: DataFrame,
      nProbe: Int): DataFrame = {
    val cos = graft.functions.GraftFunctions.cosine_sim _
    val wProbe = Window.partitionBy("q_id")
      .orderBy(col("psim").desc, col("cent_id"))
    queries
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      .crossJoin(broadcast(cents))
      .select(col("q_id"), col("qv"), col("cent_id"),
        round6(cos(col("qv"), col("cv"))).as("psim"))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= nProbe)
      .select(col("q_id"), col("qv"), col("cent_id").as("cell"))
  }

  private def annIvfBuild(s: SparkSession, dir: String,
      nCells: Int, nProbe: Int): DataFrame = {
    // the catalog path IS the public library path: raw first-nCells
    // anchors (the oracle-locked configuration) through ivfSearch
    val e = Tables(s, dir).embeddings
    val cents = e.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cv"))
    ivfSearch(e, cents, e.filter(col("vec_id") < NumQueries), nProbe, TopK,
      useHeap = false)
  }

  /** DuckDB twin fragments of the [[ivfCentroids]] Lloyd loop, shared
    * by n16 (k-means IVF search) and n48 (SemDeDup) so the oracle-side
    * k-means definition exists exactly once and cannot drift between
    * the two entries. [[prefix]] yields the CTE chain
    * `e, c0, c1..cIters, cns, asgF` where `asgF` is every vector's
    * final (vec_id, cell) assignment; callers append their own CTEs. */
  private[operators] object LloydSql {
    val Dim = 64
    def dotE(a: String, b: String): String =
      s"list_sum(list_transform(generate_series(1, $Dim), " +
        s"i -> CAST($a.embedding[i] AS DOUBLE) * $b.embedding[i]))"
    def dotCv(e: String, c: String): String =
      s"list_sum(list_transform(generate_series(1, $Dim), " +
        s"i -> CAST($e.embedding[i] AS DOUBLE) * $c.cv[i]))"
    // one Lloyd round: assign every vector to its best cell by rounded
    // cosine against c$p's centroids, re-average element-wise with
    // exact decimal sums, float-cast, carry empty cells forward
    private def round(r: Int, p: String): String =
      s"""cn$r AS (SELECT cent_id, cv,
         |              sqrt(list_sum(list_transform(cv, x -> CAST(x AS DOUBLE) * x))) AS cnrm
         |       FROM $p),
         |asg$r AS (SELECT vec_id, cell FROM (
         |    SELECT e.vec_id, cn.cent_id AS cell,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${round6Sql(s"${dotCv("e", "cn")} / (e.nrm * cn.cnrm)")} DESC,
         |                      cn.cent_id) AS arn
         |    FROM e CROSS JOIN cn$r cn) WHERE arn = 1),
         |m$r AS (SELECT a.cell AS cent_id, dims.i,
         |             CAST(sum(CAST(CAST(e.embedding[dims.i] AS DOUBLE) AS DECIMAL(25,6))) AS DOUBLE)
         |               / count(*) AS m
         |      FROM asg$r a JOIN e ON e.vec_id = a.vec_id
         |      CROSS JOIN (SELECT unnest(generate_series(1, $Dim)) AS i) dims
         |      GROUP BY a.cell, dims.i),
         |cv$r AS (SELECT cent_id, list(CAST(m AS REAL) ORDER BY i) AS cv
         |       FROM m$r GROUP BY cent_id),
         |c$r AS (SELECT p.cent_id, coalesce(n.cv, p.cv) AS cv
         |      FROM c${r - 1} p LEFT JOIN cv$r n USING (cent_id))""".stripMargin
    def prefix(nCells: Int, iters: Int): String =
      s"""e AS (SELECT vec_id, embedding,
         |                  sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
         |           FROM embeddings),
         |c0 AS (SELECT vec_id AS cent_id, embedding AS cv
         |       FROM embeddings ORDER BY vec_id LIMIT $nCells),
         |${(1 to iters).map(r => round(r, s"c${r - 1}")).mkString(",\n")},
         |cns AS (SELECT cent_id, cv,
         |               sqrt(list_sum(list_transform(cv, x -> CAST(x AS DOUBLE) * x))) AS cnrm
         |        FROM c$iters),
         |asgF AS (SELECT vec_id, cell FROM (
         |    SELECT e.vec_id, cn.cent_id AS cell,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${round6Sql(s"${dotCv("e", "cn")} / (e.nrm * cn.cnrm)")} DESC,
         |                      cn.cent_id) AS arn
         |    FROM e CROSS JOIN cns cn) WHERE arn = 1)""".stripMargin
  }

  /** K-MEANS-REFINED IVF, hash-oracled end to end (DECISIONS.md #3):
    * the full [[ivfCentroids]] Lloyd loop (2 rounds here) AND the
    * probe/re-rank both have DuckDB twins, so the refined approximate
    * pipeline — seeding, per-round round6-cosine assignment,
    * decimal-exact element means, float-cast centroids, empty-cell
    * carry-over, probing, final re-rank — is hash-checked, not just
    * rows-checked. Every arithmetic step is portable: decimal sums are
    * exact, float/double casts are IEEE round-to-nearest in both
    * engines, and decimal-rounding ties are unreachable for binary
    * floats at scale 6 (a tie needs d.dddddd5 exactly, which no
    * m/2^e value can hit). */
  val annIvfKmeans: Q = {
    val nCells = 16
    val nProbe = 4
    val iters = 2
    def dot(a: String, b: String): String = LloydSql.dotE(a, b)
    def dotCv(e: String, c: String): String = LloydSql.dotCv(e, c)
    Q(
      "n16_ann_ivf_kmeans",
      s"""WITH ${LloydSql.prefix(nCells, iters)},
         |probes AS (SELECT q_id, cell FROM (
         |    SELECT e.vec_id AS q_id, cn.cent_id AS cell,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${round6Sql(s"${dotCv("e", "cn")} / (e.nrm * cn.cnrm)")} DESC,
         |                      cn.cent_id) AS prn
         |    FROM e CROSS JOIN cns cn WHERE e.vec_id < $NumQueries) WHERE prn <= $nProbe),
         |pairs AS (SELECT p.q_id, a.vec_id AS nb_id,
         |                 ${round6Sql(s"${dot("qe", "ne")} / (qe.nrm * ne.nrm)")} AS cos
         |          FROM probes p
         |          JOIN asgF a ON a.cell = p.cell AND a.vec_id <> p.q_id
         |          JOIN e ne ON ne.vec_id = a.vec_id
         |          JOIN e qe ON qe.vec_id = p.q_id),
         |ranked AS (SELECT q_id, nb_id, cos,
         |                  row_number() OVER (PARTITION BY q_id
         |                                     ORDER BY cos DESC, nb_id) AS rn
         |           FROM pairs)
         |SELECT q_id, nb_id, cos, CAST(rn AS BIGINT) AS rn
         |FROM ranked WHERE rn <= $TopK
         |ORDER BY q_id, rn""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).embeddings
      val cents = ivfCentroids(e, k = nCells, iters = iters)
      ivfSearch(e, cents, e.filter(col("vec_id") < NumQueries), nProbe, TopK,
        useHeap = false)
        .orderBy("q_id", "rn")
    }
  }

  /** Int8 vector quantization — the storage-scale trick (4× smaller
    * embeddings): per-vector symmetric scale s = max|x|/127, code_i =
    * floor(x_i/s·? + 0.5) (portable round), plus the dequantized-vs-
    * exact self-cosine as a per-row quality measure. Codes are emitted
    * as a CSV string (the driver's checker cannot lexsort raw arrays);
    * the library path would keep array<tinyint>. Everything is exact
    * IEEE arithmetic both engines compute identically. */
  val vectorQuantize: Q = Q(
    "n14_vector_quantize",
    s"""WITH e AS (SELECT vec_id, embedding,
       |                  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS s
       |           FROM embeddings),
       |q AS (SELECT vec_id, embedding, s,
       |             list_transform(embedding,
       |               x -> CAST(floor(CAST(x AS DOUBLE) / s + 0.5) AS BIGINT)) AS code
       |      FROM e)
       |SELECT vec_id, ${round6Sql("s")} AS scale,
       |       array_to_string(code, ';') AS code_csv,
       |       ${round6Sql(
            "list_sum(list_transform(generate_series(1, 64), i -> CAST(embedding[i] AS DOUBLE) * (code[i] * s)))" +
            " / (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x)))" +
            "  * sqrt(list_sum(list_transform(code, c -> (c * s) * (c * s)))))")} AS dequant_cos
       |FROM q
       |ORDER BY vec_id""".stripMargin) { (s, dir) =>
    val e = Tables(s, dir).embeddings
      .withColumn("s",
        aggregate(transform(col("embedding"), x => abs(x.cast("double"))),
          lit(0.0), (acc, v) => greatest(acc, v)) / 127.0)
      .withColumn("code",
        transform(col("embedding"),
          v => floor(v.cast("double") / col("s") + 0.5).cast("long")))
    val deq = transform(col("code"), c => c * col("s"))
    e.select(
      col("vec_id"),
      round6(col("s")).as("scale"),
      array_join(col("code").cast("array<string>"), ";").as("code_csv"),
      round6(
        aggregate(zip_with(col("embedding"), deq, (a, b) => a.cast("double") * b),
          lit(0.0), (acc, v) => acc + v) /
        (sqrt(aggregate(transform(col("embedding"), v => v.cast("double") * v),
          lit(0.0), (acc, v) => acc + v)) *
         sqrt(aggregate(transform(deq, v => v * v),
           lit(0.0), (acc, v) => acc + v)))).as("dequant_cos"))
      .orderBy("vec_id")
  }

  /** Top-k search OVER THE INT8 CODES (the memory-bound serving path:
    * 4× less traffic than float vectors): per-vector scales cancel out
    * of the cosine, so the whole similarity is exact integer
    * arithmetic through the codegen'd quantized_cos expression and
    * even this approximate-representation search is hash-oracled.
    * SimilaritySpec measures its recall vs the exact float top-k. */
  val quantizedTopK: Q = {
    val codeSql =
      "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) / s + 0.5) AS BIGINT))"
    val dot = "CAST(list_sum(list_transform(generate_series(1, 64), " +
      "i -> a.code[i] * b.code[i])) AS DOUBLE)"
    def nrm(side: String) =
      s"sqrt(CAST(list_sum(list_transform($side.code, c -> c * c)) AS DOUBLE))"
    Q(
      "n15_quantized_topk",
      s"""WITH e AS (SELECT vec_id, embedding,
         |                  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS s
         |           FROM embeddings),
         |q AS (SELECT vec_id, $codeSql AS code FROM e),
         |pairs AS (SELECT a.vec_id AS q_id, b.vec_id AS nb_id,
         |                 ${round6Sql(s"$dot / (${nrm("a")} * ${nrm("b")})")} AS cos
         |          FROM q a CROSS JOIN q b
         |          WHERE a.vec_id < $NumQueries AND a.vec_id <> b.vec_id),
         |ranked AS (SELECT q_id, nb_id, cos,
         |                  row_number() OVER (PARTITION BY q_id
         |                                     ORDER BY cos DESC, nb_id) AS rn
         |           FROM pairs)
         |SELECT q_id, nb_id, cos, CAST(rn AS BIGINT) AS rn
         |FROM ranked WHERE rn <= $TopK
         |ORDER BY q_id, rn""".stripMargin) { (s, dir) =>
      val codes = Tables(s, dir).embeddings
        .withColumn("s",
          aggregate(transform(col("embedding"), x => abs(x.cast("double"))),
            lit(0.0), (acc, v) => greatest(acc, v)) / 127.0)
        .select(col("vec_id"),
          transform(col("embedding"),
            v => floor(v.cast("double") / col("s") + 0.5).cast("long")).as("code"))
      val q = codes.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("code").as("qcode"))
      val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("nb_id"))
      codes.crossJoin(broadcast(q))
        .filter(col("q_id") =!= col("vec_id"))
        .select(col("q_id"), col("vec_id").as("nb_id"),
          round6(graft.functions.GraftFunctions.quantized_cos(col("qcode"), col("code")))
            .as("cos"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= TopK)
        .orderBy("q_id", "rn")
    }
  }

  /** Mean-pool member vectors into one vector per group — the
    * chunk-embeddings→document-embedding aggregation every embedding
    * pipeline runs between the n72 chunker and doc-level ANN/dedup
    * (and the long-context recipe: embed windows, pool, index once).
    *
    * Determinism without DECIMAL: components fold SEQUENTIALLY in
    * `orderCol` order inside one collect_list aggregate — a left fold
    * over a sorted array is the same IEEE addition sequence in Spark's
    * `aggregate` and DuckDB's list_sum over an ORDER BY'd array_agg,
    * so the pooled values are bit-identical with no precision
    * sacrifice (the per-component DECIMAL alternative would truncate
    * float mantissas). round6 applies only to the reported scalars.
    *
    * Scale: one groupBy; per-group state is the member list (chunks
    * per document — bounded by document length, the n81 rebuild
    * argument). The fold and all derived stats are map-side
    * expressions after the aggregate.
    *
    * Precondition (ADVICE r09): every member of a group must have the
    * SAME dimension — zip_with against the first member's length would
    * otherwise null-pad and silently null-poison the pooled vector.
    * Enforced loudly: the min/max member dimension is aggregated
    * alongside the list (two cheap scalars) and a ragged group raises
    * inside the pooling expression itself (not a prunable side
    * column), so bad input fails the job instead of corrupting it. */
  def meanPoolEmbeddings(vectors: DataFrame, groupCol: String,
      orderCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    vectors
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_vecs"),
        min(size(col(vecCol))).as("__dmin"),
        max(size(col(vecCol))).as("__dmax"),
        array_sort(collect_list(struct(col(orderCol), col(vecCol).as("v"))))
          .as("__vs"))
      .withColumn("pooled", expr(
        s"""transform(
           |  aggregate(
           |    CASE WHEN __dmin = __dmax THEN __vs
           |         ELSE raise_error(format_string(
           |           'meanPoolEmbeddings: ragged member dimensions %d vs %d in a group',
           |           __dmin, __dmax)) END,
           |    array_repeat(0.0D, size(__vs[0].v)),
           |    (acc, x) -> zip_with(acc, x.v, (a, b) -> a + CAST(b AS DOUBLE))),
           |  s -> s / n_vecs)""".stripMargin))
      .drop("__vs", "__dmin", "__dmax")

  /** Chunks-per-group for the n87 harness entry (vec_id div 4 — the
    * stand-in for a 4-chunk document). */
  val PoolGroup = 4

  val embeddingPool: Q = Q(
    "n87_embedding_pool",
    s"""WITH g AS (SELECT vec_id // $PoolGroup AS group_id, vec_id, embedding
       |          FROM embeddings),
       |a AS (SELECT group_id, count(*) AS n_vecs,
       |             array_agg(embedding ORDER BY vec_id) AS embs
       |      FROM g GROUP BY group_id),
       |p AS (SELECT group_id, n_vecs,
       |             list_transform(generate_series(1, len(embs[1])),
       |               i -> list_sum(list_transform(embs, e -> CAST(e[i] AS DOUBLE)))
       |                    / n_vecs) AS m
       |      FROM a)
       |SELECT CAST(group_id AS BIGINT) AS group_id,
       |       CAST(n_vecs AS BIGINT) AS n_vecs,
       |       ${round6Sql("sqrt(list_sum(list_transform(m, x -> x * x)))")} AS pooled_norm,
       |       ${round6Sql("list_sum(m)")} AS pooled_sum,
       |       ${round6Sql("list_aggregate(m, 'min')")} AS pooled_min,
       |       ${round6Sql("list_aggregate(m, 'max')")} AS pooled_max
       |FROM p
       |ORDER BY group_id""".stripMargin) { (s, dir) =>
    meanPoolEmbeddings(
      Tables(s, dir).embeddings
        .select(expr(s"vec_id div $PoolGroup").as("group_id"),
          col("vec_id"), col("embedding")),
      "group_id")
      .select(col("group_id"), col("n_vecs").cast("long").as("n_vecs"),
        round6(sqrt(expr("aggregate(pooled, 0.0D, (a, x) -> a + x * x)")))
          .as("pooled_norm"),
        round6(expr("aggregate(pooled, 0.0D, (a, x) -> a + x)")).as("pooled_sum"),
        round6(array_min(col("pooled"))).as("pooled_min"),
        round6(array_max(col("pooled"))).as("pooled_max"))
      .orderBy("group_id")
  }

  /** Per-dimension drift between two embedding corpora (the general
    * two-frame form of n103, exposed on the API facade): one
    * union-tagged explode + one grouped aggregation — a single
    * shuffle regardless of corpus sizes. Means use the DECIMAL-exact
    * distributed-sum ladder, so the output is partition-order
    * independent. Returns (dim, mean_base, mean_cur, drift) ordered
    * by dim. The n103 catalog entry keeps its one-pass CASE form
    * (exploits the row-aligned edit to scan once); SimilaritySpec
    * pins the two forms equal on that input. */
  def embeddingDrift(base: DataFrame, current: DataFrame): DataFrame = {
    def sided(df: DataFrame, side: Int) =
      df.select(posexplode(col("embedding")))
        .select((col("pos") + 1).cast("long").as("dim"),
          col("col").cast("double").as("x"), lit(side).as("side"))
    def sideMean(side: Int): Column =
      sum(when(col("side") === side, col("x")).cast("decimal(25,6)"))
        .cast("double") / count(when(col("side") === side, lit(1)))
    sided(base, 0).unionByName(sided(current, 1))
      .groupBy("dim")
      .agg(round6(sideMean(0)).as("mean_base"),
        round6(sideMean(1)).as("mean_cur"),
        round6(sideMean(1) - sideMean(0)).as("drift"))
      .orderBy("dim")
  }

  /** n103: per-dimension embedding-drift monitor — the statistical
    * "when to retrain" trigger for the ANN index family (n102 is the
    * repair; n104 is the structural twin on the index side). Compares
    * each dimension's mean between the base corpus and the post-upsert
    * drifted corpus (Pq's shared edit: ≡ 5 (mod 8) non-query vectors
    * negated) in ONE scan: explode once, carry (base, current) as two
    * columns per element, aggregate both per dimension. Means use the
    * DECIMAL-exact distributed-sum ladder (order-independent — the
    * partition-invariance requirement for any float agg), so base,
    * current and their difference are bit-identical in both engines
    * before the portable rounding.
    *
    * Scale: one map-side explode + one 64-group aggregation — the
    * cheapest possible full-corpus pass; at 100 TB this runs as a
    * scheduled audit whose output (64 rows) feeds the retrain
    * decision. A production deployment would compute it per ingest
    * batch and compare against the index's training-time snapshot of
    * the same statistics. */
  val embeddingDriftQ: Q = Q(
    "n103_embedding_drift",
    s"""WITH ex AS (SELECT e.vec_id, d.i AS pos,
       |                   CAST(e.embedding[d.i] AS DOUBLE) AS x,
       |                   CASE WHEN ${Pq.DriftEditWhere}
       |                        THEN -CAST(e.embedding[d.i] AS DOUBLE)
       |                        ELSE CAST(e.embedding[d.i] AS DOUBLE) END AS cur
       |            FROM embeddings e
       |            CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) d)
       |SELECT CAST(pos AS BIGINT) AS dim,
       |       ${round6Sql(davgSql("x"))} AS mean_base,
       |       ${round6Sql(davgSql("cur"))} AS mean_cur,
       |       ${round6Sql(s"${davgSql("cur")} - ${davgSql("x")}")} AS drift
       |FROM ex GROUP BY pos
       |ORDER BY dim""".stripMargin) { (s, dir) =>
    Tables(s, dir).embeddings
      .select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("dim"),
        col("col").cast("double").as("x"))
      .withColumn("cur", when(Pq.driftEditPred, -col("x")).otherwise(col("x")))
      .groupBy("dim")
      .agg(round6(davg(col("x"))).as("mean_base"),
        round6(davg(col("cur"))).as("mean_cur"),
        round6(davg(col("cur")) - davg(col("x"))).as("drift"))
      .orderBy("dim")
  }

  /** Per-dimension PSI between two embedding corpora (the general
    * two-frame form of n107, exposed on the API facade — the same
    * relationship [[embeddingDrift]] has to n103): one union-tagged
    * explode + one (dim × bin) aggregation + one 12-term fold per
    * dimension — a single shuffle regardless of corpus sizes. Bins,
    * smoothing and rounding are identical to the catalog entry's
    * (SimilaritySpec pins the two forms equal on the canonical
    * edits). Returns (dim, psi) ordered by dim. */
  def psiDrift(base: DataFrame, current: DataFrame): DataFrame = {
    val NB = 12
    def bin(c: Column): Column =
      least(greatest(floor((c + 1.0) / 0.25).cast("long"), lit(0L)),
        lit((NB - 1).toLong))
    def sided(df: DataFrame, side: Int) =
      df.select(posexplode(col("embedding")))
        .select((col("pos") + 1).cast("long").as("dim"),
          bin(col("col").cast("double")).as("bin"), lit(side).as("side"))
    val cnt = sided(base, 0).unionByName(sided(current, 1))
      .groupBy("dim", "bin").agg(
        count(when(col("side") === 0, 1)).as("c0"),
        count(when(col("side") === 1, 1)).as("c1"))
    val n0 = base.agg(count(lit(1)).cast("double").as("n0"))
    val n1 = current.agg(count(lit(1)).cast("double").as("n1"))
    val half = NB / 2.0
    cnt.crossJoin(broadcast(n0)).crossJoin(broadcast(n1))
      .select(col("dim"),
        ((col("c0") + 0.5) / (col("n0") + half)).as("p0"),
        ((col("c1") + 0.5) / (col("n1") + half)).as("p1"))
      .select(col("dim"),
        round6((col("p1") - col("p0")) * log(col("p1") / col("p0"))).as("t"))
      .groupBy("dim").agg(dsum(col("t")).as("psi"))
      .orderBy("dim")
  }

  /** n107: per-dimension POPULATION-STABILITY-INDEX drift monitor — the
    * histogram-shaped companion to n103's mean-drift trigger. PSI
    * (the standard model-monitoring statistic: Σ_bins (p_cur − p_ref) ·
    * ln(p_cur / p_ref) over a fixed binning, Laplace-smoothed so empty
    * bins are defined) sees DISTRIBUTION-shape changes a mean can
    * cancel. The entry computes it for BOTH canonical corpus edits in
    * one pass — the ≡5 (mod 8) negation re-embed (n100/n102's edit)
    * and the ≡2 (mod 3) +1.0 covariate shift (st18's edit) — and the
    * result attests the round-12 trigger-statistic lesson numerically:
    * the negation edit moves mass between mirror-image bins of a
    * near-symmetric distribution (small PSI), while the shift relocates
    * an eighth of the mass four bins to the right (PSI orders of
    * magnitude larger). A production deployment would alarm on
    * PSI > 0.2 (the conventional band) per dimension.
    *
    * Determinism: bin ids are floor((x+1)/0.25) clamped to [0,11] —
    * exact IEEE per-row ops, identical in both engines; counts are
    * integers; smoothed proportions (c+0.5)/(N+6) and the ln-ratio
    * terms are per-row IEEE math round6'd BEFORE the DECIMAL-exact
    * distributed sum (the n83 pattern), so the 12-term per-dim sum is
    * partition-order independent.
    *
    * Scale: one posexplode + one 3-way side explode (map-side, no
    * duplication of the corpus at rest) into a (dim × bin)-sized
    * aggregation — 64·12 groups regardless of corpus size; the corpus
    * total is a broadcast 1-row agg. The cheapest always-on audit
    * shape, same class as n103. */
  val psiDriftQ: Q = {
    val NB = 12
    def binSql(x: String): String =
      s"LEAST(GREATEST(CAST(floor((($x) + 1.0) / 0.25) AS BIGINT), 0), ${NB - 1})"
    Q(
      "n107_psi_drift",
      s"""WITH ex AS (SELECT e.vec_id, d.i AS pos,
         |                   CAST(e.embedding[d.i] AS DOUBLE) AS x
         |            FROM embeddings e
         |            CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) d),
         |sides AS (
         |  SELECT pos, 0 AS side, ${binSql("x")} AS bin FROM ex
         |  UNION ALL
         |  SELECT pos, 1,
         |         ${binSql(s"CASE WHEN ${Pq.DriftEditWhere} THEN -x ELSE x END")}
         |  FROM ex
         |  UNION ALL
         |  SELECT pos, 2,
         |         ${binSql(s"CASE WHEN ${Pq.ShiftEditWhere} THEN x + 1.0 ELSE x END")}
         |  FROM ex),
         |cnt AS (SELECT pos, bin,
         |               count(*) FILTER (WHERE side = 0) AS c0,
         |               count(*) FILTER (WHERE side = 1) AS c1,
         |               count(*) FILTER (WHERE side = 2) AS c2
         |        FROM sides GROUP BY pos, bin),
         |nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings),
         |pr AS (SELECT pos, bin,
         |              (c0 + 0.5) / (n + ${NB / 2}.0) AS p0,
         |              (c1 + 0.5) / (n + ${NB / 2}.0) AS p1,
         |              (c2 + 0.5) / (n + ${NB / 2}.0) AS p2
         |       FROM cnt CROSS JOIN nv),
         |longt AS (
         |  SELECT pos, 'negate' AS edit,
         |         ${round6Sql("(p1 - p0) * ln(p1 / p0)")} AS t FROM pr
         |  UNION ALL
         |  SELECT pos, 'shift', ${round6Sql("(p2 - p0) * ln(p2 / p0)")} FROM pr)
         |SELECT edit, CAST(pos AS BIGINT) AS dim, ${dsumSql("t")} AS psi
         |FROM longt GROUP BY edit, pos
         |ORDER BY edit, dim""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).embeddings
      def bin(c: Column): Column =
        least(greatest(floor((c + 1.0) / 0.25).cast("long"), lit(0L)),
          lit((NB - 1).toLong))
      val ex = e.select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), (col("pos") + 1).cast("long").as("dim"),
          col("col").cast("double").as("x"))
      val sides = ex.select(col("dim"), explode(array(
          struct(lit(0L).as("side"), bin(col("x")).as("bin")),
          struct(lit(1L).as("side"),
            bin(when(Pq.driftEditPred, -col("x")).otherwise(col("x"))).as("bin")),
          struct(lit(2L).as("side"),
            bin(when(expr(Pq.ShiftEditWhere), col("x") + 1.0)
              .otherwise(col("x"))).as("bin")))).as("sb"))
        .select(col("dim"), col("sb.side").as("side"), col("sb.bin").as("bin"))
      val cnt = sides.groupBy("dim", "bin").agg(
        count(when(col("side") === 0, 1)).as("c0"),
        count(when(col("side") === 1, 1)).as("c1"),
        count(when(col("side") === 2, 1)).as("c2"))
      val nv = e.agg(count(lit(1)).cast("double").as("n"))
      val half = NB / 2.0
      val pr = cnt.crossJoin(broadcast(nv)).select(col("dim"),
        ((col("c0") + 0.5) / (col("n") + half)).as("p0"),
        ((col("c1") + 0.5) / (col("n") + half)).as("p1"),
        ((col("c2") + 0.5) / (col("n") + half)).as("p2"))
      pr.select(col("dim"), explode(array(
          struct(lit("negate").as("edit"),
            round6((col("p1") - col("p0")) * log(col("p1") / col("p0"))).as("t")),
          struct(lit("shift").as("edit"),
            round6((col("p2") - col("p0")) * log(col("p2") / col("p0"))).as("t"))))
          .as("et"))
        .select(col("dim"), col("et.edit").as("edit"), col("et.t").as("t"))
        .groupBy("edit", "dim").agg(dsum(col("t")).as("psi"))
        .orderBy("edit", "dim")
    }
  }

  /** Dimension-truncation recall sweep (the Matryoshka serving audit,
    * Kusupati et al. 2022 shape): re-rank the n10 query set using only
    * the FIRST d dimensions and measure top-k overlap against the
    * full-dimension ranking — the measurement that picks how many
    * dims a serving index actually stores. Mirrors n70's probe-count
    * recall sweep on the other cost axis (dims instead of cells).
    *
    * Scale: each level is one n10-shaped broadcast-query pass over
    * d-sliced vectors (slice happens in the scan stage — a d-dim
    * level reads d/64 of the vector bytes once at rest is truncated);
    * the overlap join is per-(query, k) — bounded by |Q|·k rows. */
  def truncationRecall(vectors: DataFrame, queries: DataFrame,
      dims: Seq[Int], k: Int): DataFrame = {
    def sliced(df: DataFrame, d: Int) =
      df.select(col("vec_id"), slice(col("embedding"), 1, d).as("embedding"))
    val full = cosineTopK(vectors, queries, k, useHeap = true)
      .select(col("q_id"), col("nb_id"))
    val qIds = queries.select(col("vec_id").as("q_id")).distinct()
    dims.map { d =>
      val top = cosineTopK(sliced(vectors, d), sliced(queries, d), k, useHeap = true)
        .select(col("q_id"), col("nb_id"))
      val hits = top.join(full, Seq("q_id", "nb_id"))
        .groupBy("q_id").agg(count(lit(1)).as("n_hit"))
      qIds.join(hits, Seq("q_id"), "left")
        .select(lit(d.toLong).as("dims"), col("q_id"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          (coalesce(col("n_hit"), lit(0L)).cast("double") / k).as("recall"))
    }.reduce(_.unionByName(_))
  }

  /** Truncation levels for the n88 harness entry (full width last —
    * its recall 1.0 row is the sweep's self-check). */
  val TruncDims = Seq(8, 16, 64)

  val truncationRecallQ: Q = {
    def rankedSql(d: Int, name: String) =
      s"""e$name AS (SELECT vec_id, embedding[1:$d] AS emb FROM embeddings),
         |n$name AS (SELECT vec_id, emb,
         |                  sqrt(list_sum(list_transform(emb, x -> CAST(x AS DOUBLE) * x))) AS nrm
         |           FROM e$name),
         |q$name AS (SELECT * FROM n$name WHERE vec_id < $NumQueries),
         |p$name AS (SELECT q.vec_id AS q_id, e.vec_id AS nb_id,
         |                  ${round6Sql(
                "list_sum(list_transform(generate_series(1, len(q.emb)), " +
                "i -> CAST(q.emb[i] AS DOUBLE) * e.emb[i])) / (q.nrm * e.nrm)")} AS cos
         |           FROM q$name q CROSS JOIN n$name e
         |           WHERE q.vec_id <> e.vec_id),
         |r$name AS (SELECT q_id, nb_id,
         |                  row_number() OVER (PARTITION BY q_id
         |                                     ORDER BY cos DESC, nb_id) AS rn
         |           FROM p$name)""".stripMargin
    val levels = TruncDims.map(d => d -> s"d$d")
    Q(
      "n88_truncation_recall",
      s"""WITH ${(rankedSql(64, "full") +: levels.map { case (d, nm) => rankedSql(d, nm) })
             .mkString(",\n")},
         |full_top AS (SELECT q_id, nb_id FROM rfull WHERE rn <= $TopK),
         |${levels.map { case (d, nm) =>
             s"""h$nm AS (SELECT t.q_id, count(*) AS n_hit
                |         FROM (SELECT q_id, nb_id FROM r$nm WHERE rn <= $TopK) t
                |         JOIN full_top f ON f.q_id = t.q_id AND f.nb_id = t.nb_id
                |         GROUP BY t.q_id)""".stripMargin
           }.mkString(",\n")}
         |${levels.map { case (d, nm) =>
             s"""SELECT CAST($d AS BIGINT) AS dims, q.q_id,
                |       CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
                |       CAST(coalesce(h.n_hit, 0) AS DOUBLE) / $TopK AS recall
                |FROM (SELECT DISTINCT q_id FROM full_top) q
                |LEFT JOIN h$nm h ON h.q_id = q.q_id""".stripMargin
           }.mkString("\nUNION ALL\n")}
         |ORDER BY dims, q_id""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).embeddings
      truncationRecall(e, e.filter(col("vec_id") < NumQueries), TruncDims, TopK)
        .orderBy("dims", "q_id")
    }
  }

  // ---------------------------------------------------------------------
  // n90: hybrid retrieval fusion (Reciprocal Rank Fusion — Cormack,
  // Clarke & Buettcher 2009). The curation use: near-dup/contamination
  // hunting and targeted selection both run a LEXICAL ranking (shingle
  // Jaccard) and a SEMANTIC one (embedding cosine) — RRF is the
  // standard rank-level fusion that needs no score calibration between
  // the two systems (scores live on incomparable scales; ranks don't).
  // ---------------------------------------------------------------------

  /** Per-system depth fused, and the fused list depth. */
  val HybridDepth = 20
  val HybridOut = 10
  /** The standard RRF dampening constant (k = 60 in the paper). */
  val RrfK = 60

  /** RRF-fuse two (q_id, cand, r) rankings: score = Σ 1/(RrfK + r)
    * over the systems that ranked the candidate (absent system = no
    * contribution — the paper's convention). The two-term sum is a
    * fixed-order double addition, deterministic in both engines;
    * ranking ties break by candidate id. */
  def rrfFuse(lexRank: DataFrame, semRank: DataFrame, out: Int): DataFrame = {
    val fused = lexRank.select(col("q_id"), col("cand"), col("r").as("__rl"))
      .join(semRank.select(col("q_id"), col("cand"), col("r").as("__rs")),
        Seq("q_id", "cand"), "full_outer")
      .select(col("q_id"), col("cand"),
        round6(
          coalesce(lit(1.0) / (lit(RrfK) + col("__rl")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(RrfK) + col("__rs")), lit(0.0))).as("rrf"))
    val w = Window.partitionBy("q_id").orderBy(col("rrf").desc, col("cand"))
    fused.withColumn("rrf_rank", row_number().over(w).cast("long"))
      .filter(col("rrf_rank") <= out)
  }

  /** DuckDB twin for TAKEDOWN-AWARE HYBRID serving (st23's batch
    * twin): one branch per snapshot, each RRF-fusing a BM25 top-`lexK`
    * over the LIVE joined corpus with an IVF-PQ top-k over the live
    * candidates under the batch-0-trained frozen configuration, plus
    * the shared `n_dead` ops-log evidence — the cross-index liveness
    * consistency claim in hash form: if either arm's takedown leaks
    * (a dead doc still ranking lexically, or still surfacing as an
    * ANN neighbor), the fused list moves and the hash flips. `snaps`:
    * (live, dead) predicates over `vec_id`; the lexical corpus is the
    * same predicate over `doc_id` (the id bridge) restricted to ids
    * present in `embeddings` — the joined corpus both indexes
    * ingest. */
  /** The fused-serving SQL body shared by the hybrid-takedown twins
    * (st23 and st26): BM25 top-`lexK` over the LIVE joined corpus
    * RRF-fused with the frozen-config IVF-PQ top-k over the live
    * candidates. One definition so the two lanes' oracles cannot
    * drift. */
  private def hybridFusedSqlBody(live: String, trainWhere: String,
      lexK: Int, out: Int): String = {
    val qIds = TextAnalysis.bm25QuerySet.map(_._1).distinct.sorted
      .mkString(", ")
    val liveDoc = live.replace("vec_id", "doc_id")
    s"""WITH lexk AS (SELECT q_id, doc_id AS cand, rank AS r FROM (
       |${LexIndex.bm25SqlCore(lexK,
          "SELECT doc_id, text FROM documents WHERE doc_id IN " +
            s"(SELECT vec_id FROM embeddings) AND ($liveDoc)")}
       |)),
       |semk AS (SELECT q_id, nb_id AS cand, rn AS r FROM (
       |${Pq.ivfPqIndexSqlCore(live, "embeddings", trainWhere, "embeddings")}
       |) WHERE q_id IN ($qIds)),
       |fused AS (SELECT COALESCE(l.q_id, s.q_id) AS q_id,
       |                 COALESCE(l.cand, s.cand) AS cand,
       |                 ${round6Sql(
          s"COALESCE(1.0 / ($RrfK + l.r), 0) + COALESCE(1.0 / ($RrfK + s.r), 0)")} AS rrf
       |          FROM lexk l FULL JOIN semk s
       |            ON s.q_id = l.q_id AND s.cand = l.cand)
       |SELECT q_id, cand, rrf, CAST(rrf_rank AS BIGINT) AS rrf_rank FROM (
       |  SELECT q_id, cand, rrf,
       |         row_number() OVER (PARTITION BY q_id
       |                            ORDER BY rrf DESC, cand) AS rrf_rank
       |  FROM fused) WHERE rrf_rank <= $out""".stripMargin
  }

  private[graft] def hybridTakedownSnapshotSql(
      snaps: Seq[(String, String)], trainWhere: String,
      lexK: Int, out: Int): String = {
    val branches = snaps.zipWithIndex.map { case ((live, dead), i) =>
      s"""SELECT CAST($i AS BIGINT) AS snap,
         |  CAST((SELECT count(*) FROM embeddings WHERE $dead) AS BIGINT) AS n_dead,
         |  * FROM (
         |${hybridFusedSqlBody(live, trainWhere, lexK, out)}
         |)""".stripMargin
    }
    branches.mkString("", "\nUNION ALL\n", "\nORDER BY snap, q_id, rrf_rank")
  }

  /** DuckDB twin for HYBRID TAKEDOWN-COMPACTING serving (st26's batch
    * twin): st23's fused branches plus BOTH arms' physical-forget
    * evidence — the lex LSM layout pair (n_segs, base_upto — st24),
    * the ANN generation pair (n_appends, gen — st25), and the two
    * arms' SEPARATE dead counts. The dead counts are the cross-arm
    * honesty: each arm GCs its own tombstone copy at its own fold
    * cadence, so after one arm folds and the other hasn't,
    * n_dead_lex ≠ n_dead_ann while the ANSWERS stay identical (both
    * arms resolve liveness from complete per-arm ops copies of the
    * same feed) — exactly the window a one-sided crash opens, pinned
    * here as a first-class hash-attested state rather than an
    * accident. `snaps`: (live, deadLex, deadAnn, nSegs, baseUpto,
    * nAppends, gen) per snapshot, predicates over `vec_id`. */
  private[graft] def hybridTakedownCompactSnapshotSql(
      snaps: Seq[(String, String, String, Long, Long, Long, Long)],
      trainWhere: String, lexK: Int, out: Int): String = {
    val branches = snaps.zipWithIndex.map {
      case ((live, deadLex, deadAnn, nSegs, upto, nApp, gen), i) =>
        s"""SELECT CAST($i AS BIGINT) AS snap,
           |  CAST($nSegs AS BIGINT) AS n_segs,
           |  CAST($upto AS BIGINT) AS base_upto,
           |  CAST($nApp AS BIGINT) AS n_appends,
           |  CAST($gen AS BIGINT) AS gen,
           |  CAST((SELECT count(*) FROM embeddings WHERE $deadLex) AS BIGINT) AS n_dead_lex,
           |  CAST((SELECT count(*) FROM embeddings WHERE $deadAnn) AS BIGINT) AS n_dead_ann,
           |  * FROM (
           |${hybridFusedSqlBody(live, trainWhere, lexK, out)}
           |)""".stripMargin
    }
    branches.mkString("", "\nUNION ALL\n", "\nORDER BY snap, q_id, rrf_rank")
  }

  /** Query-bounded lexical ranking: shingle Jaccard of each query doc
    * against the corpus, top `k` per query by (jac desc, cand).
    *
    * Scale: the pair stage is the inverted-index join RESTRICTED to
    * query-side shingles — cost Σ_sh(q) df(sh), bounded by the query
    * set, never Σdf² over the corpus; hot shingles can be pre-dropped
    * with [[Dedup]]'s df-cap exactly as in the dedup family. */
  def lexicalTopK(docs: DataFrame, queryIds: Column, k: Int): DataFrame = {
    val sh = Dedup.shingles(docs)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val common = sh.filter(queryIds).select(col("doc_id").as("q_id"), col("sh"))
      .join(sh.select(col("doc_id").as("cand"), col("sh")), Seq("sh"))
      .filter(col("cand") =!= col("q_id"))
      .groupBy("q_id", "cand").agg(count(lit(1)).as("c"))
    val jac = common
      .join(sizes.select(col("doc_id").as("q_id"), col("n").as("n1")), Seq("q_id"))
      .join(sizes.select(col("doc_id").as("cand"), col("n").as("n2")), Seq("cand"))
      .withColumn("jac",
        col("c").cast("double") / (col("n1") + col("n2") - col("c")))
    val w = Window.partitionBy("q_id").orderBy(col("jac").desc, col("cand"))
    jac.withColumn("r", row_number().over(w).cast("long"))
      .filter(col("r") <= k)
      .select("q_id", "cand", "r")
  }

  val hybridRrf: Q = Q(
    "n90_hybrid_rrf",
    s"""WITH ${Dedup.shinglesSqlFor("documents")},
       |common AS (SELECT a.doc_id AS q_id, b.doc_id AS cand, count(*) AS c
       |           FROM sh a JOIN sh b ON a.sh = b.sh
       |           WHERE a.doc_id < $NumQueries AND b.doc_id <> a.doc_id
       |           GROUP BY 1, 2),
       |lexj AS (SELECT q_id, cand,
       |                CAST(c AS DOUBLE) / (s1.n + s2.n - c) AS jac
       |         FROM common
       |         JOIN sizes s1 ON s1.doc_id = q_id
       |         JOIN sizes s2 ON s2.doc_id = cand),
       |lexk AS (SELECT q_id, cand, r FROM (
       |           SELECT q_id, cand,
       |                  row_number() OVER (PARTITION BY q_id
       |                                     ORDER BY jac DESC, cand) AS r
       |           FROM lexj) WHERE r <= $HybridDepth),
       |e AS (SELECT vec_id, embedding,
       |             sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
       |      FROM embeddings),
       |qv AS (SELECT * FROM e WHERE vec_id < $NumQueries),
       |semp AS (SELECT q.vec_id AS q_id, e.vec_id AS cand,
       |                ${round6Sql(
              "list_sum(list_transform(generate_series(1, len(q.embedding)), " +
              "i -> CAST(q.embedding[i] AS DOUBLE) * e.embedding[i])) / (q.nrm * e.nrm)")} AS cos
       |         FROM qv q CROSS JOIN e
       |         WHERE q.vec_id <> e.vec_id),
       |semk AS (SELECT q_id, cand, r FROM (
       |           SELECT q_id, cand,
       |                  row_number() OVER (PARTITION BY q_id
       |                                     ORDER BY cos DESC, cand) AS r
       |           FROM semp) WHERE r <= $HybridDepth),
       |fused AS (SELECT COALESCE(l.q_id, s.q_id) AS q_id,
       |                 COALESCE(l.cand, s.cand) AS cand,
       |                 ${round6Sql(
              s"COALESCE(1.0 / ($RrfK + l.r), 0) + COALESCE(1.0 / ($RrfK + s.r), 0)")} AS rrf
       |          FROM lexk l FULL JOIN semk s
       |            ON s.q_id = l.q_id AND s.cand = l.cand)
       |SELECT q_id, cand, rrf, CAST(rrf_rank AS BIGINT) AS rrf_rank FROM (
       |  SELECT q_id, cand, rrf,
       |         row_number() OVER (PARTITION BY q_id
       |                            ORDER BY rrf DESC, cand) AS rrf_rank
       |  FROM fused) WHERE rrf_rank <= $HybridOut
       |ORDER BY q_id, rrf_rank""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val e = t.embeddings
    val lexk = lexicalTopK(t.documents, col("doc_id") < NumQueries, HybridDepth)
    val semk = cosineTopK(e, e.filter(col("vec_id") < NumQueries),
        HybridDepth, useHeap = false)
      .select(col("q_id"), col("nb_id").as("cand"), col("rn").as("r"))
    rrfFuse(lexk, semk, HybridOut)
      .select("q_id", "cand", "rrf", "rrf_rank")
      .orderBy("q_id", "rrf_rank")
  }

  /** n110: PER-SYSTEM ranking eval of the production hybrid — nDCG@10
    * (n108's graded measure, capped-tf relevance) of each fusion input
    * AND the fused list, side by side: `lex` (n83's BM25 top-10),
    * `sem` (n64's frozen-config IVF-PQ top-5 for the same query ids —
    * the id-bridge query vectors), `rrf` (their RRF fusion, n90's
    * k=60). The measurement the fusion family was missing: n90/n95
    * attest the fusion ARITHMETIC, n108 grades one ranker in
    * isolation — this entry grades the fusion DECISION, answering "did
    * fusing help, and what did the weak arm cost" on the same
    * relevance labels. Discrimination (DECISIONS r12 #8): the three
    * systems must read apart — measured mean nDCG: lex 0.89/0.93,
    * sem 0.12/0.25, rrf 0.60/0.71 (sf0.001/sf0.01). The corpus
    * embeddings are text-independent by construction, so the semantic
    * arm is an adversarially-WEAK fusion input — exactly the
    * calibration-free case RRF exists for — and the fused list reads
    * mid-way rather than collapsing to the weak arm: rank-level
    * fusion degrades gracefully (the Cormack 2009 claim, here
    * hash-attested with the degradation QUANTIFIED — the cost of
    * fusing in a worthless arm at equal weight is ~0.2–0.3 nDCG,
    * which is the number an operator weighing an untested second
    * retriever actually needs).
    *
    * Scale: both arm rankings are the serving paths (query-df-bounded
    * BM25, probed-cell ADC); the grading is one broadcast-semi-
    * filtered token pass (n108's class). */
  val hybridNdcgQ: Q = {
    val k = 10
    val qIds = TextAnalysis.bm25QuerySet.map(_._1).distinct.sorted
    val lexSql =
      "SELECT q_id, doc_id, rank AS r FROM (\n" +
        LexIndex.bm25SqlCore(k, "SELECT doc_id, text FROM documents") + "\n)"
    val semSql =
      "SELECT q_id, nb_id AS doc_id, rn AS r FROM (\n" +
        Pq.ivfPqIndexSqlCore() + s"\n) WHERE q_id IN (${qIds.mkString(", ")})"
    val rrfSql =
      s"""WITH lexk AS (SELECT q_id, doc_id AS cand, r FROM ($lexSql)),
         |semk AS (SELECT q_id, doc_id AS cand, r FROM ($semSql)),
         |fused AS (SELECT COALESCE(l.q_id, s.q_id) AS q_id,
         |                 COALESCE(l.cand, s.cand) AS cand,
         |                 ${round6Sql(
           s"COALESCE(1.0 / ($RrfK + l.r), 0) + COALESCE(1.0 / ($RrfK + s.r), 0)")} AS rrf
         |          FROM lexk l FULL JOIN semk s
         |            ON s.q_id = l.q_id AND s.cand = l.cand)
         |SELECT q_id, cand AS doc_id, rrf_rank AS r FROM (
         |  SELECT q_id, cand,
         |         row_number() OVER (PARTITION BY q_id
         |                            ORDER BY rrf DESC, cand) AS rrf_rank
         |  FROM fused) WHERE rrf_rank <= $k""".stripMargin
    Q(
      "n110_hybrid_ndcg",
      Seq("lex" -> lexSql, "sem" -> semSql, "rrf" -> rrfSql).map {
        case (nm, rksql) =>
          s"SELECT '$nm' AS system, * FROM (\n" +
            TextAnalysis.ndcgSqlOver(rksql, k) + "\n)"
      }.mkString("", "\nUNION ALL\n", "\nORDER BY system, q_id")) { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val queries = TextAnalysis.bm25QuerySet.toDF("q_id", "term")
      val lexRank = TextAnalysis.bm25TopK(t.documents, queries, k)
        .select("q_id", "doc_id", "rank")
      val semRank = Pq.searchPqIndex(
          t.embeddings.filter(col("vec_id").isin(qIds: _*)),
          Pq.accumulatedPqIndex(s, dir))
        .select(col("q_id"), col("nb_id").as("doc_id"), col("rn").as("rank"))
      val fusedRank = rrfFuse(
          lexRank.select(col("q_id"), col("doc_id").as("cand"),
            col("rank").as("r")),
          semRank.select(col("q_id"), col("doc_id").as("cand"),
            col("rank").as("r")), k)
        .select(col("q_id"), col("cand").as("doc_id"),
          col("rrf_rank").as("rank"))
      val rel = TextAnalysis.cappedTfRelevance(t.documents, queries)
      Seq("lex" -> lexRank, "sem" -> semRank, "rrf" -> fusedRank).map {
        case (nm, rk) => TextAnalysis.ndcgAtK(rk, rel, k)
          .select(lit(nm).as("system"), col("q_id"), col("dcg"),
            col("idcg"), col("ndcg"))
      }.reduce(_ unionByName _)
        .orderBy("system", "q_id")
    }
  }

  /** Fused hybrid body with a TENANT-AWARE lexical corpus: identical
    * to [[hybridFusedSqlBody]] except the BM25 corpus joins embeddings
    * for the tenant metadata (`label` lives there, n111's ACL-table
    * shape), so `liveVec` may reference both vec_id and label. Stats
    * (df/N/avgdl) are computed over the FILTERED corpus — the
    * per-tenant-index semantics [[LexIndex.filterIndex]] implements on
    * the Spark side. */
  private def tenantHybridFusedSqlBody(liveVec: String, trainWhere: String,
      lexK: Int, out: Int): String = {
    val qIds = TextAnalysis.bm25QuerySet.map(_._1).distinct.sorted
      .mkString(", ")
    val liveEm = liveVec.replace("vec_id", "em.vec_id")
      .replace("label", "em.label")
    s"""WITH lexk AS (SELECT q_id, doc_id AS cand, rank AS r FROM (
       |${LexIndex.bm25SqlCore(lexK,
          "SELECT d.doc_id, d.text FROM documents d " +
            s"JOIN embeddings em ON em.vec_id = d.doc_id WHERE ($liveEm)")}
       |)),
       |semk AS (SELECT q_id, nb_id AS cand, rn AS r FROM (
       |${Pq.ivfPqIndexSqlCore(liveVec, "embeddings", trainWhere, "embeddings")}
       |) WHERE q_id IN ($qIds)),
       |fused AS (SELECT COALESCE(l.q_id, s.q_id) AS q_id,
       |                 COALESCE(l.cand, s.cand) AS cand,
       |                 ${round6Sql(
        s"COALESCE(1.0 / ($RrfK + l.r), 0) + COALESCE(1.0 / ($RrfK + s.r), 0)")} AS rrf
       |          FROM lexk l FULL JOIN semk s
       |            ON s.q_id = l.q_id AND s.cand = l.cand)
       |SELECT q_id, cand, rrf, CAST(rrf_rank AS BIGINT) AS rrf_rank FROM (
       |  SELECT q_id, cand, rrf,
       |         row_number() OVER (PARTITION BY q_id
       |                            ORDER BY rrf DESC, cand) AS rrf_rank
       |  FROM fused) WHERE rrf_rank <= $out""".stripMargin
  }

  /** DuckDB twin for TENANT-SCOPED FORGET (n115): one fused branch per
    * (snapshot, tenant) — the tenant predicate conjoined into the live
    * predicate on BOTH arms, per-snapshot dead-count evidence from the
    * dead predicate. `snaps`: (snap, tenant, liveVec, tenantWhere,
    * deadWhere), predicates over bare embeddings columns. */
  private[graft] def tenantTakedownSnapshotSql(
      snaps: Seq[(Long, Long, String, String, String)],
      trainWhere: String, lexK: Int, out: Int): String = {
    // dead counts scope to the SERVED corpus (documents ⋈ embeddings):
    // takedowns are emitted from the joined corpus, and the id bridge
    // is not total at every sf
    def deadCount(dead: String): String =
      "(SELECT CAST(count(*) AS BIGINT) FROM embeddings em " +
        s"JOIN documents d ON d.doc_id = em.vec_id WHERE $dead)"
    val branches = snaps.map { case (snap, tenant, live, tw, dead) =>
      s"""SELECT CAST($snap AS BIGINT) AS snap,
         |  CAST($tenant AS BIGINT) AS tenant,
         |  ${deadCount(dead)} AS n_dead_lex,
         |  ${deadCount(dead)} AS n_dead_ann,
         |  * FROM (
         |${tenantHybridFusedSqlBody(s"($live) AND ($tw)", trainWhere, lexK, out)}
         |)""".stripMargin
    }
    branches.mkString("", "\nUNION ALL\n",
      "\nORDER BY snap, tenant, q_id, rrf_rank")
  }

  /** TENANT-SCOPED FORGET (n115 — VERDICT r13 #3): n111's tenant
    * pre-filter composed with the st26 physical-forget tree — the
    * production RTBF query on a MULTI-TENANT serving system: "forget
    * everything tenant T ever gave us, and prove the other tenants'
    * serving didn't move."
    *
    * Lifecycle on a real two-arm takedown tree (lex LSM + PQ
    * generations, the st24/st25 machinery): batch 0 ingests the even
    * half of the corpus (all tenants); batch 1 ingests fresh non-T,
    * non-O docs (ongoing ingest — it drives the ANN fold gate) and
    * takes down EVERY tenant-T doc, including ids that never arrived
    * (a del with no add is dead, not alive — the last-op-wins fold).
    * Each snapshot serves TWO tenant-scoped hybrid queries through the
    * REAL serving state: tenant pre-filter on both arms
    * ([[LexIndex.filterIndex]] for tenant-corpus BM25 stats; the
    * non-tenant codes dropped from the PQ index before any ADC work —
    * n111's one-sided-leak guard), queries unfiltered, answers
    * in-tenant. After the snap-1 serve both arms fold: T's rows
    * physically leave both indexes and its tombstones GC.
    *
    * The hash attests the two compliance claims AT ONCE: tenant T's
    * snap-1 branch is EMPTY (absence — a single leaked doc from either
    * arm materializes rows where the oracle has none), and tenant O's
    * snap-1 rows are byte-identical to its snap-0 rows (invariance —
    * O's branch predicates differ across snaps, `evens` vs `all minus
    * T`, yet select the same O corpus; per-tenant stats make the
    * equality exact, which is precisely what a shared-corpus-stats
    * post-filter could not deliver). Batch-1's non-tenant adds reach
    * the tree but NOT tenant O's results — tenant isolation under
    * ongoing ingest.
    *
    * Scale: the st26 audit carries over (index-bounded serves,
    * survivor-only folds); the tenant allowed-set is corpus-
    * proportional, deliberately NOT broadcast (DECISIONS r13 #6). */
  val tenantTakedownQ: Q = {
    val lexK = 10
    val out = 10
    val tenantT = 2L
    val tenantO = 1L
    val live0 = "vec_id % 2 = 0"
    val live1 = s"(vec_id % 2 = 0 AND label % 5 <> $tenantT) OR " +
      s"(vec_id % 2 = 1 AND label % 5 NOT IN ($tenantO, $tenantT))"
    // the dead-count evidence is "ever-added vectors currently
    // tombstoned" (st22's contract — deadDocs needs an add to count a
    // tombstone as an index removal); the takedown itself targets ALL
    // tenant-T ids, including never-arrived ones (dead for serving
    // either way — the last-op-wins fold)
    val deadT = s"label % 5 = $tenantT AND vec_id % 2 = 0"
    Q(
      "n115_tenant_takedown",
      tenantTakedownSnapshotSql(Seq(
        (0L, tenantO, live0, s"label % 5 = $tenantO", "FALSE"),
        (0L, tenantT, live0, s"label % 5 = $tenantT", "FALSE"),
        (1L, tenantO, live1, s"label % 5 = $tenantO", deadT),
        (1L, tenantT, live1, s"label % 5 = $tenantT", deadT)),
        trainWhere = "vec_id % 2 = 0", lexK = lexK, out = out)) { (s, dir) =>
      import s.implicits._
      import graft.operators.{LexIndex, Pq, ServingLoc, TextAnalysis}
      val t = Tables(s, dir)
      // materialized once (round 15, guide §1.2): the joined feed is
      // re-derived ~4× per batch by the ops writes and index builds
      val corpus = t.documents
        .join(t.embeddings, t.documents("doc_id") === t.embeddings("vec_id"))
        .select(t.documents("doc_id"), col("text"), col("embedding"),
          col("label"))
        .localCheckpoint()
      val base = ServingLoc.of(s, s"n115:$dir", "graft_tenant_takedown")
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sessionState.newHadoopConf())
      fs.listStatus(new org.apache.hadoop.fs.Path(base))
        .foreach(st => fs.delete(st.getPath, true))
      val lexBase = s"$base/lex"
      val annBase = s"$base/ann"
      def adds(pred: org.apache.spark.sql.Column) =
        corpus.filter(pred).select(col("doc_id"), col("text"),
          col("embedding"), lit("add").as("op"))
      def dels(pred: org.apache.spark.sql.Column) =
        corpus.filter(pred).select(col("doc_id"), lit("").as("text"),
          array().cast("array<float>").as("embedding"), lit("del").as("op"))
      val batches = Seq(
        adds(col("doc_id") % 2 === 0),
        adds(col("doc_id") % 2 === 1 &&
            !(col("label") % 5).isin(tenantO, tenantT))
          .unionByName(dels(col("label") % 5 === tenantT)))
      val terms = TextAnalysis.bm25QuerySet.toDF("q_id", "term")
      val qIds = TextAnalysis.bm25QuerySet.map(_._1).distinct
      val queryVecs = t.embeddings.filter(col("vec_id").isin(qIds: _*))
      batches.zipWithIndex.foreach { case (b, i) =>
        b.select("doc_id", "op")
          .write.mode("overwrite").parquet(s"$lexBase/ops/$i")
        b.select(col("doc_id").as("vec_id"), col("op"))
          .write.mode("overwrite").parquet(s"$annBase/ops/$i")
        val addRows = b.filter(col("op") === "add")
        LexIndex.writeIndex(
          LexIndex.buildIndex(addRows.select("doc_id", "text")),
          s"$lexBase/batches/$i")
        val g = Pq.currentPqGen(s, annBase)
        val idxPath = Pq.pqGenPath(annBase, g)
        val addVecs = addRows
          .select(col("doc_id").as("vec_id"), col("embedding"))
        if (!Pq.hasPqIndex(s, idxPath))
          Pq.writePqIndex(Pq.buildPqIndex(addVecs), idxPath)
        else Pq.appendToPqIndex(addVecs, idxPath, label = s"a$i")
        val (lexIdx, nDeadLex, _) =
          LexIndex.readTakedownCompactServing(s, lexBase, Some(i.toLong))
        val ids = (0L to i.toLong).toSeq
        val (deadAnn, nDeadAnn) = Pq.readPqTakedownLiveness(s, annBase, ids)
        // the LIVE index is tenant-independent — resolve it once per
        // snapshot; each tenant serve then pays only its own filter
        val liveAnnIdx =
          Pq.deletePqIndex(Pq.readPqIndex(s, idxPath), deadAnn)
        val served = Seq(tenantO, tenantT).map { tenant =>
          val allowed = t.embeddings.filter(col("label") % 5 === tenant)
            .select(col("vec_id").as("doc_id"))
          val lex = LexIndex
            .bm25FromIndex(LexIndex.filterIndex(lexIdx, allowed), terms, lexK)
            .select(col("q_id"), col("doc_id").as("cand"),
              col("rank").as("r"))
          // tenant scope via the SEMI filter on the tenant-sized
          // allowed set (round 15): labels partition the corpus, so
          // keep-allowed ≡ drop-not-allowed row for row — but the old
          // deletePqIndex form BROADCAST the corpus-sized non-tenant
          // id set (the exact anti-pattern filterPqIndex's scaladoc
          // rules out); the semi join keys on vec_id with no broadcast
          // hint and ships the smaller side at any scale
          val sem = Pq.searchPqIndex(queryVecs,
              Pq.filterPqIndex(liveAnnIdx,
                allowed.select(col("doc_id").as("vec_id"))))
            .select(col("q_id"), col("nb_id").as("cand"), col("rn").as("r"))
          rrfFuse(lex, sem, out).withColumn("tenant", lit(tenant))
        }.reduce(_ unionByName _)
        served
          .select(lit(i.toLong).as("snap"), col("tenant"),
            lit(nDeadLex).as("n_dead_lex"), lit(nDeadAnn).as("n_dead_ann"),
            col("q_id"), col("cand"), col("rrf"), col("rrf_rank"))
          .write.mode("overwrite").parquet(s"$base/results/$i")
        fs.create(new org.apache.hadoop.fs.Path(
          s"$lexBase/_committed_batch_$i"), true).close()
        fs.create(new org.apache.hadoop.fs.Path(
          s"$annBase/_served_batch_$i"), true).close()
        // both arms' folds reuse the serve's just-resolved frames — no
        // ops committed in between (round 15)
        LexIndex.compactTakedownServing(s, lexBase, Some(lexIdx))
        LexIndex.pruneTakedownCompacted(s, lexBase)
        Pq.foldPqTakedownIfDue(s, annBase, 1, ids, deadOpt = Some(deadAnn))
        Pq.prunePqTakedownFolded(s, annBase, ids)
      }
      s.read.parquet((0 to 1).map(i => s"$base/results/$i"): _*)
        .select("snap", "tenant", "n_dead_lex", "n_dead_ann",
          "q_id", "cand", "rrf", "rrf_rank")
        .orderBy("snap", "tenant", "q_id", "rrf_rank")
    }
  }

  val all: Seq[Q] = Seq(cosineTopK, cosineTopKHeap, annLsh,
    embeddingNearDup, annIvf, annIvfKmeans, vectorQuantize, quantizedTopK,
    embeddingPool, truncationRecallQ, hybridRrf, embeddingDriftQ,
    psiDriftQ, annIvfFiltered, hybridNdcgQ, tenantTakedownQ)
}
