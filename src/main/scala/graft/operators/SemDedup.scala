package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.Det._

/** Semantic deduplication (SemDeDup, Abbas et al. 2023,
  * arXiv:2303.09540): k-means-cluster the embedding space, then look
  * for near-duplicate PAIRS ONLY WITHIN EACH CLUSTER — the published
  * recipe that makes embedding-level dedup tractable at corpus scale
  * by replacing the O(n²) all-pairs cosine with Σ|cell|² intra-cell
  * comparisons. A vector is a semantic duplicate when some LOWER-ID
  * cell-mate has cosine ≥ τ (keep-first policy, deterministic — the
  * paper keeps a random representative per group; id order is the
  * reproducible equivalent).
  *
  * Reuses the library's oracled k-means verbatim:
  * [[Similarity.ivfCentroids]] (the n16 Lloyd loop) for the clustering
  * and [[Similarity.assignCells]] for the assignment, so the semantic
  * partitioning here is the SAME hash-checked computation the IVF
  * index uses — one clustering definition across ANN search and
  * semantic dedup.
  *
  * Scale shape (100 TB): centroids are broadcast (k rows), assignment
  * is a map-side scan, and the only shuffle of the corpus is one
  * hash-partition on `cell`. The intra-cell self-join is bounded by
  * cell size — k is chosen so cells hold ~10⁴–10⁵ vectors regardless
  * of corpus size (the paper runs k = 11k on 233M embeddings), so the
  * per-cell quadratic term stays constant as the corpus grows; a
  * skewed cell is the same salting problem the join family already
  * handles. Nothing all-pairs, nothing driver-side.
  */
object SemDedup {

  private val NCells = 16
  private val Iters = 2
  private val Tau = 0.4

  /** Per-vector semantic-duplicate audit frame over a cell assignment
    * (vec_id, embedding, cell) — [[Similarity.assignCells]] output:
    * (vec_id, cell, max_lower_cos, is_dup) where `max_lower_cos` is
    * the best rounded cosine to any lower-id cell-mate (-1.0 when the
    * vector is alone in its cell or has the lowest id) and `is_dup` =
    * max_lower_cos ≥ τ. Emitting the flag rather than pre-filtering
    * keeps the frame auditable (n47's pattern): `survivors` below is
    * the filtered view. */
  def semanticDupAudit(asg: DataFrame, tau: Double): DataFrame = {
    val cos = graft.functions.GraftFunctions.cosine_sim _
    val mates = asg.select(col("cell"), col("vec_id").as("nb_id"),
      col("embedding").as("nb_emb"))
    val best = asg.join(mates, Seq("cell"))
      .filter(col("nb_id") < col("vec_id"))
      .select(col("vec_id"),
        round6(cos(col("embedding"), col("nb_emb"))).as("cos"))
      .groupBy("vec_id")
      .agg(max(col("cos")).as("max_lower_cos"))
    asg.select("vec_id", "cell")
      .join(best, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("max_lower_cos"), lit(-1.0)).as("max_lower_cos"),
        coalesce(col("max_lower_cos") >= tau, lit(false)).as("is_dup"))
  }

  /** End-to-end SemDeDup over (vec_id, embedding) rows: Lloyd k-means
    * → cell assignment → intra-cell prune. Returns the audit frame. */
  def semanticDups(vecs: DataFrame, k: Int = NCells, iters: Int = Iters,
      tau: Double = Tau): DataFrame =
    semanticDupAudit(
      Similarity.assignCells(vecs, Similarity.ivfCentroids(vecs, k, iters)),
      tau)

  /** Vectors surviving semantic dedup (the keep-first representative
    * set): original rows of `vecs` whose audit flag is clear. */
  def survivors(vecs: DataFrame, k: Int = NCells, iters: Int = Iters,
      tau: Double = Tau): DataFrame =
    vecs.join(semanticDups(vecs, k, iters, tau)
        .filter(col("is_dup")).select("vec_id"),
      Seq("vec_id"), "left_anti")

  /** Catalog entry: the full audit frame at the n16-locked k-means
    * configuration (16 cells, 2 Lloyd rounds), τ = 0.4. The DuckDB
    * twin recomputes the ENTIRE chain — seeding, both Lloyd rounds,
    * final assignment (the shared [[Similarity.LloydSql]] prefix, the
    * same text n16 verifies) — then the intra-cell lower-id max-cosine,
    * so the semantic-dedup decision itself is hash-checked end to end,
    * not just row-counted. */
  val semDedup: Q = Q(
    "n48_semdedup",
    s"""WITH ${Similarity.LloydSql.prefix(NCells, Iters)},
       |pairs AS (SELECT a.vec_id,
       |                 ${round6Sql(
            s"${Similarity.LloydSql.dotE("ea", "eb")} / (ea.nrm * eb.nrm)")} AS cos
       |          FROM asgF a
       |          JOIN asgF b ON a.cell = b.cell AND b.vec_id < a.vec_id
       |          JOIN e ea ON ea.vec_id = a.vec_id
       |          JOIN e eb ON eb.vec_id = b.vec_id),
       |mx AS (SELECT vec_id, max(cos) AS max_lower_cos
       |       FROM pairs GROUP BY vec_id)
       |SELECT a.vec_id, a.cell,
       |       coalesce(m.max_lower_cos, -1.0) AS max_lower_cos,
       |       coalesce(m.max_lower_cos >= $Tau, FALSE) AS is_dup
       |FROM asgF a LEFT JOIN mx m USING (vec_id)
       |ORDER BY vec_id""".stripMargin) { (s, dir) =>
    semanticDups(Tables(s, dir).embeddings).orderBy("vec_id")
  }

  // ---------------------------------------------------------------------
  // n66: INCREMENTAL SemDeDup — the screen a daily batch runs against
  // the persisted ACCEPTED corpus, reusing the SAME persisted vector
  // index the ANN family maintains ([[AnnIndex]]: frozen centroids +
  // cell assignments with embeddings). One index serves search (n41),
  // embedding near-dup, and semantic dedup.
  // ---------------------------------------------------------------------

  /** Semantic-duplicate audit of a NEW batch against a persisted
    * index: each batch vector assigns to its home cell under the
    * index's FROZEN centroids, compares against the accepted vectors
    * of THAT CELL only (the SemDeDup tractability recipe, incremental
    * form), and flags when any accepted cell-mate has cosine ≥ τ. No
    * lower-id condition — accepted rows are always prior. Cost: one
    * broadcast assignment pass over the batch + a join bounded by the
    * batch's home cells' accepted rows; the accepted corpus is never
    * re-clustered or re-scanned outside those cells (partition-pruned
    * when assignments are partitioned by cell at rest). Intra-batch
    * duplicates are [[semanticDups]]' job, run first — same tier
    * split as [[IncrementalDedup.dedupAgainstIndex]]. */
  def semanticScreenAudit(newVecs: DataFrame, index: AnnIndex,
      tau: Double = Tau): DataFrame = {
    val cos = graft.functions.GraftFunctions.cosine_sim _
    val asgNew = Similarity.assignCells(newVecs, index.centroids)
    val best = asgNew
      .join(index.assignments.select(col("cell"),
        col("embedding").as("nb_emb")), Seq("cell"))
      .select(col("vec_id"),
        round6(cos(col("embedding"), col("nb_emb"))).as("cos"))
      .groupBy("vec_id")
      .agg(max(col("cos")).as("max_prior_cos"))
    asgNew.select("vec_id", "cell")
      .join(best, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("max_prior_cos"), lit(-1.0)).as("max_prior_cos"),
        coalesce(col("max_prior_cos") >= tau, lit(false)).as("is_dup"))
  }

  /** Batch rows surviving the incremental semantic screen. */
  def semanticScreen(newVecs: DataFrame, index: AnnIndex,
      tau: Double = Tau): DataFrame =
    newVecs.join(semanticScreenAgainstIndexDups(newVecs, index, tau),
      Seq("vec_id"), "left_anti")

  private def semanticScreenAgainstIndexDups(newVecs: DataFrame,
      index: AnnIndex, tau: Double): DataFrame =
    semanticScreenAudit(newVecs, index, tau)
      .filter(col("is_dup")).select("vec_id")

  private val ScreenCells = 16

  /** Catalog entry: the odd snapshot screened against the even
    * snapshot's persisted index (oracle-locked raw anchors as frozen
    * centroids, n41's pattern — the Lloyd loop is hash-oracled by
    * n16/n48). The full audit frame is hash-checked: home-cell
    * assignment under frozen centroids, the accepted-cell-mate max
    * cosine, and the τ decision. */
  val incrementalSemDedup: Q = {
    val dot = (a: String, b: String) =>
      s"list_sum(list_transform(generate_series(1, 64), " +
        s"i -> CAST($a.embedding[i] AS DOUBLE) * $b.embedding[i]))"
    Q(
      "n66_incremental_semdedup",
      s"""WITH e AS (SELECT vec_id, embedding,
         |                  sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
         |           FROM embeddings),
         |c AS (SELECT vec_id AS cent_id, embedding, nrm FROM e
         |      WHERE vec_id % 2 = 0 AND vec_id < ${2 * ScreenCells}),
         |asgp AS (SELECT vec_id, cell FROM (
         |    SELECT e.vec_id, c.cent_id AS cell,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${round6Sql(s"${dot("e", "c")} / (e.nrm * c.nrm)")} DESC,
         |                      c.cent_id) AS arn
         |    FROM e CROSS JOIN c WHERE e.vec_id % 2 = 0) WHERE arn = 1),
         |asgn AS (SELECT vec_id, cell FROM (
         |    SELECT e.vec_id, c.cent_id AS cell,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${round6Sql(s"${dot("e", "c")} / (e.nrm * c.nrm)")} DESC,
         |                      c.cent_id) AS arn
         |    FROM e CROSS JOIN c WHERE e.vec_id % 2 = 1) WHERE arn = 1),
         |mx AS (SELECT n.vec_id,
         |              max(${round6Sql(s"${dot("en", "ep")} / (en.nrm * ep.nrm)")}) AS max_prior_cos
         |       FROM asgn n
         |       JOIN asgp p ON p.cell = n.cell
         |       JOIN e en ON en.vec_id = n.vec_id
         |       JOIN e ep ON ep.vec_id = p.vec_id
         |       GROUP BY n.vec_id)
         |SELECT a.vec_id, a.cell,
         |       coalesce(m.max_prior_cos, -1.0) AS max_prior_cos,
         |       coalesce(m.max_prior_cos >= $Tau, FALSE) AS is_dup
         |FROM asgn a LEFT JOIN mx m USING (vec_id)
         |ORDER BY vec_id""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).embeddings
      val prior = e.filter(col("vec_id") % 2 === 0)
      val fresh = e.filter(col("vec_id") % 2 === 1)
      val cents = prior.filter(col("vec_id") < 2 * ScreenCells)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cv"))
      semanticScreenAudit(fresh, IncrementalAnn.indexWith(prior, cents))
        .orderBy("vec_id")
    }
  }

  val all: Seq[Q] = Seq(semDedup, incrementalSemDedup)
}
