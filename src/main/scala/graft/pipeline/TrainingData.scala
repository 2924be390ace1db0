package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.api.Graft._

/** The end-to-end training-data curation pipeline the north-star
  * operators exist for: quality filter → exact dedup → near-dup drop →
  * curated corpus with per-language stats. One declarative lineage —
  * Catalyst sees the whole thing, so filters push through and the
  * dedup shuffles are the only wide stages.
  */
object TrainingData {

  /** Curate: keep docs with ≥ 20 tokens and type/token ratio ≥ 0.3,
    * drop exact dups (min-doc_id representative) then near-dups
    * (Jaccard ≥ 0.6, larger id dropped). Returns the surviving docs
    * with their features. */
  def curate(docs: DataFrame): DataFrame = {
    // tokenize once; n_tokens/ttr derive from the same array column
    val featured = docs
      .select(col("doc_id"), col("lang"), col("source"), col("text"),
        split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("lang"), col("source"), col("text"),
        size(col("w")).cast("long").as("n_tokens"),
        (size(array_distinct(col("w"))).cast("double") / size(col("w")))
          .as("ttr"))
    val quality = featured
      .filter(col("n_tokens") >= 20 && col("ttr") >= 0.3)
    // key the dedup stages' shingle cache to (canonical docs, transform)
    // — without this the near-dup verify shingles an UNREGISTERED
    // ad-hoc corpus, so every invocation rebuilds the index instead of
    // reusing the memoized one (curateKeepText already does this)
    graft.operators.Dedup.registerDerivedCorpus(quality, docs, "curateQuality")
    val exact = quality.distinctDocuments()
    exact.dropNearDuplicates(threshold = 0.6)
      .select("doc_id", "lang", "source", "n_tokens", "ttr")
  }

  /** Catalog entry: curated corpus ordered by doc_id, with the whole
    * chain expressed as oracle SQL (quality CTE → exact-dedup reps →
    * exact near-dup pairs → anti-join). The oracle uses the *exact*
    * Jaccard pair set where Spark uses MinHash+LSH+verify — a recall
    * miss anywhere in the pipeline breaks the hash match. */
  val curateQ: Q = Q(
    "n40_training_curate",
    """WITH featured AS (
      |  SELECT doc_id, lang, source, text,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |           / len(string_split(text, ' ')) AS ttr
      |  FROM documents),
      |quality AS (
      |  SELECT * FROM featured WHERE n_tokens >= 20 AND ttr >= 0.3),
      |reps AS (
      |  SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5(text)),
      |exact AS (
      |  SELECT q.* FROM quality q JOIN reps USING (doc_id)),
      |w AS (SELECT doc_id, string_split(text, ' ') AS w FROM exact),
      |sh AS (SELECT DISTINCT doc_id,
      |              unnest(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
      |                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
      |       FROM w),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |common AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
      |           FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |           GROUP BY a.doc_id, b.doc_id),
      |dups AS (SELECT DISTINCT d2 AS doc_id
      |         FROM common
      |         JOIN sizes s1 ON s1.doc_id = d1
      |         JOIN sizes s2 ON s2.doc_id = d2
      |         WHERE CAST(c AS DOUBLE) / (s1.n + s2.n - c) >= 0.6)
      |SELECT doc_id, lang, source, n_tokens, ttr
      |FROM exact
      |WHERE doc_id NOT IN (SELECT doc_id FROM dups)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    curate(Tables(s, dir).documents).orderBy("doc_id")
  }

  /** The INCREMENTAL curation flow (round 4): what a daily-crawl run
    * actually executes — curate the NEW batch locally (quality →
    * intra-batch exact dedup → intra-batch near-dup drop, i.e.
    * [[curate]] on the batch), then screen the survivors against the
    * PRIOR corpus' persisted dedup index (exact fingerprint + cross
    * near-dup ≥ threshold). Only the batch and candidate-filtered
    * index rows are touched; the accepted corpus is never re-read. */
  def curateIncremental(newDocs: DataFrame,
      index: graft.operators.DedupIndex, threshold: Double = 0.6): DataFrame = {
    // the curated batch is referenced by the fingerprint screen, the
    // band probe, the verify and two anti-joins — materialize its
    // quality+dedup lineage once instead of ~3× (measured on n43)
    val curated = curateKeepText(newDocs).localCheckpoint()
    // deterministic content for a given batch → key the probe-side
    // shingle index instead of churning the ad-hoc slot every call
    graft.operators.Dedup.registerDerivedCorpus(curated, newDocs, "curated")
    graft.operators.IncrementalDedup.dedupAgainstIndex(curated, index, threshold)
      .select("doc_id", "lang", "source", "n_tokens", "ttr")
  }

  /** [[curate]] retaining the text column (the index screen needs it). */
  private def curateKeepText(docs: DataFrame): DataFrame = {
    val featured = docs
      .select(col("doc_id"), col("lang"), col("source"), col("text"),
        split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("lang"), col("source"), col("text"),
        size(col("w")).cast("long").as("n_tokens"),
        (size(array_distinct(col("w"))).cast("double") / size(col("w")))
          .as("ttr"))
    val quality = featured.filter(col("n_tokens") >= 20 && col("ttr") >= 0.3)
    // registration chains to docs' root (if registered), so every
    // dedup stage downstream keys its shingle cache logically
    graft.operators.Dedup.registerDerivedCorpus(quality, docs, "curateQuality")
    quality.distinctDocuments()
      .dropNearDuplicates(threshold = 0.6)
  }

  /** Catalog entry: parity split (prior = even, new batch = odd). The
    * oracle is the whole composition from scratch in DuckDB — the
    * batch-local n40 chain, then the cross-snapshot exact/near screens
    * restricted to (batch survivor, prior) pairs. As everywhere in the
    * incremental family, the Spark side computes the cross screen from
    * the persisted-index probe, so a recall miss anywhere flips the
    * hash. */
  val curateIncrementalQ: Q = Q(
    "n43_incremental_curate",
    """WITH featured AS (
      |  SELECT doc_id, lang, source, text,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |           / len(string_split(text, ' ')) AS ttr
      |  FROM documents WHERE doc_id % 2 = 1),
      |quality AS (
      |  SELECT * FROM featured WHERE n_tokens >= 20 AND ttr >= 0.3),
      |reps AS (
      |  SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5(text)),
      |exact AS (
      |  SELECT q.* FROM quality q JOIN reps USING (doc_id)),
      |w1 AS (SELECT doc_id, string_split(text, ' ') AS w FROM exact),
      |sh1 AS (SELECT DISTINCT doc_id,
      |              unnest(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
      |                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
      |        FROM w1),
      |sizes1 AS (SELECT doc_id, count(*) AS n FROM sh1 GROUP BY doc_id),
      |common1 AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
      |            FROM sh1 a JOIN sh1 b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |            GROUP BY a.doc_id, b.doc_id),
      |dups1 AS (SELECT DISTINCT d2 AS doc_id
      |          FROM common1
      |          JOIN sizes1 s1 ON s1.doc_id = d1
      |          JOIN sizes1 s2 ON s2.doc_id = d2
      |          WHERE CAST(c AS DOUBLE) / (s1.n + s2.n - c) >= 0.6),
      |clean AS (SELECT * FROM exact
      |          WHERE doc_id NOT IN (SELECT doc_id FROM dups1)),
      |w2 AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh2 AS (SELECT DISTINCT doc_id,
      |              unnest(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
      |                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
      |        FROM w2),
      |sizes2 AS (SELECT doc_id, count(*) AS n FROM sh2 GROUP BY doc_id),
      |commonX AS (SELECT a.doc_id AS d_new, b.doc_id AS d_prior, count(*) AS c
      |            FROM sh2 a JOIN sh2 b ON a.sh = b.sh
      |            WHERE a.doc_id IN (SELECT doc_id FROM clean)
      |              AND b.doc_id % 2 = 0
      |            GROUP BY 1, 2),
      |nearX AS (SELECT DISTINCT co.d_new AS doc_id
      |          FROM commonX co
      |          JOIN sizes2 s1 ON s1.doc_id = co.d_new
      |          JOIN sizes2 s2 ON s2.doc_id = co.d_prior
      |          WHERE CAST(co.c AS DOUBLE) / (s1.n + s2.n - co.c) >= 0.6),
      |exactX AS (SELECT doc_id FROM clean
      |           WHERE md5(text) IN
      |             (SELECT md5(text) FROM documents WHERE doc_id % 2 = 0))
      |SELECT doc_id, lang, source, n_tokens, ttr
      |FROM clean
      |WHERE doc_id NOT IN (SELECT doc_id FROM nearX)
      |  AND doc_id NOT IN (SELECT doc_id FROM exactX)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir).documents
    val prior = docs.filter(col("doc_id") % 2 === 0)
    val fresh = docs.filter(col("doc_id") % 2 === 1)
    // same keys as IncrementalDedup.splitDocs, so n37–n39 and n43 share
    // one shingle index per parity; without the fresh registration the
    // batch-side curation chain churned the ad-hoc slot every rep
    graft.operators.Dedup.registerDerivedCorpus(prior, docs, "parity=0")
    graft.operators.Dedup.registerDerivedCorpus(fresh, docs, "parity=1")
    curateIncremental(fresh,
      graft.operators.IncrementalDedup.buildIndex(prior), threshold = 0.6)
      .orderBy("doc_id")
  }

  /** Per-stage survivorship counts of the n40 curation pipeline: how
    * many documents each tier removed (quality gate, exact dedup,
    * near-dup drop) and how many survive — the audit table a real
    * curation run publishes next to its output, and the first thing
    * anyone debugging a corpus shrinkage looks at. One row; each count
    * is a 1-row aggregate of a stage frame the pipeline already
    * computes (the shingle index is shared with n40 via the derived-
    * corpus cache), stitched with 1-row broadcast crosses. */
  def curationAudit(docs: DataFrame): DataFrame = {
    val featured = docs
      .select(col("doc_id"), col("text"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("text"),
        size(col("w")).cast("long").as("n_tokens"),
        (size(array_distinct(col("w"))).cast("double") / size(col("w")))
          .as("ttr"))
    val quality = featured.filter(col("n_tokens") >= 20 && col("ttr") >= 0.3)
    graft.operators.Dedup.registerDerivedCorpus(quality, docs, "curateQuality")
    val exact = quality.distinctDocuments()
    val cleaned = exact.dropNearDuplicates(threshold = 0.6)
    docs.agg(count(lit(1)).as("n_total"))
      .crossJoin(quality.agg(count(lit(1)).as("__q")))
      .crossJoin(exact.agg(count(lit(1)).as("__e")))
      .crossJoin(cleaned.agg(count(lit(1)).as("__s")))
      .select(col("n_total"),
        (col("n_total") - col("__q")).as("n_quality_fail"),
        (col("__q") - col("__e")).as("n_exact_dup"),
        (col("__e") - col("__s")).as("n_near_dup"),
        col("__s").as("n_survivors"))
  }

  /** Catalog entry: the audit's oracle re-derives every stage in
    * DuckDB (n40's CTE chain) and counts it — a document leaking
    * through or over-dropped at ANY tier changes a count and flips the
    * hash. Single row, so no ORDER BY needed. */
  val curationAuditQ: Q = Q(
    "n60_curation_audit",
    """WITH featured AS (
      |  SELECT doc_id, text,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |           / len(string_split(text, ' ')) AS ttr
      |  FROM documents),
      |quality AS (
      |  SELECT * FROM featured WHERE n_tokens >= 20 AND ttr >= 0.3),
      |reps AS (
      |  SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5(text)),
      |exact AS (
      |  SELECT q.* FROM quality q JOIN reps USING (doc_id)),
      |w AS (SELECT doc_id, string_split(text, ' ') AS w FROM exact),
      |sh AS (SELECT DISTINCT doc_id,
      |              unnest(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
      |                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
      |       FROM w),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |common AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
      |           FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |           GROUP BY a.doc_id, b.doc_id),
      |dups AS (SELECT DISTINCT d2 AS doc_id
      |         FROM common
      |         JOIN sizes s1 ON s1.doc_id = d1
      |         JOIN sizes s2 ON s2.doc_id = d2
      |         WHERE CAST(c AS DOUBLE) / (s1.n + s2.n - c) >= 0.6),
      |clean AS (SELECT doc_id FROM exact
      |          WHERE doc_id NOT IN (SELECT doc_id FROM dups))
      |SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_total,
      |       CAST((SELECT count(*) FROM documents)
      |            - (SELECT count(*) FROM quality) AS BIGINT) AS n_quality_fail,
      |       CAST((SELECT count(*) FROM quality)
      |            - (SELECT count(*) FROM exact) AS BIGINT) AS n_exact_dup,
      |       CAST((SELECT count(*) FROM exact)
      |            - (SELECT count(*) FROM clean) AS BIGINT) AS n_near_dup,
      |       CAST((SELECT count(*) FROM clean) AS BIGINT) AS n_survivors""".stripMargin) {
    (s, dir) => curationAudit(Tables(s, dir).documents)
  }

  val all: Seq[Q] = Seq(curateQ, curateIncrementalQ, curationAuditQ)
}
