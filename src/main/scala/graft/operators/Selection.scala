package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.Det._

/** Data-selection operators for training-corpus curation (north star):
  * the published selection methods a 100 TB pipeline runs AFTER dedup
  * and quality rules to pick WHICH cleaned documents to train on.
  *
  * - n73: DSIR — importance resampling toward a target distribution
  *   over hashed n-gram features (Xie et al. 2023, "Data Selection
  *   for Language Models via Importance Resampling"). The sampling
  *   itself is the Gumbel-top-k trick with deterministic md5-derived
  *   noise, so the full resample — features, bucket distributions,
  *   log-importance weights, perturbed scores, selection — is
  *   hash-oracle-checked in DuckDB.
  * - n74: CCNet-style perplexity bucketing (Wenzek et al. 2020) — an
  *   add-one-smoothed bigram LM trained on a target slice scores every
  *   document; per-language terciles label head/middle/tail.
  * - n75: deterministic epoch shuffle + shard assignment — the
  *   "global shuffle" a trainer needs, as a seeded hash permutation
  *   (no RNG state, reproducible across runs and executors).
  * - n76: soft deduplication — duplicates are down-weighted (1/count)
  *   instead of dropped, the diversity-preserving alternative to n01's
  *   hard screen; reports per-doc sampling weight and effective tokens.
  *
  * Scale shapes: every operator is feature-extraction (map-side
  * explode) + counting aggregations + joins keyed on bounded-cardinality
  * keys (hash buckets, fingerprints) or broadcast-1-row totals. Nothing
  * is all-pairs and nothing collects to the driver. The only global
  * structures are the B-bucket tau table (n73: B rows, broadcast) and
  * the bigram LM (n74: keyed join — at 100 TB the LM would be trained
  * on a SAMPLE of the target slice, which changes the training input,
  * not this dataflow).
  */
object Selection {

  /** Hash-bucket count for DSIR features (the paper uses 10⁴; 1024
    * keeps the sf0.01 oracle's bucket collisions interesting). */
  val NumBuckets = 1024
  /** Selection budget for the catalog entry. */
  val SelectK = 100
  /** Gumbel noise seed — part of the operator's contract: reruns and
    * the DuckDB twin must perturb identically. */
  val GumbelSeed = "dsir-epoch0"

  /** Portable 32-bit hash: first 8 md5 hex chars as an unsigned int —
    * the engine's established cross-engine hash idiom (n24/n25). */
  private def hash32(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long")
  private def hash32Sql(expr: String) =
    s"('0x' || substr(md5($expr), 1, 8))::BIGINT"

  /** Unigram + bigram feature stream (doc_id, gram) — DSIR's hashed
    * bag-of-ngrams featurization, map-side only. */
  private def grams(docs: DataFrame): DataFrame = {
    val uni = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("gram"))
    val bi = TextAnalysis.bigrams(docs)
      .select(col("doc_id"), concat_ws(" ", col("w1"), col("w2")).as("gram"))
    uni.unionByName(bi)
  }

  private val gramsSql =
    """toks AS (SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents),
      |grams AS (
      |  SELECT doc_id, lang, unnest(tk) AS gram FROM toks
      |  UNION ALL
      |  SELECT doc_id, lang, tk[p] || ' ' || tk[p + 1] AS gram
      |  FROM (SELECT doc_id, lang, tk,
      |               unnest(generate_series(1, len(tk) - 1)) AS p
      |        FROM toks))""".stripMargin

  /** DSIR importance resampling: select `SelectK` documents whose
    * hashed-ngram distribution moves the corpus toward the TARGET
    * slice (here lang = 'en' — the stand-in for "looks like the
    * high-quality reference corpus").
    *
    * λ(doc) = Σ_b c_b(doc)·(ln p̂_target(b) − ln p̂_raw(b)) with
    * add-one-smoothed bucket distributions over B = 1024 md5 buckets;
    * sampling without replacement ∝ exp(λ) via Gumbel-top-k:
    * score = λ + g(doc), g = −ln(−ln(u)), u = (md5₃₂(seed:doc_id)+0.5)/2³².
    *
    * Scale: features are map-side; bucket stats are two B-row
    * aggregations; λ is a broadcast join (B rows) + one DECIMAL-exact
    * per-doc sum; selection is a global top-K (TakeOrdered — no full
    * sort). The doc→bucket join never exceeds the feature stream. */
  val dsirSelect: Q = Q(
    "n73_dsir_select",
    s"""WITH $gramsSql,
       |feat AS (SELECT doc_id, ${hash32Sql("gram")} % $NumBuckets AS bucket,
       |                count(*) AS c
       |         FROM grams GROUP BY doc_id, bucket),
       |tstat AS (SELECT ${hash32Sql("gram")} % $NumBuckets AS bucket, count(*) AS tc
       |          FROM grams WHERE lang = 'en' GROUP BY bucket),
       |rstat AS (SELECT ${hash32Sql("gram")} % $NumBuckets AS bucket, count(*) AS rc
       |          FROM grams GROUP BY bucket),
       |tot AS (SELECT (SELECT count(*) FROM grams WHERE lang = 'en') AS tn,
       |               (SELECT count(*) FROM grams) AS rn),
       |tau AS (SELECT bucket,
       |               ln((COALESCE(tc, 0) + 1.0) / (tn + $NumBuckets)) -
       |               ln((rc + 1.0) / (rn + $NumBuckets)) AS tau
       |        FROM rstat LEFT JOIN tstat USING (bucket) CROSS JOIN tot),
       |lam AS (SELECT doc_id, ${dsumSql("c * tau")} AS lam
       |        FROM feat JOIN tau USING (bucket) GROUP BY doc_id),
       |scored AS (SELECT doc_id, ${round6Sql("lam")} AS lam,
       |                  ${round6Sql(
             s"lam + (-ln(-ln((${hash32Sql(s"'$GumbelSeed:' || doc_id")} + 0.5) / 4294967296.0)))")} AS score
       |           FROM lam),
       |ranked AS (SELECT doc_id, lam, score,
       |                  row_number() OVER (ORDER BY score DESC, doc_id) AS rn
       |           FROM scored)
       |SELECT doc_id, lam, score, CAST(rn AS BIGINT) AS rn
       |FROM ranked WHERE rn <= $SelectK
       |ORDER BY rn""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir).documents
    dsir(docs, docs.filter(col("lang") === "en"), SelectK).orderBy("rn")
  }

  /** Library form of n73: resample `k` docs from `raw` toward the
    * distribution of `target` (both need doc_id + text). */
  def dsir(raw: DataFrame, target: DataFrame, k: Int,
      nBuckets: Int = NumBuckets, seed: String = GumbelSeed): DataFrame = {
    // ONE tokenize pass per corpus (round 15, guide §1.2): rstat and
    // the totals are pure re-aggregations of the per-doc bucket counts
    // (Σ_doc c(doc, b) ≡ count of gram instances in b), so deriving
    // them from `feat` — whose shuffle Spark's ReuseExchange then
    // computes once — replaces the old THREE raw-corpus tokenize
    // passes (feat, rstat, rn) and two target passes with one each.
    // coalesce guards the empty-corpus edge where sum yields null
    // where the old count read 0.
    val feat = grams(raw)
      .select(col("doc_id"), (hash32(col("gram")) % nBuckets).as("bucket"))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("c"))
    val tstat = grams(target)
      .select((hash32(col("gram")) % nBuckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("tc"))
    val rstat = feat.groupBy("bucket")
      .agg(coalesce(sum(col("c")), lit(0L)).as("rc"))
    val tot = tstat.agg(coalesce(sum(col("tc")), lit(0L)).as("tn"))
      .crossJoin(feat.agg(coalesce(sum(col("c")), lit(0L)).as("rn")))
    val tau = rstat.join(tstat, Seq("bucket"), "left").crossJoin(broadcast(tot))
      .select(col("bucket"),
        (log((coalesce(col("tc"), lit(0L)) + 1.0) / (col("tn") + nBuckets)) -
          log((col("rc") + 1.0) / (col("rn") + nBuckets))).as("tau"))
    val lam = feat.join(broadcast(tau), Seq("bucket"))
      .groupBy("doc_id").agg(dsum(col("c") * col("tau")).as("lam"))
    val scored = lam.select(col("doc_id"), round6(col("lam")).as("lam"),
      round6(col("lam") +
        -log(-log((hash32(concat(lit(s"$seed:"), col("doc_id").cast("string"))) + 0.5d) /
          4294967296.0d))).as("score"))
    // TakeOrdered top-K, then rank only the K survivors (tiny frame)
    val top = scored.orderBy(col("score").desc, col("doc_id")).limit(k)
    top.withColumn("rn",
      row_number().over(Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
  }

  /** Number of perplexity buckets (CCNet's head/middle/tail). */
  val PplBuckets = 3

  /** CCNet-style quality bucketing: an add-one-smoothed bigram LM is
    * trained on the target slice (lang = 'en'); every document with at
    * least one bigram is scored by mean ln p̂(w2|w1); documents are
    * cut into per-language terciles — 'head' = most-target-like.
    *
    * p̂(w2|w1) = (c2(w1,w2)+1)/(c1(w1)+V), counts from the TARGET
    * only, V = |distinct w2| in the target's bigrams; unseen bigrams
    * and prefixes coalesce to 0, keeping the score finite everywhere
    * (the whole point vs n51's MLE, which can only score seen
    * bigrams). Perplexity exp(−avg_logp) is monotone-decreasing in
    * avg_logp, so bucketing by avg_logp DESC is bucketing by
    * perplexity ASC without the cross-engine exp() — head = lowest
    * perplexity, exactly CCNet's split.
    *
    * Scale: bigram extraction is map-side; the LM is two counting
    * aggregations on the target; scoring is a keyed (w1,w2)/(w1) join;
    * terciles use a per-LANGUAGE window (CCNet buckets per language).
    * At 100 TB the per-lang ntile becomes an approx-quantile cutpoint
    * broadcast (different constants, same dataflow). */
  val ccnetBuckets: Q = Q(
    "n74_ccnet_buckets",
    s"""WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents),
       |big AS (SELECT doc_id, lang, tk[p] AS w1, tk[p + 1] AS w2
       |        FROM (SELECT doc_id, lang, tk,
       |                     unnest(generate_series(1, len(tk) - 1)) AS p
       |              FROM toks)),
       |c2 AS (SELECT w1, w2, count(*) AS c2 FROM big WHERE lang = 'en' GROUP BY w1, w2),
       |c1 AS (SELECT w1, count(*) AS c1 FROM big WHERE lang = 'en' GROUP BY w1),
       |voc AS (SELECT count(DISTINCT w2) AS v FROM big WHERE lang = 'en'),
       |sc AS (SELECT b.doc_id, b.lang,
       |              CAST(count(*) AS BIGINT) AS n_bigrams,
       |              ${davgSql(
            "ln((COALESCE(c2, 0) + 1.0) / (COALESCE(c1, 0) + v))")} AS avg_logp
       |       FROM big b
       |       LEFT JOIN c2 USING (w1, w2) LEFT JOIN c1 USING (w1) CROSS JOIN voc
       |       GROUP BY b.doc_id, b.lang)
       |SELECT doc_id, lang, n_bigrams, avg_logp,
       |       CASE ntile($PplBuckets) OVER (PARTITION BY lang
       |                                     ORDER BY avg_logp DESC, doc_id)
       |            WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
       |FROM sc
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir).documents
    ccnetPerplexityBuckets(docs, docs.filter(col("lang") === "en"))
      .orderBy("doc_id")
  }

  /** Library form of n74: score `docs` under a smoothed bigram LM
    * trained on `target`, bucket per language into head/middle/tail. */
  def ccnetPerplexityBuckets(docs: DataFrame, target: DataFrame): DataFrame = {
    val langOf = docs.select(col("doc_id"), col("lang"))
    val big = TextAnalysis.bigrams(docs).join(langOf, Seq("doc_id"))
    val tbig = TextAnalysis.bigrams(target)
    val c2 = tbig.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = tbig.groupBy("w1").agg(count(lit(1)).as("c1"))
    val voc = tbig.agg(countDistinct(col("w2")).as("v"))
    val sc = big
      .join(c2, Seq("w1", "w2"), "left").join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(voc))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_bigrams"),
        davg(log((coalesce(col("c2"), lit(0L)) + 1.0) /
          (coalesce(col("c1"), lit(0L)) + col("v")))).as("avg_logp"))
    // one ntile evaluation, bucketed by label afterwards (ADVICE r08:
    // a duplicated window expression in the when-chain is correct only
    // while the ORDER BY stays a total order — easy to let drift)
    sc.withColumn("__t", ntile(PplBuckets).over(Window.partitionBy("lang")
        .orderBy(col("avg_logp").desc, col("doc_id"))))
      .withColumn("bucket",
        when(col("__t") === 1, "head")
          .when(col("__t") === 2, "middle")
          .otherwise("tail"))
      .drop("__t")
  }

  /** Shard count for the epoch-shuffle entry. */
  val NumShards = 16
  /** Epoch seed: a new epoch = a new seed = a fresh permutation. */
  val EpochSeed = "epoch1"

  /** Deterministic epoch shuffle: every document gets a seeded hash
    * key; shard = key mod NumShards, within-shard position = rank by
    * (key, doc_id). One hash + one ranked write per epoch — the
    * trainer reads shards sequentially and sees a reproducible global
    * permutation with no RNG state and no driver-side shuffle table.
    * Scale: the window partitions by shard (NumShards-way parallelism
    * at the sort; a 100 TB epoch would raise NumShards to O(total
    * cores), keeping per-shard sorts executor-sized). */
  val epochShard: Q = Q(
    "n75_epoch_shard",
    s"""WITH keyed AS (SELECT doc_id,
       |                      ${hash32Sql(s"'$EpochSeed:' || doc_id")} AS k
       |               FROM documents),
       |sh AS (SELECT doc_id, k, k % $NumShards AS shard FROM keyed)
       |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
       |       CAST(row_number() OVER (PARTITION BY shard ORDER BY k, doc_id)
       |            AS BIGINT) AS pos
       |FROM sh
       |ORDER BY shard, pos""".stripMargin) { (s, dir) =>
    epochShuffle(Tables(s, dir).documents, NumShards, EpochSeed)
      .orderBy("shard", "pos")
  }

  /** Library form of n75: (doc_id, shard, pos) for any doc_id frame. */
  def epochShuffle(docs: DataFrame, nShards: Int, seed: String): DataFrame = {
    val keyed = docs.select(col("doc_id"),
      hash32(concat(lit(s"$seed:"), col("doc_id").cast("string"))).as("k"))
      .withColumn("shard", col("k") % nShards)
    keyed.select(col("doc_id"), col("shard").cast("long").as("shard"),
      row_number().over(Window.partitionBy("shard").orderBy("k", "doc_id"))
        .cast("long").as("pos"))
  }

  /** Soft deduplication: instead of dropping exact/normalized
    * duplicates (n01/n02), down-weight them — each doc's sampling
    * weight is 1/|its duplicate group|, so every GROUP contributes one
    * document's worth of probability mass while byte diversity within
    * the group survives. Reports the per-doc weight and
    * weight-adjusted effective token count (what the mixture planner
    * budgets with). One fingerprint aggregation + one keyed join —
    * n01's exact scale shape. */
  val softDedup: Q = Q(
    "n76_soft_dedup",
    s"""WITH fp AS (SELECT doc_id,
       |                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
       |                   len(string_split(text, ' ')) AS n_tok
       |            FROM documents),
       |grp AS (SELECT fp, count(*) AS dup_count FROM fp GROUP BY fp)
       |SELECT doc_id, dup_count,
       |       ${round6Sql("1.0 / dup_count")} AS weight,
       |       ${round6Sql("CAST(n_tok AS DOUBLE) / dup_count")} AS eff_tokens
       |FROM fp JOIN grp USING (fp)
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    softDedupWeights(Tables(s, dir).documents).orderBy("doc_id")
  }

  /** Library form of n76: (doc_id, dup_count, weight, eff_tokens). */
  def softDedupWeights(docs: DataFrame): DataFrame = {
    val fp = docs.select(col("doc_id"),
      graft.Det.normFingerprint(col("text")).as("fp"),
      size(split(col("text"), " ")).cast("long").as("n_tok"))
    val grp = fp.groupBy("fp").agg(count(lit(1)).as("dup_count"))
    fp.join(grp, Seq("fp"))
      .select(col("doc_id"), col("dup_count"),
        round6(lit(1.0) / col("dup_count")).as("weight"),
        round6(col("n_tok").cast("double") / col("dup_count")).as("eff_tokens"))
  }

  /** Temperature-scaled source mixing (the mT5/mC4 recipe, Xue et al.
    * 2021 §3.1): sampling shares q_s ∝ p_s^α with p_s the source's
    * TOKEN share and α < 1 — low-resource sources are boosted, head
    * sources suppressed, smoothly between proportional (α=1) and
    * uniform (α=0). The selection itself is the repo's deterministic
    * md5-rank draw (n27's idiom), so the whole mix — not just the
    * rates — is hash-checked.
    *
    * Determinism: p_s is an exact integer ratio; pow(p, α) is the one
    * transcendental, round6'd immediately (cross-engine libm pow
    * differences are ulps, far below the 5e-7 guard); the normalizer
    * Z DECIMAL-sums the rounded shares; per-source targets are
    * floor((T·q)/Z) over identical inputs. Scale shape: one
    * map-side-combinable token-count agg, two 1-row/`|sources|`-row
    * broadcast frames, one per-source rank window (parallelism =
    * source count — the n69 mega-source note applies). */
  def temperatureMix(docs: DataFrame, total: Long, alpha: Double,
      seed: String): DataFrame = {
    val bySrc = docs
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("__ntok"))
      .groupBy("source")
      .agg(count(lit(1)).as("__n_docs"), sum(col("__ntok")).as("__n_toks"))
    val tot = bySrc.agg(sum(col("__n_toks")).as("__tot"))
    val q = bySrc.crossJoin(broadcast(tot))
      .select(col("source"),
        round6(pow(col("__n_toks").cast("double") / col("__tot"), alpha)).as("__q"))
    val z = q.agg(dsum(col("__q")).as("__z"))
    val tgt = q.crossJoin(broadcast(z))
      .select(col("source"),
        floor((lit(total.toDouble) * col("__q")) / col("__z"))
          .cast("long").as("target_n"))
    val w = Window.partitionBy("source")
      .orderBy(md5(concat(lit(s"$seed:"), col("doc_id").cast("string"))
        .cast("binary")), col("doc_id"))
    docs.select(col("source"), col("doc_id"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .join(broadcast(tgt), Seq("source"))
      .filter(col("rk") <= col("target_n"))
      .select(col("source"), col("doc_id"), col("rk"), col("target_n"))
  }

  /** n84 constants — part of the entry's contract. */
  val MixTotal = 200L
  val MixAlpha = 0.3
  val MixSeed = "mix-epoch0"

  val temperatureMixQ: Q = Q(
    "n84_temperature_mix",
    s"""WITH t AS (SELECT source, doc_id,
       |                 CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
       |          FROM documents),
       |s AS (SELECT source, count(*) AS n_docs, sum(ntok) AS n_toks FROM t GROUP BY source),
       |tot AS (SELECT sum(n_toks) AS tot FROM s),
       |q AS (SELECT source, ${round6Sql(s"pow(CAST(n_toks AS DOUBLE) / tot, $MixAlpha)")} AS q
       |      FROM s CROSS JOIN tot),
       |z AS (SELECT ${dsumSql("q")} AS z FROM q),
       |tgt AS (SELECT source, CAST(floor(($MixTotal.0 * q) / z) AS BIGINT) AS target_n
       |        FROM q CROSS JOIN z),
       |rk AS (SELECT source, doc_id,
       |              CAST(row_number() OVER (PARTITION BY source
       |                ORDER BY md5('$MixSeed:' || doc_id), doc_id) AS BIGINT) AS rk
       |       FROM t)
       |SELECT rk.source, rk.doc_id, rk.rk, tgt.target_n
       |FROM rk JOIN tgt USING (source)
       |WHERE rk.rk <= tgt.target_n
       |ORDER BY source, doc_id""".stripMargin) { (s, dir) =>
    temperatureMix(Tables(s, dir).documents, MixTotal, MixAlpha, MixSeed)
      .orderBy("source", "doc_id")
  }

  val all: Seq[Q] = Seq(dsirSelect, ccnetBuckets, epochShard, softDedup,
    temperatureMixQ)
}
