package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.Det._

/** Text-analysis operators for training-data pipelines (north star):
  * per-language corpus stats, per-document quality scoring, token
  * statistics, marker-word language ID, and content fingerprinting.
  * All arithmetic is exact (integer counts, int/int double division,
  * DECIMAL sums) so every query is oracle-checked.
  */
object TextAnalysis {

  /** Corpus statistics per language tag. */
  val langStats: Q = Q(
    "n20_lang_stats",
    """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |       CAST(CAST(sum(n_chars) AS DOUBLE) / count(*) AS DOUBLE) AS avg_chars,
      |       CAST(min(n_chars) AS BIGINT) AS min_chars,
      |       CAST(max(n_chars) AS BIGINT) AS max_chars
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin) { (s, dir) =>
    Tables(s, dir).documents
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy("lang")
  }

  /** Per-document quality score from cheap lexical features: token
    * count, type/token ratio, stopword ratio, mean token length.
    * Weighted combination in exact double arithmetic. */
  val qualityScore: Q = Q(
    "n21_quality_score",
    """WITH f AS (
      |  SELECT doc_id,
      |         string_split(text, ' ') AS w
      |  FROM documents),
      |feat AS (
      |  SELECT doc_id,
      |         CAST(len(w) AS BIGINT) AS n_tokens,
      |         CAST(len(list_distinct(w)) AS BIGINT) AS n_uniq,
      |         CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT) AS sum_len,
      |         CAST(len(list_filter(w, x -> x = 'the' OR x = 'a' OR x = 'of'
      |                                   OR x = 'and' OR x = 'in')) AS BIGINT) AS n_stop
      |  FROM f)
      |SELECT doc_id, n_tokens, n_uniq,
      |       CAST(sum_len AS DOUBLE) / n_tokens AS avg_tok_len,
      |       CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
      |       0.4 * (CAST(n_uniq AS DOUBLE) / n_tokens)
      |         + 0.4 * (1 - CAST(n_stop AS DOUBLE) / n_tokens)
      |         + 0.2 * least(CAST(n_tokens AS DOUBLE) / 100, CAST(1 AS DOUBLE)) AS quality
      |FROM feat
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val stop = Seq("the", "a", "of", "and", "in")
    Tables(s, dir).documents
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(
        col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        size(array_distinct(col("w"))).cast("long").as("n_uniq"),
        aggregate(transform(col("w"), x => length(x)), lit(0),
          (acc, x) => acc + x).cast("long").as("sum_len"),
        size(filter(col("w"), x => x.isin(stop: _*))).cast("long").as("n_stop"))
      .select(
        col("doc_id"), col("n_tokens"), col("n_uniq"),
        (col("sum_len").cast("double") / col("n_tokens")).as("avg_tok_len"),
        (col("n_stop").cast("double") / col("n_tokens")).as("stop_ratio"),
        (lit(0.4) * (col("n_uniq").cast("double") / col("n_tokens"))
          + lit(0.4) * (lit(1) - col("n_stop").cast("double") / col("n_tokens"))
          + lit(0.2) * least(col("n_tokens").cast("double") / 100, lit(1.0)))
          .as("quality"))
      .orderBy("doc_id")
  }

  /** Token statistics per source: whitespace tokens and a BPE-ish
    * regexp tokenizer ([a-z]+ | digit runs | single non-space). */
  val tokenStats: Q = Q(
    "n22_token_stats",
    """SELECT source,
      |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_ws_tokens,
      |       CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS n_re_tokens,
      |       CAST(count(*) AS BIGINT) AS n_docs
      |FROM documents
      |GROUP BY source
      |ORDER BY source""".stripMargin) { (s, dir) =>
    Tables(s, dir).documents
      .groupBy("source")
      .agg(
        sum(size(split(col("text"), " "))).cast("long").as("n_ws_tokens"),
        sum(size(regexp_extract_all(col("text"),
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))).cast("long").as("n_re_tokens"),
        count(lit(1)).as("n_docs"))
      .orderBy("source")
  }

  /** Marker-word language ID (n-gram heuristic, deterministic argmax
    * with 'und' on ties) compared against the labeled lang. */
  val langId: Q = Q(
    "n23_lang_id",
    """WITH f AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
      |scores AS (
      |  SELECT doc_id, lang,
      |         CAST(len(list_filter(w, x -> x = 'the' OR x = 'is' OR x = 'and')) AS BIGINT) AS s_en,
      |         CAST(len(list_filter(w, x -> x = 'le' OR x = 'la' OR x = 'et')) AS BIGINT) AS s_fr,
      |         CAST(len(list_filter(w, x -> x = 'el' OR x = 'los' OR x = 'y')) AS BIGINT) AS s_es
      |  FROM f)
      |SELECT doc_id, lang,
      |       CASE WHEN s_en > s_fr AND s_en > s_es THEN 'en'
      |            WHEN s_fr > s_en AND s_fr > s_es THEN 'fr'
      |            WHEN s_es > s_en AND s_es > s_fr THEN 'es'
      |            ELSE 'und' END AS guessed,
      |       s_en, s_fr, s_es
      |FROM scores
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    def score(words: Seq[String]) =
      size(filter(col("w"), x => x.isin(words: _*))).cast("long")
    Tables(s, dir).documents
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("lang"),
        score(Seq("the", "is", "and")).as("s_en"),
        score(Seq("le", "la", "et")).as("s_fr"),
        score(Seq("el", "los", "y")).as("s_es"))
      .select(col("doc_id"), col("lang"),
        when(col("s_en") > col("s_fr") && col("s_en") > col("s_es"), "en")
          .when(col("s_fr") > col("s_en") && col("s_fr") > col("s_es"), "fr")
          .when(col("s_es") > col("s_en") && col("s_es") > col("s_fr"), "es")
          .otherwise("und").as("guessed"),
        col("s_en"), col("s_fr"), col("s_es"))
      .orderBy("doc_id")
  }

  /** Content fingerprint: md5 over the normalized text plus a 4-hex
    * shard prefix (the bucketing key a 100 TB dedup would shuffle on). */
  val fingerprint: Q = Q(
    "n24_fingerprint",
    """SELECT doc_id,
      |       md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
      |       substr(md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))), 1, 4) AS shard
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val fp = graft.Det.normFingerprint(col("text"))
    Tables(s, dir).documents
      .select(col("doc_id"), fp.as("fp"), substring(fp, 1, 4).as("shard"))
      .orderBy("doc_id")
  }

  val RollingWindow = 8
  /** Mersenne prime 2³¹−1: every mod-p product fits in a Long. */
  val P = 2147483647L
  /** Polynomial base < 2³¹ (t·B^(w-1) stays under p²). */
  val B = 1000003L

  /** Rabin–Karp rolling fingerprints: polynomial hash of every
    * `Window`-token window, advanced in O(1) per token
    * (h' = (h − t_out·B^(w−1))·B + t_in, all mod p = 2³¹−1). The
    * per-window hash set is the containment-search fingerprint
    * (detects copied passages, not just whole-doc dups). Typed
    * partition-wise op.
    *
    * Portability: token hash = first 4 md5 bytes mod p, window hash in
    * mod-p arithmetic — both computable in DuckDB (hex cast +
    * list_reduce Horner), so the oracle recomputes every window
    * directly while Spark rolls in O(1); RollingHashSpec additionally
    * proves rolling == direct. Tokenizer is split-keep-empties to
    * match SQL string_split. */
  /** (doc_id, win_hash) rows for every RollingWindow-token window —
    * the ONE Spark-side implementation of the Rabin–Karp fingerprint
    * stream, shared by n25, the contamination screen (n26) and specs
    * so the tokenizer/hash can never drift between them. */
  def windowHashes(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.Encoders
    docs.select(col("doc_id"), col("text"))
      .as(Encoders.product[(Long, String)])
      .mapPartitions(_.flatMap { case (id, text) =>
        rollingHashes(text.split(" ", -1), RollingWindow).zipWithIndex
          .map { case (h, pos) => (id, pos.toLong, h) }
      })(Encoders.product[(Long, Long, Long)])
      .toDF("doc_id", "pos", "win_hash")
  }

  val rollingFingerprint: Q = Q(
    "n25_rolling_fingerprint",
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |pos AS (SELECT doc_id, tk,
       |               unnest(generate_series(1, greatest(len(tk) - ${RollingWindow - 1}, 0))) AS p
       |        FROM toks)
       |SELECT doc_id, CAST(p - 1 AS BIGINT) AS pos,
       |       list_reduce(list_transform(tk[p:p+${RollingWindow - 1}],
       |         t -> ('0x' || substr(md5(t), 1, 8))::BIGINT % $P),
       |         (a, b) -> (a * $B + b) % $P) AS win_hash
       |FROM pos
       |ORDER BY doc_id, pos""".stripMargin) { (s, dir) =>
    windowHashes(Tables(s, dir).documents).orderBy("doc_id", "pos")
  }


  /** Token hash: first 4 md5 bytes (big-endian unsigned = the first 8
    * hex chars) mod p — the exact value DuckDB's hex cast computes. */
  def tokenHash(tok: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8"))
    val v = ((md(0) & 0xffL) << 24) | ((md(1) & 0xffL) << 16) |
      ((md(2) & 0xffL) << 8) | (md(3) & 0xffL)
    v % P
  }

  /** All w-token window hashes of a token stream, each advanced in
    * O(1) from the previous (true rolling update, mod-p). */
  def rollingHashes(tokens: Array[String], w: Int): Seq[Long] = {
    if (tokens.length < w) return Seq.empty
    val t = tokens.map(tokenHash)
    var bw = 1L // B^(w-1) mod p
    var i = 0
    while (i < w - 1) { bw = bw * B % P; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = (h * B + t(i)) % P; i += 1 }
    val out = new Array[Long](tokens.length - w + 1)
    out(0) = h
    i = 1
    while (i <= tokens.length - w) {
      h = ((h + P - t(i - 1) * bw % P) % P * B + t(i + w - 1)) % P
      out(i) = h
      i += 1
    }
    out.toSeq
  }

  /** Unigram log-probability scoring — the perplexity-proxy quality
    * filter: score each document by the mean ln p(token) under the
    * corpus's own unigram distribution (low score = rare/garbled
    * tokens). Two shuffles: the unigram counts, then the token⋈counts
    * join keyed on the token. ln is bit-identical across engines on
    * these inputs (verified digit-for-digit in round 2's f04 work);
    * the mean uses the DECIMAL-sum machinery. */
  val unigramLogProb: Q = Q(
    "n28_unigram_logprob",
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |total AS (SELECT count(*) AS n FROM tok),
       |uni AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok)
       |SELECT doc_id,
       |       CAST(count(*) AS BIGINT) AS n_tokens,
       |       ${davgSql("ln(CAST(c AS DOUBLE) / n)")} AS avg_logp
       |FROM tok JOIN uni USING (tok) CROSS JOIN total
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val tok = Tables(s, dir).documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val uni = tok.groupBy("tok").agg(count(lit(1)).as("c"))
    // total token count re-aggregated from the unigram counts (Σ_tok c
    // ≡ count of token instances) instead of a second tokenize pass —
    // ReuseExchange then computes the tokenize+count shuffle once
    // (round 15, guide §1.2)
    val total = uni.agg(coalesce(sum(col("c")), lit(0L)).as("n"))
    tok.join(uni, Seq("tok")).crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        davg(log(col("c").cast("double") / col("n"))).as("avg_logp"))
      .orderBy("doc_id")
  }

  /** Bigram extraction as a MAP-SIDE array transform: adjacent token
    * pairs come straight out of the split array (no posexplode + window
    * sort — at 100 TB a per-token window shuffle would dwarf the two
    * count aggregations that follow). Docs with < 2 tokens contribute
    * no bigrams (the size filter — Spark's sequence(0,-1) would
    * otherwise DESCEND, and explode of the empty transform emits
    * nothing anyway). */
  def bigrams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(
        expr("transform(sequence(0, size(tk) - 2), " +
          "i -> named_struct('w1', tk[i], 'w2', tk[i + 1]))"))
        .as("bg"))
      .select(col("doc_id"), col("bg.w1"), col("bg.w2"))

  /** Bigram log-probability scoring — the second-order companion to
    * n28: score each document by the mean ln p(w2 | w1) under the
    * corpus's own MLE bigram model. The conditional denominator is the
    * count of w1 AS A BIGRAM PREFIX (= Σ_w c(w1,w), so the conditional
    * distribution sums to exactly 1 — no end-of-document leakage), and
    * every observed bigram has count ≥ 1, so no smoothing is needed
    * and the log is always finite. A fluency filter one notch sharper
    * than unigram scoring: word-salad documents built from common
    * tokens pass n28 but fail here.
    *
    * Scale shape: bigram extraction is map-side ([[bigrams]]); then two
    * partial-aggregated counts (prefix counts, bigram counts) and one
    * join keyed on the bigram — the same two-shuffle budget as n28.
    * ln on an int/int double ratio is bit-identical across engines
    * (n28's proven rule); the mean uses the DECIMAL-sum machinery. */
  val bigramLogProb: Q = Q(
    "n51_bigram_logprob",
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |big AS (SELECT doc_id, tk[p] AS w1, tk[p + 1] AS w2
       |        FROM (SELECT doc_id, tk,
       |                     unnest(generate_series(1, len(tk) - 1)) AS p
       |              FROM toks)),
       |pre AS (SELECT w1, count(*) AS c1 FROM big GROUP BY w1),
       |bi AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY w1, w2)
       |SELECT doc_id,
       |       CAST(count(*) AS BIGINT) AS n_bigrams,
       |       ${davgSql("ln(CAST(c2 AS DOUBLE) / c1)")} AS avg_logp
       |FROM big JOIN bi USING (w1, w2) JOIN pre USING (w1)
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val big = bigrams(Tables(s, dir).documents)
    val bi = big.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    // prefix counts re-aggregated from the bigram counts (Σ_w2 c2 ≡
    // count of w1-as-prefix instances) instead of a second bigram
    // extraction pass — ReuseExchange computes the extract+count
    // shuffle once (round 15, guide §1.2)
    val pre = bi.groupBy("w1").agg(sum(col("c2")).as("c1"))
    big.join(bi, Seq("w1", "w2")).join(pre, Seq("w1"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        davg(log(col("c2").cast("double") / col("c1"))).as("avg_logp"))
      .orderBy("doc_id")
  }

  /** TF-IDF top terms per document — the classic keyword/topic
    * extraction a curation pipeline uses for domain tagging and
    * mixture construction (n46's buckets, but content-derived).
    * Smoothed idf = ln((N+1)/(df+1)) + 1 (the scikit-learn
    * formulation); scores are round6'd BEFORE ranking so the
    * (tfidf desc, tok) order is identical in both engines.
    * Scale shape: two map-side-combinable aggregations — (doc, tok)
    * term counts, then tok document frequencies — a broadcast 1-row
    * corpus size, and a per-doc window whose parallelism is the
    * document count. Nothing is driver-side, nothing all-pairs. */
  val tfidfTop: Q = {
    val k = 3
    Q(
      "n50_tfidf_topterms",
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
         |       FROM tok GROUP BY doc_id, tok),
         |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
         |nd AS (SELECT count(*) AS n FROM documents),
         |scored AS (SELECT doc_id, tok, tf,
         |                  ${round6Sql("tf * (ln((n + 1.0) / (df + 1.0)) + 1.0)")} AS tfidf
         |           FROM tf JOIN dfreq USING (tok) CROSS JOIN nd),
         |ranked AS (SELECT doc_id, tok, tf, tfidf,
         |                  row_number() OVER (PARTITION BY doc_id
         |                                     ORDER BY tfidf DESC, tok) AS rn
         |           FROM scored)
         |SELECT doc_id, tok, tf, tfidf, CAST(rn AS BIGINT) AS rn
         |FROM ranked WHERE rn <= $k
         |ORDER BY doc_id, rn""".stripMargin) { (s, dir) =>
      tfidfTopTerms(Tables(s, dir).documents, k).orderBy("doc_id", "rn")
    }
  }

  /** Library form of n50: top-k terms per document by smoothed TF-IDF
    * over any (doc_id, text) frame. */
  def tfidfTopTerms(docs: DataFrame, k: Int): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val tf = tok.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val nd = docs.agg(count(lit(1)).as("n"))
    val scored = tf.join(dfreq, Seq("tok")).crossJoin(broadcast(nd))
      .select(col("doc_id"), col("tok"), col("tf"),
        round6(col("tf") * (log((col("n") + 1.0) / (col("df") + 1.0)) + 1.0))
          .as("tfidf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("tfidf").desc, col("tok"))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** BM25 corpus search (Robertson–Spärck Jones; the Okapi k1/b
    * formulation) — the retrieval op a curation pipeline runs for
    * benchmark decontamination lookup, data attribution and targeted
    * corpus audits: score every document against a bounded query set
    * and keep the top-k per query.
    *
    * Determinism: each (query, doc, term) contribution — idf ·
    * tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) — is per-row IEEE math with
    * identical parenthesization in both engines, round6'd, then
    * DECIMAL-summed per (query, doc) (order-independent), so the
    * (score desc, doc_id) rank is total and cross-engine identical.
    * avgdl = exact integer token sum / doc count.
    *
    * Scale shape: tokens filtered to the QUERY vocabulary before any
    * aggregation (broadcast semi-filter — the query set is bounded by
    * construction), so tf/df/score frames are all query-vocab-sized,
    * not corpus-vocab-sized; corpus stats are a broadcast 1-row agg
    * (TinyAggBroadcast); the rank window partitions by query. At
    * 100 TB the only corpus-proportional work is the scan + map-side
    * token filter. */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = queries.select("term").distinct()
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .join(broadcast(terms), Seq("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).cast("long").as("tf"))
    val dl = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val contrib = tf
      .join(tf.groupBy("term").agg(count_distinct(col("doc_id")).as("df")), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .join(queries, Seq("term"))
      .select(col("q_id"), col("doc_id"),
        graft.Det.round6(
          log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)) *
            (col("tf") * (k1 + 1.0)) /
            (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / col("avgdl"))))
          .as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("score").desc, col("doc_id"))
    contrib.groupBy("q_id", "doc_id")
      .agg(graft.Det.dsum(col("c")).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Catalog query set for n83 — bounded and literal, the
    * decontamination-lookup shape (a benchmark suite's probe strings
    * tokenized into term bags). Shared with n91's index probe
    * ([[LexIndex]]), whose oracle is exactly n83's answer. */
  private[graft] def bm25QuerySet: Seq[(Long, String)] = Bm25Queries
  private val Bm25Queries: Seq[(Long, String)] = Seq(
    1L -> "table", 1L -> "scan",
    2L -> "window", 2L -> "agg",
    3L -> "vector", 3L -> "stream", 3L -> "join")

  val bm25: Q = {
    val k = 10
    val qVals = Bm25Queries.map { case (q, t) => s"($q, '$t')" }.mkString(", ")
    Q(
      "n83_bm25_search",
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
         |rk AS (SELECT q_id, doc_id, score,
         |              row_number() OVER (PARTITION BY q_id
         |                                 ORDER BY score DESC, doc_id) AS rank
         |       FROM agg)
         |SELECT CAST(q_id AS BIGINT) AS q_id, CAST(rank AS BIGINT) AS rank,
         |       doc_id, score
         |FROM rk WHERE rank <= $k
         |ORDER BY q_id, rank""".stripMargin) { (s, dir) =>
      import s.implicits._
      val queries = Bm25Queries.toDF("q_id", "term")
      bm25TopK(Tables(s, dir).documents, queries, k)
        .select(col("q_id"), col("rank"), col("doc_id"), col("score"))
        .orderBy("q_id", "rank")
    }
  }

  /** Graded nDCG@k of an arbitrary ranking against arbitrary relevance
    * labels (the general form of n108, exposed on the API facade).
    * `ranking`: (q_id, doc_id, rank); `rel`: (q_id, doc_id, rel) —
    * docs absent from `rel` count as grade 0 (zero gain, dropped by
    * the join), and a ranking whose top-k holds NO relevant doc
    * scores an honest 0.0 rather than losing its row (the n110
    * hybrid-arm eval hits this; idcg drives the output keys since
    * every judged query has an ideal). Returns (q_id, dcg, idcg,
    * ndcg). Determinism: gains
    * 2^rel − 1 are exact; each rank term is round6'd before the
    * DECIMAL-exact sum; the ideal ranking ties on doc_id (the tiebreak
    * never changes IDCG's value — equal grades contribute equal
    * terms — it only makes the plan deterministic). */
  def ndcgAtK(ranking: DataFrame, rel: DataFrame, k: Int): DataFrame = {
    def gainTerm(rank: Column): Column =
      graft.Det.round6((pow(lit(2.0), col("rel")) - 1.0) / log2(rank + 1.0))
    val dcg = ranking.filter(col("rank") <= k)
      .join(rel, Seq("q_id", "doc_id"))
      .select(col("q_id"), gainTerm(col("rank")).as("g"))
      .groupBy("q_id").agg(graft.Det.dsum(col("g")).as("dcg"))
    val wI = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("rel").desc, col("doc_id"))
    val idcg = rel.withColumn("irk", row_number().over(wI).cast("long"))
      .filter(col("irk") <= k)
      .select(col("q_id"), gainTerm(col("irk")).as("g"))
      .groupBy("q_id").agg(graft.Det.dsum(col("g")).as("idcg"))
    idcg.join(dcg, Seq("q_id"), "left")
      .select(col("q_id"), coalesce(col("dcg"), lit(0.0)).as("dcg"),
        col("idcg"),
        graft.Det.round6(
          coalesce(col("dcg"), lit(0.0)) / col("idcg")).as("ndcg"))
  }

  /** Capped-term-frequency graded relevance (n108's label rule):
    * rel(q, d) = Σ_{t ∈ q} min(tf(d, t), 3) over docs containing at
    * least one query term. */
  def cappedTfRelevance(docs: DataFrame, queries: DataFrame,
      cap: Int = 3): DataFrame = {
    val terms = queries.select("term").distinct()
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .join(broadcast(terms), Seq("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .join(broadcast(queries), Seq("term"))
      .groupBy("q_id", "doc_id")
      .agg(sum(least(col("tf"), lit(cap.toLong))).cast("long").as("rel"))
  }

  /** n108: GRADED ranking evaluation (nDCG@k, Järvelin & Kekäläinen
    * 2002) of the n83 BM25 ranking — the eval-harness op that closes
    * the retrieval family's measurement loop: n70/n88 measure recall
    * of approximate ANN paths against exact ones; this entry measures
    * ranking QUALITY against graded relevance. Labels are derived
    * deterministically from the corpus itself: rel(q, d) =
    * Σ_{t ∈ q} min(tf(d, t), 3) — a capped-term-frequency grade.
    * The cap keeps one spammy term from dominating, and the grade
    * deliberately DIFFERS from BM25's idf/length-normalized objective,
    * so the measurement discriminates (nDCG < 1) while needing no
    * external judgment file — the oracle re-derives everything.
    * DCG@k = Σ_{r≤k} (2^rel − 1)/log2(r+1) over the BM25 top-k; the
    * ideal ranking sorts ALL labeled documents by (rel desc, doc_id)
    * — nDCG = DCG/IDCG per query.
    *
    * Determinism: rel is an exact integer count; gains 2^rel − 1 are
    * exact small doubles; each rank term is per-row IEEE math round6'd
    * before the DECIMAL-exact sum (the n83 pattern); the final ratio
    * is one IEEE division, round6'd.
    *
    * Scale: rides n83's broadcast-semi-filtered token pass (the only
    * corpus-proportional stage); rel and the ideal ranking live on the
    * query-vocab-filtered frame (bounded by docs-containing-query-
    * terms); the ideal-rank window partitions by query. */
  val ndcgEval: Q = {
    val k = 10
    val qVals = Bm25Queries.map { case (q, t) => s"($q, '$t')" }.mkString(", ")
    Q(
      "n108_ndcg_eval",
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
         |rk AS (SELECT q_id, doc_id, score,
         |              row_number() OVER (PARTITION BY q_id
         |                                 ORDER BY score DESC, doc_id) AS rank
         |       FROM agg),
         |rel AS (SELECT q.q_id, t.doc_id,
         |               CAST(sum(LEAST(t.tf, 3)) AS BIGINT) AS rel
         |        FROM tf t JOIN q ON q.term = t.term
         |        GROUP BY q.q_id, t.doc_id),
         |dcgt AS (SELECT r.q_id,
         |                ${round6Sql(
                   "(power(2.0, rel) - 1.0) / log2(r.rank + 1.0)")} AS g
         |         FROM rk r JOIN rel ON rel.q_id = r.q_id AND rel.doc_id = r.doc_id
         |         WHERE r.rank <= $k),
         |ideal AS (SELECT q_id, rel,
         |                 row_number() OVER (PARTITION BY q_id
         |                                    ORDER BY rel DESC, doc_id) AS irk
         |          FROM rel),
         |idcgt AS (SELECT q_id,
         |                 ${round6Sql(
                    "(power(2.0, rel) - 1.0) / log2(irk + 1.0)")} AS g
         |          FROM ideal WHERE irk <= $k),
         |dcg AS (SELECT q_id, ${dsumSql("g")} AS dcg FROM dcgt GROUP BY q_id),
         |idcg AS (SELECT q_id, ${dsumSql("g")} AS idcg FROM idcgt GROUP BY q_id)
         |SELECT CAST(d.q_id AS BIGINT) AS q_id, d.dcg, i.idcg,
         |       ${round6Sql("d.dcg / i.idcg")} AS ndcg
         |FROM dcg d JOIN idcg i ON i.q_id = d.q_id
         |ORDER BY q_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val queries = Bm25Queries.toDF("q_id", "term")
      val docs = Tables(s, dir).documents
      val top = bm25TopK(docs, queries, k).select("q_id", "doc_id", "rank")
      ndcgAtK(top, cappedTfRelevance(docs, queries), k).orderBy("q_id")
    }
  }

  /** DuckDB nDCG@k body over an arbitrary ranking subquery (yielding
    * (q_id, doc_id, r)) graded by the capped-tf relevance rule — the
    * SQL form of [[ndcgAtK]] ∘ [[cappedTfRelevance]], shared by
    * n110's three system branches. A ranking whose top-k holds no
    * relevant doc reads an honest 0.0 (idcg drives the keys), matching
    * [[ndcgAtK]]'s left-join convention. */
  private[graft] def ndcgSqlOver(rankingSql: String, k: Int): String = {
    val qVals = Bm25Queries.map { case (q, t) => s"($q, '$t')" }.mkString(", ")
    s"""WITH q(q_id, term) AS (VALUES $qVals),
       |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |tfq AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       |        FROM tok WHERE term IN (SELECT term FROM q)
       |        GROUP BY doc_id, term),
       |rel AS (SELECT q.q_id, t.doc_id, CAST(sum(LEAST(t.tf, 3)) AS BIGINT) AS rel
       |        FROM tfq t JOIN q ON q.term = t.term
       |        GROUP BY q.q_id, t.doc_id),
       |rk AS (SELECT q_id, doc_id, r FROM (
       |$rankingSql
       |)),
       |dcgt AS (SELECT r.q_id,
       |                ${round6Sql("(power(2.0, rel) - 1.0) / log2(r.r + 1.0)")} AS g
       |         FROM rk r JOIN rel ON rel.q_id = r.q_id AND rel.doc_id = r.doc_id
       |         WHERE r.r <= $k),
       |ideal AS (SELECT q_id, rel,
       |                 row_number() OVER (PARTITION BY q_id
       |                                    ORDER BY rel DESC, doc_id) AS irk
       |          FROM rel),
       |idcgt AS (SELECT q_id,
       |                 ${round6Sql("(power(2.0, rel) - 1.0) / log2(irk + 1.0)")} AS g
       |          FROM ideal WHERE irk <= $k),
       |dcg AS (SELECT q_id, ${dsumSql("g")} AS dcg FROM dcgt GROUP BY q_id),
       |idcg AS (SELECT q_id, ${dsumSql("g")} AS idcg FROM idcgt GROUP BY q_id)
       |SELECT CAST(i.q_id AS BIGINT) AS q_id, COALESCE(d.dcg, 0.0) AS dcg,
       |       i.idcg, ${round6Sql("COALESCE(d.dcg, 0.0) / i.idcg")} AS ndcg
       |FROM idcg i LEFT JOIN dcg d ON d.q_id = i.q_id""".stripMargin
  }

  /** Payload redaction — the PII-scrub shape every training pipeline
    * runs before ingest: mask sensitive spans (here: numeric literals
    * in the event props — the corpus stand-in for phone/account
    * numbers), count what was masked per record, and keep the plumbing
    * columnar (codegen'd regexp ops; patterns restricted to the
    * RE2∩Java-regex subset both engines execute identically, the f03
    * rule). */
  val redact: Q = Q(
    "n29_redact",
    """SELECT event_id,
      |       regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS scrubbed,
      |       CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS n_redacted
      |FROM events
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    Tables(s, dir).events.select(
      col("event_id"),
      regexp_replace(col("props"), "[0-9]+", "<NUM>").as("scrubbed"),
      size(regexp_extract_all(col("props"), lit("[0-9]+"), lit(0)))
        .cast("long").as("n_redacted"))
      .orderBy("event_id")
  }

  /** Within-document repetition metrics — the Gopher-family quality
    * filter (Rae et al. 2021 §A1.1 shape): most-frequent-token
    * fraction and duplicate 2-/3-gram fractions. High values flag
    * boilerplate/spam/generated loops that per-corpus dedup cannot see.
    * Entirely map-side array expressions (zero shuffles, zero explode).
    * The top-token count is max run length over the SORTED token array
    * — O(L log L) per document (round-4 fix: the former
    * distinct×filter scan was O(L·distinct), i.e. quadratic in
    * document length, and one adversarial 1 M-token doc would pin a
    * single task for ~10¹² comparisons). The DuckDB twin computes the
    * same integer via per-doc unnest + GROUP BY max(count) — different
    * route, identical exact counts, so the oracle hash is unchanged.
    * Every ratio is one IEEE division, identical in both engines. */
  val repetition: Q = Q(
    "n34_repetition",
    """WITH f AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |g AS (SELECT doc_id, w,
      |             list_transform(generate_series(1, greatest(len(w) - 1, 0)),
      |                            i -> w[i] || ' ' || w[i+1]) AS g2,
      |             list_transform(generate_series(1, greatest(len(w) - 2, 0)),
      |                            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS g3
      |      FROM f),
      |toks AS (SELECT doc_id, unnest(w) AS tok FROM f),
      |cnts AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok),
      |tops AS (SELECT doc_id, max(c) AS top_cnt FROM cnts GROUP BY doc_id)
      |SELECT doc_id,
      |       CAST(len(w) AS BIGINT) AS n_tokens,
      |       CAST(top_cnt AS DOUBLE) / len(w) AS top_tok_frac,
      |       CASE WHEN len(g2) = 0 THEN 0.0
      |            ELSE 1 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2)
      |       END AS dup_2gram_frac,
      |       CASE WHEN len(g3) = 0 THEN 0.0
      |            ELSE 1 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3)
      |       END AS dup_3gram_frac
      |FROM g JOIN tops USING (doc_id)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    repetitionMetrics(Tables(s, dir).documents).orderBy("doc_id")
  }

  /** Library form of n34: (doc_id, n_tokens, top_tok_frac,
    * dup_2gram_frac, dup_3gram_frac) for any (doc_id, text) frame. */
  def repetitionMetrics(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      // Spark's sequence(1, 0) yields a DESCENDING [1, 0], not empty —
      // guard short docs explicitly (DuckDB's generate_series is empty)
      .withColumn("g2", expr(
        """CASE WHEN size(w) >= 2
          |     THEN transform(sequence(1, size(w) - 1),
          |            i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))
          |     ELSE array() END""".stripMargin))
      .withColumn("g3", expr(
        """CASE WHEN size(w) >= 3
          |     THEN transform(sequence(1, size(w) - 2),
          |            i -> concat(element_at(w, i), ' ', element_at(w, i + 1),
          |                        ' ', element_at(w, i + 2)))
          |     ELSE array() END""".stripMargin))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        // max multiplicity = max run length over the sorted array:
        // one O(L log L) sort + one linear fold, never L × distinct
        expr("""CAST(aggregate(array_sort(w),
               |  named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'best', 0),
               |  (acc, x) -> named_struct(
               |    'prev', x,
               |    'run',  IF(x <=> acc.prev, acc.run + 1, 1),
               |    'best', GREATEST(acc.best, IF(x <=> acc.prev, acc.run + 1, 1))),
               |  acc -> acc.best) AS DOUBLE) / size(w)"""
          .stripMargin).as("top_tok_frac"),
        expr("IF(size(g2) = 0, 0.0D, " +
          "1.0D - CAST(size(array_distinct(g2)) AS DOUBLE) / size(g2))")
          .as("dup_2gram_frac"),
        expr("IF(size(g3) = 0, 0.0D, " +
          "1.0D - CAST(size(array_distinct(g3)) AS DOUBLE) / size(g3))")
          .as("dup_3gram_frac"))

  /** Corpus-wide heavy hitters: exact top-20 tokens by count. The plan
    * is one shuffle of (token, partial count) pairs + TakeOrdered —
    * never a global sort of the vocabulary; the final rank window runs
    * over the 20 surviving rows only. The CountMinSketch variant (one
    * pass, mergeable, no token shuffle at all) is the library/scale
    * path — CorpusSpec proves its estimates bound these exact counts
    * within ε·N. */
  val heavyHitters: Q = Q(
    "n35_heavy_hitters",
    """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |counts AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY tok),
      |ranked AS (SELECT tok, n,
      |                  row_number() OVER (ORDER BY n DESC, tok) AS rn
      |           FROM counts)
      |SELECT tok, n, CAST(rn AS BIGINT) AS rn
      |FROM ranked WHERE rn <= 20
      |ORDER BY rn""".stripMargin) { (s, dir) =>
    val counts = Tables(s, dir).documents
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
    val top = counts.orderBy(col("n").desc, col("tok")).limit(20)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("tok"))
    top.withColumn("rn", row_number().over(w).cast("long")).orderBy("rn")
  }

  /** CountMinSketch heavy hitters, FULLY hash-oracled (round 4 —
    * VERDICT_r03 #3; the library CMS was previously only spec-bounded).
    * The sketch is built from first principles as a d×w cell relation
    * (row r, bucket = md5-derived hash of "r:token" mod w, count),
    * which is ONE shuffle of (r, bucket) partial counts — map-side
    * combine caps the shuffle at d·w rows per partition regardless of
    * corpus size, and the merged sketch is d·w = 2048 rows total: the
    * mergeable one-pass scale path for frequency estimates when the
    * vocabulary itself is too large to shuffle. The md5-slice hash is
    * bit-portable (n03/n06's proven technique), so DuckDB rebuilds the
    * IDENTICAL sketch and the estimates themselves hash-match — not
    * just a boolean bound. The exact top-20 (n35's TakeOrdered plan)
    * anchors the band check: est ≥ n is a structural CMS guarantee,
    * emitted as a column that would flip the hash if violated. */
  val cmsHeavyHitters: Q = {
    val D = 4   // sketch rows (independent hash functions)
    val W = 512 // buckets per row
    Q(
      "n36_cms_heavy_hitters",
      s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
         |rows_ AS (SELECT unnest(generate_series(0, ${D - 1})) AS r),
         |cells AS (SELECT r,
         |                 ('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || tok), 1, 8))::BIGINT % $W AS b,
         |                 count(*) AS cnt
         |          FROM toks CROSS JOIN rows_
         |          GROUP BY r, b),
         |counts AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY tok),
         |ranked AS (SELECT tok, n, row_number() OVER (ORDER BY n DESC, tok) AS rn
         |           FROM counts),
         |top AS (SELECT tok, n, rn FROM ranked WHERE rn <= 20),
         |probes AS (SELECT tok, n, rn, r,
         |                  ('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || tok), 1, 8))::BIGINT % $W AS b
         |           FROM top CROSS JOIN rows_),
         |est AS (SELECT tok, n, rn, min(cnt) AS est
         |        FROM probes JOIN cells USING (r, b)
         |        GROUP BY tok, n, rn)
         |SELECT tok, n, CAST(est AS BIGINT) AS est,
         |       est >= n AS est_ge_exact,
         |       CAST(rn AS BIGINT) AS rn
         |FROM est
         |ORDER BY rn""".stripMargin) { (s, dir) =>
      def bucket(r: Column, tok: Column): Column =
        conv(substring(md5(concat(r.cast("string"), lit(":"), tok).cast("binary")),
          1, 8), 16, 10).cast("long") % W
      // input-skew guard (round 15, guide §2.5): the explode + 4×md5
      // per token below is the query's whole cost and feeds BOTH the
      // sketch and the exact counts; a single-row-group input runs it
      // on one task — spread the projected text rows first
      val toks = graft.plans.Scale.spreadScan(
          Tables(s, dir).documents.select("text"))
        .select(explode(split(col("text"), " ")).as("tok"))
      val cells = toks
        .select(col("tok"), explode(expr(s"sequence(0, ${D - 1})")).as("r"))
        .select(col("r"), bucket(col("r"), col("tok")).as("b"))
        .groupBy("r", "b").agg(count(lit(1)).as("cnt"))
      val counts = toks.groupBy("tok").agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("n").desc, col("tok"))
      val top = counts.orderBy(col("n").desc, col("tok")).limit(20)
        .withColumn("rn", row_number().over(w).cast("long"))
      val probes = top
        .select(col("tok"), col("n"), col("rn"),
          explode(expr(s"sequence(0, ${D - 1})")).as("r"))
        .withColumn("b", bucket(col("r"), col("tok")))
      broadcast(probes).join(cells, Seq("r", "b"))
        .groupBy("tok", "n", "rn").agg(min(col("cnt")).as("est"))
        .select(col("tok"), col("n"), col("est").cast("long").as("est"),
          (col("est") >= col("n")).as("est_ge_exact"), col("rn"))
        .orderBy("rn")
    }
  }

  /** Gopher-style RULE filter (Rae et al. 2021 §A1.1, public): the
    * hard per-document quality gates a pretraining pipeline applies
    * BEFORE any learned scoring — each rule a named boolean, plus the
    * conjunction, so downstream can both filter and audit which rule
    * fired. Thresholds are the published ones where our tokenizer
    * applies (word count ≥ 50, mean word length in [3,10], ≥ 2
    * stopword hits, ≥ 80 % alphabetic words) plus a type-token-ratio
    * floor standing in for the repetition family (full versions in
    * n34). All features are integer counts or int/int double division
    * — the n21 parity rules — so the flags hash-match exactly.
    * Map-side only: one pass of higher-order functions over the token
    * array, no shuffle at any scale. */
  def gopherRules(docs: DataFrame): DataFrame = {
    val tk = split(col("text"), " ", -1)
    docs
      .withColumn("__tk", tk)
      .select(
        col("doc_id"),
        size(col("__tk")).cast("long").as("n_tokens"),
        expr("aggregate(__tk, 0L, (a, x) -> a + length(x))").as("sum_len"),
        expr("size(filter(__tk, x -> x = 'the' OR x = 'a' OR x = 'of'" +
          " OR x = 'and' OR x = 'in'))").cast("long").as("stop_hits"),
        size(array_distinct(col("__tk"))).cast("long").as("n_uniq"),
        expr("size(filter(__tk, x -> x rlike '[A-Za-z]'))")
          .cast("long").as("n_alpha"))
      .select(
        col("doc_id"), col("n_tokens"),
        (col("sum_len").cast("double") / col("n_tokens")).as("mean_tok_len"),
        col("stop_hits"),
        (col("n_uniq").cast("double") / col("n_tokens")).as("ttr"),
        (col("n_alpha").cast("double") / col("n_tokens")).as("alpha_frac"))
      .withColumn("r_len", col("n_tokens").between(50L, 100000L))
      .withColumn("r_mean_len", col("mean_tok_len").between(3.0, 10.0))
      .withColumn("r_stop", col("stop_hits") >= 2L)
      .withColumn("r_ttr", col("ttr") >= 0.3)
      .withColumn("r_alpha", col("alpha_frac") >= 0.8)
      .withColumn("passes",
        col("r_len") && col("r_mean_len") && col("r_stop") &&
          col("r_ttr") && col("r_alpha"))
  }

  /** The n47 gate as a single boolean COLUMN over a text column — the
    * streaming-safe form (no intermediate frame, usable inside a
    * `filter` on an unbounded stream, where [[gopherRules]]'s audit
    * frame shape isn't needed). Same arithmetic as the audit frame
    * rule-for-rule; PropsSpec pins filter(gopherPass) ≡
    * gopherRules.passes so the two can never drift. */
  def gopherPass(text: Column): Column = {
    val tk = split(text, " ", -1)
    val n = size(tk).cast("long")
    val sumLen = aggregate(tk, lit(0L), (a, x) => a + length(x))
    val stopHits = size(filter(tk, x =>
      x === "the" || x === "a" || x === "of" || x === "and" || x === "in"))
      .cast("long")
    val nUniq = size(array_distinct(tk)).cast("long")
    val nAlpha = size(filter(tk, x => x.rlike("[A-Za-z]"))).cast("long")
    n.between(50L, 100000L) &&
      (sumLen.cast("double") / n).between(3.0, 10.0) &&
      stopHits >= 2L &&
      (nUniq.cast("double") / n) >= 0.3 &&
      (nAlpha.cast("double") / n) >= 0.8
  }

  val gopher: Q = Q(
    "n47_gopher_rules",
    """WITH f AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |feat AS (
      |  SELECT doc_id,
      |         CAST(len(w) AS BIGINT) AS n_tokens,
      |         CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT) AS sum_len,
      |         CAST(len(list_filter(w, x -> x = 'the' OR x = 'a' OR x = 'of'
      |                                   OR x = 'and' OR x = 'in')) AS BIGINT) AS stop_hits,
      |         CAST(len(list_distinct(w)) AS BIGINT) AS n_uniq,
      |         CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha
      |  FROM f),
      |m AS (
      |  SELECT doc_id, n_tokens,
      |         CAST(sum_len AS DOUBLE) / n_tokens AS mean_tok_len,
      |         stop_hits,
      |         CAST(n_uniq AS DOUBLE) / n_tokens AS ttr,
      |         CAST(n_alpha AS DOUBLE) / n_tokens AS alpha_frac
      |  FROM feat)
      |SELECT doc_id, n_tokens, mean_tok_len, stop_hits, ttr, alpha_frac,
      |       n_tokens BETWEEN 50 AND 100000 AS r_len,
      |       mean_tok_len BETWEEN 3.0 AND 10.0 AS r_mean_len,
      |       stop_hits >= 2 AS r_stop,
      |       ttr >= 0.3 AS r_ttr,
      |       alpha_frac >= 0.8 AS r_alpha,
      |       (n_tokens BETWEEN 50 AND 100000) AND (mean_tok_len BETWEEN 3.0 AND 10.0)
      |         AND stop_hits >= 2 AND ttr >= 0.3 AND alpha_frac >= 0.8 AS passes
      |FROM m
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    gopherRules(Tables(s, dir).documents).orderBy("doc_id")
  }

  /** Zipf-law fit over the token rank–frequency curve — the corpus
    * health audit that catches boilerplate floods and synthetic-text
    * collapse (a natural corpus fits ln(freq) ≈ a + s·ln(rank) with
    * s ≈ −1; a flat slope or near-zero r² says the distribution is
    * broken before any downstream filter sees it).
    *
    * OLS in closed form over (x=ln rank, y=ln freq): slope =
    * (nΣxy−ΣxΣy)/(nΣx²−(Σx)²); r² adds the y-moment. All five moments
    * are DECIMAL-exact distributed sums, so the one-row answer is
    * hash-checked. Ranking ties break on the token for a total order.
    * Scale: the window ranks the VOCABULARY (types, not tokens) —
    * at web scale that is millions of rows against a trillion-token
    * corpus, and the same df-cap that bounds hot shingles would cap
    * the ranked set if vocabulary itself ever exploded. */
  val zipfFit: Q = Q(
    "n79_zipf_fit",
    s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
       |cnt AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY tok),
       |rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS r FROM cnt),
       |xy AS (SELECT ln(CAST(r AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y, c FROM rk),
       |m AS (SELECT CAST(count(*) AS BIGINT) AS n_types,
       |             CAST(sum(c) AS BIGINT) AS n_tokens,
       |             ${dsumSql("x")} AS sx, ${dsumSql("y")} AS sy,
       |             ${dsumSql("x * y")} AS sxy,
       |             ${dsumSql("x * x")} AS sxx, ${dsumSql("y * y")} AS syy
       |      FROM xy)
       |SELECT n_types, n_tokens,
       |       ${round6Sql("(n_types * sxy - sx * sy) / (n_types * sxx - sx * sx)")} AS slope,
       |       ${round6Sql("(sy - ((n_types * sxy - sx * sy) / (n_types * sxx - sx * sx)) * sx) / n_types")} AS intercept,
       |       ${round6Sql("((n_types * sxy - sx * sy) * (n_types * sxy - sx * sy)) / ((n_types * sxx - sx * sx) * (n_types * syy - sy * sy))")} AS r2
       |FROM m""".stripMargin) { (s, dir) =>
    zipfFitStats(Tables(s, dir).documents)
  }

  /** Library form of n79 over any (doc_id, text) frame. */
  def zipfFitStats(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cnt = docs.select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val rk = cnt.withColumn("r",
      row_number().over(Window.orderBy(col("c").desc, col("tok"))).cast("long"))
    val xy = rk.select(col("c"),
      log(col("r").cast("double")).as("x"), log(col("c").cast("double")).as("y"))
    val m = xy.agg(
      count(lit(1)).as("n_types"), sum(col("c")).as("n_tokens"),
      dsum(col("x")).as("sx"), dsum(col("y")).as("sy"),
      dsum(col("x") * col("y")).as("sxy"),
      dsum(col("x") * col("x")).as("sxx"),
      dsum(col("y") * col("y")).as("syy"))
    val slope = (col("n_types") * col("sxy") - col("sx") * col("sy")) /
      (col("n_types") * col("sxx") - col("sx") * col("sx"))
    m.select(col("n_types"), col("n_tokens"),
      round6(slope).as("slope"),
      round6((col("sy") - slope * col("sx")) / col("n_types")).as("intercept"),
      round6((col("n_types") * col("sxy") - col("sx") * col("sy")) *
        (col("n_types") * col("sxy") - col("sx") * col("sy")) /
        ((col("n_types") * col("sxx") - col("sx") * col("sx")) *
          (col("n_types") * col("syy") - col("sy") * col("sy")))).as("r2"))
  }

  val all: Seq[Q] = Seq(langStats, qualityScore, tokenStats, langId,
    fingerprint, rollingFingerprint, unigramLogProb, bigramLogProb,
    tfidfTop, bm25, ndcgEval, redact, repetition, heavyHitters,
    cmsHeavyHitters, gopher, zipfFit)
}
