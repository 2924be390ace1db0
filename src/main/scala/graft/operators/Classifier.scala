package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.Det._

/** Model-based quality/metadata classification — the learned-filter
  * stage of a pretraining data pipeline (the reference's ETL stops at
  * rule filters; modern corpus curation adds a trained classifier pass:
  * FineWeb-Edu, DCLM, and the original GPT-3/CCNet pipelines all gate
  * documents on a lightweight linear/NB model score).
  *
  * Everything here is multinomial Naive Bayes with Laplace smoothing —
  * deliberately: NB training IS aggregation (per-class token counts +
  * priors), so both training and inference stay declarative DataFrame
  * plans that Catalyst optimizes, shuffle only on (label, token), and
  * hash-check against a DuckDB twin end to end. No driver-side math, no
  * UDFs, no iterative optimizer — the 100 TB shape is two map-side
  * combinable count aggregations over the train split, a broadcast of
  * the tiny class frame, and one shuffle join of apply-side tokens
  * against the vocabulary-sized conditional table.
  *
  * Determinism (the [[graft.Det]] rules): every per-token ln() term is
  * DECIMAL(25,6)-cast before the distributed sum (order-independent,
  * absorbs sub-1e-6 libm ulp differences between java.lang.Math.log and
  * DuckDB's std::log — the n28/n51 pattern), priors are decimal-rounded
  * the same way, and argmax ranking orders by (score DESC, label) so
  * ties break identically in both engines.
  *
  * Two catalog entries:
  *  - n67: supervised train/apply — learn lang from the even-doc_id
  *    half, predict on the odd half (the learned companion to n23's
  *    heuristic lang-id).
  *  - n68: weak supervision — the n47 Gopher rule gate labels the even
  *    half, NB distills the rules into a token model, and the model
  *    scores EVERY document with a log-odds (the classifier-bootstrap
  *    pattern: cheap rules label a slice, the learned model generalizes
  *    corpus-wide and returns a continuous score the rules can't give).
  */
object Classifier {

  private val LabelCol = "label"

  /** Per-(doc, label) NB log-scores for `apply` under a model trained
    * on `train`: score = ln p(label) + Σ_tok tf·ln p(tok|label), Laplace
    * smoothing (c+1)/(n_tok_label + V). `train` needs (label, text),
    * `apply` needs (doc_id, text). Returns (doc_id, label, score) — one
    * row per apply-doc per TRAINED class (a class absent from the train
    * split cannot be predicted, structurally, in both engines).
    *
    * Scale: tokT/cnt/cls are map-side combinable counts over the train
    * split; the class frame and the 1-row vocab/doc totals broadcast
    * (allowlisted tiny-side BNLJ, the n28 corpus-total pattern); the
    * only O(corpus) shuffle is apply-tokens ⋈ conditionals on
    * (label, tok) — vocabulary-keyed, the same key distribution as
    * n28's unigram join. */
  def nbScores(train: DataFrame, apply: DataFrame): DataFrame = {
    val tokT = train.select(col(LabelCol), explode(split(col("text"), " ")).as("tok"))
    // per-class token totals and the vocabulary size re-aggregated
    // from the (label, tok) counts below (Σ_tok c per label; distinct
    // tok across labels) instead of two more tokenize passes —
    // ReuseExchange computes the tokenize+count shuffle once
    // (round 15, guide §1.2)
    lazy val cntShared = tokT.groupBy(LabelCol, "tok").agg(count(lit(1)).as("c"))
    val cls = cntShared.groupBy(LabelCol).agg(sum(col("c")).as("n_tok"))
    val vocab = cntShared.agg(countDistinct(col("tok")).as("v"))
    val pri = train.groupBy(LabelCol).agg(count(lit(1)).as("nd"))
      .crossJoin(broadcast(train.agg(count(lit(1)).as("nd_tot"))))
      .select(col(LabelCol),
        log(col("nd").cast("double") / col("nd_tot"))
          .cast("decimal(25,6)").cast("double").as("lp"))
    val cnt = cntShared
    val tokS = apply
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val pairs = tokS
      .crossJoin(broadcast(cls))
      .join(cnt, Seq(LabelCol, "tok"), "left")
      .withColumn("cc", coalesce(col("c"), lit(0L)))
    val ll = pairs.crossJoin(broadcast(vocab))
      .groupBy("doc_id", LabelCol)
      .agg(dsum(col("tf") *
        log((col("cc").cast("double") + 1d) / (col("n_tok") + col("v"))))
        .as("tok_ll"))
    ll.join(broadcast(pri), Seq(LabelCol))
      .select(col("doc_id"), col(LabelCol), (col("tok_ll") + col("lp")).as("score"))
  }

  /** The DuckDB twin of [[nbScores]] as a WITH-chain fragment ending in
    * `scored(doc_id, label, score)`. `labelExpr`/`trainWhere`/
    * `applyWhere` parameterize the label and the split exactly like the
    * Scala side. */
  private def nbChainSql(labelExpr: String, trainWhere: String,
      applyWhere: String): String =
    s"""lab AS (SELECT doc_id, $labelExpr AS label, text
       |        FROM documents WHERE $trainWhere),
       |app AS (SELECT doc_id, text FROM documents WHERE $applyWhere),
       |tokt AS (SELECT label, unnest(string_split(text, ' ')) AS tok FROM lab),
       |cls AS (SELECT label, CAST(count(*) AS BIGINT) AS n_tok
       |        FROM tokt GROUP BY label),
       |vocab AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM tokt),
       |pri AS (SELECT label,
       |               CAST(CAST(ln(CAST(count(*) AS DOUBLE) /
       |                    (SELECT count(*) FROM lab)) AS DECIMAL(25,6))
       |                    AS DOUBLE) AS lp
       |        FROM lab GROUP BY label),
       |cnt AS (SELECT label, tok, CAST(count(*) AS BIGINT) AS c
       |        FROM tokt GROUP BY label, tok),
       |toks AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
       |         FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |               FROM app)
       |         GROUP BY doc_id, tok),
       |pairs AS (SELECT s.doc_id, s.tf, k.label, k.n_tok,
       |                 COALESCE(n.c, 0) AS cc
       |          FROM toks s CROSS JOIN cls k
       |          LEFT JOIN cnt n ON n.label = k.label AND n.tok = s.tok),
       |ll AS (SELECT p.doc_id, p.label,
       |              ${dsumSql("p.tf * ln((CAST(p.cc AS DOUBLE) + 1) / (p.n_tok + v.v))")} AS tok_ll
       |       FROM pairs p CROSS JOIN vocab v
       |       GROUP BY p.doc_id, p.label),
       |scored AS (SELECT doc_id, ll.label, tok_ll + lp AS score
       |           FROM ll JOIN pri ON pri.label = ll.label)""".stripMargin

  /** n67: supervised NB language classifier — train on even doc_ids
    * (label = lang), predict the odd half. The learned companion to the
    * n23 heuristic lang-id: same task, model induced from the corpus's
    * own held-in half instead of hand-picked marker tokens. Output is
    * one row per test doc: true label, argmax prediction, winning
    * log-score. NOTE: the harness corpus draws every lang's text from
    * one shared 31-token vocabulary (lang is metadata-random), so
    * accuracy ≈ chance HERE is the correct answer; ClassifierSpec
    * proves the learner itself on planted-signal data (disjoint marker
    * vocabularies → perfect held-out accuracy). */
  val nbLang: Q = Q(
    "n67_nb_lang",
    s"""WITH ${nbChainSql("lang", "doc_id % 2 = 0", "doc_id % 2 = 1")},
       |ranked AS (SELECT doc_id, label, score,
       |                  row_number() OVER (PARTITION BY doc_id
       |                                     ORDER BY score DESC, label) AS rn
       |           FROM scored)
       |SELECT r.doc_id, d.lang AS true_lang, r.label AS pred_lang, r.score
       |FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
       |WHERE r.rn = 1
       |ORDER BY r.doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir).documents
    val train = docs.filter(col("doc_id") % 2 === 0)
      .select(col("lang").as(LabelCol), col("text"))
    val test = docs.filter(col("doc_id") % 2 === 1)
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col(LabelCol))
    nbScores(train, test)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(test.select(col("doc_id"), col("lang").as("true_lang")), Seq("doc_id"))
      .select(col("doc_id"), col("true_lang"),
        col(LabelCol).as("pred_lang"), col("score"))
      .orderBy("doc_id")
  }

  /** The n47 Gopher conjunction as a DuckDB predicate over a
    * `string_split(text, ' ')` list `w` — kept textually in sync with
    * TextAnalysis.gopher's twin (PropsSpec pins the Scala side;
    * ClassifierSpec pins this fragment against n47's passes column). */
  private def gopherPassSql(w: String): String =
    s"((len($w) BETWEEN 50 AND 100000)" +
      s" AND (CAST(list_sum(list_transform($w, x -> length(x))) AS DOUBLE)" +
      s" / len($w) BETWEEN 3.0 AND 10.0)" +
      s" AND len(list_filter($w, x -> x = 'the' OR x = 'a' OR x = 'of'" +
      s" OR x = 'and' OR x = 'in')) >= 2" +
      s" AND CAST(len(list_distinct($w)) AS DOUBLE) / len($w) >= 0.3" +
      s" AND CAST(len(list_filter($w, x -> regexp_matches(x, '[A-Za-z]')))" +
      s" AS DOUBLE) / len($w) >= 0.8)"

  /** The n47 gate as a pass/fail label expression — the weak-label
    * source shared by n68 and st09 (SQL twin: [[weakLabelSql]]). */
  def weakLabeledTrain(docs: DataFrame): DataFrame =
    docs.select(when(TextAnalysis.gopherPass(col("text")), "pass")
      .otherwise("fail").as(LabelCol), col("text"))

  private[graft] def weakLabelSql: String =
    s"CASE WHEN ${gopherPassSql("string_split(text, ' ')")} THEN 'pass' ELSE 'fail' END"

  /** n68: weak-supervision quality classifier — the classifier-
    * bootstrap chain every modern curation pipeline runs. The n47 rule
    * gate labels the even half pass/fail (no human labels anywhere),
    * NB distills those rules into a token model, and the model scores
    * EVERY document with a pass-vs-fail log-odds. The payoff over the
    * rules themselves: a continuous score (rankable, thresholdable at
    * any retention budget) and generalization — a doc failing one rule
    * by a hair but reading like a pass can recover, which is exactly
    * what FineWeb-style pipelines want from the learned stage. Output:
    * (doc_id, weak_pass = the rule gate's own verdict, nb_logodds,
    * nb_pass) for the full corpus, so the entry doubles as the
    * rules-vs-model agreement audit. */
  /** The n68 scored frame: (doc_id, weak_pass, s_pass, s_fail) over
    * the full corpus under the weak-supervision model — shared by the
    * n68 audit and the n71 retention sweep. */
  private def weakQualityWide(docs: DataFrame): DataFrame =
    nbScores(weakLabeledTrain(docs.filter(col("doc_id") % 2 === 0)), docs)
      .groupBy("doc_id")
      .agg(max(when(col(LabelCol) === "pass", col("score"))).as("s_pass"),
        max(when(col(LabelCol) === "fail", col("score"))).as("s_fail"))
      .join(docs.select(col("doc_id"),
        TextAnalysis.gopherPass(col("text")).as("weak_pass")), Seq("doc_id"))

  /** The shared SQL twin fragment ending in `sc2(doc_id, weak_pass,
    * nb_logodds)`. */
  private def weakQualityChainSql: String =
    s"""${nbChainSql(weakLabelSql, "doc_id % 2 = 0", "TRUE")},
       |wide AS (SELECT doc_id,
       |                max(CASE WHEN label = 'pass' THEN score END) AS s_pass,
       |                max(CASE WHEN label = 'fail' THEN score END) AS s_fail
       |         FROM scored GROUP BY doc_id),
       |sc2 AS (SELECT w.doc_id,
       |               ${gopherPassSql("string_split(d.text, ' ')")} AS weak_pass,
       |               w.s_pass AS s_pass, w.s_fail AS s_fail
       |        FROM wide w JOIN documents d ON d.doc_id = w.doc_id)""".stripMargin

  val nbWeakQuality: Q = Q(
    "n68_weak_quality",
    s"""WITH $weakQualityChainSql
       |SELECT doc_id, weak_pass,
       |       s_pass - s_fail AS nb_logodds,
       |       s_pass > s_fail AS nb_pass
       |FROM sc2
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    weakQualityWide(Tables(s, dir).documents)
      .select(col("doc_id"), col("weak_pass"),
        (col("s_pass") - col("s_fail")).as("nb_logodds"),
        (col("s_pass") > col("s_fail")).as("nb_pass"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------------
  // n71: retention-budget quality ranking (VERDICT_r05 #8 / r06 #8) —
  // the operational question a continuous score exists to answer: "I
  // can afford to keep B% of the corpus; where does the cut land, and
  // how much does the model-ranked cut agree with the rule gate?" For
  // budgets {10, 25, 50, 75}% the sweep ranks every document by
  // nb_logodds (doc_id tiebreak), keeps the top ⌈B·N/100⌉, and reports
  // the cut threshold plus the rules-vs-model agreement decomposition
  // (kept∧rule-pass, dropped∧rule-fail). The catalog entry uses the
  // exact global rank for oracle determinism; at 100 TB the threshold
  // comes from a distributed quantile sketch (approx_percentile) and
  // the kept-set from a stateless filter — the ranking never needs a
  // single-task sort in production, only the audit does.
  // ---------------------------------------------------------------------

  /** Retention budgets swept, in percent of the corpus. */
  val Budgets = Seq(10L, 25L, 50L, 75L)

  private val retentionSweepSql: String = {
    def rowB(b: Long) =
      s"""SELECT *, kept_rule_pass + dropped_rule_fail AS n_agree FROM (
         |  SELECT CAST($b AS BIGINT) AS budget_pct,
         |         CAST(max(n_total) AS BIGINT) AS n_total,
         |         CAST(sum(CASE WHEN rn <= (n_total * $b + 99) // 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |         min(CASE WHEN rn <= (n_total * $b + 99) // 100 THEN nb_logodds END) AS threshold,
         |         CAST(sum(CASE WHEN rn <= (n_total * $b + 99) // 100 AND weak_pass THEN 1 ELSE 0 END) AS BIGINT) AS kept_rule_pass,
         |         CAST(sum(CASE WHEN rn > (n_total * $b + 99) // 100 AND NOT weak_pass THEN 1 ELSE 0 END) AS BIGINT) AS dropped_rule_fail
         |  FROM ranked)""".stripMargin
    s"""WITH $weakQualityChainSql,
       |ranked AS (SELECT doc_id, weak_pass, s_pass - s_fail AS nb_logodds,
       |                  row_number() OVER (ORDER BY s_pass - s_fail DESC, doc_id) AS rn,
       |                  count(*) OVER () AS n_total
       |           FROM sc2)
       |${Budgets.map(rowB).mkString("\nUNION ALL\n")}
       |ORDER BY budget_pct""".stripMargin
  }

  /** Catalog entry: the retention sweep — all-integer agreement counts
    * plus the cut threshold (a stored double both engines derive from
    * the identical DECIMAL-summed scores), hash-checked per budget. */
  val retentionSweep: Q = Q("n71_retention_sweep", retentionSweepSql) { (s, dir) =>
    val w = Window.orderBy(col("nb_logodds").desc, col("doc_id"))
    val ranked = weakQualityWide(Tables(s, dir).documents)
      .select(col("doc_id"), col("weak_pass"),
        (col("s_pass") - col("s_fail")).as("nb_logodds"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .localCheckpoint() // the NB chain runs once, not once per budget
    val n = ranked.groupBy().agg(count(lit(1)).as("n_total"))
    Budgets.map { b =>
      ranked.crossJoin(broadcast(n))
        .withColumn("kept", col("rn") <= expr(s"(n_total * $b + 99) DIV 100"))
        .groupBy()
        .agg(
          max(col("n_total")).as("n_total"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          min(when(col("kept"), col("nb_logodds"))).as("threshold"),
          sum(when(col("kept") && col("weak_pass"), 1L).otherwise(0L))
            .as("kept_rule_pass"),
          sum(when(!col("kept") && !col("weak_pass"), 1L).otherwise(0L))
            .as("dropped_rule_fail"))
        .select(lit(b).as("budget_pct"), col("n_total"), col("n_kept"),
          col("threshold"), col("kept_rule_pass"), col("dropped_rule_fail"),
          (col("kept_rule_pass") + col("dropped_rule_fail")).as("n_agree"))
    }.reduce(_.unionAll(_)).orderBy("budget_pct")
  }

  // ---------------------------------------------------------------------
  // Binary log-odds model — the SERVING form of n68's classifier.
  // ---------------------------------------------------------------------

  /** The binary NB model collapsed to its serving form: one log-odds
    * number per vocabulary token (lo = ln p(tok|pass) − ln p(tok|fail))
    * plus a 1-row constants frame (prior log-odds, OOV log-odds). This
    * is what a deployment ships: scoring a document is then prior_lo +
    * Σ_occurrence lo — a left join against the vocabulary-sized token
    * table and one sum, no per-class fan-out at inference time. Both
    * frames are pure aggregations of the train split (no collect), so
    * the model "artifact" is itself a DataFrame that can be persisted
    * like any index. `train` needs (label ∈ {pass,fail}, text). */
  def binaryLogOddsModel(train: DataFrame): (DataFrame, DataFrame) = {
    val tokT = train.select(col(LabelCol), explode(split(col("text"), " ")).as("tok"))
    val totals = tokT.agg(
      sum(when(col(LabelCol) === "pass", 1L).otherwise(0L)).as("n_pass"),
      sum(when(col(LabelCol) === "fail", 1L).otherwise(0L)).as("n_fail"),
      countDistinct(col("tok")).as("v"))
    val cnt = tokT.groupBy("tok").agg(
      sum(when(col(LabelCol) === "pass", 1L).otherwise(0L)).as("c_pass"),
      sum(when(col(LabelCol) === "fail", 1L).otherwise(0L)).as("c_fail"))
    val tokLo = cnt.crossJoin(broadcast(totals)).select(col("tok"),
      (log((col("c_pass").cast("double") + 1d) / (col("n_pass") + col("v"))) -
        log((col("c_fail").cast("double") + 1d) / (col("n_fail") + col("v"))))
        .as("lo"))
    val docTot = train.agg(
      sum(when(col(LabelCol) === "pass", 1L).otherwise(0L)).as("d_pass"),
      sum(when(col(LabelCol) === "fail", 1L).otherwise(0L)).as("d_fail"))
    val consts = totals.crossJoin(docTot).select(
      (log(col("d_pass").cast("double") / (col("d_pass") + col("d_fail"))) -
        log(col("d_fail").cast("double") / (col("d_pass") + col("d_fail"))))
        .cast("decimal(25,6)").cast("double").as("prior_lo"),
      (log(lit(1d) / (col("n_pass") + col("v"))) -
        log(lit(1d) / (col("n_fail") + col("v")))).as("oov_lo"))
    (tokLo, consts)
  }

  /** Score `docs` under a frozen [[binaryLogOddsModel]]: per-document
    * log-odds = prior_lo + Σ per-OCCURRENCE term (each occurrence's lo
    * — or oov_lo for unseen tokens — DECIMAL-cast into the sum, so the
    * streaming and batch lanes and the DuckDB twin all add the exact
    * same rounded terms in any order). `extraGroup` carries the
    * event-time column through the aggregation for the watermarked
    * streaming lane; batch callers pass none. The consts frame attaches
    * via a 1-row broadcast EQUI-join (a literal key, not a cross join)
    * so the same code drives a streaming plan, where stream-static
    * cross joins are unsupported. */
  def logOddsScores(tokLo: DataFrame, consts: DataFrame, docs: DataFrame,
      extraGroup: Seq[String] = Nil): DataFrame = {
    val occ = docs.select(
      col("doc_id") +: extraGroup.map(col) :+
        explode(split(col("text"), " ")).as("tok"): _*)
    val groups = (extraGroup :+ "doc_id").map(col) :+ col("prior_lo")
    occ
      .join(broadcast(tokLo), Seq("tok"), "left")
      .withColumn("__one", lit(1))
      .join(broadcast(consts.withColumn("__one", lit(1))), Seq("__one"))
      .groupBy(groups: _*)
      .agg(dsum(coalesce(col("lo"), col("oov_lo"))).as("tok_lo"))
      .select(col("doc_id") +: extraGroup.map(col) :+
        (col("prior_lo") + col("tok_lo")).as("logodds"): _*)
  }

  /** The [[nbChainSql]]-style DuckDB twin of [[binaryLogOddsModel]] +
    * [[logOddsScores]] as a WITH-fragment ending in
    * `sc(doc_id, logodds)` over every document. */
  private[graft] def logOddsChainSql(labelExpr: String,
      trainWhere: String): String =
    s"""lab AS (SELECT doc_id, $labelExpr AS label, text
       |        FROM documents WHERE $trainWhere),
       |tokt AS (SELECT label, unnest(string_split(text, ' ')) AS tok FROM lab),
       |tots AS (SELECT CAST(sum(CASE WHEN label = 'pass' THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       |                CAST(sum(CASE WHEN label = 'fail' THEN 1 ELSE 0 END) AS BIGINT) AS n_fail,
       |                CAST(count(DISTINCT tok) AS BIGINT) AS v
       |         FROM tokt),
       |cnt AS (SELECT tok,
       |               CAST(sum(CASE WHEN label = 'pass' THEN 1 ELSE 0 END) AS BIGINT) AS c_pass,
       |               CAST(sum(CASE WHEN label = 'fail' THEN 1 ELSE 0 END) AS BIGINT) AS c_fail
       |        FROM tokt GROUP BY tok),
       |toklo AS (SELECT tok,
       |                 ln((CAST(c_pass AS DOUBLE) + 1) / (n_pass + v)) -
       |                 ln((CAST(c_fail AS DOUBLE) + 1) / (n_fail + v)) AS lo
       |          FROM cnt CROSS JOIN tots),
       |dts AS (SELECT CAST(sum(CASE WHEN label = 'pass' THEN 1 ELSE 0 END) AS BIGINT) AS d_pass,
       |               CAST(sum(CASE WHEN label = 'fail' THEN 1 ELSE 0 END) AS BIGINT) AS d_fail
       |        FROM lab),
       |consts AS (SELECT CAST(CAST(ln(CAST(d_pass AS DOUBLE) / (d_pass + d_fail)) -
       |                            ln(CAST(d_fail AS DOUBLE) / (d_pass + d_fail))
       |                       AS DECIMAL(25,6)) AS DOUBLE) AS prior_lo,
       |                  ln(1.0 / (n_pass + v)) - ln(1.0 / (n_fail + v)) AS oov_lo
       |           FROM tots CROSS JOIN dts),
       |occ AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |terms AS (SELECT o.doc_id, COALESCE(t.lo, c.oov_lo) AS t, c.prior_lo
       |          FROM occ o LEFT JOIN toklo t ON t.tok = o.tok
       |          CROSS JOIN consts c),
       |sc AS (SELECT doc_id, prior_lo + ${dsumSql("t")} AS logodds
       |       FROM terms GROUP BY doc_id, prior_lo)""".stripMargin

  // ---------------------------------------------------------------------
  // n94: the retention threshold from a QUANTILE SKETCH — n71's own
  // scaladoc names approx_percentile as the 100 TB path (the exact
  // global rank is the audit's shape, not production's); this entry
  // makes that path driver-checked with the x12 band pattern: the
  // oracle emits TRUE for each sketch claim and exact values for
  // everything else, so a sketch drifting outside its exact-percentile
  // band (or a kept-count outside the band's count envelope) flips the
  // hash.
  // ---------------------------------------------------------------------

  /** Budgets swept by n94 (a subset of n71's — each adds a full
    * percentile buffer per budget). */
  private val ApproxBudgets = Seq(25L, 50L)

  val retentionApprox: Q = Q(
    "n94_retention_approx",
    s"""WITH $weakQualityChainSql,
       |scores AS (SELECT doc_id, s_pass - s_fail AS lo FROM sc2)
       |${ApproxBudgets.map { b =>
           val q = (100L - b).toDouble / 100
           s"""SELECT CAST($b AS BIGINT) AS budget_pct,
              |       CAST(count(*) AS BIGINT) AS n_total,
              |       ${round6Sql(s"quantile_cont(lo, $q)")} AS threshold_exact,
              |       TRUE AS sketch_within_band,
              |       TRUE AS kept_within_band
              |FROM scores""".stripMargin
         }.mkString("\nUNION ALL\n")}
       |ORDER BY budget_pct""".stripMargin) { (s, dir) =>
    val scores = weakQualityWide(Tables(s, dir).documents)
      .select(col("doc_id"), (col("s_pass") - col("s_fail")).as("lo"))
      .localCheckpoint() // the NB chain runs once, not once per budget pass
    ApproxBudgets.map { b =>
      val q = (100L - b).toDouble / 100
      // [band-lo, exact, band-hi] percentiles ±0.02 around q (x12's
      // triplet trick: one buffer) + the sketch at accuracy 10000
      // (rank error ≤ N/10000 ≪ the 2-point band)
      val trip = expr(s"percentile(lo, array(${q - 0.02}D, ${q}D, ${q + 0.02}D))")
      val sk = expr(s"approx_percentile(lo, ${q}D, 10000)")
      val stats = scores.agg(count(lit(1)).as("n_total"), trip.as("ex"), sk.as("sk"))
      scores.crossJoin(broadcast(stats))
        .groupBy()
        .agg(
          max(col("n_total")).as("n_total"),
          max(round6(element_at(col("ex"), 2))).as("threshold_exact"),
          max(col("sk").between(element_at(col("ex"), 1), element_at(col("ex"), 3)))
            .as("sketch_within_band"),
          // counts are antitone in the threshold: t_sketch inside
          // [band-lo, band-hi] ⇒ its kept count inside the band's
          // count envelope
          sum(when(col("lo") >= col("sk"), 1L).otherwise(0L)).as("__kept_sk"),
          sum(when(col("lo") >= element_at(col("ex"), 1), 1L).otherwise(0L)).as("__kept_max"),
          sum(when(col("lo") >= element_at(col("ex"), 3), 1L).otherwise(0L)).as("__kept_min"))
        .select(lit(b).as("budget_pct"), col("n_total"), col("threshold_exact"),
          col("sketch_within_band"),
          col("__kept_sk").between(col("__kept_min"), col("__kept_max"))
            .as("kept_within_band"))
    }.reduce(_.unionAll(_)).orderBy("budget_pct")
  }

  val all: Seq[Q] = Seq(nbLang, nbWeakQuality, retentionSweep, retentionApprox)
}
