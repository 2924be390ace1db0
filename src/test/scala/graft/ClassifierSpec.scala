package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Classifier

/** The NB classifier family (n67/n68). The catalog oracle hash-checks
  * the mechanics corpus-wide; these tests prove the LEARNER on planted
  * signal (the harness corpus draws all langs from one shared 31-token
  * vocabulary, so real-data accuracy ≈ chance is correct and proves
  * nothing about the model). */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def argmax(scores: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("label"))
    scores.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("doc_id", "label")
  }

  test("NB learns disjoint marker vocabularies to perfect held-out accuracy") {
    val train = Seq(
      ("fruit", "apple banana cherry apple shared filler"),
      ("fruit", "banana apple cherry banana shared filler"),
      ("fruit", "cherry cherry apple shared filler"),
      ("animal", "dog cat bird dog shared filler"),
      ("animal", "cat dog bird cat shared filler")).toDF("label", "text")
    val test = Seq(
      (1L, "apple cherry banana shared"),
      (2L, "dog bird cat shared"),
      (3L, "banana banana apple filler"),
      (4L, "cat cat dog filler")).toDF("doc_id", "text")
    val pred = argmax(Classifier.nbScores(train, test))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred == Map(1L -> "fruit", 2L -> "animal",
      3L -> "fruit", 4L -> "animal"))
  }

  test("weak-label distillation recovers the rule on held-out docs via log-odds sign") {
    // rule: pass iff the doc mentions 'apple' — the spec-scale analog
    // of n68's Gopher gate. NB never sees the rule, only its labels.
    val docs = Seq(
      "apple pie with shared words", "apple juice shared words",
      "apple apple tart shared", "plain dog text shared words",
      "cat words shared here", "bird shared words again")
    val train = docs.toDF("text")
      .withColumn("label",
        when(col("text").contains("apple"), "pass").otherwise("fail"))
      .select("label", "text")
    val held = Seq(
      (1L, "apple crumble shared"), (2L, "apple shared here"),
      (3L, "dog cat shared here"), (4L, "bird text shared")).toDF("doc_id", "text")
    val lo = Classifier.nbScores(train, held)
      .groupBy("doc_id")
      .agg((max(when(col("label") === "pass", col("score"))) -
        max(when(col("label") === "fail", col("score")))).as("logodds"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(lo(1L) > 0 && lo(2L) > 0, s"apple docs should score pass: $lo")
    assert(lo(3L) < 0 && lo(4L) < 0, s"non-apple docs should score fail: $lo")
  }

  test("all-OOV doc still gets exactly one score per trained class") {
    val train = Seq(("a", "x y z"), ("b", "p q r")).toDF("label", "text")
    val test = Seq((1L, "unseen tokens only")).toDF("doc_id", "text")
    val rows = Classifier.nbScores(train, test).collect()
    assert(rows.length == 2)
    assert(rows.map(_.getString(1)).sorted.toSeq == Seq("a", "b"))
    assert(rows.forall(r => !r.getDouble(2).isNaN && !r.getDouble(2).isInfinite))
  }

  test("n68 on the harness corpus: model log-odds separate the rule verdicts") {
    // deterministic fixture, deterministic model — this is a fixed
    // property of the sf0.001 corpus, not a statistical bound: docs the
    // Gopher gate passes score higher under the distilled model than
    // docs it fails, i.e. the distillation carries real signal even on
    // near-uniform synthetic text.
    val out = Classifier.nbWeakQuality.build(spark, sf0001)
    val m = out.groupBy("weak_pass")
      .agg(avg(col("nb_logodds")).as("mlo"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(m(true) > m(false),
      s"weak-pass docs should have higher mean log-odds: $m")
    // and the entry is a full-corpus audit: one row per document
    assert(out.count() ==
      Tables(spark, sf0001).documents.count())
  }

  test("n71 retention sweep: exact budget sizes, monotone thresholds, consistent counts") {
    val rows = Classifier.retentionSweep.build(spark, sf0001).collect()
    assert(rows.map(_.getAs[Long]("budget_pct")).toSeq == Classifier.Budgets)
    val n = rows.head.getAs[Long]("n_total")
    rows.foreach { r =>
      val b = r.getAs[Long]("budget_pct")
      // the kept set is EXACTLY the ceiling of the budget
      assert(r.getAs[Long]("n_kept") == (n * b + 99) / 100)
      // agreement decomposition is internally consistent
      assert(r.getAs[Long]("n_agree") ==
        r.getAs[Long]("kept_rule_pass") + r.getAs[Long]("dropped_rule_fail"))
      assert(r.getAs[Long]("kept_rule_pass") <= r.getAs[Long]("n_kept"))
      assert(r.getAs[Long]("dropped_rule_fail") <= n - r.getAs[Long]("n_kept"))
    }
    // a larger budget can only lower the cut threshold and keep more
    val byBudget = rows.sortBy(_.getAs[Long]("budget_pct"))
    byBudget.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_kept") <= b.getAs[Long]("n_kept"))
      assert(a.getAs[Double]("threshold") >= b.getAs[Double]("threshold"))
    }
    // the cut threshold IS the weakest kept score: the doc ranked at
    // the budget boundary scores exactly `threshold`
    val scored = Classifier.nbWeakQuality.build(spark, sf0001)
      .select("nb_logodds").collect().map(_.getDouble(0)).sorted(Ordering[Double].reverse)
    byBudget.foreach { r =>
      assert(r.getAs[Double]("threshold") == scored(r.getAs[Long]("n_kept").toInt - 1))
    }
  }
}
