package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Byte-pair-encoding vocabulary induction (Sennrich et al. 2016,
  * public) — the tokenizer-training step of an LLM data pipeline,
  * expressed corpus-scale.
  *
  * The scale contract: the corpus is touched ONCE (one word-count
  * shuffle, map-side combinable); every merge round after that runs on
  * the VOCABULARY frame — |distinct words| rows, orders of magnitude
  * smaller than 100 TB of text — with one pair-count aggregation and
  * one map-side array rewrite per round. This is why BPE training is
  * feasible at corpus scale at all, and the implementation keeps that
  * shape: nothing after `wordFreqs` ever re-reads a document.
  *
  * Pair statistics are exact integer counts, so the DuckDB twin (n58)
  * hash-matches bit-for-bit; the iterative trainer is spec-checked
  * against a hand-computed model (BpeSpec) because its per-round
  * argmax + rewrite isn't one SQL statement.
  */
object Bpe {

  /** (w, f): corpus word frequencies — the single corpus-wide pass. */
  def wordFreqs(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy("w").agg(count(lit(1)).as("f"))

  /** Initial symbolization: each word as its character array, keeping
    * the frequency. */
  def symbolize(wordFreqs: DataFrame): DataFrame =
    wordFreqs.select(
      expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
        .as("syms"),
      col("f"))

  /** Adjacent-symbol pair counts over a (syms, f) vocabulary frame,
    * weighted by word frequency: (c1, c2, cnt). The sequence guard
    * matters — Spark's sequence(1, 0) DESCENDS, so single-symbol words
    * must be filtered, not relied on to produce an empty transform. */
  def pairStats(vocab: DataFrame): DataFrame =
    vocab.filter(size(col("syms")) >= 2)
      .select(col("f"), explode(expr(
        "transform(sequence(1, size(syms) - 1), " +
          "i -> named_struct('c1', element_at(syms, i), " +
          "'c2', element_at(syms, i + 1)))")).as("p"))
      .groupBy(col("p.c1").as("c1"), col("p.c2").as("c2"))
      .agg(sum(col("f")).as("cnt"))

  /** One BPE merge applied to a symbol array: every LEFT-TO-RIGHT
    * non-overlapping (c1, c2) adjacency becomes the concatenated
    * token. A fold, not a regex: the accumulator's last element is
    * merged in place when (last = c1, next = c2). Left-to-right
    * non-overlap falls out — merging consumes c2, and the merged token
    * c1||c2 can never equal c1 (c2 is non-empty), so a fresh merge
    * never chains into the next symbol ("aaa" under (a,a) → [aa, a],
    * "abab" under (a,b) → [ab, ab]). Map-side only. */
  def mergePair(syms: Column, c1: Column, c2: Column): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, size(acc)) === c1 && x === c2,
        concat(slice(acc, lit(1), size(acc) - 1), array(concat(c1, c2))))
        .otherwise(concat(acc, array(x))))

  /** Train `nMerges` BPE merges: per round, argmax pair (count desc,
    * then (c1, c2) — the deterministic tiebreak) and rewrite the
    * vocabulary. The per-round argmax collects ONE row (bounded driver
    * traffic, the k-means pattern); the rewrite is map-side;
    * localCheckpoint truncates the per-round lineage (iterative-loop
    * rule, same as the Lloyd trainer). Returns the ordered merge
    * list. */
  def train(docs: DataFrame, nMerges: Int): Seq[(String, String)] = {
    var vocab = symbolize(wordFreqs(docs)).localCheckpoint()
    val merges = Seq.newBuilder[(String, String)]
    var continue = true
    var round = 0
    while (continue && round < nMerges) {
      val top = pairStats(vocab)
        .orderBy(col("cnt").desc, col("c1"), col("c2")).limit(1)
        .collect()
      if (top.isEmpty) continue = false
      else {
        val (c1, c2) = (top(0).getString(0), top(0).getString(1))
        merges += ((c1, c2))
        vocab = vocab.select(
          mergePair(col("syms"), lit(c1), lit(c2)).as("syms"), col("f"))
          .localCheckpoint()
      }
      round += 1
    }
    merges.result()
  }

  /** Catalog entry: the first-round pair statistics (top 20 by count,
    * (c1, c2) tiebreak) — the argmax evidence every merge decision is
    * built from, hash-checked bit-for-bit. substr-based pair
    * extraction (not a char-split) because Spark and DuckDB agree on
    * substr character semantics. */
  val pairStatsQ: Q = Q(
    "n58_bpe_pairs",
    """WITH words AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |wf AS (SELECT w, count(*) AS f FROM words WHERE length(w) >= 2 GROUP BY w),
      |pairs AS (SELECT substr(w, i, 1) AS c1, substr(w, i + 1, 1) AS c2, f
      |          FROM (SELECT w, f, unnest(generate_series(1, length(w) - 1)) AS i
      |                FROM wf)),
      |pc AS (SELECT c1, c2, CAST(sum(f) AS BIGINT) AS cnt
      |       FROM pairs GROUP BY c1, c2),
      |ranked AS (SELECT c1, c2, cnt,
      |                  row_number() OVER (ORDER BY cnt DESC, c1, c2) AS rn
      |           FROM pc)
      |SELECT c1, c2, cnt, CAST(rn AS BIGINT) AS rn
      |FROM ranked WHERE rn <= 20
      |ORDER BY rn""".stripMargin) { (s, dir) =>
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("c1"), col("c2"))
    pairStats(symbolize(wordFreqs(Tables(s, dir).documents)))
      .orderBy(col("cnt").desc, col("c1"), col("c2")).limit(20)
      .withColumn("rn", row_number().over(w).cast("long"))
      .orderBy("rn")
  }

  val all: Seq[Q] = Seq(pairStatsQ)
}
