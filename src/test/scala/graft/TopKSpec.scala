package graft

import graft.functions.TopKByScore
import org.apache.spark.sql.functions._

/** Typed top-k Aggregator vs the window row_number formulation. */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("heap aggregator matches window top-k on the cosine query") {
    val cat = Catalog.queries("n10_cosine_topk")(spark, sf0001).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.sortBy(_.getAs[Long]("rn"))
        .map(r => (r.getAs[Long]("nb_id"), r.getAs[Double]("cos"))).toSeq)
      .toMap

    val e = Tables(spark, sf0001).embeddings
    val q = e.filter(col("vec_id") < 32)
    val pairs = graft.operators.Similarity.cosineTopK(e, q, k = Int.MaxValue)
    // route the raw (pre-ranked) pairs through the typed aggregator
    val raw = pairs.select("q_id", "nb_id", "cos")
      .as[(Long, Long, Double)]
      .map { case (qid, nb, cos) => (qid, (nb, cos)) }
    val agg = raw.groupByKey(_._1)
      .mapValues(_._2)
      .agg(new TopKByScore(5).toColumn)
      .collect().toMap
    assert(agg.keySet == cat.keySet)
    agg.foreach { case (qid, top) => assert(top == cat(qid), s"q=$qid") }
  }

  test("partial aggregation: merge order does not change the result") {
    val a = new TopKByScore(3)
    val items = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (4L, 0.1), (5L, 0.7))
    val whole = items.foldLeft(a.zero)(a.reduce)
    val (l, r) = items.splitAt(2)
    val merged = a.merge(l.foldLeft(a.zero)(a.reduce), r.foldLeft(a.zero)(a.reduce))
    assert(a.finish(whole) == a.finish(merged))
    assert(a.finish(whole) == Seq((2L, 0.9), (3L, 0.9), (5L, 0.7))) // id tiebreak
  }
}
