package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{IncrementalAnn, Similarity}

/** Persisted-IVF-index ANN: probe/append semantics vs the batch path,
  * parquet round-trip, and planted-duplicate recall. */
class IncrementalAnnSpec extends SparkSpec {

  private def e = Tables(spark, sf0001).embeddings
  private def prior = e.filter(col("vec_id") % 2 === 0)
  private def freshQ = e.filter(col("vec_id") % 2 === 1 && col("vec_id") < 64)
  private def cents = prior.filter(col("vec_id") < 32)
    .select(col("vec_id").as("cent_id"), col("embedding").as("cv"))

  private def resultSet(df: DataFrame): Set[(Long, Long, Long, Long)] =
    df.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("nb_id"),
      math.round(r.getAs[Double]("cos") * 1e9), r.getAs[Long]("rn"))).toSet

  test("searchIndex equals ivfSearch over the same centroids") {
    val viaIndex = resultSet(IncrementalAnn.searchIndex(
      freshQ, IncrementalAnn.indexWith(prior, cents), nProbe = 4, k = 5))
    val direct = resultSet(Similarity.ivfSearch(prior, cents, freshQ,
      nProbe = 4, k = 5))
    assert(viaIndex == direct && viaIndex.nonEmpty)
  }

  test("parquet round-trip: search from the persisted index alone matches") {
    val dir = java.nio.file.Files.createTempDirectory("ann_index").toString
    IncrementalAnn.writeIndex(IncrementalAnn.indexWith(prior, cents), dir)
    val fromDisk = IncrementalAnn.readIndex(spark, dir)
    val a = resultSet(IncrementalAnn.searchIndex(freshQ, fromDisk, 4, 5))
    val b = resultSet(IncrementalAnn.searchIndex(freshQ,
      IncrementalAnn.indexWith(prior, cents), 4, 5))
    assert(a == b && a.nonEmpty)
  }

  test("appendToIndex assigns only the new batch, identically to a rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("ann_append").toString
    val half1 = prior.filter(col("vec_id") % 4 === 0)
    val half2 = prior.filter(col("vec_id") % 4 === 2)
    IncrementalAnn.writeIndex(IncrementalAnn.indexWith(half1, cents), dir)
    IncrementalAnn.appendToIndex(half2, dir)
    val appended = IncrementalAnn.readIndex(spark, dir)
    val rebuilt = IncrementalAnn.indexWith(prior, cents)
    val a = resultSet(IncrementalAnn.searchIndex(freshQ, appended, 4, 5))
    val b = resultSet(IncrementalAnn.searchIndex(freshQ, rebuilt, 4, 5))
    assert(a == b && a.nonEmpty)
  }

  test("compaction heals a crash-replayed assignment append (file level)") {
    val dir = java.nio.file.Files.createTempDirectory("ann_replay").toString
    val half1 = prior.filter(col("vec_id") % 4 === 0)
    val half2 = prior.filter(col("vec_id") % 4 === 2)
    IncrementalAnn.writeIndex(IncrementalAnn.indexWith(half1, cents), dir)
    IncrementalAnn.appendToIndex(half2, dir)
    IncrementalAnn.appendToIndex(half2, dir) // crash-midway retry
    val replayed = IncrementalAnn.readIndex(spark, dir)
    // the replay is visible: half2's assignment rows landed twice
    assert(replayed.assignments.count() ==
      half1.count() + 2 * half2.count())

    val out = java.nio.file.Files.createTempDirectory("ann_compact").toString
    IncrementalAnn.compactAndRewrite(spark, dir, out)
    val compacted = IncrementalAnn.readIndex(spark, out)
    val rebuilt = IncrementalAnn.indexWith(prior, cents)
    assert(compacted.assignments.count() == prior.count())
    val a = resultSet(IncrementalAnn.searchIndex(freshQ, compacted, 4, 5))
    val b = resultSet(IncrementalAnn.searchIndex(freshQ, rebuilt, 4, 5))
    assert(a == b && a.nonEmpty)
  }

  test("k-means index via buildIndex: Lloyd centroids + assignment round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("ann_kmeans").toString
    IncrementalAnn.buildAndWriteIndex(prior, dir, nCells = 8, iters = 2)
    val idx = IncrementalAnn.readIndex(spark, dir)
    assert(idx.centroids.count() == 8)
    // every prior vector assigned to exactly one of the 8 cells
    assert(idx.assignments.count() == prior.count())
    assert(idx.assignments.select("cell").distinct().count() <= 8)
    val res = IncrementalAnn.searchIndex(freshQ, idx, nProbe = 3, k = 5)
    assert(res.count() > 0)
  }

  test("planted duplicate vectors: near-dup screen finds them at recall 1.0") {
    import spark.implicits._
    val idx = IncrementalAnn.indexWith(prior, cents)
    // new batch = exact copies of two prior vectors under fresh odd ids
    val planted = prior.filter(col("vec_id").isin(40L, 62L))
      .select((col("vec_id") + 10001).as("vec_id"), col("embedding"))
    val hits = IncrementalAnn.nearDupAgainstIndex(planted, idx,
      threshold = 0.99, nProbe = 4)
      .collect().map(r => (r.getAs[Long]("v_new"), r.getAs[Long]("v_prior"),
        r.getAs[Double]("cos")))
    val pairs = hits.map(h => (h._1, h._2)).toSet
    assert(pairs.contains((10041L, 40L)) && pairs.contains((10063L, 62L)),
      s"planted pairs missed: ${pairs.mkString(",")}")
    assert(hits.filter(h => h._2 == h._1 - 10001).forall(_._3 == 1.0))
    // soundness: every reported cosine matches the brute-force value
    val brute = planted.crossJoin(
      prior.select(col("vec_id").as("v_prior"), col("embedding").as("pe")))
      .select(col("vec_id").as("v_new"), col("v_prior"),
        graft.Det.round6(graft.functions.GraftFunctions.cosine_sim(
          col("embedding"), col("pe"))).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    hits.foreach { case (n, p, c) => assert(brute((n, p)) == c) }
  }
}
