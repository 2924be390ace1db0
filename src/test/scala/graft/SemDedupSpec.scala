package graft

import org.apache.spark.sql.functions._
import graft.operators.{IncrementalAnn, SemDedup, Similarity}

/** SemDeDup (n48): planted-duplicate proofs for the k-means +
  * intra-cell cosine prune — an exact clone is flagged (and only the
  * higher id), survivors drop exactly the flagged rows, and the audit
  * frame is total and internally consistent. */
class SemDedupSpec extends SparkSpec {

  private def emb = Tables(spark, sf0001).embeddings

  test("audit frame is total and is_dup == (max_lower_cos >= tau)") {
    val audit = SemDedup.semanticDups(emb, k = 4, iters = 1, tau = 0.4)
      .collect()
    assert(audit.length == emb.count())
    audit.foreach { r =>
      val (cos, dup) = (r.getDouble(2), r.getBoolean(3))
      assert(dup == (cos >= 0.4),
        s"vec ${r.getLong(0)}: is_dup=$dup but max_lower_cos=$cos")
    }
  }

  test("planted exact clone: higher id flagged at cos 1.0, lower id kept") {
    import spark.implicits._
    // clone vec 3 as a new max-id vector; identical vectors share a
    // cell (same cosine to every centroid, same tiebreak) and their
    // pairwise cosine is exactly 1.0
    val maxId = emb.agg(max("vec_id")).head().getLong(0)
    val clone = emb.filter(col("vec_id") === 3)
      .select(lit(maxId + 1).as("vec_id"), col("embedding"), col("label"))
    val planted = emb.unionByName(clone)
    val audit = SemDedup.semanticDups(planted, k = 4, iters = 1, tau = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    assert(audit(maxId + 1)._1 == 1.0 && audit(maxId + 1)._2,
      s"clone should be flagged at cos 1.0, got ${audit(maxId + 1)}")
    assert(!audit(3L)._2, "the lower-id original must be kept")
    val survivors = SemDedup.survivors(planted, k = 4, iters = 1, tau = 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(!survivors.contains(maxId + 1) && survivors.contains(3L))
    assert(survivors.size == audit.count(!_._2._2))
  }

  test("incremental screen: a planted clone of an accepted vector is dropped, novel kept") {
    import spark.implicits._
    val prior = emb.filter(col("vec_id") % 2 === 0)
    val cents = Similarity.ivfCentroids(prior, k = 4, iters = 1)
    val index = IncrementalAnn.indexWith(prior, cents)
    val maxId = emb.agg(max("vec_id")).head().getLong(0)
    // batch = a clone of accepted vector 2 (cos 1.0 to it) + odd novels
    val clone = prior.filter(col("vec_id") === 2)
      .withColumn("vec_id", col("vec_id") + maxId + 1)
    val batch = emb.filter(col("vec_id") % 2 === 1).unionByName(clone)
    val audit = SemDedup.semanticScreenAudit(batch, index, tau = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    assert(audit(maxId + 3)._1 == 1.0 && audit(maxId + 3)._2,
      s"clone not flagged: ${audit(maxId + 3)}")
    // survivors = batch minus flagged rows, and the clone is gone
    val surv = SemDedup.semanticScreen(batch, index, tau = 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(!surv.contains(maxId + 3))
    assert(surv.size == audit.count(!_._2._2))
    // audit covers the whole batch (total frame, n47's auditability rule)
    assert(audit.size == batch.count())
  }

  test("pairs are intra-cell only: flags are reproducible from the assignment") {
    // recompute the audit from an explicit assignment and check the
    // library path agrees — guards against the prune ever comparing
    // across cells (which would change max_lower_cos for some vector)
    val cents = Similarity.ivfCentroids(emb, k = 4, iters = 1)
    val viaAssignment = SemDedup
      .semanticDupAudit(Similarity.assignCells(emb, cents), tau = 0.4)
    val viaLibrary = SemDedup.semanticDups(emb, k = 4, iters = 1, tau = 0.4)
    assert(viaAssignment.exceptAll(viaLibrary).isEmpty
      && viaLibrary.exceptAll(viaAssignment).isEmpty)
  }
}
