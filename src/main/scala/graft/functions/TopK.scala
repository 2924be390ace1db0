package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator: keeps a bounded k-element buffer per group
  * with map-side partial aggregation — the scale path for per-key
  * top-k. A window row_number formulation sorts every group's full row
  * set; this moves at most k rows per group per partition through the
  * shuffle (SURVEY.md §2.10 — Aggregator[IN, BUF, OUT] where builtins
  * don't fit).
  *
  * Ordering: by score descending, ties broken by smaller id — matching
  * the deterministic ranking used across the catalog.
  */
class TopKByScore(k: Int)
    extends Aggregator[(Long, Double), List[(Double, Long)], Seq[(Long, Double)]] {

  private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def trim(xs: List[(Double, Long)]): List[(Double, Long)] =
    xs.sortWith(lt).take(k)

  override def zero: List[(Double, Long)] = Nil
  override def reduce(buf: List[(Double, Long)], in: (Long, Double)): List[(Double, Long)] = {
    val e = (in._2, in._1)
    // buf is kept sorted (trim output), so buf.last is the current
    // worst survivor — a full buffer rejects non-improving rows in O(1)
    // instead of re-sorting (the overwhelmingly common case at scale)
    if (buf.nonEmpty && buf.lengthCompare(k) >= 0 && !lt(e, buf.last)) buf
    else trim(e :: buf)
  }
  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    trim(a ++ b)
  override def finish(buf: List[(Double, Long)]): Seq[(Long, Double)] =
    buf.sortWith(lt).map { case (score, id) => (id, score) }

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    Encoders.kryo[List[(Double, Long)]]
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    Encoders.kryo[Seq[(Long, Double)]]
}
