package graft

import graft.operators.{Multimodal, Netpbm}
import graft.operators.Multimodal.MediaRow
import org.apache.spark.sql.functions.col

/** Multimodal binary-column plumbing: the REAL PPM codec path
  * (round 7 — VERDICT_r06 #4) plus the remaining documented video
  * stub. */
class MultimodalSpec extends SparkSpec {

  // ---- codec unit behavior (no Spark) ----

  private val probe = Netpbm.Image(3, 2, 255,
    Array[Byte](0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17))

  test("ppm roundtrip: decode(encode(img)) recovers dims and raster for every header style") {
    (0L to 6L).foreach { style =>
      val enc = Netpbm.encodeP6(probe, style)
      val dec = Netpbm.decodeP6(enc)
      assert(dec.isRight, s"style $style: $dec")
      val img = dec.toOption.get
      assert(img.width == 3 && img.height == 2 && img.maxval == 255)
      assert(img.raster.sameElements(probe.raster), s"style $style raster")
    }
  }

  test("recompression: byte-different encodings of the same image decode identically") {
    val a = Netpbm.encodeP6(probe, style = 0)
    val b = Netpbm.encodeP6(probe, style = 1)
    assert(!a.sameElements(b), "styles must change the file bytes")
    val da = Netpbm.decodeP6(a).toOption.get
    val db = Netpbm.decodeP6(b).toOption.get
    assert(da.raster.sameElements(db.raster))
    assert(Netpbm.whtPhash(Netpbm.luma8x8(da)) == Netpbm.whtPhash(Netpbm.luma8x8(db)))
  }

  test("parser handles comments and mixed whitespace; rejects malformed input") {
    val hand = ("P6 # trailing comment\n# full comment line\n  3\t2 # dims done\n255\n")
      .getBytes("US-ASCII") ++ probe.raster
    val dec = Netpbm.decodeP6(hand)
    assert(dec.isRight, s"hand-built header must parse: $dec")
    assert(dec.toOption.get.raster.sameElements(probe.raster))

    assert(Netpbm.decodeP6("P5 3 2 255 ".getBytes ++ probe.raster).isLeft, "bad magic")
    assert(Netpbm.decodeP6("P6 3 2 255\n".getBytes ++ probe.raster.take(10)).isLeft, "truncated raster")
    assert(Netpbm.decodeP6("P6 3 2\n".getBytes).isLeft, "missing maxval")
    assert(Netpbm.decodeP6("P6 3 2 70000\n".getBytes ++ probe.raster).isLeft, "2-byte maxval unsupported")
    assert(Netpbm.decodeP6("P6 0 2 255\n".getBytes).isLeft, "zero width")
  }

  test("phash robustness: single-pixel perturbation stays within small hamming distance") {
    val img = Multimodal.renderRaster("the quick brown fox jumps over the lazy dog, twice over")
    val base = Netpbm.whtPhash(Netpbm.luma8x8(img))
    val perturbed = img.raster.clone()
    perturbed(7) = (perturbed(7) ^ 0x1f).toByte
    val ph2 = Netpbm.whtPhash(Netpbm.luma8x8(Netpbm.Image(img.width, img.height, 255, perturbed)))
    val hamming = java.lang.Long.bitCount(base ^ ph2)
    assert(hamming <= 3, s"one perturbed pixel flipped $hamming of 16 bits")
    // while a structurally different image lands far away
    val other = Multimodal.renderRaster("AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA")
    val ph3 = Netpbm.whtPhash(Netpbm.luma8x8(other))
    assert(java.lang.Long.bitCount(base ^ ph3) > 3)
  }

  // ---- Spark-side real decode path ----

  test("real decode is deterministic, typed, and covers the corpus") {
    val df = Catalog.queries("n31_media_decode")(spark, sf0001)
    val a = df.collect()
    val b = Catalog.queries("n31_media_decode")(spark, sf0001).collect()
    assert(a.sameElements(b))
    assert(a.length == 500)
    a.foreach { r =>
      val w = r.getAs[Int]("width"); val h = r.getAs[Int]("height")
      assert(w >= 8 && w <= 31 && h >= 8 && h <= 25)
      assert(r.getAs[Long]("n_bytes") == w.toLong * h * 3)
      val means = Seq("mean_r", "mean_g", "mean_b").map(r.getAs[Long])
      assert(means.forall(m => m >= 0 && m <= 255))
    }
  }

  test("decoded dims agree with the n30 metadata formula (w = n%24+8, h = 7n%18+8)") {
    val meta = Catalog.queries("n30_media_meta")(spark, sf0001)
      .select("doc_id", "n_bytes").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val decoded = Catalog.queries("n31_media_decode")(spark, sf0001)
      .select("doc_id", "width", "height").collect()
    decoded.foreach { r =>
      val n = meta(r.getLong(0))
      assert(r.getAs[Int]("width") == (n % 24 + 8).toInt)
      assert(r.getAs[Int]("height") == ((n * 7) % 18 + 8).toInt)
    }
  }

  test("real resize: fixed 16x16 box, content-dependent checksum, matches direct resample") {
    val out = Catalog.queries("n32_media_resize")(spark, sf0001).collect()
    assert(out.length == 500)
    assert(out.forall(r => r.getAs[Int]("width") == 16 && r.getAs[Int]("height") == 16))
    assert(out.map(_.getAs[Long]("checksum")).distinct.length > 400)
    // spot-check one row against a direct in-memory resample
    val docs = Tables(spark, sf0001).documents
      .select("doc_id", "text").filter(col("doc_id") === out.head.getAs[Long]("doc_id"))
      .collect()
    val img = Multimodal.renderRaster(docs.head.getString(1))
    val expect = Netpbm.checksum(Netpbm.resizeNearest(img, 16, 16).raster)
    assert(out.head.getAs[Long]("checksum") == expect)
  }

  test("frame sampling (real Y4M demux): ≤ 4 evenly-spaced frames per doc, hashes match a direct render") {
    val frames = Catalog.queries("n33_media_frames")(spark, sf0001).collect()
    assert(frames.nonEmpty)
    val perDoc = frames.groupBy(_.getAs[Long]("doc_id"))
    assert(perDoc.values.forall(fs => fs.length >= 1 && fs.length <= 4))
    // spot-check one doc against an in-memory render (no codec involved)
    val (docId, sampled) = perDoc.head
    val text = Tables(spark, sf0001).documents
      .filter(col("doc_id") === docId).select("text").collect().head.getString(0)
    val v = Multimodal.renderVideo(text)
    val expect = operators.Y4m.sampleIndices(v.frames.length, 4)
      .map(f => (f, Netpbm.checksum(v.frames(f)))).toSet
    assert(sampled.map(r => (r.getAs[Int]("frame_idx"), r.getAs[Long]("frame_hash"))).toSet == expect)
  }

  test("n80 video decode recovers the generative clip through the container") {
    val out = Catalog.queries("n80_video_decode")(spark, sf0001).collect()
    assert(out.nonEmpty)
    val row = out.head
    val text = Tables(spark, sf0001).documents
      .filter(col("doc_id") === row.getAs[Long]("doc_id"))
      .select("text").collect().head.getString(0)
    val v = Multimodal.renderVideo(text)
    assert(row.getAs[Int]("n_frames") == v.frames.length)
    assert(row.getAs[Int]("width") == v.width && row.getAs[Int]("height") == v.height)
    assert(row.getAs[Long]("checksum") ==
      v.frames.foldLeft(0L)((c, f) => f.foldLeft(c)((a, b) => a * 31 + (b & 0xff))))
  }

  // ---- recompression-invariant perceptual dedup (n61) ----

  test("n61 groups every planted re-encoded copy with its original") {
    val groups = Catalog.queries("n61_media_phash_dedup")(spark, sf0001).collect()
    assert(groups.nonEmpty)
    val memberSets = groups.map(_.getAs[String]("members").split(";").map(_.toLong).toSet)
    // every 20th doc has a byte-different, pixel-identical copy at id+1e6;
    // the real decode must reunite each pair
    val planted = Tables(spark, sf0001).documents
      .filter(col("doc_id") % 20 === 0).select("doc_id").collect().map(_.getLong(0))
    assert(planted.nonEmpty)
    planted.foreach { id =>
      assert(memberSets.exists(s => s.contains(id) && s.contains(id + 1000000L)),
        s"copy pair ($id, ${id + 1000000L}) not grouped")
    }
    groups.foreach { g =>
      val members = g.getAs[String]("members").split(";").map(_.toLong)
      assert(members.length == g.getAs[Long]("n_members"))
      assert(members.length >= 2)
      assert(members.sorted.sameElements(members), "members must be sorted")
    }
  }

  test("phash groups: byte-identical payloads collide; structurally distinct separate") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abcdefghijklmnopqrstuvwxyz011235"),
      (2L, "abcdefghijklmnopqrstuvwxyz011235"),
      (3L, "aZaZaZaZaZaZaZaZaZaZaZaZaZaZaZaZ"),
      (4L, "short text here!")).toDF("doc_id", "text")
    val groups = Multimodal.phashGroups(Multimodal.ppmRows(docs)).collect()
      .map(g => g.getAs[String]("members")).toSet
    assert(groups.contains("1;2"), s"identical payloads must group, got $groups")
    assert(!groups.exists(m => m.contains("3") || m.contains("4")))
  }

  // ---- non-ASCII symmetry (VERDICT_r09 #2) ----
  //
  // The media render formulas address text BYTES (US-ASCII) while the
  // DuckDB oracles address CODEPOINTS; the `octet_length = length` guard
  // must therefore drop every non-ASCII document in BOTH engines. The
  // harness corpus is all-ASCII, so CORRECTNESS can't see a drift here —
  // this fixture plants the divergent inputs instead. Cross-engine
  // identity on the same fixture was proven with the real driver check
  // (round 10): Verify + tools/check.py over a 500-doc corpus with five
  // planted non-ASCII docs (2/3/4-byte UTF-8 + combining accent) passes
  // all nine media entries, 495 rows each — after replacing the oracle's
  // `CAST(text AS BLOB)` (which ERRORS on non-ASCII in DuckDB) with
  // `encode(text)`.

  test("non-ASCII documents drop out of every media family symmetrically") {
    import spark.implicits._
    val docs = Seq(
      (1L, "plain ascii long enough to render"), // kept
      (2L, "héllo wörld, many accents indeed!"), // 2-byte UTF-8
      (3L, "数据管道的质量控制与重复数据删除流程"), // 3-byte UTF-8
      (4L, "🚀🚀🚀🚀 rockets and more rockets 🚀"), // 4-byte supplementary
      (5L, "café combining accent, long text"), // combining mark
      (6L, "second plain ascii document kept")).toDF("doc_id", "text")
    val keep = Set(1L, 6L)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(Multimodal.ppmRows(docs).toDF()) == keep)
    assert(ids(Multimodal.wavRows(docs).toDF()) == keep)
    assert(ids(Multimodal.y4mRows(docs).toDF()) == keep)
    // the survivors decode to the generative formula (bytes == codepoints)
    val feats = Multimodal.decodedAudio(Multimodal.wavRows(docs)).collect()
    assert(feats.length == 2)
    feats.foreach { r =>
      val n = docs.filter($"doc_id" === r.getAs[Long]("doc_id"))
        .head().getString(1).length.toLong
      assert(r.getAs[Long]("n_samples") == n % 96 + 32)
    }
  }
}
