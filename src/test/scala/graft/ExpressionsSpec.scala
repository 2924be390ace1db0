package graft

import org.apache.spark.sql.functions._
import graft.functions.{GeoWkb, GraftFunctions}

/** Custom Catalyst expressions: WKB point codec + SQL registration. */
class ExpressionsSpec extends SparkSpec {
  import GraftFunctions._

  test("st_point produces canonical little-endian WKB") {
    val wkb = GeoWkb.pointWkb(-73.9857, 40.7484)
    assert(wkb.length == 21)
    assert(wkb(0) == 1.toByte)           // little-endian marker
    assert(wkb(1) == 1.toByte && wkb(2) == 0) // geometry type 1 = Point
    assert(GeoWkb.readX(wkb) == -73.9857)
    assert(GeoWkb.readY(wkb) == 40.7484)
  }

  test("st_x/st_y roundtrip through the codegen path") {
    import spark.implicits._
    val df = Seq((-73.9857, 40.7484), (0.0, -90.0), (180.0, 90.0))
      .toDF("lon", "lat")
    val back = df.select(
      st_x(st_point(col("lon"), col("lat"))).as("x"),
      st_y(st_point(col("lon"), col("lat"))).as("y"),
      col("lon"), col("lat"))
      .collect()
    back.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(2))
      assert(r.getDouble(1) == r.getDouble(3))
    }
  }

  test("null propagation: null coordinate yields null WKB") {
    import spark.implicits._
    val df = Seq((Some(1.0), None: Option[Double]), (None, Some(2.0)),
      (Some(3.0), Some(4.0))).toDF("lon", "lat")
    val out = df.select(st_point(col("lon"), col("lat")).as("g")).collect()
    assert(out(0).isNullAt(0) && out(1).isNullAt(0) && !out(2).isNullAt(0))
  }

  test("SQL registration: st_point/st_x/cosine_sim usable from spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT st_x(st_point(CAST(1.5 AS DOUBLE), CAST(2.5 AS DOUBLE))) AS x, " +
      "cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
      "           array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c").head()
    assert(r.getDouble(0) == 1.5)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("big-endian WKB is readable too") {
    val bb = java.nio.ByteBuffer.allocate(21)
    bb.put(0.toByte).putInt(1).putDouble(11.0).putDouble(22.0)
    assert(GeoWkb.readX(bb.array()) == 11.0)
    assert(GeoWkb.readY(bb.array()) == 22.0)
  }

  test("char_sum equals the split/transform fold it replaces, null-safe") {
    import spark.implicits._
    val df = Seq(Some("abc"), Some(""), Some("aZ09 !"), Some("δß€"), None)
      .toDF("s")
    val got = df.select(GraftFunctions.char_sum(col("s")).as("n")).collect()
      .map(r => if (r.isNullAt(0)) -1L else r.getLong(0))
    val want = df.select(
      coalesce(aggregate(transform(split(col("s"), ""), c => ascii(c).cast("long")),
        lit(0L), (a, x) => a + x), lit(-1L)).as("n")).collect()
      .map(_.getLong(0))
    // 'abc' = 97+98+99; the boxed-array fold is the semantic spec
    assert(got(0) == 294L)
    assert(got.sameElements(want), s"got=${got.mkString(",")} want=${want.mkString(",")}")
  }

  test("l2_sq equals the aggregate/zip_with fold it replaces, bit-for-bit") {
    import spark.implicits._
    val e = Tables(spark, sf0001).embeddings.limit(64)
    val pairs = e.select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .crossJoin(e.select(col("vec_id").as("b_id"), col("embedding").as("b")))
      .filter(col("a_id") < col("b_id"))
    val fold = aggregate(
      zip_with(col("a"), col("b"), (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0), (acc, x) => acc + x)
    val diff = pairs.select(
      GraftFunctions.l2_sq(col("a"), col("b")).as("fast"), fold.as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    // EXACT equality, not tolerance: same left-to-right FP sequence
    assert(diff == 0L)
  }

  test("md5_slices equals the substring-of-md5 expression tree, null-safe") {
    import spark.implicits._
    val df = Seq(Some("alpha beta gamma"), Some(""), Some("δ unicode ß"), None)
      .toDF("s")
    val viaExpr = df.select(GraftFunctions.md5_slices(col("s")).as("sl"))
    val viaTree = df.select(array((0 until 16).map { j =>
      val (a, b) = (j / 4, j % 4)
      substring(md5(concat(lit(s"$a:"), col("s")).cast("binary")), 8 * b + 1, 8)
    }: _*).as("sl"))
    val got = viaExpr.collect().map(r =>
      if (r.isNullAt(0)) null else r.getSeq[String](0))
    val want = viaTree.collect().map(r =>
      if (r.isNullAt(0)) null else r.getSeq[String](0))
    assert(got.length == want.length)
    // pairwise on non-null inputs (the tree form maps null to an
    // array OF nulls; the expression nulls out whole-row, which is
    // what the aggregation wants)
    got.zip(want).take(3).foreach { case (g, w) => assert(g == w) }
    assert(got(3) == null) // null in, null out
  }

  test("ppm_phash equals the typed decode path; NULL on malformed; SQL-registered") {
    import spark.implicits._
    import graft.operators.{Multimodal, Netpbm}
    val imgs = Seq("the quick brown fox jumps over it",
      "pack my box with five dozen jugs!!")
      .map(Multimodal.renderRaster)
    val rows = imgs.zipWithIndex.map { case (img, i) =>
      (i.toLong, Netpbm.encodeP6(img, style = i.toLong))
    } :+ ((99L, "not a ppm at all".getBytes.toSeq.toArray))
    val df = rows.toDF("doc_id", "media")
    val got = df.select(col("doc_id"),
      GraftFunctions.ppm_phash(col("media")).as("ph"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    imgs.zipWithIndex.foreach { case (img, i) =>
      assert(got(i.toLong).contains(Netpbm.whtPhash(Netpbm.luma8x8(img))))
    }
    assert(got(99L).isEmpty, "malformed media must hash to NULL, not throw")
    // SQL registration path
    GraftFunctions.register(spark)
    df.createOrReplaceTempView("media_probe")
    val viaSql = spark.sql(
      "SELECT count(ppm_phash(media)) FROM media_probe").head().getLong(0)
    assert(viaSql == 2L) // NULL for the malformed row is not counted
    // and the expression stays inside whole-stage codegen
    val plan = df.select(GraftFunctions.ppm_phash(col("media")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), plan)
  }
}
