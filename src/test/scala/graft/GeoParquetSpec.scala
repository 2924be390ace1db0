package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import scala.jdk.CollectionConverters._

import graft.pipeline._
import graft.sources.{GeoParquet, GtfsRt}
import graft.sources.GtfsRt.RawVehicle
import org.apache.spark.sql.functions._

/** GeoParquet `geo` footer stamping: spec-shaped JSON, intact data,
  * visible to an independent parquet reader. */
class GeoParquetSpec extends SparkSpec {

  private def batchDir(): String = {
    val dir = Files.createTempDirectory("geo").toString
    val pb = s"$dir/feed.pb"
    val vs = (1 to 20).map(i => RawVehicle(Some(s"v$i"),
      Some(40.5 + i * 0.001), Some(-74.0 + i * 0.001),
      Some(1.0), Some(2.0), Some(s"t$i"), Some("r"), Some(i), Some(2)))
    Files.write(Paths.get(pb), GtfsRt.encodeFeed(vs))
    GtfsPipeline.runBatch(spark, Seq(FeedConfig("f", pb)), new FileFeedSource,
      s"$dir/data", s"$dir/ledger", Timestamp.valueOf("2024-06-01 12:00:30"))
    dir
  }

  test("pipeline output carries the geo footer and stays readable") {
    val dir = batchDir()
    val files = Files.walk(Paths.get(s"$dir/data")).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq
    assert(files.nonEmpty)
    files.foreach { f =>
      val geo = GeoParquet.readGeoMetadata(f)
      assert(geo.isDefined, s"$f missing geo footer")
      assert(geo.get.contains("\"version\":\"1.0.0\""))
      assert(geo.get.contains("\"primary_column\":\"geom\""))
      assert(geo.get.contains("\"encoding\":\"WKB\""))
    }
    // Spark still reads identical rows after the tail rewrite
    val back = spark.read.parquet(s"$dir/data")
    assert(back.count() == 20)
    assert(back.filter(col("geom").isNotNull).count() == 20)
    // WKB point roundtrip through the custom expression
    val x = back.select(graft.functions.GraftFunctions.st_x(col("geom")))
      .collect().map(_.getDouble(0))
    assert(x.forall(v => v > -74.0 && v < -73.9))
  }

  test("independent parquet-hadoop reader sees the geo key-value entry") {
    val dir = batchDir()
    val f = Files.walk(Paths.get(s"$dir/data")).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get
    val conf = new org.apache.hadoop.conf.Configuration()
    val input = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(new org.apache.hadoop.fs.Path(f.toUri), conf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(input)
    try {
      val kv = reader.getFooter.getFileMetaData.getKeyValueMetaData
      assert(kv.containsKey("geo"))
      assert(kv.get("geo").contains("geometry_types"))
      // spark's own schema metadata must have survived the rewrite
      assert(kv.containsKey("org.apache.spark.sql.parquet.row.metadata"))
      assert(reader.getRecordCount == 20)
    } finally reader.close()
  }

  test("stamping is idempotent") {
    val dir = batchDir()
    // runBatch already stamped; a second pass stamps nothing
    assert(GeoParquet.stampDirectory(s"$dir/data", "geom") == 0)
  }
}
