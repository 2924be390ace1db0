package graft

import graft.pipeline.Present
import org.json4s._
import org.json4s.jackson.JsonMethods

/** GeoJSON presentation payload (the reference's map boundary). */
class PresentSpec extends SparkSpec {
  import spark.implicits._

  private val vehicles = Seq(
    (Some(-73.98), Some(40.75), "v1", "M34"),
    (Some(-73.95), Some(40.78), "v2", "M15"),
    (None: Option[Double], Some(40.70), "v3", "M15") // dropped: null lon
  ).toDF("longitude", "latitude", "vehicle_id", "route_id")

  test("valid FeatureCollection: null coords dropped, properties carried") {
    val json = Present.geoJsonPoints(vehicles, "longitude", "latitude",
      Seq("vehicle_id", "route_id"))
    val parsed = JsonMethods.parse(json)
    assert((parsed \ "type") == JString("FeatureCollection"))
    val feats = (parsed \ "features").asInstanceOf[JArray].arr
    assert(feats.length == 2)
    feats.foreach { f =>
      assert((f \ "type") == JString("Feature"))
      assert((f \ "geometry" \ "type") == JString("Point"))
      val coords = (f \ "geometry" \ "coordinates").asInstanceOf[JArray].arr
      assert(coords.length == 2)
    }
    val ids = feats.map(f => (f \ "properties" \ "vehicle_id")).collect {
      case JString(s) => s
    }.toSet
    assert(ids == Set("v1", "v2"))
  }

  test("feature cap refuses to collect an unbounded table") {
    val big = (1 to 50).map(i => (Some(i * 0.1), Some(i * 0.1), s"v$i", "r"))
      .toDF("longitude", "latitude", "vehicle_id", "route_id")
    val ex = intercept[IllegalArgumentException] {
      Present.geoJsonPoints(big, "longitude", "latitude", Seq("vehicle_id"),
        maxFeatures = 10)
    }
    assert(ex.getMessage.contains("10"))
  }

  test("end-to-end: pipeline batch output renders to GeoJSON") {
    import java.nio.file.{Files, Paths}
    import java.sql.Timestamp
    import graft.pipeline._
    import graft.sources.GtfsRt
    import graft.sources.GtfsRt.RawVehicle
    val dir = Files.createTempDirectory("present").toString
    val pb = s"$dir/feed.pb"
    val vs = (1 to 5).map(i => RawVehicle(Some(s"v$i"),
      Some(40.0 + i * 0.01), Some(-74.0 + i * 0.01), None, None,
      Some(s"t$i"), Some("M34"), Some(i), Some(2)))
    Files.write(Paths.get(pb), GtfsRt.encodeFeed(vs))
    GtfsPipeline.runBatch(spark, Seq(FeedConfig("f", pb)), new FileFeedSource,
      s"$dir/data", s"$dir/ledger", Timestamp.valueOf("2024-06-01 12:00:30"))
    val json = Present.geoJsonPoints(
      spark.read.parquet(s"$dir/data"),
      "longitude", "latitude", Seq("vehicle_id", "route_id"))
    val feats = (JsonMethods.parse(json) \ "features").asInstanceOf[JArray].arr
    assert(feats.length == 5)
  }

  test("htmlMap: folium-shaped standalone document, script-safe payload") {
    import spark.implicits._
    val df = Seq(
      (1L, -74.0, 40.7, "B62"),
      // a hostile property value must not terminate the script element
      (2L, -73.9, 40.8, "</script><b>x</b>"))
      .toDF("vehicle_id", "lon", "lat", "route_id")
    val html = Present.htmlMap(df, "lon", "lat", Seq("vehicle_id", "route_id"))
    assert(html.startsWith("<!DOCTYPE html>"))
    assert(html.contains("leaflet@1.9.3/dist/leaflet.js"))
    assert(html.contains("setView([40.7128, -74.006], 11)")) // ref defaults
    assert(html.contains("radius: 3") && html.contains("color: 'blue'"))
    assert(html.contains("\"coordinates\":[-74.0,40.7]"))
    // the raw close tag never appears inside the embedded JSON
    val payloadStart = html.indexOf("var data = ")
    val payload = html.substring(payloadStart, html.indexOf("\n", payloadStart))
    assert(!payload.contains("</script>"))
    assert(payload.contains("<\\/script>"))
    // popup builder HTML-escapes untrusted property values client-side
    assert(html.contains("replace(/[&<>\"']/g"))
    // and the escaped form parses back to the original JSON value
    val parsed = JsonMethods.parse(payload.stripPrefix("var data = ").stripSuffix(";"))
    val routes = (parsed \\ "route_id").asInstanceOf[org.json4s.JObject].obj
      .map(_._2.values.toString).toSet
    assert(routes.contains("</script><b>x</b>"))
  }
}
