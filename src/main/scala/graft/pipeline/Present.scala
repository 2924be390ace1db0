package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Presentation boundary (SURVEY.md §3.3): the reference renders each
  * snapshot as a folium map of vehicle points (read_gtfs_rt.py:10-28).
  * The engine's responsibility ends at a standard payload a renderer
  * consumes — GeoJSON. Feature formatting runs DISTRIBUTED (to_json
  * over a struct column); only the finished feature strings cross the
  * collect boundary, and a hard cap guards against accidentally
  * collecting a 100 TB table into a map payload.
  */
object Present {

  /** GeoJSON FeatureCollection of points. `propCols` become feature
    * properties. Rows with a null coordinate are dropped (the
    * reference's dropna, read_gtfs_rt.py:17). */
  def geoJsonPoints(
      df: DataFrame,
      lonCol: String,
      latCol: String,
      propCols: Seq[String],
      maxFeatures: Int = 100000): String = {
    val features = df
      .filter(col(lonCol).isNotNull && col(latCol).isNotNull)
      .select(to_json(struct(
        lit("Feature").as("type"),
        struct(
          lit("Point").as("type"),
          array(col(lonCol).cast("double"), col(latCol).cast("double"))
            .as("coordinates")).as("geometry"),
        struct(propCols.map(col): _*).as("properties"))).as("f"))
      .limit(maxFeatures + 1)
      .collect()
      .map(_.getString(0))
    require(features.length <= maxFeatures,
      s"more than $maxFeatures features — aggregate or filter before presenting")
    features.mkString(
      """{"type":"FeatureCollection","features":[""", ",", "]}")
  }

  /** Standalone HTML map document — the engine-side twin of the
    * reference's folium rendering (read_gtfs_rt.py:10-28 builds a map
    * at [40.7128, -74.0060] zoom 11 with radius-3 blue CircleMarkers
    * and per-point property popups; :49-52 saves it as HTML). folium's
    * own output is a Leaflet page pulling from CDNs; this emits the
    * same shape directly: Leaflet from the CDN, one circleMarker per
    * feature, popup listing the feature's properties. The feature
    * payload is the distributed-built [[geoJsonPoints]] collection —
    * the driver only templates the finished string.
    *
    * `</` is escaped as `<\/` inside the embedded JSON (valid JSON,
    * required in HTML: a property value containing `</script>` must
    * not terminate the script element). */
  def htmlMap(
      df: DataFrame,
      lonCol: String,
      latCol: String,
      propCols: Seq[String],
      center: (Double, Double) = (40.7128, -74.0060),
      zoom: Int = 11,
      maxFeatures: Int = 100000): String = {
    val payload = geoJsonPoints(df, lonCol, latCol, propCols, maxFeatures)
      .replace("</", "<\\/")
    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8"/>
       |<link rel="stylesheet" href="https://cdn.jsdelivr.net/npm/leaflet@1.9.3/dist/leaflet.css"/>
       |<script src="https://cdn.jsdelivr.net/npm/leaflet@1.9.3/dist/leaflet.js"></script>
       |<style>html,body,#map{height:100%;margin:0}</style></head>
       |<body><div id="map"></div>
       |<script>
       |var map = L.map('map').setView([${center._1}, ${center._2}], $zoom);
       |L.tileLayer('https://tile.openstreetmap.org/{z}/{x}/{y}.png',
       |  {maxZoom: 19, attribution: '&copy; OpenStreetMap'}).addTo(map);
       |var data = $payload;
       |L.geoJSON(data, {
       |  pointToLayer: function (f, latlng) {
       |    return L.circleMarker(latlng, {radius: 3, color: 'blue', fill: true});
       |  },
       |  onEachFeature: function (f, layer) {
       |    var p = f.properties || {};
       |    // Leaflet renders popup content as HTML; property values come
       |    // from untrusted feeds, so escape them before concatenation
       |    var esc = function (v) {
       |      return String(v).replace(/[&<>"']/g, function (c) {
       |        return '&#' + c.charCodeAt(0) + ';';
       |      });
       |    };
       |    layer.bindPopup(Object.keys(p).map(function (k) {
       |      return esc(k) + ' ' + esc(p[k]);
       |    }).join('<br>'));
       |  }
       |}).addTo(map);
       |</script></body></html>
       |""".stripMargin
  }
}
