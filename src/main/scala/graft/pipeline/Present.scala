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
}
