package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSim, DotFloat, Md5Slices, NormFloat, PpmPhash, PpmValid, QuantizedCos, StPoint, StX, StY}

/** SparkSessionExtensions entry point: makes the engine's custom
  * expressions first-class SQL functions in any session built with
  *
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)   // or
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *
  * (SURVEY.md §7.3; the config-string form is how a cluster deploy
  * enables them without code changes.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name, usage, "", "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("st_point"),
      info("st_point", "st_point(lon, lat) - WKB point from coordinates"),
      (es: Seq[Expression]) => StPoint(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("st_x"),
      info("st_x", "st_x(wkb) - x coordinate of a WKB point"),
      (es: Seq[Expression]) => StX(es.head)))
    ext.injectFunction((FunctionIdentifier("st_y"),
      info("st_y", "st_y(wkb) - y coordinate of a WKB point"),
      (es: Seq[Expression]) => StY(es.head)))
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of float vectors"),
      (es: Seq[Expression]) => CosineSim(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("quantized_cos"),
      info("quantized_cos", "quantized_cos(a, b) - cosine over int8 code vectors"),
      (es: Seq[Expression]) => QuantizedCos(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("dot_float"),
      info("dot_float", "dot_float(a, b) - dot product of float vectors in double"),
      (es: Seq[Expression]) => DotFloat(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("norm_float"),
      info("norm_float", "norm_float(a) - L2 norm of a float vector"),
      (es: Seq[Expression]) => NormFloat(es.head)))
    ext.injectFunction((FunctionIdentifier("md5_slices"),
      info("md5_slices", "md5_slices(s) - 16 8-hex-char MinHash components"),
      (es: Seq[Expression]) => Md5Slices(es.head)))
    ext.injectFunction((FunctionIdentifier("ppm_phash"),
      info("ppm_phash", "ppm_phash(media) - 16-bit WHT perceptual hash of a binary PPM; NULL if undecodable"),
      (es: Seq[Expression]) => PpmPhash(es.head)))
    ext.injectFunction((FunctionIdentifier("ppm_valid"),
      info("ppm_valid", "ppm_valid(media) - O(header) check that the bytes parse as a decodable P6"),
      (es: Seq[Expression]) => PpmValid(es.head)))
    // native as-of join planning in any session built with this
    // extension (AsOfJoin.asof also self-registers for ad-hoc use)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // provably-1-row join sides get a broadcast hint even without an
    // explicit broadcast() call (scalar-threshold pattern safety net)
    ext.injectOptimizerRule(_ => graft.plans.TinyAggBroadcast)
  }
}
