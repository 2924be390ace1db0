package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session (one per suite, SURVEY.md §5.2). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val sf0001 = "/root/testdata/sf0.001"
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the deployment path: custom functions + the native as-of join
      // strategy arrive via spark.sql.extensions, no code changes
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // full ReadSchema in plan strings — PlanLintSpec's pruning canary
      // is silently truncated at the 100-char default otherwise
      .config("spark.sql.maxMetadataStringLength", "10000")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
