package graft
import org.apache.spark.sql.SparkSession

/** Single-query timing harness: `tools/run.sh graft.TimeQ <name>...`
  * times each named catalog query twice (cold JVM then warm) on
  * SPARK_GRAFT_SF_DIR — the isolation probe for attributing a Bench
  * inflation to the query itself vs cross-query session state vs host
  * noise (a full Bench run conflates all three).
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { n =>
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        val cnt = Catalog.queries(n)(spark, dir).count()
        println(f"$n rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$cnt")
      }
    }
    spark.stop()
  }
}
