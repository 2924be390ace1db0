package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic timer: run one (or more) named catalog queries for N reps
  * and print per-rep wall times plus heap/storage gauges — the tool the
  * round-9 verdict's bench forensics needed (st06b spread, n68 monotone
  * rep climb). Not part of the bench contract; numbers here are for
  * attribution, the ratcheted record stays [[graft.Bench]].
  *
  * Usage: tools/run.sh graft.tools.TimeQ <sfDir> <reps> <name>[,<name>…]
  * Env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_TIMEQ_GC=1 to force a
  * GC between reps (isolates heap-pressure accumulation from plan cost).
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val wanted = args(2).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val gcBetween = sys.env.get("SPARK_GRAFT_TIMEQ_GC").contains("1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = graft.Tables(spark, sfDir)
    Seq(t.lineitem, t.orders, t.events, t.documents, t.embeddings).foreach(_.count())
    val qs = graft.SparkEntry.queries
    for (name <- wanted) {
      val fn = qs(name)
      (1 to reps).foreach { i =>
        if (gcBetween) System.gc()
        val rt = Runtime.getRuntime
        val heapBefore = (rt.totalMemory - rt.freeMemory) / 1e6
        val storBefore = spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum / 1e6
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        val heapAfter = (rt.totalMemory - rt.freeMemory) / 1e6
        val storAfter = spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum / 1e6
        println(f"[timeq] $name rep$i%2d ${sec}%8.3f s rows=$n heapMB $heapBefore%8.0f->$heapAfter%8.0f storMB $storBefore%7.0f->$storAfter%7.0f")
      }
    }
    spark.stop()
  }
}
