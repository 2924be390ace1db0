package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every catalog query on SPARK_GRAFT_SF_DIR and
  * emits ONE JSON line. The line is also written to a file
  * (SPARK_GRAFT_BENCH_OUT, default /tmp/bench.json) because the driver's
  * log tail truncated it in round 1 (BENCH_r01 `parsed: null`).
  *
  * Round-3 hardening (VERDICT_r02 item #1): the round-2 driver sample read
  * as a 2x regression that was actually ~3.2x host contention. Two fixes:
  *   - each query runs SPARK_GRAFT_BENCH_REPS times (default 3) and the
  *     recorded per-query number is the MIN across reps ("queries" field);
  *     the raw samples are kept under "samples" so any future inflation is
  *     attributable (all-reps-slow = plan cost; one-rep-slow = noise).
  *   - a fixed trivial canary query is timed at start / middle / end; its
  *     drift ratio (max/min) is a host-noise gauge independent of the
  *     catalog. Drift near 1.0 = quiet host; >1.3 = contended sample.
  *
  * A query that throws is recorded as -1 (not a silent normal timing) and
  * listed under "failed" — a broken query must be distinguishable from a
  * slow one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: session/codegen spin-up + page-cache the inputs so
    // per-query numbers measure the queries, not first-touch costs.
    val t = Tables(spark, sfDir)
    Seq(t.lineitem, t.orders, t.events, t.documents, t.embeddings,
      t.customer, t.supplier, t.part, t.nation, t.region)
      .foreach(_.count())

    // Canary: a fixed CPU spin (codegen'd range-sum, no IO, sf-independent)
    // whose cost is constant across rounds — its wall time tracks host
    // contention, not engine changes. Best-of-2 so a single descheduled
    // burst doesn't fake drift.
    def canary(): Double = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      spark.range(0L, 400000000L, 1L, cpus.toInt).selectExpr("sum(id)").collect()
      (System.nanoTime() - t0) / 1e9
    }.min
    canary() // untimed canary warmup (its own codegen)

    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    val canaryStart = canary()
    val half = names.size / 2
    var canaryMid = -1.0
    val results = names.zipWithIndex.map { case ((name, fn), i) =>
      if (i == half) canaryMid = canary()
      val samples = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
          }
        val sec = (System.nanoTime() - t0) / 1e9
        (if (ok) sec else -1.0, ok)
      }
      val ok = samples.forall(_._2)
      val best = if (ok) samples.map(_._1).min else -1.0
      (name, best, samples.map(_._1), ok)
    }
    val canaryEnd = canary()
    val canaries = Seq(canaryStart, canaryMid, canaryEnd).filter(_ >= 0)
    val drift = if (canaries.min > 0) canaries.max / canaries.min else -1.0

    // Locale.ROOT: the f-interpolator honors the JVM default locale, and
    // a comma-decimal locale would silently emit invalid JSON
    def fmt(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(d))
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val samplesJson = results
      .map { case (k, _, ss, _) => "\"" + k + "\":" + ss.map(fmt).mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val failed = results.filterNot(_._4).map("\"" + _._1 + "\"")
      .mkString("[", ",", "]")
    val total = results.filter(_._4).map(_._2).sum
    val canaryJson =
      s"""{"start":${fmt(canaryStart)},"mid":${fmt(canaryMid)},"end":${fmt(canaryEnd)},"drift":${fmt(drift)}}"""
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","reps":$reps,"queries":$qs,"failed":$failed,"canary":$canaryJson,"samples":$samplesJson,"sf":"$sfDir"}"""
    println(line)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/bench.json")
    try Files.writeString(Paths.get(out), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $out: ${e.getMessage}")
    }
    spark.stop()
  }
}
