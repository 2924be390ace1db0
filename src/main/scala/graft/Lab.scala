package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.operators.Dedup

/** Scratch perf lab (not part of the driver contract): times named
  * experiment variants at SPARK_GRAFT_SF_DIR. */
object Lab {
  /** Same session-memoizer set Bench's cold mode clears — a memoized
    * shingle/cluster/PQ/ingest/bucketed-publish frame would fake a ~0
    * scale exponent (warm-JVM, cache-cold semantics). */
  private def clearOperatorCaches(spark: org.apache.spark.sql.SparkSession): Unit = {
    operators.Dedup.clearShingleCache(spark)
    operators.Corpus.clearClusterCache(spark)
    operators.Pq.clearPqCache(spark)
    streaming.WindowedAggs.clearIngestCache(spark)
    operators.IncrementalDedup.clearBucketedCache(spark)
    operators.LexIndex.clearServingState(spark)
    operators.Pq.clearPqServingState(spark)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, sfDir)
    val docs = t.documents
    val events = t.events
    docs.count(); events.count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (n=$n)")
    }

    def fpCount(fp: org.apache.spark.sql.Column): Long =
      docs.groupBy(fp.as("fp"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_dups"))
        .count()

    args.headOption.getOrElse("norm") match {
      case "norm" =>
        time("md5 only (n01)")(fpCount(md5(col("text").cast("binary"))))
        time("regex norm (n02 today)")(fpCount(
          md5(trim(regexp_replace(lower(col("text")), "\\s+", " ")).cast("binary"))))
        time("split/filter/join norm")(fpCount(
          md5(array_join(filter(split(lower(col("text")), "\\s+"), w => length(w) > 0), " ")
            .cast("binary"))))
        time("regex norm again")(fpCount(
          md5(trim(regexp_replace(lower(col("text")), "\\s+", " ")).cast("binary"))))
      case "p02" =>
        time("p02 today") {
          val m = events.agg(max(col("ts")).as("mx"))
          events.crossJoin(broadcast(m))
            .filter(col("ts") >= col("mx") - expr("INTERVAL 1 HOUR"))
            .agg(count(lit(1)).as("n_fresh"), graft.Det.dsum(col("value")).as("fresh_value"))
            .count()
        }
        time("p02 scalar max first") {
          val mx = events.agg(max(col("ts"))).head().getAs[java.time.LocalDateTime](0)
          events.filter(col("ts") >= lit(java.sql.Timestamp.valueOf(mx)) - expr("INTERVAL 1 HOUR"))
            .agg(count(lit(1)).as("n_fresh"), graft.Det.dsum(col("value")).as("fresh_value"))
            .count()
        }
      case "q" =>
        // time any catalog query cold/warm: Lab q <name> [<name>...].
        // SPARK_GRAFT_LAB_COLD=1 clears the dedup/cluster memoizers
        // before every sample (same semantics as Bench's
        // SPARK_GRAFT_BENCH_COLD) so warm runs measure warm-JVM but
        // cache-cold operator cost — required for scale-slope numbers,
        // where a memoized cluster frame would fake a 0 exponent.
        val coldCaches = sys.env.get("SPARK_GRAFT_LAB_COLD").contains("1")
        args.drop(1).foreach { name =>
          val fn = SparkEntry.queries(name)
          def sample(tag: String): Unit = {
            if (coldCaches) clearOperatorCaches(spark)
            time(s"$name $tag")(fn(spark, sfDir).count())
          }
          sample("cold"); sample("warm"); sample("warm2")
        }
      case "prof" =>
        // Job/task attribution for any catalog query (round 15, guide
        // §1): wall = Σ(job wall) + driver gap (planning, FS metadata,
        // collect-side work BETWEEN jobs). Within jobs, the scheduling
        // overhead is job wall − max-task critical path. Reported per
        // sample: nJobs, Σ job wall, nTasks, Σ executorRunTime,
        // driver gap — the split that says whether a lifecycle entry's
        // cost is compute (optimize the plan) or per-job constants
        // (optimize the NUMBER of jobs/actions).
        val coldProf = sys.env.get("SPARK_GRAFT_LAB_COLD").contains("1")
        val prof = new org.apache.spark.scheduler.SparkListener {
          val jobs = new java.util.concurrent.atomic.AtomicInteger
          val jobWallMs = new java.util.concurrent.atomic.AtomicLong
          val tasks = new java.util.concurrent.atomic.AtomicInteger
          val taskRunMs = new java.util.concurrent.atomic.AtomicLong
          private val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
          val bySite = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
          override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            starts.put(j.jobId, j.time)
          override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            jobs.incrementAndGet()
            Option(starts.remove(j.jobId)).foreach(t0 => jobWallMs.addAndGet(j.time - t0))
          }
          override def onStageCompleted(
              s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = s.stageInfo
            val d = (for (a <- si.submissionTime; b <- si.completionTime) yield b - a)
              .getOrElse(0L)
            bySite.merge(si.name, (1L, d), (a, b) => (a._1 + b._1, a._2 + b._2))
          }
          override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            tasks.incrementAndGet()
            if (t.taskMetrics != null) taskRunMs.addAndGet(t.taskMetrics.executorRunTime)
          }
          def reset(): Unit = { jobs.set(0); jobWallMs.set(0); tasks.set(0); taskRunMs.set(0); bySite.clear() }
        }
        spark.sparkContext.addSparkListener(prof)
        args.drop(1).foreach { name =>
          val fn = SparkEntry.queries(name)
          (1 to 3).foreach { rep =>
            if (coldProf) clearOperatorCaches(spark)
            // same rule as Bench's between-rep drain: dead checkpoint
            // blocks from the prior rep must not bill this rep
            System.gc()
            prof.reset()
            val t0 = System.nanoTime()
            val n = fn(spark, sfDir).count()
            val wall = (System.nanoTime() - t0) / 1e9
            // listener bus is async; give it a beat to drain
            Thread.sleep(300)
            val jw = prof.jobWallMs.get / 1e3
            println(f"$name%-34s rep$rep wall=$wall%7.2f s jobs=${prof.jobs.get}%4d " +
              f"jobWall=$jw%7.2f s driverGap=${wall - jw}%6.2f s " +
              f"tasks=${prof.tasks.get}%5d taskRun=${prof.taskRunMs.get / 1e3}%7.2f s (n=$n)")
            if (rep == 3) {
              import scala.jdk.CollectionConverters._
              prof.bySite.asScala.toSeq.sortBy(-_._2._2).take(14).foreach {
                case (site, (cnt, ms)) =>
                  println(f"    $site%-52s jobs=$cnt%4d wall=${ms / 1e3}%6.2f s")
              }
            }
          }
        }
        spark.sparkContext.removeSparkListener(prof)
      case "st26econ" =>
        // Fixture-economics audit (VERDICT r14 #5): st26's inherent
        // cost is lifecycle replay; the question is whether the replay
        // corpus can shrink without losing machinery coverage. The
        // sliced run must show the SAME fold trajectory — per-snap
        // (n_segs, base_upto, n_appends, gen) — and non-trivial
        // takedowns (n_dead_* > 0 where the full run has them).
        def trajectory(df: DataFrame): Seq[(Long, Long, Long, Long, Long, Long, Long)] =
          df.select("snap", "n_segs", "base_upto", "n_appends", "gen",
              "n_dead_lex", "n_dead_ann").distinct().collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
              r.getLong(4), r.getLong(5), r.getLong(6))).sortBy(_._1).toSeq
        def run(tag: String, slice: Option[org.apache.spark.sql.Column]): Unit = {
          clearOperatorCaches(spark)
          val t0 = System.nanoTime()
          val df = streaming.WindowedAggs
            .hybridTakedownCompactBuild(spark, sfDir, slice)
          val n = df.count()
          println(f"st26 $tag%-8s ${(System.nanoTime() - t0) / 1e9}%7.2f s (n=$n)")
          trajectory(df).foreach(t => println(s"  $tag traj: $t"))
        }
        (1 to 2).foreach { rep =>
          println(s"--- rep $rep ---")
          run("full", None)
          run("half", Some(col("doc_id") % 2 === 0))
          run("quarter", Some(col("doc_id") % 4 === 0))
        }
      case "stskew" =>
        // Streaming capped-lane wall clock + state-store metrics on a
        // REAL skew corpus (round 15; the spec's planted-stream numbers,
        // re-derived from make_scale_corpus's adversarial tails): drive
        // the whole corpus through streamingNearDupPairs in ~10
        // micro-batches at several caps and report end-to-end seconds,
        // emitted pairs, and StateOperatorProgress (rows / bytes). On a
        // 100x-skew corpus the planted mega-clusters are single hot
        // (band, sig) buckets: the uncapped lane's per-arrival verify
        // walks the full bucket (quadratic per cluster) while a binding
        // cap saturates it at O(cap).
        implicit val sq = spark.sqlContext
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        import org.apache.spark.sql.streaming.OutputMode
        import spark.implicits._
        // STSKEW_PROVIDER=rocksdb measures the production state-store
        // provider (StreamingSpec pins output identical): state moves
        // off-heap, memoryUsedBytes then reports rocksdb usage.
        if (sys.env.get("STSKEW_PROVIDER").contains("rocksdb")) {
          spark.conf.set("spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state." +
              "RocksDBStateStoreProvider")
          println("provider=rocksdb")
        }
        val rows = docs.select(col("doc_id"), col("text"))
          .as[(Long, String)].collect().sortBy(_._1)
        println(s"corpus rows=${rows.length}")
        def runLane(cap: Option[Int], warm: Boolean = false): Unit = {
          val input = MemoryStream[(Long, String)]
          val qn = if (warm) "stskew_warm" else s"stskew_${cap.getOrElse(0)}"
          val q = streaming.StreamingOps.streamingNearDupPairs(
            input.toDF().toDF("doc_id", "text"),
            threshold = 0.6, maxBucket = cap)
            .writeStream.format("memory").queryName(qn)
            .outputMode(OutputMode.Update).start()
          val lane = if (warm) rows.take(rows.length / 10) else rows
          val t0 = System.nanoTime()
          try lane.grouped(math.max(1, rows.length / 10)).foreach { b =>
            input.addData(b.toSeq); q.processAllAvailable()
          } finally q.stop()
          if (warm) { println("warmed"); return }
          val sec = (System.nanoTime() - t0) / 1e9
          val pairs = spark.table(qn).count()
          val sos = q.recentProgress.flatMap(_.stateOperators)
          val srows = if (sos.nonEmpty) sos.map(_.numRowsTotal).max else -1L
          val smb = if (sos.nonEmpty) sos.map(_.memoryUsedBytes).max / 1e6 else -1.0
          println(f"cap=${cap.map(_.toString).getOrElse("none")}%5s $sec%8.2f s  " +
            f"pairs=$pairs%7d  state_rows=$srows%7d  state_mb=$smb%7.1f")
        }
        // Retention lane: same corpus, synthetic event times advancing
        // one day per micro-batch; retention bounds the bucket state to
        // the horizon's slice of history instead of the full corpus —
        // the unbounded-stream story measured on a real skew corpus.
        // state_rows reported at the LAST progress (the plateau), not
        // the max.
        def runRet(retention: String): Unit = {
          val input = MemoryStream[(Long, String, java.sql.Timestamp)]
          val qn = "stskew_ret"
          val q = streaming.StreamingOps.streamingNearDupPairs(
            input.toDF().toDF("doc_id", "text", "ts"),
            threshold = 0.6, retention = Some(retention))
            .writeStream.format("memory").queryName(qn)
            .outputMode(OutputMode.Update).start()
          val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
          val t0 = System.nanoTime()
          try rows.grouped(math.max(1, rows.length / 10)).zipWithIndex
            .foreach { case (b, i) =>
              val ts = new java.sql.Timestamp(base + i * 86400000L)
              input.addData(b.map(r => (r._1, r._2, ts)).toSeq)
              q.processAllAvailable()
            } finally q.stop()
          val sec = (System.nanoTime() - t0) / 1e9
          val pairs = spark.table(qn).count()
          val sos = Option(q.lastProgress).toSeq.flatMap(_.stateOperators)
          val srows = if (sos.nonEmpty) sos.map(_.numRowsTotal).max else -1L
          val smb = if (sos.nonEmpty) sos.map(_.memoryUsedBytes).max / 1e6 else -1.0
          println(f"ret=$retention%8s $sec%8.2f s  pairs=$pairs%7d  " +
            f"final_state_rows=$srows%7d  state_mb=$smb%7.1f")
        }
        // Warm-up lane first (one tenth of the corpus, discarded):
        // without it the first measured lane absorbs Janino/codegen
        // warm-up and reads ~40% slow.
        runLane(None, warm = true)
        if (sys.env.get("STSKEW_ORDER").contains("rev")) {
          runLane(None); runLane(Some(64)); runLane(Some(16))
        } else { runLane(Some(16)); runLane(Some(64)); runLane(None) }
        runRet("2 days"); runRet("30 days")
      case "qvol" =>
        // Query-volume serving ladder (round 15): the corpus ladders
        // grow the INDEX under a fixed 32-query serve set; this grows
        // the QUERY SET against a fixed index — the serving-throughput
        // axis. Claim: per-query cost is index-sliver-bounded, so
        // total serve cost is ~linear in Q (no cross-query
        // interference, no plan flip at high fan-out). Both indexes
        // built once and pinned; only the serve is timed.
        import graft.operators.{LexIndex, Pq, TextAnalysis}
        import spark.implicits._
        val lexIdx = LexIndex.buildIndex(docs.select(col("doc_id"), col("text")))
        val pqIdx = Pq.buildPqIndex(t.embeddings.select(col("vec_id"), col("embedding")))
        Seq(lexIdx.postings, lexIdx.doclens,
            pqIdx.anchors, pqIdx.books, pqIdx.codes)
          .foreach { f => f.persist(); f.count() }
        val terms32 = TextAnalysis.bm25QuerySet.toDF("q_id", "term")
        val qvecs32 = t.embeddings.filter(col("vec_id") < 32)
        Seq(1, 10, 100).foreach { mult =>
          // replicate the 32-query set under shifted ids: identical
          // per-query work, Q× the volume (the distinct TERM set stays
          // fixed, so the postings sliver is read once and fanned out
          // per query — the amortization a batched serve relies on)
          val terms = (0 until mult)
            .map(c => terms32.withColumn("q_id", col("q_id") + lit(1000L * c)))
            .reduce(_ unionByName _)
          val qvecs = (0 until mult)
            .map(c => qvecs32.withColumn("vec_id", col("vec_id") + lit(100000L * c)))
            .reduce(_ unionByName _)
          (1 to 2).foreach { rep =>
            time(s"bm25 serve Q=${32 * mult} rep$rep")(
              LexIndex.bm25FromIndex(lexIdx, terms, 10).count())
          }
          (1 to 2).foreach { rep =>
            time(s"pq serve Q=${32 * mult} rep$rep")(
              Pq.searchPqIndex(qvecs, pqIdx).count())
          }
        }
      case "qfull" =>
        // like "q" but forces FULL evaluation of every output column:
        // count() lets Catalyst prune columns and even eliminate
        // unique-key left joins (observed on n92: the whole surgery
        // pipeline join-eliminated to a scan count, faking a 0 scale
        // slope). Hashing a struct of all columns into a sum defeats
        // both prunings while adding only per-output-row work.
        val coldCachesF = sys.env.get("SPARK_GRAFT_LAB_COLD").contains("1")
        args.drop(1).foreach { name =>
          val fn = SparkEntry.queries(name)
          def sample(tag: String): Unit = {
            if (coldCachesF) clearOperatorCaches(spark)
            time(s"$name $tag") {
              val df = fn(spark, sfDir)
              df.select(xxhash64(struct(df.columns.map(col): _*)).as("__h"))
                .agg(expr("bit_xor(__h)")).collect().head.getLong(0)
            }
          }
          sample("cold"); sample("warm"); sample("warm2")
        }
      case "explain" =>
        args.drop(1).foreach { name =>
          println(s"=== $name ===")
          SparkEntry.queries(name)(spark, sfDir).explain("formatted")
        }
      case "n40stages" =>
        import graft.api.Graft._
        val featured = docs.select(col("doc_id"), col("lang"), col("source"), col("text"),
          split(col("text"), " ").as("w"))
          .select(col("doc_id"), col("lang"), col("source"), col("text"),
            size(col("w")).cast("long").as("n_tokens"),
            (size(array_distinct(col("w"))).cast("double") / size(col("w"))).as("ttr"))
        val quality = featured.filter(col("n_tokens") >= 20 && col("ttr") >= 0.3)
        time("quality")(quality.count())
        val exact = quality.distinctDocuments()
        time("exact dedup")(exact.count())
        time("exact dedup again")(exact.count())
        time("shingle build (adhoc)")(Dedup.shingles(exact).count())
        time("neardup pairs")(Dedup.nearDuplicatePairs(exact, 0.6).count())
        time("full anti-join")(exact.dropNearDuplicates(0.6).count())
      case "n40" =>
        time("n40 cold")(pipeline.TrainingData.curate(docs).count())
        time("n40 warm")(pipeline.TrainingData.curate(docs).count())
        time("n04 cold") {
          Dedup.nearDuplicatePairs(docs, 0.6).count()
        }
        time("n04 warm") {
          Dedup.nearDuplicatePairs(docs, 0.6).count()
        }
        time("shingle rows")(Dedup.shingles(docs).count())
        time("candidates only")(Dedup.lshCandidates(docs).count())
    }
    spark.stop()
  }
}
