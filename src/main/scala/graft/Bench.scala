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
  *   - a fixed trivial canary query is timed at start / middle / end
  *     (median-of-5 spins per point, round 15); its drift ratio
  *     (max/min) is a host-noise gauge independent of the catalog.
  *     Drift near 1.0 = quiet host; >1.3 = contended sample. The JSON's
  *     "contended" flag is EVIDENCE-AWARE (VERDICT r14 #4): it reads
  *     true only when the canary tripped AND the per-query evidence
  *     (quiet_by_evidence — this run's total over the last accepted
  *     quiet run's, the stronger signal by construction) does not
  *     exonerate the run; the raw canary verdict is kept alongside as
  *     "canary_contended" so the gauge stays attributable. Twice
  *     (r11, r14) a best-of-2 canary stamped drift >2 on runs whose
  *     240-query evidence was the quietest on record — a clean close
  *     must not carry a flag it then has to argue away.
  *
  * A query that throws is recorded as -1 (not a silent normal timing) and
  * listed under "failed" — a broken query must be distinguishable from a
  * slow one.
  *
  * Round-4 hardening (VERDICT_r03 #5 + ADVICE): the canary now GATES
  * instead of only reporting — when end-of-run drift exceeds
  * SPARK_GRAFT_BENCH_DRIFT_MAX (default 1.5), the queries with the
  * worst per-sample spread (up to 20) are re-timed once and their
  * minimums folded in, the final drift is re-measured, and the JSON
  * carries "contended": true if it STILL exceeds the gate — so a noisy
  * host is machine-readable and no future round re-litigates it.
  *
  * Round-5 hardening (VERDICT_r04 "do this" #1): spread-retiming fails
  * exactly when contention is SUSTAINED — all samples inflate together,
  * the spread stays tight, and a 29x-inflated minimum gets recorded
  * without a second look (observed: w01 [10.5, 8.2, 6.9]). The fix is a
  * persisted per-query reference of quiet-host costs (BENCH_REF.json,
  * keyed by sf directory name, committed to the repo): any query whose
  * MIN exceeds SPARK_GRAFT_BENCH_REF_RATIO (default 3.0) x its
  * reference is re-timed up to 2 more times REGARDLESS of spread. On a
  * quiet run (final drift within the gate) the file ratchets: a better
  * min replaces the stored reference, and a still-over-ratio min
  * measured QUIET replaces it too (that is a real plan-cost change, not
  * noise — without the upward path a slower-by-design query would be
  * flagged and double-retimed forever). The JSON carries a "ref"
  * section (reference total over the shared queries + which queries
  * stayed over-ratio) so a contended total is attributable per query
  * without re-measurement.
  * Round-6 hardening (VERDICT_r05 #1/#5 + ADVICE): the retime trigger is
  * per-query — entries whose quiet reference exceeds ~1 s retime at 1.5x
  * (their absolute inflation distorts the total; st06 sat at 2.5x = ~11 s
  * of contention under the old uniform 3.0x), cheap entries keep 3.0x.
  * The ratchet MERGES into the stored sf section instead of replacing it
  * (a transiently-failed query keeps its committed reference), upward
  * accepts require per-query evidence (quiet canary, or fresh retime
  * samples with tight spread), and every changed value records
  * provenance under "_prov" (run id + load + drift at write time).
  * Cache semantics are explicit: the dedup/cluster session memoizers
  * deliberately persist across queries AND reps (that is the library's
  * production shape — n03 builds the shingle index once, n04/n05 reuse
  * it), so dedup-family minimums are warm-cache figures; the JSON says
  * so via "cache": "warm". SPARK_GRAFT_BENCH_COLD=1 clears both
  * memoizers before every sample for cold-index numbers instead.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val driftMax = sys.env.getOrElse("SPARK_GRAFT_BENCH_DRIFT_MAX", "1.5").toDouble
    val cold = sys.env.get("SPARK_GRAFT_BENCH_COLD").contains("1")
    val refPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_REF", "BENCH_REF.json")
    val refRatio = sys.env.getOrElse("SPARK_GRAFT_BENCH_REF_RATIO", "3.0").toDouble
    // Round-6 (VERDICT_r05 #1): a 3.0x trigger let st06 sit at 2.5x its
    // quiet reference (~11 s of pure host contention, 20% of the record)
    // without a retime. Entries whose quiet cost exceeds ~1 s now retime
    // at 1.5x — their absolute inflation is what distorts the total —
    // while cheap entries keep 3.0x (retiming them costs more than the
    // noise they can contribute).
    val refRatioHeavy = sys.env.getOrElse("SPARK_GRAFT_BENCH_REF_RATIO_HEAVY", "1.5").toDouble
    val heavyRefSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_REF_HEAVY_SEC", "1.0").toDouble
    def ratioFor(refSec: Double): Double = if (refSec > heavyRefSec) refRatioHeavy else refRatio
    // Round-9 (VERDICT_r08 #1): the bench host migrated between rounds 7
    // and 9 — identical code (commit 52d4edc, run isolated in a scratch
    // worktree) reads 96.8 s on the new host vs its recorded 72.1 s
    // quiet total, with the single-thread canary cost unchanged (per-core
    // speed is the same; parallel throughput is not). The ratchet's
    // upward path is per-query and evidence-gated by design, so a
    // whole-host shift leaves most references permanently stale (cheap
    // queries sit inside their 3.0x band and never update, and
    // quiet-by-evidence can never pass again). SPARK_GRAFT_BENCH_REBASE=1
    // re-seeds every measured reference from this run's minima — accepted
    // only under a QUIET canary, and every rewritten value records
    // "rebase":true provenance so the shift stays attributable. Default
    // off; the driver's per-round run never rebases.
    val rebase = sys.env.get("SPARK_GRAFT_BENCH_REBASE").contains("1")
    // Between-rep GC threshold (round 10, see the rep loop below).
    val repGcSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_REP_GC_SEC", "0.5").toDouble
    val sfBase = new java.io.File(sfDir).getName
    // BENCH_REF.json: {"<sf dir name>": {"<query>": quiet-min-seconds},
    // "_prov": {"<sf>": {"<query>": {"run":…,"load":…,"drift":…}}}}.
    // Top-level keys starting with "_" are metadata, not sf sections.
    // Jackson ships with Spark; parse failures degrade to "no refs"
    // (the gate just doesn't fire), never to a crashed bench.
    var provRaw: Map[String, Map[String, String]] = Map.empty
    // "_quiet": per-sf record of the most recent ACCEPTED quiet run —
    // the rolling denominator quiet-by-evidence compares against
    // (round 12, VERDICT r11 #3: the old 1.2x MIN-SUM band was
    // structurally unreachable at 218 refs, because per-query minima
    // accumulate downward bias with history depth; a SINGLE quiet
    // run's costs are the right same-catalog, same-history yardstick).
    final case class QuietRec(run: String, drift: Double, stale: Int,
        queries: Map[String, Double])
    var quietAll: Map[String, QuietRec] = Map.empty
    val allRefs: Map[String, Map[String, Double]] =
      try {
        val p = Paths.get(refPath)
        if (!Files.exists(p)) Map.empty
        else {
          val om = new com.fasterxml.jackson.databind.ObjectMapper()
          val root = om.readTree(Files.readString(p))
          val out = scala.collection.mutable.Map[String, Map[String, Double]]()
          root.fields().forEachRemaining { sfe =>
            if (sfe.getKey == "_quiet") {
              val qa = scala.collection.mutable.Map[String, QuietRec]()
              sfe.getValue.fields().forEachRemaining { se =>
                val n = se.getValue
                val qs = scala.collection.mutable.Map[String, Double]()
                if (n.has("queries"))
                  n.get("queries").fields().forEachRemaining { qe =>
                    qs(qe.getKey) = qe.getValue.asDouble()
                  }
                qa(se.getKey) = QuietRec(
                  if (n.has("run")) n.get("run").asText() else "",
                  if (n.has("drift")) n.get("drift").asDouble() else -1.0,
                  if (n.has("stale")) n.get("stale").asInt() else 0,
                  qs.toMap)
              }
              quietAll = qa.toMap
            } else if (sfe.getKey == "_prov") {
              val pv = scala.collection.mutable.Map[String, Map[String, String]]()
              sfe.getValue.fields().forEachRemaining { pe =>
                val qs = scala.collection.mutable.Map[String, String]()
                pe.getValue.fields().forEachRemaining { qe =>
                  qs(qe.getKey) = qe.getValue.toString
                }
                pv(pe.getKey) = qs.toMap
              }
              provRaw = pv.toMap
            } else if (!sfe.getKey.startsWith("_")) {
              val qs = scala.collection.mutable.Map[String, Double]()
              sfe.getValue.fields().forEachRemaining { qe =>
                qs(qe.getKey) = qe.getValue.asDouble()
              }
              out(sfe.getKey) = qs.toMap
            }
          }
          out.toMap
        }
      } catch { case e: Throwable =>
        System.err.println(s"[bench] could not read $refPath: ${e.getMessage}")
        Map.empty
      }
    val refs: Map[String, Double] = allRefs.getOrElse(sfBase, Map.empty)
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
    // contention, not engine changes. MEDIAN-of-5 per point (round 15,
    // VERDICT r14 #4): the old best-of-2 false-positived twice on
    // known-quiet runs (r11, r14 close: drift 2.3+ while the per-query
    // evidence was the quietest on record) because a ~0.1 s spin's
    // min is scheduler-lottery noise in BOTH directions — one lucky
    // turbo sample at one point and one descheduled pair at another
    // multiply into a fake 2× ratio. The median absorbs outliers on
    // both sides; a REAL sustained slowdown moves all five samples and
    // still reads as drift.
    def canary(): Double = {
      val xs = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        spark.range(0L, 400000000L, 1L, cpus.toInt).selectExpr("sum(id)").collect()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      xs(2)
    }
    // Untimed canary warmup: 3 rounds (15 spins) — one round leaves the
    // first TIMED canary still JIT-inflated (~3× observed at sf0.001),
    // which would read as drift and trip the gate on a quiet host.
    (1 to 3).foreach(_ => canary())

    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      if (cold) {
        operators.Dedup.clearShingleCache(spark)
        operators.Corpus.clearClusterCache(spark)
        operators.Pq.clearPqCache(spark)
        streaming.WindowedAggs.clearIngestCache(spark)
        operators.IncrementalDedup.clearBucketedCache(spark)
        operators.LexIndex.clearServingState(spark)
        operators.Pq.clearPqServingState(spark)
      }
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

    // 1-minute system load at the canary points — context for reading
    // totals across rounds (the canary sees CPU-speed contention; the
    // load gauge sees how many OTHER runnable threads the host carried)
    def loadNow(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage

    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    val canaryStart = canary()
    val loadStart = loadNow()
    val half = names.size / 2
    var canaryMid = -1.0
    var loadMid = -1.0
    var results = names.zipWithIndex.map { case ((name, fn), i) =>
      if (i == half) { canaryMid = canary(); loadMid = loadNow() }
      // Heap drain BETWEEN queries, never inside a timed window.
      // localCheckpoint blocks (the iterative-loop lineage rule:
      // Corpus/Bpe/Pq/WindowedAggs checkpoint per execution) free only
      // when the ContextCleaner sees a dead RDD handle after a JVM GC;
      // Spark's periodic GC defaults to 30 min — longer than a bench
      // run — so late samples (exactly the over-ref retimes) measured
      // block-eviction pressure (st06b: 7.6 s mid-run, 11.2 s retimed
      // at the end of the round-9 rebase run). A TIMER-based GC is the
      // wrong cure: its stop-the-world pauses land inside timed samples
      // at random (measured +7% total). Deterministic cadence, outside
      // the clock: every 8th query. Operator caches are strong
      // references and survive; only abandoned per-rep lineage dies.
      if (i % 8 == 0 && i > 0) System.gc()
      // Round-10 (VERDICT_r09 #1): n68's closing-run samples climbed
      // monotonically (1.0 → 2.0 → 3.0 s) while the same query in
      // isolation converges DOWNWARD to ~0.6 s — the climb is garbage
      // from the query's own earlier reps (token-explode allocation)
      // shrinking heap headroom so collector time lands inside the
      // later reps' timed windows. Deterministic cure, same principle
      // as the every-8th-query drain: GC BETWEEN reps, outside the
      // clock, but only after a rep heavy enough to matter (> repGcSec)
      // — cheap queries (the majority) never pay the pause.
      var lastSec = 0.0
      val samples = (1 to reps).map { _ =>
        if (lastSec > repGcSec) System.gc()
        val s = timeOnce(name, fn)
        lastSec = if (s._2) s._1 else 0.0
        s
      }
      val ok = samples.forall(_._2)
      val best = if (ok) samples.map(_._1).min else -1.0
      (name, best, samples.map(_._1), ok)
    }
    var canaryEnd = canary()
    def driftOf(cs: Seq[Double]): Double = {
      val live = cs.filter(_ >= 0)
      if (live.nonEmpty && live.min > 0) live.max / live.min else -1.0
    }
    var drift = driftOf(Seq(canaryStart, canaryMid, canaryEnd))

    // Contention gate: a contended sample is re-measured, not
    // re-litigated. Two triggers, because they see different noise:
    //  - canary drift > driftMax: single-thread CPU contention (the
    //    host got slower between canary points);
    //  - per-query spread (max/min across reps) > spreadMax: burst
    //    contention the canary can MISS — a co-tenant saturating many
    //    cores inflates wide shuffle stages while a 0.1 s single-spin
    //    canary threads between the bursts (observed: drift 1.17 with
    //    heavy queries 3-8x their quiet-host cost).
    // Worst-spread queries get one extra sample each (their min can
    // only drop); drift is then re-measured for the contended flag.
    val spreadMax = sys.env.getOrElse("SPARK_GRAFT_BENCH_SPREAD_MAX", "2.5").toDouble
    var retimed: Seq[String] = Nil
    val fnByName = names.toMap
    val spreadTrigger = math.min(spreadMax, if (drift > driftMax) driftMax else spreadMax)
    val worst = results
      .filter { case (_, _, ss, ok) => ok && ss.min > 0 }
      .sortBy { case (_, _, ss, _) => -(ss.max / ss.min) }
      .takeWhile { case (_, _, ss, _) => ss.max / ss.min > spreadTrigger }
      .take(20).map(_._1).toSet
    if (worst.nonEmpty) {
      retimed = results.map(_._1).filter(worst)
      // retime passes run at end-of-heap: drain accumulated checkpoint
      // blocks first so the fresh samples measure the query, not the
      // session's leftover storage pressure (see periodicGC note above)
      System.gc()
      results = results.map {
        case r @ (name, best, ss, ok) if worst(name) =>
          val (sec, ok2) = timeOnce(name, fnByName(name))
          if (ok2) (name, math.min(best, sec), ss :+ sec, ok) else r
        case r => r
      }
      canaryEnd = canary()
      drift = driftOf(Seq(canaryStart, canaryMid, canaryEnd))
    }

    // Reference gate (round 5): sustained contention inflates every
    // sample together — tight spread, inflated min, spread gate blind.
    // The quiet-reference comparison catches exactly that: any query
    // whose min is still > refRatio x its stored quiet cost gets up to
    // 2 more samples (its min can only drop; if the host quieted since
    // the first pass, the true cost is recovered).
    var refRetimed: Seq[String] = Nil
    def overRef(name: String, best: Double): Boolean =
      refs.get(name).exists(r => r > 0 && best > ratioFor(r) * r)
    if (refs.nonEmpty) {
      val over = results
        .filter { case (name, best, _, ok) => ok && overRef(name, best) }
        .map(_._1).toSet
      if (over.nonEmpty) {
        refRetimed = results.map(_._1).filter(over)
        System.gc() // same end-of-heap drain as the spread retime pass
        results = results.map {
          case (name, best, ss, ok) if over(name) =>
            var b = best
            var s = ss
            var tries = 0
            while (tries < 2 && overRef(name, b)) {
              val (sec, ok2) = timeOnce(name, fnByName(name))
              if (ok2) { b = math.min(b, sec); s = s :+ sec }
              tries += 1
            }
            (name, b, s, ok)
          case r => r
        }
        canaryEnd = canary()
        drift = driftOf(Seq(canaryStart, canaryMid, canaryEnd))
      }
    }
    val canaryContended = drift > driftMax
    // queries STILL over-ratio after retiming: on a quiet host these
    // are real plan-cost changes; on a contended one, the attributable
    // inflation the driver's reader should discount
    val stillOver = results.filter { case (name, best, _, ok) =>
      ok && overRef(name, best)
    }.map(_._1)

    // Quietness for the RATCHET: the canary is a ~0.05-0.1 s spin and
    // its max/min drift false-positives on scheduler noise (observed: a
    // run whose 160-query total matched ref_total within 0.5% stamped
    // drift 2.9). The per-query evidence is stronger — but the right
    // denominator is the LAST ACCEPTED QUIET RUN, not the accumulated
    // per-query min-sum (round 12, VERDICT r11 #3: at 218 refs no
    // single run can match a composite of historical minima — the old
    // 1.2x band never read true in round 11; and the measured per-query
    // within-1.3x-of-ref fraction on a KNOWN-quiet close was 39%, so
    // fraction-of-refs variants are equally dead). Two equally-quiet
    // runs of the same catalog land within a few percent of each other,
    // while the r10 throughput-contention pattern (co-tenant saturating
    // cores: wide stages +30%, single-thread canary threading between
    // bursts) misses the band at once — catalog-size-robust on both
    // sides. The comparison runs over the intersection of this run's
    // ok queries with the stored run's, and requires the intersection
    // to cover at least half of this run's measured queries (a partial
    // overlap cannot fake quiet). Self-healing: QUIET_STALE_MAX
    // consecutive canary-quiet misses rebase the stored run (a genuine
    // plan-cost change moves the yardstick after three looks; transient
    // contention rarely survives three canary-quiet runs), and every
    // accepted run refreshes it, so the denominator tracks the current
    // catalog and the current code.
    val quietBand =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_QUIET_BAND", "1.15").toDouble
    val quietStaleMax =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_QUIET_STALE_MAX", "3").toInt
    val quietRec = quietAll.get(sfBase)
    val quietStored: Map[String, Double] =
      quietRec.map(_.queries).getOrElse(Map.empty)
    val quietCovered = results.filter { case (n, _, _, ok) =>
      ok && quietStored.contains(n)
    }
    val quietRatio: Double = {
      val stored = quietCovered.map { case (n, _, _, _) => quietStored(n) }.sum
      if (stored > 0) quietCovered.map(_._2).sum / stored else -1.0
    }
    val quietByEvidence = quietRatio > 0 &&
      quietCovered.size * 2 >= results.count(_._4) &&
      quietRatio <= quietBand

    // Ratchet the reference file on QUIET runs only. Round-6 semantics
    // (VERDICT_r05 #5 + ADVICE r05):
    //  - MERGE into the existing sf section (refs ++ updated): a query
    //    that transiently failed or wasn't measured this run keeps its
    //    committed reference (round-5 rebuilt the section from this
    //    run's successes only, silently erasing refs for failed ones).
    //  - Downward updates (b < r) and seeds (no stored ref) need only
    //    run-level quietness — a lower min is evidence by construction.
    //  - UPWARD accepts (b > ratioFor(r)*r, a claimed plan-cost change)
    //    additionally need per-query evidence: the canary itself quiet,
    //    or fresh over-ref retime samples with tight spread. Aggregate
    //    quiet-by-evidence alone would let one canary-wobble-inflated
    //    small query slip under the total band and overwrite its
    //    reference permanently.
    //  - Every changed value records provenance under "_prov" (run id,
    //    1-min load, canary drift at write time) so a lowered or raised
    //    reference is always traceable to the sample that produced it.
    val canaryQuiet = drift >= 0 && drift <= driftMax
    val runId = java.time.Instant.now().toString
    val measuredNow: Map[String, Double] =
      results.filter(_._4).map { case (n, b, _, _) => n -> b }.toMap
    // Seed/rebase sanity (ADVICE r12): canary-quiet is exactly the
    // signal known to false-negative under the r10 throughput-
    // contention pattern (co-tenant saturating cores inflates wide
    // stages while the single-thread canary threads between bursts) —
    // a contended-but-canary-quiet run adopted as the yardstick would
    // make quietByEvidence read true on equally-contended later runs.
    // A run may become the quiet denominator only if it ALSO sits
    // within a loose band of the accumulated per-query minima (the
    // min-sum composite is downward-biased — calibration: a known-
    // quiet close reads ~1.22-1.25x it, the r10 contended pattern
    // 1.5x+ — so 1.35x separates them with margin). When the ref
    // section covers less than half of this run's queries (a brand-new
    // sf), fall back to the 1-min load gauge: the bench's own threads
    // push load toward the host's cores, a saturating co-tenant pushes
    // it well past.
    val seedRefBand =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_SEED_REF_BAND", "1.35").toDouble
    val seedLoadMax = sys.env.getOrElse("SPARK_GRAFT_BENCH_SEED_LOAD_MAX",
      (Runtime.getRuntime.availableProcessors * 1.25).toString).toDouble
    val seedSane: Boolean = {
      val refCovered = results.filter { case (n, _, _, ok) =>
        ok && refs.contains(n)
      }
      val okCount = results.count(_._4)
      val storedSum = refCovered.map { case (n, _, _, _) => refs(n) }.sum
      if (storedSum > 0 && okCount > 0 && refCovered.size * 2 >= okCount)
        refCovered.map(_._2).sum / storedSum <= seedRefBand
      // -1 = JVM has no load average (e.g. some container runtimes):
      // inconclusive-pass, not fail — otherwise such hosts can never
      // seed or stale-rebase and the stale counter bumps forever
      // (ADVICE r13 #2)
      else loadStart < 0 || loadStart <= seedLoadMax
    }
    // Rolling-quiet state transition (see quietByEvidence above). Only
    // a canary-quiet run may touch the record: accepted runs refresh
    // it (replace when strictly faster over the intersection, or when
    // the catalog grew past the stored run's coverage; otherwise just
    // clear the stale counter), misses bump the counter until
    // QUIET_STALE_MAX rebases — and the seed/rebase adoptions
    // additionally require `seedSane`. A contended run leaves it
    // untouched; a canary-quiet-but-insane run keeps bumping the stale
    // counter so the next sane quiet run rebases.
    val quietTransition: Option[(QuietRec, String)] =
      if (!canaryQuiet) None
      else if (quietStored.isEmpty) {
        if (seedSane) Some((QuietRec(runId, drift, 0, measuredNow), "seed"))
        else None
      } else if (quietByEvidence) {
        val covered = measuredNow.keys.count(quietStored.contains)
        if (quietRatio <= 1.0)
          Some((QuietRec(runId, drift, 0, measuredNow), "accept_faster"))
        else if (covered * 10 < measuredNow.size * 9)
          Some((QuietRec(runId, drift, 0, measuredNow), "accept_refresh"))
        else if (quietRec.exists(_.stale != 0))
          Some((quietRec.get.copy(stale = 0), "stale_clear"))
        else None
      } else if (quietRec.exists(_.stale + 1 >= quietStaleMax) && seedSane)
        Some((QuietRec(runId, drift, 0, measuredNow), "stale_rebase"))
      else
        Some((quietRec.get.copy(stale = quietRec.get.stale + 1), "stale_bump"))
    val quietAll2 = quietTransition match {
      case Some((rec, _)) => quietAll + (sfBase -> rec)
      case None => quietAll
    }

    // Names whose stored ref was REPLACED by the rebase branch — only
    // these carry "rebase":true provenance (ADVICE r09: a shared tag
    // also stamped ordinary seeds and ratchet-downs written during a
    // rebase run, muddying the attribution the flag exists for).
    val rebasedKeys = scala.collection.mutable.Set[String]()
    val updated: Map[String, Double] = if (!canaryContended || quietByEvidence) {
      val sampleByName = results.map { case (n, _, ss, _) => n -> ss }.toMap
      val measured = results.filter(_._4).map { case (n, b, _, _) => n -> b }
      measured.flatMap { case (n, b) =>
        refs.get(n) match {
          // Explicit host-migration rebase: quiet-canary minima replace
          // the stored value in either direction (see `rebase` above).
          case Some(r) if rebase && canaryQuiet =>
            if (b != r) { rebasedKeys += n; Some(n -> b) } else None
          case Some(r) if b >= r && b <= ratioFor(r) * r => None // within band: keep r
          case Some(r) if b > ratioFor(r) * r =>
            val live = sampleByName.getOrElse(n, Nil).filter(_ > 0)
            val tightFresh = refRetimed.contains(n) && live.size >= 2 && live.max / live.min <= 1.15
            // Round-10 tightening: a quiet canary alone is NOT quiet —
            // observed: a co-tenant saturating cores inflated wide
            // stages ~30% while the single-thread canary threaded
            // between bursts (drift 1.45), and an upward accept
            // rewrote n17's ref 1.55 → 2.35 on unchanged code. An
            // upward rewrite (a claimed plan-cost change) now needs
            // BOTH quietness signals, or tight fresh retime samples.
            if ((canaryQuiet && quietByEvidence) || tightFresh) Some(n -> b) else None
          case _ => Some(n -> b) // ratchet down, or seed a new query
        }
      }.toMap
    } else Map.empty
    if (updated.nonEmpty || quietTransition.isDefined) {
        def j(d: Double): String =
          String.format(java.util.Locale.ROOT, "%.4f", Double.box(d))
        val loadW = j(loadNow())
        def provEntry(n: String): String = {
          val rebaseTag = if (rebasedKeys(n)) ""","rebase":true""" else ""
          s"""{"run":"$runId","load":$loadW,"drift":${j(drift)}$rebaseTag}"""
        }
        val mergedRefs = refs ++ updated
        val mergedProv = provRaw + (sfBase ->
          (provRaw.getOrElse(sfBase, Map.empty) ++ updated.keys.map(n => n -> provEntry(n))))
        val all2 = allRefs + (sfBase -> mergedRefs)
        val sections = all2.toSeq.sortBy(_._1).map { case (sf, qs) =>
          "\"" + sf + "\":" + qs.toSeq.sortBy(_._1)
            .map { case (q, v) => "\"" + q + "\":" + j(v) }
            .mkString("{", ",", "}")
        } ++ Seq("\"_prov\":" + mergedProv.toSeq.sortBy(_._1).map { case (sf, qs) =>
          "\"" + sf + "\":" + qs.toSeq.sortBy(_._1)
            .map { case (q, v) => "\"" + q + "\":" + v }
            .mkString("{", ",", "}")
        }.mkString("{", ",", "}")) ++
        (if (quietAll2.isEmpty) Nil
         else Seq("\"_quiet\":" + quietAll2.toSeq.sortBy(_._1).map { case (sf, r) =>
          "\"" + sf + "\":{\"run\":\"" + r.run + "\",\"drift\":" + j(r.drift) +
            ",\"stale\":" + r.stale +
            ",\"reason\":\"" + quietTransition.filter(_ => sf == sfBase)
              .map(_._2).getOrElse("carried") + "\"" +
            ",\"queries\":" + r.queries.toSeq.sortBy(_._1)
              .map { case (q, v) => "\"" + q + "\":" + j(v) }
              .mkString("{", ",", "}") + "}"
        }.mkString("{", ",", "}")))
        val body = sections.mkString("{\n", ",\n", "\n}")
        try Files.writeString(Paths.get(refPath), body + "\n")
        catch { case e: Throwable =>
          System.err.println(s"[bench] could not write $refPath: ${e.getMessage}")
        }
    }

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
      s"""{"start":${fmt(canaryStart)},"mid":${fmt(canaryMid)},"end":${fmt(canaryEnd)},"drift":${fmt(drift)},"drift_max":${fmt(driftMax)},"contended":${canaryContended && !quietByEvidence},"canary_contended":$canaryContended,"retimed":${retimed.map("\"" + _ + "\"").mkString("[", ",", "]")}}"""
    // reference comparison: refTotal sums the stored quiet costs of the
    // queries this run also measured, so value/ref_total reads as the
    // run's overall inflation factor without any re-measurement
    val refTotal = results
      .filter { case (n, _, _, ok) => ok && refs.contains(n) }
      .map { case (n, _, _, _) => refs(n) }.sum
    val refJson =
      s"""{"path":"$refPath","n_refs":${refs.size},"ref_total":${fmt(refTotal)},"ratio_max":${fmt(refRatio)},"ratio_heavy":${fmt(refRatioHeavy)},"heavy_ref_sec":${fmt(heavyRefSec)},"quiet_by_evidence":$quietByEvidence,"quiet_ratio":${fmt(quietRatio)},"quiet_n":${quietCovered.size},"quiet_stale":${quietRec.map(_.stale).getOrElse(-1)},"quiet_transition":"${quietTransition.map(_._2).getOrElse("none")}","seed_sane":$seedSane,"retimed":${refRetimed.map("\"" + _ + "\"").mkString("[", ",", "]")},"still_over":${stillOver.map("\"" + _ + "\"").mkString("[", ",", "]")}}"""
    val hostJson =
      s"""{"cpus":${Runtime.getRuntime.availableProcessors},"load":[${fmt(loadStart)},${fmt(loadMid)},${fmt(loadNow())}]}"""
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","reps":$reps,"cache":"${if (cold) "cold" else "warm"}","queries":$qs,"failed":$failed,"canary":$canaryJson,"ref":$refJson,"host":$hostJson,"samples":$samplesJson,"sf":"$sfDir"}"""
    println(line)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/bench.json")
    try Files.writeString(Paths.get(out), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $out: ${e.getMessage}")
    }
    // Round-7 (VERDICT_r06 #9): /tmp is not durable and the driver's log
    // tail has truncated the line twice (BENCH_r01/BENCH_r06 "parsed":
    // null). Persist the full record in-repo so every round snapshot is
    // self-contained. Skipped only if the repo root isn't writable.
    val repoOut = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPO_OUT", "BENCH_LAST.json")
    try Files.writeString(Paths.get(repoOut), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $repoOut: ${e.getMessage}")
    }
    spark.stop()
  }
}
