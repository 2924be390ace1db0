package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2.9): the reference fakes
  * streaming by re-running a batch job each minute (T1); the engine
  * provides real event-time operators with watermarks. Exercised via
  * MemoryStream in StreamingSpec (the driver's DuckDB harness cannot
  * run streaming queries — SURVEY.md §7.4 #3).
  */
object StreamingOps {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionOut(user_id: Long, start: Timestamp,
      end: Timestamp, n_events: Int, total: Double)

  /** Tumbling event-time counts with a watermark: late rows beyond
    * 10 minutes are dropped; append mode emits only finalized windows. */
  def tumblingCounts(events: DataFrame,
      watermark: String = "10 minutes", width: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("wstart"), col("event_type"),
        col("n"), col("total"))

  /** Watermarked stateful dedup on event_id (exactly-once-ish ingest:
    * re-deliveries inside the watermark horizon are dropped). */
  def dedupByIdWithWatermark(events: DataFrame,
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming NORMALIZED dedup: drop re-deliveries AND trivially
    * mutated duplicates (case/whitespace variants) inside the
    * watermark horizon, keyed on the same canonical fingerprint the
    * batch dedup family uses (graft.Det.normFingerprint — one
    * definition, so batch and stream can never disagree on what "the
    * same document" means). State per key is bounded by the watermark;
    * the payload never enters state, only the 32-hex digest. */
  def dedupNormalizedWithWatermark(docs: DataFrame,
      watermark: String = "10 minutes"): DataFrame = {
    // collision-proof helper name: never clobber a caller column
    val fp = Iterator.from(0).map(i => s"__graft_fp$i")
      .find(n => !docs.columns.contains(n)).get
    docs.withColumn(fp, graft.Det.normFingerprint(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(fp)
      .drop(fp)
  }

  /** Stream-static enrichment join: each arriving event picks up its
    * dimension attributes from a STATIC (or slowly-refreshed) table —
    * the standard streaming star-join. Stateless and append-safe: the
    * dimension side is broadcast, so enrichment happens in the scan
    * stage with no streaming state and no watermark requirement; at
    * 100 TB/day of events the dimension is still the small side (users,
    * feeds, catalogs), which is why this is THE shape for stream
    * enrichment. Left join: an event with no dimension row passes
    * through with nulls (never dropped — audit downstream). */
  def enrichWithDim(stream: DataFrame, dim: DataFrame,
      streamKey: String, dimKey: String): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim),
      stream(streamKey) === dim(dimKey), "left_outer")
      // drop via the dim-side REFERENCE, not by name: drop("k") removes
      // every column named k, so a shared natural key (streamKey ==
      // dimKey, the common case) would lose the stream's key too
      .drop(dim(dimKey))

  /** Streaming quality-gated ingest: the n47 Gopher hard gates applied
    * ON ARRIVAL (a map-side predicate — [[graft.operators.TextAnalysis
    * .gopherPass]], the exact batch arithmetic), then the watermarked
    * normalized-fingerprint dedup. The order matters at 100 TB: the
    * gate is stateless and runs in the scan stage, so junk documents
    * never enter dedup state — state size is bounded by the SURVIVING
    * rate, not the arrival rate. st07 is the DuckDB-oracled batch twin;
    * StreamingSpec proves this stream produces exactly its answer. */
  def qualityGatedIngest(docs: DataFrame,
      watermark: String = "10 minutes"): DataFrame =
    dedupNormalizedWithWatermark(
      docs.filter(graft.operators.TextAnalysis.gopherPass(col("text"))),
      watermark)

  /** Hard cap on the decontamination gate's broadcast hash set — the
    * VocabCap honesty rule applied to benchmarks: a held-out eval set
    * is SMALL by construction (thousands of docs ⇒ ~10⁵–10⁶ window
    * hashes, a few MB broadcast); a "benchmark" above this cap is a
    * corpus, and screening against it belongs to the index-probe path
    * (n39's incremental decontaminate), not a scan-stage set. */
  val MaxBenchHashes: Int = 5000000

  /** Collect + sort + broadcast the benchmark window-hash set — the
    * shared gate payload of st11 and st13 (size-capped, primitive
    * array; see [[decontaminatedIngest]]'s scaladoc for the envelope). */
  private def broadcastBenchGate(spark: org.apache.spark.sql.SparkSession,
      benchHashes: DataFrame): org.apache.spark.broadcast.Broadcast[Array[Long]] = {
    val hs = benchHashes.limit(MaxBenchHashes + 1)
      .collect().map(_.getLong(0))
    require(hs.length <= MaxBenchHashes,
      s"benchmark hash set exceeds MaxBenchHashes=$MaxBenchHashes — " +
        "use IncrementalDedup.dedupAgainstIndex (n39 path) for corpus-sized screens")
    java.util.Arrays.sort(hs)
    spark.sparkContext.broadcast(hs)
  }

  /** Streaming DECONTAMINATION gate (st11's stream side): drop every
    * arriving document sharing at least one Rabin–Karp window
    * fingerprint with the held-out benchmark set, then watermarked
    * normalized dedup — the arrival-time version of the n26 screen, so
    * eval contamination never even lands in the accepted store.
    *
    * Scale/semantics: the benchmark's window-hash set (bounded by
    * [[MaxBenchHashes]], see there) is collected once as a SORTED
    * primitive long array and broadcast — 8 bytes per hash, ≤ 40 MB at
    * the cap and under 1 MB for a typical eval set (ADVICE r09: the
    * previous boxed Set[Long] was ~40 bytes/entry, ~200 MB of driver
    * heap and broadcast payload at the cap). Membership is a binary
    * search — O(log n) per window against cache-friendly memory. The
    * gate itself is a stateless mapPartitions predicate computing
    * each doc's rolling hashes IN THE SCAN STAGE against the broadcast
    * array — contaminated docs never allocate dedup state (the st07
    * junk-never-allocates rule), and the only streaming state is the
    * surviving docs' watermarked fingerprint dedup. Lifetime: the
    * broadcast lives as long as the returned plan can restart (a
    * long-lived service cycling many gates should stop the query and
    * build a fresh gate; blocks are freed by the ContextCleaner once
    * the plan is unreachable). Uses the ONE shared Rabin–Karp
    * implementation ([[graft.operators.TextAnalysis.rollingHashes]]),
    * so gate, batch twin and oracle can never drift. StreamingSpec
    * proves stream == st11 twin. */
  def decontaminatedIngest(docs: DataFrame, benchHashes: DataFrame,
      watermark: String = "10 minutes"): DataFrame = {
    import org.apache.spark.sql.Encoders
    val bench = broadcastBenchGate(docs.sparkSession, benchHashes)
    val w = graft.operators.TextAnalysis.RollingWindow
    val gated = docs
      .select(col("ts"), col("doc_id"), col("text"))
      .as(Encoders.product[(java.sql.Timestamp, Long, String)])
      .mapPartitions { it =>
        val b = bench.value
        it.filter { case (_, _, text) =>
          !graft.operators.TextAnalysis
            .rollingHashes(text.split(" ", -1), w)
            .exists(h => java.util.Arrays.binarySearch(b, h) >= 0)
        }
      }(Encoders.product[(java.sql.Timestamp, Long, String)])
      .toDF("ts", "doc_id", "text")
    dedupNormalizedWithWatermark(gated, watermark)
  }

  /** Streaming span-level DECONTAMINATION SURGERY (st13 — the
    * refinement of [[decontaminatedIngest]]'s whole-doc drop): each
    * arriving document is REWRITTEN on arrival — benchmark-matched
    * ≥W-token windows merge into maximal spans (the n92 batch
    * semantics, via the row-level twin
    * [[graft.operators.SpanDedup.rowRemoveSpans]], spec-pinned against
    * the batch plan) and only those tokens are cut; documents reduced
    * to nothing drop, survivors keep-first dedup on the NORMALIZED
    * CLEAN text under the watermark. The policy most pipelines want:
    * a long document is not wasted for one quoted eval question, and
    * the eval never leaks.
    *
    * Scale/semantics: the gate payload is the same capped sorted
    * primitive broadcast as st11; the surgery is a stateless
    * mapPartitions in the scan stage (per-doc cost = rolling hashes +
    * one boolean array); only surviving CLEAN fingerprints enter
    * dedup state. WindowedAggs' st13 twin restates the whole chain
    * for DuckDB; StreamingSpec proves stream == twin. */
  def decontaminateRewriteIngest(docs: DataFrame, benchHashes: DataFrame,
      watermark: String = "10 minutes"): DataFrame = {
    import org.apache.spark.sql.Encoders
    val bench = broadcastBenchGate(docs.sparkSession, benchHashes)
    val w = graft.operators.TextAnalysis.RollingWindow
    val rewritten = docs
      .select(col("ts"), col("doc_id"), col("text"))
      .as(Encoders.product[(java.sql.Timestamp, Long, String)])
      .mapPartitions { it =>
        val b = bench.value
        it.flatMap { case (ts, id, text) =>
          val toks = text.split(" ", -1)
          val hs = graft.operators.TextAnalysis.rollingHashes(toks, w)
          val matched = hs.iterator.zipWithIndex
            .collect { case (h, i) if java.util.Arrays.binarySearch(b, h) >= 0 => i }
            .toArray
          val kept = graft.operators.SpanDedup.rowRemoveSpans(toks, matched, w)
          val clean = kept.mkString(" ")
          if (clean.isEmpty) None else Some((ts, id, clean))
        }
      }(Encoders.product[(java.sql.Timestamp, Long, String)])
      .toDF("ts", "doc_id", "text")
    dedupNormalizedWithWatermark(rewritten, watermark)
  }

  /** Streaming LEARNED-quality gate: score each arriving document
    * under a FROZEN binary NB model (the n68 classifier collapsed to
    * its serving form by [[graft.operators.Classifier
    * .binaryLogOddsModel]]) and keep docs whose pass/fail log-odds is
    * positive. st07's learned companion — rules gate on arrival there,
    * distilled model here; a deployment runs both, rules first (free),
    * model second (one broadcast join + one bounded agg).
    *
    * Scale/semantics: the model frames are STATIC and broadcast (the
    * production fastText shape — vocabulary-bounded by construction);
    * per-doc scoring aggregates exploded token terms grouped by
    * (event time, doc_id) under the watermark, so streaming state is
    * bounded by the watermark horizon and emission is append-mode
    * final — a doc's score never restates. st09 is the DuckDB-oracled
    * batch twin; StreamingSpec proves stream == twin. */
  def classifierGatedIngest(docs: DataFrame, train: DataFrame,
      watermark: String = "10 minutes"): DataFrame = {
    val (tokLo, consts) = graft.operators.Classifier.binaryLogOddsModel(train)
    graft.operators.Classifier.logOddsScores(tokLo, consts,
        docs.withWatermark("ts", watermark), extraGroup = Seq("ts"))
      .filter(col("logodds") > 0)
      .select("doc_id", "logodds")
  }

  /** Streaming MEDIA dedup gate (round 7 — the multimodal ingest
    * counterpart of [[qualityGatedIngest]]): each arriving (ts,
    * doc_id, media) row is perceptually hashed IN THE SCAN STAGE by
    * the codegen'd `ppm_phash` expression (decode + 8×8 luma + WHT
    * threshold — raster bytes never enter streaming state), rows
    * whose payload does not decode drop immediately (broken media is
    * a quality gate, not a stage failure), and keep-first dedup runs
    * on the 16-bit hash within the watermark. Byte-different
    * re-encodings of the same image collide by construction, so
    * re-crawled/recompressed images dedup on arrival — what a byte
    * digest can never give an ingest pipeline. State per key is the
    * 8-byte hash, bounded by the watermark horizon.
    * st10_stream_media_dedup is the DuckDB-oracled batch twin;
    * StreamingSpec proves stream == twin. */
  def mediaDedupIngest(media: DataFrame,
      watermark: String = "10 minutes"): DataFrame =
    media
      // O(header) validity predicate BEFORE the hash projection, so
      // the decode+hash runs exactly once per surviving row (a
      // hash-IS-NOT-NULL filter gets pushed through the projection
      // and duplicates the expensive expression)
      .filter(graft.functions.GraftFunctions.ppm_valid(col("media")))
      .select(col("ts"), col("doc_id"),
        graft.functions.GraftFunctions.ppm_phash(col("media")).as("phash"))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("phash")
      .select("doc_id", "phash")

  /** Handle for the streaming near-dup slice: the running survivor
    * query plus an on-demand batch view of near-dup pairs over
    * everything survived so far. */
  final case class NearDupSlice(
      query: org.apache.spark.sql.streaming.StreamingQuery,
      pairs: () => DataFrame)

  /** STREAMING NEAR-DUP SLICE (DECISIONS.md #6): the two-tier shape a
    * 100 TB ingest pipeline actually runs. Tier 1 (streaming, cheap,
    * state = one 32-hex digest per doc inside the watermark):
    * [[dedupNormalizedWithWatermark]] kills re-deliveries and trivial
    * mutants on arrival. Tier 2 (batch, heavy): MinHash+LSH near-dup
    * over the accumulated survivor store, run on demand — banding
    * doesn't stream (a new doc can collide with any historical bucket),
    * so the correct split is stream-curate + batch-LSH.
    *
    * The survivor store append is naturally idempotent AT THE PAIR
    * LEVEL: a foreachBatch replay re-appends duplicate (doc_id, text)
    * rows, but the shingle index is per-doc DISTINCT, so replayed rows
    * change no Jaccard value and create no d1 < d2 pair — no ledger
    * needed for correctness of `pairs()`.
    *
    * `dfCap` forwards to the LSH verify (the skew guard matters most
    * exactly here, where the corpus grows unbounded over time). */
  def nearDupSlice(docs: DataFrame, survivorDir: String, checkpointDir: String,
      threshold: Double = 0.6, watermark: String = "10 minutes",
      dfCap: Option[Long] = None): NearDupSlice = {
    val spark = docs.sparkSession
    val q = dedupNormalizedWithWatermark(docs, watermark)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          batch.select("doc_id", "text").write.mode("append").parquet(survivorDir)
      }
      .start()
    NearDupSlice(q, () => {
      val p = new org.apache.hadoop.fs.Path(survivorDir)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      // a dir with no committed part files (pre-created, or a writer
      // that died inside _temporary) must also yield the empty set —
      // bare exists() would pass it to a schema-less parquet read
      val hasData = fs.exists(p) && fs.listStatus(p).exists(s =>
        s.isFile && s.getPath.getName.endsWith(".parquet"))
      if (!hasData) {
        // no micro-batch has committed yet: empty pair set, not a crash
        import org.apache.spark.sql.types._
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("d1", LongType), StructField("d2", LongType),
            StructField("jac", DoubleType))))
      } else
        graft.operators.Dedup.nearDuplicatePairs(
          spark.read.parquet(survivorDir), threshold, dfCap)
    })
  }

  /** One (band, sig) probe row for the stateful LSH: the document's
    * identity plus everything the bucket needs to verify and to
    * deduplicate emissions (its sorted shingle-hash set and full band
    * signature vector). `ts` is the document's event time (null when
    * the caller runs without retention) — the bucket's eviction clock;
    * it rides on the probe row because the retention watermark must be
    * declared on the frame that feeds the stateful operator (watermark
    * column metadata does not survive a typed flatMap). */
  final case class BandProbe(band: Int, sig: Long, doc_id: Long,
      hashes: Array[Long], sigs: Array[Long], ts: Timestamp = null)
  final case class BucketEntry(doc_id: Long, hashes: Array[Long],
      sigs: Array[Long])
  /** `maxTs`: the bucket's HISTORICAL max event time (ms), persisted so
    * the retention re-arm counts from the bucket's true last touch. A
    * late-but-in-watermark arrival must not pull the timeout below an
    * earlier, newer arrival's ts + retention — in the takedown lane
    * that early eviction would drop a tombstone inside the redelivery
    * horizon and let a redelivered insert resurrect a taken-down doc
    * (ADVICE r12). 0 when retention is off. */
  final case class BucketState(entries: List[BucketEntry], maxTs: Long)
  final case class NearDupPair(d1: Long, d2: Long, jac: Double)

  /** INCREMENTAL STREAMING NEAR-DUP (VERDICT r03 #4): MinHash+LSH as a
    * band-bucket STATE STORE — `flatMapGroupsWithState` keyed on
    * (band, sig) — so verified near-dup pairs emit per micro-batch the
    * moment the second member arrives, without ever re-scanning the
    * accumulated survivor store (the previous [[nearDupSlice]] shape
    * re-ran batch LSH over all survivors on demand).
    *
    * Shape: each doc explodes into 16 (band, sig) probes carrying its
    * sorted shingle-hash set and full 16-band signature (row-level
    * twins of the batch pipeline — `Dedup.rowShingles` /
    * `Dedup.rowBandSigs`, same constants, same xxhash64 chain, pinned
    * bit-identical by StreamingSpec). A bucket's state is the docs
    * that ever landed in it; a new arrival verifies exact Jaccard
    * against each stored doc locally — no shuffle, no corpus rescan.
    *
    * Exactly-once pair emission WITHOUT cross-bucket coordination:
    * every bucket where a pair collides sees both signature vectors,
    * so each can compute the pair's FIRST colliding band — only the
    * bucket on that band emits. Re-deliveries are dropped inside the
    * bucket (doc_id already present ⇒ no re-emission), making the
    * operator idempotent under at-least-once sources.
    *
    * State cost: Σ_buckets Σ_docs |shingle hashes| — the price of
    * zero-rescan incremental dedup. Corpus-global dedup state cannot
    * be WATERMARK-evicted (a new doc may near-dup the oldest one), so
    * by default (`retention = None`) state only grows. `retention =
    * Some("7 days")` implements the production retention policy
    * (VERDICT r04 #3): each bucket carries an EVENT-TIME timeout at
    * (last arrival's event time + retention); when the stream's
    * watermark passes it, the whole bucket is dropped. Eviction
    * semantics, conservative by construction:
    *
    *   - a new doc pairs only with docs whose buckets are still live —
    *     near-dups of evicted history are treated as NEW (the policy's
    *     contract: "I only care about dups within N days");
    *   - eviction is PER-BUCKET, and a pair emits only from its first
    *     colliding band, so a pair whose first-band bucket expired is
    *     not emitted by a later live band (a drop at the retention
    *     boundary, never a duplicate — exactly-once is preserved);
    *   - any arrival into a bucket (including a redelivery) re-arms
    *     its timeout: retention counts from last touch, not creation.
    *
    * With retention, `docs` must also carry an event-time `ts` column;
    * the PROBE frame is watermarked here (`watermark` — 0 seconds
    * default: eviction exactly at the retention horizon) because
    * EventTimeTimeout requires a watermark on the stateful operator's
    * input, and each probe carries its document's `ts`.
    *
    * `docs` must be a streaming frame with (doc_id, text); docs with
    * < 3 words have no shingles and never probe (the fingerprint tier
    * — [[dedupNormalizedWithWatermark]] — is their screen, same as
    * batch). Returns a streaming (d1, d2, jac) frame, d1 < d2, each
    * qualifying pair exactly once across the whole stream.
    *
    * `maxBucket` (round 14 — n113's stop-shingle reasoning applied to
    * the STREAMING state axis): a (band, sig) bucket that reaches the
    * cap is SATURATED — only near-identical content collides on a full
    * band signature in volume, so a hot bucket is by definition a
    * mega-cluster (the skew corpus's planted 1,100-copy cluster is one
    * bucket here). A saturated bucket stops accumulating entries AND
    * stops verifying arrivals, which bounds both the per-bucket state
    * (the cap × per-doc hashes) and the per-arrival verify cost (O(cap),
    * not O(cluster)) — without the cap both grow linearly and the
    * emitted-pair work quadratically in the hot cluster's size, the
    * exact blowup n08 measured on the batch side. The dropped class is
    * intra-mega-cluster pairs past the cap — what tier-1 cluster-rep
    * dedup removes before any pairwise stage; the drop is conservative
    * under the first-colliding-band rule (a pair whose first band is
    * saturated is dropped, never double-emitted elsewhere). With a cap
    * wider than every bucket the output is IDENTICAL to the uncapped
    * lane (StreamingSpec pins it — the n113 ≡ n08 pattern). Default
    * None preserves the original semantics and state layout. */
  def streamingNearDupPairs(docs: DataFrame, threshold: Double = 0.6,
      retention: Option[String] = None,
      watermark: String = "0 seconds",
      maxBucket: Option[Int] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    implicit val probeEnc = Encoders.product[BandProbe]
    implicit val stateEnc = Encoders.product[BucketState]
    implicit val outEnc = Encoders.product[NearDupPair]
    val withRet = retention.isDefined
    val retMs = retention.map(durationMs).getOrElse(0L)

    val src: Dataset[(Long, String, Timestamp)] =
      if (withRet)
        docs.select(col("doc_id"), col("text"), col("ts"))
          .as(Encoders.product[(Long, String, Timestamp)])
      else
        docs.select(col("doc_id"), col("text"),
          lit(null).cast("timestamp").as("ts"))
          .as(Encoders.product[(Long, String, Timestamp)])

    val rawProbes = src.flatMap { case (id, text, ts) =>
      // contract: with retention enabled every doc must carry an event
      // time — a null ts would leave lastTs at 0, the timeout falls back
      // to watermark+1, and the bucket is evicted almost immediately (a
      // silent data-dependent drop). Fail the query loudly instead.
      require(!withRet || ts != null,
        s"streamingNearDupPairs: doc_id=$id has null ts but retention is set — " +
          "event-time retention requires a non-null ts on every document")
      val sh = graft.operators.Dedup.rowShingles(text)
      if (sh.isEmpty) Iterator.empty
      else {
        val (sigs, hashes) = graft.operators.Dedup.rowBandSigs(sh)
        sigs.iterator.zipWithIndex.map { case (sig, b) =>
          BandProbe(b, sig, id, hashes, sigs, ts)
        }
      }
    }
    // the watermark lives on the probe frame (its ts = the document's),
    // declared AFTER the flatMap so the stateful operator sees it
    val probes =
      if (withRet) rawProbes.toDF().withWatermark("ts", watermark)
        .as(Encoders.product[BandProbe])
      else rawProbes

    probes.groupByKey(p => (p.band, p.sig))
      .flatMapGroupsWithState[BucketState, NearDupPair](
        OutputMode.Update,
        if (withRet) GroupStateTimeout.EventTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        (key: (Int, Long), rows: Iterator[BandProbe], state: GroupState[BucketState]) =>
          if (withRet && state.hasTimedOut) {
            // watermark passed (last touch + retention): drop the bucket
            state.remove()
            Iterator.empty
          } else {
            var entries = state.getOption.map(_.entries).getOrElse(Nil)
            val out = List.newBuilder[NearDupPair]
            // seed from the bucket's historical max: a late arrival in
            // this batch must not re-arm the timeout EARLIER than a
            // previous batch's newer arrival already did
            var lastTs = state.getOption.map(_.maxTs).getOrElse(0L)
            // doc_id order makes same-batch arrivals deterministic
            rows.toSeq.sortBy(_.doc_id).foreach { p =>
              if (p.ts != null && p.ts.getTime > lastTs) lastTs = p.ts.getTime
              // saturation gate BEFORE the dup-check: a saturated
              // bucket does no per-arrival work at all (the bound is
              // the point); size-based, so a takedown-shrunk bucket
              // would naturally resume
              if (!maxBucket.exists(entries.sizeIs >= _) &&
                  !entries.exists(_.doc_id == p.doc_id)) {
                entries.foreach { e =>
                  // emit from the pair's FIRST colliding band only
                  var first = -1
                  var b = 0
                  while (first < 0 && b < e.sigs.length) {
                    if (e.sigs(b) == p.sigs(b)) first = b
                    b += 1
                  }
                  if (first == key._1) {
                    val inter = sortedIntersection(e.hashes, p.hashes)
                    val jac = inter.toDouble / (e.hashes.length + p.hashes.length - inter)
                    if (jac >= threshold)
                      out += NearDupPair(math.min(e.doc_id, p.doc_id),
                        math.max(e.doc_id, p.doc_id), jac)
                  }
                }
                entries = BucketEntry(p.doc_id, p.hashes, p.sigs) :: entries
              }
            }
            state.update(BucketState(entries, lastTs))
            // re-arm from the bucket's last touch (historical max event
            // time, not just this batch's); the +1 guard keeps the
            // timestamp legal (strictly past the current watermark) when
            // last touch + retention has already been overtaken
            if (withRet) state.setTimeoutTimestamp(
              math.max(lastTs + retMs, state.getCurrentWatermarkMs + 1))
            out.result().iterator
          }
      }.toDF()
  }

  final case class TkProbe(band: Int, sig: Long, doc_id: Long,
      hashes: Array[Long], sigs: Array[Long], dead: Boolean, ts: Timestamp)
  /** `maxTs`: see [[BucketState]] — load-bearing here, where an early
    * eviction drops tombstones, not just pairs. */
  final case class TkBucketState(entries: List[BucketEntry],
      dead: List[Long], maxTs: Long)

  /** STREAMING TAKEDOWN (st14, VERDICT r10 #6): [[streamingNearDupPairs]]
    * with a second stream of mid-stream tombstones. A takedown for doc
    * X removes X from every band bucket it occupies, so future
    * arrivals of X-like content are ACCEPTED as new — the in-stream
    * twin of the batch index's `deleteFromIndex` contract (n93):
    * takedowns affect FUTURE pairing only; already-emitted pairs are
    * immutable history (a stream cannot retract appended output).
    *
    * Takedowns must carry the CONTENT being taken down, not just the
    * id: bucket state is content-addressed ((band, sig) keys derive
    * from the text), so only the content can route a tombstone to the
    * buckets holding it — `flatMapGroupsWithState` offers no scan-all-
    * state primitive, and a broadcast-id side channel would rescan
    * nothing anyway. Id-only takedowns are the PERSISTED index's job,
    * where every component is doc-keyed precisely so an id filters it
    * (IncrementalDedup.deleteFromIndex / n93, n96). DECISIONS r11
    * records this split.
    *
    * Semantics, deterministic by construction:
    *   - within a micro-batch, takedowns apply FIRST (a takedown is
    *     effective from its batch start; inserts in the same batch see
    *     post-takedown state);
    *   - each bucket remembers its tombstoned doc_ids, so an
    *     at-least-once source REDELIVERING a taken-down doc's insert
    *     cannot resurrect it (the LSM rule: a tombstone outlives its
    *     row) — re-arrival of the same content under a NEW doc_id is
    *     accepted, matching the takedown pipeline's contract;
    *   - tombstone probes carry the same (band, sig) vector as the
    *     original insert, so one takedown reaches ALL 16 of X's
    *     buckets in the same micro-batch — no bucket is left serving
    *     a half-deleted doc, and the first-colliding-band emission
    *     rule (computed from sig vectors, invariant under deletion)
    *     keeps pair emission exactly-once.
    *
    * NOT supported in-stream: reinstating the SAME doc_id with edited
    * content after its takedown. Tombstones are id-keyed per bucket
    * while routing is content-addressed, so an edited re-insert would
    * reach a MIX of tombstoned buckets (where its bands still match
    * the dead content) and fresh ones — a half-indexed doc that can
    * silently miss future pairs. The takedown pipeline's contract is
    * id retirement: reinstated (redacted) content re-enters under a
    * NEW doc_id (which this lane accepts), or goes through the
    * persisted index's delete + rebuild path where id-keyed components
    * make the cycle exact. */
  /** State cost: the base lane's, plus one Long per (tombstone,
    * band) — takedown-batch-sized, the same budget as n93's broadcast
    * tombstone sets. Tombstone membership is checked through a Set
    * built once per bucket-batch (ADVICE r11: the stored List's O(n)
    * `contains` per probe compounds on long-lived streams).
    *
    * `retention` mirrors [[streamingNearDupPairs]]'s event-time
    * eviction exactly (same timeout arithmetic, same per-bucket
    * semantics): when the watermark passes a bucket's last touch +
    * retention the WHOLE bucket drops — entries and tombstones
    * together. A tombstone may expire once the at-least-once
    * redelivery horizon (≤ the watermark delay) has passed: a source
    * can no longer redeliver the taken-down doc's insert, so the
    * resurrection guard the tombstone existed for is vacuous. With
    * retention set, both `docs` AND `takedowns` must carry an
    * event-time `ts` column. Without it (`None`, the default) state
    * only grows — a bounded-run configuration.
    *
    * Returns streaming (d1, d2, jac), each qualifying
    * pair at most once across the stream. */
  def streamingNearDupPairsWithTakedown(docs: DataFrame,
      takedowns: DataFrame, threshold: Double = 0.6,
      retention: Option[String] = None,
      watermark: String = "0 seconds"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    implicit val probeEnc = Encoders.product[TkProbe]
    implicit val stateEnc = Encoders.product[TkBucketState]
    implicit val outEnc = Encoders.product[NearDupPair]
    val withRet = retention.isDefined
    val retMs = retention.map(durationMs).getOrElse(0L)
    // the resurrection guard's safety argument: a tombstone may expire
    // only once the at-least-once redelivery horizon (≤ the watermark
    // delay) has passed, so retention must cover that horizon
    require(!withRet || retMs >= durationMs(watermark),
      s"retention ($retention) must be >= the watermark delay " +
        s"($watermark): a tombstone evicted inside the redelivery " +
        "horizon lets a redelivered insert resurrect a taken-down doc")

    def side(df: DataFrame, dead: Boolean) = {
      val ts = if (withRet) col("ts") else lit(null).cast("timestamp").as("ts")
      df.select(col("doc_id"), col("text"), lit(dead).as("dead"), ts)
    }
    val tagged = side(docs, dead = false)
      .unionByName(side(takedowns, dead = true))
      .as(Encoders.product[(Long, String, Boolean, Timestamp)])

    val rawProbes = tagged.flatMap { case (id, text, dead, ts) =>
      require(!withRet || ts != null,
        s"streamingNearDupPairsWithTakedown: doc_id=$id has null ts but " +
          "retention is set — event-time retention requires a non-null ts")
      val sh = graft.operators.Dedup.rowShingles(text)
      if (sh.isEmpty) Iterator.empty
      else {
        val (sigs, hashes) = graft.operators.Dedup.rowBandSigs(sh)
        sigs.iterator.zipWithIndex.map { case (sig, b) =>
          TkProbe(b, sig, id, hashes, sigs, dead, ts)
        }
      }
    }
    val probes =
      if (withRet) rawProbes.toDF().withWatermark("ts", watermark)
        .as(Encoders.product[TkProbe])
      else rawProbes

    probes.groupByKey(p => (p.band, p.sig))
      .flatMapGroupsWithState[TkBucketState, NearDupPair](
        OutputMode.Update,
        if (withRet) GroupStateTimeout.EventTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        (key: (Int, Long), rows: Iterator[TkProbe], state: GroupState[TkBucketState]) =>
          if (withRet && state.hasTimedOut) {
            // watermark passed (last touch + retention): entries AND
            // tombstones drop together — redelivery of the taken-down
            // insert is no longer possible inside the watermark
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(TkBucketState(Nil, Nil, 0L))
            var entries = prev.entries
            // LinkedHashSet: O(1) membership with the stored List's
            // order preserved, so state bytes stay deterministic
            val dead = scala.collection.mutable.LinkedHashSet(prev.dead: _*)
            val out = List.newBuilder[NearDupPair]
            // historical max: a late probe must never pull the timeout
            // below a stored tombstone's own ts + retention (the
            // resurrection guard depends on the tombstone outliving the
            // redelivery horizon)
            var lastTs = prev.maxTs
            // takedowns first (batch-start effectiveness), then inserts in
            // doc_id order — same-batch arrivals stay deterministic
            rows.toSeq.sortBy(p => (!p.dead, p.doc_id)).foreach { p =>
              if (p.ts != null && p.ts.getTime > lastTs) lastTs = p.ts.getTime
              if (p.dead) {
                entries = entries.filterNot(_.doc_id == p.doc_id)
                dead += p.doc_id
              } else if (!dead.contains(p.doc_id) &&
                  !entries.exists(_.doc_id == p.doc_id)) {
                entries.foreach { e =>
                  // emit from the pair's FIRST colliding band only
                  var first = -1
                  var b = 0
                  while (first < 0 && b < e.sigs.length) {
                    if (e.sigs(b) == p.sigs(b)) first = b
                    b += 1
                  }
                  if (first == key._1) {
                    val inter = sortedIntersection(e.hashes, p.hashes)
                    val jac = inter.toDouble / (e.hashes.length + p.hashes.length - inter)
                    if (jac >= threshold)
                      out += NearDupPair(math.min(e.doc_id, p.doc_id),
                        math.max(e.doc_id, p.doc_id), jac)
                  }
                }
                entries = BucketEntry(p.doc_id, p.hashes, p.sigs) :: entries
              }
            }
            state.update(TkBucketState(entries, dead.toList, lastTs))
            if (withRet) state.setTimeoutTimestamp(
              math.max(lastTs + retMs, state.getCurrentWatermarkMs + 1))
            out.result().iterator
          }
      }.toDF()
  }

  /** Milliseconds in a `withWatermark`-style duration string — parsed
    * by Spark's own interval parser so the two notations can never
    * disagree. Day-time units only (a month has no fixed ms). */
  private def durationMs(s: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    require(iv.months == 0, s"retention '$s' must use day-time units")
    iv.days * 86400000L + iv.microseconds / 1000L
  }

  /** Intersection size of two sorted long arrays (linear merge). */
  private def sortedIntersection(a: Array[Long], b: Array[Long]): Int = {
    var i = 0; var j = 0; var n = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { n += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    n
  }

  /** THE FULL INCREMENTAL INGEST LOOP (round 4): stream → tier-1
    * watermarked normalized dedup → per-micro-batch screen against the
    * PERSISTED dedup index ([[graft.operators.IncrementalDedup]]) →
    * intra-batch near-dup drop → append survivors to the index (and
    * optionally an accepted-docs store). This is the complete shape a
    * daily/continuous crawl pipeline runs: each arriving batch touches
    * only itself plus candidate-filtered index rows; the accepted
    * corpus is never re-read, and the index grows by exactly the
    * accepted docs.
    *
    * Invariant (proven in StreamingSpec): the accepted store never
    * contains an exact duplicate, nor a near-dup pair at `threshold` —
    * across batches (index screen) or within one (intra-batch drop).
    *
    * Replay idempotence: foreachBatch is at-least-once, so each
    * committed batchId leaves a `_committed_batch_<id>` marker under
    * the index; a replayed batch is skipped outright. Even without the
    * marker the loop self-heals for fully-appended batches — replayed
    * docs fingerprint-match their own index entries and screen to an
    * empty survivor set. A crash MIDWAY through the component appends
    * is healed by the index's manifest commit (round 5 — VERDICT r04
    * #4): the five component writes land in per-batch directories that
    * readers cannot see until the one-file manifest commits, so the
    * replayed batch probes the index at its exact pre-batch state and
    * its retry overwrites the torn directories under the same batchId
    * label — O(batch) recovery, no compaction required
    * (IncrementalDedupSpec injects this crash and proves it). */
  def indexedIngest(docs: DataFrame, indexPath: String, checkpointDir: String,
      threshold: Double = 0.6, watermark: String = "10 minutes",
      acceptedDir: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.IncrementalDedup
    dedupNormalizedWithWatermark(docs, watermark)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val fs = new org.apache.hadoop.fs.Path(indexPath)
          .getFileSystem(spark.sessionState.newHadoopConf())
        val marker = new org.apache.hadoop.fs.Path(
          s"$indexPath/_committed_batch_$batchId")
        if (!fs.exists(marker) && !batch.isEmpty) {
          val b = batch.select("doc_id", "text")
          // committed manifests, not a raw dir probe: a torn base build
          // (components without a manifest) must read as "no index"
          val hasIndex =
            IncrementalDedup.committedLabels(spark, indexPath).nonEmpty
          // normalize = true: the loop's identity notion is the
          // normalized fingerprint EVERYWHERE (tier-1 state and index
          // screen agree), so whether a cross-batch mutant is caught by
          // live tier-1 state or by the index after the watermark
          // expired, the accepted set is the same
          val screened =
            if (hasIndex)
              IncrementalDedup.dedupAgainstIndex(b,
                IncrementalDedup.readIndex(spark, indexPath), threshold,
                normalize = true)
            else b
          // drop near-dups WITHIN the batch (the index can't see them
          // yet), then materialize: the survivor frame lazily READS the
          // index dirs the appends below write to
          val survivors = {
            import graft.api.Graft._
            screened.dropNearDuplicates(threshold).localCheckpoint()
          }
          if (!survivors.isEmpty) {
            // label = batchId: a replay of a torn batch overwrites its
            // own partial component dirs before the manifest commits
            if (hasIndex)
              IncrementalDedup.appendToIndex(survivors, indexPath, s"$batchId")
            else IncrementalDedup.buildAndWriteIndex(survivors, indexPath)
            acceptedDir.foreach(d =>
              survivors.write.mode("append").parquet(d))
          }
          fs.create(marker, true).close()
        }: Unit
      }
      .start()
  }

  /** CONTINUOUS INGEST INTO THE SERVING INDEX (st15): stream of
    * documents → per-micro-batch append to the at-rest BM25 postings
    * index ([[graft.operators.LexIndex]]) → serve the standing query
    * set from the ACCUMULATED index at every commit. This is the
    * lexical analog of [[indexedIngest]] (which feeds the dedup
    * index): a retrieval service whose index trails the crawl by one
    * micro-batch, with each commit's served answer snapshot-versioned.
    *
    * Layout: each batch's components land in per-batch directories
    * (`batches/<id>/postings|doclens`) made visible by a marker file
    * written AFTER both appends — a torn batch is invisible to
    * readers and its at-least-once replay overwrites the same
    * directories (the [[indexedIngest]] manifest rule, without the
    * five-component manifest the dedup index needs). Served results
    * land in `results/<id>` with mode=overwrite, so a replayed serve
    * is idempotent too. The accumulated read unions COMMITTED batch
    * dirs only; serving cost per commit is query-df-bounded exactly
    * like [[graft.operators.LexIndex.bm25FromIndex]] — the arrived
    * corpus is never re-tokenized.
    *
    * Read amplification at 100 TB (thousands of small segments listed
    * and unioned per serve) is bounded by the LSM compaction cadence:
    * [[graft.operators.LexIndex.compactServing]] folds the committed
    * segments into one base segment marker-last and composes
    * transparently with this live lane (the serve step reads through
    * [[graft.operators.LexIndex.readServing]]), and
    * [[graft.operators.LexIndex.pruneCompacted]] runs the two-phase
    * delete afterwards — LexIndexSpec exercises compact + prune
    * mid-stream.
    *
    * StreamingSpec proves the three-batch MemoryStream run serves,
    * at every snapshot, exactly the st15 batch twin's rows (each
    * prefix corpus' full-rebuild BM25 answer — append exactness makes
    * the trailing index indistinguishable from a rebuild). */
  def bm25ServingIngest(docs: DataFrame, queries: Seq[(Long, String)],
      basePath: String, checkpointDir: String,
      k: Int = 10): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.LexIndex
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val fs = new org.apache.hadoop.fs.Path(basePath)
          .getFileSystem(spark.sessionState.newHadoopConf())
        val marker = new org.apache.hadoop.fs.Path(
          s"$basePath/_committed_batch_$batchId")
        if (!fs.exists(marker) && !batch.isEmpty) {
          val bIdx = LexIndex.buildIndex(batch.select("doc_id", "text"))
          LexIndex.writeIndex(bIdx, s"$basePath/batches/$batchId")
          // serve from the committed serving view (newest compacted
          // base + newer committed batches — a concurrent
          // LexIndex.compactServing composes transparently) plus this
          // batch's at-rest segment (its marker lands last): the
          // accumulated index is a pure union of the components —
          // df/N/avgdl derived at probe time, so the served answer
          // equals a full rebuild over the arrived corpus
          val thisSeg = LexIndex.readIndex(spark, s"$basePath/batches/$batchId")
          // explicit emptiness probe, NOT a catch of readServing's
          // require: an exception-typed protocol would also swallow
          // unrelated IllegalArgumentExceptions and permanently commit
          // a batch-local-stats snapshot as if it were the first
          val idx =
            if (LexIndex.hasCommittedSegments(spark, basePath)) {
              val prior = LexIndex.readServing(spark, basePath)
              LexIndex.Bm25Index(
                prior.postings.unionByName(thisSeg.postings),
                prior.doclens.unionByName(thisSeg.doclens))
            } else thisSeg
          LexIndex.bm25FromIndex(idx, queries.toDF("q_id", "term"), k)
            .withColumn("snap", lit(batchId))
            .select("snap", "q_id", "rank", "doc_id", "score")
            .write.mode("overwrite").parquet(s"$basePath/results/$batchId")
          // marker LAST: a crash anywhere above leaves the batch
          // invisible and the replay overwrites both the component and
          // the results directories under the same batchId
          fs.create(marker, true).close()
        }: Unit
      }
      .start()
  }

  /** CONTINUOUS INGEST WITH THE LSM CADENCE IN THE LANE ITSELF (st19):
    * [[bm25ServingIngest]]'s serving ladder plus the compaction POLICY
    * a long-lived 100 TB serving stream actually runs — fold when the
    * committed tail reaches `compactEvery` segments, prune afterwards
    * (the two-phase delete), all scheduled by the lane, not by an
    * operator beside it. st15 proved compaction COMPOSES with a live
    * lane; this lane makes the cadence itself part of the attested
    * behavior: every served snapshot carries `n_segs`/`base_upto`
    * evidence columns read from the real layout at serve time, and the
    * twin's oracle pins the values the cadence predicts — a fold that
    * never fired (unbounded read amplification), a prune that broke
    * the serving view, or a serve that missed a post-fold batch all
    * flip the driver hash.
    *
    * Ordering per micro-batch: segment write → serve (committed view +
    * this segment) → results/<id> → `_committed_batch_` marker → gate.
    * The gate runs AFTER the marker (this batch counts toward the
    * tail) and OUTSIDE the replay guard: a crash between marker and
    * fold self-heals — the next batch sees the tail still ≥ the
    * fan-in and folds then. Replayed batches never re-serve (marker
    * guard) but still evaluate the gate, so a redelivery can finish an
    * interrupted compaction but never double-fold (ids ≤ watermark are
    * excluded from every fold).
    *
    * StreamingSpec proves the three-batch MemoryStream run serves
    * exactly the st19 batch twin's rows at every snapshot AND that the
    * on-disk tree went through the fold (compacted base present,
    * folded batch dirs pruned, replay markers kept). */
  def bm25ServingIngestCompacting(docs: DataFrame,
      queries: Seq[(Long, String)], basePath: String, checkpointDir: String,
      k: Int = 10, compactEvery: Int = 2):
      org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.LexIndex
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val fs = new org.apache.hadoop.fs.Path(basePath)
          .getFileSystem(spark.sessionState.newHadoopConf())
        val marker = new org.apache.hadoop.fs.Path(
          s"$basePath/_committed_batch_$batchId")
        if (!fs.exists(marker) && !batch.isEmpty) {
          val bIdx = LexIndex.buildIndex(batch.select("doc_id", "text"))
          LexIndex.writeIndex(bIdx, s"$basePath/batches/$batchId")
          val thisSeg = LexIndex.readIndex(spark, s"$basePath/batches/$batchId")
          // layout BEFORE this batch's marker: the committed view the
          // serve unions with this segment — its shape is the evidence
          val (committedSegs, baseUpto) = LexIndex.servingLayout(spark, basePath)
          val idx =
            if (committedSegs > 0L) {
              val prior = LexIndex.readServing(spark, basePath)
              LexIndex.Bm25Index(
                prior.postings.unionByName(thisSeg.postings),
                prior.doclens.unionByName(thisSeg.doclens))
            } else thisSeg
          LexIndex.bm25FromIndex(idx, queries.toDF("q_id", "term"), k)
            .withColumn("snap", lit(batchId))
            .withColumn("n_segs", lit(committedSegs + 1L))
            .withColumn("base_upto", lit(baseUpto))
            .select("snap", "n_segs", "base_upto",
              "q_id", "rank", "doc_id", "score")
            .write.mode("overwrite").parquet(s"$basePath/results/$batchId")
          fs.create(marker, true).close()
        }
        // the LSM gate — after the marker, outside the replay guard
        if (compactEvery > 0 &&
            LexIndex.tailSegmentCount(spark, basePath) >= compactEvery) {
          LexIndex.compactServing(spark, basePath)
          LexIndex.pruneCompacted(spark, basePath)
        }: Unit
      }
      .start()
  }

  /** CONTINUOUS INGEST WITH IN-BAND TAKEDOWNS (st21): the
    * right-to-be-forgotten serving lane. The input stream is a
    * CDC-style ops feed — (doc_id, text, op ∈ add|del) — and every
    * commit serves the n83 query set from the accumulated index with
    * document liveness resolved from the ops log: last operation wins,
    * the add arm winning a same-batch tie (st14's
    * takedown-first-then-re-insert rule), and a live doc served from
    * its LATEST add segment only (n99's upsert semantics — a re-insert
    * must not double its term frequencies). df/N/avgdl derive from the
    * surviving components at probe time, so every snapshot's answer
    * equals a full rebuild over the live corpus — which is exactly
    * what the twin's oracle attests, branch by branch, together with
    * the `n_dead` evidence column read from the real ops log at serve
    * time (a takedown that kept serving or a re-insert that never
    * returned flips the hash, not just a spec).
    *
    * Ordering per micro-batch: ops log + segment write → serve →
    * results/<id> → `_committed_batch_` marker. Replays (marker
    * present) skip everything — ops/segment dirs are overwritten
    * idempotently on a torn retry, invisible until their marker.
    *
    * StreamingSpec proves the three-batch MemoryStream run (adds,
    * takedowns mid-stream, partial re-insert) serves exactly the st21
    * batch twin's rows at every snapshot. */
  def bm25ServingIngestWithTakedown(ops: DataFrame,
      queries: Seq[(Long, String)], basePath: String, checkpointDir: String,
      k: Int = 10): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.LexIndex
    ops.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val fs = new org.apache.hadoop.fs.Path(basePath)
          .getFileSystem(spark.sessionState.newHadoopConf())
        val marker = new org.apache.hadoop.fs.Path(
          s"$basePath/_committed_batch_$batchId")
        if (!fs.exists(marker) && !batch.isEmpty) {
          batch.select("doc_id", "op")
            .write.mode("overwrite").parquet(s"$basePath/ops/$batchId")
          LexIndex.writeIndex(
            LexIndex.buildIndex(
              batch.filter(col("op") === "add").select("doc_id", "text")),
            s"$basePath/batches/$batchId")
          // serve the committed view PLUS this in-flight batch
          // (extraId — its components exist, its marker doesn't yet),
          // then commit marker-LAST: a crash anywhere above leaves the
          // batch invisible and exactly replayable
          val (idx, nDead) =
            LexIndex.readTakedownServing(spark, basePath, Some(batchId))
          LexIndex.bm25FromIndex(idx,
              queries.toDF("q_id", "term"), k)
            .withColumn("snap", lit(batchId))
            .withColumn("n_dead", lit(nDead))
            .select("snap", "n_dead", "q_id", "rank", "doc_id", "score")
            .write.mode("overwrite").parquet(s"$basePath/results/$batchId")
          fs.create(marker, true).close()
        }: Unit
      }
      .start()
  }

  /** CONTINUOUS INGEST INTO THE ANN SERVING INDEX (st16): stream of
    * embedding vectors → per-micro-batch PQ-encode under a FROZEN
    * configuration → append to the at-rest IVF-PQ index
    * ([[graft.operators.Pq]]'s manifest layout, cell-partitioned
    * codes) → serve the standing query set from the ACCUMULATED index
    * at every commit. The vector-side analog of [[bm25ServingIngest]]:
    * the FIRST micro-batch trains the configuration (coarse anchors +
    * codebooks — the streaming-ingest contract: the trainer cannot see
    * future arrivals), every later batch pays only one broadcast
    * encode/assign pass, and each commit's served answer is
    * snapshot-versioned under `results/<batchId>`.
    *
    * Torn-batch / replay semantics ride [[graft.operators.IndexCommit]]:
    * component dirs land first, the one-file manifest commits last
    * (atomic rename), and the per-batch label is the batchId — an
    * at-least-once redelivery overwrites the same dirs and re-commits
    * the same manifest (idempotent). The serve marker lands after the
    * results write, so a crash anywhere leaves the batch invisible or
    * exactly reproducible — including the one non-idempotent arm: the
    * training batch records a `_trained_batch_<id>` marker before the
    * base commit, so its replay after a crash between base commit and
    * serve marker re-serves instead of appending a duplicate copy of
    * its vectors (StreamingSpec's restart test pins this).
    *
    * StreamingSpec proves the three-batch MemoryStream run serves, at
    * every snapshot, exactly the st16 batch twin's rows (append
    * exactness under the frozen configuration makes the trailing index
    * indistinguishable from a rebuild over the arrived prefix). */
  def pqServingIngest(vecs: DataFrame, queries: DataFrame,
      basePath: String, checkpointDir: String,
      k: Int = 5): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.Pq
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val fs = new org.apache.hadoop.fs.Path(basePath)
          .getFileSystem(spark.sessionState.newHadoopConf())
        val marker = new org.apache.hadoop.fs.Path(
          s"$basePath/_served_batch_$batchId")
        if (!fs.exists(marker) && !batch.isEmpty) {
          val idxPath = s"$basePath/index"
          // The train/append decision must be REPLAY-STABLE (ADVICE
          // r11): hasPqIndex changes truth value mid-replay — a crash
          // after the base manifest commits but before the serve
          // marker would otherwise route the training batch's replay
          // down the append arm, permanently duplicating its vectors
          // (readPqIndex unions every manifested code dir). Record the
          // trainer's identity BEFORE the base commit: marker present
          // + index absent ⇒ re-train (writePqIndex clears the torn
          // write, idempotent); marker present + index present ⇒ the
          // base already holds exactly this batch — skip straight to
          // the serve. Only the batch that found the index
          // uninitialized ever writes its marker, so the append arm
          // stays keyed off the index's state, not batchId == 0.
          val trained = new org.apache.hadoop.fs.Path(
            s"$basePath/_trained_batch_$batchId")
          if (!Pq.hasPqIndex(spark, idxPath)) {
            fs.create(trained, true).close()
            Pq.writePqIndex(Pq.buildPqIndex(batch), idxPath)
          } else if (!fs.exists(trained))
            Pq.appendToPqIndex(batch, idxPath, label = s"a$batchId")
          Pq.searchPqIndex(queries, Pq.readPqIndex(spark, idxPath), k = k)
            .withColumn("snap", lit(batchId))
            .select("snap", "q_id", "nb_id", "adc", "rn")
            .write.mode("overwrite").parquet(s"$basePath/results/$batchId")
          // marker LAST: a crash above leaves the batch replayable
          // under the same label and results dir
          fs.create(marker, true).close()
        }: Unit
      }
      .start()
  }

  /** CONTINUOUS TAKEDOWN INGEST WITH PHYSICAL FORGETTING (st24):
    * [[bm25ServingIngestWithTakedown]]'s CDC serving plus
    * [[bm25ServingIngestCompacting]]'s in-lane LSM cadence, composed so
    * the fold is where the right to be forgotten becomes PHYSICAL. The
    * serve path never rewrites the index on a takedown (st21's
    * contract — liveness is an ops-log fold); the compaction gate,
    * after the serve marker and outside the replay guard, then
    * materializes the liveness-resolved view as the new base — dead
    * docs' postings are NOT copied — re-stamps the survivors as
    * `ops_base/<watermark>`, and the two-phase prune drops the folded
    * segments AND the folded ops logs, tombstones included (the
    * retained doc_id of a deletion request is itself data to forget).
    *
    * Every snapshot carries four evidence columns read from the real
    * layout at serve time: `n_segs`/`base_upto` (the LSM cadence,
    * st19's shape) and `n_dead`/`n_dead_disk` — the forget's
    * signature is the trajectory: after the fold, GC'd tombstones stop
    * counting in n_dead, and n_dead_disk returns to the NEW takedowns
    * only. A fold that silently kept dead rows, skipped the ops GC, or
    * never ran flips the driver hash, not just a spec.
    *
    * Crash windows self-heal exactly like st19: before the
    * `_compacted_upto_` marker the next gate refolds (fresh-path
    * writes, idempotent); after the marker but before the prune, stale
    * dirs linger harmlessly until the next gate's prune sweeps
    * everything ≤ the watermark. */
  def bm25ServingIngestTakedownCompacting(ops: DataFrame,
      queries: Seq[(Long, String)], basePath: String, checkpointDir: String,
      k: Int = 10, compactEvery: Int = 2):
      org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.LexIndex
    ops.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val fs = new org.apache.hadoop.fs.Path(basePath)
          .getFileSystem(spark.sessionState.newHadoopConf())
        val marker = new org.apache.hadoop.fs.Path(
          s"$basePath/_committed_batch_$batchId")
        if (!fs.exists(marker) && !batch.isEmpty) {
          batch.select("doc_id", "op")
            .write.mode("overwrite").parquet(s"$basePath/ops/$batchId")
          LexIndex.writeIndex(
            LexIndex.buildIndex(
              batch.filter(col("op") === "add").select("doc_id", "text")),
            s"$basePath/batches/$batchId")
          // layout BEFORE this batch's marker (the committed view the
          // serve unions with the in-flight segment) — st19's evidence
          val (committedSegs, baseUpto) =
            LexIndex.servingLayout(spark, basePath)
          val (idx, nDead, nDeadDisk) = LexIndex
            .readTakedownCompactServing(spark, basePath, Some(batchId))
          LexIndex.bm25FromIndex(idx, queries.toDF("q_id", "term"), k)
            .withColumn("snap", lit(batchId))
            .withColumn("n_segs", lit(committedSegs + 1L))
            .withColumn("base_upto", lit(baseUpto))
            .withColumn("n_dead", lit(nDead))
            .withColumn("n_dead_disk", lit(nDeadDisk))
            .select("snap", "n_segs", "base_upto", "n_dead", "n_dead_disk",
              "q_id", "rank", "doc_id", "score")
            .write.mode("overwrite").parquet(s"$basePath/results/$batchId")
          fs.create(marker, true).close()
        }
        // the LSM gate — after the marker, outside the replay guard.
        // The PRUNE runs on every batch (not only after a fold): it is
        // idempotent and listing-cheap, and it is the compliance half
        // of the cadence — a crash between the fold's marker and its
        // prune must not leave the dead docs' bytes on disk until the
        // NEXT fold (two more batches away); the very next batch's
        // gate sweeps them, bounding the linger to one micro-batch.
        if (compactEvery > 0) {
          if (LexIndex.tailSegmentCount(spark, basePath) >= compactEvery)
            LexIndex.compactTakedownServing(spark, basePath)
          LexIndex.pruneTakedownCompacted(spark, basePath)
        }: Unit
      }
      .start()
  }

  /** CONTINUOUS ANN INGEST WITH IN-BAND TAKEDOWNS (st22): the
    * vector-side twin of [[bm25ServingIngestWithTakedown]], completing
    * the takedown axis across all three index families (st14 dedup,
    * st21 BM25, st22 ANN). The stream is a CDC-style ops feed —
    * (vec_id, embedding, op ∈ add|del) — riding [[pqServingIngest]]'s
    * frozen-config ladder: the first batch's ADDS train the
    * configuration, later adds append one encode/assign segment, and
    * every serve excludes the currently-tombstoned ids from the
    * CANDIDATE side only ([[graft.operators.Pq.deletePqIndex]] — the
    * n98 contract: a delete never narrows the trained config, so
    * surviving codes stay byte-identical). Liveness is last-op-wins
    * from the accumulated ops log (same-batch tie → add, st14's
    * rule). A re-insert of a previously deleted id must come through
    * the UPSERT path (n100: tombstone + re-encode in one batch) — a
    * bare re-add would leave the id's stale codes in the older
    * segment; the liveness rule is still total, the lane just doesn't
    * deduplicate segments (st21's latest-add-segment join is the BM25
    * side's answer; the PQ side's is n100).
    *
    * Every served snapshot carries `n_dead` evidence read from the
    * real ops log, and the twin's oracle pins the trajectory — a
    * takedown that kept serving as a neighbor, or one that silently
    * narrowed the frozen config, flips the driver hash.
    *
    * Ordering per micro-batch: ops log → train/append (replay-stable
    * via `_trained_batch_` marker, st16's branch) → serve → results →
    * marker LAST. */
  /** Replay-stable PQ train-or-append for the CDC ops lanes, guarded
    * against del-only prefixes (ADVICE r12): training
    * [[graft.operators.Pq.buildPqIndex]] on an EMPTY adds frame would
    * still commit a manifest — `hasPqIndex` flips true and every later
    * batch appends under empty anchors/books, serving empty results
    * permanently with no error. st16's pure-vector input could never
    * hit it; a CDC feed whose first batch carries only `del` ops can.
    * Training (and its `_trained_batch_` replay marker) is therefore
    * DEFERRED to the first batch that actually carries adds; del-only
    * batches still land in the ops log, so their tombstones are
    * honored the moment the index exists. Empty appends are skipped
    * for the same reason — zero rows encode to zero code rows, and an
    * empty segment would only distort the `n_appends` fold-cadence
    * evidence. Returns whether an index exists after the call (false
    * only on an all-del prefix — the caller serves the empty top-k). */
  private def trainOrAppendPq(spark: org.apache.spark.sql.SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, adds: DataFrame,
      idxPath: String, trained: org.apache.hadoop.fs.Path,
      label: String): Boolean = {
    import graft.operators.Pq
    val hasIdx = Pq.hasPqIndex(spark, idxPath)
    if (adds.isEmpty) hasIdx
    else {
      if (!hasIdx) {
        fs.create(trained, true).close()
        Pq.writePqIndex(Pq.buildPqIndex(adds), idxPath)
      } else if (!fs.exists(trained))
        Pq.appendToPqIndex(adds, idxPath, label = label)
      true
    }
  }

  def pqServingIngestWithTakedown(ops: DataFrame, queries: DataFrame,
      basePath: String, checkpointDir: String,
      k: Int = 5): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.Pq
    ops.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val fs = new org.apache.hadoop.fs.Path(basePath)
          .getFileSystem(spark.sessionState.newHadoopConf())
        val marker = new org.apache.hadoop.fs.Path(
          s"$basePath/_served_batch_$batchId")
        if (!fs.exists(marker) && !batch.isEmpty) {
          batch.select("vec_id", "op")
            .write.mode("overwrite").parquet(s"$basePath/ops/$batchId")
          val adds = batch.filter(col("op") === "add")
            .select("vec_id", "embedding")
          val idxPath = s"$basePath/index"
          val trained = new org.apache.hadoop.fs.Path(
            s"$basePath/_trained_batch_$batchId")
          val hasIdx = trainOrAppendPq(spark, fs, adds, idxPath, trained,
            label = s"a$batchId")
          // liveness from the ops logs of every batch visible so far
          // (committed serves + this in-flight one)
          val ids = (fs.listStatus(new org.apache.hadoop.fs.Path(basePath))
            .map(_.getPath.getName)
            .filter(_.startsWith("_served_batch_"))
            .map(_.stripPrefix("_served_batch_"))
            .filter(s0 => s0.nonEmpty && s0.forall(_.isDigit))
            .map(_.toLong).toSeq :+ batchId).distinct.sorted
          val opsLog = ids.map(id => spark.read.parquet(s"$basePath/ops/$id")
              .select(col("vec_id"), col("op"), lit(id).as("batch")))
            .reduce(_ unionByName _)
          val lastOps = opsLog.groupBy("vec_id").agg(
            max(when(col("op") === "add", col("batch"))).as("last_add"),
            max(when(col("op") === "del", col("batch"))).as("last_del"))
          val deadDf = lastOps.filter(col("last_add").isNotNull &&
            col("last_del").isNotNull && col("last_del") > col("last_add"))
            .select("vec_id")
          val nDead = deadDf.count()
          // all-del prefix: no index yet — serve the empty top-k (same
          // schema) rather than failing the lane or training on nothing
          val res =
            if (hasIdx) Pq.searchPqIndex(queries,
              Pq.deletePqIndex(Pq.readPqIndex(spark, idxPath), deadDf), k = k)
            else queries.select(col("vec_id").as("q_id")).limit(0)
              .select(col("q_id"), lit(0L).as("nb_id"),
                lit(0.0).as("adc"), lit(0L).as("rn"))
          res
            .withColumn("snap", lit(batchId))
            .withColumn("n_dead", lit(nDead))
            .select("snap", "n_dead", "q_id", "nb_id", "adc", "rn")
            .write.mode("overwrite").parquet(s"$basePath/results/$batchId")
          fs.create(marker, true).close()
        }: Unit
      }
      .start()
  }

  /** CONTINUOUS HYBRID INGEST WITH IN-BAND TAKEDOWNS (st23): ONE
    * CDC-style ops feed — (doc_id, text, embedding, op ∈ add|del) —
    * maintaining BOTH retrieval index families at once, with every
    * snapshot served as the RRF fusion (n90/n95's rank-level fusion)
    * of the two arms' answers:
    *
    *   - lexical arm: per-batch BM25 segments + the shared ops log,
    *     served through [[graft.operators.LexIndex.readTakedownServing]]
    *     (st21's exactness: df/N/avgdl from survivors at probe time);
    *   - semantic arm: the frozen-config IVF-PQ ladder (first batch
    *     trains, later batches append one encode/assign segment, the
    *     [[graft.operators.Pq]] n98 contract on delete), candidates
    *     anti-joined against the dead set;
    *   - fusion: [[graft.operators.Similarity.rrfFuse]] — RRF k=60,
    *     absent-system convention, deterministic id ties.
    *
    * The lane's reason to exist beyond st21 ∘ st22: CROSS-INDEX
    * LIVENESS CONSISTENCY. Both arms resolve document liveness from
    * the SAME [[graft.operators.LexIndex.opsLogLiveness]] fold of the
    * single ops log (last op wins, same-batch tie → add), so a
    * right-to-be-forgotten request cannot be honored by one index and
    * leaked by the other — the fused twin's oracle re-derives both
    * arms over the live corpus and any one-sided leak moves the fused
    * ranking and flips the hash. `n_dead` evidence is read from the
    * real ops log at serve time.
    *
    * Ordering per micro-batch: ops log + lex segment → PQ train/append
    * (replay-stable via `_trained_batch_`, st16's branch) → one
    * liveness fold → both arms + fusion → results/<id> →
    * `_committed_batch_` marker LAST (a crash anywhere leaves the
    * batch invisible and exactly replayable).
    *
    * Scale shape: per-batch work is batch-sized (segment build, one
    * encode/assign pass) plus query-bounded serving (term-semi-filtered
    * postings, probed-cell ADC); the ops log is takedown-traffic-sized
    * and its liveness fold is doc-keyed — nothing is
    * corpus-proportional at serve time. */
  def hybridServingIngestWithTakedown(ops: DataFrame,
      terms: Seq[(Long, String)], queryVecs: DataFrame, basePath: String,
      checkpointDir: String, lexK: Int = 10,
      out: Int = 10): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.{LexIndex, Pq, Similarity}
    ops.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val fs = new org.apache.hadoop.fs.Path(basePath)
          .getFileSystem(spark.sessionState.newHadoopConf())
        val marker = new org.apache.hadoop.fs.Path(
          s"$basePath/_committed_batch_$batchId")
        if (!fs.exists(marker) && !batch.isEmpty) {
          batch.select("doc_id", "op")
            .write.mode("overwrite").parquet(s"$basePath/ops/$batchId")
          val adds = batch.filter(col("op") === "add")
          LexIndex.writeIndex(
            LexIndex.buildIndex(adds.select("doc_id", "text")),
            s"$basePath/batches/$batchId")
          val idxPath = s"$basePath/index"
          val trained = new org.apache.hadoop.fs.Path(
            s"$basePath/_trained_batch_$batchId")
          val vecs = adds.select(col("doc_id").as("vec_id"), col("embedding"))
          val hasIdx = trainOrAppendPq(spark, fs, vecs, idxPath, trained,
            label = s"a$batchId")
          // ONE liveness fold drives BOTH arms (the lane's contract)
          val (lexIdx, nDead) =
            LexIndex.readTakedownServing(spark, basePath, Some(batchId))
          val dead = LexIndex.deadDocs(LexIndex.opsLogLiveness(spark,
              basePath,
              LexIndex.takedownBatchIds(spark, basePath, Some(batchId))))
            .select(col("doc_id").as("vec_id"))
          val lex = LexIndex
            .bm25FromIndex(lexIdx, terms.toDF("q_id", "term"), lexK)
            .select(col("q_id"), col("doc_id").as("cand"),
              col("rank").as("r"))
          // all-del prefix: the lex arm still serves (its per-batch
          // segments exist, empty); the semantic arm is the empty
          // system — rrfFuse's absent-system convention handles it
          val sem =
            if (hasIdx) Pq.searchPqIndex(queryVecs,
                Pq.deletePqIndex(Pq.readPqIndex(spark, idxPath), dead))
              .select(col("q_id"), col("nb_id").as("cand"), col("rn").as("r"))
            else queryVecs.select(col("vec_id").as("q_id")).limit(0)
              .select(col("q_id"), lit(0L).as("cand"), lit(0L).as("r"))
          Similarity.rrfFuse(lex, sem, out)
            .withColumn("snap", lit(batchId))
            .withColumn("n_dead", lit(nDead))
            .select("snap", "n_dead", "q_id", "cand", "rrf", "rrf_rank")
            .write.mode("overwrite").parquet(s"$basePath/results/$batchId")
          fs.create(marker, true).close()
        }: Unit
      }
      .start()
  }

  /** CONTINUOUS ANN INGEST WITH THE FOLD+SWAP CADENCE IN THE LANE
    * (st20): [[pqServingIngest]]'s serving ladder plus the compaction
    * policy n105 proved at rest — the vector-side analog of
    * [[bm25ServingIngestCompacting]]. When the serving generation
    * carries `compactEvery` append segments, the lane folds the whole
    * index to a FRESH generation path (phase one, an action), commits
    * the `_gen_<g+1>` marker (the swap), and prunes the old
    * generation (phase two) — all after the serve marker and outside
    * the replay guard, so a crash anywhere in the fold self-heals at
    * the next batch ([[graft.operators.Pq.foldPqServingIfDue]]'s
    * sweep prunes every stale generation, not just the newest).
    * Appends land on whatever generation the `_gen_` markers name, so
    * a stateless foreachBatch — and a restarted stream — resolves the
    * serving tree from disk alone.
    *
    * Fold exactness: anchors, codebooks and codes are rewritten
    * verbatim (the n105 contract), so a folded generation answers
    * bit-identically to the segment tree it replaced — which is
    * exactly why correct answers alone cannot attest the fold
    * (DECISIONS r12 #6). Every served snapshot therefore carries
    * `n_appends`/`gen` evidence read from the real generation tree at
    * serve time, and the twin's oracle pins the values the cadence
    * predicts: a fold that never fires (unbounded per-serve segment
    * listing at 100 TB), a swap serving a torn generation, or an
    * append landing on a pruned tree all flip the driver hash.
    *
    * StreamingSpec proves the three-batch MemoryStream run serves
    * exactly the st20 batch twin's rows at every snapshot AND that
    * the tree went through the swap (old generations pruned, the
    * serving generation consolidated base-only plus the tail append,
    * `_gen_` marker naming it). */
  def pqServingIngestCompacting(vecs: DataFrame, queries: DataFrame,
      basePath: String, checkpointDir: String, k: Int = 5,
      compactEvery: Int = 1): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.Pq
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val fs = new org.apache.hadoop.fs.Path(basePath)
          .getFileSystem(spark.sessionState.newHadoopConf())
        val marker = new org.apache.hadoop.fs.Path(
          s"$basePath/_served_batch_$batchId")
        if (!fs.exists(marker) && !batch.isEmpty) {
          val g = Pq.currentPqGen(spark, basePath)
          val idxPath = Pq.pqGenPath(basePath, g)
          // the pqServingIngest replay-stable train/append branch,
          // pointed at the current generation
          val trained = new org.apache.hadoop.fs.Path(
            s"$basePath/_trained_batch_$batchId")
          if (!Pq.hasPqIndex(spark, idxPath)) {
            fs.create(trained, true).close()
            Pq.writePqIndex(Pq.buildPqIndex(batch), idxPath)
          } else if (!fs.exists(trained))
            Pq.appendToPqIndex(batch, idxPath, label = s"a$batchId")
          val nApp = Pq.pqAppendCount(spark, idxPath)
          Pq.searchPqIndex(queries, Pq.readPqIndex(spark, idxPath), k = k)
            .withColumn("snap", lit(batchId))
            .withColumn("n_appends", lit(nApp.toLong))
            .withColumn("gen", lit(g))
            .select("snap", "n_appends", "gen", "q_id", "nb_id", "adc", "rn")
            .write.mode("overwrite").parquet(s"$basePath/results/$batchId")
          fs.create(marker, true).close()
        }
        // the fold gate — after the marker, outside the replay guard
        // (the st19 rule: a redelivery can finish an interrupted fold
        // but never double-fold)
        Pq.foldPqServingIfDue(spark, basePath, compactEvery): Unit
      }
      .start()
  }

  /** CONTINUOUS ANN TAKEDOWN INGEST WITH PHYSICAL FORGETTING (st25):
    * the vector-side [[bm25ServingIngestTakedownCompacting]],
    * completing the physical-forget axis across both retrieval
    * families. [[pqServingIngestWithTakedown]]'s CDC serving (adds
    * append under the frozen config, takedowns anti-join candidates —
    * n98 never narrows the trained configuration) rides
    * [[pqServingIngestCompacting]]'s generation cadence, and the FOLD
    * is where the forget becomes physical: the next generation is the
    * tombstone-FILTERED index (dead codes are not copied; surviving
    * codes byte-identical — the fold answers exactly like the
    * anti-joined view it replaces), the survivors re-stamp as
    * `ops_base/<watermark>`, and the per-batch sweep drops old
    * generations AND the folded ops logs, tombstones included.
    *
    * Both liveness resolutions (serve-time anti-join, fold-time
    * filter) are the one shared last-op-wins fold
    * ([[graft.operators.LexIndex.livenessOf]], DECISIONS r12 #9).
    * Every snapshot carries st20's layout evidence (`n_appends`,
    * `gen`) plus st24's dead pair (`n_dead`, `n_dead_disk`), all read
    * from the real tree at serve time; the forget's signature is the
    * trajectory — after a fold, GC'd tombstones stop counting and
    * `n_dead_disk` returns to the new takedowns only. */
  def pqServingIngestTakedownCompacting(ops: DataFrame, queries: DataFrame,
      basePath: String, checkpointDir: String, k: Int = 5,
      compactEvery: Int = 1): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.Pq
    ops.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val fs = new org.apache.hadoop.fs.Path(basePath)
          .getFileSystem(spark.sessionState.newHadoopConf())
        val marker = new org.apache.hadoop.fs.Path(
          s"$basePath/_served_batch_$batchId")
        def servedIds(extra: Option[Long]): Seq[Long] = {
          val p = new org.apache.hadoop.fs.Path(basePath)
          val committed =
            if (!fs.exists(p)) Seq.empty[Long]
            else fs.listStatus(p).map(_.getPath.getName)
              .filter(_.startsWith("_served_batch_"))
              .map(_.stripPrefix("_served_batch_"))
              .filter(s0 => s0.nonEmpty && s0.forall(_.isDigit))
              .map(_.toLong).toSeq
          (committed ++ extra).distinct.sorted
        }
        if (!fs.exists(marker) && !batch.isEmpty) {
          batch.select("vec_id", "op")
            .write.mode("overwrite").parquet(s"$basePath/ops/$batchId")
          val adds = batch.filter(col("op") === "add")
            .select("vec_id", "embedding")
          val g = Pq.currentPqGen(spark, basePath)
          val idxPath = Pq.pqGenPath(basePath, g)
          val trained = new org.apache.hadoop.fs.Path(
            s"$basePath/_trained_batch_$batchId")
          val hasIdx = trainOrAppendPq(spark, fs, adds, idxPath, trained,
            label = s"a$batchId")
          val ids = servedIds(Some(batchId))
          val (dead, nDead) =
            Pq.readPqTakedownLiveness(spark, basePath, ids)
          // all-del prefix: no index yet — empty top-k, zero layout
          val res =
            if (hasIdx) {
              val idx = Pq.readPqIndex(spark, idxPath)
              val nDeadDisk = Pq.pqDeadCodesOnDisk(idx, dead)
              Pq.searchPqIndex(queries, Pq.deletePqIndex(idx, dead), k = k)
                .withColumn("n_appends",
                  lit(Pq.pqAppendCount(spark, idxPath).toLong))
                .withColumn("n_dead_disk", lit(nDeadDisk))
            } else queries.select(col("vec_id").as("q_id")).limit(0)
              .select(col("q_id"), lit(0L).as("nb_id"),
                lit(0.0).as("adc"), lit(0L).as("rn"),
                lit(0L).as("n_appends"), lit(0L).as("n_dead_disk"))
          res
            .withColumn("snap", lit(batchId))
            .withColumn("gen", lit(g))
            .withColumn("n_dead", lit(nDead))
            .select("snap", "n_appends", "gen", "n_dead", "n_dead_disk",
              "q_id", "nb_id", "adc", "rn")
            .write.mode("overwrite").parquet(s"$basePath/results/$batchId")
          fs.create(marker, true).close()
        }
        // fold gate + per-batch sweep — after the marker, outside the
        // replay guard (the st24 rule: the sweep is the compliance
        // half, its linger window must be one micro-batch)
        if (compactEvery > 0) {
          Pq.foldPqTakedownIfDue(spark, basePath, compactEvery,
            servedIds(None))
          Pq.prunePqTakedownFolded(spark, basePath, servedIds(None))
        }: Unit
      }
      .start()
  }

  /** CONTINUOUS HYBRID INGEST WITH PHYSICAL FORGET ON BOTH ARMS (st26
    * — VERDICT r12 #2): st23's one-CDC-feed hybrid serving composed
    * with st24's lex LSM takedown fold AND st25's ANN generation
    * takedown fold, one per arm, each at its own cadence. The lane's
    * reason to exist beyond st23 ∘ st24 ∘ st25 is the CROSS-ARM CRASH
    * WINDOW: with physical forgetting on both arms, one arm's fold can
    * commit while the other's crashes — do the two ops watermarks
    * diverging leak a dead doc one-sidedly?
    *
    * The design answer is structural: each arm owns a COMPLETE copy of
    * the ops feed (`lex/ops/<id>` and `ann/ops/<id>`, two projections
    * of the same batch frame), and each arm resolves liveness from its
    * OWN copy through the one shared fold
    * ([[graft.operators.LexIndex.livenessOf]]). An arm GCs tombstones
    * only in the same fold that physically removes the dead rows from
    * ITS index (the st24/st25 invariant, unchanged by composition), so
    * arbitrary fold-cadence divergence — including the crash window
    * where the lex fold committed and the ANN fold tore, or vice
    * versa — cannot make either arm serve a dead doc. The twin makes
    * the divergence a first-class hash-attested state: per-arm dead
    * counts (n_dead_lex, n_dead_ann) legitimately differ after one
    * arm's fold while the fused ANSWERS stay equal; StreamingSpec
    * additionally injects the torn-fold crashes and proves no
    * one-sided leak plus next-gate heal.
    *
    * Layout: `base/lex` = the st24 tree, `base/ann` = the st25 tree,
    * `base/results/<id>` the fused snapshots. Ordering per micro-batch:
    * both ops copies + lex segment → PQ train/append (del-only-prefix
    * guarded) → both arms' serve + fusion → results → lex marker → ann
    * marker LAST (the replay guard); fold gates + every-batch prunes
    * run after the markers, outside the replay guard, per arm. */
  def hybridServingIngestTakedownCompacting(ops: DataFrame,
      terms: Seq[(Long, String)], queryVecs: DataFrame, basePath: String,
      checkpointDir: String, lexK: Int = 10, out: Int = 10,
      lexCompactEvery: Int = 3,
      annCompactEvery: Int = 1): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.{LexIndex, Pq, Similarity}
    val lexBase = s"$basePath/lex"
    val annBase = s"$basePath/ann"
    // Orphan-marker age-out for the fold gate (ADVICE r14 #1): a
    // genuine crash-window batch (lex/ann marker landed, replay guard
    // didn't) is replayed as the FIRST batch of the recovering run —
    // its guard lands before this process evaluates a second gate. A
    // marker id still unguarded after this process has worked through
    // further batches therefore belongs to no replayable batch (e.g. a
    // restart on a fresh checkpoint with different numbering, where the
    // replay-skip guard means the id never re-serves) and would wedge
    // compaction/GC on both arms PERMANENTLY. Aged-out ids stop gating
    // — safe because NO REPLAY IS COMING for them: the gate exists to
    // keep a fold from racing an in-flight batch's replay, and an id
    // the current numbering will never re-serve has no replay to race
    // (its results/<id> may or may not exist — a _trained_batch_
    // marker lands mid-batch, before results — but nothing will ever
    // rewrite either way). Logged loudly, once per orphan.
    // Per-process state by design — a restart re-arms full deferral.
    val gateEvals = new java.util.concurrent.atomic.AtomicLong(0L)
    val firstUnguarded =
      new java.util.concurrent.ConcurrentHashMap[java.lang.Long, java.lang.Long]()
    val loggedOrphans =
      java.util.concurrent.ConcurrentHashMap.newKeySet[java.lang.Long]()
    ops.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val fs = new org.apache.hadoop.fs.Path(basePath)
          .getFileSystem(spark.sessionState.newHadoopConf())
        def annServedIds(extra: Option[Long]): Seq[Long] = {
          val p = new org.apache.hadoop.fs.Path(annBase)
          val committed =
            if (!fs.exists(p)) Seq.empty[Long]
            else fs.listStatus(p).map(_.getPath.getName)
              .filter(_.startsWith("_served_batch_"))
              .map(_.stripPrefix("_served_batch_"))
              .filter(s0 => s0.nonEmpty && s0.forall(_.isDigit))
              .map(_.toLong).toSeq
          (committed ++ extra).distinct.sorted
        }
        // the ANN marker is written LAST, so it is the batch's replay
        // guard — a crash between the lex and ann markers replays the
        // whole batch idempotently (overwrites of identical content)
        val annMarker = new org.apache.hadoop.fs.Path(
          s"$annBase/_served_batch_$batchId")
        if (!fs.exists(annMarker) && !batch.isEmpty) {
          batch.select("doc_id", "op")
            .write.mode("overwrite").parquet(s"$lexBase/ops/$batchId")
          batch.select(col("doc_id").as("vec_id"), col("op"))
            .write.mode("overwrite").parquet(s"$annBase/ops/$batchId")
          val adds = batch.filter(col("op") === "add")
          LexIndex.writeIndex(
            LexIndex.buildIndex(adds.select("doc_id", "text")),
            s"$lexBase/batches/$batchId")
          val g = Pq.currentPqGen(spark, annBase)
          val idxPath = Pq.pqGenPath(annBase, g)
          val trained = new org.apache.hadoop.fs.Path(
            s"$annBase/_trained_batch_$batchId")
          val vecs = adds.select(col("doc_id").as("vec_id"), col("embedding"))
          val hasIdx = trainOrAppendPq(spark, fs, vecs, idxPath, trained,
            label = s"a$batchId")
          // lex arm: the st24 serving view over ITS ops copy. The
          // layout EXCLUDES this batch id: the lex marker is written
          // before the ann replay guard, so a crash between them
          // replays with the lex marker already committed — counting
          // it in the layout AND adding +1 below would overcount
          // n_segs by one and rewrite results/<id> with different
          // evidence (ADVICE r13 #1).
          val (nSegsCommitted, baseUpto) =
            LexIndex.servingLayout(spark, lexBase, excluding = Some(batchId))
          val (lexIdx, nDeadLex, _) =
            LexIndex.readTakedownCompactServing(spark, lexBase, Some(batchId))
          val lex = LexIndex
            .bm25FromIndex(lexIdx, terms.toDF("q_id", "term"), lexK)
            .select(col("q_id"), col("doc_id").as("cand"),
              col("rank").as("r"))
          // ann arm: the st25 liveness over ITS ops copy
          val ids = annServedIds(Some(batchId))
          val (deadAnn, nDeadAnn) =
            Pq.readPqTakedownLiveness(spark, annBase, ids)
          val sem =
            if (hasIdx) Pq.searchPqIndex(queryVecs,
                Pq.deletePqIndex(Pq.readPqIndex(spark, idxPath), deadAnn))
              .select(col("q_id"), col("nb_id").as("cand"), col("rn").as("r"))
            else queryVecs.select(col("vec_id").as("q_id")).limit(0)
              .select(col("q_id"), lit(0L).as("cand"), lit(0L).as("r"))
          Similarity.rrfFuse(lex, sem, out)
            .withColumn("snap", lit(batchId))
            .withColumn("n_segs", lit(nSegsCommitted + 1L))
            .withColumn("base_upto", lit(baseUpto))
            .withColumn("n_appends",
              lit(if (hasIdx) Pq.pqAppendCount(spark, idxPath).toLong else 0L))
            .withColumn("gen", lit(g))
            .withColumn("n_dead_lex", lit(nDeadLex))
            .withColumn("n_dead_ann", lit(nDeadAnn))
            .select("snap", "n_segs", "base_upto", "n_appends", "gen",
              "n_dead_lex", "n_dead_ann", "q_id", "cand", "rrf", "rrf_rank")
            .write.mode("overwrite").parquet(s"$basePath/results/$batchId")
          fs.create(new org.apache.hadoop.fs.Path(
            s"$lexBase/_committed_batch_$batchId"), true).close()
          fs.create(annMarker, true).close()
        }
        // per-arm fold gates + EVERY-BATCH prunes — after the markers,
        // outside the replay guard (the st24/st25 rule: a crashed
        // prune's linger window is one micro-batch). The cadences are
        // independent by design; any interleaving of their crash
        // windows is per-arm self-healing.
        //
        // The gates run only when NO batch is in flight: a batch whose
        // PQ train/append or lex marker landed but whose ann replay
        // guard did not (the lex/ann marker crash window) would
        // otherwise be half-folded by an EARLIER replayed batch's gate
        // — the fold advances gen / consumes the tail segment, and the
        // in-flight batch's replay then rewrites results/<id> with
        // different evidence (gen, n_appends, n_segs, base_upto),
        // breaking replay invisibility. Deferring extends the fold
        // linger window by exactly the replayed batch; the next gate
        // (after its guard lands) folds everything.
        def markerIds(dir: String, prefix: String): Set[Long] = {
          val p = new org.apache.hadoop.fs.Path(dir)
          if (!fs.exists(p)) Set.empty[Long]
          else fs.listStatus(p).map(_.getPath.getName)
            .filter(_.startsWith(prefix)).map(_.stripPrefix(prefix))
            .filter(s0 => s0.nonEmpty && s0.forall(_.isDigit))
            .map(_.toLong).toSet
        }
        val guarded = annServedIds(None).toSet
        val evalN = gateEvals.incrementAndGet()
        val unguarded =
          (markerIds(lexBase, "_committed_batch_") ++
            markerIds(annBase, "_trained_batch_")).filterNot(guarded)
        firstUnguarded.keySet.removeIf(m => !unguarded.contains(m.longValue()))
        val orphans = unguarded.filter { m =>
          val first = firstUnguarded.computeIfAbsent(m, _ => evalN)
          // seen unguarded across ≥2 further gate evaluations of THIS
          // process: no same-checkpoint replay is coming (that replay
          // is the recovering run's first batch), so the id is orphaned
          evalN - first >= 2
        }
        orphans.foreach { m =>
          // once per orphan: the marker file is never deleted, so it
          // re-enters `orphans` every gate evaluation for the life of
          // the process — re-logging each batch would bury real noise
          if (loggedOrphans.add(m))
            System.err.println(s"[graft] fold gate: marker batch $m has no " +
              s"replay guard after ${evalN - firstUnguarded.get(m)} further " +
              "batches — treating as an orphan of a dead batch numbering " +
              "(folds resume; this numbering will never replay the id, so " +
              "there is no in-flight rewrite for a fold to race)")
        }
        val inFlight = (unguarded -- orphans).nonEmpty
        if (!inFlight) {
          if (lexCompactEvery > 0 &&
              LexIndex.hasCommittedSegments(spark, lexBase)) {
            if (LexIndex.tailSegmentCount(spark, lexBase) >= lexCompactEvery)
              LexIndex.compactTakedownServing(spark, lexBase)
            LexIndex.pruneTakedownCompacted(spark, lexBase)
          }
          if (annCompactEvery > 0) {
            Pq.foldPqTakedownIfDue(spark, annBase, annCompactEvery,
              annServedIds(None))
            Pq.prunePqTakedownFolded(spark, annBase, annServedIds(None))
          }
        }: Unit
      }
      .start()
  }

  /** CONTINUOUS PACKED-STORE MAINTENANCE WITH IN-BAND TAKEDOWNS
    * (st27): n112's packed-training-shard store kept current by a
    * CDC feed — (doc_id, source, text, op ∈ add|del) — so a takedown
    * request flows from the stream to the training artifact with no
    * batch job in between (the last mile of the RTBF axis, in lane
    * form). Dels carry their shard (`source`): the feed is emitted by
    * the corpus system, which knows it — an id-only takedown goes
    * through [[graft.operators.Corpus.takedownPackedShards]]'s corpus
    * lookup instead.
    *
    * Per micro-batch: adds land in the doc store (`docs/<id>`) and
    * ALL ops in the log (`ops/<id>`); the batch's TOUCHED shards
    * (distinct `source` over adds ∪ dels — packing crosses doc
    * boundaries, so any membership change repacks the whole shard)
    * are rebuilt from the liveness-resolved corpus view (last-op-wins
    * over the accumulated ops log, each live doc's text from its
    * latest add batch — a re-add/edit is an upsert) via
    * [[graft.operators.Corpus.repackShards]]'s dynamic partition
    * overwrite; untouched shards keep their exact bytes. Snapshot
    * results (the full store listing + `n_affected` evidence) write
    * to `results/<id>`, marker LAST — a crash anywhere leaves the
    * batch invisible and exactly replayable (the repack is
    * content-idempotent).
    *
    * Scale: the repack is touched-shards-only — takedown/ingest-
    * traffic-sized, never corpus-sized (n112's 0.08 ladder exponent
    * is this claim in number form); the liveness fold is the shared
    * [[graft.operators.LexIndex.livenessOf]] over id-keyed ops; at
    * rest the doc store would be partitioned by shard so the
    * affected-shard scan partition-prunes. */
  def packedIngestWithTakedown(ops: DataFrame, basePath: String,
      checkpointDir: String,
      blockLen: Long = 512L): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.{Corpus, LexIndex}
    ops.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val fs = new org.apache.hadoop.fs.Path(basePath)
          .getFileSystem(spark.sessionState.newHadoopConf())
        val marker = new org.apache.hadoop.fs.Path(
          s"$basePath/_committed_batch_$batchId")
        if (!fs.exists(marker) && !batch.isEmpty) {
          batch.filter(col("op") === "add")
            .select("doc_id", "source", "text")
            .write.mode("overwrite").parquet(s"$basePath/docs/$batchId")
          batch.select("doc_id", "op")
            .write.mode("overwrite").parquet(s"$basePath/ops/$batchId")
          val ids = (fs.listStatus(new org.apache.hadoop.fs.Path(basePath))
            .map(_.getPath.getName)
            .filter(_.startsWith("_committed_batch_"))
            .map(_.stripPrefix("_committed_batch_"))
            .filter(s0 => s0.nonEmpty && s0.forall(_.isDigit))
            .map(_.toLong).toSeq :+ batchId).distinct.sorted
          val docsAll = ids.map(i => spark.read.parquet(s"$basePath/docs/$i")
              .withColumn("batch", lit(i)))
            .reduce(_ unionByName _)
          val alive = LexIndex.opsLogLiveness(spark, basePath, ids)
            .filter(col("last_add").isNotNull &&
              (col("last_del").isNull || col("last_add") >= col("last_del")))
            .select(col("doc_id"), col("last_add").as("batch"))
          val live = docsAll.join(alive, Seq("doc_id", "batch"))
            .select("doc_id", "source", "text")
          val affected = batch.select("source").distinct()
            .collect().map(_.getString(0)).sorted
          Corpus.repackShards(spark, basePath, live, affected.toSeq, blockLen)
          Corpus.readPackedShards(spark, basePath)
            .select(lit(batchId).as("snap"),
              lit(affected.length.toLong).as("n_affected"),
              col("source"), col("example_idx"), col("n_tokens"),
              col("n_docs"), col("block_fp"))
            .write.mode("overwrite").parquet(s"$basePath/results/$batchId")
          fs.create(marker, true).close()
        }: Unit
      }
      .start()
  }

  /** STREAMING EMBEDDING-DRIFT MONITOR (st17): the production form of
    * n103's audit — per micro-batch, accumulate each dimension's
    * EXACT sufficient statistics (DECIMAL sum + count: 64 rows per
    * batch, additive and order-free) and emit the per-dimension drift
    * of the arrived corpus against the FIRST batch's means (the
    * snapshot st16's frozen configuration was trained on — this lane
    * is the trigger that tells the retrain, n102, when to fire).
    *
    * Because the per-dim sums are DECIMAL-exact, the incremental
    * accumulation equals a full recompute over the arrived prefix
    * bit-for-bit — which is exactly what the batch twin hash-attests
    * per snapshot. State at rest is segments of 64 (dim, sum, cnt)
    * rows under marker-last commits (the st15 rule: torn batches
    * invisible, replays overwrite the same dirs); per-commit cost is
    * one explode+aggregate over the BATCH plus a 64-row fold of the
    * committed segments. */
  def embeddingDriftIngest(vecs: DataFrame, basePath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val fs = new org.apache.hadoop.fs.Path(basePath)
          .getFileSystem(spark.sessionState.newHadoopConf())
        val marker = new org.apache.hadoop.fs.Path(
          s"$basePath/_committed_batch_$batchId")
        if (!fs.exists(marker) && !batch.isEmpty) {
          batch.select(posexplode(col("embedding")))
            .select((col("pos") + 1).cast("long").as("dim"),
              col("col").cast("double").as("x"))
            .groupBy("dim")
            .agg(sum(col("x").cast("decimal(25,6)")).as("s"),
              count(lit(1)).as("cnt"))
            .write.mode("overwrite").parquet(s"$basePath/segs/$batchId")
          // committed segment ids (this batch's marker lands last, so
          // include it explicitly); base = the LOWEST committed id —
          // the first batch that ever arrived
          val ids = (fs.listStatus(new org.apache.hadoop.fs.Path(basePath))
            .map(_.getPath.getName)
            .filter(_.startsWith("_committed_batch_"))
            .map(_.stripPrefix("_committed_batch_"))
            .filter(s => s.nonEmpty && s.forall(_.isDigit))
            .map(_.toLong).toSeq :+ batchId).distinct.sorted
          def meansOf(segIds: Seq[Long]) =
            segIds.map(i => spark.read.parquet(s"$basePath/segs/$i"))
              .reduce(_.unionByName(_))
              .groupBy("dim")
              .agg((sum(col("s")).cast("double") / sum(col("cnt"))).as("m"))
          val cur = meansOf(ids)
          val base = meansOf(Seq(ids.min)).withColumnRenamed("m", "mb")
          cur.join(base, Seq("dim"))
            .select(lit(batchId).as("snap"), col("dim"),
              graft.Det.round6(col("mb")).as("mean_base"),
              graft.Det.round6(col("m")).as("mean_cur"),
              graft.Det.round6(col("m") - col("mb")).as("drift"))
            .write.mode("overwrite").parquet(s"$basePath/results/$batchId")
          fs.create(marker, true).close()
        }: Unit
      }
      .start()
  }

  /** DRIFT-GATED ANN SERVING (st18): the drift→retrain loop end-to-end
    * in streaming form — st17's monitor GATING st16's serving lane in
    * ONE pipeline (n106 is the batch form). Per micro-batch:
    *
    *   1. persist the batch's raw vectors (`vecs/<id>` — the corpus
    *      store a retrain reads) and its DECIMAL-exact per-dimension
    *      drift segment (`segs/<id>`, st17's 64 additive rows);
    *   2. fold the committed segments into the arrived corpus's
    *      per-dim means and compare against the FIRST batch's — the
    *      trigger is the L∞ of the round6'd drifts, bit-identical to
    *      a full recompute by DECIMAL additivity;
    *   3. if the trigger crosses `threshold`, RETRAIN: rebuild the
    *      whole configuration from the at-rest corpus at a fresh path
    *      `index_r<id>` (fold-to-fresh + marker — n105's swap shape;
    *      deterministic from at-rest inputs, so replay is idempotent
    *      by construction) and serve from it; later unfired batches
    *      append to the NEWEST retrained tree;
    *   4. otherwise train-on-first/append under the current frozen
    *      configuration (st16's arms, including its replay-stable
    *      trainer marker) and serve the accumulated index.
    *
    * Every commit's served rows carry the gate's evidence (fired,
    * trig) — StreamingSpec proves the three-batch MemoryStream run
    * equals the st18 batch twin at every snapshot, where the DuckDB
    * twin re-derives trigger AND both arms per prefix and selects by
    * the same comparison. */
  def driftGatedPqServingIngest(vecs: DataFrame, queries: DataFrame,
      basePath: String, checkpointDir: String,
      threshold: Double = graft.operators.Pq.DriftServeThreshold,
      k: Int = 5): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.Pq
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val fs = new org.apache.hadoop.fs.Path(basePath)
          .getFileSystem(spark.sessionState.newHadoopConf())
        val marker = new org.apache.hadoop.fs.Path(
          s"$basePath/_served_batch_$batchId")
        if (!fs.exists(marker) && !batch.isEmpty) {
          batch.write.mode("overwrite").parquet(s"$basePath/vecs/$batchId")
          batch.select(posexplode(col("embedding")))
            .select((col("pos") + 1).cast("long").as("dim"),
              col("col").cast("double").as("x"))
            .groupBy("dim")
            .agg(sum(col("x").cast("decimal(25,6)")).as("s"),
              count(lit(1)).as("cnt"))
            .write.mode("overwrite").parquet(s"$basePath/segs/$batchId")
          def committed(prefix: String): Seq[Long] =
            fs.listStatus(new org.apache.hadoop.fs.Path(basePath))
              .map(_.getPath.getName).filter(_.startsWith(prefix))
              .map(_.stripPrefix(prefix))
              .filter(s => s.nonEmpty && s.forall(_.isDigit))
              .map(_.toLong).toSeq
          val ids = (committed("_served_batch_") :+ batchId).distinct.sorted
          def meansOf(segIds: Seq[Long]) =
            segIds.map(i => spark.read.parquet(s"$basePath/segs/$i"))
              .reduce(_.unionByName(_))
              .groupBy("dim")
              .agg((sum(col("s")).cast("double") / sum(col("cnt"))).as("m"))
          val trig = meansOf(ids)
            .join(meansOf(Seq(ids.min)).withColumnRenamed("m", "mb"), Seq("dim"))
            .agg(max(abs(graft.Det.round6(col("m") - col("mb")))))
            .collect()(0).getDouble(0)
          val fired = trig > threshold
          val idx =
            if (fired) {
              // retrain over EVERYTHING arrived, at a fresh path —
              // deterministic from the at-rest corpus, so an
              // at-least-once replay rebuilds the identical tree
              val all = ids.map(i => spark.read.parquet(s"$basePath/vecs/$i"))
                .reduce(_.unionByName(_))
              val rPath = s"$basePath/index_r$batchId"
              Pq.writePqIndex(Pq.buildPqIndex(all), rPath)
              fs.create(new org.apache.hadoop.fs.Path(
                s"$basePath/_retrained_batch_$batchId"), true).close()
              Pq.readPqIndex(spark, rPath)
            } else {
              // the current tree: the newest retrained one if any
              // retrain has committed, else the frozen base tree
              val idxPath = committed("_retrained_batch_").maxOption
                .map(r => s"$basePath/index_r$r")
                .getOrElse(s"$basePath/index")
              val trained = new org.apache.hadoop.fs.Path(
                s"$basePath/_trained_batch_$batchId")
              if (!Pq.hasPqIndex(spark, idxPath)) {
                fs.create(trained, true).close()
                Pq.writePqIndex(Pq.buildPqIndex(batch), idxPath)
              } else if (!fs.exists(trained))
                Pq.appendToPqIndex(batch, idxPath, label = s"a$batchId")
              Pq.readPqIndex(spark, idxPath)
            }
          Pq.searchPqIndex(queries, idx, k = k)
            .select(lit(batchId).as("snap"),
              lit(if (fired) 1L else 0L).as("fired"), lit(trig).as("trig"),
              col("q_id"), col("nb_id"), col("adc"), col("rn"))
            .write.mode("overwrite").parquet(s"$basePath/results/$batchId")
          fs.create(marker, true).close()
        }: Unit
      }
      .start()
  }

  /** Custom stateful sessionization via flatMapGroupsWithState with an
    * event-time timeout — emits a session once `gapMinutes` of event
    * time passes with no activity (the hand-rolled analog of
    * session_window, showing arbitrary per-key state). */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stateEnc = Encoders.product[SessionAcc]
    implicit val keyEnc = Encoders.scalaLong
    val gapMs = gapMinutes * 60000L

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAcc, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionAcc]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, new Timestamp(s.startMs),
              new Timestamp(s.endMs), s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var acc = state.getOption.orNull
            val out = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              if (acc == null) acc = SessionAcc(t, t, 0, 0.0)
              else if (t - acc.endMs >= gapMs) {
                out += SessionOut(userId, new Timestamp(acc.startMs),
                  new Timestamp(acc.endMs), acc.n, acc.total)
                acc = SessionAcc(t, t, 0, 0.0)
              }
              acc = acc.copy(endMs = math.max(acc.endMs, t),
                n = acc.n + 1, total = acc.total + e.value)
            }
            state.update(acc)
            state.setTimeoutTimestamp(acc.endMs + gapMs)
            out.result().iterator
          }
      }
  }

  final case class SessionAcc(startMs: Long, endMs: Long, n: Int, total: Double)

  final case class PackTok(tok: String, doc: Long)
  final case class PackState(toks: Seq[PackTok], nextIdx: Long)
  final case class PackedBlock(source: String, example_idx: Long,
      n_tokens: Long, n_docs: Long, block_fp: String)

  /** STREAMING sequence packing (st12's stream side): the n82
    * concat-and-chunk materialization as arrival-time state — each
    * shard accumulates its token stream (docs + EOS sentinels, within
    * a micro-batch in doc_id order) and EMITS every example the moment
    * it reaches exactly `blockLen` tokens; the partial tail stays in
    * state for the next batch (a production packer flushes it at epoch
    * end). Blocks cross document AND micro-batch boundaries.
    *
    * Scale/semantics: per-shard state is at most blockLen − 1 buffered
    * (token, doc_id) pairs — bounded by construction, no watermark
    * needed (NoTimeout; nothing is ever dropped, only carried).
    * Emission is append-final: an example's content is fixed the
    * instant it fills, so re-deliveries cannot restate it. The batch
    * twin is n82 restricted to FULL blocks (`st12_stream_pack`);
    * StreamingSpec proves stream == twin both single-batch and with
    * the corpus split across two batches. */
  def streamingPack(docs: DataFrame, blockLen: Int,
      eos: String = "<eos>"): Dataset[PackedBlock] = {
    require(blockLen > 0, s"block length must be positive, got $blockLen")
    implicit val inEnc = Encoders.product[(String, Long, String)]
    implicit val outEnc = Encoders.product[PackedBlock]
    implicit val stateEnc = Encoders.product[PackState]
    implicit val keyEnc = Encoders.STRING
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    docs.select(col("source"), col("doc_id"), col("text")).as[(String, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[PackState, PackedBlock](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, rows: Iterator[(String, Long, String)],
            state: GroupState[PackState]) =>
          val sorted = rows.toSeq.sortBy(_._2)
          val st = state.getOption.getOrElse(PackState(Vector.empty, 0L))
          var buf = st.toks.toVector
          var idx = st.nextIdx
          val out = Seq.newBuilder[PackedBlock]
          sorted.foreach { case (_, id, text) =>
            buf = buf ++ (text.split(" ", -1).toVector :+ eos).map(PackTok(_, id))
            while (buf.size >= blockLen) {
              val (blk, rest) = buf.splitAt(blockLen)
              out += PackedBlock(src, idx, blockLen.toLong,
                blk.map(_.doc).distinct.size.toLong,
                md5hex(blk.map(_.tok).mkString(" ")))
              idx += 1
              buf = rest
            }
          }
          state.update(PackState(buf, idx))
          out.result().iterator
      }
  }

  /** Watermarked stream–stream interval join: each left event pairs
    * with right events for the same user within `[0, windowMinutes]`
    * AFTER it (attribution-style). Both sides carry watermarks so
    * Spark bounds the join state — without the interval condition +
    * watermarks a stream-stream join would buffer forever; with them,
    * state older than the watermark horizon is evicted (the only
    * memory-safe shape at 100 TB/day ingest). */
  def attributionJoin(left: DataFrame, right: DataFrame,
      watermark: String = "10 minutes",
      windowMinutes: Int = 10): DataFrame = {
    // PERF guard rail (VERDICT r14 #3): output-quadratic in a hot
    // key's density (measured exponent 1.42 at one skew decade) —
    // PlanLintSpec pins the catalog's user set to st04 alone
    graft.PerfGuards.record(graft.PerfGuards.AllPairsAttribution)
    val l = left.withWatermark("ts", watermark)
      .select(col("event_id").as("l_id"), col("user_id"),
        col("ts").as("l_ts"), col("value").as("l_value"))
    val r = right.withWatermark("ts", watermark)
      .select(col("event_id").as("r_id"), col("user_id").as("r_user"),
        col("ts").as("r_ts"), col("value").as("r_value"))
    l.join(r,
      col("user_id") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("l_id"), col("r_id"), col("user_id"),
        col("l_ts"), col("r_ts"), col("l_value"), col("r_value"))
  }

  final case class LastClick(ts: Timestamp)
  final case class AttributionOut(event_id: Long, user_id: Long,
      purchase_ts: Timestamp, click_ts: Timestamp, p_value: Double)

  /** LAST-CLICK attribution as a streaming operator with O(1) per-key
    * state — st28's lane form, and the state-bounding answer to the
    * measured st04 skew-killer (PERF.md round 14: the all-pairs
    * window join reads exponent 1.42 at one skew decade because a hot
    * user's clicks×purchases pair set — and the join's per-key
    * buffer — grows with the square of the key's density). Here the
    * per-user state is exactly ONE latest-click-timestamp register:
    * each purchase is assigned to the single latest click within the
    * backward `windowMinutes`, so output is purchase-proportional and
    * state is constant per key no matter how hot the key runs.
    *
    * Delivery contract: per-user event-time order ACROSS micro-batches
    * (the compacted-CDC / per-key-ordered-log shape; time-split
    * batches of a replayed log satisfy it); WITHIN a batch the group
    * is sorted by event time here, so intra-batch arrival order is
    * free — the bounded quantity is the key's per-batch volume, not
    * its history: the `rows.toSeq` sort buffers ONE key's ONE batch
    * slice per task (sized by the micro-batch trigger, the knob the
    * operator cannot see), while the cross-batch state stays a single
    * register — GiantInputSpec drives a million-event key through in
    * 250k-row batches and pins `numRowsTotal == 1` from the state
    * store. Same-timestamp click-then-purchase resolves click
    * first (ASOF `>=`, j10's tie rule); only click_ts is emitted, so
    * same-timestamp click ties cannot make the answer
    * nondeterministic. StreamingSpec proves the MemoryStream run
    * equals the st28 batch twin (the DuckDB-oracled ASOF form) with
    * cross-batch attributions present.
    *
    * `retention` bounds TOTAL state over the stream's lifetime (the
    * per-key register is O(1), but without eviction the store grows
    * with cumulative user cardinality — a register older than the
    * window can never attribute anything). With retention set, each
    * register carries an event-time timeout at (click ts + retention);
    * when the stream's watermark passes it the register is dropped.
    * `retention` must be ≥ the attribution window (enforced) plus the
    * source's event-time lateness (the caller's contract, like every
    * watermarked operator): then a dropped register could only have
    * attributed purchases whose window had already expired, so the
    * answer is unchanged — StreamingSpec pins output equality with
    * and without retention on time-split batches. */
  def lastClickAttribution(events: DataFrame,
      windowMinutes: Int = 60,
      retention: Option[String] = None,
      watermark: String = "0 seconds"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    implicit val stEnc = Encoders.product[LastClick]
    implicit val outEnc = Encoders.product[AttributionOut]
    val winMs = windowMinutes * 60000L
    val withRet = retention.isDefined
    val retMs = retention.map(durationMs).getOrElse(0L)
    require(!withRet || retMs >= winMs,
      s"retention ($retMs ms) must cover the attribution window ($winMs ms): " +
        "an earlier eviction would drop still-attributable clicks")
    val srcDf = events
      .select(col("event_id"), col("user_id"),
        col("ts").cast("timestamp").as("ts"), col("event_type"),
        col("value"))
    val src = (if (withRet) srcDf.withWatermark("ts", watermark) else srcDf)
      .as(Encoders.product[(Long, Long, Timestamp, String, Double)])
    src.groupByKey(_._2)
      .flatMapGroupsWithState[LastClick, AttributionOut](
        OutputMode.Update,
        if (withRet) GroupStateTimeout.EventTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long, Timestamp, String, Double)],
            state: GroupState[LastClick]) =>
          if (withRet && state.hasTimedOut) {
            // watermark passed (click ts + retention): the register's
            // attribution window expired strictly earlier — drop it
            state.remove()
            Iterator.empty
          } else {
            var last = state.getOption.orNull
            val out = List.newBuilder[AttributionOut]
            // event-time order; clicks before purchases at equal ts
            // (sort key: purchases rank 1), event_id tiebreak
            rows.toSeq.sortBy(e =>
              (e._3.getTime, if (e._4 == "purchase") 1 else 0, e._1))
              .foreach { case (id, _, ts, kind, value) =>
                if (kind == "click") last = LastClick(ts)
                else if (kind == "purchase" && last != null &&
                    ts.getTime >= last.ts.getTime &&
                    ts.getTime <= last.ts.getTime + winMs)
                  out += AttributionOut(id, user, ts, last.ts, value)
              }
            if (last != null) {
              state.update(last)
              // the +1 guard keeps the timeout legal when click ts +
              // retention is already behind the current watermark
              if (withRet) state.setTimeoutTimestamp(
                math.max(last.ts.getTime + retMs,
                  state.getCurrentWatermarkMs + 1))
            }
            out.result().iterator
          }
      }.toDF()
  }

  /** The reference's minute-cadence pipeline as a real streaming query
    * (T1/T5, gtfs_rt_assets.py:253-257 → Trigger-driven): file stream →
    * enrich with time buckets → foreachBatch writing the Hive-
    * partitioned store + one ledger row per micro-batch (K1/K2).
    * Trigger.AvailableNow (the default) drains what exists and stops —
    * the spec's (and a cron-driven deployment's) natural mode; pass
    * `continuousEvery = Some("1 minute")` for the reference's
    * long-running minute cadence (gtfs_rt_assets.py:253-257 cron
    * `* * * * *`, default RUNNING) as a ProcessingTime trigger that
    * keeps polling the source. */
  def snapshotPipeline(
      spark: org.apache.spark.sql.SparkSession,
      inputDir: String,
      schema: org.apache.spark.sql.types.StructType,
      dataDir: String,
      ledgerDir: String,
      checkpointDir: String,
      continuousEvery: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.streaming.Trigger
    val stream = spark.readStream.schema(schema).parquet(inputDir)
      .withColumn("year", year(col("ts")))
      .withColumn("month", month(col("ts")))
      .withColumn("day", dayofmonth(col("ts")))
      .withColumn("hour", hour(col("ts")))
    // Steady-state O(1) idempotence: the ledger is only consulted for
    // batch ids this PROCESS hasn't committed (i.e. the replayed epoch
    // right after a restart); afterwards the in-memory high-water mark
    // short-circuits — the per-batch cost must not grow with ledger
    // size under a minute cadence.
    var lastCommitted = -1L
    stream.writeStream
      .trigger(continuousEvery
        .map(Trigger.ProcessingTime(_))
        .getOrElse(Trigger.AvailableNow()))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId > lastCommitted) {
          appendSnapshotBatch(batch, batchId, dataDir, ledgerDir,
            probeLedger = lastCommitted < 0)
          lastCommitted = batchId
        }: Unit
      }
      .start()
  }

  /** One micro-batch append, IDEMPOTENT under foreachBatch's
    * at-least-once replay contract: the ledger is the commit log —
    * a batchId that already has a ledger row was fully committed, so
    * the replay is skipped instead of double-appending data. Data rows
    * carry the batch_id column, so a crash between the data append and
    * the ledger append leaves ATTRIBUTABLE orphans that
    * `GtfsPipeline.recoverOrphanData` removes. `probeLedger = false`
    * skips the ledger lookup when the caller already knows the id is
    * new (the steady-state path). Returns true if written, false if
    * skipped. */
  def appendSnapshotBatch(batch: DataFrame, batchId: Long,
      dataDir: String, ledgerDir: String,
      probeLedger: Boolean = true): Boolean = {
    if (batch.isEmpty) return false
    val spark = batch.sparkSession
    if (probeLedger &&
      graft.pipeline.GtfsPipeline.isCommitted(spark, ledgerDir, batchId))
      return false
    batch.withColumn("batch_id", lit(batchId))
      .write.mode("append")
      .partitionBy("year", "month", "day", "hour").parquet(dataDir)
    val stats = batch.agg(
      count(lit(1)).as("record_count"),
      min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"))
      .withColumn("batch_id", lit(batchId))
    stats.write.mode("append").parquet(ledgerDir)
    true
  }
}
