package graft

import java.sql.Timestamp

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, expr, min}
import org.apache.spark.sql.streaming.OutputMode

/** Structured Streaming semantics: watermarks, late-data drop,
  * stateful dedup, custom sessionization (SURVEY.md §2.9, §5.2 #5). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def runToMemory(name: String)(build: MemoryStream[Event] => org.apache.spark.sql.DataFrame)(
      batches: Seq[Seq[Event]]): Seq[org.apache.spark.sql.Row] = {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Event]
    val q = build(input).writeStream
      .format("memory").queryName(name).outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(name).collect().toSeq
    } finally q.stop()
  }

  test("tumbling window with watermark drops late rows, emits closed windows") {
    val rows = runToMemory("tumbling")(in =>
      StreamingOps.tumblingCounts(in.toDF(), "10 minutes", "5 minutes"))(Seq(
      Seq(
        Event(1, ts("2024-01-01 00:01:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 00:02:00"), 1, "click", 2.0)),
      // advance watermark far past the first window
      Seq(Event(3, ts("2024-01-01 01:00:00"), 2, "view", 1.0)),
      // this event is an hour late — beyond the watermark, dropped
      Seq(Event(4, ts("2024-01-01 00:03:00"), 1, "click", 4.0)),
      Seq(Event(5, ts("2024-01-01 02:00:00"), 2, "view", 1.0))))
    val closed = rows.find(r => r.getAs[String]("event_type") == "click")
    assert(closed.isDefined, "first window must have been finalized")
    assert(closed.get.getAs[Long]("n") == 2, "late row must not count")
    assert(closed.get.getAs[Double]("total") == 3.0)
  }

  test("dropDuplicatesWithinWatermark suppresses redelivery") {
    val e = Event(10, ts("2024-01-01 00:00:00"), 1, "click", 1.0)
    val rows = runToMemory("dedup")(in =>
      StreamingOps.dedupByIdWithWatermark(in.toDF()))(Seq(
      Seq(e), Seq(e.copy(value = 99.0)), // same event_id redelivered
      Seq(Event(11, ts("2024-01-01 00:01:00"), 1, "click", 2.0))))
    assert(rows.map(_.getAs[Long]("event_id")).sorted == Seq(10L, 11L))
  }

  test("flatMapGroupsWithState sessionization: gap split + event-time timeout") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = StreamingOps.sessionize(
      input.toDS().withWatermark("ts", "0 seconds").as[Event], gapMinutes = 30)
    val q = sessions.toDF().writeStream
      .format("memory").queryName("sessions").outputMode(OutputMode.Append).start()
    try {
      input.addData(Seq(
        Event(1, ts("2024-01-01 00:00:00"), 7, "click", 1.0),
        Event(2, ts("2024-01-01 00:10:00"), 7, "click", 2.0)))
      q.processAllAvailable()
      // next event 45 min later: inside the same micro-batch group
      // processing, the session splits on the 30-min gap
      input.addData(Seq(Event(3, ts("2024-01-01 01:00:00"), 7, "click", 4.0)))
      q.processAllAvailable()
      // watermark moves past the timeout → second session flushes
      input.addData(Seq(Event(4, ts("2024-01-01 03:00:00"), 8, "view", 1.0)))
      q.processAllAvailable()
      val rows = spark.table("sessions").collect()
      val first = rows.find(_.getAs[Long]("user_id") == 7L).get
      assert(first.getAs[Int]("n_events") == 2)
      assert(first.getAs[Double]("total") == 3.0)
      assert(first.getAs[Timestamp]("end") == ts("2024-01-01 00:10:00"))
    } finally q.stop()
  }

  test("stream-stream interval join: purchase matched to clicks within the window") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val c = clicks.toDF().withWatermark("ts", "1 hour")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    val p = purchases.toDF().withWatermark("ts", "1 hour")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
    val joined = p.join(c,
      expr("""p_user = c_user AND
             |c_ts BETWEEN p_ts - INTERVAL 30 MINUTES AND p_ts""".stripMargin))
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(Seq(
        Event(1, ts("2024-01-01 10:00:00"), 7, "click", 0),
        Event(2, ts("2024-01-01 10:50:00"), 7, "click", 0),
        Event(3, ts("2024-01-01 09:00:00"), 7, "click", 0)))
      purchases.addData(Seq(Event(100, ts("2024-01-01 11:00:00"), 7, "purchase", 1)))
      q.processAllAvailable()
      // advance both watermarks so results finalize
      clicks.addData(Seq(Event(4, ts("2024-01-01 14:00:00"), 9, "click", 0)))
      purchases.addData(Seq(Event(101, ts("2024-01-01 14:00:00"), 9, "purchase", 1)))
      q.processAllAvailable()
      val rows = spark.table("ssj")
        .filter(col("purchase_id") === 100).collect()
      // only the 10:50 click is within [10:30, 11:00]
      assert(rows.map(_.getAs[Long]("click_id")).toSet == Set(2L))
    } finally q.stop()
  }

  test("attributionJoin library op: forward-window pairing, watermark-bounded state") {
    implicit val sq = spark.sqlContext
    val impressions = MemoryStream[Event]
    val conversions = MemoryStream[Event]
    val joined = StreamingOps.attributionJoin(
      impressions.toDF(), conversions.toDF(),
      watermark = "5 minutes", windowMinutes = 10)
    val q = joined.writeStream.format("memory").queryName("attr")
      .outputMode(OutputMode.Append).start()
    try {
      impressions.addData(Seq(
        Event(1, ts("2024-01-01 10:00:00"), 7, "imp", 0),
        Event(2, ts("2024-01-01 10:20:00"), 7, "imp", 0),
        Event(3, ts("2024-01-01 10:00:00"), 8, "imp", 0)))
      conversions.addData(Seq(
        Event(100, ts("2024-01-01 10:05:00"), 7, "conv", 5.0), // within 1's window
        Event(101, ts("2024-01-01 10:25:00"), 7, "conv", 2.0), // within 2's only
        Event(102, ts("2024-01-01 10:30:00"), 9, "conv", 1.0))) // no impression
      q.processAllAvailable()
      // push watermarks forward to finalize
      impressions.addData(Seq(Event(4, ts("2024-01-01 12:00:00"), 1, "imp", 0)))
      conversions.addData(Seq(Event(103, ts("2024-01-01 12:00:00"), 1, "conv", 0)))
      q.processAllAvailable()
      val pairs = spark.table("attr")
        .select("l_id", "r_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((1L, 100L))) // 10:00 imp → 10:05 conv
      assert(pairs.contains((2L, 101L))) // 10:20 imp → 10:25 conv
      assert(!pairs.exists(_._2 == 102L)) // unattributed conversion dropped
      assert(!pairs.contains((2L, 100L)), "conv before the impression must not match")
    } finally q.stop()
  }

  test("streaming normalized dedup drops whitespace/case mutants of seen docs") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val out = StreamingOps.dedupNormalizedWithWatermark(docs, "1 hour")
    val q = out.writeStream.format("memory").queryName("sdedup")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Seq(
        (1L, ts("2024-01-01 10:00:00"), "Hello  World"),
        (2L, ts("2024-01-01 10:00:05"), "hello world"),   // mutant of 1
        (3L, ts("2024-01-01 10:00:10"), " HELLO   world "), // mutant of 1
        (4L, ts("2024-01-01 10:00:15"), "different doc")))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("sdedup").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids.size == 2)
    assert(ids.contains(4L))
    assert((ids - 4L).subsetOf(Set(1L, 2L, 3L))) // exactly one of the mutants
  }

  test("streaming near-dup slice equals its batch twin on a planted dup stream") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("neardup_slice").toString
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val slice = StreamingOps.nearDupSlice(docs,
      s"$dir/survivors", s"$dir/ckpt", threshold = 0.6, watermark = "1 hour")
    // pairs() before any committed batch: empty frame, not a crash
    assert(slice.pairs().count() == 0)
    def words(tag: Int, n: Int) = (0 until n).map(w => s"t${tag}_$w").mkString(" ")
    // 10/11 and 20/21 are near-dups (12 words, last differs: jac = 8/12);
    // 12 and 22 are exact-mutant redeliveries tier 1 must kill; the rest
    // are unrelated.
    val base10 = words(10, 11); val base20 = words(20, 11)
    try {
      input.addData(Seq(
        (10L, ts("2024-01-01 10:00:00"), s"$base10 endA"),
        (11L, ts("2024-01-01 10:00:01"), s"$base10 endB"),
        (12L, ts("2024-01-01 10:00:02"), s"  $base10 ENDA "),
        (30L, ts("2024-01-01 10:00:03"), words(30, 12))))
      slice.query.processAllAvailable()
      input.addData(Seq(
        (20L, ts("2024-01-01 10:10:00"), s"$base20 endA"),
        (21L, ts("2024-01-01 10:10:01"), s"$base20 endB"),
        (22L, ts("2024-01-01 10:10:02"), s"${base20.toUpperCase} endA"),
        (31L, ts("2024-01-01 10:10:03"), words(31, 12))))
      slice.query.processAllAvailable()
    } finally slice.query.stop()

    val survivors = spark.read.parquet(s"$dir/survivors")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == Set(10L, 11L, 20L, 21L, 30L, 31L),
      s"tier-1 survivors wrong: $survivors")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getAs[Double]("jac") * 1e9))).toSet
    val streamed = pairSet(slice.pairs())
    // batch twin over the same raw rows: normalized dedup keeping the
    // first (= min id, matching arrival order) then the same LSH
    val raw = Seq(
      (10L, s"$base10 endA"), (11L, s"$base10 endB"), (12L, s"  $base10 ENDA "),
      (30L, words(30, 12)), (20L, s"$base20 endA"), (21L, s"$base20 endB"),
      (22L, s"${base20.toUpperCase} endA"), (31L, words(31, 12)))
      .toDF("doc_id", "text")
    val kept = raw.groupBy(graft.Det.normFingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .join(raw, Seq("doc_id"))
      .select("doc_id", "text")
    val batch = pairSet(graft.operators.Dedup.nearDuplicatePairs(kept, 0.6))
    assert(streamed == batch, s"stream=$streamed batch=$batch")
    assert(streamed.map(t => (t._1, t._2)) == Set((10L, 11L), (20L, 21L)))
  }

  test("stateful streaming LSH equals the st05 batch twin across micro-batches") {
    implicit val sq = spark.sqlContext
    import graft.api.Graft._
    // the planted multi-batch stream: st05's own tier-1 survivor corpus,
    // delivered in three micro-batches
    val kept = Tables(spark, sf0001).documents
      .distinctDocuments(normalize = true)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val chunks = kept.grouped((kept.length + 2) / 3).toSeq
    assert(chunks.length == 3)

    val input = MemoryStream[(Long, String)]
    val q = StreamingOps.streamingNearDupPairs(
      input.toDF().toDF("doc_id", "text"), threshold = 0.6)
      .writeStream.format("memory").queryName("incr_lsh")
      .outputMode(OutputMode.Update).start()
    val perBatch = scala.collection.mutable.ArrayBuffer.empty[Long]
    try {
      chunks.foreach { c =>
        input.addData(c.toSeq); q.processAllAvailable()
        perBatch += spark.table("incr_lsh").count()
      }
    } finally q.stop()

    def jmap(rows: Seq[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jac")).toMap
    val streamed = spark.table("incr_lsh").collect().toSeq
    // each pair exactly once across the whole stream
    assert(streamed.map(r => (r.getLong(0), r.getLong(1))).distinct.size == streamed.size,
      "pair emitted more than once")
    // pairs arrived incrementally, not all in the last batch
    assert(perBatch.head > 0 && perBatch.last > perBatch.head,
      s"emission not incremental: $perBatch")
    val batchTwin = jmap(graft.operators.Dedup.nearDuplicatePairs(
      Tables(spark, sf0001).documents.distinctDocuments(normalize = true), 0.6)
      .collect().toSeq)
    assert(jmap(streamed) == batchTwin,
      s"stream ${streamed.size} pairs vs batch ${batchTwin.size}")
  }

  test("streaming LSH: redelivered docs emit nothing new; sig chain matches SQL xxhash64") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    def words(tag: Int, n: Int) = (0 until n).map(w => s"r${tag}_$w").mkString(" ")
    val base = words(1, 11)
    val a = (100L, s"$base endA"); val b = (101L, s"$base endB")
    val input = MemoryStream[(Long, String)]
    val q = StreamingOps.streamingNearDupPairs(
      input.toDF().toDF("doc_id", "text"), threshold = 0.6)
      .writeStream.format("memory").queryName("incr_redeliver")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(Seq(a)); q.processAllAvailable()
      assert(spark.table("incr_redeliver").count() == 0)
      // redelivery of a + the near-dup b: exactly one pair, no self-pair
      input.addData(Seq(a, b)); q.processAllAvailable()
      // a third delivery of both: nothing new
      input.addData(Seq(a, b)); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("incr_redeliver").collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 100L &&
      rows.head.getLong(1) == 101L, rows.mkString(","))

    // pin the row-level hash chain to the batch plan's xxhash64(lit(j), sh):
    // a 3-word doc has exactly one shingle, so sig j IS the chained hash
    val doc = "alpha beta gamma"
    val (sigs, hashes) = graft.operators.Dedup.rowBandSigs(
      graft.operators.Dedup.rowShingles(doc))
    val sqlSigs = (0 until graft.operators.Dedup.numHashes).map { j =>
      spark.sql(s"SELECT xxhash64($j, '$doc')").head().getLong(0)
    }
    assert(sigs.toSeq == sqlSigs, "row-level chain drifted from SQL xxhash64")
    assert(hashes.toSeq ==
      Seq(spark.sql(s"SELECT xxhash64('$doc')").head().getLong(0)))
  }

  test("streaming LSH retention: watermark evicts only stale buckets; live window unaffected") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    def words(tag: Int, n: Int) = (0 until n).map(w => s"e${tag}_$w").mkString(" ")
    val base = words(1, 11)
    // four mutual near-dups (11 shared words, jac = 9/11) spread across
    // the retention horizon, plus two unrelated watermark-driver docs
    val batches: Seq[Seq[(Long, Timestamp, String)]] = Seq(
      Seq((1L, ts("2024-01-01 10:00:00"), s"$base endA")),
      Seq((2L, ts("2024-01-01 10:05:00"), s"$base endB")), // pairs with 1
      Seq((50L, ts("2024-01-01 12:00:00"), words(50, 12))), // watermark → 12:00
      // a second driver batch: eviction fires for buckets with NO data in
      // the batch, so the stale buckets of 1/2 (timeout 10:15) drop HERE
      Seq((51L, ts("2024-01-01 12:00:30"), words(51, 12))),
      Seq((3L, ts("2024-01-01 12:01:00"), s"$base endC")), // history evicted → no pair
      Seq((4L, ts("2024-01-01 12:05:00"), s"$base endD"))) // pairs with live 3
    def run(name: String, retention: String): Set[(Long, Long)] = {
      val input = MemoryStream[(Long, Timestamp, String)]
      val q = StreamingOps.streamingNearDupPairs(
        input.toDF().toDF("doc_id", "ts", "text"), threshold = 0.6,
        retention = Some(retention))
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update).start()
      try batches.foreach { b => input.addData(b); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    // 10-minute retention: docs 1/2 are stale by the time 3 arrives —
    // (1,2) from the live era, (3,4) from the new era, nothing across
    val evicted = run("lsh_ret10m", "10 minutes")
    assert(evicted == Set((1L, 2L), (3L, 4L)), s"got $evicted")
    // 1-day retention, SAME stream: nothing expires, so every mutual
    // pair emits — proving the drop above was eviction, and that the
    // retention path keeps full batch-equivalent recall inside the
    // live window
    val live = run("lsh_ret1d", "1 day")
    assert(live == Set((1L, 2L), (1L, 3L), (1L, 4L),
      (2L, 3L), (2L, 4L), (3L, 4L)), s"got $live")
  }

  test("streaming takedown equals the st14 batch twin across micro-batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val docs = Tables(spark, sf0001).documents
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val phase1 = docs.filter(_._1 % 2 == 0).toSeq
    val deleted = phase1.filter(_._1 % 8 == 0)
    val phase2 = docs.filter(_._1 % 2 == 1).toSeq
    assert(deleted.nonEmpty && phase2.nonEmpty)

    val ins = MemoryStream[(Long, String)]
    val tks = MemoryStream[(Long, String)]
    val q = StreamingOps.streamingNearDupPairsWithTakedown(
      ins.toDF().toDF("doc_id", "text"),
      tks.toDF().toDF("doc_id", "text"), threshold = 0.6)
      .writeStream.format("memory").queryName("tk_lsh")
      .outputMode(OutputMode.Update).start()
    try {
      ins.addData(phase1); q.processAllAvailable()
      tks.addData(deleted); q.processAllAvailable()
      ins.addData(phase2); q.processAllAvailable()
    } finally q.stop()

    def jmap(rows: Seq[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jac")).toMap
    val streamed = spark.table("tk_lsh").collect().toSeq
    assert(streamed.map(r => (r.getLong(0), r.getLong(1))).distinct.size == streamed.size,
      "pair emitted more than once")
    val twin = jmap(Catalog.queries("st14_stream_takedown")(spark, sf0001)
      .collect().toSeq)
    assert(jmap(streamed) == twin,
      s"stream ${streamed.size} pairs vs twin ${twin.size}")
    // the takedown must be load-bearing: without it, the deleted docs'
    // (even, odd) pairs WOULD have emitted
    val unfiltered = graft.operators.Dedup.nearDuplicatePairs(
      Tables(spark, sf0001).documents, 0.6).count()
    assert(twin.size < unfiltered,
      s"no pair actually suppressed ($unfiltered total)")
  }

  test("streaming takedown: tombstone blocks redelivery, content re-arrival accepted") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    def words(tag: Int, n: Int) = (0 until n).map(w => s"t${tag}_$w").mkString(" ")
    val base = words(1, 11)
    val x = (200L, s"$base endX")
    val y = (201L, s"$base endY") // near-dup of x's content
    val z = (202L, s"$base endZ") // near-dup of both
    val ins = MemoryStream[(Long, String)]
    val tks = MemoryStream[(Long, String)]
    val q = StreamingOps.streamingNearDupPairsWithTakedown(
      ins.toDF().toDF("doc_id", "text"),
      tks.toDF().toDF("doc_id", "text"), threshold = 0.6)
      .writeStream.format("memory").queryName("tk_rules")
      .outputMode(OutputMode.Update).start()
    try {
      ins.addData(Seq(x)); q.processAllAvailable()
      // takedown of x, then an at-least-once REDELIVERY of x's insert:
      // the tombstone must outlive the row — no resurrection
      tks.addData(Seq(x)); q.processAllAvailable()
      ins.addData(Seq(x)); q.processAllAvailable()
      // y (x-like content, NEW id) is accepted as new: no pair with the
      // deleted x, and it seeds state — z then pairs with y only
      ins.addData(Seq(y)); q.processAllAvailable()
      assert(spark.table("tk_rules").count() == 0,
        "deleted doc still pairing, or redelivery resurrected it")
      ins.addData(Seq(z)); q.processAllAvailable()
    } finally q.stop()
    val pairs = spark.table("tk_rules").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((201L, 202L)), s"got $pairs")
  }

  test("streaming takedown retention: an expired tombstone stops blocking re-arrival") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    def words(tag: Int, n: Int) = (0 until n).map(w => s"r${tag}_$w").mkString(" ")
    val base = words(1, 11)
    val doc1 = s"$base endP"
    // script: insert 1, take it down, drive the watermark 2 h forward,
    // REDELIVER 1's insert, then insert a near-dup under a new id. With
    // a 10-minute retention the tombstone's bucket evicts before the
    // redelivery (the at-least-once horizon has passed), so doc 1
    // re-enters and pairs with 5; with 1-day retention the tombstone
    // still holds and nothing ever pairs. Same stream, two outcomes —
    // proving expiry is eviction-driven, not a takedown-semantics leak.
    def run(name: String, retention: String): Set[(Long, Long)] = {
      val ins = MemoryStream[(Long, Timestamp, String)]
      val tks = MemoryStream[(Long, Timestamp, String)]
      val q = StreamingOps.streamingNearDupPairsWithTakedown(
        ins.toDF().toDF("doc_id", "ts", "text").select("doc_id", "text", "ts"),
        tks.toDF().toDF("doc_id", "ts", "text").select("doc_id", "text", "ts"),
        threshold = 0.6, retention = Some(retention))
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update).start()
      try {
        ins.addData(Seq((1L, ts("2024-01-01 10:00:00"), doc1)))
        q.processAllAvailable()
        tks.addData(Seq((1L, ts("2024-01-01 10:01:00"), doc1)))
        q.processAllAvailable()
        // two driver batches: watermark moves on the first, eviction of
        // quiet buckets fires on the second (the base lane's pattern)
        ins.addData(Seq((50L, ts("2024-01-01 12:00:00"), words(50, 12))))
        q.processAllAvailable()
        ins.addData(Seq((51L, ts("2024-01-01 12:00:30"), words(51, 12))))
        q.processAllAvailable()
        ins.addData(Seq((1L, ts("2024-01-01 12:01:00"), doc1)))
        q.processAllAvailable()
        ins.addData(Seq((5L, ts("2024-01-01 12:02:00"), s"$base endQ")))
        q.processAllAvailable()
      } finally q.stop()
      spark.table(name).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val expired = run("tk_ret10m", "10 minutes")
    assert(expired == Set((1L, 5L)), s"got $expired")
    val held = run("tk_ret1d", "1 day")
    assert(held == Set.empty, s"got $held")
  }

  test("pq serving ingest: crash between base commit and serve marker replays without duplicating the training batch") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pq_crash").toString
    val e = Tables(spark, sf0001).embeddings
    def third(m: Long) = e.filter(col("vec_id") % 3 === m)
      .collect().map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray))
      .sortBy(_._1).toSeq
    // simulate the lane's own batch-0 crash: trainer marker down, base
    // manifest committed, serve marker ABSENT — the exact torn state
    // ADVICE r11 flagged (hasPqIndex flips truth value mid-replay)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/base"))
    fs.create(new org.apache.hadoop.fs.Path(s"$dir/base/_trained_batch_0"),
      true).close()
    graft.operators.Pq.writePqIndex(
      graft.operators.Pq.buildPqIndex(e.filter(col("vec_id") % 3 === 0)),
      s"$dir/base/index")
    // restart: a fresh checkpoint replays batch 0 with the same data
    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamingOps.pqServingIngest(
      input.toDF().toDF("vec_id", "embedding"),
      e.filter(col("vec_id") < 32), s"$dir/base", s"$dir/ckpt")
    try {
      (0L to 2L).foreach { m =>
        input.addData(third(m)); q.processAllAvailable()
      }
    } finally q.stop()
    // the replayed trainer must NOT have appended a duplicate copy
    val codes = graft.operators.Pq.readPqIndex(spark, s"$dir/base/index").codes
    val duped = codes.groupBy("vec_id", "m").count()
      .filter(col("count") > 1).count()
    assert(duped == 0, s"$duped (vec_id, m) code cells duplicated by replay")
    // and the batch was re-SERVED (marker + results), with the full run
    // still matching the st16 twin — the pre-crash base answers for it
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/base/_served_batch_0")))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("snap", "q_id", "nb_id", "adc", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getLong(4))).toSet
    val served = rows(spark.read.parquet(s"$dir/base/results/*"))
    val twin = rows(Catalog.queries("st16_ann_snapshot_serve")(spark, sf0001))
    assert(served == twin && served.nonEmpty,
      s"served ${served.size} rows vs twin ${twin.size}")
  }

  test("indexedIngest: accepted store stays dup-free while the index grows per batch") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("indexed_ingest").toString
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val q = StreamingOps.indexedIngest(docs, s"$dir/index", s"$dir/ckpt",
      threshold = 0.6, watermark = "1 hour", acceptedDir = Some(s"$dir/accepted"))
    def words(tag: Int, n: Int) = (0 until n).map(w => s"i${tag}_$w").mkString(" ")
    val base = words(10, 11)
    try {
      // batch 1: intra-batch near-dup pair (keep 10) + a clean doc
      input.addData(Seq(
        (10L, ts("2024-01-01 10:00:00"), s"$base endA"),
        (11L, ts("2024-01-01 10:00:01"), s"$base endB"),
        (30L, ts("2024-01-01 10:00:02"), words(30, 12))))
      q.processAllAvailable()
      // batch 2, four event-hours later (tier-1 state for batch 1 is
      // past the watermark, so cross-batch dups reach the INDEX screen):
      // 12 = exact text of 10 → fingerprint hit; 13 = near-dup of 10 →
      // band-probe hit; 31 clean → kept
      input.addData(Seq(
        (12L, ts("2024-01-01 14:00:00"), s"$base endA"),
        (13L, ts("2024-01-01 14:00:01"), s"$base endC"),
        (31L, ts("2024-01-01 14:00:02"), words(31, 12))))
      q.processAllAvailable()
    } finally q.stop()

    val accepted = spark.read.parquet(s"$dir/accepted")
    val ids = accepted.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(10L, 30L, 31L), s"accepted: $ids")
    // invariant: the accepted store has no near-dup pair at threshold
    assert(graft.operators.Dedup.nearDuplicatePairs(accepted, 0.6).count() == 0)
    // the persisted index covers exactly the accepted docs
    val idx = graft.operators.IncrementalDedup.readIndex(spark, s"$dir/index")
    assert(idx.fingerprints.select("doc_id").collect().map(_.getLong(0)).toSet == ids)
    // self-healing replay: re-screening an accepted doc against the
    // grown index yields an empty survivor set (fingerprint self-hit)
    val replayed = accepted.filter(org.apache.spark.sql.functions.col("doc_id") === 10L)
    assert(graft.operators.IncrementalDedup
      .dedupAgainstIndex(replayed, idx, 0.6).count() == 0)
    // and the commit markers for both micro-batches exist
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/index/_committed_batch_0")))
    // a fresh near-dup of doc 10 probes the index and hits it
    val probe = Seq((99L, s"$base endZ")).toDF("doc_id", "text")
    val hits = graft.operators.IncrementalDedup
      .nearDupPairsAgainstIndex(probe, idx, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hits.contains((99L, 10L)), s"probe hits: ${hits.mkString(",")}")
  }

  test("indexedIngest stream equals the st06 batch twin on sequential snapshots") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ingest_twin").toString
    def half(m: Long) = Tables(spark, sf0001).documents
      .filter(org.apache.spark.sql.functions.col("doc_id") % 16 === m)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val t0 = ts("2024-01-01 00:00:00").getTime
    def stamped(rows: Array[(Long, String)], offset: Int) =
      rows.zipWithIndex.map { case ((id, text), i) =>
        (id, new Timestamp(t0 + (offset + i) * 1000L), text) }.toSeq
    val input = MemoryStream[(Long, Timestamp, String)]
    // long watermark: tier-1 state stays live across both batches, the
    // regime st06's seen1 CTE models
    val q = StreamingOps.indexedIngest(input.toDF().toDF("doc_id", "ts", "text"),
      s"$dir/index", s"$dir/ckpt", threshold = 0.6, watermark = "30 days",
      acceptedDir = Some(s"$dir/accepted"))
    try {
      input.addData(stamped(half(1), 0)); q.processAllAvailable()
      input.addData(stamped(half(3), 100000)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(s"$dir/accepted")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // the twin is split across two catalog entries (round 6): the
    // stream's accepted store must equal st06a ∪ st06b
    val twin =
      Catalog.queries("st06a_ingest_batch1")(spark, sf0001)
        .select("doc_id").collect().map(_.getLong(0)).toSet ++
      Catalog.queries("st06b_ingest_batch2")(spark, sf0001)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed == twin,
      s"stream-only ${(streamed -- twin).size}, twin-only ${(twin -- streamed).size}")
    assert(streamed.nonEmpty)
  }

  test("st04 catalog entry (batch) agrees with the op run as a real stream") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.Encoders
    val events = Tables(spark, sf0001).events
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as(Encoders.product[Event]).collect().toSeq
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val joined = StreamingOps.attributionJoin(
      clicks.toDF(), purchases.toDF(),
      watermark = "1 hour", windowMinutes = 60)
    val q = joined.writeStream.format("memory").queryName("st04_stream")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(events.filter(_.event_type == "click"))
      purchases.addData(events.filter(_.event_type == "purchase"))
      q.processAllAvailable()
      // push both watermarks past every event so all pairs finalize
      val flush = Event(-1, ts("2099-01-01 00:00:00"), -1, "x", 0)
      clicks.addData(Seq(flush)); purchases.addData(Seq(flush))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("st04_stream")
      .filter(col("l_id") >= 0 && col("r_id") >= 0)
      .select("l_id", "r_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = Catalog.queries("st04_attribution")(spark, sf0001)
      .select("l_id", "r_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch,
      s"missing=${(batch -- streamed).take(3)} spurious=${(streamed -- batch).take(3)}")
  }

  test("batch session_window catalog entry agrees with streaming session op") {
    // the st03 catalog query (batch session_window) and the stateful
    // streaming implementation must agree on session starts per user
    val batch = Catalog.queries("st03_session")(spark, sf0001)
      .select("user_id", "session_start_ms").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    import spark.implicits._
    val events = Tables(spark, sf0001).events
      .select($"event_id", $"ts".cast("timestamp").as("ts"), $"user_id",
        $"event_type", $"value").as[Event]
    val sessions = events.groupByKey(_.user_id).flatMapGroups {
      (uid: Long, it: Iterator[Event]) =>
        val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        val starts = collection.mutable.ArrayBuffer[Long]()
        var prevEnd = Long.MinValue
        sorted.foreach { e =>
          if (prevEnd == Long.MinValue || e.ts.getTime - prevEnd >= 1800000L)
            starts += e.ts.getTime
          prevEnd = e.ts.getTime
        }
        starts.map(s => (uid, s)).iterator
    }.collect().toSet
    assert(sessions == batch)
  }

  test("stream-static enrichment emits exactly the batch join's rows (st08)") {
    implicit val sq = spark.sqlContext
    val dim = Seq((1L, "BUILDING"), (2L, "MACHINERY")).toDF("c_custkey", "c_mktsegment")
    val events = Seq(
      Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 10:01:00"), 2, "view", 2.0),
      Event(3, ts("2024-01-01 10:02:00"), 9, "click", 3.0)) // no dim row → null passthrough
    val input = MemoryStream[Event]
    val q = StreamingOps.enrichWithDim(input.toDF(), dim, "user_id", "c_custkey")
      .select("event_id", "c_mktsegment")
      .writeStream.format("memory").queryName("enrich")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(events)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("enrich")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    val batch = StreamingOps.enrichWithDim(events.toDF(), dim, "user_id", "c_custkey")
      .select("event_id", "c_mktsegment")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(streamed == Set((1L, Some("BUILDING")), (2L, Some("MACHINERY")), (3L, None)))
    assert(batch == streamed)
  }

  test("streaming quality gate equals its batch twin (st07)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // a Gopher-passing doc: 50 tokens, 2 stopword hits, all-alpha,
    // all-distinct (ttr 1.0), mean token length ~5
    def good(tag: Int) =
      s"the of " + (0 until 48).map(w => s"w${tag}x$w").mkString(" ")
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), good(1)),
      (2L, ts("2024-01-01 10:00:01"), good(1) + "  "), // ws mutant of 1: passes gate, tier-1 dedup kills it
      (3L, ts("2024-01-01 10:00:02"), "too short"),    // fails r_len
      (4L, ts("2024-01-01 10:00:03"),                  // fails r_alpha + r_ttr
        (0 until 60).map(_ => "12345").mkString(" ")),
      (5L, ts("2024-01-01 10:00:04"), good(5)))
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val q = StreamingOps.qualityGatedIngest(docs, "1 hour")
      .writeStream.format("memory").queryName("qgate")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(rows)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("qgate").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // batch twin (the st07 catalog shape) over the same raw rows
    import graft.api.Graft._
    val twin = rows.toDF("doc_id", "ts", "text")
      .filter(graft.operators.TextAnalysis.gopherPass(col("text")))
      .distinctDocuments(normalize = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed == Set(1L, 5L))
    assert(twin == streamed)
  }

  test("streaming classifier gate equals its batch twin (st09)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // model trained on the sf0.001 even half (exactly st09's model);
    // the stream carries a mix of harness docs — scored under the
    // FROZEN model, emitted iff log-odds > 0
    val docs = Tables(spark, sf0001).documents
    val train = graft.operators.Classifier.weakLabeledTrain(
      docs.filter(col("doc_id") % 2 === 0))
    val streamRows = docs.filter(col("doc_id") < 40)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), ts("2024-01-01 10:00:00"), r.getString(1))).toSeq
    val input = MemoryStream[(Long, Timestamp, String)]
    val stream = input.toDF().toDF("doc_id", "ts", "text")
    val q = StreamingOps.classifierGatedIngest(stream, train, "1 hour")
      .writeStream.format("memory").queryName("cgate")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(streamRows)
      // advance the watermark past the batch so append mode emits
      input.addData(Seq((-1L, ts("2024-01-02 00:00:00"), "tick")))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("cgate")
      .filter(col("doc_id") >= 0)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    // batch twin: the st09 catalog build restricted to the same docs
    val (tokLo, consts) = graft.operators.Classifier.binaryLogOddsModel(train)
    val twin = graft.operators.Classifier
      .logOddsScores(tokLo, consts, docs.filter(col("doc_id") < 40))
      .filter(col("logodds") > 0)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(streamed.nonEmpty, "gate should pass at least one doc")
    assert(streamed == twin)
  }

  test("streaming media dedup gate: recompressed copies and broken payloads drop (st10)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val imgA = graft.operators.Multimodal.renderRaster(
      "the quick brown fox jumps over the lazy dog once")
    val imgB = graft.operators.Multimodal.renderRaster(
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA")
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), graft.operators.Netpbm.encodeP6(imgA, 0)),
      (2L, ts("2024-01-01 10:00:01"), graft.operators.Netpbm.encodeP6(imgA, 1)), // re-encoded copy of 1
      (3L, ts("2024-01-01 10:00:02"), graft.operators.Netpbm.encodeP6(imgB, 2)),
      (4L, ts("2024-01-01 10:00:03"), "definitely not a ppm".getBytes)) // broken media
    val input = MemoryStream[(Long, Timestamp, Array[Byte])]
    val media = input.toDF().toDF("doc_id", "ts", "media")
    val q = StreamingOps.mediaDedupIngest(media, "1 hour")
      .writeStream.format("memory").queryName("mgate")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(rows)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("mgate").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(streamed == Set(1L, 3L),
      s"copy must dedup against the original, broken media must drop: $streamed")
  }

  test("streaming media dedup equals its batch twin over the corpus (st10)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // the full sf0.001 corpus as encoded PPM payloads, arriving in
    // doc_id order (keep-first == min doc_id, the twin's semantics)
    val mediaRows = graft.operators.Multimodal
      .ppmRows(Tables(spark, sf0001).documents)
      .collect().sortBy(_.doc_id)
      .map(m => (m.doc_id, ts("2024-01-01 10:00:00"), m.media)).toSeq
    val input = MemoryStream[(Long, Timestamp, Array[Byte])]
    val media = input.toDF().toDF("doc_id", "ts", "media")
    val q = StreamingOps.mediaDedupIngest(media, "1 hour")
      .writeStream.format("memory").queryName("mgate2")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(mediaRows)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("mgate2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val twin = Catalog.queries("st10_stream_media_dedup")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed.nonEmpty && streamed == twin)
  }

  test("streaming decontamination gate equals its batch twin (st11)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val docs = Tables(spark, sf0001).documents
    // benchmark = held-out tenth's window hashes (exactly the twin's
    // bench CTE); stream carries the train side in doc_id order so
    // keep-first == the twin's min(doc_id)
    val bench = graft.operators.TextAnalysis.windowHashes(
        docs.filter(col("doc_id") % 10 === 0))
      .select(col("win_hash")).distinct()
    val streamRows = docs.filter(col("doc_id") % 10 =!= 0)
      .select("doc_id", "text").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), ts("2024-01-01 10:00:00"), r.getString(1))).toSeq
    val input = MemoryStream[(Long, Timestamp, String)]
    val stream = input.toDF().toDF("doc_id", "ts", "text")
      .select(col("ts"), col("doc_id"), col("text"))
    val q = StreamingOps.decontaminatedIngest(stream, bench, "1 hour")
      .writeStream.format("memory").queryName("dgate")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(streamRows)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("dgate").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val twin = Catalog.queries("st11_stream_decontaminate")(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    assert(streamed.nonEmpty, "gate should accept at least one doc")
    assert(streamed == twin,
      s"missing=${(twin -- streamed).take(5)} spurious=${(streamed -- twin).take(5)}")
  }

  test("streaming decontamination REWRITE equals its batch twin (st13)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val docs = Tables(spark, sf0001).documents
    val bench = graft.operators.TextAnalysis.windowHashes(
        docs.filter(col("doc_id") % 10 === 0))
      .select(col("win_hash")).distinct()
    val streamRows = docs.filter(col("doc_id") % 10 =!= 0)
      .select("doc_id", "text").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), ts("2024-01-01 10:00:00"), r.getString(1))).toSeq
    val input = MemoryStream[(Long, Timestamp, String)]
    val stream = input.toDF().toDF("doc_id", "ts", "text")
      .select(col("ts"), col("doc_id"), col("text"))
    val q = StreamingOps.decontaminateRewriteIngest(stream, bench, "1 hour")
      .writeStream.format("memory").queryName("dsurg")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(streamRows)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("dsurg").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val twin = Catalog.queries("st13_stream_decontaminate_rewrite")(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    assert(streamed.nonEmpty && streamed == twin,
      s"missing=${(twin -- streamed).take(5)} spurious=${(streamed -- twin).take(5)}")
    // the surgical gate must accept MORE than st11's drop gate (the
    // point of rewriting): every st11 survivor also survives surgery
    val st11 = Catalog.queries("st11_stream_decontaminate")(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    assert(st11.subsetOf(twin) && twin.size > st11.size,
      s"surgery should strictly widen the accepted set: st11=${st11.size} st13=${twin.size}")
  }

  test("streaming pack equals its batch twin, single batch and across a split (st12)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val docs = Tables(spark, sf0001).documents
      .select("source", "doc_id", "text").orderBy("doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    val twin = Catalog.queries("st12_stream_pack")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSet
    def run(batches: Seq[Seq[(String, Long, String)]]): Set[(String, Long, Long, Long, String)] = {
      val input = MemoryStream[(String, Long, String)]
      val stream = input.toDF().toDF("source", "doc_id", "text")
      val name = s"pack${batches.size}"
      val q = StreamingOps.streamingPack(stream, blockLen = 512)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      try {
        batches.foreach { b => input.addData(b); q.processAllAvailable() }
      } finally q.stop()
      spark.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
        .toSet
    }
    val single = run(Seq(docs))
    assert(single.nonEmpty && single == twin,
      s"single-batch: missing=${(twin -- single).take(3)} spurious=${(single -- twin).take(3)}")
    // split by doc_id so cross-batch order matches the twin's doc_id order;
    // blocks STRADDLING the boundary must still assemble identically
    val (b1, b2) = docs.partition(_._2 < docs(docs.size / 2)._2)
    val split = run(Seq(b1, b2))
    assert(split == twin, "blocks crossing the micro-batch boundary must match")
  }

  test("bm25 serving ingest serves the st15 twin's rows at every snapshot") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bm25_serve").toString
    def third(m: Long) = Tables(spark, sf0001).documents
      .filter(col("doc_id") % 3 === m)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val input = MemoryStream[(Long, String)]
    val q = StreamingOps.bm25ServingIngest(
      input.toDF().toDF("doc_id", "text"),
      graft.operators.TextAnalysis.bm25QuerySet,
      s"$dir/base", s"$dir/ckpt", k = 10)
    try {
      (0L to 2L).foreach { m =>
        input.addData(third(m)); q.processAllAvailable()
      }
    } finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    val served = rows(spark.read.parquet(s"$dir/base/results/*")
      .select("snap", "q_id", "rank", "doc_id", "score"))
    val twin = rows(Catalog.queries("st15_snapshot_serve")(spark, sf0001))
    assert(served == twin && served.nonEmpty,
      s"served ${served.size} rows vs twin ${twin.size}")
    // snapshots must genuinely differ (mid-stream stats are
    // load-bearing: df/N/avgdl at snap 0 ≠ full-corpus values)
    assert(served.groupBy(_._1).values.map(_.map(t => (t._2, t._3, t._4, t._5)))
      .toSet.size == 3, "all snapshots served identical answers")
  }

  test("compacting bm25 serving lane serves the st19 twin's rows and folds mid-stream") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bm25_compact_serve").toString
    def third(m: Long) = Tables(spark, sf0001).documents
      .filter(col("doc_id") % 3 === m)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val input = MemoryStream[(Long, String)]
    val q = StreamingOps.bm25ServingIngestCompacting(
      input.toDF().toDF("doc_id", "text"),
      graft.operators.TextAnalysis.bm25QuerySet,
      s"$dir/base", s"$dir/ckpt", k = 10, compactEvery = 2)
    try {
      (0L to 2L).foreach { m =>
        input.addData(third(m)); q.processAllAvailable()
      }
    } finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("snap", "n_segs", "base_upto", "q_id", "rank", "doc_id", "score")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getDouble(6))).toSet
    val served = rows(spark.read.parquet(s"$dir/base/results/*"))
    val twin = rows(Catalog.queries("st19_stream_serving_compact")(spark, sf0001))
    assert(served == twin && served.nonEmpty,
      s"served ${served.size} rows vs twin ${twin.size}")
    // the layout evidence the cadence predicts: snapshot 2 was served
    // THROUGH the folded base (2 segments, watermark 1), not 3 raw ones
    assert(served.filter(_._1 == 2L).forall(t => t._2 == 2L && t._3 == 1L),
      "snapshot 2 must serve through the compacted base + one tail segment")
    // the tree really went through the fold and its two-phase delete
    val base = new java.io.File(s"$dir/base")
    assert(new java.io.File(base, "compacted/1").isDirectory,
      "fold must have materialized the compacted base")
    assert(!new java.io.File(base, "batches/0").exists &&
      !new java.io.File(base, "batches/1").exists,
      "folded segment dirs must be pruned")
    assert(new java.io.File(base, "batches/2").isDirectory,
      "the post-fold tail segment must survive the prune")
    (0 to 2).foreach(i => assert(
      new java.io.File(base, s"_committed_batch_$i").exists,
      s"replay marker $i must be kept (at-least-once skip guard)"))
    assert(new java.io.File(base, "_compacted_upto_1").exists)
  }

  test("compacting pq serving lane serves the st20 twin's rows and swaps generations mid-stream") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pq_compact_serve").toString
    val e = Tables(spark, sf0001).embeddings
    def third(m: Long) = e.filter(col("vec_id") % 3 === m)
      .collect().map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray))
      .sortBy(_._1).toSeq
    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamingOps.pqServingIngestCompacting(
      input.toDF().toDF("vec_id", "embedding"),
      e.filter(col("vec_id") < 32), s"$dir/base", s"$dir/ckpt",
      compactEvery = 1)
    try {
      (0L to 2L).foreach { m =>
        input.addData(third(m)); q.processAllAvailable()
      }
    } finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("snap", "n_appends", "gen", "q_id", "nb_id", "adc", "rn")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getDouble(5), r.getLong(6))).toSet
    val served = rows(spark.read.parquet(s"$dir/base/results/*"))
    val twin = rows(Catalog.queries("st20_ann_serving_compact")(spark, sf0001))
    assert(served == twin && served.nonEmpty,
      s"served ${served.size} rows vs twin ${twin.size}")
    // the evidence the cadence predicts: snapshot 2 was served from
    // generation 1 (the folded tree) carrying exactly one append
    assert(served.filter(_._1 == 2L).forall(t => t._2 == 1L && t._3 == 1L),
      "snapshot 2 must serve from the post-fold generation + one append")
    // the tree really went through the swap: the final fold left
    // generation 2 as the consolidated serving tree, older gens pruned
    import graft.operators.Pq
    assert(Pq.currentPqGen(spark, s"$dir/base") == 2L)
    assert(Pq.hasPqIndex(spark, Pq.pqGenPath(s"$dir/base", 2L)) &&
      Pq.pqAppendCount(spark, Pq.pqGenPath(s"$dir/base", 2L)) == 0,
      "final generation must be a consolidated base with no appends")
    (0L to 1L).foreach { og =>
      assert(!Pq.hasPqIndex(spark, Pq.pqGenPath(s"$dir/base", og)),
        s"generation $og must be pruned after the swap")
      assert(!new java.io.File(s"$dir/base/_gen_$og").exists,
        s"superseded _gen_$og marker must be swept")
    }
  }

  test("takedown serving lane serves the st21 twin's rows at every snapshot") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bm25_takedown_serve").toString
    val d = Tables(spark, sf0001).documents
    def ops(df: org.apache.spark.sql.DataFrame, op: String) =
      df.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), if (op == "add") r.getString(1) else "", op))
        .sortBy(_._1).toSeq
    val batches = Seq(
      ops(d.filter(col("doc_id") % 3 === 0), "add"),
      ops(d.filter(col("doc_id") % 15 === 0), "del") ++
        ops(d.filter(col("doc_id") % 3 === 1), "add"),
      ops(d.filter(col("doc_id") % 3 === 2), "add") ++
        ops(d.filter(col("doc_id") % 30 === 0), "add"))
    val input = MemoryStream[(Long, String, String)]
    val q = StreamingOps.bm25ServingIngestWithTakedown(
      input.toDF().toDF("doc_id", "text", "op"),
      graft.operators.TextAnalysis.bm25QuerySet,
      s"$dir/base", s"$dir/ckpt", k = 10)
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("snap", "n_dead", "q_id", "rank", "doc_id", "score")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getDouble(5))).toSet
    val served = rows(spark.read.parquet(s"$dir/base/results/*"))
    val twin = rows(Catalog.queries("st21_stream_serving_takedown")(spark, sf0001))
    assert(served == twin && served.nonEmpty,
      s"served ${served.size} rows vs twin ${twin.size}")
    // the takedown trajectory is real: dead counts move 0 → |mod 15|
    // → |mod 15 \ mod 30|, and a re-inserted doc is serving again
    val deadBySnap = served.groupBy(_._1).map { case (s0, rs) =>
      s0 -> rs.map(_._2).head }
    val n15 = d.filter(col("doc_id") % 15 === 0).count()
    val n30 = d.filter(col("doc_id") % 30 === 0).count()
    assert(deadBySnap == Map(0L -> 0L, 1L -> n15, 2L -> (n15 - n30)),
      s"dead trajectory $deadBySnap vs expected (0, $n15, ${n15 - n30})")
  }

  test("ann takedown serving lane serves the st22 twin's rows at every snapshot") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pq_takedown_serve").toString
    val e = Tables(spark, sf0001).embeddings
    def vecs(pred: org.apache.spark.sql.Column, op: String) =
      e.filter(pred).select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0),
          if (op == "add") r.getAs[scala.collection.Seq[Float]]("embedding").toArray
          else Array.empty[Float], op))
        .sortBy(_._1).toSeq
    val batches = Seq(
      vecs(col("vec_id") % 3 === 0, "add"),
      vecs(col("vec_id") % 3 === 1, "add") ++
        vecs(col("vec_id") % 15 === 0 && col("vec_id") >= 32, "del"),
      vecs(col("vec_id") % 3 === 2, "add") ++
        vecs(col("vec_id") % 15 === 3 && col("vec_id") >= 32, "del"))
    val input = MemoryStream[(Long, Array[Float], String)]
    val q = StreamingOps.pqServingIngestWithTakedown(
      input.toDF().toDF("vec_id", "embedding", "op"),
      e.filter(col("vec_id") < 32), s"$dir/base", s"$dir/ckpt")
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("snap", "n_dead", "q_id", "nb_id", "adc", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getLong(5))).toSet
    val served = rows(spark.read.parquet(s"$dir/base/results/*"))
    val twin = rows(Catalog.queries("st22_ann_serving_takedown")(spark, sf0001))
    assert(served == twin && served.nonEmpty,
      s"served ${served.size} rows vs twin ${twin.size}")
    // the takedown is real: no tombstoned id is ever served as a
    // neighbor at its snapshot, and the dead trajectory grows
    val dead1 = e.filter(col("vec_id") % 15 === 0 && col("vec_id") >= 32)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(!served.exists(t => t._1 >= 1L && dead1.contains(t._4)),
      "a taken-down id was served as a neighbor after its takedown")
    val deadBySnap = served.groupBy(_._1).map { case (s0, rs) =>
      s0 -> rs.map(_._2).head }
    assert(deadBySnap(0L) == 0L && deadBySnap(1L) > 0L &&
      deadBySnap(2L) > deadBySnap(1L),
      s"dead trajectory must grow: $deadBySnap")
  }

  test("hybrid takedown serving lane serves the st23 twin's rows at every snapshot") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hybrid_takedown_serve")
      .toString
    val t = Tables(spark, sf0001)
    val corpus = t.documents
      .join(t.embeddings, t.documents("doc_id") === t.embeddings("vec_id"))
      .select(t.documents("doc_id"), col("text"), col("embedding"))
    def ops(pred: org.apache.spark.sql.Column, op: String) =
      corpus.filter(pred).collect()
        .map(r => (r.getLong(0),
          if (op == "add") r.getString(1) else "",
          if (op == "add")
            r.getAs[scala.collection.Seq[Float]]("embedding").toArray
          else Array.empty[Float],
          op))
        .sortBy(_._1).toSeq
    val batches = Seq(
      ops(col("doc_id") % 3 === 0, "add"),
      ops(col("doc_id") % 3 === 1, "add") ++
        ops(col("doc_id") % 15 === 0 && col("doc_id") >= 32, "del"),
      ops(col("doc_id") % 3 === 2, "add") ++
        ops(col("doc_id") % 15 === 3 && col("doc_id") >= 32, "del"))
    val qIds = graft.operators.TextAnalysis.bm25QuerySet.map(_._1).distinct
    val input = MemoryStream[(Long, String, Array[Float], String)]
    val q = StreamingOps.hybridServingIngestWithTakedown(
      input.toDF().toDF("doc_id", "text", "embedding", "op"),
      graft.operators.TextAnalysis.bm25QuerySet,
      t.embeddings.filter(col("vec_id").isin(qIds: _*)),
      s"$dir/base", s"$dir/ckpt")
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("snap", "n_dead", "q_id", "cand", "rrf", "rrf_rank")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getLong(5))).toSet
    val served = rows(spark.read.parquet(s"$dir/base/results/*"))
    val twin = rows(Catalog.queries("st23_hybrid_serving_takedown")(
      spark, sf0001))
    assert(served == twin && served.nonEmpty,
      s"served ${served.size} rows vs twin ${twin.size}")
    // cross-index consistency is real: after a takedown, the dead id
    // surfaces through NEITHER arm — it never appears in the fused
    // list again — and the shared dead-count evidence grows
    val dead1 = corpus
      .filter(col("doc_id") % 15 === 0 && col("doc_id") >= 32)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!served.exists(t0 => t0._1 >= 1L && dead1.contains(t0._4)),
      "a taken-down doc surfaced in the fused serving after its takedown")
    assert(served.exists(t0 => t0._1 == 0L && dead1.contains(t0._4)),
      "vacuous scenario: no to-be-taken-down doc ever ranked at snap 0")
    val deadBySnap = served.groupBy(_._1).map { case (s0, rs) =>
      s0 -> rs.map(_._2).head }
    assert(deadBySnap(0L) == 0L && deadBySnap(1L) > 0L &&
      deadBySnap(2L) > deadBySnap(1L),
      s"dead trajectory must grow: $deadBySnap")
  }

  test("st23 lane: a torn batch (all four artifacts, no marker) replays to identical serving") {
    // The hybrid lane writes FOUR artifacts per batch (ops log, lex
    // segment, PQ append, results) before its marker — the widest
    // pre-marker crash window of any lane. Simulate the crash: run two
    // batches, erase batch 1's marker and results (the state after a
    // crash mid-serve: components down, marker not), restart on a
    // fresh checkpoint. The replay must overwrite every component
    // idempotently (same ops dir, same segment, same a1 append label)
    // and the final serving must equal the twin exactly.
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hybrid_torn").toString
    val t = Tables(spark, sf0001)
    val corpus = t.documents
      .join(t.embeddings, t.documents("doc_id") === t.embeddings("vec_id"))
      .select(t.documents("doc_id"), col("text"), col("embedding"))
    def ops(pred: org.apache.spark.sql.Column, op: String) =
      corpus.filter(pred).collect()
        .map(r => (r.getLong(0),
          if (op == "add") r.getString(1) else "",
          if (op == "add")
            r.getAs[scala.collection.Seq[Float]]("embedding").toArray
          else Array.empty[Float],
          op))
        .sortBy(_._1).toSeq
    val batches = Seq(
      ops(col("doc_id") % 3 === 0, "add"),
      ops(col("doc_id") % 3 === 1, "add") ++
        ops(col("doc_id") % 15 === 0 && col("doc_id") >= 32, "del"),
      ops(col("doc_id") % 3 === 2, "add") ++
        ops(col("doc_id") % 15 === 3 && col("doc_id") >= 32, "del"))
    val qIds = graft.operators.TextAnalysis.bm25QuerySet.map(_._1).distinct
    def lane(ckpt: String) = {
      val input = MemoryStream[(Long, String, Array[Float], String)]
      val q = StreamingOps.hybridServingIngestWithTakedown(
        input.toDF().toDF("doc_id", "text", "embedding", "op"),
        graft.operators.TextAnalysis.bm25QuerySet,
        t.embeddings.filter(col("vec_id").isin(qIds: _*)),
        s"$dir/base", s"$dir/$ckpt")
      (input, q)
    }
    val (in1, q1) = lane("ckpt1")
    try {
      batches.take(2).foreach { b => in1.addData(b); q1.processAllAvailable() }
    } finally q1.stop()
    // the crash: batch 1's components are down, its marker is not
    val fs = new org.apache.hadoop.fs.Path(s"$dir/base")
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$dir/base/_committed_batch_1"), false)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/base/results/1"), true)
    val (in2, q2) = lane("ckpt2")
    try {
      batches.foreach { b => in2.addData(b); q2.processAllAvailable() }
    } finally q2.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("snap", "n_dead", "q_id", "cand", "rrf", "rrf_rank")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getLong(5))).toSet
    val served = rows(spark.read.parquet(s"$dir/base/results/*"))
    val twin = rows(Catalog.queries("st23_hybrid_serving_takedown")(
      spark, sf0001))
    assert(served == twin && served.nonEmpty,
      s"served ${served.size} rows vs twin ${twin.size} after torn replay")
    // the PQ side did not duplicate the replayed append: one base +
    // exactly the a1/a2 labels
    val labels = graft.operators.IndexCommit
      .committedLabels(spark, s"$dir/base/index").sorted
    assert(labels == Seq("a1", "a2", "base"),
      s"replay must not duplicate append segments: $labels")
  }

  test("takedown-compacting lane: stream == st24 twin, dead rows physically leave disk") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("takedown_compact")
      .toString
    val d = Tables(spark, sf0001).documents
    def ops(df: org.apache.spark.sql.DataFrame, op: String) =
      df.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), if (op == "add") r.getString(1) else "", op))
        .sortBy(_._1).toSeq
    val batches = Seq(
      ops(d.filter(col("doc_id") % 3 === 0), "add"),
      ops(d.filter(col("doc_id") % 3 === 1), "add") ++
        ops(d.filter(col("doc_id") % 15 === 0 && col("doc_id") >= 32), "del"),
      ops(d.filter(col("doc_id") % 3 === 2), "add") ++
        ops(d.filter(col("doc_id") % 15 === 3 && col("doc_id") >= 32), "del"))
    val input = MemoryStream[(Long, String, String)]
    val q = StreamingOps.bm25ServingIngestTakedownCompacting(
      input.toDF().toDF("doc_id", "text", "op"),
      graft.operators.TextAnalysis.bm25QuerySet,
      s"$dir/base", s"$dir/ckpt", k = 10, compactEvery = 2)
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("snap", "n_segs", "base_upto", "n_dead", "n_dead_disk",
          "q_id", "rank", "doc_id", "score")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
          r.getDouble(8))).toSet
    val served = rows(spark.read.parquet(s"$dir/base/results/*"))
    val twin = rows(Catalog.queries("st24_takedown_compaction")(spark, sf0001))
    assert(served == twin && served.nonEmpty,
      s"served ${served.size} rows vs twin ${twin.size}")
    // THE claim: after the fold, the taken-down docs' rows are
    // bytes-off-disk — absent from every surviving segment dir — and
    // their tombstones are gone from the ops log
    val fsPath = new org.apache.hadoop.fs.Path(s"$dir/base")
    val fs = fsPath.getFileSystem(spark.sessionState.newHadoopConf())
    def names(sub: String): Set[String] = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/base/$sub")
      if (!fs.exists(p)) Set.empty
      else fs.listStatus(p).map(_.getPath.getName).toSet
    }
    assert(names("batches") == Set("2") && names("ops") == Set("2") &&
      names("compacted") == Set("1") && names("ops_base") == Set("1"),
      s"layout after the run: batches=${names("batches")} ops=${names("ops")}" +
        s" compacted=${names("compacted")} ops_base=${names("ops_base")}")
    val dead1 = d.filter(col("doc_id") % 15 === 0 && col("doc_id") >= 32)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val surviving = spark.read.parquet(
        s"$dir/base/compacted/1/doclens", s"$dir/base/batches/2/doclens")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(dead1.nonEmpty && dead1.forall(!surviving.contains(_)),
      "a taken-down doc's rows survived the fold on disk")
    val opsDocs = spark.read.parquet(
        s"$dir/base/ops_base/1", s"$dir/base/ops/2")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(dead1.forall(!opsDocs.contains(_)),
      "a GC'd tombstone's doc_id still sits in the surviving ops log")
    // and the forget is visible in the evidence: n_dead at snap 2
    // counts only the NEW takedowns, not the GC'd ones
    val n15_0 = dead1.size.toLong
    val n15_3 = d.filter(col("doc_id") % 15 === 3 && col("doc_id") >= 32)
      .count()
    val deadBySnap = served.groupBy(_._1).map { case (s0, rs) =>
      s0 -> rs.map(_._4).head }
    assert(deadBySnap == Map(0L -> 0L, 1L -> n15_0, 2L -> n15_3),
      s"dead trajectory $deadBySnap vs expected (0, $n15_0, $n15_3)")
  }

  test("st24 lane: a crashed prune is swept by the next gate; dead bytes leave disk") {
    // The takedown-specific crash window: the fold committed its
    // marker (the dead docs are out of the SERVING view) but the prune
    // crashed — the dead docs' bytes and their tombstones still sit in
    // the folded dirs. The gate runs the idempotent prune on EVERY
    // batch, so the next replayed batch sweeps them: the linger window
    // is one micro-batch, not "until the next fold".
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("takedown_prune_crash")
      .toString
    val d = Tables(spark, sf0001).documents
    def ops(df: org.apache.spark.sql.DataFrame, op: String) =
      df.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), if (op == "add") r.getString(1) else "", op))
        .sortBy(_._1).toSeq
    val batches = Seq(
      ops(d.filter(col("doc_id") % 3 === 0), "add"),
      ops(d.filter(col("doc_id") % 3 === 1), "add") ++
        ops(d.filter(col("doc_id") % 15 === 0 && col("doc_id") >= 32), "del"),
      ops(d.filter(col("doc_id") % 3 === 2), "add") ++
        ops(d.filter(col("doc_id") % 15 === 3 && col("doc_id") >= 32), "del"))
    def lane(ckpt: String, every: Int) = {
      val input = MemoryStream[(Long, String, String)]
      val q = StreamingOps.bm25ServingIngestTakedownCompacting(
        input.toDF().toDF("doc_id", "text", "op"),
        graft.operators.TextAnalysis.bm25QuerySet,
        s"$dir/base", s"$dir/$ckpt", k = 10, compactEvery = every)
      (input, q)
    }
    // run 1: gate disabled — batches 0,1 commit, no fold/prune
    val (in1, q1) = lane("ckpt1", every = 0)
    try {
      batches.take(2).foreach { b => in1.addData(b); q1.processAllAvailable() }
    } finally q1.stop()
    // the fold fires and "crashes" right after its marker, before the
    // prune — the exact window under test
    graft.operators.LexIndex.compactTakedownServing(spark, s"$dir/base")
    assert(new java.io.File(s"$dir/base/batches/0").isDirectory &&
      new java.io.File(s"$dir/base/ops/0").isDirectory,
      "precondition: the folded dirs must still be on disk (prune crashed)")
    // restart: batch 0's replay is marker-skipped but its gate's prune
    // sweeps the folded segments AND ops logs before batch 2 arrives
    val (in2, q2) = lane("ckpt2", every = 2)
    try {
      batches.foreach { b => in2.addData(b); q2.processAllAvailable() }
    } finally q2.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("snap", "n_segs", "base_upto", "n_dead", "n_dead_disk",
          "q_id", "rank", "doc_id", "score")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
          r.getDouble(8))).toSet
    val served = rows(spark.read.parquet(s"$dir/base/results/*"))
    val twin = rows(Catalog.queries("st24_takedown_compaction")(spark, sf0001))
    assert(served == twin && served.nonEmpty,
      s"served ${served.size} rows vs twin ${twin.size} after healed prune")
    val base = new java.io.File(s"$dir/base")
    assert(!new java.io.File(base, "batches/0").exists &&
      !new java.io.File(base, "batches/1").exists &&
      !new java.io.File(base, "ops/0").exists &&
      !new java.io.File(base, "ops/1").exists,
      "the healed prune must drop folded segments and their ops logs")
    assert(new java.io.File(base, "compacted/1").isDirectory &&
      new java.io.File(base, "ops_base/1").isDirectory &&
      new java.io.File(base, "batches/2").isDirectory)
  }

  test("ann takedown-compacting lane: stream == st25 twin, dead codes physically leave disk") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pq_takedown_compact")
      .toString
    val e = Tables(spark, sf0001).embeddings
    def vecs(pred: org.apache.spark.sql.Column, op: String) =
      e.filter(pred).select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0),
          if (op == "add")
            r.getAs[scala.collection.Seq[Float]]("embedding").toArray
          else Array.empty[Float], op))
        .sortBy(_._1).toSeq
    val batches = Seq(
      vecs(col("vec_id") % 3 === 0, "add"),
      vecs(col("vec_id") % 3 === 1, "add") ++
        vecs(col("vec_id") % 15 === 0 && col("vec_id") >= 32, "del"),
      vecs(col("vec_id") % 3 === 2, "add") ++
        vecs(col("vec_id") % 15 === 3 && col("vec_id") >= 32, "del"))
    val input = MemoryStream[(Long, Array[Float], String)]
    val q = StreamingOps.pqServingIngestTakedownCompacting(
      input.toDF().toDF("vec_id", "embedding", "op"),
      e.filter(col("vec_id") < 32), s"$dir/base", s"$dir/ckpt",
      compactEvery = 1)
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("snap", "n_appends", "gen", "n_dead", "n_dead_disk",
          "q_id", "nb_id", "adc", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7),
          r.getLong(8))).toSet
    val served = rows(spark.read.parquet(s"$dir/base/results/*"))
    val twin = rows(Catalog.queries("st25_ann_takedown_compaction")(
      spark, sf0001))
    assert(served == twin && served.nonEmpty,
      s"served ${served.size} rows vs twin ${twin.size}")
    // the forget is physical: after the final fold, NO taken-down id
    // has a code row in any surviving generation dir, and the folded
    // ops logs (tombstones included) are gone
    val fs = new org.apache.hadoop.fs.Path(s"$dir/base")
      .getFileSystem(spark.sessionState.newHadoopConf())
    def names(sub: String): Set[String] = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/base/$sub")
      if (!fs.exists(p)) Set.empty
      else fs.listStatus(p).map(_.getPath.getName).toSet
    }
    assert(names("gens") == Set("2") && names("ops").isEmpty &&
      names("ops_base") == Set("2"),
      s"layout after the run: gens=${names("gens")} ops=${names("ops")}" +
        s" ops_base=${names("ops_base")}")
    val deadAll = e.filter((col("vec_id") % 15 === 0 ||
        col("vec_id") % 15 === 3) && col("vec_id") >= 32)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val survivingCodes = graft.operators.Pq.readPqIndex(spark,
        graft.operators.Pq.pqGenPath(s"$dir/base", 2))
      .codes.select("vec_id").distinct().collect().map(_.getLong(0)).toSet
    assert(deadAll.nonEmpty && deadAll.forall(!survivingCodes.contains(_)),
      "a taken-down vector's codes survived the fold on disk")
    val opsBaseIds = spark.read.parquet(s"$dir/base/ops_base/2")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(deadAll.forall(!opsBaseIds.contains(_)),
      "a GC'd tombstone's vec_id still sits in the survivors summary")
    // evidence trajectory: the GC'd tombstones stop counting
    val n15_0 = e.filter(col("vec_id") % 15 === 0 && col("vec_id") >= 32)
      .count()
    val n15_3 = e.filter(col("vec_id") % 15 === 3 && col("vec_id") >= 32)
      .count()
    val deadBySnap = served.groupBy(_._1).map { case (s0, rs) =>
      s0 -> rs.map(_._4).head }
    assert(deadBySnap == Map(0L -> 0L, 1L -> n15_0, 2L -> n15_3),
      s"dead trajectory $deadBySnap vs expected (0, $n15_0, $n15_3)")
  }

  test("st25 lane: a crashed prune is swept by the next gate; dead codes leave disk") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pq_prune_crash")
      .toString
    val e = Tables(spark, sf0001).embeddings
    def vecs(pred: org.apache.spark.sql.Column, op: String) =
      e.filter(pred).select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0),
          if (op == "add")
            r.getAs[scala.collection.Seq[Float]]("embedding").toArray
          else Array.empty[Float], op))
        .sortBy(_._1).toSeq
    val batches = Seq(
      vecs(col("vec_id") % 3 === 0, "add"),
      vecs(col("vec_id") % 3 === 1, "add") ++
        vecs(col("vec_id") % 15 === 0 && col("vec_id") >= 32, "del"),
      vecs(col("vec_id") % 3 === 2, "add") ++
        vecs(col("vec_id") % 15 === 3 && col("vec_id") >= 32, "del"))
    def lane(ckpt: String, every: Int) = {
      val input = MemoryStream[(Long, Array[Float], String)]
      val q = StreamingOps.pqServingIngestTakedownCompacting(
        input.toDF().toDF("vec_id", "embedding", "op"),
        e.filter(col("vec_id") < 32), s"$dir/base", s"$dir/$ckpt",
        compactEvery = every)
      (input, q)
    }
    val (in1, q1) = lane("ckpt1", every = 0)
    try {
      batches.take(2).foreach { b => in1.addData(b); q1.processAllAvailable() }
    } finally q1.stop()
    // the fold fires (marker + ops_base land) and "crashes" before the
    // sweep — the dead codes' bytes linger in the old generation
    graft.operators.Pq.foldPqTakedownIfDue(spark, s"$dir/base", 1, Seq(0L, 1L))
    assert(new java.io.File(s"$dir/base/gens/0").isDirectory &&
      new java.io.File(s"$dir/base/ops/0").isDirectory,
      "precondition: the folded dirs must still be on disk (prune crashed)")
    val (in2, q2) = lane("ckpt2", every = 1)
    try {
      batches.foreach { b => in2.addData(b); q2.processAllAvailable() }
    } finally q2.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("snap", "n_appends", "gen", "n_dead", "n_dead_disk",
          "q_id", "nb_id", "adc", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7),
          r.getLong(8))).toSet
    val served = rows(spark.read.parquet(s"$dir/base/results/*"))
    val twin = rows(Catalog.queries("st25_ann_takedown_compaction")(
      spark, sf0001))
    assert(served == twin && served.nonEmpty,
      s"served ${served.size} rows vs twin ${twin.size} after healed prune")
    val base = new java.io.File(s"$dir/base")
    assert(!new java.io.File(base, "gens/0").exists &&
      !new java.io.File(base, "gens/1").exists &&
      !new java.io.File(base, "ops/0").exists &&
      !new java.io.File(base, "ops/1").exists,
      "the healed sweep must drop folded generations and their ops logs")
    assert(new java.io.File(base, "gens/2").isDirectory &&
      new java.io.File(base, "ops_base/2").isDirectory)
  }

  test("st19 lane: a missed fold is completed by a replayed batch's gate, answers unchanged") {
    // The crash window the in-lane cadence docstring claims self-heals:
    // batches 0-1 commit but the fold never fires (crash between the
    // marker and the gate). On restart, the REPLAYED batch's gate —
    // which runs outside the replay guard — sees the over-fan-in tail
    // and finishes the compaction before any new data arrives; the
    // post-fold batch then serves THROUGH the healed layout with
    // exactly the catalog cadence's evidence and answers.
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bm25_fold_crash").toString
    def third(m: Long) = Tables(spark, sf0001).documents
      .filter(col("doc_id") % 3 === m)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    def lane(ckpt: String, every: Int) = {
      val input = MemoryStream[(Long, String)]
      val q = StreamingOps.bm25ServingIngestCompacting(
        input.toDF().toDF("doc_id", "text"),
        graft.operators.TextAnalysis.bm25QuerySet,
        s"$dir/base", s"$dir/$ckpt", k = 10, compactEvery = every)
      (input, q)
    }
    // run 1: fold disabled (the "crashed before the gate" state)
    val (in1, q1) = lane("ckpt1", every = 0)
    try {
      (0L to 1L).foreach { m => in1.addData(third(m)); q1.processAllAvailable() }
    } finally q1.stop()
    assert(!new java.io.File(s"$dir/base/compacted/1").exists,
      "precondition: the fold must NOT have fired in run 1")
    // restart (fresh checkpoint, markers carry the replay guard): the
    // replay of batch 0 must fold the {0,1} tail before batch 2 lands
    val (in2, q2) = lane("ckpt2", every = 2)
    try {
      (0L to 2L).foreach { m => in2.addData(third(m)); q2.processAllAvailable() }
    } finally q2.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("snap", "n_segs", "base_upto", "q_id", "rank", "doc_id", "score")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getDouble(6))).toSet
    val served = rows(spark.read.parquet(s"$dir/base/results/*"))
    val twin = rows(Catalog.queries("st19_stream_serving_compact")(spark, sf0001))
    assert(served == twin && served.nonEmpty,
      s"served ${served.size} rows vs twin ${twin.size} after healed fold")
    val base = new java.io.File(s"$dir/base")
    assert(new java.io.File(base, "compacted/1").isDirectory,
      "the replayed gate must have materialized the missed fold")
    assert(!new java.io.File(base, "batches/0").exists &&
      !new java.io.File(base, "batches/1").exists,
      "healed fold must prune the folded segments")
    assert(new java.io.File(base, "batches/2").isDirectory)
  }

  test("st20 lane: a torn (markerless) generation is invisible and overwritten by the healing refold") {
    // The other half of the two-phase swap contract: a crash AFTER the
    // fold materializes the next generation but BEFORE its _gen_ marker
    // commits. The torn generation must be invisible (appends and
    // serves keep riding the marker-named generation) and the next due
    // fold must overwrite it wholesale — no duplicated codes, answers
    // exactly the accumulated index's.
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.operators.Pq
    val dir = java.nio.file.Files.createTempDirectory("pq_fold_crash").toString
    val e = Tables(spark, sf0001).embeddings
    def third(m: Long) = e.filter(col("vec_id") % 3 === m)
      .collect().map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray))
      .sortBy(_._1).toSeq
    def lane(ckpt: String, every: Int) = {
      val input = MemoryStream[(Long, Array[Float])]
      val q = StreamingOps.pqServingIngestCompacting(
        input.toDF().toDF("vec_id", "embedding"),
        e.filter(col("vec_id") < 32), s"$dir/base", s"$dir/$ckpt",
        compactEvery = every)
      (input, q)
    }
    // run 1: fold disabled; gen 0 accumulates base + one append
    val (in1, q1) = lane("ckpt1", every = 0)
    try {
      (0L to 1L).foreach { m => in1.addData(third(m)); q1.processAllAvailable() }
    } finally q1.stop()
    // simulate the torn fold: generation 1 fully materialized
    // (manifest committed) but the _gen_1 marker never written
    Pq.writePqIndex(Pq.readPqIndex(spark, Pq.pqGenPath(s"$dir/base", 0L)),
      Pq.pqGenPath(s"$dir/base", 1L))
    assert(Pq.hasPqIndex(spark, Pq.pqGenPath(s"$dir/base", 1L)),
      "precondition: the torn generation must look fully committed")
    assert(Pq.currentPqGen(spark, s"$dir/base") == 0L,
      "the swap pointer must ignore a markerless generation")
    // restart: batch 2 must append to gen 0 (evidence (2,0), not the
    // twin's (1,1) — this trajectory deferred the fold), then the gate
    // refolds base+a1+a2 OVER the torn dir and prunes gen 0
    val (in2, q2) = lane("ckpt2", every = 2)
    try {
      (0L to 2L).foreach { m => in2.addData(third(m)); q2.processAllAvailable() }
    } finally q2.stop()
    def answers(df: org.apache.spark.sql.DataFrame) =
      df.select("snap", "q_id", "nb_id", "adc", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getLong(4))).toSet
    val served = spark.read.parquet(s"$dir/base/results/*")
    assert(answers(served) ==
      answers(Catalog.queries("st20_ann_serving_compact")(spark, sf0001)) &&
      answers(served).nonEmpty,
      "per-snapshot answers must equal the accumulated-prefix twin's")
    val ev = served.filter(col("snap") === 2L)
      .select("n_appends", "gen").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(ev == Seq((2L, 0L)),
      s"snapshot 2 must have served from gen 0 with two appends, got $ev")
    // the healing refold: gen 1 overwritten wholesale, gen 0 pruned
    assert(Pq.currentPqGen(spark, s"$dir/base") == 1L)
    val g1 = Pq.pqGenPath(s"$dir/base", 1L)
    assert(Pq.pqAppendCount(spark, g1) == 0,
      "healed generation must be a consolidated base")
    assert(!Pq.hasPqIndex(spark, Pq.pqGenPath(s"$dir/base", 0L)),
      "superseded generation must be pruned by the healing fold's sweep")
    val duped = Pq.readPqIndex(spark, g1).codes
      .groupBy("vec_id", "m").count().filter(col("count") > 1).count()
    assert(duped == 0,
      s"$duped (vec_id, m) cells duplicated — torn dir not overwritten")
  }

  test("pq serving ingest serves the st16 twin's rows at every snapshot") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pq_serve").toString
    val e = Tables(spark, sf0001).embeddings
    def third(m: Long) = e.filter(col("vec_id") % 3 === m)
      .collect().map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray))
      .sortBy(_._1).toSeq
    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamingOps.pqServingIngest(
      input.toDF().toDF("vec_id", "embedding"),
      e.filter(col("vec_id") < 32), s"$dir/base", s"$dir/ckpt")
    try {
      (0L to 2L).foreach { m =>
        input.addData(third(m)); q.processAllAvailable()
      }
    } finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("snap", "q_id", "nb_id", "adc", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getLong(4))).toSet
    val served = rows(spark.read.parquet(s"$dir/base/results/*"))
    val twin = rows(Catalog.queries("st16_ann_snapshot_serve")(spark, sf0001))
    assert(served == twin && served.nonEmpty,
      s"served ${served.size} rows vs twin ${twin.size}")
    // snapshots must genuinely differ (the arrived-prefix candidate
    // restriction is load-bearing, not just the final index)
    assert(served.groupBy(_._1).values
      .map(_.map(t => (t._2, t._3, t._4, t._5))).toSet.size == 3,
      "all snapshots served identical answers")
  }

  test("drift monitor ingest emits the st17 twin's rows at every snapshot") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("drift_serve").toString
    val e = Tables(spark, sf0001).embeddings
    def third(m: Long) = e.filter(col("vec_id") % 3 === m)
      .collect().map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray))
      .sortBy(_._1).toSeq
    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamingOps.embeddingDriftIngest(
      input.toDF().toDF("vec_id", "embedding"), s"$dir/base", s"$dir/ckpt")
    try {
      (0L to 2L).foreach { m =>
        input.addData(third(m)); q.processAllAvailable()
      }
    } finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("snap", "dim", "mean_base", "mean_cur", "drift").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4))).toSet
    val emitted = rows(spark.read.parquet(s"$dir/base/results/*"))
    val twin = rows(Catalog.queries("st17_stream_drift")(spark, sf0001))
    // the incremental DECIMAL sufficient-stat accumulation must equal
    // the twin's full per-prefix recompute BIT-FOR-BIT
    assert(emitted == twin && emitted.nonEmpty,
      s"emitted ${emitted.size} rows vs twin ${twin.size}")
    // snap 0 pins drift == 0 (cur == base); later snaps must move
    assert(emitted.filter(_._1 == 0L).forall(_._5 == 0.0))
    assert(emitted.exists(t => t._1 > 0L && t._5 != 0.0))
  }

  test("drift-gated serving lane retrains mid-stream and serves the st18 twin's rows at every snapshot") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gated_serve").toString
    val e = Tables(spark, sf0001).embeddings
    val shifted = graft.operators.Pq.shiftEdited(e)
    def third(m: Long) = shifted.filter(col("vec_id") % 3 === m)
      .collect().map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray))
      .sortBy(_._1).toSeq
    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamingOps.driftGatedPqServingIngest(
      input.toDF().toDF("vec_id", "embedding"),
      e.filter(col("vec_id") < 32), s"$dir/base", s"$dir/ckpt")
    try {
      (0L to 2L).foreach { m =>
        input.addData(third(m)); q.processAllAvailable()
      }
    } finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("snap", "fired", "trig", "q_id", "nb_id", "adc", "rn")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getLong(3), r.getLong(4), r.getDouble(5), r.getLong(6))).toSet
    val served = rows(spark.read.parquet(s"$dir/base/results/*"))
    val twin = rows(Catalog.queries("st18_drift_gated_serve")(spark, sf0001))
    assert(served == twin && served.nonEmpty,
      s"served ${served.size} rows vs twin ${twin.size}")
    // the gate's trajectory: frozen, frozen, RETRAIN — and the retrain
    // is load-bearing (snapshot 2's answers differ from what the
    // frozen configuration would have served)
    val firedBySnap = served.groupBy(_._1).view.mapValues(_.map(_._2).head).toMap
    assert(firedBySnap == Map(0L -> 0L, 1L -> 0L, 2L -> 1L), s"$firedBySnap")
    val frozen2 = graft.operators.Pq.searchPqIndex(
      e.filter(col("vec_id") < 32),
      graft.operators.Pq.shiftSnapshotPqIndexes(spark, sf0001)(2))
      .select("q_id", "nb_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val snap2 = served.filter(_._1 == 2L).map(t => (t._4, t._5, t._7))
    assert(snap2 != frozen2,
      "gate vacuous: retrained serving equals the frozen-config serving")
    // and a retrained tree exists on disk at a fresh path (the n105
    // swap shape), with the serve marker trailing it
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/base/index_r2")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/base/_retrained_batch_2")))
  }

  test("bm25 serving ingest: a torn (markerless) batch directory is invisible") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.operators.LexIndex
    val dir = java.nio.file.Files.createTempDirectory("bm25_torn").toString
    val a = Seq((1L, "apple banana cherry"), (2L, "banana cherry date"))
    val b = Seq((3L, "cherry date egg"))
    val queries = Seq((100L, "cherry"), (101L, "egg"))
    val input = MemoryStream[(Long, String)]
    val q = StreamingOps.bm25ServingIngest(input.toDF().toDF("doc_id", "text"),
      queries, s"$dir/base", s"$dir/ckpt", k = 10)
    try {
      input.addData(a); q.processAllAvailable()
      // a torn replay of a FUTURE batch: components on disk, no
      // marker — must not leak into any subsequently served answer
      LexIndex.writeIndex(LexIndex.buildIndex(
        Seq((99L, "cherry cherry cherry")).toDF("doc_id", "text")),
        s"$dir/base/batches/99")
      // LSM compaction mid-stream (folds batch 0, prunes its data dir):
      // the live lane's next serve must read through the compacted base
      assert(LexIndex.compactServing(spark, s"$dir/base").contains(0L))
      LexIndex.pruneCompacted(spark, s"$dir/base")
      input.addData(b); q.processAllAvailable()
    } finally q.stop()
    val snap1 = spark.read.parquet(s"$dir/base/results/1")
      .select("q_id", "rank", "doc_id", "score")
    val expect = LexIndex.bm25FromIndex(
      LexIndex.buildIndex((a ++ b).toDF("doc_id", "text")),
      queries.toDF("q_id", "term"), 10)
      .select("q_id", "rank", "doc_id", "score")
    assert(snap1.collect().map(_.toSeq).toSet ==
      expect.collect().map(_.toSeq).toSet)
    assert(!snap1.select("doc_id").collect().map(_.getLong(0)).contains(99L))
  }

  test("decontamination gate refuses a corpus-sized benchmark set (st11 cap)") {
    import spark.implicits._
    val big = spark.range(0L, StreamingOps.MaxBenchHashes + 1L)
      .select(col("id").as("win_hash"))
    val docs = Seq((ts("2024-01-01 10:00:00"), 1L, "a b c"))
      .toDF("ts", "doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      StreamingOps.decontaminatedIngest(docs, big)
    }
    assert(e.getMessage.contains("MaxBenchHashes"))
  }

  /** The st26 hybrid-forget batch feed: the st23 scenario's three CDC
    * batches over the documents⋈embeddings corpus. */
  private def hybridForgetBatches(): Seq[Seq[(Long, String, Array[Float], String)]] = {
    val t = Tables(spark, sf0001)
    val corpus = t.documents
      .join(t.embeddings, t.documents("doc_id") === t.embeddings("vec_id"))
      .select(t.documents("doc_id"), col("text"), col("embedding"))
    def ops(pred: org.apache.spark.sql.Column, op: String) =
      corpus.filter(pred).collect()
        .map(r => (r.getLong(0),
          if (op == "add") r.getString(1) else "",
          if (op == "add")
            r.getAs[scala.collection.Seq[Float]]("embedding").toArray
          else Array.empty[Float],
          op))
        .sortBy(_._1).toSeq
    Seq(
      ops(col("doc_id") % 3 === 0, "add"),
      ops(col("doc_id") % 3 === 1, "add") ++
        ops(col("doc_id") % 15 === 0 && col("doc_id") >= 32, "del"),
      ops(col("doc_id") % 3 === 2, "add") ++
        ops(col("doc_id") % 15 === 3 && col("doc_id") >= 32, "del"))
  }

  test("hybrid forget lane: stream == st26 twin, both arms' dead bytes leave disk") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hybrid_forget").toString
    val qIds = graft.operators.TextAnalysis.bm25QuerySet.map(_._1).distinct
    val input = MemoryStream[(Long, String, Array[Float], String)]
    val q = StreamingOps.hybridServingIngestTakedownCompacting(
      input.toDF().toDF("doc_id", "text", "embedding", "op"),
      graft.operators.TextAnalysis.bm25QuerySet,
      Tables(spark, sf0001).embeddings.filter(col("vec_id").isin(qIds: _*)),
      s"$dir/base", s"$dir/ckpt", lexCompactEvery = 3, annCompactEvery = 1)
    try {
      hybridForgetBatches().foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("snap", "n_segs", "base_upto", "n_appends", "gen",
          "n_dead_lex", "n_dead_ann", "q_id", "cand", "rrf", "rrf_rank")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
          r.getLong(8), r.getDouble(9), r.getLong(10))).toSet
    val served = rows(spark.read.parquet(s"$dir/base/results/*"))
    val twin = rows(
      Catalog.queries("st26_hybrid_takedown_compaction")(spark, sf0001))
    assert(served == twin && served.nonEmpty,
      s"served ${served.size} rows vs twin ${twin.size}")
    // the cross-arm divergence is evidence-visible, answer-invisible:
    // at snap 2 the ANN arm has folded (n_dead_ann = |mod15≡3| only)
    // while the lex arm still counts both takedown sets
    val corpus = Tables(spark, sf0001).documents
      .join(Tables(spark, sf0001).embeddings,
        Tables(spark, sf0001).documents("doc_id") ===
          Tables(spark, sf0001).embeddings("vec_id"))
      .select(Tables(spark, sf0001).documents("doc_id"))
    val d1 = corpus.filter(col("doc_id") % 15 === 0 && col("doc_id") >= 32)
      .count()
    val d2 = corpus.filter(col("doc_id") % 15 === 3 && col("doc_id") >= 32)
      .count()
    val snap2 = served.filter(_._1 == 2L)
    assert(snap2.map(t => (t._6, t._7)).toSet == Set((d1 + d2, d2)),
      s"snap-2 dead pair must diverge: lex ${d1 + d2}, ann $d2")
    // physical forget on both arms after the final gates: lex folded
    // (segments + ops GC'd into compacted/2 + ops_base/2), ann on a
    // consolidated generation, no dead row/code on disk in either tree
    val lexBase = s"$dir/base/lex"
    val annBase = s"$dir/base/ann"
    val deadSet = corpus
      .filter((col("doc_id") % 15 === 0 || col("doc_id") % 15 === 3) &&
        col("doc_id") >= 32)
      .collect().map(_.getLong(0)).toSet
    val lexSurvivors = spark.read.parquet(s"$lexBase/compacted/2/doclens")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(deadSet.nonEmpty && deadSet.forall(!lexSurvivors.contains(_)),
      "a dead doc's rows survived the lex fold on disk")
    val annGen = graft.operators.Pq.currentPqGen(spark, annBase)
    val annSurvivors = graft.operators.Pq
      .readPqIndex(spark, graft.operators.Pq.pqGenPath(annBase, annGen))
      .codes.select("vec_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(deadSet.forall(!annSurvivors.contains(_)),
      "a dead vec's codes survived the ann fold on disk")
    // tombstones themselves GC'd from both arms' surviving ops state
    val lexOps = spark.read.parquet(s"$lexBase/ops_base/2")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val annOps = spark.read.parquet(s"$annBase/ops_base/2")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(deadSet.forall(id => !lexOps.contains(id) && !annOps.contains(id)),
      "a GC'd tombstone's id still sits in a surviving ops summary")
  }

  test("packed-store lane: stream == st27 twin, dead tokens leave disk, restart invisible") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("packed_lane").toString
    val d = Tables(spark, sf0001).documents
    def ops(pred: org.apache.spark.sql.Column, op: String) =
      d.filter(pred).select("doc_id", "source", "text").collect()
        .map(r => (r.getLong(0), r.getString(1),
          if (op == "add") r.getString(2) else "", op))
        .sortBy(_._1).toSeq
    val batches = Seq(
      ops(col("doc_id") % 3 === 0, "add"),
      ops(col("doc_id") % 3 === 1, "add") ++
        ops(col("doc_id") % 15 === 0 && col("doc_id") >= 32, "del"),
      ops(col("doc_id") % 3 === 2, "add") ++
        ops(col("doc_id") % 15 === 3 && col("doc_id") >= 32, "del"))
    def lane(ckpt: String) = {
      val input = MemoryStream[(Long, String, String, String)]
      val q = StreamingOps.packedIngestWithTakedown(
        input.toDF().toDF("doc_id", "source", "text", "op"),
        s"$dir/base", s"$dir/$ckpt")
      (input, q)
    }
    val (in1, q1) = lane("ckpt1")
    try {
      batches.foreach { b => in1.addData(b); q1.processAllAvailable() }
    } finally q1.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("snap", "n_affected", "source", "example_idx", "n_tokens",
          "n_docs", "block_fp")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getString(6))).toSet
    val served = rows(spark.read.parquet(s"$dir/base/results/*"))
    val twin = rows(
      Catalog.queries("st27_stream_packed_takedown")(spark, sf0001))
    assert(served == twin && served.nonEmpty,
      s"served ${served.size} rows vs twin ${twin.size}")
    // the forget is physical: the final store's block texts equal a
    // fresh pack of the live corpus — no dead doc's tokens on disk
    val live = d.filter(!(col("doc_id") % 15).isin(0L, 3L) ||
        col("doc_id") < 32)
      .select("doc_id", "source", "text")
    def blocks(df: org.apache.spark.sql.DataFrame) =
      df.select("source", "example_idx", "block_fp", "block_text")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
          r.getString(3))).toSet
    assert(blocks(graft.operators.Corpus.readPackedShards(spark, s"$dir/base"))
      == blocks(graft.operators.Corpus.tokenBlocks(live, 512L,
        withText = true)),
      "the surviving store must equal a fresh pack of the live corpus")
    // restart with a fresh checkpoint: every batch replays, markers
    // skip the serves, the store and results are bit-stable
    val (in2, q2) = lane("ckpt2")
    try {
      batches.foreach { b => in2.addData(b); q2.processAllAvailable() }
    } finally q2.stop()
    assert(rows(spark.read.parquet(s"$dir/base/results/*")) == served,
      "an at-least-once replay must be invisible")
  }

  test("streaming LSH: bucket saturation cap bounds the hot cluster, cold buckets exact") {
    // n113's reasoning on the streaming-state axis: a planted
    // mega-cluster (one (band, sig) bucket) saturates at the cap —
    // per-bucket state and per-arrival verify stay O(cap) — while
    // every cold bucket's answer is untouched; with a cap wider than
    // any bucket the output is IDENTICAL to the uncapped lane.
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val hot = (100L until 120L).map(id =>
      (id, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    val cold = Seq(
      (1L, "red orange yellow green blue indigo violet pink brown black"),
      (2L, "red orange yellow green blue indigo violet pink brown white"))
    val batches = Seq(hot.take(8) ++ cold, hot.drop(8))
    def run(cap: Option[Int]): Set[(Long, Long)] = {
      val input = MemoryStream[(Long, String)]
      val name = s"sat_${cap.getOrElse(0)}"
      val q = StreamingOps.streamingNearDupPairs(
        input.toDF().toDF("doc_id", "text"), threshold = 0.6,
        maxBucket = cap)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update).start()
      try batches.foreach { b => input.addData(b); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val capped = run(Some(5))
    val uncapped = run(None)
    val wide = run(Some(1000))
    val hotIds = hot.map(_._1).toSet
    def hotPairs(s: Set[(Long, Long)]) =
      s.count(p => hotIds(p._1) && hotIds(p._2))
    // identical docs: every pair's first colliding band is band 0, so
    // the uncapped cluster emits C(20,2) and the capped one C(5,2) —
    // the bucket stopped at 5 members
    assert(hotPairs(uncapped) == 190, s"uncapped: ${hotPairs(uncapped)}")
    assert(hotPairs(capped) == 10, s"capped: ${hotPairs(capped)}")
    // the cold pair survives identically in all three runs
    assert(capped((1L, 2L)) && uncapped((1L, 2L)) && wide((1L, 2L)))
    // a cap wider than every bucket changes nothing (n113 ≡ n08)
    assert(wide == uncapped,
      s"wide-cap run must equal uncapped: ${wide.size} vs ${uncapped.size}")
  }

  test("capped lane equals the st29 batch twin — cap binding AND cap wide") {
    // st29's protocol leg (VERDICT r14 #1): the catalog entry is the
    // batch twin; THIS is the proof the MemoryStream run of the capped
    // lane computes the same pairs — including where the cap BINDS (a
    // planted 12-copy cluster under cap 5), which the oracle at the
    // harness SFs never exercises.
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val corpus = Tables(spark, sf0001).documents
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))) ++
      (10000L until 10012L).map(id =>
        (id, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    val sorted = corpus.sortBy(_._1) // arrival order = doc_id order
    val chunks = sorted.grouped((sorted.length + 2) / 3).toSeq
    def runStream(cap: Int): Map[(Long, Long), Double] = {
      val input = MemoryStream[(Long, String)]
      val name = s"st29_twin_$cap"
      val q = StreamingOps.streamingNearDupPairs(
        input.toDF().toDF("doc_id", "text"), threshold = 0.6,
        maxBucket = Some(cap))
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update).start()
      try chunks.foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jac")).toMap
    }
    def runTwin(cap: Int): Map[(Long, Long), Double] =
      graft.operators.Dedup.nearDuplicatePairsCapped(
        sorted.toSeq.toDF("doc_id", "text"), threshold = 0.6, maxBucket = cap)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jac")).toMap
    val cappedTwin = runTwin(5)
    assert(runStream(5) == cappedTwin, "binding-cap stream != twin")
    // the planted cluster's survivors: C(5,2), not C(12,2)
    val hotPairs = cappedTwin.keys.count(p => p._1 >= 10000L && p._2 >= 10000L)
    assert(hotPairs == 10, s"expected C(5,2)=10 planted pairs, got $hotPairs")
    // st29's shipped configuration: wide at harness SF ⇒ equals the
    // exact uncapped answer the DuckDB oracle computes
    val wideTwin = runTwin(64)
    assert(runStream(64) == wideTwin, "wide-cap stream != twin")
    assert(hotPairs < wideTwin.keys.count(p => p._1 >= 10000L && p._2 >= 10000L))
  }

  test("last-click lane: stream == st28 twin with cross-batch attributions, O(1) state") {
    // the state-bounding answer to st04's measured skew blowup
    // (PERF.md r14): one (ts, value) register per user instead of the
    // stream-stream join's window-buffered candidate sets. Events
    // arrive in three TIME-SPLIT micro-batches (the per-key-ordered
    // log shape the lane's contract names), so clicks from batch N
    // attribute purchases in batch N+1 through the retained register.
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val e = Tables(spark, sf0001).events
      .select(col("event_id"), col("user_id"),
        col("ts").cast("timestamp").as("ts"), col("event_type"),
        col("value"))
    val bounds = e.agg(
      org.apache.spark.sql.functions.min("ts"),
      org.apache.spark.sql.functions.max("ts")).head()
    val lo = bounds.getTimestamp(0).getTime
    val hi = bounds.getTimestamp(1).getTime
    val cut1 = new java.sql.Timestamp(lo + (hi - lo) / 3)
    val cut2 = new java.sql.Timestamp(lo + 2 * (hi - lo) / 3)
    def slice(pred: org.apache.spark.sql.Column) =
      e.filter(pred).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
          r.getString(3), r.getDouble(4))).toSeq
    val batches = Seq(
      slice(col("ts") < cut1),
      slice(col("ts") >= cut1 && col("ts") < cut2),
      slice(col("ts") >= cut2))
    val perBatch = scala.collection.mutable.ArrayBuffer.empty[Long]
    def run(name: String, retention: Option[String]): Unit = {
      val input = MemoryStream[(Long, Long, java.sql.Timestamp, String, Double)]
      val q = StreamingOps.lastClickAttribution(
        input.toDF().toDF("event_id", "user_id", "ts", "event_type", "value"),
        windowMinutes = 60, retention = retention)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update).start()
      try {
        batches.foreach { b =>
          input.addData(b); q.processAllAvailable()
          if (retention.isEmpty) perBatch += spark.table(name).count()
        }
      } finally q.stop()
    }
    run("last_click", None)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).getTime, r.getTimestamp(3).getTime,
        r.getDouble(4))).toSet
    val streamed = spark.table("last_click")
      .select("event_id", "user_id", "purchase_ts", "click_ts", "p_value")
    val twin = Catalog.queries("st28_attribution_lastclick")(spark, sf0001)
      .select(col("event_id"), col("user_id"),
        col("purchase_ts").cast("timestamp"),
        col("click_ts").cast("timestamp"), col("p_value"))
    assert(rows(streamed) == rows(twin) && rows(twin).nonEmpty,
      s"lane ${rows(streamed).size} rows vs st28 twin ${rows(twin).size}")
    // attributions arrived incrementally — some in every batch, so
    // cross-batch register retention is actually exercised
    assert(perBatch.head > 0 && perBatch.last > perBatch(1) &&
      perBatch(1) > perBatch.head,
      s"emission not incremental: $perBatch")
    // state-bounding retention (the register eviction) is answer-
    // invisible when retention covers the window: a dropped register's
    // attribution window expired strictly before the watermark reached
    // it, so no purchase it could still serve can arrive
    run("last_click_ret", Some("2 hours"))
    assert(rows(spark.table("last_click_ret")
        .select("event_id", "user_id", "purchase_ts", "click_ts", "p_value"))
      == rows(streamed),
      "retention-evicted run must serve identical attributions")
  }

  test("hybrid forget lane: replay between the lex and ann markers rewrites identical evidence") {
    // ADVICE r13 #1: the lex `_committed_batch_` marker is written
    // before the ann replay guard, so a crash between them replays the
    // batch with its own lex marker already committed. The serving
    // layout must EXCLUDE the in-flight id or n_segs overcounts by one
    // and the rewritten results/<id> breaks stream == twin and the
    // documented replay invisibility.
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hybrid_marker_window")
      .toString
    val qIds = graft.operators.TextAnalysis.bm25QuerySet.map(_._1).distinct
    val queryVecs = Tables(spark, sf0001).embeddings
      .filter(col("vec_id").isin(qIds: _*))
    val batches = hybridForgetBatches()
    def lane(ckpt: String, lexEvery: Int = 0, annEvery: Int = 0) = {
      val input = MemoryStream[(Long, String, Array[Float], String)]
      // run 1 disables the folds: the crash under test happens BEFORE
      // batch 1's gates ever ran, so the pre-crash tree must hold the
      // unfolded layout (and the no-fold layout makes the n_segs
      // prediction exact: batch 1 serves 2 = committed {0} + itself)
      val q = StreamingOps.hybridServingIngestTakedownCompacting(
        input.toDF().toDF("doc_id", "text", "embedding", "op"),
        graft.operators.TextAnalysis.bm25QuerySet, queryVecs,
        s"$dir/base", s"$dir/ckpt-$ckpt",
        lexCompactEvery = lexEvery, annCompactEvery = annEvery)
      (input, q)
    }
    val (in1, q1) = lane("a")
    try {
      batches.take(2).foreach { b => in1.addData(b); q1.processAllAvailable() }
    } finally q1.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("snap", "n_segs", "base_upto", "n_appends", "gen",
          "n_dead_lex", "n_dead_ann", "q_id", "cand", "rrf", "rrf_rank")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
          r.getLong(8), r.getDouble(9), r.getLong(10))).toSet
    val before = rows(spark.read.parquet(s"$dir/base/results/1"))
    assert(before.nonEmpty && before.forall(_._2 == 2L),
      "precondition: batch 1 serves n_segs = 2 (committed {0} + itself)")
    // the crash: batch 1's ann marker (the replay guard) never landed;
    // its lex marker and results did
    assert(new java.io.File(s"$dir/base/ann/_served_batch_1").delete(),
      "precondition: batch 1's ann marker must exist to delete")
    assert(new java.io.File(s"$dir/base/lex/_committed_batch_1").exists(),
      "precondition: batch 1's lex marker survives the crash")
    // restart with a fresh checkpoint AND the folds enabled — the
    // review-found residual window: batch 0 replays first (its guard
    // present, serve skipped) and runs the gates, which would fold
    // batch 1's half-committed segment/append (tail = 2, appendCount
    // = 1) BEFORE batch 1's replay serves — the replay would then
    // rewrite results/1 with gen+1 / n_appends 0 / base_upto 1. The
    // in-flight gate defers both folds until batch 1's guard lands.
    val (in2, q2) = lane("b", lexEvery = 2, annEvery = 1)
    try {
      batches.take(2).foreach { b => in2.addData(b); q2.processAllAvailable() }
    } finally q2.stop()
    val after = rows(spark.read.parquet(s"$dir/base/results/1"))
    assert(after == before,
      "a replay inside the lex/ann marker window must rewrite identical " +
        s"evidence; n_segs before=${before.map(_._2)} after=${after.map(_._2)}")
    // ...and the deferred folds DID run once the guard landed: the
    // linger window is the replayed batch, not forever
    assert(new java.io.File(s"$dir/base/lex/compacted/1").isDirectory,
      "the deferred lex fold must commit after the in-flight batch's guard")
    assert(graft.operators.Pq.currentPqGen(spark, s"$dir/base/ann") >= 1L,
      "the deferred ann fold must commit after the in-flight batch's guard")
  }

  test("measured state bounds: saturated bucket, last-click register, takedown buckets") {
    // VERDICT r14 #2: the O(cap)-bucket and O(1)-register claims were
    // proven by OUTPUT equality; this pins them as NUMBERS from the
    // state store itself (StateOperatorProgress.numRowsTotal /
    // memoryUsedBytes) on planted hot-key streams.
    implicit val sq = spark.sqlContext
    import spark.implicits._
    def stateAfter(q: org.apache.spark.sql.streaming.StreamingQuery)
        : (Long, Long) = {
      val sos = q.recentProgress.flatMap(_.stateOperators)
      (sos.map(_.numRowsTotal).max, sos.map(_.memoryUsedBytes).max)
    }
    // the FINAL batch's row count — eviction shrinks state, so the
    // latest progress is the claim, the max is the history
    def stateFinal(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
      q.recentProgress.flatMap(_.stateOperators)
        .lastOption.map(_.numRowsTotal).getOrElse(-1L)

    // (a) near-dup bucket state: a planted 60-copy identical cluster is
    // ONE logical bucket per band. numRowsTotal counts BUCKETS (one
    // state row per (band, sig)) so it is cap-invariant; the bound the
    // cap buys is each bucket's ENTRY LIST — visible as state memory.
    val hot = (0L until 60L).map(id =>
      (id, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    def runNearDup(cap: Option[Int]): (Long, Long) = {
      val input = MemoryStream[(Long, String)]
      val q = StreamingOps.streamingNearDupPairs(
        input.toDF().toDF("doc_id", "text"), threshold = 0.6, maxBucket = cap)
        .writeStream.format("memory")
        .queryName(s"state_neardup_${cap.getOrElse(0)}")
        .outputMode(OutputMode.Update).start()
      try hot.grouped(20).foreach { b =>
        input.addData(b.toSeq); q.processAllAvailable()
      } finally q.stop()
      stateAfter(q)
    }
    val (capRows, capMem) = runNearDup(Some(5))
    val (unRows, unMem) = runNearDup(None)
    // identical docs: 16 band buckets exactly, capped or not
    assert(capRows == 16L && unRows == 16L, s"buckets: $capRows vs $unRows")
    // 60 entries × 16 buckets uncapped vs 5 × 16 capped: the memory gap
    // must be structural, not noise (observed ~8×; assert a loose 2×)
    assert(unMem > 2 * capMem,
      s"cap must bound bucket memory: capped=$capMem uncapped=$unMem")

    // (b) last-click register: numRowsTotal == live users with a click
    // — O(1) per key regardless of the key's density — and retention
    // SHRINKS it when the watermark passes (click ts + retention).
    def lcBatch(users: Seq[Long], t: String) = users.flatMap { u =>
      Seq((u * 1000L, u, ts(t), "click", 1.0),
        (u * 1000L + 1L, u, new Timestamp(ts(t).getTime + 60000L),
          "purchase", 2.0))
    }
    def runLc(retention: Option[String],
        batches: Seq[Seq[(Long, Long, Timestamp, String, Double)]]): Long = {
      val input = MemoryStream[(Long, Long, Timestamp, String, Double)]
      val q = StreamingOps.lastClickAttribution(
        input.toDF().toDF("event_id", "user_id", "ts", "event_type", "value"),
        windowMinutes = 60, retention = retention)
        .writeStream.format("memory")
        .queryName(s"state_lc_${retention.isDefined}")
        .outputMode(OutputMode.Update).start()
      try batches.foreach { b => input.addData(b); q.processAllAvailable() }
      finally q.stop()
      stateFinal(q)
    }
    val early = lcBatch(1L to 8L, "2024-01-01 10:00:00")
    val late = lcBatch(Seq(100L), "2024-01-03 10:00:00")
    // no retention: every user with a click holds exactly one register
    assert(runLc(None, Seq(early, late)) == 9L,
      "one register per clicking user (8 early + 1 late)")
    // 1-day retention: the same stream's final batch carries a
    // watermark 2 days past the early registers — they are evicted,
    // leaving the late user's register alone (a second late batch
    // fires the timeouts for groups with no new data)
    assert(runLc(Some("1 day"), Seq(early, late, late.map(e =>
      (e._1 + 1000000L, e._2, e._3, e._4, e._5)))) == 1L,
      "retention must evict expired registers")

    // (c) takedown lane: bucket state rows = live (band, sig) buckets;
    // a tombstone keeps its bucket row (the LSM rule: tombstones
    // outlive rows) but removes the doc's entries
    val tkDocs = (0L until 10L).map(id =>
      (id, s"alpha beta gamma delta epsilon zeta eta theta iota end$id"))
    val input = MemoryStream[(Long, String)]
    val tks = MemoryStream[(Long, String)]
    val q = StreamingOps.streamingNearDupPairsWithTakedown(
      input.toDF().toDF("doc_id", "text"),
      tks.toDF().toDF("doc_id", "text"), threshold = 0.6)
      .writeStream.format("memory").queryName("state_tk")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(tkDocs); q.processAllAvailable()
      tks.addData(Seq(tkDocs.head)); q.processAllAvailable()
    } finally q.stop()
    val (tkRows, _) = stateAfter(q)
    // 10 near-identical docs share band buckets where their sigs agree;
    // the state row count is the DISTINCT bucket count — bounded by
    // 16 × docs, and unchanged by the takedown (tombstone retained)
    assert(tkRows > 0 && tkRows <= 160L, s"bucket rows: $tkRows")
  }

  test("hybrid forget lane: an orphan marker with no replayable batch cannot wedge the folds") {
    // ADVICE r14 #1: the in-flight fold gate defers around any
    // _committed_batch_/_trained_batch_ id lacking its replay guard.
    // A genuine crash-window id is replayed as the recovering run's
    // FIRST batch; an id from a DEAD batch numbering (fresh checkpoint,
    // retention-expired source) never re-serves, and before the age-out
    // it deferred compaction/GC on both arms forever — an unbounded
    // state-growth liveness hazard. The age-out: still unguarded after
    // ≥2 further gate evaluations of the same process ⇒ orphan, folds
    // resume (safe — marker order proves results/<id> is complete).
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hybrid_orphan").toString
    val qIds = graft.operators.TextAnalysis.bm25QuerySet.map(_._1).distinct
    val queryVecs = Tables(spark, sf0001).embeddings
      .filter(col("vec_id").isin(qIds: _*))
    // debris from a dead numbering: an ann train marker for a batch id
    // this run's numbering (0, 1, 2) never reaches — the realistic
    // residue of the train-marker→replay-guard crash window under a
    // later fresh-checkpoint restart
    new java.io.File(s"$dir/base/ann").mkdirs()
    assert(new java.io.File(s"$dir/base/ann/_trained_batch_99")
      .createNewFile())
    val input = MemoryStream[(Long, String, Array[Float], String)]
    val q = StreamingOps.hybridServingIngestTakedownCompacting(
      input.toDF().toDF("doc_id", "text", "embedding", "op"),
      graft.operators.TextAnalysis.bm25QuerySet, queryVecs,
      s"$dir/base", s"$dir/ckpt", lexCompactEvery = 2, annCompactEvery = 1)
    try {
      hybridForgetBatches().foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    // batch 0/1's gates defer (the orphan looks in-flight for its first
    // two evaluations — the same-checkpoint crash-window budget); batch
    // 2's gate ages it out and the folds resume
    assert(graft.operators.Pq.currentPqGen(spark, s"$dir/base/ann") >= 1L,
      "ann fold stayed wedged behind the orphan marker")
    assert(new java.io.File(s"$dir/base/lex/compacted/2").isDirectory,
      "lex fold stayed wedged behind the orphan marker")
    // the orphan only stopped GATING — nothing deleted it, and the
    // served answers are the same three snapshots a clean tree serves
    assert(new java.io.File(s"$dir/base/ann/_trained_batch_99").exists())
    assert((0 to 2).forall(i =>
      new java.io.File(s"$dir/base/results/$i").isDirectory))
  }

  test("hybrid forget lane: lex-folded/ann-torn cross-arm crash window leaks nothing and heals") {
    // THE cross-arm window (VERDICT r12 #2): the lex arm's fold
    // committed (its tombstones GC'd, dead rows off its disk) while the
    // ANN arm's fold crashed mid-flight — torn next generation (no
    // _gen_ marker) AND torn ops_base survivors summary (markerless).
    // The claim: no one-sided leak in ANY window (each arm resolves
    // liveness from its own complete ops copy), the torn artifacts are
    // invisible, and the next gate heals them.
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.operators.Pq
    val dir = java.nio.file.Files.createTempDirectory("hybrid_forget_crash")
      .toString
    val qIds = graft.operators.TextAnalysis.bm25QuerySet.map(_._1).distinct
    val queryVecs = Tables(spark, sf0001).embeddings
      .filter(col("vec_id").isin(qIds: _*))
    val batches = hybridForgetBatches()
    def lane(ckpt: String, annEvery: Int) = {
      val input = MemoryStream[(Long, String, Array[Float], String)]
      val q = StreamingOps.hybridServingIngestTakedownCompacting(
        input.toDF().toDF("doc_id", "text", "embedding", "op"),
        graft.operators.TextAnalysis.bm25QuerySet, queryVecs,
        s"$dir/base", s"$dir/ckpt-$ckpt",
        lexCompactEvery = 2, annCompactEvery = annEvery)
      (input, q)
    }
    // run 1: batches 0-1 with the ANN gate disabled — the lex arm
    // folds after batch 1 (2 tail segments), the ANN arm never does:
    // the maximal watermark divergence
    val (in1, q1) = lane("a", annEvery = 0)
    try {
      batches.take(2).foreach { b => in1.addData(b); q1.processAllAvailable() }
    } finally q1.stop()
    val annBase = s"$dir/base/ann"
    assert(new java.io.File(s"$dir/base/lex/compacted/1").isDirectory,
      "precondition: the lex fold must have committed")
    // inject the torn ANN fold: generation 1 fully materialized but
    // markerless, survivors summary dir present but uncommitted
    Pq.writePqIndex(Pq.readPqIndex(spark, Pq.pqGenPath(annBase, 0L)),
      Pq.pqGenPath(annBase, 1L))
    val obDir = new java.io.File(s"$annBase/ops_base/1")
    assert(obDir.mkdirs())
    java.nio.file.Files.writeString(
      new java.io.File(obDir, "part-torn.parquet").toPath, "torn")
    assert(Pq.currentPqGen(spark, annBase) == 0L,
      "a markerless generation must be invisible to the swap pointer")
    assert(Pq.pqOpsWatermark(spark, annBase).isEmpty,
      "an uncommitted (markerless) ops_base must not become the watermark")
    // the would-be leak, checked AT the crash moment: if the torn
    // ops_base were trusted as the watermark, batch-1's tombstones
    // would stop being read (their adds lost from the garbage summary)
    // — the permanent forget leak ADVICE r12 named. The liveness fold
    // over the torn state must still count them.
    val tD1 = Tables(spark, sf0001).documents
      .join(Tables(spark, sf0001).embeddings,
        Tables(spark, sf0001).documents("doc_id") ===
          Tables(spark, sf0001).embeddings("vec_id"))
      .select(Tables(spark, sf0001).documents("doc_id"))
      .filter(col("doc_id") % 15 === 0 && col("doc_id") >= 32).count()
    val (_, nBefore) = Pq.readPqTakedownLiveness(spark, annBase, Seq(0L, 1L))
    assert(nBefore == tD1,
      s"torn ops_base must not eat batch-1 tombstones: $nBefore vs $tD1")
    // run 2 (restart, fresh checkpoint): the replayed batches' GATES
    // still run (they sit outside the replay guard), so the very first
    // gate heals the torn fold — the linger window is one micro-batch
    // even across a restart; batch 2 then serves post-heal
    val (in2, q2) = lane("b", annEvery = 1)
    try {
      batches.foreach { b => in2.addData(b); q2.processAllAvailable() }
    } finally q2.stop()
    // in the divergence window the ANSWERS never moved: every snapshot's
    // fused ranking equals the st23 twin's (same scenario, no folds) —
    // fold cadence and crash windows are answer-invisible
    def answers(df: org.apache.spark.sql.DataFrame) =
      df.select("snap", "q_id", "cand", "rrf", "rrf_rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getLong(4))).toSet
    val served = spark.read.parquet(s"$dir/base/results/*")
    assert(answers(served) == answers(
      Catalog.queries("st23_hybrid_serving_takedown")(spark, sf0001)) &&
      answers(served).nonEmpty,
      "fused answers must equal the fold-free twin's in every crash window")
    // by snap 2's serve BOTH arms have healed and folded (the lex fold
    // in run 1, the ann fold at the first replayed batch's gate), so
    // each counts only the new takedowns — the watermarks reconverged
    val t = Tables(spark, sf0001)
    val corpus = t.documents.join(t.embeddings,
        t.documents("doc_id") === t.embeddings("vec_id"))
      .select(t.documents("doc_id"))
    val d2 = corpus.filter(col("doc_id") % 15 === 3 && col("doc_id") >= 32)
      .count()
    val ev = served.filter(col("snap") === 2L)
      .select("n_dead_lex", "n_dead_ann").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(ev == Seq((d2, d2)),
      s"snap-2 dead pair after the heal must be ($d2, $d2), got $ev")
    // healed: the gate refolded over the torn generation, committed a
    // real survivors summary, and swept the torn ops_base
    val g = Pq.currentPqGen(spark, annBase)
    assert(g >= 1L, "the healing fold must have committed a generation")
    val deadSet = corpus
      .filter((col("doc_id") % 15 === 0 || col("doc_id") % 15 === 3) &&
        col("doc_id") >= 32)
      .collect().map(_.getLong(0)).toSet
    val annSurvivors = Pq.readPqIndex(spark, Pq.pqGenPath(annBase, g))
      .codes.select("vec_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(deadSet.nonEmpty && deadSet.forall(!annSurvivors.contains(_)),
      "a dead vec's codes survived the healing ann fold")
    assert(!new java.io.File(s"$annBase/ops_base/1").exists(),
      "the torn ops_base must be swept once a real watermark commits")
    assert(Pq.pqOpsWatermark(spark, annBase).contains(2L),
      "the healed watermark must be the committed survivors summary")
  }

  test("stateful lanes are state-store-provider-agnostic: RocksDB == default provider, and RocksDB actually engages") {
    // The default HDFSBackedStateStore keeps every store's state on the
    // executor HEAP — at 100 TB / long-horizon streams the production
    // provider is RocksDB (state spills to local disk, bounded heap).
    // Pin that BOTH stateful lanes (the flatMapGroupsWithState near-dup
    // buckets and the mapGroupsWithState-style last-click register)
    // produce byte-identical output under RocksDB, i.e. nothing in the
    // state encoders/timeout handling silently assumes the default
    // provider. An isolated session scopes the provider conf.
    val rocks = SparkSpec.session.newSession()
    rocks.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    def nearDupPairs(s: org.apache.spark.sql.SparkSession,
        name: String): (Set[(Long, Long)], Boolean) = {
      implicit val sq = s.sqlContext
      import s.implicits._
      val docRows = Tables(s, sf0001).documents
        .select(col("doc_id"), col("text"))
        .collect().map(r => (r.getLong(0), r.getString(1)))
        .sortBy(_._1).toSeq
      val input = MemoryStream[(Long, String)]
      val q = StreamingOps.streamingNearDupPairs(
        input.toDF().toDF("doc_id", "text"), threshold = 0.6)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update).start()
      try docRows.grouped(math.max(1, docRows.size / 3)).foreach { b =>
        input.addData(b); q.processAllAvailable()
      } finally q.stop()
      import scala.jdk.CollectionConverters._
      val usedRocks = q.recentProgress.flatMap(_.stateOperators)
        .exists(_.customMetrics.keySet.asScala.exists(_.contains("rocksdb")))
      (s.table(name).collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
        usedRocks)
    }
    val (defPairs, defRocks) = nearDupPairs(spark, "prov_default")
    val (rocksPairs, rocksUsed) = nearDupPairs(rocks, "prov_rocks")
    assert(!defRocks, "default-provider run unexpectedly reported rocksdb metrics")
    assert(rocksUsed, "RocksDB provider did not engage — conf not applied")
    assert(defPairs.nonEmpty && rocksPairs == defPairs,
      s"near-dup lane: rocksdb ${rocksPairs.size} pairs vs default ${defPairs.size}")

    def lastClicks(s: org.apache.spark.sql.SparkSession,
        name: String): Set[(Long, Long, Long, Long, Double)] = {
      implicit val sq = s.sqlContext
      import s.implicits._
      val ev = Tables(s, sf0001).events
        .select(col("event_id"), col("user_id"),
          col("ts").cast("timestamp").as("ts"), col("event_type"),
          col("value"))
        .orderBy("ts", "event_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
          r.getString(3), r.getDouble(4))).toSeq
      val input = MemoryStream[(Long, Long, java.sql.Timestamp, String, Double)]
      val q = StreamingOps.lastClickAttribution(
        input.toDF().toDF("event_id", "user_id", "ts", "event_type", "value"),
        windowMinutes = 60)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update).start()
      try ev.grouped(math.max(1, ev.size / 3)).foreach { b =>
        input.addData(b); q.processAllAvailable()
      } finally q.stop()
      s.table(name)
        .select("event_id", "user_id", "purchase_ts", "click_ts", "p_value")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getTimestamp(2).getTime, r.getTimestamp(3).getTime,
          r.getDouble(4))).toSet
    }
    val defAttr = lastClicks(spark, "prov_default_lc")
    val rocksAttr = lastClicks(rocks, "prov_rocks_lc")
    assert(defAttr.nonEmpty && rocksAttr == defAttr,
      s"last-click lane: rocksdb ${rocksAttr.size} rows vs default ${defAttr.size}")
  }
}
