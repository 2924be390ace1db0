package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, IncrementalDedup}

/** Incremental cross-snapshot dedup (VERDICT r03 #1): the planted
  * two-snapshot proofs — incremental == full rebuild, the Parquet
  * round-trip changes nothing, appends grow the index correctly, and
  * the persisted hot-shingle list keeps banding consistent across
  * snapshots. */
class IncrementalDedupSpec extends SparkSpec {

  private def docs = Tables(spark, sf0001).documents
  private def prior = docs.filter(col("doc_id") % 2 === 0)
  private def fresh = docs.filter(col("doc_id") % 2 === 1)

  private def pairSet(df: DataFrame, c1: String, c2: String): Set[(Long, Long)] =
    df.select(c1, c2).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("incremental near-dup probe equals full rebuild restricted to cross pairs") {
    val incremental = pairSet(
      IncrementalDedup.nearDupPairsAgainstIndex(
        fresh, IncrementalDedup.buildIndex(prior), threshold = 0.6),
      "d_new", "d_prior")
    // full rebuild over the whole corpus, restricted to (odd, even) pairs
    val full = Dedup.nearDuplicatePairs(docs, threshold = 0.6)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => a % 2 != b % 2 }
      .map { case (a, b) => if (a % 2 == 1) (a, b) else (b, a) }
      .toSet
    assert(incremental == full,
      s"missed ${(full -- incremental).size}, extra ${(incremental -- full).size}")
  }

  test("parquet round-trip: probe from the persisted index alone matches in-memory") {
    val dir = java.nio.file.Files.createTempDirectory("incr_index").toString
    IncrementalDedup.buildAndWriteIndex(prior, dir)
    val fromDisk = IncrementalDedup.readIndex(spark, dir)
    val inMem = IncrementalDedup.buildIndex(prior)

    val a = pairSet(
      IncrementalDedup.nearDupPairsAgainstIndex(fresh, fromDisk, 0.6),
      "d_new", "d_prior")
    val b = pairSet(
      IncrementalDedup.nearDupPairsAgainstIndex(fresh, inMem, 0.6),
      "d_new", "d_prior")
    assert(a == b && a.nonEmpty)

    // survivors identical too — and computed without the prior docs frame
    val sa = IncrementalDedup.dedupAgainstIndex(fresh, fromDisk, 0.6)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val sb = IncrementalDedup.dedupAgainstIndex(fresh, inMem, 0.6)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sa == sb)
  }

  test("appendToIndex grows the index identically to a rebuild over the union") {
    import spark.implicits._
    val base = docs.filter(col("doc_id") % 3 === 0)
    val batch1 = docs.filter(col("doc_id") % 3 === 1)
    val batch2 = docs.filter(col("doc_id") % 3 === 2)

    val dir = java.nio.file.Files.createTempDirectory("incr_append").toString
    IncrementalDedup.buildAndWriteIndex(base, dir)
    IncrementalDedup.appendToIndex(batch1, dir)
    val appended = IncrementalDedup.readIndex(spark, dir)
    val rebuilt = IncrementalDedup.buildIndex(base.unionByName(batch1))

    val a = pairSet(
      IncrementalDedup.nearDupPairsAgainstIndex(batch2, appended, 0.6),
      "d_new", "d_prior")
    val b = pairSet(
      IncrementalDedup.nearDupPairsAgainstIndex(batch2, rebuilt, 0.6),
      "d_new", "d_prior")
    assert(a == b && a.nonEmpty,
      s"appended-index probe ${a.size} pairs vs rebuild ${b.size}")

    // decontamination probe agrees as well
    val ca = IncrementalDedup.contaminatedAgainstIndex(batch2, appended)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cb = IncrementalDedup.contaminatedAgainstIndex(batch2, rebuilt)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ca == cb)
  }

  test("manifest commit: a crash between component appends is invisible, retry recovers O(batch)") {
    val base = docs.filter(col("doc_id") % 3 === 0)
    val batch1 = docs.filter(col("doc_id") % 3 === 1)
    val probeBatch = docs.filter(col("doc_id") % 3 === 2)

    val dir = java.nio.file.Files.createTempDirectory("incr_atomic").toString
    IncrementalDedup.buildAndWriteIndex(base, dir)
    val beforeProbe = pairSet(
      IncrementalDedup.nearDupPairsAgainstIndex(
        probeBatch, IncrementalDedup.readIndex(spark, dir), 0.6),
      "d_new", "d_prior")

    // crash injection: two of five component writes land, then death —
    // the torn state a mid-append crash leaves on disk
    intercept[RuntimeException] {
      IncrementalDedup.appendToIndexImpl(batch1, dir, "b1",
        failAfterComponents = 2)
    }
    // the torn batch is INVISIBLE: same committed labels, and a probe
    // reads the exact pre-batch state (no torn fingerprint/band mix)
    assert(IncrementalDedup.committedLabels(spark, dir) == Seq("base"))
    val tornProbe = pairSet(
      IncrementalDedup.nearDupPairsAgainstIndex(
        probeBatch, IncrementalDedup.readIndex(spark, dir), 0.6),
      "d_new", "d_prior")
    assert(tornProbe == beforeProbe, "torn append leaked into a read")

    // recovery = retry the SAME label: partial dirs overwritten, then
    // one manifest commit — no compaction, nothing else re-read
    IncrementalDedup.appendToIndex(batch1, dir, "b1")
    assert(IncrementalDedup.committedLabels(spark, dir) == Seq("b1", "base"))
    val recovered = pairSet(
      IncrementalDedup.nearDupPairsAgainstIndex(
        probeBatch, IncrementalDedup.readIndex(spark, dir), 0.6),
      "d_new", "d_prior")
    val rebuilt = pairSet(
      IncrementalDedup.nearDupPairsAgainstIndex(
        probeBatch, IncrementalDedup.buildIndex(base.unionByName(batch1)), 0.6),
      "d_new", "d_prior")
    assert(recovered == rebuilt && recovered.nonEmpty,
      s"recovered probe ${recovered.size} pairs vs rebuild ${rebuilt.size}")
  }

  test("compaction heals a crash-replayed append (file level) and matches a fresh build") {
    import spark.implicits._
    val base = docs.filter(col("doc_id") % 3 === 0)
    // planted near-dup pair across the append/probe batches, so the
    // replay-corrupts-jaccard claim is checkable regardless of what the
    // harness corpus happens to contain
    val stem = "shared tokens one two three four five six seven eight nine ten"
    val batch1 = docs.filter(col("doc_id") % 3 === 1)
      .unionByName(Seq((1000001L, s"$stem endA")).toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("spec"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .select(docs.columns.map(col): _*))
    val batch2 = docs.filter(col("doc_id") % 3 === 2)
      .unionByName(Seq((1000002L, s"$stem endB")).toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("spec"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .select(docs.columns.map(col): _*))

    val dir = java.nio.file.Files.createTempDirectory("incr_replay").toString
    IncrementalDedup.buildAndWriteIndex(base, dir)
    IncrementalDedup.appendToIndex(batch1, dir)
    IncrementalDedup.appendToIndex(batch1, dir) // crash-midway retry: batch lands twice

    val replayed = IncrementalDedup.readIndex(spark, dir)
    val freshIdx = IncrementalDedup.buildIndex(base.unionByName(batch1))
    val want = IncrementalDedup.nearDupPairsAgainstIndex(batch2, freshIdx, 0.6)
      .select("d_new", "d_prior", "jac").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // the replayed index is corrupt to probe: duplicated shingle rows
    // double the common counts, so at least one jac value is wrong
    val corrupt = IncrementalDedup.nearDupPairsAgainstIndex(batch2, replayed, 0.6)
      .select("d_new", "d_prior", "jac").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(corrupt != want, "replayed index should corrupt the probe")

    // compacted rewrite probes exactly like the fresh build
    val out = java.nio.file.Files.createTempDirectory("incr_compact").toString
    IncrementalDedup.compactAndRewrite(spark, dir, out)
    val compacted = IncrementalDedup.readIndex(spark, out)
    val got = IncrementalDedup.nearDupPairsAgainstIndex(batch2, compacted, 0.6)
      .select("d_new", "d_prior", "jac").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want && got.nonEmpty)

    // and the component row counts are back to one copy per row
    assert(compacted.shingles.count() == freshIdx.shingles.distinct().count())
    assert(compacted.sizes.count() == freshIdx.sizes.count())
  }

  test("compaction under a df-cap retro-caps the banding (hot list recomputed)") {
    import spark.implicits._
    // base: the hot boilerplate appears once — under cap 3 it is NOT hot
    // at build time. Appends add 4 more copies, so corpus-wide df = 5 > 3:
    // an append-only index keeps banding on the stale (empty) hot list;
    // compaction must recompute it.
    def boiler(tag: Int) =
      s"all rights reserved contact us at legal department office $tag"
    val base = Seq((0L, boiler(0)), (1L, "completely unrelated words apple banana cherry"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("incr_cap").toString
    IncrementalDedup.writeIndex(IncrementalDedup.buildIndex(base, dfCap = Some(3L)), dir)
    (2 to 5).foreach { i =>
      IncrementalDedup.appendToIndex(Seq((i.toLong, boiler(i))).toDF("doc_id", "text"), dir)
    }
    val appended = IncrementalDedup.readIndex(spark, dir)
    assert(appended.hotShingles.count() == 0, "append path never grows the hot list")

    val out = java.nio.file.Files.createTempDirectory("incr_cap_out").toString
    IncrementalDedup.compactAndRewrite(spark, dir, out, dfCap = Some(3L))
    val compacted = IncrementalDedup.readIndex(spark, out)
    // the 8 shared boilerplate shingles (df 5) are hot now...
    assert(compacted.hotShingles.count() > 0)
    // ...and the rebuilt bands exclude them: same answer as a fresh
    // capped build over the accumulated corpus
    val all = base.unionByName(
      (2 to 5).map(i => (i.toLong, boiler(i))).toDF("doc_id", "text"))
    val freshCapped = IncrementalDedup.buildIndex(all, dfCap = Some(3L))
    val bandsA = compacted.bands.select("doc_id", "band", "sig").collect()
      .map(r => (r.getLong(0), r.get(1), r.get(2))).toSet
    val bandsB = freshCapped.bands.select("doc_id", "band", "sig").collect()
      .map(r => (r.getLong(0), r.get(1), r.get(2))).toSet
    assert(bandsA == bandsB)
  }

  test("exact fingerprint screen catches sub-shingle-length duplicates") {
    import spark.implicits._
    // 2-word docs: empty shingle set, invisible to MinHash — only the
    // fingerprint tier can drop the cross-snapshot duplicate
    val priorDocs = Seq((0L, "tiny doc"), (2L, "other text")).toDF("doc_id", "text")
    val newDocs = Seq((1L, "tiny doc"), (3L, "fresh thing")).toDF("doc_id", "text")
    val idx = IncrementalDedup.buildIndex(priorDocs)
    val survivors = IncrementalDedup.dedupAgainstIndex(newDocs, idx, 0.6)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == Set(3L))
    // normalized variant also drops the case-mutated twin
    val mutated = Seq((5L, "  TINY   DOC "), (7L, "fresh thing")).toDF("doc_id", "text")
    val survNorm = IncrementalDedup.dedupAgainstIndex(mutated, idx, 0.6,
      normalize = true).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survNorm == Set(7L))
  }

  test("persisted hot list keeps capped banding consistent across snapshots") {
    import spark.implicits._
    // boilerplate header hot in the PRIOR corpus; the planted cross-
    // snapshot near-dup pair shares plenty of non-hot shingles
    val boiler = "terms of service apply to this page"
    def body(i: Int) = s"unique payload $i alpha beta gamma delta epsilon zeta"
    val priorDocs = ((0 until 40).map(i => (i.toLong * 2, s"$boiler ${body(i)}")) :+
      (1000L, s"target document shared core alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val newDocs = Seq(
      (1001L, s"target document shared core alpha beta gamma delta epsilon zeta eta iota"),
      (1003L, "completely unrelated content nothing in common here at all"))
      .toDF("doc_id", "text")

    val dir = java.nio.file.Files.createTempDirectory("incr_hot").toString
    // cap 10 makes every boilerplate shingle hot (df=40) while the
    // target pair's shared shingles (df<=2) all survive
    IncrementalDedup.buildAndWriteIndex(priorDocs, dir, dfCap = Some(10L))
    val idx = IncrementalDedup.readIndex(spark, dir)
    assert(idx.hotShingles.count() > 0, "cap should have flagged boilerplate")

    val pairs = pairSet(
      IncrementalDedup.nearDupPairsAgainstIndex(newDocs, idx, 0.5),
      "d_new", "d_prior")
    assert(pairs.contains((1001L, 1000L)),
      s"planted pair lost under capped banding: $pairs")

    // the capped probe agrees with the uncapped full rebuild on this pair
    val full = Dedup.nearDuplicatePairs(priorDocs.unionByName(newDocs), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full.contains((1000L, 1001L)))
  }

  test("incremental curation drops planted cross-snapshot dups, keeps clean docs") {
    import spark.implicits._
    def words(tag: String, n: Int) = (0 until n).map(w => s"${tag}_w$w").mkString(" ")
    val priorDocs = Seq(
      (0L, "en", "web", words("a", 30)),
      (2L, "en", "web", words("b", 30))).toDF("doc_id", "lang", "source", "text")
    val newDocs = Seq(
      (1L, "en", "web", words("a", 30)),           // exact dup of 0 → dropped
      (3L, "en", "web", words("b", 30) + " extra_tail_token"), // near-dup of 2 → dropped
      (5L, "en", "web", words("c", 30)),           // clean → kept
      (7L, "en", "web", "too short"),              // fails quality → dropped
      (9L, "en", "web", words("c", 30)))           // intra-batch dup of 5 → dropped
      .toDF("doc_id", "lang", "source", "text")
    val out = graft.pipeline.TrainingData.curateIncremental(
      newDocs, IncrementalDedup.buildIndex(priorDocs), threshold = 0.6)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(5L), s"survivors: $out")
  }

  test("bloom screen equals the plain exact anti-join and drops a planted dup") {
    import spark.implicits._
    val idx = IncrementalDedup.buildIndex(prior)
    val viaBloom = IncrementalDedup.bloomScreenExact(fresh, idx)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaAntiJoin = fresh
      .join(prior.select(md5(col("text").cast("binary")).as("__k")).distinct()
          .join(fresh.select(col("doc_id"),
            md5(col("text").cast("binary")).as("__k")), Seq("__k"))
          .select("doc_id"),
        Seq("doc_id"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaBloom == viaAntiJoin)

    // planted cross-snapshot exact dup is dropped, clean doc kept —
    // proof the bloom's maybe-path actually verifies and drops
    val priorDocs = Seq((0L, "shared body text"), (2L, "other content"))
      .toDF("doc_id", "text")
    val newDocs = Seq((1L, "shared body text"), (3L, "novel content"))
      .toDF("doc_id", "text")
    val out = IncrementalDedup.bloomScreenExact(
      newDocs, IncrementalDedup.buildIndex(priorDocs))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(3L), s"survivors: $out")
  }

  test("bloom prefilter rejects almost all novel fingerprints (the pruning claim)") {
    val idx = IncrementalDedup.buildIndex(prior)
    val bloom = idx.fingerprints.select(xxhash64(col("fp")).as("h"))
      .stat.bloomFilter("h", 1L << 20, 0.01)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos); bos.toByteArray
    }
    // sf0.001 has no cross-parity exact dups, so every fresh doc that
    // passes the filter is a false positive — at fpp 1% over 25 docs,
    // more than a couple would mean the filter isn't pruning
    val probe = graft.functions.GraftFunctions.might_contain(
      lit(bytes), xxhash64(md5(col("text").cast("binary"))))
    val maybes = fresh.filter(probe).count()
    val total = fresh.count()
    assert(maybes <= total / 5,
      s"bloom passed $maybes of $total novel docs — not pruning")
  }

  test("catalog survivors = new batch minus exact and near hits (internal consistency)") {
    val idx = IncrementalDedup.buildIndex(prior)
    val near = IncrementalDedup.nearDupPairsAgainstIndex(fresh, idx, 0.6)
      .select("d_new").collect().map(_.getLong(0)).toSet
    val exact = IncrementalDedup.exactDupsAgainstIndex(fresh, idx)
      .select("d_new").collect().map(_.getLong(0)).toSet
    val survivors = IncrementalDedup.dedupAgainstIndex(fresh, idx, 0.6)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = fresh.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == all -- near -- exact)
    assert(near.nonEmpty, "fixture should contain cross-snapshot near-dups")
  }

  test("tombstone delete: probe == rebuild on survivors; deleted content re-arrives freely (n93)") {
    import spark.implicits._
    val idx = IncrementalDedup.buildIndex(prior)
    val tombstones = prior.filter(col("doc_id") % 4 === 0).select("doc_id")
    val deleted = IncrementalDedup.deleteFromIndex(idx, tombstones)
    val probeDeleted = IncrementalDedup.dedupAgainstIndex(fresh, deleted, 0.6)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val rebuilt = IncrementalDedup.dedupAgainstIndex(fresh,
        IncrementalDedup.buildIndex(prior.filter(col("doc_id") % 4 === 2)), 0.6)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(probeDeleted == rebuilt && probeDeleted.nonEmpty)
    // the takedown guarantee: an exact copy of a DELETED doc's content
    // is accepted by the deleted index and blocked by the original.
    // The victim must be content-UNIQUE within the prior (the corpus
    // plants dup clusters — a victim with a surviving twin would
    // correctly stay blocked, which is not the property under test).
    val inPair = Dedup.nearDuplicatePairs(prior, 0.6).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val exactDup = prior.groupBy(md5(col("text").cast("binary")))
      .agg(collect_list(col("doc_id")).as("ids"), count(lit(1)).as("n"))
      .filter(col("n") > 1).select(explode(col("ids")))
      .collect().map(_.getLong(0)).toSet
    val victimId = tombstones.collect().map(_.getLong(0)).sorted
      .find(id => !inPair(id) && !exactDup(id)).get
    val victim = prior.filter(col("doc_id") === victimId)
      .select("text").head.getString(0)
    val rearrival = Seq((9000001L, victim)).toDF("doc_id", "text")
    def accepted(i: graft.operators.DedupIndex) =
      IncrementalDedup.dedupAgainstIndex(rearrival, i, 0.6).count()
    assert(accepted(idx) == 0L, "original index must block the copy")
    assert(accepted(deleted) == 1L, "deleted index must accept the copy")
  }

  test("doc-keyed winHashes: takedown exact for decontamination, delete+compact == rebuild (n96)") {
    import spark.implicits._
    val idx = IncrementalDedup.buildIndex(prior)
    val tombstones = prior.filter(col("doc_id") % 4 === 0).select("doc_id")
    val deleted = IncrementalDedup.deleteFromIndex(idx, tombstones)
    def screen(i: graft.operators.DedupIndex) =
      IncrementalDedup.contaminatedAgainstIndex(fresh, i)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rebuilt = screen(
      IncrementalDedup.buildIndex(prior.filter(col("doc_id") % 4 === 2)))
    // exact IMMEDIATELY (no compaction needed) ...
    assert(screen(deleted) == rebuilt)
    // ... and compaction materializes the same answer: delete + compact
    // == full rebuild INCLUDING the contamination component
    assert(screen(IncrementalDedup.compactIndex(deleted)) == rebuilt)
    // the delete actually removed attributed rows (not a vacuous pass)
    assert(deleted.winHashes.count() < idx.winHashes.count())

    // attribution guard, controlled corpus: a window shared between a
    // deleted and a surviving doc KEEPS screening (the naive set-minus
    // would lose it); a window unique to the deleted doc STOPS.
    val sharedSpan = (1 to 8).map(i => s"shared$i").mkString(" ")
    val uniqueSpan = (1 to 8).map(i => s"unique$i").mkString(" ")
    val bench = Seq(
      (1L, s"$sharedSpan $uniqueSpan"),
      (2L, s"$sharedSpan alive tail tokens beyond the window")).toDF("doc_id", "text")
    val bidx = IncrementalDedup.deleteFromIndex(
      IncrementalDedup.buildIndex(bench), Seq(1L).toDF("doc_id"))
    val probes = Seq((101L, sharedSpan), (102L, uniqueSpan)).toDF("doc_id", "text")
    val flagged = IncrementalDedup.contaminatedAgainstIndex(probes, bidx)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flagged == Set(101L),
      s"shared window must screen, unique-to-deleted must not: $flagged")
  }
}
