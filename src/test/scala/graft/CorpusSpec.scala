package graft

import graft.operators.Corpus
import org.apache.spark.sql.functions._

/** Corpus-curation operators: clustering, contamination, sampling. */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: chain, triangle and isolated pair resolve to min labels") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("d1", "d2")
    val got = Corpus.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("reliable-checkpoint path (checkpointDir) produces identical components") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    try {
      val pairs = Seq(
        (1L, 2L), (2L, 3L), (3L, 4L),
        (10L, 11L), (11L, 12L),
        (20L, 21L)).toDF("d1", "d2")
      val reliable = Corpus.connectedComponents(pairs, checkpointDir = Some(dir))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val local = Corpus.connectedComponents(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(reliable == local)
      // the reliable path actually wrote round snapshots to storage
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, "reliable checkpoints must persist to the checkpoint dir")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir)): Unit
    }
  }

  test("long path needs multiple propagation rounds and still converges") {
    val n = 40 // path 0-1-2-...-40: diameter forces ~log rounds with min-label prop
    val pairs = (0 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("d1", "d2")
    val got = Corpus.connectedComponents(pairs, maxIter = 50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n + 1 && got.values.forall(_ == 0L))
  }

  test("cluster ids partition the near-dup docs of the catalog query") {
    val rows = Catalog.queries("n07_dup_clusters")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_.getLong(1))
    // every cluster's id is its smallest member
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_.getLong(0)).min == cid)
      assert(members.length >= 2, s"cluster $cid must have >= 2 members")
    }
  }

  test("mergeClusterLabels: planted merge topologies equal a full rebuild") {
    val oldPairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("d1", "d2")
    val labels = Corpus.connectedComponents(oldPairs)
    // 20 bridges the two old clusters; 30-31 is a fresh cluster; 41
    // links prior singleton 40; (1,3) is a redundant same-cluster pair
    val newPairs = Seq((20L, 3L), (20L, 10L), (30L, 31L), (41L, 40L), (1L, 3L))
      .toDF("d1", "d2")
    val merged = Corpus.mergeClusterLabels(labels, newPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Corpus.connectedComponents(oldPairs.unionByName(newPairs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == full)
    assert(merged(11L) == 1L, "old clusters merged via bridge keep the global min")
    assert(merged(41L) == 40L && merged(30L) == 30L)
  }

  test("incremental clusters (n42) equal n07's full rebuild on the harness corpus") {
    val inc = Catalog.queries("n42_incremental_clusters")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Catalog.queries("n07_dup_clusters")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc == full && inc.nonEmpty)
  }

  test("contamination screen catches a planted benchmark copy") {
    val passage = (1 to 12).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (10L, s"$passage tail tail tail"),        // doc_id % 10 == 0 → benchmark
      (11L, s"prefix words here then $passage"), // contaminated
      (12L, (1 to 30).map(i => s"other$i").mkString(" "))) // clean
      .toDF("doc_id", "text")
    // the ONE shared window-hash implementation
    val wh = graft.operators.TextAnalysis.windowHashes(docs)
      .select(col("doc_id"), col("win_hash").as("h"))
    val bench = wh.filter(col("doc_id") % 10 === 0).select("h").distinct()
    val hits = wh.filter(col("doc_id") % 10 =!= 0).distinct()
      .join(bench, Seq("h"))
      .select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(hits == Set(11L))
  }

  test("sequence packing: bins fill to budget, overflow by at most one doc") {
    val budget = 2048L
    val rows = Catalog.queries("n18_seq_pack")(spark, sf0001).collect()
      .map(r => (r.getString(1), r.getLong(3), r.getLong(2))) // (source, bin, n_tokens)
    assert(rows.nonEmpty)
    rows.groupBy(t => (t._1, t._2)).foreach { case ((src, bin), docs) =>
      val total = docs.map(_._3).sum
      val largest = docs.map(_._3).max
      // a bin closes only once it reaches the budget; the closing doc
      // may overflow it, so total < budget + largest
      assert(total < budget + largest, s"($src,$bin): $total")
    }
    // global fill: by the end of any non-last bin the cumulative token
    // count has crossed that bin's budget boundary (no bin closes early)
    rows.groupBy(_._1).foreach { case (src, docs) =>
      val perBin = docs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      val last = perBin.keys.max
      var cum = 0L
      perBin.toSeq.sortBy(_._1).foreach { case (bin, total) =>
        cum += total
        if (bin != last)
          assert(cum >= (bin + 1) * budget,
            s"($src,$bin) closed at cumulative $cum < ${(bin + 1) * budget}")
      }
    }
  }

  test("cluster reps: representative is the longest member of its cluster") {
    val clusters = Catalog.queries("n07_dup_clusters")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val chars = Tables(spark, sf0001).documents
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val reps = Catalog.queries("n19_cluster_reps")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(reps.nonEmpty)
    val byCluster = clusters.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(reps.map(_._1).toSet == byCluster.keySet)
    reps.foreach { case (cid, rep, repChars, nDocs) =>
      val members = byCluster(cid)
      assert(members.contains(rep))
      assert(nDocs == members.length)
      assert(repChars == chars(rep))
      val best = members.map(m => (chars(m), -m)).max
      assert((chars(rep), -rep) == best, s"cluster $cid: rep $rep not best")
    }
  }

  test("count-min sketch bounds the exact heavy-hitter counts") {
    val toks = Tables(spark, sf0001).documents
      .select(explode(split(col("text"), " ")).as("tok"))
    val n = toks.count()
    // one-pass mergeable sketch — the no-shuffle scale path for
    // frequency queries; CMS guarantees exact <= est <= exact + eps*N
    val cms = toks.stat.countMinSketch("tok", 0.001, 0.9999, 42)
    val top = Catalog.queries("n35_heavy_hitters")(spark, sf0001).collect()
    assert(top.length == 20)
    top.foreach { r =>
      val (tok, exact) = (r.getString(0), r.getLong(1))
      val est = cms.estimateCount(tok)
      assert(est >= exact && est <= exact + (0.001 * n).toLong + 1,
        s"$tok: est $est vs exact $exact (N=$n)")
    }
  }

  test("n36 CMS estimates bound the exact counts within eps*N") {
    // the hash-oracled CMS (d=4, w=512): est >= exact is structural;
    // the upper band est <= exact + (e/w)*N is the standard CMS
    // guarantee, comfortably met on this corpus (CorpusSpec pins it so
    // a hash-function or width regression is caught at spec scale too)
    val n = Tables(spark, sf0001).documents
      .select(explode(split(col("text"), " ")).as("tok")).count()
    val eps = math.E / 512
    Catalog.queries("n36_cms_heavy_hitters")(spark, sf0001).collect().foreach { r =>
      val (exact, est) = (r.getAs[Long]("n"), r.getAs[Long]("est"))
      assert(r.getAs[Boolean]("est_ge_exact"))
      assert(est >= exact && est <= exact + (eps * n).toLong + 1,
        s"${r.getString(0)}: est $est vs exact $exact (N=$n)")
    }
  }

  test("clearClusterCache: labels rebuild transparently after a clear") {
    val a = Catalog.queries("n07_dup_clusters")(spark, sf0001).collect()
    graft.operators.Corpus.clearClusterCache(spark)
    val b = Catalog.queries("n07_dup_clusters")(spark, sf0001).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("repetition metrics: planted loop scores high, diverse text low") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),          // pure loop
      (2L, "the quick brown fox jumps over a lazy sleeping dog"), // diverse
      (3L, "ab cd ab cd ab cd ab cd"),                           // period-2 loop
      (4L, "one"), (5L, "one two")                               // short-doc guards
    ).toDF("doc_id", "text")
    val m = graft.operators.TextAnalysis.repetitionMetrics(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(m(1L)._1 == 1.0 && m(1L)._2 == (1.0 - 1.0 / 7))
    assert(m(2L)._1 == 0.1 && m(2L)._2 == 0.0 && m(2L)._3 == 0.0)
    assert(m(3L)._2 > 0.7 && m(3L)._3 > 0.6)
    assert(m(4L) == ((1.0, 0.0, 0.0))) // 1 token: no n-grams, no crash
    assert(m(5L)._3 == 0.0)            // 2 tokens: no 3-grams
  }

  test("stratified sample: ~10% per stratum, deterministic") {
    val a = Catalog.queries("n27_stratified_sample")(spark, sf0001).collect()
    val b = Catalog.queries("n27_stratified_sample")(spark, sf0001).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    val perLang = Tables(spark, sf0001).documents
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    a.groupBy(_.getString(1)).foreach { case (lang, rows) =>
      assert(rows.length == math.ceil(perLang(lang) * 0.1).toInt,
        s"$lang: ${rows.length} of ${perLang(lang)}")
    }
  }

  test("gopher rules: each gate fails on its planted violation") {
    import graft.operators.TextAnalysis
    val good = ((1 to 60).map(i => s"word$i") ++ Seq("the", "a")).mkString(" ")
    val short = "the a few words only"                        // r_len
    val repeats = (Seq.fill(60)("spam") ++ Seq("the", "a")).mkString(" ") // r_ttr
    val noStop = (1 to 60).map(i => s"word$i").mkString(" ")  // r_stop
    val docs = Seq((1L, good), (2L, short), (3L, repeats), (4L, noStop))
      .toDF("doc_id", "text")
    val m = TextAnalysis.gopherRules(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getAs[Boolean]("passes"))
    assert(!m(2L).getAs[Boolean]("r_len") && !m(2L).getAs[Boolean]("passes"))
    assert(!m(3L).getAs[Boolean]("r_ttr") && !m(3L).getAs[Boolean]("passes"))
    assert(!m(4L).getAs[Boolean]("r_stop") && !m(4L).getAs[Boolean]("passes"))
  }

  test("mixtureResample hits the exact integer mixture and is deterministic") {
    // counts: a=10, b=7, c=3; parts a:3, b:2 => m = min(10/3, 7/2) = 3
    // => targets a=9, b=6; c is not in the mixture and must vanish
    val docs = (
      (1 to 10).map(i => (i.toLong, "a")) ++
      (11 to 17).map(i => (i.toLong, "b")) ++
      (18 to 20).map(i => (i.toLong, "c"))).toDF("doc_id", "src")
    val parts = Seq("a" -> 3L, "b" -> 2L)
    val out = Corpus.mixtureResample(docs, parts, keyCol = "src")
    val byKey = out.groupBy("src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKey == Map("a" -> 9L, "b" -> 6L))
    // deterministic: identical id set across runs, and a subset of input
    val ids1 = out.select("doc_id").as[Long].collect().toSet
    val ids2 = Corpus.mixtureResample(docs, parts, keyCol = "src")
      .select("doc_id").as[Long].collect().toSet
    assert(ids1 == ids2 && ids1.subsetOf((1L to 20L).toSet))
    // a parts key missing from the data starves the mixture to zero
    // (m = min over joined keys only when the key EXISTS; absent key
    // never joins, so it cannot raise m — but it also cannot be
    // satisfied; the caller sees its absence in the output)
    val out2 = Corpus.mixtureResample(docs, parts :+ ("z" -> 1L), "src")
    assert(!out2.select("src").as[String].collect().contains("z"))
  }

  test("n50: tfidf top terms match hand-computed smoothed scores") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "cherry durian durian durian")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.tfidfTopTerms(docs, k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(4)) -> (r.getString(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // N=3; df: apple 1, banana 2, cherry 2, durian 1
    // idf = ln((N+1)/(df+1)) + 1: rare 1.6931..., common 1.2876...
    val rare = math.log(2.0) + 1
    val common = math.log(4.0 / 3.0) + 1
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(out((1L, 1L)) == ("apple", 2L, r6(2 * rare)))
    assert(out((1L, 2L)) == ("banana", 1L, r6(common)))
    assert(!out.contains((1L, 3L)), "doc 1 has only two distinct terms")
    assert(out((3L, 1L)) == ("durian", 3L, r6(3 * rare)))
    assert(out((3L, 2L)) == ("cherry", 1L, r6(common)))
    // equal scores break ties lexicographically by token
    assert(out((2L, 1L)) == ("banana", 1L, r6(common)))
    assert(out((2L, 2L)) == ("cherry", 1L, r6(common)))
  }

  test("chunkWindows: total coverage, stride positions, window bound, exact fingerprints") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 20).map(i => s"t$i").mkString(" ")), // 20 tokens: chunks at 0,8,16
      (2L, "a b c"),                                  // shorter than one window
      (3L, (1 to 16).map(i => s"u$i").mkString(" "))) // exactly one full window + tail at 8
      .toDF("doc_id", "text")
    val out = graft.operators.Corpus.chunkWindows(docs, window = 16, stride = 8)
      .collect().groupBy(_.getLong(0))
    val c1 = out(1L).sortBy(_.getAs[Long]("chunk_idx"))
    assert(c1.map(_.getAs[Long]("start_tok")).toSeq == Seq(0L, 8L, 16L))
    assert(c1.map(_.getAs[Long]("n_tok")).toSeq == Seq(16L, 12L, 4L))
    assert(out(2L).map(r => (r.getAs[Long]("start_tok"), r.getAs[Long]("n_tok"))).toSeq
      == Seq((0L, 3L)))
    // every token position is covered by at least one chunk
    c1.foreach(r => assert(r.getAs[Long]("n_tok") <= 16))
    val covered = c1.flatMap(r =>
      r.getAs[Long]("start_tok") until (r.getAs[Long]("start_tok") + r.getAs[Long]("n_tok"))).toSet
    assert(covered == (0L until 20L).toSet)
    // fingerprint is md5 of the space-joined token slice
    val fp0 = c1.head.getAs[String]("fp")
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest((1 to 16).map(i => s"t$i").mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(fp0 == expect)
    // identical windows in different docs share a fingerprint (what
    // chunk-level dedup keys on)
    val dup = Seq((10L, "x y z w"), (11L, "x y z w")).toDF("doc_id", "text")
    val fps = graft.operators.Corpus.chunkWindows(dup, 16, 8)
      .select("fp").collect().map(_.getString(0))
    assert(fps.distinct.length == 1)
  }

  // ------------------------------------------------------------------
  // tokenBlocks (n82): concat-and-chunk exact-length materialization
  // ------------------------------------------------------------------

  private def blockRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("source", "example_idx").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))

  test("tokenBlocks: exact-length blocks crossing doc boundaries, eos-separated") {
    // one shard: docs of 3, 2, 4 tokens (+eos each) = 12-token stream
    val docs = Seq(
      (1L, "a1 a2 a3", "web"),
      (2L, "b1 b2", "web"),
      (3L, "c1 c2 c3 c4", "web")).toDF("doc_id", "text", "source")
    val out = blockRows(Corpus.tokenBlocks(docs, blockLen = 5L))
    // stream: a1 a2 a3 <eos> b1 | b2 <eos> c1 c2 c3 | c4 <eos>
    val stream = "a1 a2 a3 <eos> b1 b2 <eos> c1 c2 c3 c4 <eos>".split(" ")
    def fp(toks: Array[String]) = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(toks.mkString(" ").getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    assert(out.length == 3)
    assert(out(0) == (("web", 0L, 5L, 2L, fp(stream.slice(0, 5)))))
    assert(out(1) == (("web", 1L, 5L, 2L, fp(stream.slice(5, 10)))))
    assert(out(2) == (("web", 2L, 2L, 1L, fp(stream.slice(10, 12)))), "final block runs short")
  }

  test("tokenBlocks: shards pack independently and totals reconcile") {
    val docs = Seq(
      (1L, "a1 a2 a3 a4 a5 a6 a7", "web"),
      (2L, "b1 b2 b3", "web"),
      (10L, "x1 x2", "books"),
      (11L, "y1", "books")).toDF("doc_id", "text", "source")
    val out = blockRows(Corpus.tokenBlocks(docs, blockLen = 4L))
    val bySrc = out.groupBy(_._1)
    // every shard's example_idx starts at 0 and is dense
    bySrc.foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (0L until rows.length).toSeq)
    }
    // per shard, sum(n_tokens) == sum(doc tokens + 1)
    assert(bySrc("web").map(_._3).sum == 7 + 1 + 3 + 1)
    assert(bySrc("books").map(_._3).sum == 2 + 1 + 1 + 1)
    // all but the last block of each shard are exactly blockLen
    bySrc.foreach { case (_, rows) =>
      rows.sortBy(_._2).dropRight(1).foreach(r => assert(r._3 == 4L))
    }
  }

  test("tokenBlocks: a doc longer than blockLen spans several exact blocks") {
    val docs = Seq((1L, (1 to 11).map(i => s"t$i").mkString(" "), "web"))
      .toDF("doc_id", "text", "source")
    val out = blockRows(Corpus.tokenBlocks(docs, blockLen = 4L))
    assert(out.map(_._3).toSeq == Seq(4L, 4L, 4L)) // 11 tokens + eos = 12
    assert(out.forall(_._4 == 1L))
  }

  test("corpusCard: volume, dup rate and composition entropies on a hand corpus (n85)") {
    val docs = Seq(
      (1L, "a b c", "en", "web"),
      (2L, "a b c", "en", "web"),       // exact duplicate of 1
      (3L, "d e", "en", "web"),
      (4L, "f g h i", "de", "books"))
      .toDF("doc_id", "text", "lang", "source")
    val r = Corpus.corpusCard(docs).collect().head
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Long]("n_tokens") == 3 + 3 + 2 + 4)
    assert(r.getAs[Long]("vocab_size") == 9L) // a..i
    assert(math.abs(r.getAs[Double]("dup_rate") - 0.25) < 1e-9)
    assert(math.abs(r.getAs[Double]("mean_doc_tokens") - 3.0) < 1e-9)
    val h = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert(math.abs(r.getAs[Double]("lang_entropy") - h) < 1e-5)
    assert(math.abs(r.getAs[Double]("source_entropy") - h) < 1e-5)
  }

  test("tokenBlocks: deterministic across runs") {
    val docs = Seq(
      (2L, "b1 b2 b3 b4 b5", "web"),
      (1L, "a1 a2", "web")).toDF("doc_id", "text", "source")
    val a = blockRows(Corpus.tokenBlocks(docs, blockLen = 3L))
    val b = blockRows(Corpus.tokenBlocks(docs.orderBy(col("doc_id").desc), blockLen = 3L))
    assert(a.toSeq == b.toSeq, "input order must not change the packing")
  }

  test("packed takedown: untouched shards byte-identical, dead tokens off disk, emptied shard deleted") {
    // the file-level half of n112's contract — what DuckDB cannot
    // attest: the rewrite touches ONLY the affected shards' files (no
    // corpus-sized rewrite hiding behind a correct answer), the dead
    // doc's tokens are gone from every surviving block_text on disk,
    // and a shard whose every doc died is deleted (dynamic partition
    // overwrite alone would leave its stale blocks lingering)
    val base = java.nio.file.Files.createTempDirectory("packed_tk").toString
    val docs = Seq(
      (1L, "sA", "alpha beta gamma delta"),
      (2L, "sA", "epsilon zeta"),
      (3L, "sB", "SECRETTOKEN leaks here"),
      (4L, "sB", "ordinary words only"),
      (5L, "sC", "doomedshard single doc")).toDF("doc_id", "source", "text")
    Corpus.writePackedShards(docs, base, 4L)
    def shardFiles(src: String): Map[String, (Long, Long, Int)] = {
      val d = new java.io.File(s"$base/blocks/source=$src")
      if (!d.isDirectory) Map.empty
      else d.listFiles().filter(_.isFile).map { f =>
        f.getName -> (f.length(), f.lastModified(),
          java.util.Arrays.hashCode(
            java.nio.file.Files.readAllBytes(f.toPath)))
      }.toMap
    }
    val beforeA = shardFiles("sA")
    assert(beforeA.nonEmpty)
    // one takedown hits sB (partial) and sC (whole shard dies)
    val n = Corpus.takedownPackedShards(spark, base, docs,
      Seq(3L, 5L).toDF("doc_id"), 4L)
    assert(n == 2L, s"two shards affected, got $n")
    assert(shardFiles("sA") == beforeA,
      "an untouched shard's files must be byte- and mtime-identical")
    assert(!new java.io.File(s"$base/blocks/source=sC").exists(),
      "a fully-emptied shard's partition must be deleted")
    val store = Corpus.readPackedShards(spark, base)
    val texts = store.select("block_text").collect().map(_.getString(0))
    assert(texts.nonEmpty &&
      !texts.exists(t => t.contains("SECRETTOKEN") || t.contains("doomedshard")),
      "a taken-down doc's tokens survived in a packed block on disk")
    // the surviving store equals a fresh pack of the live corpus
    val live = docs.filter(!col("doc_id").isin(3L, 5L))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("source", "example_idx", "n_tokens", "n_docs", "block_fp",
          "block_text")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getString(4), r.getString(5))).toSet
    assert(rows(store) ==
      rows(Corpus.tokenBlocks(live, 4L, withText = true)))
    // idempotent redelivery: the same takedown again affects the dead
    // docs' shards no more (they are gone from the live corpus view)
    assert(Corpus.takedownPackedShards(spark, base, live,
      Seq(3L, 5L).toDF("doc_id"), 4L) == 0L)
    assert(rows(Corpus.readPackedShards(spark, base)) ==
      rows(Corpus.tokenBlocks(live, 4L, withText = true)))
  }
}
