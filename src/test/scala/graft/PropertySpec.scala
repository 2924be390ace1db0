package graft

import graft.operators.{Corpus, Dedup}
import graft.plans.AsOfJoin
import org.scalacheck.Gen

/** Property tests: operators vs brute-force models on random inputs
  * (fixed seeds — deterministic, not flaky). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g(Gen.Parameters.default, org.scalacheck.rng.Seed(seed)).get

  test("jaccardPairs equals the brute-force pair model on random corpora") {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val doc = Gen.listOfN(12, word).map(_.mkString(" "))
    (1 to 5).foreach { seed =>
      val texts = sample(Gen.listOfN(30, doc), seed)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = Dedup.jaccardPairs(docs, threshold = 0.3)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap

      // brute-force model with plain Scala sets
      def shingles(t: String): Set[String] =
        t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      val sh = texts.map(shingles)
      val want = (for {
        i <- texts.indices; j <- texts.indices if i < j
        inter = (sh(i) intersect sh(j)).size
        if inter > 0
        jac = inter.toDouble / (sh(i).size + sh(j).size - inter)
        if jac >= 0.3
      } yield ((i.toLong, j.toLong), jac)).toMap

      assert(got.keySet == want.keySet,
        s"seed $seed: missing=${(want.keySet -- got.keySet).take(3)} " +
          s"spurious=${(got.keySet -- want.keySet).take(3)}")
      got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-12) }
    }
  }

  test("native as-of join equals the brute-force model on random tables") {
    val gen = for {
      left <- Gen.listOfN(60, Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 100L)))
      right <- Gen.listOfN(40, Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 100L)))
    } yield (left, right)
    (1 to 5).foreach { seed =>
      val (l, r) = sample(gen, seed)
      val left = l.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("id", "k", "t")
      // unique (key, ts, rid) with rid as deterministic tiebreak payload
      val right = r.distinct.zipWithIndex
        .map { case ((k, t), i) => (k, t, i.toLong) }
      val rightDf = right.toDF("rk", "rt", "rid")
      val got = AsOfJoin.asof(left, rightDf, "k", "rk", "t", "rt")
        .select("id", "rid").collect()
        .map(row => row.getLong(0) -> Option(row.get(1))).toMap

      val want = l.zipWithIndex.map { case ((k, t), i) =>
        val cands = right.filter(x => x._1 == k && x._2 <= t)
        // greatest rt; among equal rt the exec keeps the LAST consumed in
        // (rk, rt) sort order — ties on (k,rt) are broken by max rid
        // because the sort is not stable on rid; assert only on rt value
        i.toLong -> cands.map(_._2).maxOption
      }.toMap
      got.foreach { case (id, ridOpt) =>
        val wantRt = want(id)
        ridOpt match {
          case None => assert(wantRt.isEmpty, s"seed $seed id $id: expected a match")
          case Some(rid) =>
            val rt = right.find(_._3 == rid.asInstanceOf[Long]).get._2
            assert(wantRt.contains(rt), s"seed $seed id $id: rt $rt vs $wantRt")
        }
      }
    }
  }

  test("containmentPairs equals the brute-force model on random corpora") {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val doc = Gen.choose(4, 14).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    (1 to 5).foreach { seed =>
      val texts = sample(Gen.listOfN(25, doc), seed)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = Dedup.containmentPairs(docs, threshold = 0.5)
        .collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Double]("containment")))
        .toMap

      def shingles(t: String): Set[String] =
        t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      val sh = texts.map(shingles)
      val want = (for {
        i <- texts.indices; j <- texts.indices if i < j
        si = sh(i); sj = sh(j)
        inter = (si intersect sj).size
        if inter > 0 && math.min(si.size, sj.size) > 0
        cont = inter.toDouble / math.min(si.size, sj.size)
        if cont >= 0.5
        contained = if (si.size <= sj.size) i.toLong else j.toLong
        container = if (si.size <= sj.size) j.toLong else i.toLong
      } yield ((contained, container), cont)).toMap

      assert(got.keySet == want.keySet,
        s"seed $seed: missing=${(want.keySet -- got.keySet).take(3)} " +
          s"spurious=${(got.keySet -- want.keySet).take(3)}")
      got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-12) }
    }
  }

  test("packSequences equals the sequential binning model on random corpora") {
    val budget = 10L
    val docGen = Gen.zip(Gen.oneOf("s1", "s2", "s3"), Gen.choose(1, 15))
    (1 to 5).foreach { seed =>
      val rows = sample(Gen.listOfN(40, docGen), seed).zipWithIndex.map {
        case ((src, nTok), i) =>
          (i.toLong, src, (0 until nTok).map(w => s"w$w").mkString(" "))
      }
      val docs = rows.toDF("doc_id", "source", "text")
      val got = Corpus.packSequences(docs, budget)
        .select("doc_id", "bin").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap

      // sequential model: exclusive running token count per source,
      // integer-divided by the budget
      val want = rows.groupBy(_._2).flatMap { case (_, ds) =>
        var cum = 0L
        ds.sortBy(_._1).map { case (id, _, text) =>
          val bin = cum / budget
          cum += text.split(" ").length
          id -> bin
        }
      }.toMap
      assert(got == want, s"seed $seed: ${(got.toSet diff want.toSet).take(3)}")
    }
  }

  test("protobuf decoder: random byte soup never crashes the JVM or hangs") {
    // decode failures must surface as ordinary exceptions the pipeline's
    // per-feed isolation catches — never unbounded allocation, stack
    // overflow, or an infinite varint loop. 200 deterministic random
    // payloads across a range of sizes.
    val gen = Gen.choose(0, 400).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)))
    (1 to 200).foreach { seed =>
      val bytes = sample(gen, seed).toArray
      try {
        val out = graft.sources.GtfsRt.decodeFeed(bytes)
        // decoded garbage must still be bounded by the payload itself
        assert(out.length <= bytes.length + 1)
      } catch {
        case e: Exception => assert(e.getMessage != null || true) // controlled failure
        case e: StackOverflowError => fail(s"seed $seed: stack overflow")
      }
    }
  }

  test("repetitionMetrics handles a 100k-token adversarial doc (and matches brute force)") {
    // Round-4 de-quadratic proof: the former top_tok_frac formulation
    // scanned the token array once per DISTINCT token — on this doc
    // (100k tokens, ~50k distinct) that is ~5×10⁹ comparisons in ONE
    // task and does not finish interactively; the sort+run-length form
    // is a single O(L log L) pass. Completing at all (bounded below) IS
    // the demonstration; exactness is checked against a Scala model.
    val n = 100000
    // every even position is a unique token, odd positions repeat "the"
    // → ~50k distinct tokens, top multiplicity = 50k
    val toks = (0 until n).map(i => if (i % 2 == 1) "the" else s"tok$i")
    val docs = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val row = graft.operators.TextAnalysis.repetitionMetrics(docs).head()
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 60.0, f"top_tok_frac took $sec%.1f s on a 100k-token doc " +
      "— the per-doc scan has gone quadratic again")
    val counts = toks.groupBy(identity).map(_._2.size)
    assert(row.getAs[Long]("n_tokens") == n.toLong)
    assert(row.getAs[Double]("top_tok_frac") == counts.max.toDouble / n)
  }

  test("connectedComponents equals union-find on random graphs") {
    val gen = Gen.listOfN(50, Gen.zip(Gen.choose(0L, 24L), Gen.choose(0L, 24L)))
    (1 to 5).foreach { seed =>
      val raw = sample(gen, seed).filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val pairs = raw.toDF("d1", "d2")
      val got = Corpus.connectedComponents(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      // union-find model
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      raw.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = raw.flatMap(p => Seq(p._1, p._2)).distinct
      val want = nodes.map(n => n -> find(n)).toMap
      assert(got == want, s"seed $seed: first diff ${
        (got.toSet diff want.toSet).take(3)}")
    }
  }

  test("mergeClusterLabels equals full CC for ANY old/new split of random graphs") {
    val gen = Gen.listOfN(60, Gen.zip(Gen.choose(0L, 29L), Gen.choose(0L, 29L)))
    (1 to 5).foreach { seed =>
      val raw = sample(gen, seed).filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      // deterministic split: edge index parity decides old vs new —
      // exercises bridges, fresh clusters, singletons and redundant
      // same-cluster pairs without hand-picking topologies
      val (oldE, newE) = raw.zipWithIndex.partition(_._2 % 2 == 0)
      val oldPairs = oldE.map(_._1).toDF("d1", "d2")
      val newPairs = newE.map(_._1).toDF("d1", "d2")
      if (oldE.nonEmpty && newE.nonEmpty) {
        val merged = Corpus.mergeClusterLabels(
          Corpus.connectedComponents(oldPairs), newPairs)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val full = Corpus.connectedComponents(raw.toDF("d1", "d2"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(merged == full, s"seed $seed: first diff ${
          (merged.toSet diff full.toSet).take(3)}")
      }
    }
  }

  test("tokenBlocks conserves tokens and equals the sequential chunking model") {
    val word = Gen.oneOf("aa", "bb", "cc", "dd")
    val doc = Gen.choose(1, 9).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val srcG = Gen.oneOf("s0", "s1", "s2")
    (1 to 5).foreach { seed =>
      val rows = sample(Gen.listOfN(25, Gen.zip(doc, srcG)), seed)
        .zipWithIndex.map { case ((t, s), i) => (i.toLong, t, s) }
      val L = 7L
      val got = Corpus.tokenBlocks(rows.toDF("doc_id", "text", "source"), L)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getString(4))).toMap

      // sequential model: concat per source in doc_id order, chunk by L
      rows.groupBy(_._3).foreach { case (src, ds) =>
        val stream = ds.sortBy(_._1).flatMap(d => d._2.split(" ") :+ "<eos>")
        val blocks = stream.grouped(L.toInt).toSeq
        val mine = got.filter(_._1._1 == src)
        assert(mine.size == blocks.size, s"seed $seed src $src block count")
        blocks.zipWithIndex.foreach { case (b, i) =>
          val (nTok, _, fp) = mine((src, i.toLong))
          assert(nTok == b.size, s"seed $seed src $src block $i size")
          val d = java.security.MessageDigest.getInstance("MD5")
            .digest(b.mkString(" ").getBytes("UTF-8"))
          assert(fp == d.map("%02x".format(_)).mkString,
            s"seed $seed src $src block $i content")
        }
      }
    }
  }

  test("bm25TopK equals the textbook formula on random corpora") {
    val word = Gen.oneOf("red", "green", "blue", "cyan", "teal", "pink")
    val doc = Gen.choose(2, 10).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    (1 to 5).foreach { seed =>
      val texts = sample(Gen.listOfN(20, doc), seed)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val queries = Seq((1L, "red"), (2L, "green"), (2L, "blue"))
        .toDF("q_id", "term")
      val got = graft.operators.TextAnalysis.bm25TopK(docs, queries, k = 50)
        .collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("doc_id")) ->
          r.getAs[Double]("score")).toMap

      // textbook model in plain Scala (k1 = 1.2, b = 0.75)
      val toks = texts.map(_.split(" ").toSeq)
      val n = texts.size.toDouble
      val avgdl = toks.map(_.size).sum / n
      def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
      def score(q: Seq[String], d: Int): Double = r6(q.map { t =>
        val tf = toks(d).count(_ == t).toDouble
        if (tf == 0) 0.0
        else {
          val df = toks.count(_.contains(t)).toDouble
          r6(math.log(1.0 + (n - df + 0.5) / (df + 0.5)) *
            (tf * (1.2 + 1.0)) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * toks(d).size / avgdl)))
        }
      }.sum)
      val want = (for {
        (qid, terms) <- Seq(1L -> Seq("red"), 2L -> Seq("green", "blue"))
        d <- texts.indices
        s = score(terms, d) if terms.exists(toks(d).contains)
      } yield (qid, d.toLong) -> s).toMap
      assert(got.keySet == want.keySet, s"seed $seed keys")
      got.foreach { case (k, v) =>
        assert(math.abs(v - want(k)) < 1e-9, s"seed $seed $k: $v vs ${want(k)}")
      }
    }
  }

  test("temperatureMix targets equal the closed-form model on random corpora") {
    val srcG = Gen.oneOf("s0", "s1", "s2", "s3")
    val doc = Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.const("w")).map(_.mkString(" ")))
    (1 to 5).foreach { seed =>
      val rows = sample(Gen.listOfN(30, Gen.zip(doc, srcG)), seed)
        .zipWithIndex.map { case ((t, s), i) => (i.toLong, t, s) }
      val total = 12L; val alpha = 0.5
      val got = graft.operators.Selection
        .temperatureMix(rows.toDF("doc_id", "text", "source"), total, alpha, "p0")
        .groupBy("source").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

      def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
      val bySrc = rows.groupBy(_._3)
      val toks = bySrc.view.mapValues(_.map(_._2.split(" ").length.toLong).sum).toMap
      val t = toks.values.sum.toDouble
      val q = toks.view.mapValues(v => r6(math.pow(v / t, alpha))).toMap
      val z = q.values.map(BigDecimal(_)).sum.toDouble
      bySrc.foreach { case (src, ds) =>
        val target = math.min(
          math.floor((total.toDouble * q(src)) / z).toLong, ds.size.toLong)
        assert(got.getOrElse(src, 0L) == target,
          s"seed $seed $src: ${got.getOrElse(src, 0L)} vs $target")
      }
    }
  }

  test("dropBoilerplate equals the frequency-count model on random multi-line docs") {
    val line = Gen.oneOf("banner text", "nav bar", "u1 one", "u2 two",
      "u3 three", "u4 four", "u5 five")
    val doc = Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, line).map(_.mkString("\n")))
    (1 to 5).foreach { seed =>
      val rows = sample(Gen.listOfN(15, doc), seed)
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val minDocs = 3L
      val got = graft.operators.LineDedup.dropBoilerplate(
          graft.operators.LineDedup.linesByDelim(rows.toDF("doc_id", "text")),
          minDocs, sep = "\n")
        .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap

      val df = rows.flatMap { case (id, t) => t.split("\n", -1).distinct.map(_ -> id) }
        .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).distinct.size }
      val boiler = df.filter(_._2 >= minDocs).keySet
      rows.foreach { case (id, t) =>
        val lines = t.split("\n", -1)
        val wantDropped = lines.count(boiler)
        val wantClean = lines.filterNot(boiler).mkString("\n")
        assert(got(id) == ((wantDropped.toLong, wantClean)), s"seed $seed doc $id")
      }
    }
  }
}
