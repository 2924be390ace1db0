package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Similarity-search semantics + custom expression parity. */
class SimilaritySpec extends SparkSpec {

  test("brute-force top-k: neighbors are correctly ranked and complete") {
    val rows = Catalog.queries("n10_cosine_topk")(spark, sf0001).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 32)
    byQ.foreach { case (_, rs) =>
      assert(rs.length == 5)
      val cosines = rs.sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("cos"))
      assert(cosines.sameElements(cosines.sortBy(-_)), "rank order broken")
    }
  }

  test("ANN results are a subset of correctly-ranked candidates") {
    val ann = Catalog.queries("n11_ann_lsh")(spark, sf0001).collect()
    val exact = Catalog.queries("n10_cosine_topk")(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("nb_id")) -> r.getAs[Double]("cos"))
      .toMap
    // every ANN hit that is also in the exact top-5 must agree on cos
    ann.foreach { r =>
      val key = (r.getAs[Long]("q_id"), r.getAs[Long]("nb_id"))
      exact.get(key).foreach { c =>
        assert(math.abs(c - r.getAs[Double]("cos")) < 1e-9)
      }
    }
    // per-query rank order is strictly decreasing in cos
    ann.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rs) =>
      val cs = rs.sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("cos"))
      assert(cs.sameElements(cs.sortBy(-_)))
    }
  }

  test("IVF ANN: correctly ranked candidates, deterministic, sane recall") {
    val ivf = Catalog.queries("n13_ann_ivf")(spark, sf0001).collect()
    val again = Catalog.queries("n13_ann_ivf")(spark, sf0001).collect()
    assert(ivf.map(_.toString).toSeq == again.map(_.toString).toSeq)
    val exact = Catalog.queries("n10_cosine_topk")(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("nb_id")) -> r.getAs[Double]("cos"))
      .toMap
    // any IVF hit also in the exact top-5 agrees on the cosine value
    ivf.foreach { r =>
      exact.get((r.getAs[Long]("q_id"), r.getAs[Long]("nb_id"))).foreach { c =>
        assert(math.abs(c - r.getAs[Double]("cos")) < 1e-9)
      }
    }
    // every query produced results and ranks are strictly ordered
    val byQ = ivf.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 32)
    byQ.values.foreach { rs =>
      val cs = rs.sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("cos"))
      assert(cs.sameElements(cs.sortBy(-_)))
    }
    // recall@5 vs exact — coarse cells on near-random vectors still
    // find a nontrivial share; report-and-bound
    val hits = ivf.count(r =>
      exact.contains((r.getAs[Long]("q_id"), r.getAs[Long]("nb_id"))))
    val recall = hits.toDouble / exact.size
    info(s"IVF recall@5 = $recall")
    assert(recall > 0.15, s"recall collapsed: $recall")
  }

  test("LSH-prefiltered vector near-dup equals exact on planted duplicates") {
    import spark.implicits._
    // 300 deterministic pseudo-random base vectors + 20 planted
    // near-duplicates (tiny perturbation ⇒ cos ≈ 0.999). At that
    // cosine the default 8-table × 8-bit prefilter catches each pair
    // with p ≈ 1 - (1 - 0.97^8)^8 ≈ 1-3e-6 — and both the vectors and
    // the md5-derived hyperplanes are deterministic, so this test is
    // stable, not flaky.
    val rnd = new scala.util.Random(42)
    val base = (0 until 300).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat))
    }
    val dups = (0 until 20).map { j =>
      val (srcId, v) = base(j * 7)
      val w = v.clone()
      w(j % 64) += 0.01f
      (1000L + srcId, w)
    }
    val vecs = (base ++ dups).toDF("vec_id", "embedding")

    val exact = graft.operators.Similarity
      .nearDuplicateVectors(vecs, threshold = 0.9, exact = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = graft.operators.Similarity
      .nearDuplicateVectors(vecs, threshold = 0.9, exact = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size >= 20, s"fixture must plant >=20 qualifying pairs, got ${exact.size}")
    assert(approx == exact,
      s"missed=${(exact -- approx).take(5)} spurious=${(approx -- exact).take(5)}")
  }

  test("multi-probe LSH widens recall in a starved configuration") {
    import spark.implicits._
    // weaker planted dups (cos ≈ 0.93) in a deliberately starved
    // 1-table × 12-bit configuration: single-probe recall collapses,
    // hamming-1 probing must strictly widen the candidate set while
    // staying exact-verified (no spurious pairs). Deterministic seeds —
    // stable, not flaky.
    val rnd = new scala.util.Random(7)
    val base = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat))
    }
    val dups = (0 until 30).map { j =>
      val (srcId, v) = base(j * 5)
      val w = v.map(x => x + 0.38f * rnd.nextGaussian().toFloat)
      (1000L + srcId, w)
    }
    val vecs = (base ++ dups).toDF("vec_id", "embedding")
    val exact = graft.operators.Similarity
      .nearDuplicateVectors(vecs, threshold = 0.85, exact = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size >= 20, s"fixture too weak: ${exact.size} pairs")
    def lsh(probes: Int) = graft.operators.Similarity
      .nearDuplicateVectors(vecs, threshold = 0.85, exact = false,
        nTables = 1, nBits = 12, probeBits = probes)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val starved = lsh(0)
    val probed = lsh(12)
    assert(starved.subsetOf(probed), "multi-probe lost a single-probe pair")
    assert(probed.subsetOf(exact), s"spurious: ${(probed -- exact).take(3)}")
    assert(probed.size > starved.size,
      s"multi-probe must widen recall: ${starved.size} -> ${probed.size}")
    info(s"recall: single-probe ${starved.size}/${exact.size}, " +
      s"multi-probe ${probed.size}/${exact.size}")
  }

  test("k-means-refined IVF centroids do not lose recall vs raw anchors") {
    import graft.operators.Similarity
    val e = Tables(spark, sf0001).embeddings
    val queries = e.filter(col("vec_id") < 32)
    val exact = Catalog.queries("n10_cosine_topk")(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("nb_id"))).toSet
    def recallWith(cents: org.apache.spark.sql.DataFrame): Double = {
      val hits = Similarity.ivfSearch(e, cents, queries, nProbe = 4, k = 5)
        .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("nb_id")))
        .count(exact.contains)
      hits.toDouble / exact.size
    }
    val naive = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cv"))
    val refined = Similarity.ivfCentroids(e, k = 16, iters = 3)
    val (rNaive, rRefined) = (recallWith(naive), recallWith(refined))
    info(s"IVF recall@5: naive anchors = $rNaive, k-means refined = $rRefined")
    assert(rRefined >= rNaive - 0.05,
      s"refinement must not collapse recall: $rNaive -> $rRefined")
  }

  test("int8 quantization keeps dequantized self-cosine above 0.999") {
    val rows = Catalog.queries("n14_vector_quantize")(spark, sf0001).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val cos = r.getAs[Double]("dequant_cos")
      assert(cos > 0.999, s"vec ${r.getLong(0)}: dequant cos $cos")
      assert(r.getAs[String]("code_csv").split(";").length == 64)
      val codes = r.getAs[String]("code_csv").split(";").map(_.toLong)
      assert(codes.forall(c => c >= -127 && c <= 127), "codes fit int8")
    }
  }

  test("quantized top-k keeps high recall vs exact float top-k") {
    val quant = Catalog.queries("n15_quantized_topk")(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("nb_id"))).toSet
    val exact = Catalog.queries("n10_cosine_topk")(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("nb_id"))).toSet
    val recall = quant.intersect(exact).size.toDouble / exact.size
    info(s"int8 top-5 recall vs float = $recall")
    // int8 quantization perturbs cosines by ~1e-3; near-random vectors
    // have tightly packed neighbor lists, so some churn is expected —
    // but the representation must agree on the clear majority
    assert(recall > 0.8, s"quantized recall collapsed: $recall")
  }

  test("native cosine_sim expression matches the higher-order fold") {
    val e = Tables(spark, sf0001).embeddings.limit(50)
    val a = e.select(col("vec_id"), col("embedding"))
    val pairs = a.crossJoin(
      a.select(col("vec_id").as("v2"), col("embedding").as("e2")))
      .filter(col("vec_id") < col("v2")).limit(200)
    val fold =
      aggregate(zip_with(col("embedding"), col("e2"), (x, y) => x.cast("double") * y),
        lit(0.0), (acc, x) => acc + x) /
        (sqrt(aggregate(transform(col("embedding"), x => x.cast("double") * x),
          lit(0.0), (acc, x) => acc + x)) *
         sqrt(aggregate(transform(col("e2"), x => x.cast("double") * x),
           lit(0.0), (acc, x) => acc + x)))
    val diffs = pairs
      .select((GraftFunctions.cosine_sim(col("embedding"), col("e2")) - fold)
        .as("d"))
      .agg(max(abs(col("d")))).head().getDouble(0)
    assert(diffs < 1e-12, s"native vs fold diff $diffs")
  }

  test("norm-factored dot_float/norm_float is bit-identical to fused cosine_sim") {
    val e = Tables(spark, sf0001).embeddings.limit(80)
    val a = e.select(col("vec_id"), col("embedding"),
      GraftFunctions.norm_float(col("embedding")).as("nrm1"))
    val pairs = a.crossJoin(
      a.select(col("vec_id").as("v2"), col("embedding").as("e2"),
        GraftFunctions.norm_float(col("embedding")).as("nrm2")))
      .filter(col("vec_id") < col("v2"))
    val maxDiff = pairs
      .select((GraftFunctions.dot_float(col("embedding"), col("e2")) /
        (col("nrm1") * col("nrm2")) -
        GraftFunctions.cosine_sim(col("embedding"), col("e2"))).as("d"))
      .agg(max(abs(col("d")))).head().getDouble(0)
    // same FP op sequence, so EXACT equality, not epsilon
    assert(maxDiff == 0.0, s"factored vs fused cosine diff $maxDiff")
  }

  test("heap top-k path is identical to the window path (cosine + IVF)") {
    import graft.operators.Similarity
    val e = Tables(spark, sf0001).embeddings
    val queries = e.filter(col("vec_id") < 32)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "nb_id", "cos", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSet
    // k=7 (not the catalog's 5) and excludeSelf=false: both dials moved
    val hw = rows(Similarity.cosineTopK(e, queries, k = 7,
      excludeSelf = false, useHeap = true))
    val ww = rows(Similarity.cosineTopK(e, queries, k = 7,
      excludeSelf = false, useHeap = false))
    assert(hw == ww, s"cosine heap!=window: ${(hw diff ww).take(3)} / ${(ww diff hw).take(3)}")

    val cents = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cv"))
    val hi = rows(Similarity.ivfSearch(e, cents, queries, nProbe = 4, k = 5,
      useHeap = true))
    val wi = rows(Similarity.ivfSearch(e, cents, queries, nProbe = 4, k = 5,
      useHeap = false))
    assert(hi == wi, s"ivf heap!=window: ${(hi diff wi).take(3)} / ${(wi diff hi).take(3)}")
  }

  test("meanPoolEmbeddings: exact mean, input-order invariant (n87)") {
    import spark.implicits._
    import graft.operators.Similarity
    val rows = Seq(
      (10L, 0L, Array(1.0f, 2.0f, 3.0f)),
      (11L, 0L, Array(3.0f, 6.0f, 5.0f)),
      (20L, 1L, Array(-1.0f, 0.0f, 1.0f)))
    def pool(order: Seq[(Long, Long, Array[Float])]) =
      Similarity.meanPoolEmbeddings(
          order.toDF("vec_id", "group_id", "embedding"), "group_id")
        .collect()
        .map(r => r.getAs[Long]("group_id") ->
          (r.getAs[Long]("n_vecs"), r.getAs[Seq[Double]]("pooled"))).toMap
    val a = pool(rows)
    assert(a(0L) == ((2L, Seq(2.0, 4.0, 4.0))))
    assert(a(1L) == ((1L, Seq(-1.0, 0.0, 1.0))))
    // shuffled input folds in the same vec_id order => identical bits
    assert(pool(rows.reverse) == a)
  }

  test("rrfFuse: standard RRF arithmetic, absent-system convention, deterministic ties (n90)") {
    import spark.implicits._
    import graft.operators.Similarity
    // lexical ranks: cand 100 first, 200 second; semantic: 200 first,
    // 300 second. RRF(k=60): 200 = 1/62+1/61 (top), 100 = 1/61 (one
    // system only), 300 = 1/62.
    val lex = Seq((1L, 100L, 1L), (1L, 200L, 2L)).toDF("q_id", "cand", "r")
    val sem = Seq((1L, 200L, 1L), (1L, 300L, 2L)).toDF("q_id", "cand", "r")
    val got = Similarity.rrfFuse(lex, sem, 10)
      .orderBy("rrf_rank")
      .collect().map(r => (r.getAs[Long]("cand"), r.getAs[Double]("rrf"),
        r.getAs[Long]("rrf_rank")))
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(got.map(_._1).toSeq == Seq(200L, 100L, 300L))
    assert(got(0)._2 == r6(1.0 / 62 + 1.0 / 61))
    assert(got(1)._2 == r6(1.0 / 61))
    assert(got(2)._2 == r6(1.0 / 62))
    assert(got.map(_._3).toSeq == Seq(1L, 2L, 3L))
    // tie (same single-system rank) breaks by candidate id
    val tie = Similarity.rrfFuse(
      Seq((1L, 9L, 1L)).toDF("q_id", "cand", "r"),
      Seq((1L, 4L, 1L)).toDF("q_id", "cand", "r"), 10)
      .orderBy("rrf_rank").collect().map(_.getAs[Long]("cand")).toSeq
    assert(tie == Seq(4L, 9L))
  }

  test("meanPoolEmbeddings fails loudly on ragged member dimensions (ADVICE r09)") {
    import spark.implicits._
    import graft.operators.Similarity
    val ragged = Seq(
      (10L, 0L, Array(1.0f, 2.0f, 3.0f)),
      (11L, 0L, Array(3.0f, 6.0f))) // shorter member, same group
      .toDF("vec_id", "group_id", "embedding")
    val e = intercept[Exception] {
      Similarity.meanPoolEmbeddings(ragged, "group_id").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t.getMessage).toSeq ++ Option(t.getCause).toSeq.flatMap(messages)
    assert(messages(e).exists(_.contains("ragged member dimensions")), e.toString)
  }

  test("truncationRecall: full width is exactly 1.0, planted prefix structure scores high (n88)") {
    import spark.implicits._
    import graft.operators.Similarity
    // 40 vectors whose FIRST 4 dims carry all the signal (scaled 100x)
    // and remaining 4 dims are small noise — the Matryoshka property
    val rows = (0 until 40).map { i =>
      val sig = Array.tabulate(4)(j => ((i * 7 + j * 3) % 11 - 5) * 100.0f)
      val noise = Array.tabulate(4)(j => ((i * 13 + j * 5) % 7 - 3) * 0.01f)
      (i.toLong, sig ++ noise)
    }
    val vecs = rows.toDF("vec_id", "embedding")
    val qs = vecs.filter(col("vec_id") < 8)
    val rec = Similarity.truncationRecall(vecs, qs, Seq(4, 8), k = 5)
      .groupBy("dims").agg(avg("recall").as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rec(8L) == 1.0, "full width must reproduce its own ranking")
    assert(rec(4L) > 0.8, s"signal-bearing prefix should rank nearly identically, got ${rec(4L)}")
  }

  test("n115: tenant takedown — other tenant byte-identical, T's bytes off both arms' disks") {
    // the file-level half of n115's contract (the oracle attests the
    // served ANSWERS; this attests the forget is physical on both
    // arms after the final gates, and re-states the invariance claim
    // directly on the served rows)
    import graft.operators.{LexIndex, Pq, ServingLoc}
    val served = Catalog.queries("n115_tenant_takedown")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4), r.getLong(5),
        r.getDouble(6), r.getLong(7)))
    val snap0O = served.filter(t => t._1 == 0L && t._2 == 1L)
      .map(t => (t._3, t._4, t._5, t._6)).toSet
    val snap1O = served.filter(t => t._1 == 1L && t._2 == 1L)
      .map(t => (t._3, t._4, t._5, t._6)).toSet
    assert(snap0O.nonEmpty && snap0O == snap1O,
      "tenant O's ranking must not move across tenant T's takedown")
    assert(!served.exists(t => t._1 == 1L && t._2 == 2L),
      "tenant T must be absent from its post-takedown serve")
    val base = ServingLoc.get(spark, s"n115:$sf0001").get
    val t = Tables(spark, sf0001)
    val deadSet = t.documents
      .join(t.embeddings, t.documents("doc_id") === t.embeddings("vec_id"))
      .filter(col("label") % 5 === 2)
      .select(t.documents("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(deadSet.nonEmpty)
    // lex arm: T's rows are out of the folded base and its ops summary
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val upto = fs.listStatus(new org.apache.hadoop.fs.Path(s"$base/lex"))
      .map(_.getPath.getName).filter(_.startsWith("_compacted_upto_"))
      .map(_.stripPrefix("_compacted_upto_").toLong).max
    val lexSurvivors = spark.read
      .parquet(s"$base/lex/compacted/$upto/doclens")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(deadSet.forall(!lexSurvivors.contains(_)),
      "a tenant-T doc's rows survived the lex fold on disk")
    val lexOps = spark.read.parquet(s"$base/lex/ops_base/$upto")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(deadSet.forall(!lexOps.contains(_)),
      "a tenant-T tombstone id still sits in the lex ops summary")
    // ann arm: T's codes are out of the folded generation
    val annBase = s"$base/ann"
    val g = Pq.currentPqGen(spark, annBase)
    assert(g >= 1L, "the ann takedown fold must have committed")
    val annSurvivors = Pq.readPqIndex(spark, Pq.pqGenPath(annBase, g))
      .codes.select("vec_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(deadSet.forall(!annSurvivors.contains(_)),
      "a tenant-T vec's codes survived the ann fold on disk")
  }
}
