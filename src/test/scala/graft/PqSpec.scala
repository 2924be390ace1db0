package graft

import org.apache.spark.sql.functions._
import graft.operators.Pq

/** PQ invariants the hash oracle can't express: codebook shape, code
  * range, quantization-error contraction across Lloyd rounds, and ADC
  * recall against the exact L2 answer. */
class PqSpec extends SparkSpec {

  private lazy val e = Tables(spark, sf0001).embeddings

  test("codebooks: M*K centroids of SubDim floats, stable cell ids") {
    val books = Pq.codebooks(e).collect()
    assert(books.length == Pq.M * Pq.K)
    assert(books.map(r => (r.getAs[Int]("m"), r.getAs[Long]("cent_id"))).distinct.length ==
      Pq.M * Pq.K)
    books.foreach { r =>
      assert(r.getAs[scala.collection.Seq[Float]]("cv").length == Pq.SubDim)
    }
  }

  test("codes: every (vector, subspace) gets exactly one code from the codebook") {
    val books = Pq.codebooks(e)
    val codes = Pq.encode(e, books)
    val n = e.count()
    assert(codes.count() == n * Pq.M)
    val validIds = books.select(col("cent_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(codes.select("code").distinct().collect()
      .map(_.getLong(0)).toSet.subsetOf(validIds))
  }

  test("training reduces total quantization error (Lloyd descent)") {
    def sqErr(iters: Int): Double = {
      val books = Pq.codebooks(e, iters)
      // total L2² of every sub-vector to its assigned centroid
      Pq.encode(e, books)
        .join(books.withColumnRenamed("cent_id", "code"), Seq("m", "code"))
        .join(e, Seq("vec_id"))
        .select(aggregate(
          zip_with(expr(s"slice(embedding, m * ${Pq.SubDim} + 1, ${Pq.SubDim})"),
            col("cv"), (x, y) => { val d = x.cast("double") - y.cast("double"); d * d }),
          lit(0.0), (a, x) => a + x).as("err"))
        .agg(sum("err")).head().getDouble(0)
    }
    val e0 = sqErr(0) // pure seeding
    val e2 = sqErr(2)
    assert(e2 < e0, s"Lloyd must not increase error: seed=$e0 trained=$e2")
  }

  test("ADC top-5 recalls most of the exact L2 top-5") {
    val books = Pq.codebooks(e)
    val queries = e.filter(col("vec_id") < 32)
    val got = Pq.adcTopK(Pq.encode(e, books), books, queries, 5)
      .select("q_id", "nb_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact L2 top-5 per query (brute force on the small fixture)
    val d2 = aggregate(
      zip_with(col("qe"), col("embedding"),
        (x, y) => { val d = x.cast("double") - y.cast("double"); d * d }),
      lit(0.0), (a, x) => a + x)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("d"), col("nb_id"))
    val exact = e.crossJoin(broadcast(
      queries.select(col("vec_id").as("q_id"), col("embedding").as("qe"))))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("nb_id"), d2.as("d"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select("q_id", "nb_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & exact).size.toDouble / exact.size
    // the harness embeddings are RANDOM — no cluster structure, the
    // known worst case for PQ (distances concentrate; a 16-code
    // subspace quantizer carries little signal). The meaningful bound
    // is vs chance: random top-5 over n candidates recalls 5/(n-1)
    // ≈ 1 %. ADC must beat that by an order of magnitude.
    val chance = 5.0 / (e.count() - 1)
    assert(recall >= 10 * chance && recall >= 0.1,
      s"ADC recall too close to chance: $recall (chance=$chance)")
    assert(got.size == exact.size)
  }

  test("production K=256: full Lloyd chain + codegen'd ADC at 8-bit codes, recall ≥ the K=16 config") {
    // VERDICT_r09 #4: K is pinned to 16 in the catalog for oracle
    // tractability; this runs the SAME training/encode/ADC chain (and
    // the L2Sq codegen hot path, evaluated corpus × K times per Lloyd
    // round) at the K the scaladoc calls production, on the sf0.001
    // corpus (500 vectors — 256 seeds are genuinely distinct).
    val queries = e.filter(col("vec_id") < 32)
    val d2 = aggregate(
      zip_with(col("qe"), col("embedding"),
        (x, y) => { val d = x.cast("double") - y.cast("double"); d * d }),
      lit(0.0), (a, x) => a + x)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("d"), col("nb_id"))
    val exact = e.crossJoin(broadcast(
      queries.select(col("vec_id").as("q_id"), col("embedding").as("qe"))))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("nb_id"), d2.as("d"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select("q_id", "nb_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    def recallAt(k: Int): Double = {
      val books = Pq.codebooks(e, k = k)
      assert(books.count() == Pq.M.toLong * k, s"codebook shape at K=$k")
      val got = Pq.adcTopK(Pq.encode(e, books), books, queries, 5)
        .select("q_id", "nb_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.size == exact.size)
      (got & exact).size.toDouble / exact.size
    }
    val t0 = System.nanoTime()
    val r256 = recallAt(256)
    val wallSec = (System.nanoTime() - t0) / 1e9
    val r16 = recallAt(Pq.K)
    // 16× the codes per subspace must not LOSE ranking signal. The
    // absolute bar stays modest: the harness vectors are RANDOM (PQ's
    // worst case — 16-dim subspaces of iid noise stay coarse even at
    // 256 codes; measured r256 ≈ 0.31, chance ≈ 0.01), so ≥ 0.25 is
    // ~25× chance and safely under the deterministic measured value.
    assert(r256 >= r16, s"K=256 recall $r256 below K=16 recall $r16")
    assert(r256 >= 0.25, s"K=256 recall too low: $r256")
    // budget: the 2-round Lloyd chain + encode + ADC at K=256 on 500
    // vectors is seconds of work; minutes would mean the hot path fell
    // out of codegen
    assert(wallSec < 120, s"K=256 chain took ${wallSec}s")
  }

  test("IVF-PQ prunes the corpus: candidates per query ≈ nProbe/nCells of it") {
    val queries = e.filter(col("vec_id") < 32)
    val n = e.count()
    val results = Pq.ivfPqTopK(e, queries, 5).collect()
    // every query still fills its top-k from within its probed cells
    assert(results.length == 32 * 5)
    // pruning: re-derive the candidate set size the same way the
    // operator does and hold it ≪ brute force. With 8 anchor cells and
    // 2 probes, a balanced layout gives ~25 %; allow generous skew from
    // unrefined anchors but insist on a real cut.
    val cents = e.filter(col("vec_id") < Pq.IvfCells)
      .select(col("vec_id").as("cell"), col("embedding").as("cv"))
    val asgSizes = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cell"),
        Det.round6(aggregate(zip_with(col("embedding"), col("cv"),
          (x, y) => { val d = x.cast("double") - y.cast("double"); d * d }),
          lit(0.0), (a, x) => a + x)).as("dist"))
      .groupBy("vec_id")
      .agg(min_by(col("cell"), struct(col("dist"), col("cell"))).as("cell"))
      .groupBy("cell").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val worstTwoCells = asgSizes.values.toSeq.sorted.takeRight(2).sum
    assert(worstTwoCells < n * 0.7,
      s"coarse layout degenerate: worst-2-cell mass $worstTwoCells of $n")
  }

  test("persisted PQ index: file round-trip + frozen-codebook append answer identically") {
    val prior = e.filter(col("vec_id") % 2 === 0)
    val fresh = e.filter(col("vec_id") % 2 === 1)
    val queries = e.filter(col("vec_id") < 32)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "nb_id", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val inMem = Pq.appendPqIndex(Pq.buildPqIndex(prior), fresh)
    val expected = key(Pq.searchPqIndex(queries, inMem))
    // the facade's one-call form IS this composition
    assert(key(Pq.searchPqIndex(queries, Pq.buildAccumulatedIndex(e)))
      == expected, "buildAccumulatedIndex drifted from the composition")

    // disk lifecycle: base write (cell-partitioned codes, manifest),
    // a SEPARATE append batch, then search from the reopened index
    val dir = java.nio.file.Files.createTempDirectory("pq_index").toString
    Pq.writePqIndex(Pq.buildPqIndex(prior), dir)
    Pq.appendToPqIndex(fresh, dir, "b1")
    val fromDisk = Pq.readPqIndex(spark, dir)
    assert(key(Pq.searchPqIndex(queries, fromDisk)) == expected)
    // and the catalog entry (whose trained artifacts are memoized under
    // logical keys) answers identically to the unmemoized composition
    val catalog = Catalog.queries("n64_pq_index")(spark, sf0001)
      .select("q_id", "nb_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(catalog == expected, "catalog n64 drifted from the public API composition")
    // the codes really are cell-partitioned at rest (pruning layout)
    val base = new java.io.File(s"$dir/codes/b_base")
    assert(base.listFiles().exists(_.getName.startsWith("cell=")),
      s"expected cell= partition dirs under ${base.getPath}")
  }

  test("tombstone delete answers exactly like re-encoding the survivors under frozen artifacts") {
    val queries = e.filter(col("vec_id") < 32)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "nb_id", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = Pq.buildPqIndex(e)
    val tombstones = e.filter(col("vec_id") % 3 === 2).select("vec_id")
    val deleted = Pq.deletePqIndex(full, tombstones)
    // rebuild = survivors re-encoded under the SAME frozen anchors and
    // codebooks (delete never retrains — the documented contract)
    val survivors = e.filter(col("vec_id") % 3 =!= 2)
    val rebuilt = full.copy(codes = full.codes.limit(0))
    val reEncoded = Pq.appendPqIndex(rebuilt, survivors)
    val a = key(Pq.searchPqIndex(queries, deleted))
    assert(a == key(Pq.searchPqIndex(queries, reEncoded)) && a.nonEmpty)
    // a deleted vector never appears as a neighbor; answers did change
    assert(!a.exists { case (_, nb, _) => nb % 3 == 2 })
    assert(a != key(Pq.searchPqIndex(queries, full)))
  }

  test("upsert == rebuild over the edited corpus; compaction materializes a delete to a fresh path") {
    val queries = e.filter(col("vec_id") < 32)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "nb_id", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = Pq.buildPqIndex(e)
    val editPred = col("vec_id") % 8 === 5 && col("vec_id") >= 32
    val edited = e.filter(editPred)
      .withColumn("embedding", transform(col("embedding"), x => -x))
    val upserted = Pq.upsertPqIndex(full, edited)
    // rebuild = the EDITED corpus re-encoded under the same frozen
    // anchors/books (upsert never retrains — the n100 contract)
    val rebuilt = Pq.appendPqIndex(full.copy(codes = full.codes.limit(0)),
      e.filter(!editPred).unionByName(edited))
    val a = key(Pq.searchPqIndex(queries, upserted))
    assert(a == key(Pq.searchPqIndex(queries, rebuilt)) && a.nonEmpty)
    assert(a != key(Pq.searchPqIndex(queries, full)),
      "edit not load-bearing: no query's answer moved")
    // compaction cadence (the LexIndex.writeIndex swap rule): a
    // delete-carrying index materialized to a FRESH path serves
    // identically after reopen
    val tomb = e.filter(col("vec_id") % 3 === 2).select("vec_id")
    val deleted = Pq.deletePqIndex(full, tomb)
    val dir = java.nio.file.Files.createTempDirectory("pq_compact").toString
    Pq.writePqIndex(deleted, dir)
    assert(key(Pq.searchPqIndex(queries, Pq.readPqIndex(spark, dir))) ==
      key(Pq.searchPqIndex(queries, deleted)))
  }

  test("retrain (n102): retrained books cut quantization error on the drifted corpus; the answer moves") {
    // the retrain entry's motivation, which the hash oracle can't
    // state: books frozen at train time (pre-drift even half) have
    // never seen a negated vector, so their quantization error on the
    // drifted corpus exceeds books retrained on it. Same KProd config
    // as the catalog entries.
    val editPred = col("vec_id") % 8 === 5 && col("vec_id") >= 32
    val drifted = e.withColumn("embedding",
      when(editPred, transform(col("embedding"), x => -x))
        .otherwise(col("embedding")))
    def sqErr(books: org.apache.spark.sql.DataFrame): Double =
      Pq.encode(drifted, books)
        .join(books.withColumnRenamed("cent_id", "code"), Seq("m", "code"))
        .join(drifted, Seq("vec_id"))
        .select(aggregate(
          zip_with(expr(s"slice(embedding, m * ${Pq.SubDim} + 1, ${Pq.SubDim})"),
            col("cv"), (x, y) => { val d = x.cast("double") - y.cast("double"); d * d }),
          lit(0.0), (a, x) => a + x).as("err"))
        .agg(sum("err")).head().getDouble(0)
    val frozen = Pq.codebooks(e.filter(col("vec_id") % 2 === 0), Pq.Iters, Pq.KProd)
    val retrained = Pq.codebooks(drifted, Pq.Iters, Pq.KProd)
    val fe = sqErr(frozen)
    val re = sqErr(retrained)
    assert(re < fe,
      s"retraining must cut drifted-corpus quantization error: frozen=$fe retrained=$re")
    // and the retrain is load-bearing for serving: the retrained
    // index's answers differ from the frozen-config upsert's (n100)
    val queries = e.filter(col("vec_id") < 32)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "nb_id", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val frozenUpserted = Pq.upsertPqIndex(Pq.buildPqIndex(e),
      e.filter(editPred).withColumn("embedding",
        transform(col("embedding"), x => -x)))
    val retrainedIdx = Pq.buildPqIndex(drifted)
    val a = key(Pq.searchPqIndex(queries, retrainedIdx))
    assert(a.nonEmpty && a != key(Pq.searchPqIndex(queries, frozenUpserted)),
      "retrain not load-bearing: no query's answer moved vs the frozen config")
  }

  test("n106 gate: stable arm serves the frozen index verbatim; drifted arm serves moved, retrained answers") {
    // the end-to-end properties the hash oracle attests structurally,
    // restated as direct set comparisons against the component entries
    val out = Pq.driftGatedRetrainQ.build(spark, sf0001).collect()
    def arm(s: String) = out.filter(_.getString(0) == s)
      .map(r => (r.getLong(3), r.getLong(4), r.getLong(6))).toSet
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "nb_id", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // no-trigger branch: trig exactly 0, gate closed, and the served
    // rows ARE the standing frozen index's (n64's catalog answer)
    val stable = out.filter(_.getString(0) == "stable")
    assert(stable.forall(r => r.getLong(1) == 0L && r.getDouble(2) == 0.0),
      "stable scenario fired or reported nonzero drift")
    assert(arm("stable") == key(Catalog.queries("n64_pq_index")(spark, sf0001)),
      "stable arm did not serve the frozen accumulated index")
    // fired branch: trigger crossed, and the served answers both match
    // the retrain entry (n102) and MOVE vs the frozen-config upsert
    // serving (n100) — the loop is load-bearing end to end
    val drifted = out.filter(_.getString(0) == "drifted")
    assert(drifted.forall(r => r.getLong(1) == 1L &&
      r.getDouble(2) > Pq.DriftRetrainThreshold),
      "drifted scenario did not fire")
    assert(arm("drifted") == key(Catalog.queries("n102_pq_retrain")(spark, sf0001)),
      "drifted arm did not serve the retrained index")
    assert(arm("drifted") != key(Catalog.queries("n100_pq_upsert")(spark, sf0001)),
      "gate vacuous: retrained serving equals the frozen-config serving")
  }

  test("retrainPqIndexOn (n106's general form) answers exactly like the memoized n102 index") {
    val editPred = col("vec_id") % 8 === 5 && col("vec_id") >= 32
    val drifted = e.withColumn("embedding",
      when(editPred, transform(col("embedding"), x => -x))
        .otherwise(col("embedding")))
    val queries = e.filter(col("vec_id") < 32)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "nb_id", "adc", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val general = key(Pq.searchPqIndex(queries, Pq.retrainPqIndexOn(drifted)))
    val catalog = key(Catalog.queries("n102_pq_retrain")(spark, sf0001))
    assert(general == catalog && general.nonEmpty,
      s"general retrain ${general.size} rows != n102 ${catalog.size}")
  }

  test("reader across the PQ fold+swap: fold to a fresh path never disturbs an in-flight view; only the clear is destructive") {
    // n105's side of VERDICT r11 #5 (LexIndexSpec pins the BM25 side):
    // the fold MATERIALIZES to a fresh path before the live tree is
    // cleared, so (1) an in-flight reader of the live tree collects
    // correctly across the fold, (2) an EXECUTED live-tree reader keeps
    // answering after the clear (its exchanges hold the materialized
    // shuffle stages — re-collects never re-open the cleared dirs),
    // (3) a post-swap reader of the folded path survives the clear, and
    // (4) only a never-executed live-tree plan dies — the window the
    // two-phase swap confines, closed in deployment by reader drain.
    val root = java.nio.file.Files.createTempDirectory("pq_swap").toString
    val live = s"$root/live"
    val folded = s"$root/compacted"
    Pq.writePqIndex(Pq.buildPqIndex(e.filter(col("vec_id") % 3 === 0)), live)
    Pq.appendToPqIndex(e.filter(col("vec_id") % 3 === 1), live, label = "a1")
    Pq.appendToPqIndex(e.filter(col("vec_id") % 3 === 2), live, label = "a2")
    val queries = e.filter(col("vec_id") < 32)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val want = rows(Pq.searchPqIndex(queries, Pq.readPqIndex(spark, live)))
    // two in-flight readers over the live segment tree: `hot` executes
    // before the clear, `cold` never does
    val hot = Pq.searchPqIndex(queries, Pq.readPqIndex(spark, live))
    val cold = Pq.searchPqIndex(queries, Pq.readPqIndex(spark, live))
    Pq.writePqIndex(Pq.readPqIndex(spark, live), folded) // fold: fresh path
    assert(rows(hot) == want && want.nonEmpty,
      "fold disturbed an in-flight live-tree reader")
    val postSwap = Pq.searchPqIndex(queries, Pq.readPqIndex(spark, folded))
    graft.operators.IndexCommit.clear(spark, live)       // the swap's prune
    assert(rows(postSwap) == want,
      "clear disturbed a post-swap reader of the folded path")
    assert(rows(hot) == want,
      "clear disturbed an executed live-tree reader's materialized view")
    assertThrows[Exception](cold.collect())
  }

  test("n105 lifecycle: fold+swap serves the monolithic answer every rep; pruned live tree is gone") {
    import graft.operators.Pq
    Pq.clearPqServingState(spark)
    val queries = e.filter(col("vec_id") < 32)
    val want = {
      val idx = Pq.appendPqIndex(Pq.appendPqIndex(
        Pq.buildPqIndex(e.filter(col("vec_id") % 3 === 0)),
        e.filter(col("vec_id") % 3 === 1)),
        e.filter(col("vec_id") % 3 === 2))
      Pq.searchPqIndex(queries, idx).collect().map(_.toSeq).toSet
    }
    val runs = (1 to 3).map { _ =>
      Pq.pqServingCompactQ.build(spark, sf0001).collect().map(_.toSeq).toSet
    }
    runs.foreach(r => assert(r == want && r.nonEmpty))
    // after any rep: the live segment tree is pruned (the swap point),
    // the fold is exactly one committed base
    val base = Pq.pqServingBase(spark, sf0001).get
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$base/live")),
      "pruned live tree must be gone")
    val manifests = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$base/compacted/_manifests"))
      .map(_.getPath.getName).toSet
    assert(manifests == Set("base"))
    // cold clear restarts the lifecycle from empty in the SAME location
    Pq.clearPqServingState(spark)
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(base)).isEmpty)
    assert(Pq.pqServingCompactQ.build(spark, sf0001)
      .collect().map(_.toSeq).toSet == want)
  }

  test("residual codes (IVFADC) beat raw codes at equal bytes: lower MSE, no recall regression") {
    // Jégou et al. §IV: quantizing x − c(x) spends the same 4-byte code
    // budget on a tighter distribution. The decisive equal-bytes metric
    // is quantization MSE — the mean L2² between what a code claims to
    // represent and its reconstruction; recall vs the in-cell exact
    // answer must then not regress (on clusterless random embeddings
    // the recall gap can be small, but the error contraction may not).
    val (rawTruth, rawBooks) = Pq.rawPqParts(e)
    val (resTruth, resBooks) = Pq.residualPqParts(e)
    val rawMse = Pq.quantizationMse(rawTruth, Pq.encode(rawTruth, rawBooks), rawBooks)
    val resMse = Pq.quantizationMse(resTruth, Pq.encode(resTruth, resBooks), resBooks)
    info(s"quantization MSE raw=$rawMse residual=$resMse")
    assert(resMse < rawMse,
      s"residual encoding must strictly contract quantization error: raw=$rawMse residual=$resMse")

    // in-cell recall, each variant against ITS OWN pruning's exact
    // answer (raw prunes with data-point anchors, residual with the
    // trained centroids — a shared truth set would conflate pruning
    // differences with quantization error, which is the thing under
    // test)
    val queries = e.filter(col("vec_id") < 32)
    def topSet(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "nb_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rawCents = e.filter(col("vec_id") < Pq.IvfCells)
      .select(col("vec_id").as("cell"), col("embedding").as("cv"))
    val raw = topSet(Pq.ivfPqTopK(e, queries, 5))
    val res = topSet(Pq.ivfPqResidualTopK(e, queries, 5))
    val rawExact = topSet(exactInCellTop5(queries, rawCents))
    val resExact = topSet(exactInCellTop5(queries, Pq.coarseCentroids(e)))
    val rawRecall = (raw & rawExact).size.toDouble / rawExact.size
    val resRecall = (res & resExact).size.toDouble / resExact.size
    info(s"in-cell recall raw=$rawRecall residual=$resRecall")
    // On CLUSTERLESS uniform-random embeddings the in-cell recall
    // difference is sampling noise (the MSE contraction is ~5 %, a
    // couple of rank flips either way among 160 pairs); the structural
    // strict improvement is proven on the clustered fixture below.
    // Here residual search must simply clear the same
    // order-above-chance bar as every other ANN entry.
    val chance = 5.0 / (e.count() - 1)
    assert(resRecall >= 10 * chance && resRecall >= 0.1,
      s"residual in-cell recall too close to chance: $resRecall")
  }

  test("on clustered vectors (IVFADC's target case) residual recall strictly beats raw") {
    // 512 vectors in 8 well-separated deterministic clusters with small
    // intra-cluster offsets — the distribution shape of real embedding
    // corpora. Raw codes must spread each 16-code subspace codebook
    // across all 8 cluster centers; residual codes spend all 16 on the
    // small offset distribution. At these equal bytes the residual
    // advantage is structural, not statistical.
    val dim = Pq.M * Pq.SubDim
    val nClusters = 8
    val vecs = spark.range(512).select(col("id").as("vec_id"),
      expr(s"transform(sequence(0, ${dim - 1}), d -> CAST(" +
        s"sin((id % $nClusters) * 997.0 + d * 131.0) + " +
        s"0.25 * sin(id * 37.0 + d * 17.0) AS FLOAT))").as("embedding"))
      .localCheckpoint()
    val queries = vecs.filter(col("vec_id") < 32)
    def topSet(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "nb_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val kCodes = 16 // small books make the quantization error visible
    val raw = topSet(Pq.ivfPqTopK(vecs, queries, 5, kCodes = kCodes))
    val res = topSet(Pq.ivfPqResidualTopK(vecs, queries, 5, kCodes = kCodes))
    val rawCents = vecs.filter(col("vec_id") < Pq.IvfCells)
      .select(col("vec_id").as("cell"), col("embedding").as("cv"))
    def exactFor(cents: org.apache.spark.sql.DataFrame) =
      topSet(exactInCellTop5For(vecs, queries, cents))
    val rawRecall = (raw & exactFor(rawCents)).size.toDouble / raw.size
    val resRecall = (res & exactFor(Pq.coarseCentroids(vecs))).size.toDouble / res.size
    info(s"clustered in-cell recall raw=$rawRecall residual=$resRecall")
    assert(resRecall > rawRecall,
      s"residual must strictly beat raw on clustered data: raw=$rawRecall residual=$resRecall")
  }

  /** Exact L2 top-5 restricted to each query's probed cells under the
    * given coarse centroids — the truth set of the IVF-PQ recall
    * tests (pass the centroids the search variant actually prunes
    * with). */
  private def exactInCellTop5(queries: org.apache.spark.sql.DataFrame,
      cents: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    exactInCellTop5For(e, queries, cents)

  private def exactInCellTop5For(corpus: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame,
      cents: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val d2 = aggregate(
      zip_with(col("qe"), col("embedding"),
        (x, y) => { val d = x.cast("double") - y.cast("double"); d * d }),
      lit(0.0), (a, x) => a + x)
    def cellDist(v: org.apache.spark.sql.Column) = Det.round6(
      aggregate(zip_with(v, col("cv"),
        (x, y) => { val d = x.cast("double") - y.cast("double"); d * d }),
        lit(0.0), (a, x) => a + x))
    val asg = corpus.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cell"), cellDist(col("embedding")).as("dist"))
      .groupBy("vec_id")
      .agg(min_by(col("cell"), struct(col("dist"), col("cell"))).as("cell"))
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("dist"), col("cell"))
    val probes = queries.select(col("vec_id").as("q_id"), col("embedding"))
      .crossJoin(broadcast(cents))
      .select(col("q_id"), col("cell"), cellDist(col("embedding")).as("dist"))
      .withColumn("rn", row_number().over(wp)).filter(col("rn") <= Pq.IvfProbe)
      .select("q_id", "cell")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("d"), col("nb_id"))
    probes.join(asg, Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .join(corpus, Seq("vec_id"))
      .join(broadcast(queries.select(col("vec_id").as("q_id"),
        col("embedding").as("qe"))), Seq("q_id"))
      .select(col("q_id"), col("vec_id").as("nb_id"), d2.as("d"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("q_id", "nb_id")
  }

  test("IVF-PQ recall vs the in-cell exact L2 answer isolates PQ error from pruning") {
    val queries = e.filter(col("vec_id") < 32)
    val got = Pq.ivfPqTopK(e, queries, 5)
      .select("q_id", "nb_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact L2 top-5 RESTRICTED to each query's probed cells: the
    // pruning is identical on both sides, so the only divergence left
    // is ADC's quantization error — same bound as the pure-PQ test.
    val d2 = aggregate(
      zip_with(col("qe"), col("embedding"),
        (x, y) => { val d = x.cast("double") - y.cast("double"); d * d }),
      lit(0.0), (a, x) => a + x)
    val cents = e.filter(col("vec_id") < Pq.IvfCells)
      .select(col("vec_id").as("cell"), col("embedding").as("cv"))
    def cellDist(v: org.apache.spark.sql.Column) = Det.round6(
      aggregate(zip_with(v, col("cv"),
        (x, y) => { val d = x.cast("double") - y.cast("double"); d * d }),
        lit(0.0), (a, x) => a + x))
    val asg = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cell"), cellDist(col("embedding")).as("dist"))
      .groupBy("vec_id")
      .agg(min_by(col("cell"), struct(col("dist"), col("cell"))).as("cell"))
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("dist"), col("cell"))
    val probes = queries.select(col("vec_id").as("q_id"), col("embedding"))
      .crossJoin(broadcast(cents))
      .select(col("q_id"), col("cell"), cellDist(col("embedding")).as("dist"))
      .withColumn("rn", row_number().over(wp)).filter(col("rn") <= Pq.IvfProbe)
      .select("q_id", "cell")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("d"), col("nb_id"))
    val exactInCell = probes.join(asg, Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .join(e, Seq("vec_id"))
      .join(broadcast(queries.select(col("vec_id").as("q_id"),
        col("embedding").as("qe"))), Seq("q_id"))
      .select(col("q_id"), col("vec_id").as("nb_id"), d2.as("d"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("q_id", "nb_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & exactInCell).size.toDouble / exactInCell.size
    val chance = 5.0 / (e.count() - 1)
    assert(recall >= 10 * chance && recall >= 0.1,
      s"IVF-PQ in-cell recall too close to chance: $recall")
  }

  test("round-15 fold path: the folded generation's components are byte-equal reads of the pre-fold index (anchors/books file-copied, codes rewritten)") {
    // foldPqServingIfDue now copies the frozen trained configuration
    // (anchors, books) file-for-file instead of re-writing it through
    // two Spark jobs; this pins that a read of the folded generation is
    // indistinguishable from the pre-fold accumulated index — the
    // property every serving entry's oracle rides on.
    val root = java.nio.file.Files.createTempDirectory("pq_foldcopy").toString
    val g0 = Pq.pqGenPath(root, 0L)
    Pq.writePqIndex(Pq.buildPqIndex(e.filter(col("vec_id") % 3 === 0)), g0)
    Pq.appendToPqIndex(e.filter(col("vec_id") % 3 =!= 0), g0, label = "a1")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val before = Pq.readPqIndex(spark, g0)
    val (wantA, wantB, wantC) =
      (rows(before.anchors), rows(before.books), rows(before.codes))
    Pq.foldPqServingIfDue(spark, root, compactEvery = 1)
    assert(Pq.currentPqGen(spark, root) == 1L, "fold did not advance the gen")
    val after = Pq.readPqIndex(spark, Pq.pqGenPath(root, 1L))
    assert(rows(after.anchors) == wantA && wantA.nonEmpty, "anchors moved")
    assert(rows(after.books) == wantB && wantB.nonEmpty, "books moved")
    assert(rows(after.codes) == wantC && wantC.nonEmpty, "codes moved")
    // and the old generation is pruned (the swap's second phase)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/gens/0")),
      "folded generation not pruned")
  }
}
