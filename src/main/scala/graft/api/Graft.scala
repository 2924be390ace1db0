package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** User-facing API: the engine's data-pipeline operators as composable
  * DataFrame transformations, independent of the harness catalog.
  *
  * {{{
  * import graft.api.Graft._
  * docs.dedupExact()                         // (fp, doc_id, n_dups)
  * docs.nearDuplicates(threshold = 0.8)      // MinHash+LSH+verify
  * docs.jaccardSimilarityJoin(0.5)           // exact inverted-index
  * docs.simhash()                            // (doc_id, simhash)
  * embeddings.cosineTopK(queries, k = 10)    // broadcast-query ANN-exact
  * }}}
  *
  * Column contract: document ops expect (doc_id, text); vector ops
  * expect (vec_id, embedding: array<float>). Use `withColumnRenamed`
  * (or the `as` helpers below) to adapt.
  */
object Graft {

  implicit final class DocumentOps(private val df: DataFrame) extends AnyVal {

    /** Exact dedup on a content fingerprint; keeps min doc_id as the
      * representative. Returns (fp, doc_id, n_dups). */
    def dedupExact(normalize: Boolean = false): DataFrame = {
      val key =
        if (normalize) graft.Det.normFingerprint(col("text"))
        else md5(col("text").cast("binary"))
      df.groupBy(key.as("fp"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_dups"))
    }

    /** Documents surviving exact dedup (one representative per group).
      * Window formulation: ONE shuffle on the fingerprint, no join and
      * no second computation of the input — the semi-join against
      * dedupExact would shuffle twice and re-evaluate `df`'s lineage. */
    def distinctDocuments(normalize: Boolean = false): DataFrame = {
      val key =
        if (normalize) graft.Det.normFingerprint(col("text"))
        else md5(col("text").cast("binary"))
      // helper column names must not collide with (or clobber) caller
      // columns — generate ones the input provably doesn't contain
      def fresh(base: String): String =
        Iterator.from(0).map(i => if (i == 0) base else s"$base$i")
          .find(n => !df.columns.contains(n)).get
      val fp = fresh("__graft_fp")
      val rn = fresh("__graft_rn")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(fp)).orderBy(col("doc_id"))
      val out = df.withColumn(fp, key)
        .withColumn(rn, row_number().over(w))
        .filter(col(rn) === 1)
        .drop(fp, rn)
      // deterministic transform of a canonical table → register so the
      // dedup family memoizes ONE shingle index for this logical corpus
      // across invocations (st05 rebuilds this frame every call; without
      // the key it churned the single ad-hoc cache slot — VERDICT_r03 #6)
      Dedup.registerDerivedCorpus(out, df, s"distinctDocuments(normalize=$normalize)")
      out
    }

    /** MinHash+LSH near-duplicate pairs, exact-Jaccard verified.
      * Returns (d1, d2, jac ≥ threshold). `dfCap` enables stop-shingle
      * pruning for skewed corpora — emitted (c, jac) values stay exact,
      * but a qualifying pair whose ENTIRE overlap is hot shingles
      * (boilerplate-only similarity) is dropped; see
      * Dedup.dropHotShingles for the precise preservation condition. */
    def nearDuplicates(threshold: Double = 0.8,
        dfCap: Option[Long] = None): DataFrame =
      Dedup.nearDuplicatePairs(df, threshold, dfCap)

    /** SATURATION-CAPPED near-duplicate pairs — the batch twin of the
      * capped streaming lane (st29) as a library call: each (band, sig)
      * bucket keeps only its first `maxBucket` members in doc_id order
      * and a pair emits only from its first colliding band, so a
      * mega-cluster's pair work is C(maxBucket, 2) per bucket instead
      * of C(cluster, 2). With a cap wider than every bucket the answer
      * equals [[nearDuplicates]] with no dfCap (the driver-attested
      * st29 property); where the cap bites, the dropped class is
      * intra-mega-cluster pairs — the n113/n114 trade, on the bucket
      * axis. Returns (d1, d2, jac ≥ threshold). */
    def nearDuplicatesCapped(threshold: Double = 0.8,
        maxBucket: Int = 64): DataFrame =
      Dedup.nearDuplicatePairsCapped(df, threshold, maxBucket)

    /** Exact n-gram Jaccard similarity join (inverted index).
      * Returns (d1, d2, n_common, jac ≥ threshold). `dfCap`: same
      * trade as [[nearDuplicates]] — exact values, boilerplate-only
      * pairs dropped. */
    def jaccardSimilarityJoin(threshold: Double = 0.5,
        dfCap: Option[Long] = None): DataFrame =
      Dedup.jaccardPairs(df, threshold, dfCap)

    /** Gopher-style repetition metrics: (doc_id, n_tokens,
      * top_tok_frac, dup_2gram_frac, dup_3gram_frac). */
    def repetitionMetrics(): DataFrame =
      graft.operators.TextAnalysis.repetitionMetrics(df)

    /** Gopher-style hard quality gates: per-rule booleans + `passes`
      * conjunction (see [[graft.operators.TextAnalysis.gopherRules]]). */
    def gopherRules(): DataFrame =
      graft.operators.TextAnalysis.gopherRules(df)

    /** Deterministic resample to an exact target domain mixture:
      * integer parts per key (e.g. en→3, de→1), largest corpus whose
      * composition is exactly proportional. See
      * [[graft.operators.Corpus.mixtureResample]]. */
    def mixtureResample(parts: Seq[(String, Long)],
        keyCol: String = "source"): DataFrame =
      graft.operators.Corpus.mixtureResample(df, parts, keyCol)

    /** Sequence packing: append (n_tokens, bin) — fixed-token-budget
      * bins per shard in doc_id order (training-batch assembly). */
    /** Overlapping fixed-token chunking (the sequence-prep step before
      * [[packSequences]]): (doc_id, chunk_idx, start_tok, n_tok, fp) —
      * map-side explode, fingerprints ready for chunk-level dedup. */
    def chunkWindows(window: Int = 16, stride: Int = 8): DataFrame =
      graft.operators.Corpus.chunkWindows(df, window, stride)

    def packSequences(budget: Long = 2048,
        shardCol: String = "source"): DataFrame =
      graft.operators.Corpus.packSequences(df, budget, shardCol)

    /** Concat-and-chunk materialization: EXACT `blockLen`-token
      * training examples crossing doc boundaries (EOS-separated, per
      * shard in doc_id order) — (shard, example_idx, n_tokens, n_docs,
      * block_fp). The final mile after [[packSequences]]. */
    def tokenBlocks(blockLen: Long = 2048, eos: String = "<eos>",
        shardCol: String = "source"): DataFrame =
      graft.operators.Corpus.tokenBlocks(df, blockLen, eos, shardCol)

    /** Line/paragraph boilerplate removal (CCNet-family): strip every
      * unit appearing in ≥ `minDocs` distinct docs; returns (doc_id,
      * n_lines, n_dropped, clean_text). `delim` splits units ('\n'
      * lines, "\n\n" paragraphs). */
    def dropBoilerplateLines(minDocs: Long = 2L,
        delim: String = "\n"): DataFrame =
      graft.operators.LineDedup.dropBoilerplate(
        graft.operators.LineDedup.linesByDelim(df, delim), minDocs,
        sep = delim)

    /** 60-bit SimHash fingerprints. Returns (doc_id, simhash). */
    def simhash(): DataFrame = Dedup.simhashFingerprints(df)

    /** Containment join: one row per pair whose smaller shingle set is
      * ≥ threshold inside the larger (catches quoted passages symmetric
      * Jaccard misses). Returns (contained, container, n_contained,
      * n_container, containment). */
    def containmentJoin(threshold: Double = 0.8): DataFrame =
      Dedup.containmentPairs(df, threshold)

    /** Drop near-duplicates: keeps every document except the larger-id
      * member of each pair at or above the threshold. */
    def dropNearDuplicates(threshold: Double = 0.8): DataFrame = {
      val dupIds = Dedup.nearDuplicatePairs(df, threshold)
        .select(col("d2").as("doc_id")).distinct()
      val out = df.join(dupIds, Seq("doc_id"), "left_anti")
      // deterministic transform — chains through a registered parent
      // (e.g. n43's quality→distinct→dropNearDup pipeline) so a
      // downstream index probe reuses one shingle index per stage
      Dedup.registerDerivedCorpus(out, df, s"dropNearDuplicates($threshold)")
      out
    }

    /** Exact-substring surgery (Lee et al. 2022): rewrite `text` with
      * every ≥[[graft.operators.SpanDedup.W]]-token run that repeats
      * anywhere in the corpus removed, keeping the corpus-wide first
      * occurrence. `maxDf` caps hot boilerplate windows (conservative
      * skew guard — see SpanDedup). */
    def dropDuplicateSpans(maxDf: Option[Long] = None): DataFrame =
      graft.operators.SpanDedup.dropDuplicateSpans(df, maxDf)

    /** Maximal duplicated token spans per document (keep-first):
      * (doc_id, span_start, span_end, n_windows). */
    def duplicateSpans(maxDf: Option[Long] = None): DataFrame =
      graft.operators.SpanDedup.duplicateSpans(df, maxDf)

    /** Build the persistable dedup/decontamination index for this
      * corpus (fingerprints + LSH bands + inverted shingle index +
      * window hashes). Pair with [[dedupAgainstIndex]] /
      * `IncrementalDedup.writeIndex` for the incremental daily-batch
      * flow that never re-shuffles the prior corpus. */
    def buildDedupIndex(dfCap: Option[Long] = None): graft.operators.DedupIndex =
      graft.operators.IncrementalDedup.buildIndex(df, dfCap)

    /** Incremental screen: rows of THIS frame (the new batch) that are
      * neither exact nor near duplicates (jac ≥ threshold) of anything
      * in the prior `index`. Touches only the batch and the index —
      * the prior corpus is never re-read. */
    def dedupAgainstIndex(index: graft.operators.DedupIndex,
        threshold: Double = 0.8, normalize: Boolean = false): DataFrame =
      graft.operators.IncrementalDedup.dedupAgainstIndex(df, index, threshold, normalize)

    /** Cross-snapshot near-dup pairs of this batch vs the prior index:
      * (d_new, d_prior, jac ≥ threshold), exact-Jaccard verified. */
    def nearDuplicatesAgainstIndex(index: graft.operators.DedupIndex,
        threshold: Double = 0.8): DataFrame =
      graft.operators.IncrementalDedup.nearDupPairsAgainstIndex(df, index, threshold)

    /** Benchmark decontamination: (doc_id, n_shared) for batch docs
      * sharing ≥ 1 window fingerprint with the held-out `index`. */
    def contaminatedAgainstIndex(index: graft.operators.DedupIndex): DataFrame =
      graft.operators.IncrementalDedup.contaminatedAgainstIndex(df, index)

    /** Exact-tier incremental screen through a Bloom prefilter: rows
      * whose fingerprint the filter rejects skip the verify join
      * entirely (definitely new); the rest are exact-verified — the
      * result is identical to the plain anti-join at a fraction of its
      * join traffic once the index dwarfs the batch. */
    def bloomScreenAgainstIndex(index: graft.operators.DedupIndex,
        expectedItems: Long = 1L << 20, fpp: Double = 0.01): DataFrame =
      graft.operators.IncrementalDedup.bloomScreenExact(df, index, expectedItems, fpp)

    /** Top-k terms per document by smoothed TF-IDF. */
    def tfidfTopTerms(k: Int = 3): DataFrame =
      graft.operators.TextAnalysis.tfidfTopTerms(df, k)

    /** Duplicate clusters: connected components over the exact-Jaccard
      * near-dup graph. Returns (doc_id, cluster_id = smallest doc_id in
      * the component) for every doc with at least one near-dup. */
    def duplicateClusters(threshold: Double = 0.8): DataFrame =
      graft.operators.Corpus
        .connectedComponents(Dedup.jaccardPairs(df, threshold).select("d1", "d2"))
        .select(col("node").as("doc_id"), col("lbl").as("cluster_id"))
  }

  implicit final class VectorDatasetOps(private val df: DataFrame) extends AnyVal {
    /** Exact cosine top-k of `queries` against this corpus.
      * Returns (q_id, nb_id, cos, rn ≤ k). */
    def cosineTopK(queries: DataFrame, k: Int = 10): DataFrame =
      Similarity.cosineTopK(df, queries, k)

    /** Embedding near-duplicate pairs (v1, v2, cos ≥ threshold).
      * `exact = false` switches to the hyperplane-LSH candidate
      * prefilter + exact verify — the path that scales past a
      * broadcastable corpus; intended for thresholds ≥ 0.8.
      * `probeBits > 0` adds hamming-1 multi-probing (recall dial that
      * avoids re-hashing the corpus with more tables). */
    def nearDuplicateVectors(threshold: Double = 0.9,
        exact: Boolean = true, probeBits: Int = 0): DataFrame =
      Similarity.nearDuplicateVectors(df, threshold, exact,
        probeBits = probeBits)

    /** Build the persistable IVF index (Lloyd centroids + corpus cell
      * assignments) for this embedding corpus. Pair with
      * [[searchAnnIndex]] / `IncrementalAnn.writeIndex` for the
      * cluster-once, probe-per-batch flow. */
    def buildAnnIndex(nCells: Int, iters: Int = 2): graft.operators.AnnIndex =
      graft.operators.IncrementalAnn.buildIndex(df, nCells, iters)

    /** IVF search of THIS frame (as queries) against a prior index:
      * (q_id, nb_id, cos, rn ≤ k) from the probed cells only. */
    def searchAnnIndex(index: graft.operators.AnnIndex, nProbe: Int = 4,
        k: Int = 10): DataFrame =
      graft.operators.IncrementalAnn.searchIndex(df, index, nProbe, k)

    /** Embedding near-dup screen of THIS frame (the new batch) against
      * a prior index: (v_new, v_prior, cos ≥ threshold). */
    def nearDuplicateVectorsAgainstIndex(index: graft.operators.AnnIndex,
        threshold: Double = 0.9, nProbe: Int = 4): DataFrame =
      graft.operators.IncrementalAnn.nearDupAgainstIndex(df, index, threshold, nProbe)

    /** SemDeDup audit frame (vec_id, cell, max_lower_cos, is_dup):
      * k-means cells + intra-cell cosine prune at τ = threshold.
      * Filter on !is_dup (or use [[semanticSurvivors]]) to dedup. */
    def semanticDuplicates(k: Int = 16, iters: Int = 2,
        threshold: Double = 0.4): DataFrame =
      graft.operators.SemDedup.semanticDups(df, k, iters, threshold)

    /** Rows of this corpus surviving SemDeDup (keep-lowest-id
      * representative per semantic near-dup group within a cell). */
    def semanticSurvivors(k: Int = 16, iters: Int = 2,
        threshold: Double = 0.4): DataFrame =
      graft.operators.SemDedup.survivors(df, k, iters, threshold)

    /** Train the persistable IVF-PQ index over this embedding corpus
      * (coarse anchors + per-subspace codebooks + cell-partitioned
      * 4-byte codes). Pair with [[searchPqIndex]] /
      * `Pq.writePqIndex`/`appendToPqIndex` for the train-once,
      * encode-per-batch serving flow. */
    def buildPqIndex(nCells: Int = graft.operators.Pq.IvfCells,
        kCodes: Int = graft.operators.Pq.KProd): graft.operators.Pq.PqIndex =
      graft.operators.Pq.buildPqIndex(df, nCells, kCodes)

    /** ADC search of THIS frame (as queries) against a PQ index:
      * (q_id, nb_id, adc, rn ≤ k) over the probed cells' codes only —
      * no float vector is touched after training. */
    def searchPqIndex(index: graft.operators.Pq.PqIndex, nProbe: Int = 2,
        k: Int = 5): DataFrame =
      graft.operators.Pq.searchPqIndex(df, index, nProbe, k)

    /** Per-dimension drift of THIS corpus (base) vs a `current`
      * snapshot: (dim, mean_base, mean_cur, drift) — the statistical
      * "when to retrain the index" trigger (n103). One union-tagged
      * pass, DECIMAL-exact means. */
    def embeddingDrift(current: DataFrame): DataFrame =
      Similarity.embeddingDrift(df, current)

    /** Per-cell load of THIS corpus under an index's coarse anchors
      * vs the uniform ideal: (cell, cnt, skew) — the structural
      * "when to retrain" trigger (n104). One broadcast-assignment
      * pass. */
    def ivfCellSkew(anchors: DataFrame): DataFrame =
      graft.operators.Pq.cellSkew(df, anchors)

    /** Per-dimension Population Stability Index of a `current`
      * snapshot vs THIS corpus (base): (dim, psi) — the
      * histogram-shaped retrain trigger (n107), which sees
      * distribution-shape changes a mean can cancel. Conventional
      * alarm band: psi > 0.2. One union-tagged pass, 12 fixed bins,
      * Laplace-smoothed. */
    def psiDrift(current: DataFrame): DataFrame =
      Similarity.psiDrift(df, current)
  }

  /** Media ops over a (doc_id, media: binary) frame — encoded images
    * as opaque payloads, the multimodal-column contract. */
  implicit final class MediaDatasetOps(private val df: DataFrame) extends AnyVal {

    /** (doc_id, phash): the 16-bit WHT perceptual hash of each PPM
      * payload via the codegen'd `ppm_phash` expression — decode never
      * leaves the scan stage; undecodable payloads drop (NULL hash). */
    def perceptualHashes(): DataFrame =
      df.filter(graft.functions.GraftFunctions.ppm_valid(col("media")))
        .select(col("doc_id"),
          graft.functions.GraftFunctions.ppm_phash(col("media")).as("phash"))

    /** Recompression-invariant duplicate groups: (phash, n_members,
      * members CSV sorted) — byte-different encodings of the same
      * pixels collide; only the 8-byte hash ever shuffles. */
    def perceptualDuplicateGroups(): DataFrame =
      perceptualHashes()
        .groupBy("phash")
        .agg(min(col("doc_id")).as("representative"),
          count(lit(1)).as("n_members"),
          array_join(array_sort(collect_list(col("doc_id"))).cast("array<string>"), ";")
            .as("members"))
        .filter(col("n_members") >= 2)

    /** Typed audio decode + features over a Dataset[MediaRow] of WAV
      * payloads: (doc_id, sample_rate, n_samples, duration_ms, peak,
      * clip_n, sum_sq, rms) through the real RIFF parser. */
    def audioFeatures()(implicit enc: org.apache.spark.sql.Encoder[
        graft.operators.Multimodal.MediaRow]): DataFrame =
      graft.operators.Multimodal.decodedAudio(df.as[graft.operators.Multimodal.MediaRow])
  }

  /** Tokenizer + learned-quality ops over (doc_id, text) frames that
    * complement [[DocumentOps]] (separate class only to keep the
    * 22-method implicit small enough to navigate). */
  implicit final class CurationModelOps(private val df: DataFrame) extends AnyVal {

    /** Train an ordered BPE merge list: one distributed word-count
      * pass, then the capped local loop (production trainer shape). */
    def trainBpe(nMerges: Int = 50): Seq[(String, String)] =
      graft.operators.Bpe.train(df, nMerges)

    /** Per-document token counts under a trained merge list. */
    def bpeTokenCounts(merges: Seq[(String, String)]): DataFrame =
      graft.operators.Bpe.tokenCounts(df, merges)

    /** Serving-form weak-supervision quality model trained on THIS
      * frame's rule-gate labels: (token log-odds table, 1-row consts)
      * — both DataFrames, persistable like any index. */
    def weakQualityModel(): (DataFrame, DataFrame) =
      graft.operators.Classifier.binaryLogOddsModel(
        graft.operators.Classifier.weakLabeledTrain(df))

    /** Score this frame under a serving-form model: (doc_id, logodds). */
    def qualityLogOdds(model: (DataFrame, DataFrame)): DataFrame =
      graft.operators.Classifier.logOddsScores(model._1, model._2, df)

    /** DSIR: resample k docs from this frame toward `target`'s
      * hashed-ngram distribution (deterministic Gumbel-top-k). */
    def dsirSelect(target: DataFrame, k: Int,
        seed: String = graft.operators.Selection.GumbelSeed): DataFrame =
      graft.operators.Selection.dsir(df, target, k, seed = seed)

    /** CCNet head/middle/tail buckets under a smoothed bigram LM
      * trained on `target` (per-language terciles). */
    def perplexityBuckets(target: DataFrame): DataFrame =
      graft.operators.Selection.ccnetPerplexityBuckets(df, target)

    /** Deterministic epoch shuffle: (doc_id, shard, pos) for a seeded
      * reproducible global permutation. */
    def epochShuffle(nShards: Int, seed: String): DataFrame =
      graft.operators.Selection.epochShuffle(df, nShards, seed)

    /** Soft dedup: per-doc sampling weight 1/|duplicate group| and
      * weight-adjusted effective token count. */
    def softDedupWeights(): DataFrame =
      graft.operators.Selection.softDedupWeights(df)

    /** Mean-pool member vectors per group (chunk embeddings → doc
      * embedding): (group, n_vecs, pooled: Array[Double]) with a
      * deterministic orderCol-sequenced fold. */
    def meanPoolEmbeddings(groupCol: String, orderCol: String = "vec_id",
        vecCol: String = "embedding"): DataFrame =
      graft.operators.Similarity.meanPoolEmbeddings(df, groupCol, orderCol, vecCol)

    /** One-row corpus data-card statistics: (n_docs, n_tokens,
      * vocab_size, dup_rate, mean_doc_tokens, lang_entropy,
      * source_entropy). */
    def corpusCard(): DataFrame = graft.operators.Corpus.corpusCard(df)

    /** Materialize THIS corpus as the packed training-shard store
      * (n112's layout): exact-`blockLen` token blocks with text +
      * fingerprint, one partition per shard — the layout whose
      * takedown rewrite is a native partition overwrite. */
    def packShards(base: String, blockLen: Long = 512L): Unit =
      graft.operators.Corpus.writePackedShards(df, base, blockLen)

    /** Propagate takedowns into a packed store built from THIS (live)
      * corpus: repack exactly the shards holding the tombstoned docs,
      * delete fully-emptied shards, leave every other shard's bytes
      * untouched. Returns the number of shards rewritten or deleted —
      * the takedown-traffic-sized contract (n112). */
    def takedownPackedShards(base: String, tombstones: DataFrame,
        blockLen: Long = 512L): Long =
      graft.operators.Corpus.takedownPackedShards(df.sparkSession, base,
        df, tombstones, blockLen)

    /** BM25 top-k retrieval against a bounded (q_id, term) query set
      * — decontamination lookup / corpus audit. Returns (q_id, rank,
      * doc_id, score). */
    def bm25TopK(queries: DataFrame, k: Int = 10,
        k1: Double = 1.2, b: Double = 0.75): DataFrame =
      graft.operators.TextAnalysis.bm25TopK(df, queries, k, k1, b)

    /** Temperature-scaled source mixing (mT5 recipe): deterministic
      * draw of ~`total` docs with per-source shares ∝ (token share)^α.
      * Returns (source, doc_id, rk, target_n). */
    def temperatureMix(total: Long, alpha: Double = 0.3,
        seed: String = "mix-epoch0"): DataFrame =
      graft.operators.Selection.temperatureMix(df, total, alpha, seed)

    /** Graded nDCG@k of THIS corpus's BM25 ranking against the
      * capped-term-frequency relevance grade (the n108 eval in one
      * call): (q_id, dcg, idcg, ndcg). Pass a custom `rel` frame
      * ((q_id, doc_id, rel)) to grade against external judgments. */
    def bm25Ndcg(queries: DataFrame, k: Int = 10,
        rel: Option[DataFrame] = None): DataFrame = {
      val t = graft.operators.TextAnalysis
      t.ndcgAtK(
        t.bm25TopK(df, queries, k).select("q_id", "doc_id", "rank"),
        rel.getOrElse(t.cappedTfRelevance(df, queries)), k)
    }

    /** Hybrid (lexical + semantic) top-k in one call: BM25 over THIS
      * corpus against the (q_id, term) query bags, IVF-PQ over
      * `embeddings` (vec_id ↔ doc_id, the id bridge; trained on the
      * even half, the n64 frozen configuration) against each q_id's
      * own embedding, RRF-fused (k = 60, n90's rank-level rule).
      * Returns (q_id, cand, rrf, rrf_rank) — the n110 `rrf` system's
      * ranking, which ApiSpec pins. */
    def hybridTopK(queries: DataFrame, embeddings: DataFrame,
        k: Int = 10): DataFrame = {
      val t = graft.operators.TextAnalysis
      val qIds = queries.select("q_id").distinct()
      val lex = t.bm25TopK(df, queries, k)
        .select(col("q_id"), col("doc_id").as("cand"), col("rank").as("r"))
      val sem = graft.operators.Pq.searchPqIndex(
          embeddings.join(broadcast(qIds),
            embeddings("vec_id") === qIds("q_id"), "left_semi"),
          graft.operators.Pq.buildAccumulatedIndex(embeddings))
        .select(col("q_id"), col("nb_id").as("cand"), col("rn").as("r"))
      graft.operators.Similarity.rrfFuse(lex, sem, k)
    }

    /** Tenant-scoped hybrid top-k (n111's production shape): `allowed`
      * is an id-keyed metadata/ACL frame (`doc_id` column — tenant,
      * language, licence); BOTH arms pre-filter to it before any
      * scoring. Lexical: BM25 over the allowed slice of THIS corpus
      * (tenant-scoped df/N/avgdl — the per-tenant-index semantics).
      * Semantic: the shared frozen PQ configuration with its code rows
      * semi-filtered to the allowed ids
      * ([[graft.operators.Pq.filterPqIndex]] — the config never
      * narrows, n98's rule, so answers equal re-encoding the tenant
      * under the same anchors/books). Queries are NOT filtered — a
      * query comes from anywhere; its ANSWERS must be in-tenant.
      * Returns (q_id, cand, rrf, rrf_rank); ApiSpec pins the form
      * against the public ops. */
    def hybridTopK(queries: DataFrame, embeddings: DataFrame,
        allowed: DataFrame, k: Int): DataFrame = {
      val t = graft.operators.TextAnalysis
      val qIds = queries.select("q_id").distinct()
      val keep = allowed.select("doc_id").distinct()
      val lex = t.bm25TopK(df.join(keep, Seq("doc_id"), "left_semi"),
          queries, k)
        .select(col("q_id"), col("doc_id").as("cand"), col("rank").as("r"))
      val sem = graft.operators.Pq.searchPqIndex(
          embeddings.join(broadcast(qIds),
            embeddings("vec_id") === qIds("q_id"), "left_semi"),
          graft.operators.Pq.filterPqIndex(
            graft.operators.Pq.buildAccumulatedIndex(embeddings),
            keep.select(col("doc_id").as("vec_id"))))
        .select(col("q_id"), col("nb_id").as("cand"), col("rn").as("r"))
      graft.operators.Similarity.rrfFuse(lex, sem, k)
    }
  }

  /** Event-stream analytics over an (event_id, user_id, ts, event_type,
    * value) frame. */
  implicit class EventOps(df: DataFrame) {

    /** Last-click attribution (st28's production shape): each
      * `purchaseType` event assigned to the single LATEST `clickType`
      * event by the same user within the backward window — the native
      * as-of merge join, so output is purchase-proportional and the
      * per-key cost is a sort, never the all-pairs window join's
      * quadratic candidate set (the measured hot-user skew-killer,
      * PERF.md round 14). Streaming deployments use the O(1)-per-key
      * register form,
      * [[graft.streaming.StreamingOps.lastClickAttribution]]. Returns
      * (event_id, user_id, purchase_ts, click_ts, p_value). */
    def lastClickAttribution(windowMinutes: Int = 60,
        clickType: String = "click",
        purchaseType: String = "purchase"): DataFrame =
      graft.streaming.WindowedAggs.lastClickAttribution(
        df, windowMinutes, clickType, purchaseType)
  }
}
