package graft

/** Plan lint over the ENTIRE catalog: the PERF.md invariants as
  * executable assertions, so a regression that sneaks a cartesian
  * product or a codegen fallback into any of the 108 queries fails CI,
  * not a 100 TB run. */
class PlanLintSpec extends SparkSpec {

  // intentional broadcast-tiny-side nested-loop designs (documented in
  // PERF.md): 1-row threshold broadcasts, bounded query-set cross
  // products, the exact O(n²/2) verify baselines
  private val nestedLoopAllowed = Set(
    "p02_freshness",        // 1-row max-ts broadcast
    "r17_scalar_subquery",  // 1-row scalar broadcast
    "a24_inactive_rich",    // 1-row threshold broadcast
    "n28_unigram_logprob",  // 1-row corpus-total broadcast
    "n10_cosine_topk",      // 32-query broadcast build side
    "n10h_cosine_topk_heap",// same broadcast build side, heap rank
    "n15_quantized_topk",   // 32-query broadcast build side (int8 codes)
    "n12_embedding_neardup",// documented exact all-pairs baseline
    "n13_ann_ivf",          // 16-centroid broadcast assignment
    "n16_ann_ivf_kmeans",   // same 16-centroid broadcast, k-means-refined
    "n41_incremental_ann",  // same 16-centroid broadcast, persisted-index path
    "n59_ann_compaction",   // same 16-centroid broadcast, compacted-index path
    "n48_semdedup",         // same 16-centroid broadcast, SemDeDup assignment
    "n66_incremental_semdedup", // same 16-centroid broadcast, incremental screen
    "n62_ivf_pq",           // 8-anchor broadcast coarse assignment/probe
    "n62r_ivf_pq_residual", // same 8-anchor broadcast, residual-encoded path
    "n64_pq_index",         // same 8-anchor broadcast, persisted-index path
    "n70_pq_recall",        // 8-anchor probe broadcast + 32-query exact
                            //   baseline + 1-row sweep-count scalars
    "n70r_pq_recall_residual", // same shapes, residual model
    "n71_retention_sweep",  // n68's class/vocab broadcasts + 1-row
                            //   corpus-total broadcast per budget
    "n94_retention_approx", // n68's broadcasts + 1-row percentile/sketch
                            //   stats broadcast per budget (x12's pattern)
    "n50_tfidf_topterms",   // 1-row corpus-count broadcast (n28's pattern)
    "n67_nb_lang",          // class-frame (5-row) + 1-row vocab/total broadcasts
    "n68_weak_quality",     // 2-class frame + 1-row vocab/total broadcasts
    "st09_stream_classifier_gate", // 1-row model-constant broadcasts (n68's model)
    "x05_date_spine",       // 31-row generated spine
    "a04_small_qty",        // correlated scalar per-part (broadcast agg)
    "a14_market_share",     // tiny nation-share cross
    "a15_min_cost_supplier",// correlated min-cost broadcast
    "a27_important_stock",  // two 1-row broadcast scalars (total, n)
    "a28_top_supplier",     // 1-row broadcast max-revenue scalar
    "n46_mixture_resample", // 1-row mixture-scale scalar × 5-key part list
    "n83_bm25_search",      // 1-row (N, avgdl) corpus-stats broadcast (n50's pattern)
    "n91_bm25_index",       // same 1-row corpus-stats broadcast, index-probe path
    "n97_bm25_delete",      // same 1-row corpus-stats broadcast, tombstone path
    "n99_bm25_upsert",      // same 1-row corpus-stats broadcast, upsert path
    "st15_snapshot_serve",  // same 1-row corpus-stats broadcast, per snapshot
    "n101_serving_compact", // same 1-row corpus-stats broadcast, LSM-serving path
    "n95_fused_serving",    // n91's 1-row stats broadcast (lexical arm) +
                            //   n13's 16-centroid broadcast (semantic arm)
    "n98_pq_delete",        // n64's 8-anchor broadcast, tombstone path
    "n100_pq_upsert",       // n64's 8-anchor broadcast, upsert re-encode path
    "n102_pq_retrain",      // same 8-anchor broadcast, retrained-config path
    "n104_ivf_cell_skew",   // same 8-anchor broadcast + 1-row total scalar
    "st16_ann_snapshot_serve", // n64's 8-anchor broadcast, per snapshot
    "n105_pq_serving_compact", // n64's 8-anchor broadcast, folded-index path
    "n106_drift_gated_retrain", // n64's 8-anchor broadcast on both gated arms
    "st18_drift_gated_serve",   // n64's 8-anchor broadcast, per gated snapshot
    "n84_temperature_mix",  // 1-row token-total + 1-row normalizer broadcasts
    "n85_corpus_card",      // 1-row audit assembly (n60's pattern)
    "n88_truncation_recall",// n10's 32-query broadcast build side, per level
    "n90_hybrid_rrf",       // n10's 32-query broadcast build side (semantic arm)
    "n52_skew_audit",       // 1-row total-rows broadcast over the key histogram
    "n73_dsir_select",      // 1-row feature-total broadcast (tn×rn) into the
                            //   1024-row tau table (n28's corpus-total pattern)
    "n74_ccnet_buckets",    // 1-row vocab-size broadcast into the LM scoring join
    "n60_curation_audit",   // four 1-row stage-count scalars crossed into one row
    "n107_psi_drift",       // 1-row corpus-count broadcast into the 64×12 bin frame
    "n108_ndcg_eval",       // n83's 1-row (N, avgdl) corpus-stats broadcast
    "n109_filtered_ann",    // n13's 16-centroid broadcast, filtered-candidate path
    "st21_stream_serving_takedown", // n83's 1-row corpus-stats broadcast, per snapshot
    "st22_ann_serving_takedown", // n64's 8-anchor broadcast, per gated snapshot
    "st23_hybrid_serving_takedown", // n83's 1-row stats broadcast (lexical arm) +
                            //   n64's 8-anchor broadcast (semantic arm), per snapshot
    "st24_takedown_compaction", // n83's 1-row corpus-stats broadcast, per snapshot
    "n110_hybrid_ndcg",     // n83's 1-row stats broadcast (lex arm) + n64's
                            //   8-anchor broadcast (sem arm), graded once
    "st25_ann_takedown_compaction", // n64's 8-anchor broadcast, per snapshot
    "n111_filtered_hybrid", // n83's 1-row stats broadcast (filtered lex arm)
                            //   + n13's 16-centroid broadcast (filtered sem arm)
    "st26_hybrid_takedown_compaction", // n83's 1-row stats broadcast (lex arm) +
                            //   n64's 8-anchor broadcast (sem arm), per snapshot
    "n114_tiered_containment", // 1-row survivor-count scalar broadcast (the
                            //   tier-size evidence column, p02's pattern)
    "n115_tenant_takedown"  // n83's 1-row stats broadcast (tenant-filtered
                            //   lex arm), per snapshot × tenant
  )

  /** A query's executed plan PLUS every cached subtree it scans: the
    * session memoizers (Dedup shingles, Corpus clusters, Pq artifacts)
    * hide shared frames behind InMemoryTableScan nodes whose toString
    * omits the cached child — without recursing into
    * `relation.cachedPlan` the lint would silently stop covering
    * exactly the plans that run most often. */
  private def fullPlanString(df: org.apache.spark.sql.DataFrame): String = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def cachedPlans(p: SparkPlan): Seq[String] = {
      val cached = p.collect { case s: InMemoryTableScanExec => s.relation.cachedPlan }
      cached.flatMap(cp => cp.toString +: cachedPlans(cp))
    }
    val top = df.queryExecution.executedPlan
    (top.toString +: cachedPlans(top)).mkString("\n")
  }

  private lazy val plans: Map[String, String] =
    Catalog.all.map { q =>
      q.name -> PerfGuards.withEntry(q.name)(
        fullPlanString(q.build(spark, sf0001)))
    }.toMap

  test("no CartesianProduct anywhere in the catalog") {
    val offenders = plans.collect {
      case (name, p) if p.contains("CartesianProduct") => name
    }
    assert(offenders.isEmpty, s"cartesian products in: ${offenders.mkString(", ")}")
  }

  test("BroadcastNestedLoopJoin only where a tiny side is intentional") {
    val offenders = plans.collect {
      case (name, p)
        if p.contains("BroadcastNestedLoopJoin") && !nestedLoopAllowed(name) => name
    }
    assert(offenders.isEmpty,
      s"unexpected nested-loop joins in: ${offenders.mkString(", ")} — " +
        "either fix the plan or document the tiny side in PERF.md + allowlist")
  }

  test("all-pairs attribution join is quarantined to st04 (PERF.md r14 blowup)") {
    // the measured skew-killer (output-quadratic in a hot key's event
    // density, exponent 1.42 at one decade): it stays in the catalog
    // as the exact form with documented limits, but NO other entry may
    // compose on it — new attribution-shaped entries use the bounded
    // last-click register (st28). Equality (not ⊆) keeps the guard
    // non-vacuous: st04 itself must have recorded, proving the hook
    // still fires.
    plans: Unit // force every entry to build inside withEntry
    assert(PerfGuards.usersOf(PerfGuards.AllPairsAttribution) ==
      Set("st04_attribution"),
      s"all-pairs attribution used by: ${PerfGuards.usersOf(PerfGuards.AllPairsAttribution).mkString(", ")} — " +
        "compose on WindowedAggs.lastClickAttribution (st28) instead, " +
        "or document the bounded-density argument in PERF.md + allowlist")
  }

  test("no CodegenFallback expressions in any hot path") {
    val offenders = plans.collect {
      case (name, p) if p.contains("CodegenFallback") => name
    }
    assert(offenders.isEmpty, s"codegen fallbacks in: ${offenders.mkString(", ")}")
  }

  test("every lineitem scan prunes columns (never reads the full schema)") {
    // all 11 lineitem columns in one ReadSchema means pruning failed;
    // l_tax is the canary — the only queries selecting it are the
    // Q1-shaped pricing summary's sum_charge (a25) and the numeric
    // correlation matrix (x13, which correlates all four numerics),
    // both of which legitimately read it
    val canaryUsers = Set("a25_pricing_summary", "x13_correlation")
    val offenders = plans.collect {
      case (name, p)
        if !canaryUsers(name) &&
          p.linesIterator.exists(l => l.contains("ReadSchema") &&
            l.contains("l_tax")) => name
    }
    assert(offenders.isEmpty, s"unpruned lineitem scans in: ${offenders.mkString(", ")}")
    // a25 must still prune the columns it doesn't need (keys, dates
    // beyond the filter column): 7 of 11 used — l_orderkey is its canary
    plans.get("a25_pricing_summary").foreach { p =>
      assert(!p.linesIterator.exists(l => l.contains("ReadSchema") &&
        l.contains("l_orderkey")), "a25 reads columns it never uses")
    }
    // x13 reads exactly its 4 numeric columns — keys must be pruned
    plans.get("x13_correlation").foreach { p =>
      assert(!p.linesIterator.exists(l => l.contains("ReadSchema") &&
        l.contains("l_orderkey")), "x13 reads columns it never uses")
    }
    // sanity: the canary logic itself sees pruned scans (non-vacuous)
    assert(plans.values.exists(_.contains("l_shipdate")),
      "lint must actually be reading ReadSchema lines")
  }
}
