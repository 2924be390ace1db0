package graft

/** Parallelism must not change answers: every catalog result is built
  * from order-independent aggregation (DECIMAL sums, min/max, counts)
  * or explicitly tie-broken ranking, so the SAME query under a
  * different shuffle-partition count — a different reduce order, a
  * different partial-aggregation tree — must return byte-identical
  * rows. This is the determinism half of the 100 TB claim: a
  * 1000-executor cluster never runs with the test suite's partition
  * count, and a float fold that survives only at one parallelism is a
  * latent hash-flip. A representative entry per family keeps the suite
  * fast; the full catalog's two-run determinism (same config) is
  * CatalogSpec's job. */
class PartitionInvarianceSpec extends SparkSpec {

  // one per numeric-sensitivity family: DECIMAL-folded aggs (a01, x13),
  // window ranks (w02), LSH/dedup chain (n04), NB chain + gopher
  // (n68), PQ/ADC float chain (n56), BM25 index probe (n91), RRF
  // fusion (n90), rolling-hash surgery + dedup (st13), CC clusters
  // (n07), retention sweep's global rank (n71)
  private val entries = Seq(
    "a01_shipping_priority", "x13_correlation", "w02_rank_dense",
    "n04_lsh_neardup", "n68_weak_quality", "n56_pq_adc",
    "n91_bm25_index", "n90_hybrid_rrf", "st13_stream_decontaminate_rewrite",
    "n07_dup_clusters", "n71_retention_sweep",
    // tombstone probe (anti-join chain) and the sketch-banded entry —
    // approx_percentile's merge tree CHANGES with partitioning; only
    // the band booleans may be emitted, never the sketch value
    "n93_index_delete", "n94_retention_approx",
    // doc-keyed winHashes delete + decontamination screen (r11)
    "n96_delete_decontaminate",
    // fused index-serving retrieval: BM25-from-index + IVF under RRF (r11)
    "n95_fused_serving",
    // streaming-takedown twin: LSH pair set minus takedown pairings (r11)
    "st14_stream_takedown",
    // tombstone-deleted BM25 / PQ serving (anti-join + frozen-config) (r11)
    "n97_bm25_delete", "n98_pq_delete",
    // upsert axes + snapshot-versioned serving ladder (r11)
    "n99_bm25_upsert", "n100_pq_upsert", "st15_snapshot_serve",
    "n101_serving_compact",
    // drift-triggered retrain + its two trigger audits (r11)
    "n102_pq_retrain", "n103_embedding_drift", "n104_ivf_cell_skew",
    // snapshot-versioned ANN serving lane's batch twin (r11)
    "st16_ann_snapshot_serve",
    // PQ at-rest fold+swap lifecycle (r11)
    "n105_pq_serving_compact",
    // windowed HLL band booleans: register-max merge is commutative (r11)
    "x14_window_distinct",
    // streaming drift monitor's batch twin: DECIMAL-exact means (r11)
    "st17_stream_drift",
    // drift→retrain gate: trigger scalar + both served arms (r12)
    "n106_drift_gated_retrain",
    // streaming drift-gated serving's batch twin (r12)
    "st18_drift_gated_serve",
    // compacting serving lanes' batch twins: served THROUGH the fold (r12)
    "st19_stream_serving_compact", "st20_ann_serving_compact",
    // PSI histogram trigger (binned counts + smoothed ln-ratio sums),
    // graded-nDCG eval (windowed ideal rank + DECIMAL term sums), and
    // metadata-filtered IVF serving (filtered candidate rerank) (r12)
    "n107_psi_drift", "n108_ndcg_eval", "n109_filtered_ann",
    // takedown-aware serving: liveness agg + latest-add-segment join (r12)
    "st21_stream_serving_takedown",
    // vector-side takedown serving: candidate anti-join under frozen config (r12)
    "st22_ann_serving_takedown",
    // hybrid takedown serving: one liveness fold, two arms, RRF fusion (r12)
    "st23_hybrid_serving_takedown",
    // takedown compaction: liveness-filtered fold + ops GC, served through (r12)
    "st24_takedown_compaction",
    // per-system fusion eval: three rankings graded on one rel frame (r12)
    "n110_hybrid_ndcg",
    // ANN takedown compaction: tombstone-filtered gen fold + ops GC (r12)
    "st25_ann_takedown_compaction",
    // tenant-filtered hybrid: semi-filtered index stats + filtered IVF
    // rerank under RRF (r13)
    "n111_filtered_hybrid",
    // packed-shard takedown: per-shard prefix-sum repack + block md5 (r13)
    "n112_packed_takedown",
    // hybrid physical forget: both arms' folds + per-arm liveness (r13)
    "st26_hybrid_takedown_compaction",
    // packed-store CDC lane: liveness-resolved repack per batch (r13)
    "st27_stream_packed_takedown",
    // stop-shingle containment: capped inverted-index self-join (r13)
    "n113_containment_capped",
    // last-click attribution: native as-of merge join + residual (r14)
    "st28_attribution_lastclick",
    // tiered dedup: CC reps tier feeding containment on survivors (r14)
    "n114_tiered_containment",
    // tenant-scoped forget: per-tenant filtered serve through both
    // takedown arms (r14)
    "n115_tenant_takedown",
    // capped streaming near-dup's batch twin: per-bucket rank gate +
    // first-colliding-band emission (r15)
    "st29_stream_neardup_capped")

  private def rowsAt(name: String, partitions: Int): Seq[String] = {
    spark.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    try {
      // operator memoizers cache frames built under the previous
      // partition count — clear so each run re-aggregates at the
      // configured parallelism (the point of the test)
      graft.operators.Dedup.clearShingleCache(spark)
      graft.operators.Corpus.clearClusterCache(spark)
      graft.operators.Pq.clearPqCache(spark)
      Catalog.queries(name)(spark, sf0001).collect().map(_.toString).toSeq
    } finally spark.conf.set("spark.sql.shuffle.partitions", "4")
  }

  entries.foreach { name =>
    test(s"$name: identical rows at 3 and 13 shuffle partitions") {
      val a = rowsAt(name, 3)
      val b = rowsAt(name, 13)
      assert(a.nonEmpty)
      assert(a == b, {
        val diff = a.zip(b).zipWithIndex.collectFirst {
          case ((x, y), i) if x != y => s"first diff at row $i:\n  p3 = $x\n  p13= $y"
        }
        diff.getOrElse(s"row count ${a.size} vs ${b.size}")
      })
    }
  }
}
