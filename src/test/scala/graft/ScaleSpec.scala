package graft

import graft.plans.Scale
import org.apache.spark.sql.functions._

/** Salting + bucketing helpers: semantics preserved, shuffles removed. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join result on skewed data") {
    // heavily skewed left: 10k rows on one key, a few elsewhere
    val left = ((1 to 10000).map(i => (1L, i.toLong)) ++
      (1 to 50).map(i => (2L, i.toLong)) ++ Seq((3L, 0L)))
      .toDF("k", "payload")
    val right = Seq((1L, "hot"), (2L, "warm"), (4L, "unmatched"))
      .toDF("rk", "v")

    val plain = left.join(right, col("k") === col("rk"))
      .select("k", "payload", "v").collect().toSet
    val salted = Scale.saltedJoin(left, "k", "payload", right, "rk", 8)
      .select("k", "payload", "v").collect().toSet
    assert(salted == plain)
    assert(salted.size == 10050)
  }

  test("salted join is deterministic across runs (hash salt, not rand)") {
    val left = (1 to 500).map(i => (i.toLong % 7, i.toLong)).toDF("k", "payload")
    val right = (0 to 6).map(i => (i.toLong, s"v$i")).toDF("rk", "v")
    val a = Scale.saltedJoin(left, "k", "payload", right, "rk", 4)
      .select("k", "payload", "v").collect().toSet
    val b = Scale.saltedJoin(left, "k", "payload", right, "rk", 4)
      .select("k", "payload", "v").collect().toSet
    assert(a == b && a.size == 500)
  }

  test("AQE skew-join splits the hot partition at runtime (no manual salt)") {
    // one key owns ~95% of the rows; with tiny skew thresholds AQE must
    // mark the sort-merge join as skew-handled and still return exact
    // results — the runtime counterpart of Scale.saltedJoin
    // repartition(8): skew splitting works at map-output granularity, so
    // the hot key's rows must come from multiple mappers (a single
    // LocalTableScan partition cannot be split)
    // varied payloads: 40k identical rows compress below any realistic
    // skew threshold in the shuffle blocks
    def pay(i: Int) = java.util.UUID.nameUUIDFromBytes(
      BigInt(i).toByteArray).toString
    val left = ((1 to 40000).map(i => (1L, pay(i))) ++
      (1 to 2000).map(i => ((i % 50) + 2L, pay(-i)))).toDF("k", "payload")
      .repartition(8)
    val right = (1 to 60).map(i => (i.toLong, s"dim$i")).toDF("rk", "name")
      .repartition(4)
    withSQLConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val joined = left.join(right, col("k") === col("rk"))
      // execute THIS DataFrame (count() would plan a separate query and
      // the adaptive plan below would never finalize)
      assert(joined.collect().length == 40000 + 2000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the skewed join; plan:\n${plan.take(2000)}")
    }
  }

  private def withSQLConf[A](pairs: (String, String)*)(f: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      val t = Tables(spark, sf0001)
      val selective = t.orders.filter(col("o_totalprice") > 300000)
      val joined = t.lineitem
        .join(selective, col("l_orderkey") === col("o_orderkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString.toLowerCase
      assert(optimized.contains("bloom"),
        s"expected an injected bloom runtime filter in:\n$optimized")
      // and the filter is semantics-preserving
      val expected = t.lineitem.join(
        t.orders.filter(col("o_totalprice") > 300000),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val t = Tables(spark, sf0001)
      Scale.writeBucketed(t.orders, "orders_b", "o_orderkey", 4)
      Scale.writeBucketed(
        t.lineitem.select("l_orderkey", "l_quantity"), "lineitem_b",
        "l_orderkey", 4)
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      // and it still returns the right rows
      assert(joined.count() == t.lineitem.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("bucketed dedup index: band probe joins exchange-free, answers unchanged") {
    import graft.operators.{Dedup, IncrementalDedup}
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val docs = Tables(spark, sf0001).documents
    val prior = docs.filter(col("doc_id") % 2 === 0)
    val fresh = docs.filter(col("doc_id") % 2 === 1)
    val dir = java.nio.file.Files.createTempDirectory("bucketed_idx").toString
    try {
      IncrementalDedup.buildAndWriteIndex(prior, dir)
      IncrementalDedup.publishBucketed(spark, dir, "idx", numBuckets = 4)
      // the daily-pipeline shape: the batch's bands staged bucketed the
      // same way, then the candidate probe = co-located (band, sig) join
      graft.plans.Scale.writeBucketed(
        IncrementalDedup.buildIndex(fresh).bands
          .select(col("doc_id").as("d_new"), col("band"), col("sig")),
        "batch_bands", Seq("band", "sig"), 4)
      // candidate generation only (the downstream DISTINCT keys on
      // (d_new, d_prior) and legitimately re-shuffles); the claim under
      // test is that the (band, sig) JOIN itself co-locates
      val probe = spark.table("batch_bands")
        .join(spark.table("idx_bands")
          .select(col("doc_id").as("d_prior"), col("band"), col("sig")),
          Seq("band", "sig"))
        .select("d_new", "d_prior")
      val plan = probe.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed band probe should not shuffle the join:\n$plan")
      // and the bucketed index yields the IDENTICAL near-dup answer
      val bucketed = IncrementalDedup.nearDupPairsAgainstIndex(
        fresh, IncrementalDedup.readBucketed(spark, "idx"), 0.6)
        .select("d_new", "d_prior").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val plain = IncrementalDedup.nearDupPairsAgainstIndex(
        fresh, IncrementalDedup.readIndex(spark, dir), 0.6)
        .select("d_new", "d_prior").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(bucketed == plain && bucketed.nonEmpty,
        s"bucketed ${bucketed.size} pairs vs plain ${plain.size}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      Seq("idx_bands", "idx_shingles", "idx_sizes", "idx_fingerprints",
        "idx_winhash", "idx_hot", "batch_bands").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("n89 catalog entry: no shuffle exchange directly above any bucketed index scan") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.{BaseJoinExec, HashedRelationBroadcastMode}
    // broadcast disabled so every probe join is forced to ask for a
    // hash-clustered distribution — the bucketed side must satisfy it
    // from its at-rest layout, never via an exchange
    // AQE off: AdaptiveSparkPlanExec is a leaf to collect(), so the
    // static plan is the one a tree-walk can see — the bucketing
    // property under test is planning-time anyway
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val df = Catalog.queries("n89_bucketed_probe")(spark, sf0001)
      val top = df.queryExecution.executedPlan
      def bucketedScan(p: SparkPlan): Boolean = p match {
        case f: FileSourceScanExec =>
          f.tableIdentifier.exists(_.table.startsWith("graft_bidx_"))
        case _ => false
      }
      // offending pattern: a shuffle whose subtree reaches a bucketed
      // index scan WITHOUT crossing a join (i.e. the exchange is
      // re-clustering the raw index, not a derived/joined stream)
      def reachesScanJoinFree(p: SparkPlan): Boolean =
        bucketedScan(p) || (!p.isInstanceOf[BaseJoinExec] &&
          p.children.exists(reachesScanJoinFree))
      val offenders = top.collect {
        case e: ShuffleExchangeLike if e.children.exists(reachesScanJoinFree) => e
      }
      assert(offenders.isEmpty,
        s"index-side exchange over a bucketed scan:\n${offenders.mkString("\n")}")
      // sanity: the plan actually contains the bucketed scans
      assert(top.collect { case p if bucketedScan(p) => p }.size >= 3,
        s"expected bucketed index scans in:\n$top")
    }
  }

  test("PQ serving read is dynamic-partition-pruned: only probed cells' code dirs are scanned") {
    import graft.operators.Pq
    // the at-rest 100 TB serving claim behind the cell-partitioned
    // codes layout (Pq.writePqIndex partitionBy("cell")): the probe
    // side is a tiny (q_id, cell) frame, so Spark's dynamic partition
    // pruning must turn the cell join into a directory-level IN filter
    // on the codes scan — a serve reads nProbe/nCells of the index,
    // never all of it. A layout regression (codes written unpartitioned,
    // or the join rewritten so DPP can't attach) fails here.
    // assert on the REAL serving path (AQE on, the catalog default):
    // under AQE the DPP filter reuses the probe side's broadcast, so
    // the formatted plan carries a live `IN dynamicpruning#N` partition
    // filter on the cell-partitioned codes scan (with AQE forced off
    // the reuse heuristic degenerates the filter to literal true —
    // observed here — which is exactly why the assertion targets the
    // configuration the entries run under)
    val e = Tables(spark, sf0001).embeddings
    val dir = java.nio.file.Files.createTempDirectory("pq_dpp").toString
    Pq.writePqIndex(Pq.buildPqIndex(e), dir)
    val served = Pq.searchPqIndex(e.filter(col("vec_id") < 8),
      Pq.readPqIndex(spark, dir))
    assert(served.count() > 0)
    val plan = served.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("dynamicpruning#"),
      s"codes scan not dynamic-partition-pruned:\n$plan")
    assert(!codeScansUnpruned(plan),
      s"codes scan carries only a degenerate dynamicpruningexpression(true):\n$plan")
  }

  /** True when every dynamicpruningexpression in `plan` is the
    * degenerate literal-true form (no live IN subquery attached). */
  private def codeScansUnpruned(plan: String): Boolean =
    plan.contains("dynamicpruningexpression(true)") &&
      !plan.contains("IN dynamicpruning#")
}
