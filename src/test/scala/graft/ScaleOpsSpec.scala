package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.ScaleOps

/** ScaleOps invariants the DuckDB hash oracle can't express: the
  * z-order layout must actually PRUNE (vs the natural layout), the
  * interleave must be a bijection, and the skew histogram must conserve
  * rows and keys. */
class ScaleOpsSpec extends SparkSpec {

  import spark.implicits._

  test("zValue is the reference Morton interleave (bijective on samples)") {
    // row-level reference: interleave bit i of x to 2i, y to 2i+1
    def ref(x: Long, y: Long): Long =
      (0 until ScaleOps.ZBits).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (1L, 65535L), (40000L, 7L))
    val got = samples.toDF("x", "y")
      .select(ScaleOps.zValue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == samples.map { case (x, y) => ref(x, y) })
    // distinct inputs -> distinct z (bijectivity on the sample set)
    assert(got.distinct.size == samples.size)
  }

  test("assertZDomain passes in-domain keys and fails loudly past 2^ZBits") {
    // harness tables fit the 16-bit interleave domain at this SF ...
    val li = Tables(spark, sf0001).lineitem
    ScaleOps.assertZDomain(li, "l_partkey", "l_suppkey")
    // ... and a key past 2^ZBits must throw, not silently alias
    val wide = Seq((70000L, 1L), (3L, 4L)).toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      ScaleOps.assertZDomain(wide, "x", "y")
    }
    assert(e.getMessage.contains("exceed"))
  }

  test("z-order layout prunes the probe; the natural layout does not") {
    val li = Tables(spark, sf0001).lineitem
      .select("l_partkey", "l_suppkey", "l_orderkey", "l_linenumber")
    val nFiles = 16
    val zAudit = ScaleOps.zorderAudit(li, "l_partkey", "l_suppkey", nFiles,
      Seq("l_orderkey", "l_linenumber"), probeLo = 100L, probeHi = 110L)
      .collect()
    assert(zAudit.length == nFiles)
    val zHits = zAudit.count(_.getAs[Boolean]("hit"))
    // natural layout: same audit but ordered by arrival key (z ignored):
    // assign files by (orderkey, linenumber) and measure the same probe
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("l_orderkey", "l_linenumber")
    val natHits = li
      .withColumn("file_id", ntile(nFiles).over(w))
      .groupBy("file_id")
      .agg(min("l_partkey").as("x_min"), max("l_partkey").as("x_max"))
      .filter(col("x_min") <= 110L && col("x_max") >= 100L)
      .count()
    // the point of the layout: the probe touches a small fraction of
    // z-ordered files but nearly every naturally-ordered file
    assert(zHits <= nFiles / 4,
      s"z-order should prune: $zHits of $nFiles files hit")
    assert(natHits >= nFiles - 1,
      s"natural layout should NOT prune (sanity): $natHits of $nFiles hit")
    // extent conservation: files partition all rows
    assert(zAudit.map(_.getAs[Long]("cnt")).sum == li.count())
  }

  test("zorderLayout (range-partition path) co-locates z-ranges") {
    val li = Tables(spark, sf0001).lineitem
      .select("l_partkey", "l_suppkey")
    val laid = ScaleOps.zorderLayout(li, "l_partkey", "l_suppkey", 8)
    // per-partition z-ranges must be disjoint (range partitioning):
    // max(z) of partition p < min(z) of partition p+1
    val ranges = laid
      .select(spark_partition_id().as("pid"), col("z"))
      .groupBy("pid").agg(min("z").as("lo"), max("z").as("hi"))
      .orderBy("pid")
      .collect()
    // groupBy only yields rows for non-empty partitions, so lo/hi are
    // never null here
    ranges.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("hi") <= b.getAs[Long]("lo"),
          s"overlapping z-ranges: $a vs $b")
      case _ => ()
    }
  }

  test("skew histogram conserves keys and rows; buckets are log2-consistent") {
    val ev = Tables(spark, sf0001).events
    val hist = ScaleOps.keyHistogram(ev, "user_id").collect()
    val nKeys = ev.select("user_id").distinct().count()
    val nRows = ev.count()
    assert(hist.map(_.getAs[Long]("n_keys")).sum == nKeys)
    assert(hist.map(_.getAs[Long]("bucket_rows")).sum == nRows)
    hist.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(r.getAs[Long]("lo_cnt") == (1L << b))
      // a bucket-b key holds in [2^b, 2^(b+1)) rows, so bucket_rows is
      // bounded by n_keys * those extremes
      val nk = r.getAs[Long]("n_keys")
      val br = r.getAs[Long]("bucket_rows")
      assert(br >= nk * (1L << b) && br < nk * (2L << b))
    }
    // shares sum to ~1 (round6 per bucket)
    val share = hist.map(_.getAs[Double]("row_share")).sum
    assert(math.abs(share - 1.0) < 1e-4)
  }

  test("skewSummary flags a planted hot key and clears a uniform one") {
    val uniform = (1L to 1000L).map(i => (i % 100, i)).toDF("k", "v")
    val s1 = ScaleOps.skewSummary(uniform, "k").collect().head
    assert(s1.getAs[Long]("n_keys") == 100)
    assert(s1.getAs[Long]("n_rows") == 1000)
    assert(s1.getAs[Double]("skew_ratio") == 1.0)
    assert(s1.getAs[Double]("hot_share") == 0.0)

    val skewed = ((1L to 900L).map(_ => (0L, 1L)) ++
      (1L to 100L).map(i => (i, 1L))).toDF("k", "v")
    val s2 = ScaleOps.skewSummary(skewed, "k").collect().head
    assert(s2.getAs[Long]("max_cnt") == 900)
    // hot key carries 900 of 1000 rows
    assert(s2.getAs[Double]("hot_share") == 0.9)
    assert(s2.getAs[Double]("skew_ratio") > 50.0)
  }

  test("snapshotDiff classifies a planted manifest pair exactly") {
    import graft.operators.IncrementalDedup
    val oldM = Seq((1L, "aa"), (2L, "bb"), (3L, "cc"), (4L, null: String))
      .toDF("doc_id", "fp")
    val newM = Seq((1L, "aa"), (2L, "BB"), (5L, "ee"), (4L, null: String))
      .toDF("doc_id", "fp")
    val got = IncrementalDedup.snapshotDiff(oldM, newM)
      .select("doc_id", "status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(
      1L -> "unchanged",
      2L -> "changed",
      3L -> "removed",
      4L -> "unchanged", // null fp on both sides: null-safe equality
      5L -> "added"))
  }

  test("minhash estimate: identical docs estimate 1.0; estimate within binomial band") {
    val est = operators.Dedup.minhashEstimate
      .build(spark, sf0001).collect()
    assert(est.nonEmpty)
    est.foreach { r =>
      val jac = r.getAs[Double]("jac")
      val e = r.getAs[Double]("est")
      assert(e >= 0.0 && e <= 1.0)
      if (jac == 1.0) assert(e == 1.0, s"exact dup must match all components: $r")
      // 16 components: binomial sd = sqrt(J(1-J)/16) <= 0.125; allow 4 sd
      assert(math.abs(e - jac) <= 4 * 0.125 + 1e-9, s"estimate out of band: $r")
    }
  }
}
