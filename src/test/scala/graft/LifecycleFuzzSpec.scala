package graft

import org.apache.spark.sql.functions._
import graft.operators.{LexIndex, Pq}

/** RANDOMIZED LIFECYCLE FUZZ over the physical-forget machinery
  * (VERDICT r12 #4): the crash cases pinned so far (torn batch, torn
  * generation, torn ops_base, crashed prune) are hand-picked instances;
  * this spec closes the CLASS. Seeded-random interleavings of
  * add / del / serve / fold / prune with crashes injected at the
  * file-system boundaries the machinery's two-phase contracts name,
  * over both forgetting trees:
  *
  *   - st24's lex LSM (`LexIndex.compactTakedownServing` /
  *     `pruneTakedownCompacted`),
  *   - st25's ANN generations (`Pq.foldPqTakedownIfDue` /
  *     `prunePqTakedownFolded`).
  *
  * Invariants checked at EVERY serve point of every interleaving:
  *   1. the serving view's live id set equals the model's last-op-wins
  *     liveness (same-batch tie → add) — no resurrection, no
  *     over-delete, in any crash window;
  * and at the END of every interleaving (after a final fold + prune):
  *   2. no dead id's bytes anywhere under the tree — segments/codes,
  *     ops logs, survivor summaries (the physical-forget contract).
  *
  * Crash model mirrors the lanes' reality: a torn batch commit is
  * always followed by its at-least-once REPLAY of the same batch id
  * (foreachBatch retries until the marker lands); folds/prunes can be
  * skipped or torn arbitrarily (the gates are self-healing across
  * batches). Injections are constructed from the public primitives
  * exactly as the machinery's own crash windows would leave them:
  * markerless segment/generation/base dirs, uncommitted ops_base
  * dirs, fold-without-prune.
  *
  * GRAFT_FUZZ_SEEDS scales the run (default 100 interleavings: 60 lex
  * + 40 ann; each 6-9 steps). */
class LifecycleFuzzSpec extends SparkSpec {
  // the fuzz drives thousands of tiny (≤ 24-row) jobs whose cost is
  // pure per-plan overhead: 4-way shuffles are scheduling noise at
  // that size, whole-stage codegen pays a javac compile per unique
  // plan (literals are embedded, so nearly every step is unique), and
  // AQE replans what a 1-task stage can't improve. Tune an ISOLATED
  // session (shared SparkContext, private SQLConf via newSession) so
  // concurrently-running suites keep the shared session's defaults —
  // this suite measures the MACHINERY's state transitions, not the
  // engine's hot-path performance (the bench does that).
  override lazy val spark: org.apache.spark.sql.SparkSession = {
    val s = SparkSpec.session.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "1")
    s.conf.set("spark.sql.codegen.wholeStage", "false")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s
  }
  import spark.implicits._

  private val totalSeeds =
    sys.env.getOrElse("GRAFT_FUZZ_SEEDS", "100").toInt
  private val lexSeeds = math.max(1, totalSeeds * 3 / 5)
  private val pqSeeds = math.max(1, totalSeeds - lexSeeds)

  /** Last-op-wins reference model (the livenessOf contract). */
  private final class Model {
    val lastAdd = scala.collection.mutable.Map[Long, Long]()
    val lastDel = scala.collection.mutable.Map[Long, Long]()
    def commit(batch: Long, adds: Seq[Long], dels: Seq[Long]): Unit = {
      adds.foreach(id => lastAdd(id) = batch)
      dels.foreach(id => lastDel(id) = batch)
    }
    def live: Set[Long] = lastAdd.keySet.filter { id =>
      lastDel.get(id).forall(_ <= lastAdd(id))
    }.toSet
    def dead: Set[Long] = lastAdd.keySet.filter { id =>
      lastDel.get(id).exists(_ > lastAdd(id))
    }.toSet
  }

  private def fsOf(base: String) =
    new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** doc texts for the lex universe: id-derived, a few shared words so
    * postings overlap across docs. */
  private def textOf(id: Long): String =
    s"w${id % 5} w${id % 7} common u$id u$id"

  test(s"lex takedown-LSM lifecycle fuzz: $lexSeeds seeded interleavings hold liveness + physical forget") {
    (0 until lexSeeds).foreach { seed =>
      val rng = new scala.util.Random(1000 + seed)
      val base = java.nio.file.Files
        .createTempDirectory(s"fuzz_lex_$seed").toString
      val fs = fsOf(base)
      val model = new Model
      var nextId = 0L
      val universe: Seq[Long] = (0L until 20L).toSeq

      def commitBatch(torn: Boolean): Unit = {
        val id = nextId
        val adds = rng.shuffle(universe).take(1 + rng.nextInt(3)).sorted
        val dels =
          if (model.lastAdd.isEmpty || rng.nextInt(3) == 0) Seq.empty[Long]
          else rng.shuffle(model.lastAdd.keys.toSeq)
            .take(1 + rng.nextInt(2)).sorted
        def writeAll(): Unit = {
          (adds.map(i => (i, "add")) ++ dels.map(i => (i, "del")))
            .toDF("doc_id", "op")
            .write.mode("overwrite").parquet(s"$base/ops/$id")
          LexIndex.writeIndex(
            LexIndex.buildIndex(
              adds.map(i => (i, textOf(i))).toDF("doc_id", "text")),
            s"$base/batches/$id")
        }
        writeAll()
        if (torn) writeAll() // the crash + at-least-once replay
        fs.create(new org.apache.hadoop.fs.Path(
          s"$base/_committed_batch_$id"), true).close()
        model.commit(id, adds, dels)
        nextId += 1
      }

      def checkServe(tag: String): Unit = if (nextId > 0) {
        val (idx, _, _) = LexIndex.readTakedownCompactServing(spark, base)
        val got = idx.doclens.select("doc_id").distinct()
          .collect().map(_.getLong(0)).toSet
        assert(got == model.live,
          s"seed $seed $tag: served live set $got != model ${model.live}")
      }

      def tornBaseDir(): Unit = if (nextId > 0) {
        // a fold that crashed before its marker: the materialized view
        // sits at the id the next real fold will use, markerless. A
        // REAL fold only targets ids ABOVE the committed watermark
        // (compactTakedownServing folds committed ids > upto), so the
        // injection must too — targeting the current base id would
        // overwrite compacted/<upto> while reading it, a state the
        // machinery can never produce (and the writeIndex fresh-path
        // rule exists to forbid). The fuzz caught this in its own
        // injector at 100 seeds (seed-dependent fold/commit orders).
        val (_, baseUpto) = LexIndex.servingLayout(spark, base)
        if (nextId - 1 > baseUpto) {
          val (idx, _, _) = LexIndex.readTakedownCompactServing(spark, base)
          LexIndex.writeIndex(idx, s"$base/compacted/${nextId - 1}")
        }
      }

      def tornOpsBase(): Unit = {
        // real crash shape only: never corrupt a dir a committed
        // `_compacted_upto_` marker already points at (a torn overwrite
        // deletes the dir before writing — committed content and torn
        // residue never coexist)
        val d = new java.io.File(s"$base/ops_base/${nextId - 1}")
        if (!d.exists()) {
          d.mkdirs()
          java.nio.file.Files.writeString(
            new java.io.File(d, "part-torn.parquet").toPath, "torn"): Unit
        }
      }

      commitBatch(torn = rng.nextBoolean())
      checkServe("first")
      val steps = 5 + rng.nextInt(4)
      (0 until steps).foreach { step =>
        rng.nextInt(6) match {
          case 0 | 1 => commitBatch(torn = rng.nextInt(3) == 0)
          case 2 =>
            LexIndex.compactTakedownServing(spark, base)
            // a crash window between fold and prune, half the time
            if (rng.nextBoolean()) LexIndex.pruneTakedownCompacted(spark, base)
          case 3 => LexIndex.pruneTakedownCompacted(spark, base)
          case 4 => if (nextId > 0 && rng.nextBoolean()) tornBaseDir()
            else tornOpsBase()
          case _ => ()
        }
        // every corruption the fuzz hunts is PERSISTENT (disk state),
        // so alternating serve checks lose no coverage — the next
        // check still sees a leak; the deterministic crash tests pin
        // the single-serve transient windows
        if (step % 2 == 0) checkServe("step")
      }
      // final: fold everything, prune, and prove the physical forget
      commitBatch(torn = false)
      LexIndex.compactTakedownServing(spark, base)
      LexIndex.pruneTakedownCompacted(spark, base)
      checkServe("final")
      val deadIds = model.dead
      def idsUnder(sub: String, idCol: String): Set[Long] = {
        val p = new org.apache.hadoop.fs.Path(s"$base/$sub")
        if (!fs.exists(p)) Set.empty
        else fs.listStatus(p).map(_.getPath.toString).flatMap { d =>
          val leaf =
            if (sub == "batches" || sub == "compacted") s"$d/doclens" else d
          try spark.read.parquet(leaf).select(idCol)
            .collect().map(_.getLong(0))
          catch { case _: Throwable => Array.empty[Long] }
        }.toSet
      }
      val onDisk = idsUnder("batches", "doc_id") ++
        idsUnder("compacted", "doc_id") ++ idsUnder("ops", "doc_id") ++
        idsUnder("ops_base", "doc_id")
      val leaked = deadIds.intersect(onDisk)
      assert(leaked.isEmpty,
        s"seed $seed: dead ids $leaked still on disk after final fold+prune")
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(base)): Unit
    }
  }

  test(s"ann takedown-generation lifecycle fuzz: $pqSeeds seeded interleavings hold liveness + physical forget") {
    val vecs = Tables(spark, sf0001).embeddings
      .filter(col("vec_id") < 24)
      .collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray)
      .toMap
    val universe = vecs.keys.toSeq.sorted

    (0 until pqSeeds).foreach { seed =>
      val rng = new scala.util.Random(2000 + seed)
      val base = java.nio.file.Files
        .createTempDirectory(s"fuzz_pq_$seed").toString
      val fs = fsOf(base)
      val model = new Model
      var nextId = 0L
      def served: Seq[Long] = (0L until nextId).toSeq

      def commitBatch(torn: Boolean): Unit = {
        val id = nextId
        // the n100 contract: a deleted id re-enters via upsert, never a
        // bare re-add — the generator adds each id at most once
        val fresh = universe.filterNot(model.lastAdd.contains)
        val adds = rng.shuffle(fresh).take(
          math.min(fresh.size, 1 + rng.nextInt(4))).sorted
        val dels =
          if (model.lastAdd.isEmpty || rng.nextInt(3) == 0) Seq.empty[Long]
          else rng.shuffle(model.lastAdd.keys.toSeq)
            .take(1 + rng.nextInt(2)).sorted
        def writeAll(): Unit = {
          (adds.map(i => (i, "add")) ++ dels.map(i => (i, "del")))
            .toDF("vec_id", "op")
            .write.mode("overwrite").parquet(s"$base/ops/$id")
          val g = Pq.currentPqGen(spark, base)
          val idxPath = Pq.pqGenPath(base, g)
          val trained = new org.apache.hadoop.fs.Path(
            s"$base/_trained_batch_$id")
          val addVecs = adds.map(i => (i, vecs(i))).toDF("vec_id", "embedding")
          if (adds.nonEmpty) {
            if (!Pq.hasPqIndex(spark, idxPath)) {
              fs.create(trained, true).close()
              Pq.writePqIndex(Pq.buildPqIndex(addVecs), idxPath)
            } else if (!fs.exists(trained))
              Pq.appendToPqIndex(addVecs, idxPath, label = s"a$id")
          }
        }
        writeAll()
        if (torn) writeAll() // crash + at-least-once replay of the same id
        fs.create(new org.apache.hadoop.fs.Path(
          s"$base/_served_batch_$id"), true).close()
        model.commit(id, adds, dels)
        nextId += 1
      }

      def checkServe(tag: String): Unit = {
        val g = Pq.currentPqGen(spark, base)
        val idxPath = Pq.pqGenPath(base, g)
        if (nextId > 0 && Pq.hasPqIndex(spark, idxPath)) {
          val (dead, _) = Pq.readPqTakedownLiveness(spark, base, served)
          val got = Pq.deletePqIndex(Pq.readPqIndex(spark, idxPath), dead)
            .codes.select("vec_id").distinct()
            .collect().map(_.getLong(0)).toSet
          assert(got == model.live,
            s"seed $seed $tag: served live set $got != model ${model.live}")
        }
      }

      def tornGen(): Unit = {
        val g = Pq.currentPqGen(spark, base)
        if (Pq.hasPqIndex(spark, Pq.pqGenPath(base, g)))
          Pq.writePqIndex(Pq.readPqIndex(spark, Pq.pqGenPath(base, g)),
            Pq.pqGenPath(base, g + 1))
      }

      def tornOpsBase(): Unit = if (nextId > 0) {
        // the real crash shape: a fold died mid-ops_base-write — task
        // files present, no commit marker. A real fold only ever targets an
        // id with no committed summary (the gate needs a fresh append,
        // so servedIds.max has grown past every committed watermark),
        // so the injection must not corrupt an already-committed dir.
        val d = new java.io.File(s"$base/ops_base/${nextId - 1}")
        if (!d.exists()) {
          d.mkdirs()
          java.nio.file.Files.writeString(
            new java.io.File(d, "part-torn.parquet").toPath, "torn"): Unit
        }
      }

      commitBatch(torn = rng.nextBoolean())
      checkServe("first")
      val steps = 5 + rng.nextInt(4)
      (0 until steps).foreach { step =>
        rng.nextInt(6) match {
          case 0 | 1 => commitBatch(torn = rng.nextInt(3) == 0)
          case 2 =>
            Pq.foldPqTakedownIfDue(spark, base, 1, served)
            if (rng.nextBoolean()) Pq.prunePqTakedownFolded(spark, base, served)
          case 3 => Pq.prunePqTakedownFolded(spark, base, served)
          case 4 => if (rng.nextBoolean()) tornGen() else tornOpsBase()
          case _ => ()
        }
        if (step % 2 == 0) checkServe("step") // see the lex-side note
      }
      // final: ensure an append exists so the fold fires, then forget
      commitBatch(torn = false)
      Pq.foldPqTakedownIfDue(spark, base, 1, served)
      Pq.prunePqTakedownFolded(spark, base, served)
      checkServe("final")
      val deadIds = model.dead
      def idsUnder(sub: String, leafOf: String => String): Set[Long] = {
        val p = new org.apache.hadoop.fs.Path(s"$base/$sub")
        if (!fs.exists(p)) Set.empty
        else fs.listStatus(p).map(_.getPath.toString).flatMap { d =>
          try spark.read.parquet(leafOf(d)).select("vec_id")
            .collect().map(_.getLong(0))
          catch { case _: Throwable => Array.empty[Long] }
        }.toSet
      }
      val onDisk = idsUnder("gens", d => s"$d/codes") ++
        idsUnder("ops", identity) ++ idsUnder("ops_base", identity)
      val leaked = deadIds.intersect(onDisk)
      assert(leaked.isEmpty,
        s"seed $seed: dead ids $leaked still on disk after final fold+prune")
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(base)): Unit
    }
  }
}
