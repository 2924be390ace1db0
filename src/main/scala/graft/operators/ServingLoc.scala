package graft.operators

import org.apache.spark.sql.SparkSession

/** Deterministic per-(session, key) temp locations for the at-rest
  * lifecycle entries (n89's bucketed publish, n101's BM25 serving
  * tree, n105's PQ fold) — one shared registry instead of a
  * copy-pasted map per operator.
  *
  * Two lifetime rules, each load-bearing:
  *   - LOCATIONS outlive content clears (ADVICE r10 #2): a cold-mode
  *     re-run overwrites the same directory instead of orphaning a
  *     fresh temp dir per sample.
  *   - ENTRIES for stopped sessions are swept on every access (the
  *     pqCaches weak-ref rule): a ConcurrentHashMap keyed by
  *     SparkSession would otherwise pin each stopped session — and
  *     its sessionState — forever in a long-lived test or Lab JVM.
  *     The sweep also DELETES the swept entry's directory (ADVICE
  *     r11): dropping the registry entry is what makes the tree
  *     unreachable, so the delete must ride the same step.
  */
private[graft] object ServingLoc {
  private val locs = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]()

  private def sweep(): Unit = {
    val it = locs.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1.sparkContext.isStopped) {
        // delete the serving tree BEFORE dropping the entry (ADVICE
        // r11: removal alone made the dir unreachable for any later
        // cleanup — every stopped session leaked its n89/n101/n105
        // contents for the life of the JVM). Locations are local temp
        // dirs (createTempDirectory), so plain NIO suffices — the
        // stopped session's sessionState may no longer be usable.
        try {
          val dir = java.nio.file.Paths.get(e.getValue)
          if (java.nio.file.Files.exists(dir)) {
            val walk = java.nio.file.Files.walk(dir)
            try walk.sorted(java.util.Comparator.reverseOrder())
              .forEach(p => java.nio.file.Files.deleteIfExists(p): Unit)
            finally walk.close()
          }
        } catch { case _: java.io.IOException => () } // best-effort
        it.remove()
      }
    }
  }

  /** The stable temp location for (session, key), created on first
    * use. Key convention: "<entry>:<corpus dir>". */
  def of(s: SparkSession, key: String, tmpPrefix: String): String = {
    sweep()
    locs.computeIfAbsent((s, key), { _: (SparkSession, String) =>
      java.nio.file.Files.createTempDirectory(tmpPrefix).toString
    })
  }

  /** Test hook: the location, if the entry has run in this session. */
  def get(s: SparkSession, key: String): Option[String] =
    Option(locs.get((s, key)))

  /** Cold-mode hook: wipe the CONTENTS of every location owned by `s`
    * whose key starts with `keyPrefix`, keeping the directories. */
  def clearContents(s: SparkSession, keyPrefix: String): Unit = {
    sweep()
    val it = locs.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if ((e.getKey._1 eq s) && e.getKey._2.startsWith(keyPrefix)) {
        val p = new org.apache.hadoop.fs.Path(e.getValue)
        val fs = p.getFileSystem(s.sessionState.newHadoopConf())
        if (fs.exists(p))
          fs.listStatus(p).foreach(st => fs.delete(st.getPath, true))
      }
    }
  }
}
