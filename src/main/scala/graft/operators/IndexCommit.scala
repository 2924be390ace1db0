package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic multi-component index commits (VERDICT r04 #4), shared by
  * the dedup index ([[IncrementalDedup]]) and the ANN index
  * ([[IncrementalAnn]]). A persisted index is several component
  * relations written per batch; a crash between component writes must
  * never produce a torn read. The protocol:
  *
  *   - each batch's component rows land in
  *     `<path>/<component>/b_<label>/` (plain Parquet dirs);
  *   - the batch becomes VISIBLE only when its one-file manifest
  *     commits: `<path>/_manifests/<label>`, created by write-temp +
  *     rename (atomic on HDFS and local fs; object stores substitute
  *     their atomic-put);
  *   - readers list the manifest dir and read exactly the manifested
  *     batch dirs, so an unmanifested (crash-torn) batch is invisible
  *     and recovery is O(batch): re-running the SAME label overwrites
  *     the partial dirs, then commits.
  *
  * Concurrent appends are not supported (one writer per index — the
  * ingest-loop contract); labels are per-batch unique by construction.
  */
private[graft] object IndexCommit {

  def fsOf(spark: SparkSession, path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** Labels of committed batches, in label order. */
  def committedLabels(spark: SparkSession, path: String): Seq[String] = {
    val fs = fsOf(spark, path)
    val mdir = new org.apache.hadoop.fs.Path(s"$path/_manifests")
    if (!fs.exists(mdir)) Nil
    else fs.listStatus(mdir).filter(_.isFile).map(_.getPath.getName)
      .filterNot(_.startsWith(".")).sorted.toSeq
  }

  /** The commit point: an empty manifest file appears atomically (temp
    * file + rename). Everything before this is invisible to readers;
    * after it, the batch is durable. */
  def commitManifest(spark: SparkSession, path: String, label: String): Unit = {
    val fs = fsOf(spark, path)
    val mdir = new org.apache.hadoop.fs.Path(s"$path/_manifests")
    fs.mkdirs(mdir)
    val dst = new org.apache.hadoop.fs.Path(mdir, label)
    if (!fs.exists(dst)) {
      val tmp = new org.apache.hadoop.fs.Path(mdir, s".$label.tmp")
      fs.create(tmp, true).close()
      require(fs.rename(tmp, dst), s"manifest rename failed for $label")
    }
  }

  /** Delete any prior index at `path` (manifests included) so a fresh
    * base write can never mix with stale batches. */
  def clear(spark: SparkSession, path: String): Unit = {
    val fs = fsOf(spark, path)
    val root = new org.apache.hadoop.fs.Path(path)
    if (fs.exists(root)) fs.delete(root, true): Unit
  }

  /** A component's committed batch directories (those that exist —
    * not every batch writes every component, e.g. a base-only "hot"
    * list). */
  def componentDirs(spark: SparkSession, path: String, component: String,
      labels: Seq[String]): Seq[String] = {
    val fs = fsOf(spark, path)
    labels.map(l => s"$path/$component/b_$l")
      .filter(d => fs.exists(new org.apache.hadoop.fs.Path(d)))
  }

  /** Read a component as the union of its committed batches. */
  def readComponent(spark: SparkSession, path: String, component: String,
      labels: Seq[String]): DataFrame =
    spark.read.parquet(componentDirs(spark, path, component, labels): _*)
}
