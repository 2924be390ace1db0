package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, RandomAccessFile}
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.parquet.format.{FileMetaData, KeyValue, Util}

/** GeoParquet footer metadata (spec 1.0.0): stamps the `geo` key-value
  * entry into parquet file footers so external GeoParquet readers
  * (GeoPandas, GDAL, DuckDB spatial) recognize the WKB geometry column
  * — the one reference output artifact round 1 could not reproduce
  * (ref gtfs_rt_assets.py:128,141 writes GeoParquet via GeoPandas;
  * SURVEY.md §7.4 #1).
  *
  * Implementation: a thrift-level footer rewrite. A parquet file is
  * `[PAR1][row groups][footer][footer_len int32 LE][PAR1]`; the footer
  * is a thrift-compact FileMetaData that *contains no absolute offsets
  * to itself*, so adding a key-value entry and rewriting only the tail
  * is safe — row-group bytes are untouched, and readers see identical
  * data plus the new metadata. No dependency beyond Spark's own
  * parquet-format-structures jar.
  *
  * Scale note: stamping is O(footer) per file and embarrassingly
  * parallel; a cluster deployment would stamp each file right after
  * its task writes it (or track per-batch manifests) rather than
  * re-walking the whole store like [[stampDirectory]] does for the
  * harness-sized outputs here.
  */
object GeoParquet {

  private val Magic = "PAR1".getBytes("ASCII")

  /** The `geo` JSON for a WKB point column (crs omitted = OGC:CRS84,
    * the spec default and what lon/lat WKB means here). */
  def geoJson(primaryColumn: String): String =
    s"""{"version":"1.0.0","primary_column":"$primaryColumn",""" +
      s""""columns":{"$primaryColumn":{"encoding":"WKB","geometry_types":["Point"]}}}"""

  /** Stamp every `.parquet` file under `dir` (recursively) whose footer
    * lacks the `geo` entry. Idempotent. Returns files stamped. */
  def stampDirectory(dir: String, primaryColumn: String = "geom"): Int = {
    val root = Paths.get(dir)
    if (!Files.exists(root)) return 0
    // materialize before stamping: stampFile deletes .crc sidecars and
    // a live Files.walk iterator would trip over the deletions
    val files = {
      val it = Files.walk(root)
      try it.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
        .toVector
      finally it.close()
    }
    files.count(p => stampFile(p, primaryColumn))
  }

  /** Stamp only the given Hive partitions — the per-batch COMMIT path:
    * the writer knows exactly which (year, month, day, hour) partitions
    * its batch touched, so the walk is O(files in this batch), not
    * O(entire store). [[stampDirectory]] remains for full-store repair
    * (recovery from a crash between write and stamp). Idempotent like
    * stampFile; missing partition dirs count zero. */
  def stampPartitions(dir: String, partitions: Iterable[(Int, Int, Int, Int)],
      primaryColumn: String = "geom"): Int =
    partitions.iterator.map { case (y, m, d, h) =>
      stampDirectory(s"$dir/year=$y/month=$m/day=$d/hour=$h", primaryColumn)
    }.sum

  /** Add the `geo` entry to one file's footer; false if already
    * present. */
  def stampFile(file: Path, primaryColumn: String): Boolean = {
    val raf = new RandomAccessFile(file.toFile, "rw")
    try {
      val len = raf.length()
      require(len > 12, s"$file: too short to be parquet")
      raf.seek(len - 8)
      val lenBytes = new Array[Byte](4)
      raf.readFully(lenBytes)
      val footerLen = (lenBytes(0) & 0xff) | ((lenBytes(1) & 0xff) << 8) |
        ((lenBytes(2) & 0xff) << 16) | ((lenBytes(3) & 0xff) << 24)
      val magic = new Array[Byte](4)
      raf.readFully(magic)
      require(magic.sameElements(Magic), s"$file: not a parquet file")
      val footerStart = len - 8 - footerLen
      require(footerStart >= 4, s"$file: corrupt footer length $footerLen")

      raf.seek(footerStart)
      val footer = new Array[Byte](footerLen)
      raf.readFully(footer)
      val fmd: FileMetaData = Util.readFileMetaData(new ByteArrayInputStream(footer))

      val existing = Option(fmd.getKey_value_metadata)
        .map(_.asScala).getOrElse(Nil)
      if (existing.exists(_.getKey == "geo")) return false
      val kv = new KeyValue("geo")
      kv.setValue(geoJson(primaryColumn))
      fmd.addToKey_value_metadata(kv)

      val out = new ByteArrayOutputStream(footerLen + 256)
      Util.writeFileMetaData(fmd, out)
      val newFooter = out.toByteArray

      raf.seek(footerStart)
      raf.write(newFooter)
      val n = newFooter.length
      raf.write(Array[Byte](
        (n & 0xff).toByte, ((n >> 8) & 0xff).toByte,
        ((n >> 16) & 0xff).toByte, ((n >> 24) & 0xff).toByte))
      raf.write(Magic)
      raf.setLength(footerStart + n + 8)
      // Hadoop's ChecksumFileSystem keeps a `.name.crc` sidecar that the
      // tail rewrite invalidates; drop it so readers re-derive (absence
      // means "no checksum", not an error). HDFS/object stores have no
      // such sidecar.
      val crc = file.resolveSibling("." + file.getFileName.toString + ".crc")
      Files.deleteIfExists(crc)
      true
    } finally raf.close()
  }

  /** Read back the `geo` entry of a parquet file (for verification). */
  def readGeoMetadata(file: Path): Option[String] = {
    val raf = new RandomAccessFile(file.toFile, "r")
    try {
      val len = raf.length()
      raf.seek(len - 8)
      val lenBytes = new Array[Byte](4)
      raf.readFully(lenBytes)
      val footerLen = (lenBytes(0) & 0xff) | ((lenBytes(1) & 0xff) << 8) |
        ((lenBytes(2) & 0xff) << 16) | ((lenBytes(3) & 0xff) << 24)
      raf.seek(len - 8 - footerLen)
      val footer = new Array[Byte](footerLen)
      raf.readFully(footer)
      val fmd = Util.readFileMetaData(new ByteArrayInputStream(footer))
      Option(fmd.getKey_value_metadata).map(_.asScala).getOrElse(Nil)
        .find(_.getKey == "geo").map(_.getValue)
    } finally raf.close()
  }
}
