package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned snapshot table with time travel — the manifest-commit
  * protocol of the open lakehouse formats (Delta/Iceberg's core idea,
  * reduced to its essence): data files are INVISIBLE until a manifest
  * naming them appears, and the manifest appears atomically.
  *
  * Commit protocol:
  *   1. write the snapshot's parquet files under `data/v<N>/`
  *   2. write `_manifests/v<N>.json.tmp` listing exactly those files
  *   3. RENAME it to `_manifests/v<N>.json` — the commit point
  *
  * A reader resolves a version by loading its manifest and scanning
  * ONLY the listed files; the current version is the highest
  * committed manifest. A crash between (1) and (3) leaves orphan data
  * files and possibly a `.tmp` — both invisible to every reader, so
  * a half-finished commit can never be observed (same guarantee the
  * q65 CDC sink gets from its atomic directory swap, here per
  * version with full history retained).
  *
  * Scale shape: the manifest holds file PATHS (one line per file, the
  * unit a 100 TB table is managed in), not data; reads are plain
  * parquet scans of the listed files — pushdown/pruning/AQE all apply
  * unchanged. Version resolution is one directory listing of
  * `_manifests/` (O(versions), not O(files)). Snapshots are
  * copy-on-write full versions — the honest baseline; incremental
  * (append/delta) commits would add file-level reuse to the same
  * manifest mechanics.
  */
object VersionedTable {

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  private def manifestDir(dir: String) = new Path(dir, "_manifests")

  /** Committed versions, ascending (empty if none). */
  def versions(spark: SparkSession, dir: String): Seq[Int] = {
    val f = fs(spark, dir)
    val md = manifestDir(dir)
    if (!f.exists(md)) Seq.empty
    else f.listStatus(md).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.matches("v\\d+\\.json") =>
        n.stripPrefix("v").stripSuffix(".json").toInt }
      .sorted
  }

  /** Write the new version's data files and atomically publish its
    * manifest; shared tail of [[commit]] and [[appendCommit]]. */
  private def publish(df: DataFrame, dir: String, v: Int,
      carriedFiles: Seq[String]): Int = {
    val f = fs(df.sparkSession, dir)
    val dataDir = new Path(dir, s"data/v$v")
    df.write.mode("overwrite").parquet(dataDir.toString)
    val newFiles = f.listStatus(dataDir).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".parquet"))
      .sorted
      .map(n => s"data/v$v/$n")
    val files = carriedFiles ++ newFiles
    val json = s"""{"version":$v,"files":[${
      files.map(n => "\"" + n + "\"").mkString(",")}]}"""
    val md = manifestDir(dir)
    f.mkdirs(md)
    val tmp = new Path(md, s"v$v.json.tmp")
    val out = f.create(tmp, true)
    try out.write(json.getBytes(UTF_8)) finally out.close()
    if (!f.rename(tmp, new Path(md, s"v$v.json")))
      throw new java.io.IOException(s"commit of v$v lost the rename race")
    v
  }

  /** Write `df` as the next snapshot version; returns its number.
    * The manifest rename is the commit point — readers never see a
    * version whose data is incomplete.
    *
    * Concurrency contract: ONE committer per table (the same
    * assumption the open formats make absent a put-if-absent store or
    * coordination service — HDFS rename fails on an existing
    * destination and surfaces the race below, but POSIX rename
    * REPLACES silently, so local-FS concurrent committers could both
    * believe they own a version). Readers are always safe. */
  def commit(df: DataFrame, dir: String): Int = {
    val spark = df.sparkSession
    val v = versions(spark, dir).lastOption.map(_ + 1).getOrElse(0)
    publish(df, dir, v, Seq.empty)
  }

  /** APPEND commit: the new version's manifest lists the previous
    * version's files UNCHANGED plus the freshly written ones — no
    * data is rewritten or copied (file-level reuse, the property that
    * makes daily ingest O(new data) instead of O(table)). Requires a
    * base version to append to. */
  def appendCommit(df: DataFrame, dir: String): Int = {
    val spark = df.sparkSession
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"appendCommit needs a base version at $dir")
    val prev = vs.last
    publish(df, dir, prev + 1, manifestFiles(spark, dir, prev))
  }

  /** The (dir-relative) file list of a committed version. */
  private def manifestFiles(spark: SparkSession, dir: String,
      v: Int): Seq[String] = {
    val f = fs(spark, dir)
    val mf = new Path(manifestDir(dir), s"v$v.json")
    require(f.exists(mf), s"version $v was never committed at $dir")
    val in = f.open(mf)
    val json = try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      Iterator.continually(in.read(buf)).takeWhile(_ >= 0)
        .foreach(n => bos.write(buf, 0, n))
      new String(bos.toByteArray, UTF_8)
    } finally in.close()
    parseFiles(json)
  }

  /** Minimal extractor for the manifest's "files" array (the format
    * is fixed by [[commit]]; no JSON library on the classpath). */
  private[graft] def parseFiles(json: String): Seq[String] = {
    val m = """"files":\[([^\]]*)\]""".r.findFirstMatchIn(json)
      .getOrElse(throw new IllegalArgumentException(
        s"manifest missing files array: $json"))
    val body = m.group(1).trim
    if (body.isEmpty) Seq.empty
    else body.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))
  }

  /** Time-travel read: exactly the files version `v`'s manifest
    * names, regardless of what later commits added. */
  def readVersion(spark: SparkSession, dir: String, v: Int): DataFrame = {
    val files = manifestFiles(spark, dir, v)
      .map(rel => new Path(dir, rel).toString)
    require(files.nonEmpty, s"version $v manifest lists no files")
    spark.read.parquet(files: _*)
  }

  /** Read the highest committed version. */
  def readCurrent(spark: SparkSession, dir: String): DataFrame = {
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no committed versions at $dir")
    readVersion(spark, dir, vs.last)
  }
}
