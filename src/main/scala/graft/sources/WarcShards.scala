package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC shards — the container format web-scale corpora actually ship
  * in (Common Crawl publishes ~100 TB/month of `.warc.gz`). Framing is
  * hand-rolled from the public WARC/1.0 layout (ISO 28500: a CRLF
  * header block with a `Content-Length`, the payload, then a blank
  * CRLF pair), the same no-external-deps discipline as `TfRecords` and
  * `TarShards`.
  *
  * Layout follows Common Crawl exactly: **each record is its own gzip
  * member**, members concatenated into a shard. That choice IS the
  * scale story — a plain `.gz` stream can only be read end-to-end, but
  * a member-per-record shard supports exact random access: fetch
  * `[offset, offset+length)`, gunzip one member, parse one record.
  * Common Crawl serves single pages out of petabytes this way via its
  * CDX index; `write` emits the same index as a parquet table next to
  * the shards, and `readIndexed` is the index-served read path. A full
  * scan (`read`) still streams every member sequentially — Java's
  * GZIPInputStream decodes concatenated members transparently — with
  * shards as the split unit.
  *
  * Records are `response` records carrying an HTTP/1.1 block, the shape
  * crawl tooling expects, preceded by one `warcinfo` record per shard
  * (the Common Crawl convention). All variable header values
  * (record id, date) are deterministic functions of the row so shard
  * BYTES are reproducible for identical partition contents — mirrors
  * TarShards' mtime-0 rule.
  */
object WarcShards {

  private val WarcDate = "2026-01-01T00:00:00Z" // pinned: deterministic bytes

  private def gzipMember(record: Array[Byte]): Array[Byte] = {
    val bo = new ByteArrayOutputStream(record.length / 2 + 64)
    val gz = new GZIPOutputStream(bo)
    gz.write(record); gz.close()
    bo.toByteArray
  }

  /** One WARC record's raw bytes: header block + payload + CRLF CRLF. */
  private def recordBytes(headers: Seq[(String, String)],
      payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder("WARC/1.0\r\n")
    headers.foreach { case (k, v) => sb.append(k).append(": ")
      .append(v).append("\r\n") }
    sb.append("Content-Length: ").append(payload.length).append("\r\n\r\n")
    val head = sb.toString.getBytes(UTF_8)
    val out = new Array[Byte](head.length + payload.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(payload, 0, out, head.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Deterministic urn:uuid from a row id (WARC-Record-ID is mandatory;
    * a random UUID would make shard bytes run-dependent). */
  private def recordId(id: Long): String =
    f"<urn:uuid:00000000-0000-4000-8000-$id%012x>"

  /** Index row schema written as `{baseName}_cdx.parquet` — the CDX
    * pattern: everything a reader needs to fetch one record without
    * touching any other byte of the shard. */
  private val CdxSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("target_uri", StringType, nullable = false),
    StructField("warc_file", StringType, nullable = false),
    StructField("warc_offset", LongType, nullable = false),
    StructField("warc_length", LongType, nullable = false)))

  /** Write `df` as `numShards` `.warc.gz` shards named
    * `{baseName}_%05d-of-%05d.warc.gz` under `dir`, one gzip member per
    * record, a `warcinfo` member first in each shard, and the CDX index
    * at `dir/{baseName}_cdx.parquet`. Rows shard BY ID HASH (same
    * contract as TarShards) so membership is deterministic. `idCol`
    * must be integral, `uriCol`/`bodyCol` strings. Returns
    * (shardPath, responseRecordCount) receipts — numShards rows,
    * aggregated FROM the index, never a data collect. */
  /** Task-side writer of ONE complete shard (warcinfo member first,
    * then one response member per row); returns the CDX rows. */
  private def writeOneShard(conf: SerializableHadoopConf, dir: String,
      name: String, infoId: Long,
      rows: Iterator[(Long, String, String)]): Iterator[Row] = {
    val path = new Path(dir, name)
    val fs = path.getFileSystem(conf.value)
    val out = fs.create(path, true)
    val index = scala.collection.mutable.ArrayBuffer.empty[Row]
    try {
      val info = gzipMember(recordBytes(
        Seq("WARC-Type" -> "warcinfo",
          "WARC-Record-ID" -> recordId(infoId),
          "WARC-Date" -> WarcDate,
          "WARC-Filename" -> name,
          "Content-Type" -> "application/warc-fields"),
        ("software: graft\r\nformat: WARC File Format 1.0\r\n")
          .getBytes(UTF_8)))
      out.write(info)
      var offset = info.length.toLong
      rows.foreach { case (id, uri, bodyStr) =>
        val body = bodyStr.getBytes(UTF_8)
        val http = (s"HTTP/1.1 200 OK\r\n" +
          "Content-Type: text/plain; charset=utf-8\r\n" +
          s"Content-Length: ${body.length}\r\n\r\n").getBytes(UTF_8)
        val payload = http ++ body
        val member = gzipMember(recordBytes(
          Seq("WARC-Type" -> "response",
            "WARC-Record-ID" -> recordId(id),
            "WARC-Date" -> WarcDate,
            "WARC-Target-URI" -> uri,
            "Content-Type" -> "application/http; msgtype=response"),
          payload))
        out.write(member)
        index += Row(id, uri, name, offset, member.length.toLong)
        offset += member.length
      }
    } finally out.close()
    index.iterator
  }

  private def tupleRdd(df: DataFrame, idCol: String, uriCol: String,
      bodyCol: String) = {
    val schema = df.schema
    val idIdx = schema.fieldIndex(idCol)
    val uriIdx = schema.fieldIndex(uriCol)
    val bodyIdx = schema.fieldIndex(bodyCol)
    df.rdd.map { row =>
      val id = row.get(idIdx) match {
        case l: Long => l
        case i: Int => i.toLong
        case other => other.toString.toLong
      }
      (id, row.getString(uriIdx), row.getString(bodyIdx))
    }
  }

  def write(df: DataFrame, idCol: String, uriCol: String, bodyCol: String,
      dir: String, baseName: String, numShards: Int): Seq[(String, Long)] = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val spark = df.sparkSession
    val confB = spark.sparkContext.broadcast(new SerializableHadoopConf(
      spark.sessionState.newHadoopConf()))
    val cdxRows = tupleRdd(df.repartition(numShards, df(idCol)),
        idCol, uriCol, bodyCol)
      .mapPartitionsWithIndex { (pid, rows) =>
        writeOneShard(confB.value, dir,
          f"${baseName}_$pid%05d-of-$numShards%05d.warc.gz",
          infoId = -1L - pid, rows)
      }
    val cdx = spark.createDataFrame(cdxRows, CdxSchema)
    val cdxPath = s"$dir/${baseName}_cdx.parquet"
    cdx.write.mode("overwrite").parquet(cdxPath)
    spark.read.parquet(cdxPath).groupBy("warc_file").count()
      .collect().map(r => (s"$dir/${r.getString(0)}", r.getLong(1)))
      .toSeq.sortBy(_._1)
  }

  /** Write ONE shard named `fileName` from all of `df`'s rows (the
    * streaming-archiver unit: one micro-batch = one shard; the caller
    * owns naming and the CDX commit). Returns the CDX rows as a
    * DataFrame — computed executor-side, never collected. `infoId`
    * keys the warcinfo record id (pass something batch-unique, e.g.
    * -1 - batchId, so shard bytes stay deterministic). */
  def writeShard(df: DataFrame, idCol: String, uriCol: String,
      bodyCol: String, dir: String, fileName: String,
      infoId: Long): DataFrame = {
    val spark = df.sparkSession
    val confB = spark.sparkContext.broadcast(new SerializableHadoopConf(
      spark.sessionState.newHadoopConf()))
    val cdxRows = tupleRdd(df.coalesce(1), idCol, uriCol, bodyCol)
      .mapPartitions(rows =>
        writeOneShard(confB.value, dir, fileName, infoId, rows))
    spark.createDataFrame(cdxRows, CdxSchema)
  }

  /** Path of the CDX index `write` leaves next to the shards. */
  def cdxPath(dir: String, baseName: String): String =
    s"$dir/${baseName}_cdx.parquet"

  /** Compact many small shards into ONE (the small-files problem a
    * batch-per-shard archiver accumulates, solved the WARC way):
    * because every record is its own gzip member, compaction is pure
    * BYTE-RANGE COPY — each member's `[offset, offset+length)` bytes
    * move verbatim (no gunzip, no re-parse, no re-compress), and the
    * new CDX is ARITHMETIC on the old one (new offset = running sum
    * of copied lengths). A fresh warcinfo member leads the output.
    * Content is bit-identical by construction; at 100 TB this is an
    * I/O-bound streaming copy per output shard, zero CPU decode.
    *
    * Members land in (warc_file, warc_offset) order — deterministic
    * given the input CDX. The copy runs in ONE executor task (one
    * output shard = one sequential write), and the returned new-CDX
    * DataFrame is LAZY: the shard is written when the caller
    * materializes it (e.g. by committing the new index). */
  def compact(index: DataFrame, dir: String, outName: String,
      infoId: Long): DataFrame = {
    val spark = index.sparkSession
    val confB = spark.sparkContext.broadcast(new SerializableHadoopConf(
      spark.sessionState.newHadoopConf()))
    val slim = index.select(col("doc_id"), col("target_uri"),
        col("warc_file"), col("warc_offset"), col("warc_length"))
      .repartition(1)
      .sortWithinPartitions(col("warc_file"), col("warc_offset"))
    val newRows = slim.rdd.mapPartitions { members =>
      val outPath = new Path(dir, outName)
      val fs = outPath.getFileSystem(confB.value.value)
      val out = fs.create(outPath, true)
      val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
      try {
        val info = gzipMember(recordBytes(
          Seq("WARC-Type" -> "warcinfo",
            "WARC-Record-ID" -> recordId(infoId),
            "WARC-Date" -> WarcDate,
            "WARC-Filename" -> outName,
            "Content-Type" -> "application/warc-fields"),
          ("software: graft\r\nformat: WARC File Format 1.0\r\n")
            .getBytes(UTF_8)))
        out.write(info)
        var offset = info.length.toLong
        var openName: String = null
        var openIn: org.apache.hadoop.fs.FSDataInputStream = null
        members.foreach { m =>
          val src = m.getAs[String]("warc_file")
          if (src != openName) {
            if (openIn != null) openIn.close()
            val p = new Path(dir, src)
            openIn = p.getFileSystem(confB.value.value).open(p)
            openName = src
          }
          val len = m.getAs[Long]("warc_length").toInt
          val buf = new Array[Byte](len)
          openIn.readFully(m.getAs[Long]("warc_offset"), buf, 0, len)
          out.write(buf)
          rows += Row(m.getAs[Long]("doc_id"),
            m.getAs[String]("target_uri"), outName, offset, len.toLong)
          offset += len
        }
        if (openIn != null) openIn.close()
      } finally out.close()
      rows.iterator
    }
    spark.createDataFrame(newRows, CdxSchema)
  }

  private val ReadSchema = StructType(Seq(
    StructField("warc_file", StringType, nullable = false),
    StructField("warc_type", StringType, nullable = false),
    StructField("record_id", StringType, nullable = false),
    StructField("target_uri", StringType, nullable = true),
    StructField("http_status", IntegerType, nullable = true),
    StructField("body", BinaryType, nullable = false)))

  /** Read one CRLF-terminated header line (ISO-8859-1, the HTTP/WARC
    * header charset). Returns null at EOF before any byte. */
  private def readLine(in: InputStream): String = {
    val buf = new ByteArrayOutputStream(96)
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') { buf.write(b); b = in.read() }
    val arr = buf.toByteArray
    val n = if (arr.nonEmpty && arr(arr.length - 1) == '\r') arr.length - 1
      else arr.length
    new String(arr, 0, n, ISO_8859_1)
  }

  /** Parse exactly one WARC record from `in` (positioned at `WARC/`).
    * Returns null at clean EOF. */
  private def parseRecord(fileName: String, in: DataInputStream): Row = {
    var magic = readLine(in)
    // tolerate the inter-record blank lines of a non-conforming writer
    while (magic != null && magic.isEmpty) magic = readLine(in)
    if (magic == null) return null
    require(magic.startsWith("WARC/"), s"bad WARC magic: '$magic'")
    val headers = scala.collection.mutable.Map.empty[String, String]
    var line = readLine(in)
    while (line != null && line.nonEmpty) {
      val i = line.indexOf(':')
      require(i > 0, s"bad WARC header line: '$line'")
      headers += line.substring(0, i).trim.toLowerCase ->
        line.substring(i + 1).trim
      line = readLine(in)
    }
    val len = headers.getOrElse("content-length",
      sys.error("WARC record missing Content-Length")).toInt
    val payload = new Array[Byte](len)
    in.readFully(payload)
    // trailing CRLF CRLF
    val trail = new Array[Byte](4)
    in.readFully(trail)
    require(trail.sameElements(Array[Byte]('\r', '\n', '\r', '\n')),
      "WARC record not terminated by CRLF CRLF")
    val wtype = headers.getOrElse("warc-type", "unknown")
    val rid = headers.getOrElse("warc-record-id", "")
    val uri = headers.get("warc-target-uri").orNull
    if (wtype == "response") {
      // split the HTTP block: status line + headers end at \r\n\r\n
      var split = -1
      var i = 0
      while (split < 0 && i + 3 < payload.length) {
        if (payload(i) == '\r' && payload(i + 1) == '\n' &&
            payload(i + 2) == '\r' && payload(i + 3) == '\n') split = i
        i += 1
      }
      require(split >= 0, "response record has no HTTP header terminator")
      val statusLine = new String(payload, 0,
        payload.indexOf('\n'.toByte).max(0), ISO_8859_1)
      val status = statusLine.split(" ")
        .find(t => t.length == 3 && t.forall(_.isDigit))
        .map(_.toInt).getOrElse(0)
      val body = java.util.Arrays.copyOfRange(payload, split + 4,
        payload.length)
      Row(fileName, wtype, rid, uri, status, body)
    } else Row(fileName, wtype, rid, uri, null, payload)
  }

  /** Sequential scan of WARC shards matching `pattern` — one row per
    * record (warcinfo rows included, `warc_type` discriminates).
    * Parallelism = shards; each shard streams through one
    * GZIPInputStream (concatenated members decode transparently),
    * never materializing the archive. */
  def read(spark: SparkSession, pattern: String,
      minPartitions: Int = 0): DataFrame = {
    val mp = if (minPartitions > 0) minPartitions
      else spark.sparkContext.defaultMinPartitions
    val rows = spark.sparkContext.binaryFiles(pattern, mp)
      .flatMap { case (path, pds) =>
        val fileName = path.substring(path.lastIndexOf('/') + 1)
        val in = new DataInputStream(new BufferedInputStream(
          new GZIPInputStream(new BufferedInputStream(pds.open(), 1 << 16)),
          1 << 16))
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ =>
            try in.close() catch { case _: java.io.IOException => () }))
        new Iterator[Row] {
          private var nextRow: Row = advance()
          private def advance(): Row =
            try parseRecord(fileName, in)
            catch { case _: EOFException => in.close(); null }
          override def hasNext: Boolean = nextRow != null
          override def next(): Row = {
            val r = nextRow; nextRow = advance(); r
          }
        }
      }
    spark.createDataFrame(rows, ReadSchema)
  }

  /** Index-served random access — the Common Crawl CDX pattern and the
    * 100 TB read path: `index` rows (warc_file, warc_offset,
    * warc_length) name exactly the members to fetch; each task seeks to
    * its offsets and reads `warc_length` bytes per record, so total
    * data I/O is O(selected records), independent of corpus size.
    * Index rows co-partition by file and sort by offset so each file is
    * opened once and seeks advance monotonically (HDD/object-store
    * friendly). `dir` anchors the relative `warc_file` names. */
  def readIndexed(index: DataFrame, dir: String): DataFrame = {
    val spark = index.sparkSession
    val confB = spark.sparkContext.broadcast(new SerializableHadoopConf(
      spark.sessionState.newHadoopConf()))
    val slim = index.select(col("warc_file"), col("warc_offset"),
      col("warc_length"))
      .repartition(col("warc_file"))
      .sortWithinPartitions(col("warc_file"), col("warc_offset"))
    val rows = slim.rdd.mapPartitions { it =>
      var openName: String = null
      var openIn: org.apache.hadoop.fs.FSDataInputStream = null
      def ensure(name: String) = {
        if (name != openName) {
          if (openIn != null) openIn.close()
          val p = new Path(dir, name)
          openIn = p.getFileSystem(confB.value.value).open(p)
          openName = name
        }
        openIn
      }
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ =>
          if (openIn != null)
            try openIn.close() catch { case _: java.io.IOException => () }))
      it.map { r =>
        val name = r.getString(0)
        val off = r.getLong(1)
        val len = r.getLong(2).toInt
        val fin = ensure(name)
        val member = new Array[Byte](len)
        fin.readFully(off, member, 0, len)
        val in = new DataInputStream(new BufferedInputStream(
          new GZIPInputStream(new ByteArrayInputStream(member)), 1 << 14))
        val row = parseRecord(name, in)
        in.close()
        require(row != null, s"empty member at $name:$off+$len")
        row
      }
    }
    spark.createDataFrame(rows, ReadSchema)
  }
}
