package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** WebDataset-style tar shards: each sample is a group of
  * `<key>.<ext>` member files stored adjacently in a plain POSIX
  * ustar archive — the de-facto interchange format for multimodal
  * training corpora (tar needs no index, streams sequentially, and
  * any tool can open it). Framing is hand-rolled from the public
  * ustar layout (512-byte header blocks, octal size fields, data
  * zero-padded to block boundaries, two zero blocks at EOF) the same
  * way `TfRecords` hand-rolls its framing: no external deps, works
  * through any Hadoop FileSystem.
  *
  * Scale shape mirrors the TFRecord sink/source: shards are the
  * split unit (tar has no sync markers — a shard cannot be split
  * mid-file), one shard is written per partition in a single pass,
  * and reads stream each shard without buffering it. mtime is pinned
  * to 0 so shard BYTES are deterministic for identical partition
  * contents. */
object TarShards {
  private val BlockSize = 512

  /** Hard cap on one member's payload, enforced symmetrically: the
    * ustar octal size field could legally encode up to 8 GB, but
    * read() materializes each member into one JVM byte array, so the
    * sink must never write what the source cannot read back. */
  private val MaxMemberBytes: Long = Int.MaxValue.toLong - 16

  /** Fixed-width octal field: width-1 digits, NUL terminator. */
  private def octal(v: Long, width: Int): Array[Byte] = {
    val s = java.lang.Long.toOctalString(v)
    require(s.length <= width - 1, s"value $v overflows octal$width")
    ("0" * (width - 1 - s.length) + s + " ").getBytes("US-ASCII")
  }

  /** One ustar header block for a regular file. */
  private def header(name: String, size: Long): Array[Byte] = {
    val nameB = name.getBytes(UTF_8)
    require(nameB.length <= 100, s"tar member name too long: $name")
    require(size <= MaxMemberBytes,
      s"tar member '$name' is $size bytes — exceeds the read-side " +
        "2 GB limit; split the member before writing")
    val h = new Array[Byte](BlockSize)
    def put(b: Array[Byte], off: Int): Unit =
      System.arraycopy(b, 0, h, off, b.length)
    put(nameB, 0)
    put(octal(420, 8), 100) // mode 0644
    put(octal(0, 8), 108) // uid
    put(octal(0, 8), 116) // gid
    put(octal(size, 12), 124)
    put(octal(0, 12), 136) // mtime 0: deterministic shard bytes
    h(156) = '0' // typeflag: regular file
    put("ustar".getBytes("US-ASCII"), 257) // magic (NUL-terminated:
    put("00".getBytes("US-ASCII"), 263) // header starts zeroed) + version
    // checksum: computed with the checksum field read as 8 spaces,
    // stored as 6 octal digits + NUL + space (the ustar convention)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    val sum = h.map(_ & 0xff).sum.toLong
    val cs = java.lang.Long.toOctalString(sum)
    put(("0" * (6 - cs.length) + cs).getBytes("US-ASCII"), 148)
    h(154) = 0 // cs field terminator: 6 octal digits, NUL, space
    h(155) = ' '.toByte
    h
  }

  private def padTo(out: DataOutputStream, size: Long): Unit = {
    val rem = (size % BlockSize).toInt
    if (rem != 0) out.write(new Array[Byte](BlockSize - rem))
  }

  /** Write `df` as `numShards` tar shards named
    * `<baseName>_%05d-of-%05d.tar` under `dir`. Every row becomes one
    * sample: for each (ext, column) in `members` a member file
    * `<idCol value>.<ext>` holding the column's bytes (StringType →
    * UTF-8, BinaryType → raw). Rows are sharded BY KEY HASH (not
    * round-robin) so shard membership is deterministic. Returns
    * (shardPath, sampleCount) for audit. */
  def write(df: DataFrame, idCol: String, members: Seq[(String, String)],
      dir: String, baseName: String, numShards: Int): Seq[(String, Long)] = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val schema = df.schema
    val idIdx = schema.fieldIndex(idCol)
    val memberIdx = members.map { case (ext, c) =>
      val i = schema.fieldIndex(c)
      schema.fields(i).dataType match {
        case StringType | BinaryType => (ext, i)
        case dt => throw new IllegalArgumentException(
          s"tar member column $c must be string or binary, got " +
            dt.simpleString)
      }
    }
    val sc = df.sparkSession.sparkContext
    val confB = sc.broadcast(new SerializableHadoopConf(
      df.sparkSession.sessionState.newHadoopConf()))
    df.repartition(numShards, df(idCol)).rdd
      .mapPartitionsWithIndex { (pid, rows) =>
        val name = f"${baseName}_$pid%05d-of-$numShards%05d.tar"
        val path = new Path(dir, name)
        val fs = path.getFileSystem(confB.value.value)
        val out = new DataOutputStream(
          new BufferedOutputStream(fs.create(path, true), 1 << 16))
        var n = 0L
        try {
          rows.foreach { row =>
            val key = row.get(idIdx).toString
            memberIdx.foreach { case (ext, i) =>
              val bytes = row.get(i) match {
                case s: String => s.getBytes(UTF_8)
                case b: Array[Byte] => b
                case null => Array.empty[Byte]
              }
              out.write(header(s"$key.$ext", bytes.length.toLong))
              out.write(bytes)
              padTo(out, bytes.length.toLong)
            }
            n += 1
          }
          out.write(new Array[Byte](2 * BlockSize)) // EOF marker
        } finally out.close()
        Iterator.single(path.toString -> n)
      }.collect().toSeq.sortBy(_._1)
  }

  private val ReadSchema = StructType(Seq(
    StructField("member", StringType, nullable = false),
    StructField("content", BinaryType, nullable = false)))

  /** Read tar shards matching `pattern` into (member, content) rows —
    * one row per member file. Parallelism = shards (the format's
    * split unit); each shard streams through a fixed 512-byte block
    * buffer, never materializing the archive. Stops at the first
    * all-zero header block (the EOF convention), tolerating the
    * second zero block and trailing padding. */
  def read(spark: SparkSession, pattern: String,
      minPartitions: Int = 0): DataFrame = {
    val mp = if (minPartitions > 0) minPartitions
      else spark.sparkContext.defaultMinPartitions
    val rows = spark.sparkContext.binaryFiles(pattern, mp)
      .flatMap { case (_, pds) =>
        val in = new DataInputStream(
          new BufferedInputStream(pds.open(), 1 << 16))
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ =>
            try in.close() catch { case _: java.io.IOException => () }))
        new Iterator[Row] {
          private var nextRow: Option[Row] = advance()
          private def advance(): Option[Row] = {
            val h = new Array[Byte](BlockSize)
            var read = 0
            while (read < BlockSize) {
              val r = in.read(h, read, BlockSize - read)
              if (r < 0) { in.close(); return None } // truncated tail
              read += r
            }
            if (h.forall(_ == 0)) { in.close(); return None } // EOF block
            val nameEnd = h.indexOf(0.toByte) match {
              case -1 => 100
              case i => math.min(i, 100)
            }
            val name = new String(h, 0, nameEnd, UTF_8)
            val sizeStr = new String(h, 124, 12, "US-ASCII")
              .takeWhile(c => c >= '0' && c <= '7')
            val size = java.lang.Long.parseLong(
              if (sizeStr.isEmpty) "0" else sizeStr, 8)
            // the 12-digit octal field can encode up to 8 GB; a JVM
            // byte array cannot hold it — fail loudly instead of
            // wrapping negative and desynchronizing the block framing
            require(size <= MaxMemberBytes,
              s"tar member '$name' is $size bytes — exceeds the " +
                "2 GB JVM array limit; split the member at write time")
            val data = new Array[Byte](size.toInt)
            in.readFully(data)
            val rem = (size % BlockSize).toInt
            if (rem != 0) in.skipBytes(BlockSize - rem)
            Some(Row(name, data))
          }
          override def hasNext: Boolean = nextRow.isDefined
          override def next(): Row = {
            val r = nextRow.get
            nextRow = advance()
            r
          }
        }
      }
    spark.createDataFrame(rows, ReadSchema)
  }
}
