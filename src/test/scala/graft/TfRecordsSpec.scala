package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.TfRecords
import graft.sources.TfRecords.{BytesFeature, FloatFeature, Int64Feature}

class TfRecordsSpec extends SparkSpec {

  private def frame(recs: Array[Byte]*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    recs.foreach(TfRecords.writeRecord(out, _))
    out.flush()
    bos.toByteArray
  }

  private def unframe(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Iterator.continually(TfRecords.readRecord(in))
      .takeWhile(_.isDefined).map(_.get).toSeq
  }

  test("crc32c matches the published Castagnoli test vector") {
    // RFC 3720 B.4: CRC32C("123456789") = 0xE3069283
    val v = "123456789".getBytes("UTF-8")
    assert(TfRecords.crc32c(v, 0, v.length) == 0xe3069283)
    // and the TFRecord mask is rotl(crc,17) + 0xa282ead8
    assert(TfRecords.mask(0) == 0xa282ead8)
  }

  test("framing round-trips records and rejects corruption") {
    val recs = Seq(Array[Byte](), Array[Byte](1, 2, 3),
      Array.tabulate(1000)(i => (i % 251).toByte))
    val bytes = frame(recs: _*)
    val back = unframe(bytes)
    assert(back.map(_.toSeq) == recs.map(_.toSeq))
    // flip one payload byte → data-CRC mismatch must throw.
    // record 1 (empty payload) occupies bytes 0–15; record 2's payload
    // starts after its own 8-byte length + 4-byte length-CRC at 16+12
    val corrupt = bytes.clone()
    corrupt(16 + 12 + 1) = (corrupt(16 + 12 + 1) ^ 0x40).toByte
    val in = new DataInputStream(new ByteArrayInputStream(corrupt))
    TfRecords.readRecord(in) // record 1 (empty payload) still fine
    intercept[IllegalArgumentException](TfRecords.readRecord(in))
  }

  test("Example encode/decode round-trips every feature shape") {
    val ex = Map[String, TfRecords.TfFeature](
      "bytes_one" -> BytesFeature.str("hello"),
      "bytes_many" -> BytesFeature(Seq(Array[Byte](0, -1), Array[Byte]())),
      "floats" -> FloatFeature(Seq(0f, -1.5f, Float.MaxValue,
        Float.MinPositiveValue)),
      "ints" -> Int64Feature(Seq(0L, 127L, 128L, -1L, Long.MaxValue,
        Long.MinValue)),
      "empty_list" -> Int64Feature(Nil))
    val back = TfRecords.decodeExample(TfRecords.encodeExample(ex))
    assert(back.keySet == ex.keySet)
    assert(back("bytes_one").asInstanceOf[BytesFeature].values.head.toSeq ==
      "hello".getBytes("UTF-8").toSeq)
    assert(back("bytes_many").asInstanceOf[BytesFeature]
      .values.map(_.toSeq) == Seq(Seq[Byte](0, -1), Seq[Byte]()))
    assert(back("floats") == ex("floats"))
    assert(back("ints") == ex("ints"))
    assert(back("empty_list") == Int64Feature(Nil))
    // deterministic bytes: same map re-encodes identically
    assert(TfRecords.encodeExample(ex).toSeq ==
      TfRecords.encodeExample(ex).toSeq)
  }

  test("DataFrame write/read round-trips through TFRecord shards") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("tfrec").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("blob", BinaryType), StructField("score", FloatType),
      StructField("emb", ArrayType(FloatType)),
      StructField("tags", ArrayType(StringType))))
    val rows = (0 until 57).map { i =>
      Row(i.toLong, s"doc-$i",
        Array.tabulate(i % 5)(j => (i + j).toByte), i / 7f,
        Seq(i.toFloat, -i.toFloat), Seq(s"t${i % 3}", "x"))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), schema)
    val shards = TfRecords.write(df, dir, "t", numShards = 4)
    assert(shards.size == 4 && shards.map(_._2).sum == 57)
    // reference naming: <base>_%05d-of-%05d.tfrecord
    assert(shards.head._1.endsWith("t_00000-of-00004.tfrecord"))
    val back = TfRecords.read(spark, s"$dir/t_*.tfrecord", schema)
    assert(back.count() == 57)
    val a = df.orderBy("id").collect()
    val b = back.orderBy("id").collect()
    a.zip(b).foreach { case (x, y) =>
      assert(x.getLong(0) == y.getLong(0))
      assert(x.getString(1) == y.getString(1))
      assert(x.getAs[Array[Byte]](2).toSeq == y.getAs[Array[Byte]](2).toSeq)
      assert(x.getFloat(3) == y.getFloat(3))
      assert(x.getSeq[Float](4) == y.getSeq[Float](4))
      assert(x.getSeq[String](5) == y.getSeq[String](5))
    }
  }

  test("gzip shards round-trip and are readable by system gunzip") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("tfgz").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val rows = (0 until 23).map(i => Row(i.toLong, s"doc-$i"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val shards = TfRecords.write(df, dir, "g", numShards = 2, gzip = true)
    assert(shards.head._1.endsWith("g_00000-of-00002.tfrecord.gz"))
    val back = TfRecords.read(spark, s"$dir/g_*.tfrecord.gz", schema)
    assert(back.collect().map(_.getLong(0)).sorted.toSeq == (0L until 23L))
    // interop: a foreign gunzip of our shard must yield plain framing
    // that the non-gzip read path accepts
    import scala.sys.process._
    val rc = Process(Seq("sh", "-c",
      s"cd $dir && for f in *.gz; do gunzip -k $$f; done")).!
    assert(rc == 0, "system gunzip failed")
    val plain = TfRecords.read(spark, s"$dir/g_*.tfrecord", schema)
    assert(plain.count() == 23)
  }

  test("zstd shards round-trip and are readable by system zstd") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("tfzst").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val rows = (0 until 23).map(i => Row(i.toLong, s"doc-$i"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val shards = TfRecords.write(df, dir, "z", numShards = 2,
      codec = "zstd")
    assert(shards.head._1.endsWith("z_00000-of-00002.tfrecord.zst"))
    val back = TfRecords.read(spark, s"$dir/z_*.tfrecord.zst", schema)
    assert(back.collect().map(_.getLong(0)).sorted.toSeq == (0L until 23L))
    // interop: a foreign zstd -d of our shard must yield plain framing
    // that the plain read path accepts (skip silently if no system
    // zstd binary — the round trip above already proves the codec)
    import scala.sys.process._
    val hasZstd = Process(Seq("sh", "-c", "command -v zstd")).! == 0
    if (hasZstd) {
      val rc = Process(Seq("sh", "-c",
        s"cd $dir && for f in *.zst; do zstd -d -k $$f; done")).!
      assert(rc == 0, "system zstd -d failed")
      val plain = TfRecords.read(spark, s"$dir/z_*.tfrecord", schema)
      assert(plain.count() == 23)
    }
  }

  test("null columns come back null; unmappable types are rejected") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("tfrec").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("opt", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(1L, "a"), Row(2L, null)), 1), schema)
    TfRecords.write(df, dir, "n", 1)
    val back = TfRecords.read(spark, s"$dir/n_*.tfrecord", schema)
      .orderBy("id").collect()
    assert(back(0).getString(1) == "a" && back(1).isNullAt(1))
    // doubles have no Example representation — must fail loudly
    val bad = df.withColumn("d", lit(1.5))
    val e = intercept[org.apache.spark.SparkException] {
      TfRecords.write(bad, dir, "bad", 1)
    }
    assert(e.getMessage.contains("TFRecord") ||
      e.getCause != null)
  }

  test("foreign empty feature lists read as null scalars / empty arrays") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("tfrec").toString
    // a foreign writer may emit a present-but-empty list (absent oneof
    // or an empty Int64List) — a scalar column must read null, an array
    // column must read the empty array, and nothing may throw
    val ex = Map[String, TfRecords.TfFeature](
      "id" -> Int64Feature(Seq(7L)),
      "empty_scalar" -> Int64Feature(Nil),
      "empty_str" -> BytesFeature(Nil),
      "empty_arr" -> FloatFeature(Nil))
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    TfRecords.writeRecord(out, TfRecords.encodeExample(ex))
    out.flush()
    Files.write(Paths.get(dir, "f_00000-of-00001.tfrecord"), bos.toByteArray)
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("empty_scalar", LongType),
      StructField("empty_str", StringType),
      StructField("empty_arr", ArrayType(FloatType))))
    val row = TfRecords.read(spark, s"$dir/f_*.tfrecord", schema).head()
    assert(row.getLong(0) == 7L)
    assert(row.isNullAt(1) && row.isNullAt(2))
    assert(row.getSeq[Float](3) == Seq())
  }

  test("image shards use the reference keys and survive a round-trip") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("tfrec").toString
    val imgs = spark.range(10).select(
      graft.functions.ImageKernels.synthPngUdf(
        col("id"), lit(6), lit(7)).as("encoded"),
      lit("png").as("format"), (col("id") % 3).cast("int").as("label"),
      lit(6).as("height"), lit(7).as("width"))
    TfRecords.writeImages(imgs, dir, "train", numShards = 2)
    // raw keyed read: the 5 reference feature keys are present
    val raw = TfRecords.read(spark, s"$dir/flowers_train_*.tfrecord",
      TfRecords.ImageSchema)
    assert(raw.columns.toSet == Set("image/encoded", "image/format",
      "image/class/label", "image/height", "image/width"))
    val back = TfRecords.readImages(spark, s"$dir/flowers_train_*.tfrecord")
    assert(back.count() == 10)
    // decoded dims match the stored dims for every record
    val ok = back.withColumn("dims",
        graft.functions.ImageKernels.dimsUdf(col("encoded")))
      .filter(col("dims").getItem(0) === col("height") &&
        col("dims").getItem(1) === col("width"))
    assert(ok.count() == 10)
    assert(back.select("format").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("png"))
  }

  test("tar shards round-trip and are readable by system tar") {
    import graft.sources.TarShards
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_tar_spec").toString
    val docs = Seq(
      (1L, "hello world", "en", Array[Byte](1, 2, 3)),
      (2L, "héllo wörld ünïcode", "de", Array[Byte]()),
      (3L, "", "fr", Array[Byte](-1, 0, 127))
    ).toDF("doc_id", "text", "lang", "blob")
    val manifest = TarShards.write(docs, "doc_id",
      Seq("txt" -> "text", "lang" -> "lang", "bin" -> "blob"),
      dir, "t", numShards = 1)
    assert(manifest.map(_._2).sum == 3)
    // our reader round-trips members, including empty + binary
    val back = TarShards.read(spark, s"$dir/t_*.tar")
      .as[(String, Array[Byte])].collect().toMap
    assert(back.size == 9)
    assert(new String(back("2.txt"), "UTF-8") == "héllo wörld ünïcode")
    assert(back("3.txt").isEmpty)
    assert(back("3.bin").toSeq == Seq[Byte](-1, 0, 127))
    // interoperability: the shard is a standard ustar archive that
    // system tar lists with exactly our member names
    import scala.sys.process._
    val shard = manifest.head._1.stripPrefix("file:")
    val listed = Seq("tar", "-tf", shard).!!.split("\n").toSet
    assert(listed == Set("1.txt", "1.lang", "1.bin",
      "2.txt", "2.lang", "2.bin", "3.txt", "3.lang", "3.bin"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
