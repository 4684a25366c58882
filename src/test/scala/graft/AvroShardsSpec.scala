package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.AvroShards

class AvroShardsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("blob", BinaryType), StructField("score", DoubleType),
    StructField("n", IntegerType), StructField("ok", BooleanType)))

  private def mkDf(n: Int) = {
    val rows = (0 until n).map { i =>
      Row(i.toLong,
        if (i % 7 == 3) null else s"doc-$i",
        if (i % 5 == 4) null else Array.tabulate(i % 4)(j => (i + j).toByte),
        i / 3.0, i * 2, i % 2 == 0)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
  }

  test("container shards round-trip every supported type incl. nulls") {
    val dir = java.nio.file.Files.createTempDirectory("avro").toString
    val df = mkDf(57)
    val shards = AvroShards.write(df, dir, "t", numShards = 4)
    assert(shards.size == 4 && shards.map(_._2).sum == 57)
    assert(shards.head._1.endsWith("t_00000-of-00004.avro"))
    // on-disk files carry the container magic "Obj\x01"
    val magic = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      shards.head._1.stripPrefix("file:"))).take(4)
    assert(magic.toSeq == Seq[Byte]('O', 'b', 'j', 1))
    val back = AvroShards.read(spark, s"$dir/t_*.avro", schema)
    val a = df.orderBy("id").collect()
    val b = back.orderBy("id").collect()
    assert(b.length == 57)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getLong(0) == y.getLong(0))
      assert(x.isNullAt(1) == y.isNullAt(1))
      if (!x.isNullAt(1)) assert(x.getString(1) == y.getString(1))
      assert(x.isNullAt(2) == y.isNullAt(2))
      if (!x.isNullAt(2))
        assert(x.getAs[Array[Byte]](2).toSeq == y.getAs[Array[Byte]](2).toSeq)
      assert(x.getDouble(3) == y.getDouble(3))
      assert(x.getInt(4) == y.getInt(4))
      assert(x.getBoolean(5) == y.getBoolean(5))
    }
  }

  test("deflate codec round-trips and actually compresses") {
    val dir = java.nio.file.Files.createTempDirectory("avro").toString
    import spark.implicits._
    // highly repetitive payload so deflate must win
    val df = spark.range(200)
      .select(col("id"), lit("a" * 500).as("pad"))
    AvroShards.write(df, dir, "raw", 1, codec = "null")
    AvroShards.write(df, dir, "z", 1, codec = "deflate")
    def len(p: String) = new java.io.File(dir, p).length()
    assert(len("z_00000-of-00001.avro") < len("raw_00000-of-00001.avro") / 5)
    val back = AvroShards.read(spark, s"$dir/z_*.avro", df.schema)
    assert(back.agg(sum("id")).head().getLong(0) == (0L until 200L).sum)
    assert(back.select("pad").distinct().as[String].collect()
      .toSeq == Seq("a" * 500))
  }

  test("reader resolves by name: reordered subset + absent field null") {
    val dir = java.nio.file.Files.createTempDirectory("avro").toString
    AvroShards.write(mkDf(10), dir, "t", 1)
    val projected = StructType(Seq(
      StructField("score", DoubleType),   // reordered vs writer
      StructField("id", LongType),
      StructField("missing", StringType))) // not written → null
    val back = AvroShards.read(spark, s"$dir/t_*.avro", projected)
      .orderBy("id").collect()
    assert(back.length == 10)
    back.zipWithIndex.foreach { case (r, i) =>
      assert(r.getDouble(0) == i / 3.0)
      assert(r.getLong(1) == i.toLong)
      assert(r.isNullAt(2))
    }
  }

  test("split read: byte ranges cover one shard exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("avro").toString
    import spark.implicits._
    // one ~1 MB shard: forces many 64 KB ranges, with split points
    // landing mid-block — sync()/pastSync() must hand every block to
    // exactly one range
    val df = spark.range(4000)
      .select(col("id"), concat(lit("pad-"), col("id"),
        lit("x" * 200)).as("payload"))
    AvroShards.write(df, dir, "big", numShards = 1)
    val back = AvroShards.readSplit(spark, s"$dir/big_*.avro",
      df.schema, targetSplitBytes = 64L << 10)
    assert(back.rdd.getNumPartitions > 4, "expected many byte ranges")
    // exactly-once: 4000 distinct ids, nothing lost, nothing doubled
    assert(back.count() == 4000)
    assert(back.select("id").distinct().count() == 4000)
    val s = back.orderBy("id").as[(Long, String)].collect()
    val o = df.orderBy("id").as[(Long, String)].collect()
    assert(s.sameElements(o))
    // degenerate split larger than the file behaves like read()
    val one = AvroShards.readSplit(spark, s"$dir/big_*.avro",
      df.schema, targetSplitBytes = 1L << 30)
    assert(one.rdd.getNumPartitions == 1 && one.count() == 4000)
  }

  test("reader applies Avro-legal promotions and rejects the rest") {
    val dir = java.nio.file.Files.createTempDirectory("avro").toString
    import spark.implicits._
    val df = Seq((1, 1.5f), (2, 2.5f)).toDF("i", "f")
    AvroShards.write(df, dir, "p", 1)
    // int→long and float→double resolve like Avro schema resolution
    val promoted = StructType(Seq(
      StructField("i", LongType), StructField("f", DoubleType)))
    val back = AvroShards.read(spark, s"$dir/p_*.avro", promoted)
      .orderBy("i").collect()
    assert(back(0).getLong(0) == 1L && back(0).getDouble(1) == 1.5)
    assert(back(1).getLong(0) == 2L && back(1).getDouble(1) == 2.5)
    // an illegal resolution (int as boolean) fails loudly, not with
    // an opaque Catalyst ClassCastException
    val bad = StructType(Seq(StructField("i", BooleanType)))
    val e = intercept[org.apache.spark.SparkException] {
      AvroShards.read(spark, s"$dir/p_*.avro", bad).collect()
    }
    assert(e.getMessage.contains("cannot be read as") ||
      Option(e.getCause).exists(_.getMessage.contains("cannot be read as")))
    // a glob-free path that doesn't exist reports cleanly (no NPE)
    val e2 = intercept[IllegalArgumentException] {
      AvroShards.readSplit(spark, s"$dir/nope.avro", promoted)
    }
    assert(e2.getMessage.contains("no non-empty files"))
  }

  test("unsupported leaf types are rejected at write time") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("avro").toString
    val bad = Seq((1L, Seq(1.0, 2.0))).toDF("id", "arr")
    val e = intercept[IllegalArgumentException] {
      AvroShards.write(bad, dir, "bad", 1)
    }
    assert(e.getMessage.contains("unsupported Avro leaf type"))
  }
}
