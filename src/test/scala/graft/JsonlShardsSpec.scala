package graft

import org.apache.spark.sql.functions._

import graft.sources.JsonlShards

class JsonlShardsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = {
    val f = java.nio.file.Files.createTempDirectory("jsonl_spec")
    f.toFile.deleteOnExit()
    f.toString
  }

  test("round-trips rows, exact shard naming, receipt counts") {
    val df = (1 to 57).map(i => (i.toLong, s"text $i", i % 3))
      .toDF("id", "txt", "grp")
    val dir = tmp()
    val receipts = JsonlShards.write(df, dir, "corpus", numShards = 5)
    assert(receipts.size == 5)
    assert(receipts.map(_._1.split('/').last).sorted ==
      (0 until 5).map(i => f"corpus_$i%05d-of-00005.jsonl.gz"))
    assert(receipts.map(_._2).sum == 57L)
    val back = JsonlShards.read(spark, s"$dir/corpus_*.jsonl.gz",
      df.schema)
    assert(back.as[(Long, String, Int)].collect().toSet ==
      df.as[(Long, String, Int)].collect().toSet)
    // gzip shards are never SPLIT (a task reads a whole file), though
    // the scan may PACK several small shards into one partition —
    // partitions never exceed the shard count
    assert(back.rdd.getNumPartitions <= 5)
  }

  test("JSON escaping keeps the line framing: newlines, quotes, unicode") {
    val df = Seq(
      (1L, "line\nbreak and \"quotes\""),
      (2L, "tabs\tand backslash \\ done"),
      (3L, "unicode: café 中文")
    ).toDF("id", "txt")
    val dir = tmp()
    JsonlShards.write(df, dir, "esc", numShards = 2)
    val back = JsonlShards.read(spark, s"$dir/esc_*.jsonl.gz", df.schema)
      .as[(Long, String)].collect().toSet
    assert(back == df.as[(Long, String)].collect().toSet)
  }

  test("more shards than rows: empty shards are valid files") {
    val df = Seq((1L, "only")).toDF("id", "txt")
    val dir = tmp()
    val receipts = JsonlShards.write(df, dir, "tiny", numShards = 3)
    assert(receipts.size == 3 && receipts.map(_._2).sum == 1L)
    val back = JsonlShards.read(spark, s"$dir/tiny_*.jsonl.gz", df.schema)
    assert(back.count() == 1L)
  }
}
