package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.{VersionedTable, WarcShards}
import graft.streaming.EventStream

class WarcIngestSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = {
    val f = java.nio.file.Files.createTempDirectory("warc_ingest")
    f.toFile.deleteOnExit()
    f.toString
  }

  // 9 docs: ids 3g..3g+2 share canonical page g (three raw variants)
  private def pages = (0L until 9L).map { i =>
    val g = i / 3
    val url = (i % 3) match {
      case 0 => s"https://Site$g.Example.COM/p/$g?b=2&a=1"
      case 1 => s"HTTPS://site$g.example.com:443/p/$g/?a=1&utm_source=x&b=2#f"
      case _ => s"https://www.site$g.example.com/p/$g?utm_campaign=c&b=2&a=1"
    }
    (i, url, s"body $i")
  }.toDF("doc_id", "uri", "text")

  private def census(stateDir: String) =
    VersionedTable.readCurrent(spark, stateDir)
      .groupBy(col("canonical_url"))
      .agg(sum(col("cnt")).as("n_raw"),
        count(lit(1)).as("n_raw_distinct"),
        min(col("min_id")).as("keep_id"),
        (sum(col("id_sum")) - min(col("min_id"))).as("dropped_id_sum"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  private def ingest(scratch: String, warcDir: String,
      batches: Seq[org.apache.spark.sql.DataFrame],
      stateDir: String): Unit = {
    val streamDir = new java.io.File(scratch, "in")
    streamDir.mkdirs()
    for ((b, i) <- batches.zipWithIndex) {
      val t = s"$scratch/shard$i"
      b.coalesce(1).write.mode("overwrite").parquet(t)
      val part = new java.io.File(t).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(streamDir, f"b$i%02d.parquet")
      java.nio.file.Files.copy(part.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      dst.setLastModified(1000000L * (i + 1))
    }
    EventStream.warcCensusIngestOnce(
      EventStream.parquetFileStream(spark, streamDir.toString),
      warcDir, stateDir)
  }

  test("archiver: batch-per-shard write + CDX lockstep; crash window " +
      "replays byte-identical") {
    val dir = tmp()
    // stage 3 doc batches as the stream
    val streamDir = new java.io.File(dir, "in"); streamDir.mkdirs()
    for (i <- 0 until 3) {
      val t = s"$dir/b$i"
      pages.filter(col("doc_id") % 3 === i).coalesce(1)
        .write.mode("overwrite").parquet(t)
      val part = new java.io.File(t).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(streamDir, f"b$i%02d.parquet")
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      dst.setLastModified(1000000L * (i + 1))
    }
    val cdxDir = s"$dir/cdx"
    EventStream.warcArchiveOnce(
      EventStream.parquetFileStream(spark, streamDir.toString), dir,
      "arch", cdxDir, "doc_id", "uri", "text")
    assert(VersionedTable.versions(spark, cdxDir).length == 3)
    val cdx = VersionedTable.readCurrent(spark, cdxDir)
    assert(cdx.count() == 9)
    // round trip THROUGH the archive's own index
    val got = WarcShards.readIndexed(cdx, dir)
      .select(col("target_uri"),
        col("body").cast("string")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val want = pages.collect()
      .map(r => r.getString(1) -> r.getString(2)).toMap
    assert(got == want)
    // crash window: shard written, CDX commit lost → replay must
    // rewrite the shard byte-identically and land ONE commit
    val shard1 = java.nio.file.Paths.get(dir, "arch_b00001.warc.gz")
    val before = java.nio.file.Files.readAllBytes(shard1)
    EventStream.warcArchiveOnce(
      EventStream.parquetFileStream(spark, streamDir.toString), dir,
      "arch", cdxDir, "doc_id", "uri", "text")
    assert(VersionedTable.versions(spark, cdxDir).length == 3)
    assert(java.util.Arrays.equals(before,
      java.nio.file.Files.readAllBytes(shard1)))
  }

  test("streamed census equals the batch census, any slicing; " +
      "replay no-ops") {
    val dir = tmp()
    WarcShards.write(pages, "doc_id", "uri", "text", dir, "crawl", 3)
    val cdx = spark.read.parquet(WarcShards.cdxPath(dir, "crawl"))
    // slicing A: shard-at-a-time
    val a = s"$dir/stateA"
    ingest(dir + "/a", dir, (0 until 3).map(i => cdx.filter(
      col("warc_file") === f"crawl_$i%05d-of-00003.warc.gz")), a)
    // slicing B: by doc_id stripe — completely different batches
    val b = s"$dir/stateB"
    ingest(dir + "/b", dir, (0 until 3).map(i =>
      cdx.filter(col("doc_id") % 3 === i)), b)
    val batchCensus = Dedup.urlDedup(pages, col("doc_id"), col("uri"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getLong(4))).toMap
    val ca = census(a)
    assert(census(b) == ca)
    assert(ca.keySet == batchCensus.keySet)
    ca.foreach { case (k, (nRaw, _, keep, dropped)) =>
      assert(batchCensus(k) == ((nRaw, keep, dropped)), s"at $k") }
    // every group saw its 3 variants
    assert(ca.values.forall(_._1 == 3L))
    // replay: re-running the same batches must be a version no-op
    val versionsBefore = VersionedTable.versions(spark, a).length
    ingest(dir + "/a", dir, (0 until 3).map(i => cdx.filter(
      col("warc_file") === f"crawl_$i%05d-of-00003.warc.gz")), a)
    assert(VersionedTable.versions(spark, a).length == versionsBefore)
    assert(census(a) == ca)
  }
}
