package graft

import java.util.zip.GZIPInputStream

import org.apache.spark.sql.functions._

import graft.sources.WarcShards

class WarcShardsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = {
    val f = java.nio.file.Files.createTempDirectory("warc_spec")
    f.toFile.deleteOnExit()
    f.toString
  }

  private def fixture = Seq(
    (1L, "https://a.example.com/en/1", "alpha body one"),
    (2L, "https://a.example.com/de/2", "beta body\nwith a newline"),
    (3L, "https://b.example.com/en/3", "gamma café 中文"),
    (4L, "https://b.example.com/fr/4", ""),
    (5L, "https://c.example.com/en/5", "epsilon " * 2000) // multi-KB body
  ).toDF("doc_id", "uri", "text")

  test("round-trips bodies byte-exactly; warcinfo leads each shard") {
    val dir = tmp()
    val receipts = WarcShards.write(fixture, "doc_id", "uri", "text",
      dir, "crawl", numShards = 2)
    assert(receipts.size == 2)
    assert(receipts.map(_._1.split('/').last).sorted ==
      Seq("crawl_00000-of-00002.warc.gz", "crawl_00001-of-00002.warc.gz"))
    assert(receipts.map(_._2).sum == 5L)
    val back = WarcShards.read(spark, s"$dir/crawl_*.warc.gz")
    val infos = back.filter($"warc_type" === "warcinfo").collect()
    assert(infos.length == 2)
    assert(infos.forall(r => new String(
      r.getAs[Array[Byte]]("body"), "UTF-8").contains("WARC File Format")))
    val resp = back.filter($"warc_type" === "response")
      .select($"target_uri", $"http_status", $"body").collect()
      .map(r => r.getString(0) ->
        (r.getInt(1), new String(r.getAs[Array[Byte]](2), "UTF-8"))).toMap
    val want = fixture.collect().map(r =>
      r.getString(1) -> r.getString(2)).toMap
    assert(resp.keySet == want.keySet)
    want.foreach { case (uri, body) =>
      assert(resp(uri) == ((200, body)), s"mismatch at $uri") }
  }

  test("CDX index: every member independently gunzips at (offset,length)") {
    val dir = tmp()
    WarcShards.write(fixture, "doc_id", "uri", "text", dir, "crawl",
      numShards = 2)
    val cdx = spark.read.parquet(WarcShards.cdxPath(dir, "crawl"))
      .collect()
    assert(cdx.length == 5)
    cdx.foreach { r =>
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, r.getAs[String]("warc_file")))
      val off = r.getAs[Long]("warc_offset").toInt
      val len = r.getAs[Long]("warc_length").toInt
      val member = java.util.Arrays.copyOfRange(bytes, off, off + len)
      val in = new GZIPInputStream(
        new java.io.ByteArrayInputStream(member))
      val rec = new String(in.readAllBytes(), "UTF-8")
      in.close()
      assert(rec.startsWith("WARC/1.0\r\n"))
      assert(rec.contains(
        s"WARC-Target-URI: ${r.getAs[String]("target_uri")}"))
    }
    // offsets tile the shard exactly: contiguous, gap-free after the
    // warcinfo member, last member ends at EOF
    cdx.groupBy(_.getAs[String]("warc_file")).foreach { case (f, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("warc_offset"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("warc_offset") +
            a.getAs[Long]("warc_length") == b.getAs[Long]("warc_offset"))
        case _ => ()
      }
      val fileLen = java.nio.file.Files.size(
        java.nio.file.Paths.get(dir, f))
      val last = sorted.last
      assert(last.getAs[Long]("warc_offset") +
        last.getAs[Long]("warc_length") == fileLen)
    }
  }

  test("readIndexed fetches exactly the named records") {
    val dir = tmp()
    WarcShards.write(fixture, "doc_id", "uri", "text", dir, "crawl",
      numShards = 2)
    val cdx = spark.read.parquet(WarcShards.cdxPath(dir, "crawl"))
    val picked = cdx.filter($"doc_id".isin(2L, 5L))
    val got = WarcShards.readIndexed(picked, dir)
      .select($"target_uri", $"body").collect()
      .map(r => r.getString(0) ->
        new String(r.getAs[Array[Byte]](1), "UTF-8")).toMap
    assert(got == Map(
      "https://a.example.com/de/2" -> "beta body\nwith a newline",
      "https://c.example.com/en/5" -> ("epsilon " * 2000)))
  }

  test("shard bytes are deterministic for identical content") {
    val d1 = tmp(); val d2 = tmp()
    WarcShards.write(fixture, "doc_id", "uri", "text", d1, "c", 2)
    WarcShards.write(fixture, "doc_id", "uri", "text", d2, "c", 2)
    (0 until 2).foreach { i =>
      val n = f"c_$i%05d-of-00002.warc.gz"
      val b1 = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(d1, n))
      val b2 = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(d2, n))
      assert(java.util.Arrays.equals(b1, b2), s"shard $n bytes differ")
    }
  }

  test("system gzip interop: zcat decodes the multi-member shard") {
    val dir = tmp()
    WarcShards.write(fixture, "doc_id", "uri", "text", dir, "crawl",
      numShards = 1)
    val shard = s"$dir/crawl_00000-of-00001.warc.gz"
    val proc = new ProcessBuilder("gzip", "-dc", shard)
      .redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    assert(proc.waitFor() == 0, "gzip -dc failed")
    // 1 warcinfo + 5 responses
    assert("WARC/1\\.0\r\n".r.findAllIn(out).length == 6)
    assert(out.contains("WARC-Target-URI: https://b.example.com/en/3"))
  }

  test("compact: byte-range member copies, arithmetic CDX, " +
      "bit-identical content") {
    val dir = tmp()
    WarcShards.write(fixture, "doc_id", "uri", "text", dir, "small", 3)
    val oldCdx = spark.read.parquet(WarcShards.cdxPath(dir, "small"))
    val big = "big_00000-of-00001.warc.gz"
    val newCdx = WarcShards.compact(oldCdx, dir, big, infoId = -9L)
      .collect() // materializes the copy
    assert(newCdx.length == 5)
    assert(newCdx.forall(_.getAs[String]("warc_file") == big))
    // every member's bytes moved VERBATIM: slice the compacted file
    // at the new offsets and compare with the old files' slices
    val bigBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, big))
    val oldByDoc = oldCdx.collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    newCdx.foreach { n =>
      val o = oldByDoc(n.getAs[Long]("doc_id"))
      val oldBytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, o.getAs[String]("warc_file")))
      val nOff = n.getAs[Long]("warc_offset").toInt
      val nLen = n.getAs[Long]("warc_length").toInt
      val oOff = o.getAs[Long]("warc_offset").toInt
      assert(nLen == o.getAs[Long]("warc_length").toInt)
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(bigBytes, nOff, nOff + nLen),
        java.util.Arrays.copyOfRange(oldBytes, oOff, oOff + nLen)))
    }
    // new offsets tile the compacted shard to EOF
    val last = newCdx.maxBy(_.getAs[Long]("warc_offset"))
    assert(last.getAs[Long]("warc_offset") +
      last.getAs[Long]("warc_length") == bigBytes.length)
    // the compacted shard parses as a normal WARC (1 warcinfo + 5)
    val back = WarcShards.read(spark, s"$dir/$big").collect()
    assert(back.length == 6)
    assert(back.count(_.getAs[String]("warc_type") == "response") == 5)
  }

  test("mandatory headers and exact Content-Length framing") {
    val dir = tmp()
    WarcShards.write(fixture, "doc_id", "uri", "text", dir, "crawl", 1)
    val back = WarcShards.read(spark, s"$dir/crawl_*.warc.gz").collect()
    // every record parsed (6 = warcinfo + 5) proves Content-Length was
    // exact — a drifted length desynchronizes the CRLF framing and the
    // reader's require() trips
    assert(back.length == 6)
    assert(back.forall(_.getAs[String]("record_id")
      .startsWith("<urn:uuid:")))
    // record ids are distinct (mandatory-unique per ISO 28500)
    assert(back.map(_.getAs[String]("record_id")).distinct.length == 6)
  }
}
