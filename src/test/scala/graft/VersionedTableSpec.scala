package graft

import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  test("time travel returns each snapshot exactly; current is latest") {
    val dir = java.nio.file.Files.createTempDirectory("vtab").toString
    val v0 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
    val v1 = Seq((1L, "a"), (3L, "c2")).toDF("id", "s")      // delete+update
    val v2 = Seq((1L, "a"), (3L, "c2"), (9L, "z")).toDF("id", "s")
    assert(VersionedTable.commit(v0, dir) == 0)
    assert(VersionedTable.commit(v1, dir) == 1)
    assert(VersionedTable.commit(v2, dir) == 2)
    assert(VersionedTable.versions(spark, dir) == Seq(0, 1, 2))
    def rows(v: Int) = VersionedTable.readVersion(spark, dir, v)
      .as[(Long, String)].collect().toSet
    // v0 read AFTER later commits still shows the pre-delete content
    assert(rows(0) == Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(rows(1) == Set((1L, "a"), (3L, "c2")))
    assert(rows(2) == Set((1L, "a"), (3L, "c2"), (9L, "z")))
    assert(VersionedTable.readCurrent(spark, dir)
      .as[(Long, String)].collect().toSet == rows(2))
  }

  test("a crashed commit is invisible: data without manifest, tmp junk") {
    val dir = java.nio.file.Files.createTempDirectory("vtab").toString
    VersionedTable.commit(Seq((1L, "a")).toDF("id", "s"), dir)
    // simulate a crash between data write and manifest rename: orphan
    // data files and a leftover .tmp manifest
    Seq((666L, "ghost")).toDF("id", "s")
      .write.parquet(s"$dir/data/v1")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_manifests", "v1.json.tmp"),
      "{\"version\":1,\"files\":[\"data/v1/broken\"]}".getBytes)
    // readers see only the committed version; the next commit takes
    // the number the crashed one never claimed... v1 data dir exists,
    // so the new commit's overwrite replaces the orphan files
    assert(VersionedTable.versions(spark, dir) == Seq(0))
    assert(VersionedTable.readCurrent(spark, dir)
      .as[(Long, String)].collect().toSet == Set((1L, "a")))
    val v = VersionedTable.commit(Seq((2L, "b")).toDF("id", "s"), dir)
    assert(v == 1)
    assert(VersionedTable.readVersion(spark, dir, 1)
      .as[(Long, String)].collect().toSet == Set((2L, "b")))
  }

  test("append commit reuses base files verbatim; history intact") {
    val dir = java.nio.file.Files.createTempDirectory("vtab").toString
    VersionedTable.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), dir)
    VersionedTable.appendCommit(Seq((3L, "c")).toDF("id", "s"), dir)
    assert(VersionedTable.readVersion(spark, dir, 1)
      .as[(Long, String)].collect().toSet
      == Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(VersionedTable.readVersion(spark, dir, 0)
      .as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
    // file-level reuse: v1's manifest lists v0's files UNCHANGED plus
    // only files under data/v1 — the append rewrote nothing
    def files(v: Int) = VersionedTable.parseFiles(new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, "_manifests", s"v$v.json")))).toSet
    assert(files(0).subsetOf(files(1)))
    assert((files(1) -- files(0)).forall(_.startsWith("data/v1/")))
    assert((files(1) -- files(0)).nonEmpty)
  }

  test("manifest files parse round-trips including empty") {
    assert(VersionedTable.parseFiles(
      """{"version":3,"files":["data/v3/a.parquet","data/v3/b.parquet"]}""")
      == Seq("data/v3/a.parquet", "data/v3/b.parquet"))
    assert(VersionedTable.parseFiles("""{"version":0,"files":[]}""")
      == Seq.empty)
  }
}
