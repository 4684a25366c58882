package graft

import org.apache.spark.sql.functions._

import graft.operators.Preference
import graft.sources.VersionedTable
import graft.streaming.EventStream

/** q111's streaming preference-outcome ingest: additive merged state
  * must equal the batch aggregate under any slicing, replay must be a
  * no-op, and the solve over streamed state must equal t55's batch
  * answer. */
class StreamPrefSpec extends SparkSpec {
  import spark.implicits._

  private val outcomes = Seq(
    ("a", "b"), ("a", "b"), ("b", "c"), ("a", "c"), ("b", "c"),
    ("c", "d"), ("a", "d"), ("b", "a")
  ).zipWithIndex.map { case ((w, l), i) => (i.toLong, w, l) }
    .toDF("oid", "winner", "loser")

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"pref_$tag").toString

  private def ingest(slices: Seq[Seq[Long]]): String = {
    val dir = freshDir("st")
    for ((ids, b) <- slices.zipWithIndex)
      EventStream.prefIngestMergeBatch(
        outcomes.filter(col("oid").isin(ids: _*))
          .select("winner", "loser"), dir, b.toLong)
    dir
  }

  test("merged state equals the batch aggregate under any slicing") {
    val batch = outcomes.groupBy("winner", "loser").count()
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2))).toSet
    val a = ingest(Seq(Seq(0L, 1L, 2L), Seq(3L, 4L, 5L), Seq(6L, 7L)))
    val b = ingest(Seq(Seq(7L, 0L), Seq(6L, 5L, 4L, 3L, 2L, 1L)))
    def state(dir: String) = VersionedTable.readCurrent(spark, dir)
      .select("winner", "loser", "n")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2))).toSet
    assert(state(a) == batch)
    assert(state(b) == batch)
  }

  test("a replayed batch id is a proven no-op") {
    val dir = ingest(Seq(Seq(0L, 1L, 2L), Seq(3L, 4L)))
    val before = VersionedTable.versions(spark, dir)
    // foreachBatch redelivers batch 1 after a sink-side crash: the
    // lockstep guard must swallow it without a new version
    EventStream.prefIngestMergeBatch(
      outcomes.filter(col("oid").isin(3L, 4L))
        .select("winner", "loser"), dir, 1L)
    assert(VersionedTable.versions(spark, dir) == before)
  }

  test("an out-of-order batch fails loudly, never silently corrupts") {
    val dir = ingest(Seq(Seq(0L, 1L)))
    val e = intercept[IllegalArgumentException] {
      EventStream.prefIngestMergeBatch(
        outcomes.filter(col("oid") === 2L).select("winner", "loser"),
        dir, 5L)
    }
    assert(e.getMessage.contains("batch 5"))
  }

  test("the solve over streamed state equals the batch lane") {
    val dir = ingest(Seq(Seq(0L, 3L, 6L), Seq(1L, 4L, 7L), Seq(2L, 5L)))
    val streamed = Preference.bradleyTerryFromCounts(
        VersionedTable.readCurrent(spark, dir)
          .select("winner", "loser", "n"), iters = 8)
      .collect().map(_.mkString("|")).toSet
    val batch = Preference.bradleyTerry(
        outcomes.select("winner", "loser"), iters = 8)
      .collect().map(_.mkString("|")).toSet
    assert(streamed == batch)
  }
}
