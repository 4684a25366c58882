package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.sources.VersionedTable
import graft.streaming.EventStream

/** The n-gram index lifecycle: build-once serve (t53) and streaming
  * MERGE-accumulated state (q109) must both answer exactly like the
  * live one-pass build (t51). */
class StreamNgramSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c a b"), (2L, "a b d"), (3L, "b c"), (4L, "c a b c"),
    (5L, "d d d"), (6L, "a c b")
  ).toDF("doc_id", "text")

  private val queries = Seq(
    (10L, Seq("a", "b")), (11L, Seq("x", "b")), (12L, Seq("a", "x"))
  ).toDF("qid", "q")

  private def served(counts: org.apache.spark.sql.DataFrame): Set[String] =
    TextAnalysis.ngramServeFrom(counts, maxN = 3, queries = queries)
      .collect().map(_.mkString("|")).toSet

  private val direct =
    TextAnalysis.ngramServe(docs, col("doc_id"), col("text"),
      maxN = 3, queries = queries)
      .collect().map(_.mkString("|")).toSet

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"ngram_$tag").toString

  test("stored-index serve answers exactly like the live build") {
    val dir = freshDir("idx")
    VersionedTable.commit(
      TextAnalysis.ngramCounts(docs, col("doc_id"), col("text"), 3), dir)
    assert(served(VersionedTable.readCurrent(spark, dir)) == direct)
  }

  test("streamed state is slicing-independent and serves identically") {
    def ingest(slices: Seq[Seq[Long]]): String = {
      val dir = freshDir("st")
      for ((ids, b) <- slices.zipWithIndex)
        EventStream.ngramMergeBatch(
          docs.filter(col("doc_id").isin(ids: _*)), 3, dir, b.toLong)
      dir
    }
    val a = ingest(Seq(Seq(1L, 2L), Seq(3L, 4L), Seq(5L, 6L)))
    val b = ingest(Seq(Seq(6L, 1L), Seq(5L, 4L, 3L, 2L)))
    val stateA = VersionedTable.readCurrent(spark, a)
    val stateB = VersionedTable.readCurrent(spark, b)
    val rowsA = stateA.drop("k").collect().map(_.mkString("|")).toSet
    assert(rowsA == stateB.drop("k").collect().map(_.mkString("|")).toSet,
      "two different slicings must land bit-identical state")
    assert(served(stateA.drop("k")) == direct)
  }

  test("pruned serve skips files and still answers exactly") {
    val dir = freshDir("pr")
    VersionedTable.commit(
      TextAnalysis.ngramCounts(docs, col("doc_id"), col("text"), 3)
        .withColumn("ctx_h", graft.Tables.hashU32(col("ctx"), 71))
        .repartitionByRange(8, col("ctx_h")),
      dir, statsCol = "ctx_h")
    // probe contexts of the fixture queries: full bigram, last
    // token, and the L0 empty context
    val keys = queries.select(explode(array(
        array_join(col("q"), " "), element_at(col("q"), 2), lit("")))
        .as("ctx")).distinct()
      .select(graft.Tables.hashU32(col("ctx"), 71))
      .collect().map(_.getLong(0)).toSeq
    val v = VersionedTable.versions(spark, dir).last
    val (kept, total) = VersionedTable.filesMatchingAny(spark, dir,
      v, keys)
    assert(kept.nonEmpty && kept.length < total,
      s"expected real pruning, got ${kept.length}/$total files")
    assert(served(VersionedTable.readVersionIn(spark, dir, v, keys)
      .drop("ctx_h")) == direct)
  }

  test("a replayed batch id is a no-op; the lockstep guard rejects gaps") {
    val dir = freshDir("rp")
    EventStream.ngramMergeBatch(docs.filter(col("doc_id") <= 3), 3,
      dir, 0L)
    EventStream.ngramMergeBatch(docs.filter(col("doc_id") > 3), 3,
      dir, 1L)
    val before = VersionedTable.versions(spark, dir)
    // crash-window replay: the sink re-delivers batch 1
    EventStream.ngramMergeBatch(docs.filter(col("doc_id") > 3), 3,
      dir, 1L)
    assert(VersionedTable.versions(spark, dir) == before,
      "replaying an applied batch must not commit")
    assert(served(VersionedTable.readCurrent(spark, dir).drop("k"))
      == direct)
    // a batch id from some other stream's future must fail loudly
    val e = intercept[IllegalArgumentException] {
      EventStream.ngramMergeBatch(docs.limit(1), 3, dir, 7L)
    }
    assert(e.getMessage.contains("not this stream's table"))
  }
}
