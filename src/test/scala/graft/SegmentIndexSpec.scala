package graft

import org.apache.spark.sql.functions._

import graft.operators.{InvertedIndex, TextAnalysis}

/** t36 segment-model receipts: segments partition the postings, a
  * compacted cell is string-identical to the from-scratch cell, the
  * compaction boundary arithmetic matches the q102 discipline, and
  * segment-served BM25 equals the corpus-rescan scoring exactly. */
class SegmentIndexSpec extends SparkSpec {

  private val NB = 5
  private val Block = 16

  private lazy val docs = Tables.documents(spark, Sf0001).persist()

  test("segments partition the postings of a monolithic build") {
    val segs = InvertedIndex.segmentedPostings(docs, col("doc_id"),
      col("text"), NB, Block)
    val mono = InvertedIndex.postingBlocks(docs, col("doc_id"),
      col("text"), Block)
    // per-(tok, block) posting COUNTS re-aggregate to the monolith's
    val fromSegs = segs.groupBy(col("tok"), col("block"))
      .agg(sum(col("n")).as("n"))
    val diff = fromSegs.join(mono.select(col("tok"), col("block"),
        col("n").as("nm")), Seq("tok", "block"), "full_outer")
      .filter(col("n").isNull || col("nm").isNull ||
        col("n") =!= col("nm"))
    assert(diff.count() == 0)
    // a doc's postings live wholly inside ONE segment (batches
    // partition docs) — every (seg, doc) pair has a unique seg
    val docSegs = segs
      .select(col("seg"), explode(split(col("payload"), ",")).as("dp"))
      .select(col("seg"),
        split(col("dp"), ":").getItem(0).cast("long").as("doc_id"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("seg")).as("ns"))
    assert(docSegs.filter(col("ns") =!= 1).count() == 0)
  }

  test("a compacted cell is string-identical to the from-scratch cell") {
    val segs = InvertedIndex.segmentedPostings(docs, col("doc_id"),
      col("text"), NB, Block).persist()
    val upTo = 2
    val compacted = InvertedIndex.compactSegments(segs, upTo)
    val scratch = InvertedIndex.postingBlocks(
      docs.filter(col("doc_id") % NB <= upTo), col("doc_id"),
      col("text"), Block)
    val diff = compacted
      .select(col("tok"), col("block"), col("payload"))
      .join(scratch.select(col("tok"), col("block"),
        col("payload").as("p2")), Seq("tok", "block"), "full_outer")
      .filter(col("payload").isNull || col("p2").isNull ||
        col("payload") =!= col("p2"))
    assert(diff.count() == 0)
  }

  test("compaction boundary arithmetic") {
    assert(InvertedIndex.newestCompaction(tip = 10, every = 4) == 7)
    assert(InvertedIndex.newestCompaction(tip = 7, every = 4) == 7)
    assert(InvertedIndex.newestCompaction(tip = 6, every = 4) == 3)
    assert(InvertedIndex.newestCompaction(tip = 2, every = 4) == -1)
    assert(InvertedIndex.newestCompaction(tip = 0, every = 1) == 0)
  }

  test("segment-served BM25 equals the corpus-rescan scoring exactly") {
    val served = InvertedIndex.segmentServedBm25(docs, col("doc_id"),
      col("text"), col("doc_id") % 25 === 0, nBatches = NB, every = 2,
      k = 5, blockSize = Block)
    val rescan = TextAnalysis.bm25TopK(docs, col("doc_id"),
      col("text"), col("doc_id") % 25 === 0, k = 5)
    val a = served.select(col("query_id"), col("rank"), col("doc_id"),
      col("score6")).collect().map(_.toSeq).toSet
    val b = rescan.collect().map(_.toSeq).toSet
    assert(a == b, "layout change must never be a semantics change")
    // receipt: tip = 4, every = 2 → ckpt seg 3, loads 1 + (4-3) = 2
    val receipts = served.select(col("ckpt_seg"),
      col("segments_loaded")).distinct().collect()
    assert(receipts.length == 1 &&
      receipts.head.getLong(0) == 3L && receipts.head.getLong(1) == 2L)
  }
}
