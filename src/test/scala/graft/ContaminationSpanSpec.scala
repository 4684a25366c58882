package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** t45 span-localization receipts: hand-built fixture with known
  * overlap geometry (merged windows, separate islands, char offsets),
  * plus the composition with t41 — every attributed (doc, bench)
  * pair is localized by at least one span whose excerpt really
  * occurs in both sides' canonical streams. */
class ContaminationSpanSpec extends SparkSpec {

  import spark.implicits._

  test("spans merge overlapping windows and split on real gaps") {
    // bench doc 100: "a b c d e" → 3-gram shingles {a b c, b c d, c d e}
    // doc 1: "a b c d e x x x x c d e" — hits at pos 0,1,2 (merged:
    // one span covering tokens 0..5) and pos 9 (c d e → span 9..12)
    val docs = Seq(
      (1L, "a b c d e x x x x c d e"),
      (100L, "a b c d e")).toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") === 100L)
    val out = TextAnalysis.contaminationSpans(docs, bench,
      col("doc_id"), col("text"), n = 3)
      .orderBy("doc_id", "bench_id", "span_idx")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getString(7)))
    assert(out.toSeq == Seq(
      // span 1: tokens [0,5) = "a b c d e", chars [0,9)
      (1L, 100L, 1L, 0L, 5L, 0L, 9L, "a b c d e"),
      // span 2: tokens [9,12) = "c d e", chars: 9 tokens of 1 char
      // + 9 separators = 18 → [18,23)
      (1L, 100L, 2L, 9L, 12L, 18L, 23L, "c d e")))
  }

  test("bench docs are excluded and non-overlapping docs absent") {
    val docs = Seq(
      (1L, "p q r s"),
      (100L, "a b c d e")).toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") === 100L)
    assert(TextAnalysis.contaminationSpans(docs, bench,
      col("doc_id"), col("text"), n = 3).count() == 0)
  }

  test("excision removes exactly the masked spans (t46)") {
    val docs = Seq(
      (1L, "a b c d e x x x x c d e"), // spans [0,5) and [9,12)
      (2L, "p q r s"),                 // clean: nothing removed
      (100L, "a b c d e")).toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") === 100L)
    val out = TextAnalysis.exciseContaminatedSpans(docs, bench,
        col("doc_id"), col("text"), n = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 12L, 8L), (2L, 4L, 0L)))
    // the survivor fingerprint is the hash of exactly "x x x x"
    val fp = TextAnalysis.exciseContaminatedSpans(docs, bench,
        col("doc_id"), col("text"), n = 3)
      .filter(col("doc_id") === 1L).select("surv_fp")
      .collect()(0).getLong(0)
    val expected = spark.range(1)
      .select(Tables.hashU32(lit("x x x x"), 13)).collect()(0)
      .getLong(0)
    assert(fp == expected)
  }

  test("fixpoint excision catches cascade grams pass 1 creates (t47)") {
    // bench "p q r"; doc "p q p q r r": pass 1 matches only pos 2
    // (p q r), removing tokens 2-4 — survivors "p q r" SPELL the
    // benchmark gram, which only pass 2 can remove. Doc 2 needs one
    // pass; doc 3 is clean
    val docs = Seq(
      (1L, "p q p q r r"),
      (2L, "a p q r b"),
      (3L, "x y z w"),
      (100L, "p q r")).toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") === 100L)
    val out = TextAnalysis.exciseContaminatedFixpoint(docs, bench,
        col("doc_id"), col("text"), n = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 6L, 3L, 3L, 0L), // cascade: 3 then 3, converged
      (2L, 5L, 3L, 0L, 0L), // one pass suffices
      (3L, 4L, 0L, 0L, 0L))) // clean throughout
    // doc 1 ends empty: surv_fp must hash the empty string
    val fp1 = TextAnalysis.exciseContaminatedFixpoint(docs, bench,
        col("doc_id"), col("text"), n = 3)
      .filter(col("doc_id") === 1L)
      .select("surv_fp").collect()(0).getLong(0)
    val fpEmpty = spark.range(1)
      .select(Tables.hashU32(lit(""), 13)).collect()(0).getLong(0)
    assert(fp1 == fpEmpty)
  }

  test("composes with t41: every attributed pair gets a quotable span") {
    val docs = Tables.documents(spark, Sf0001)
    val bench = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
    val attr = TextAnalysis.contaminationAttribution(docs, bench,
      col("doc_id"), col("text"), n = 3)
      .select(col("doc_id"), col("bench_id"))
    val spans = TextAnalysis.contaminationSpans(docs, bench,
      col("doc_id"), col("text"), n = 3).persist()
    // attribution names (doc, best bench); the span relation covers
    // ALL sharing pairs, so attributed pairs must all be localized
    assert(attr.join(spans, Seq("doc_id", "bench_id"), "left_anti")
      .count() == 0)
    // the quoted excerpt really occurs in the doc's canonical stream
    // (the span is the union of the doc's hit positions; individual
    // shingles — not necessarily the merged passage — occur in the
    // bench doc, which the join's very existence already proves)
    val canon = docs.select(col("doc_id"),
      array_join(TextAnalysis.tokens(col("text")), " ").as("c"))
    val bad = spans.join(canon, "doc_id")
      .filter(!col("c").contains(col("excerpt")))
    assert(bad.count() == 0)
    // char offsets index the doc's canonical stream exactly
    val off = spans.join(canon, "doc_id")
      .filter(expr("substring(c, CAST(char_start AS INT) + 1, " +
        "CAST(char_end - char_start AS INT))") =!= col("excerpt"))
    assert(off.count() == 0)
  }
}
