package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** t40 encoding-gate receipts: the clean synthetic corpus passes
  * entirely, and each artifact class (double-UTF-8 mojibake, U+FFFD,
  * C0 control) flags exactly the docs it was injected into. */
class EncodingGateSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, Sf0001).persist()

  test("clean corpus is entirely clean") {
    val g = TextAnalysis.encodingArtifacts(docs, col("doc_id"),
      col("text"))
    assert(g.filter(!col("clean")).count() == 0)
  }

  test("each artifact class flags exactly its injected docs") {
    val seeded = docs.withColumn("text", concat(col("text"),
      when(col("doc_id") % 3 === 0, lit(" cafÃ©"))
        .otherwise(lit("")),
      when(col("doc_id") % 5 === 0, lit("\ufffd")).otherwise(lit("")),
      when(col("doc_id") % 7 === 0, lit("\u0007")).otherwise(lit(""))))
    val g = TextAnalysis.encodingArtifacts(seeded, col("doc_id"),
      col("text")).persist()
    assert(g.filter(col("n_moji") > 0).count() ==
      docs.filter(col("doc_id") % 3 === 0).count())
    assert(g.filter(col("n_repl") > 0).count() ==
      docs.filter(col("doc_id") % 5 === 0).count())
    assert(g.filter(col("n_ctrl") > 0).count() ==
      docs.filter(col("doc_id") % 7 === 0).count())
    assert(g.filter(!col("clean")).count() ==
      docs.filter(col("doc_id") % 3 === 0 || col("doc_id") % 5 === 0 ||
        col("doc_id") % 7 === 0).count())
    g.unpersist()
  }
}
