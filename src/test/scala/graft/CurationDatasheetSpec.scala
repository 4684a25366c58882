package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation

/** p11 datasheet receipts: totals cover the corpus exactly, and the
  * exact-dup column counts injected duplicates (whitespace-normalized
  * content identity, the t4 fingerprint). */
class CurationDatasheetSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, Sf0001).persist()

  private def sheet(d: org.apache.spark.sql.DataFrame) =
    Curation.corpusDatasheet(d, col("doc_id"), col("text"),
      col("source"), col("lang"), col("n_chars"))

  test("per-source doc counts partition the corpus") {
    val s = sheet(docs).persist()
    assert(s.agg(sum(col("n_docs"))).head.getLong(0) == docs.count())
    assert(s.filter(col("chars_min") > col("chars_max")).count() == 0)
    assert(s.filter(col("gopher_keep") > col("n_docs")).count() == 0)
    assert(s.filter(col("n_langs") < 1).count() == 0)
    s.unpersist()
  }

  test("injected exact duplicates are counted per source") {
    val before = sheet(docs).select(col("source"), col("n_exact_dups"))
    val dupes = docs.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 500000L)
      // internal whitespace variation must NOT defeat the fingerprint
      // (the t4 contract: runs of whitespace collapse to one space)
      .withColumn("text", regexp_replace(col("text"), " ", "  "))
    val after = sheet(docs.unionByName(dupes))
      .select(col("source"), col("n_exact_dups").as("after_dups"))
    val grew = before.join(after, "source")
      .agg(sum(col("after_dups") - col("n_exact_dups"))).head.getLong(0)
    assert(grew == dupes.count(),
      s"expected ${dupes.count()} new exact dups, saw $grew")
  }
}
