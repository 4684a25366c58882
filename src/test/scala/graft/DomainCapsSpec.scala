package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation

class DomainCapsSpec extends SparkSpec {
  import spark.implicits._

  private def dom(urls: String*): Seq[String] =
    urls.toSeq.toDF("u").select(Curation.urlDomain(col("u")))
      .collect().map(_.getString(0)).toSeq

  test("urlDomain: registrable domain survives subdomains, ports, " +
      "case, paths") {
    assert(dom(
      "https://Example.COM/a",
      "https://www.example.com",
      "http://m.example.com:8080/x?q=1",
      "https://deep.sub.tree.example.com/p"
    ) == Seq.fill(4)("example.com"))
    assert(dom("https://other.org/x") == Seq("other.org"))
  }

  test("caps keep the highest-quality docs, ties broken by id") {
    val docs = Seq(
      // domain a.com: 3 docs, cap 2 → drop the lowest quality
      (1L, "https://a.com/1", 10L),
      (2L, "https://www.a.com/2", 30L),
      (3L, "https://m.a.com/3", 20L),
      // domain b.com: tie on quality → lower id ranks first
      (4L, "https://b.com/4", 5L),
      (5L, "https://b.com/5", 5L),
      (6L, "https://b.com/6", 5L)
    ).toDF("doc_id", "url", "q")
    val out = Curation.domainCaps(docs, col("doc_id"), col("url"),
        col("q"), maxPerDomain = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("a.com") == ((3L, 2L, 5L)))  // keeps 2 (q30) + 3 (q20)
    assert(out("b.com") == ((3L, 2L, 9L)))  // keeps 4 + 5 (id tie-break)
  }

  test("a domain under the cap keeps everything") {
    val docs = Seq((1L, "https://c.com/1", 1L)).toDF("doc_id", "url", "q")
    val out = Curation.domainCaps(docs, col("doc_id"), col("url"),
      col("q"), 20).collect().head
    assert(out.getLong(1) == 1L && out.getLong(2) == 1L &&
      out.getLong(3) == 1L)
  }
}
