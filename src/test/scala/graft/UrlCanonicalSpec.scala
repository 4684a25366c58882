package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class UrlCanonicalSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toSeq.toDF("u")
      .select(Dedup.canonicalizeUrl(col("u")))
      .collect().map(_.getString(0)).toSeq

  test("host/scheme case, default ports, www, fragments collapse") {
    assert(canon(
      "https://Site.Example.COM/a/b",
      "HTTPS://site.example.com:443/a/b",
      "https://www.site.example.com/a/b#section-2",
      "https://site.example.com/a/b/"
    ).distinct == Seq("https://site.example.com/a/b"))
    assert(canon("http://HOST.COM:80/x") == Seq("http://host.com/x"))
  }

  test("non-default ports are KEPT; cross-scheme ports not confused") {
    assert(canon("https://h.com:8443/x") == Seq("https://h.com:8443/x"))
    // :80 is only default for http — on https it stays
    assert(canon("https://h.com:80/x") == Seq("https://h.com:80/x"))
    assert(canon("http://h.com:443/x") == Seq("http://h.com:443/x"))
  }

  test("query params: tracking dropped, rest sorted, values intact") {
    assert(canon(
      "https://h.com/p?b=2&a=1&utm_source=nl&fbclid=XYZ",
      "https://h.com/p?a=1&b=2",
      "https://h.com/p?utm_campaign=x&b=2&a=1"
    ).distinct == Seq("https://h.com/p?a=1&b=2"))
    // a value CONTAINING '=' survives the split-on-& untouched
    assert(canon("https://h.com/p?q=a=b&z=1") ==
      Seq("https://h.com/p?q=a=b&z=1"))
    // tracking-only query → no '?' at all
    assert(canon("https://h.com/p?utm_source=x&gclid=1") ==
      Seq("https://h.com/p"))
  }

  test("edge shapes: root path, empty query, multiple trailing slashes") {
    assert(canon("https://h.com/", "https://h.com", "https://h.com///")
      .distinct == Seq("https://h.com"))
    assert(canon("https://h.com/p?") == Seq("https://h.com/p"))
    // 'ref=' is tracking; 'referrer=' is NOT (prefix is exact)
    assert(canon("https://h.com/p?referrer=x") ==
      Seq("https://h.com/p?referrer=x"))
  }

  test("urlDedup census: keep lowest id, count raw and distinct-raw") {
    val docs = Seq(
      (10L, "https://A.com/x?b=1&a=2"),
      (11L, "https://a.com/x/?a=2&b=1#f"),
      (12L, "https://a.com/x?a=2&b=1"),   // same canonical as 10,11
      (13L, "https://a.com/x?a=2&b=1"),   // duplicate RAW url of 12
      (20L, "https://b.com/y")
    ).toDF("doc_id", "url")
    val out = Dedup.urlDedup(docs, col("doc_id"), col("url"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("https://a.com/x?a=2&b=1") == ((4L, 3L, 10L, 36L)))
    assert(out("https://b.com/y") == ((1L, 1L, 20L, 0L)))
  }
}
