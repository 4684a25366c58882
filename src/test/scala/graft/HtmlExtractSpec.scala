package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def text(html: String): String =
    Seq(html).toDF("h").select(TextAnalysis.htmlToText(col("h")))
      .collect().head.getString(0)

  private def main(html: String, d: Double = 0.5): (String, Long, Long) = {
    val r = TextAnalysis.htmlMainText(
      Seq((1L, html)).toDF("id", "h"), col("id"), col("h"), d)
      .collect().head
    (r.getString(1), r.getLong(2), r.getLong(3))
  }

  test("htmlToText: head, script, style, comments vanish WITH content") {
    val h = "<html><head><title>T</title><style>p{}</style></head>" +
      "<body><script>var a = '<p>sneaky</p>';</script>" +
      "<!-- note <b>x</b> -->real <b>bold</b> text</body></html>"
    assert(text(h) == "real bold text")
  }

  test("htmlToText: entities decode once, in the safe order") {
    assert(text("<p>a &lt;tag&gt; &amp; &quot;q&quot; &#39;s&#39;</p>") ==
      "a <tag> & \"q\" 's'")
    // &amp;lt; must NOT double-decode into <
    assert(text("<p>&amp;lt;</p>") == "&lt;")
    assert(text("<p>a&nbsp;b</p>") == "a b")
  }

  test("htmlToText: whitespace collapses across tag boundaries") {
    assert(text("<div>\n  one\n  <p> two </p>\t three </div>") ==
      "one two three")
  }

  test("<header> element is not eaten by the <head> strip") {
    assert(text("<head><title>t</title></head>" +
      "<header>site header</header><p>body</p>") == "site header body")
  }

  test("htmlMainText: pure-link blocks drop, content blocks stay") {
    val h = "<body><nav><a href='/'>Home</a> <a href='/x'>X</a></nav>" +
      "<h1>Title</h1><p>A paragraph with <a href='/r'>one link</a> in " +
      "much longer surrounding prose text.</p>" +
      "<footer><a href='/t'>Terms</a></footer></body>"
    val (m, blocks, kept) = main(h)
    assert(m == "Title\nA paragraph with one link in much longer " +
      "surrounding prose text.")
    assert(blocks == 4 && kept == 2)
  }

  test("htmlMainText: threshold is a real boundary, inline tags keep " +
      "text in one block") {
    // anchor 'click here' (10 chars) / text 'click here or not' (17)
    // → density 0.588: dropped at 0.5, kept at 0.7
    val h = "<p><a href='/'>click here</a> or not</p>"
    assert(main(h, 0.5)._1 == "")
    assert(main(h, 0.7)._1 == "click here or not")
    // <b> is inline: no block split, text stays whole
    assert(main("<p>one <b>two</b> three</p>")._1 == "one two three")
  }

  test("htmlMainText: empty blocks are not counted") {
    val (m, blocks, kept) = main("<div></div><div> </div><p>x</p>")
    assert(m == "x" && blocks == 1 && kept == 1)
  }
}
