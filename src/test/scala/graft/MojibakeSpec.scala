package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

class MojibakeSpec extends SparkSpec {
  import spark.implicits._

  /** UTF-8 bytes of `s` mis-decoded as Latin-1 — the corruption. */
  private def moji(s: String): String =
    new String(s.getBytes("UTF-8"), "ISO-8859-1")

  private def repair(texts: String*): Seq[(String, Boolean)] = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    TextAnalysis.mojibakeRepair(df, col("id"), col("text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getString(1), r.getBoolean(2))).toSeq
  }

  test("reverses double-encoding for Latin and CJK text") {
    val originals = Seq("café crème", "über straße", "中文 mixed text",
      "años señor")
    originals.foreach { o =>
      assert(moji(o) != o) // the corruption is real
      assert(repair(moji(o)) == Seq((o, true)), s"failed on $o")
    }
  }

  test("healthy text passes through untouched") {
    assert(repair("plain ascii text") ==
      Seq(("plain ascii text", false)))
    // accented text WITHOUT the moji marker: untouched
    assert(repair("café crème") == Seq(("café crème", false)))
    // non-Latin-1 text: the lossy-re-encode gate blocks repair
    assert(repair("中文テキスト") == Seq(("中文テキスト", false)))
  }

  test("invalid reinterpretation is gated: dangling lead byte") {
    // 'Ã¼' + a dangling 'Ã' re-encodes to C3 BC C3 — invalid UTF-8,
    // so the repair must NOT fire despite the marker being present
    val t = "Ã¼Ã"
    assert(repair(t) == Seq((t, false)))
  }

  test("the known ftfy tradeoff is confined: repair requires marker + " +
      "clean reinterpretation") {
    // text that legitimately contains the mojibake pattern is repaired
    // (indistinguishable by construction — documented tradeoff)
    assert(repair("Ã©") == Seq(("é", true)))
  }
}
