package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

class ScriptCensusSpec extends SparkSpec {
  import spark.implicits._

  private def census(rows: (Long, String, String)*) =
    TextAnalysis.scriptCensus(
        rows.toSeq.toDF("id", "lang", "text"),
        col("id"), col("text"), col("lang"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getBoolean(6))).toMap

  test("per-script counts over mixed text") {
    val c = census(
      (1L, "en", "latin only text"),
      (2L, "zh", "mixed 中文 and ascii"),
      (3L, "ru", "смесь of пример"),
      (4L, "ar", "نص عربي"),
      (5L, "el", "ελληνικά words"))
    assert(c(1L) == ((0L, 0L, 0L, 0L, true)))
    assert(c(2L) == ((2L, 0L, 0L, 0L, true))) // zh expects Han
    assert(c(3L) == ((0L, 11L, 0L, 0L, true))) // ru expects Cyrillic
    assert(c(4L) == ((0L, 0L, 6L, 0L, true)))
    assert(c(5L) == ((0L, 0L, 0L, 8L, true)))
  }

  test("unexpected script flags; expected script never does") {
    val c = census(
      (1L, "fr", "texte avec пример"), // Cyrillic in French: flagged
      (2L, "zh", "中文 with пример"),   // Han ok, Cyrillic NOT: flagged
      (3L, "zh", "纯中文文本"),          // pure Han under zh: ok
      (4L, "en", "plain english"))
    assert(!c(1L)._5 && !c(2L)._5 && c(3L)._5 && c(4L)._5)
  }
}
