package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation

/** t37 receipts: the per-source frequency threshold fires on template
  * lines only, stripping is source-scoped (the same line under the
  * threshold in another source survives), and reassembly preserves
  * the surviving lines' order. */
class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private val Frac = 0.5

  private def fixture = Seq(
    // srcA: footer on 3/4 docs (> 50%) → template; bodies unique
    (1L, "srcA", "alpha body one\nshared footer"),
    (2L, "srcA", "beta body two\nshared footer"),
    (3L, "srcA", "gamma body three\nshared footer"),
    (4L, "srcA", "delta body four"),
    // srcB: the SAME footer text on 1/3 docs (≤ 50%) → NOT template
    (5L, "srcB", "epsilon body\nshared footer"),
    (6L, "srcB", "zeta body"),
    (7L, "srcB", "eta body")
  ).toDF("doc_id", "source", "text")

  test("template mining is per-source: same line, different verdicts") {
    val tpl = Curation.boilerplateLines(fixture, col("doc_id"),
      col("text"), col("source"), Frac).collect()
    assert(tpl.map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("srcA", "shared footer")))
  }

  test("strip removes template occurrences only, order preserved") {
    val out = Curation.boilerplateStrip(fixture, col("doc_id"),
        col("text"), col("source"), Frac)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(out(1L) == ((2L, 1L, "alpha body one")))
    assert(out(4L) == ((1L, 1L, "delta body four")))
    // srcB keeps its footer — under the threshold there
    assert(out(5L) == ((2L, 2L, "epsilon body\nshared footer")))
  }

  test("a doc that is ALL template reassembles to empty, counted changed") {
    val docs = Seq(
      (1L, "s", "tpl line"), (2L, "s", "tpl line"),
      (3L, "s", "tpl line\nreal body")).toDF("doc_id", "source", "text")
    val out = Curation.boilerplateStrip(docs, col("doc_id"),
        col("text"), col("source"), Frac)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getString(4))).toMap
    assert(out(1L) == ((0L, "")))
    assert(out(3L) == ((1L, "real body")))
    val census = Curation.boilerplateCensus(docs, col("doc_id"),
      col("text"), col("source"), Frac).collect()
    assert(census.length == 1)
    val r = census.head
    assert(r.getLong(1) == 3L && r.getLong(2) == 1L &&
      r.getLong(3) == 3L && r.getLong(4) == 3L)
  }
}
