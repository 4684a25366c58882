package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** t38 model-based quality-filter receipts: the in-engine trained
  * logistic regression actually LEARNS the weak source labels (mean
  * score separates positive from negative sources and beats the
  * untrained 0.5 prior), the integer-exact trainer is bit-stable
  * across runs, and empty-token documents are excluded rather than
  * divided by zero. */
class QualityClassifierSpec extends SparkSpec {

  import spark.implicits._

  private val Pos = (1 to 19 by 2).map("src" + _)

  private lazy val docs = Tables.documents(spark, Sf0001).persist()

  // the synthetic corpus has no text↔source correlation; seed the
  // class-correlated style signal on half of each class's docs (the
  // registry entry's scheme) so there is something to learn
  private lazy val seeded = docs.withColumn("text",
    concat_ws(" ", col("text"),
      when(col("doc_id") % 2 === 0,
        when(col("source").isInCollection(Pos),
          lit("curated editorial standards apply"))
          .otherwise(lit("sponsored content click here")))))

  test("training separates curated from non-curated sources") {
    val scored = TextAnalysis.qualityScores(seeded, col("doc_id"),
      col("text"), col("source"), Pos).persist()
    val posMean = scored.filter(col("source").isInCollection(Pos))
      .agg(avg(col("quality6"))).head.getDouble(0)
    val negMean = scored.filter(!col("source").isInCollection(Pos))
      .agg(avg(col("quality6"))).head.getDouble(0)
    // the untrained model scores everything at exactly 500000; after
    // 3 GD steps the class means must straddle the prior — the model
    // moved toward the labels on BOTH sides
    assert(posMean > 500000.0,
      s"positive-source mean $posMean did not rise above the prior")
    assert(negMean < 500000.0,
      s"negative-source mean $negMean did not fall below the prior")
    assert(posMean - negMean > 10000.0,
      s"separation ${posMean - negMean} micro-units is too small " +
        "for a trained model")
    scored.unpersist()
  }

  test("the integer-exact trainer is bit-stable across runs") {
    val a = TextAnalysis.qualityClassifierCensus(docs, col("doc_id"),
      col("text"), col("source"), Pos).collect().toSet
    val b = TextAnalysis.qualityClassifierCensus(docs, col("doc_id"),
      col("text"), col("source"), Pos).collect().toSet
    assert(a == b, "two trainings diverged — a float leaked past the " +
      "micro-unit quantization")
    assert(a.nonEmpty)
  }

  test("deployed weights reproduce the fused trainer's scores (q103)") {
    // the train→deploy loop: qualityWeights + scoreWithWeights must
    // land on qualityScores' numbers EXACTLY — the q103 streaming
    // gate scores with deployed weights while its oracle replays the
    // fused twin, so any drift here is an oracle break
    val fused = TextAnalysis.qualityScores(seeded, col("doc_id"),
        col("text"), col("source"), Pos)
      .select(col("doc_id"), col("quality6"))
      .as[(Long, Long)].collect().sorted.toSeq
    val w = TextAnalysis.qualityWeights(seeded, col("doc_id"),
      col("text"), col("source"), Pos)
    val served = TextAnalysis.scoreWithWeights(seeded, col("doc_id"),
        col("text"), w)
      .select(col("doc_id"), col("quality6"))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(served == fused,
      "deployed-weight scoring diverged from the fused train+apply")
  }

  test("scoreWithWeights fails CLOSED on token-free docs") {
    val w = TextAnalysis.qualityWeights(seeded, col("doc_id"),
      col("text"), col("source"), Pos)
    val withEmpty = docs.withColumn("text",
      when(col("doc_id") % 7 === 0, lit("   ")).otherwise(col("text")))
    val scored = TextAnalysis.scoreWithWeights(withEmpty,
      col("doc_id"), col("text"), w)
    // every input row comes back (the gate must never DROP a doc)...
    assert(scored.count() == docs.count())
    // ...and the unscorable ones sit at 0 — under any keep threshold
    assert(scored.filter(col("doc_id") % 7 === 0)
      .filter(col("quality6") =!= 0L).count() == 0)
  }

  test("documents with no tokens are excluded, others all scored") {
    val withEmpty = docs.withColumn("text",
      when(col("doc_id") % 7 === 0, lit("   ")).otherwise(col("text")))
    val scored = TextAnalysis.qualityScores(withEmpty, col("doc_id"),
      col("text"), col("source"), Pos)
    val expected = docs.filter(col("doc_id") % 7 =!= 0).count()
    assert(scored.count() == expected)
    assert(scored.filter(col("quality6") < 0 ||
      col("quality6") > 1000000).count() == 0,
      "quality must be a micro-unit probability")
  }
}
