package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** s35 drift-census receipts: the census triggers the graph-tier
  * retrain-and-rebuild exactly when an append is skewed (population
  * cap breach and/or mean-assignment-cosine drop) and stays quiet on
  * a balanced append that merely grows every cell in proportion; the
  * gated rebuild swaps the index only when triggered. */
class SimilarityDriftSpec extends SparkSpec {

  private val NC = 8
  private val Iters = 2

  private lazy val emb = Tables.embeddings(spark, Sf0001).persist()
  private lazy val cents = Similarity.kmeansCentroids(emb, "vec_id",
    "embedding", NC, Iters).persist()
  private lazy val buildA = Similarity.assignWithSim(emb, cents,
    "vec_id", "embedding").persist()

  private def reIdd(df: org.apache.spark.sql.DataFrame) =
    df.select((col("vec_id") + 1000000L).as("vec_id"),
      col("embedding"))

  test("balanced append keeps the census quiet") {
    // every vector re-appended under a new id: populations double
    // uniformly (under the 2× cap by construction) and per-cell mean
    // cosines are unchanged — no hot, no drift
    val nowA = buildA.unionByName(
      Similarity.assignWithSim(reIdd(emb), cents, "vec_id",
        "embedding"))
    val census = Similarity.indexDriftCensus(buildA, nowA, NC)
    assert(census.filter(col("hot") === 1L || col("drift") === 1L)
      .count() == 0)
    assert(!Similarity.driftTriggered(census))
  }

  test("skewed append fires the trigger") {
    // the s22 shift construction: appended vectors collapse toward
    // one direction, flooding few cells with low-cosine assignments
    val skewed = emb.filter(col("vec_id") % 7 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"),
          x => lit(1.0) + lit(0.1) * x.cast("double")).as("embedding"))
    val nowA = buildA.unionByName(
      Similarity.assignWithSim(skewed, cents, "vec_id", "embedding"))
    val census = Similarity.indexDriftCensus(buildA, nowA, NC)
    assert(Similarity.driftTriggered(census))
    // the drifted cells are exactly where the skew landed: every
    // flagged cell gained population
    val flagged = census
      .filter(col("hot") === 1L || col("drift") === 1L)
    assert(flagged.filter(col("n_now") <= col("n_build")).count() == 0)
  }

  test("gated rebuild swaps the index iff the census triggered") {
    val (top0, graphs0) = Similarity.buildHnswGraphIndex(emb,
      "vec_id", "embedding", NC, Iters, degree = 4, nProbeBuild = 2,
      layerRatio = 16, nLayers = 2)
    val g0 = graphs0.persist()
    val quiet = Similarity.indexDriftCensus(buildA,
      buildA.unionByName(Similarity.assignWithSim(reIdd(emb), cents,
        "vec_id", "embedding")), NC)
    val (swapped0, _, gKept) = Similarity.rebuildGraphIndexIfDrifted(
      quiet, emb, top0, g0, "vec_id", "embedding", NC, Iters,
      degree = 4, nProbeBuild = 2, layerRatio = 16, nLayers = 2)
    assert(!swapped0 && (gKept eq g0)) // stored index kept verbatim
    val skewed = emb.filter(col("vec_id") % 7 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"),
          x => lit(1.0) + lit(0.1) * x.cast("double")).as("embedding"))
    val hot = Similarity.indexDriftCensus(buildA,
      buildA.unionByName(Similarity.assignWithSim(skewed, cents,
        "vec_id", "embedding")), NC)
    val (swapped1, top1, g1) = Similarity.rebuildGraphIndexIfDrifted(
      hot, emb.select(col("vec_id"), col("embedding"))
        .unionByName(skewed), top0, g0, "vec_id", "embedding",
      NC, Iters, degree = 4, nProbeBuild = 2, layerRatio = 16,
      nLayers = 2)
    assert(swapped1)
    // the rebuilt index covers the appended corpus: layer-0 srcs
    // include re-idd nodes the stored graph cannot contain
    assert(g1.filter(col("level") === 0 && col("src") >= 1000000L)
      .count() > 0)
    assert(top1 ne top0)
  }
}
