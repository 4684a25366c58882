package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** s26 layered-entry (HNSW) receipts: the hierarchy serves queries
  * that are NOT corpus members (the limitation s24's self-entry has),
  * the multi-layer descent path is deterministic and fills k, and
  * layered entry does not lose recall to s24's self-entry on corpus
  * queries at the same beam budget. */
class SimilarityHnswSpec extends SparkSpec {

  private val NC = 8
  private val Iters = 2
  private val Degree = 6
  private val Beam = 8
  private val Rounds = 3
  private val K = 5

  private lazy val emb =
    Tables.embeddings(spark, Sf0001).persist()
  private lazy val queries = emb.filter(col("vec_id") % 25 === 0)

  private def recallAt5(approx: org.apache.spark.sql.DataFrame,
      qs: org.apache.spark.sql.DataFrame): Double = {
    val exact = Similarity.bruteForceTopK(emb, qs,
      "vec_id", "embedding", K)
    val hits = exact.select(col("query_id"), col("neighbor_id"))
      .join(approx.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"))
      .count()
    hits.toDouble / exact.count()
  }

  test("external queries (not corpus members) are served, k rows each") {
    // shift ids out of the corpus key space: the vectors are real but
    // no query_id exists as a node — self-entry would find nothing
    val external = queries.withColumn("vec_id",
      col("vec_id") + 900000000L)
    val r = Similarity.hnswTopK(emb, external, "vec_id", "embedding",
      K, NC, Iters, Degree, 2, Beam, Rounds,
      layerRatio = 4, nLayers = 2, entryWidth = 2).collect()
    val byQ = r.groupBy(_.getLong(0))
    assert(byQ.size == queries.count(),
      "every external query must be served")
    assert(byQ.forall(_._2.length == K), "every query fills k")
    // the vectors are identical to corpus members, so a correctly
    // routed search finds the query's own twin at cosine ~1 as
    // rank-1; ANN admits misses, so assert a strong majority rather
    // than perfection
    val rank1 = r.filter(_.getLong(1) == 1L)
    val twinRate = rank1.count(_.getDouble(3) > 0.999999).toDouble /
      rank1.length
    assert(twinRate >= 0.7,
      s"only $twinRate of external queries routed to their twin")
  }

  test("three-layer descent is deterministic and fills k") {
    def run() = Similarity.hnswTopK(emb, queries, "vec_id",
      "embedding", K, NC, Iters, Degree, 2, Beam, Rounds,
      layerRatio = 4, nLayers = 3, entryWidth = 2, upperRounds = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    val a = run()
    val b = run()
    assert(a == b, "descent must be deterministic")
    assert(a.groupBy(_._1).forall(_._2.length == K))
  }

  test("an empty top layer fails loudly, not with zero rows") {
    // ratio^((nLayers)-1) far above n: no node can satisfy the layer
    // hash, and a silent empty result would read as 'no neighbors'
    val e = intercept[IllegalArgumentException] {
      Similarity.hnswTopK(emb, queries, "vec_id", "embedding",
        K, NC, Iters, Degree, 2, Beam, Rounds,
        layerRatio = 1 << 20, nLayers = 2, entryWidth = 2).collect()
    }
    assert(e.getMessage.contains("top layer is empty"))
  }

  test("layered entry does not lose recall to self-entry at equal budget") {
    val hnsw = Similarity.hnswTopK(emb, queries, "vec_id", "embedding",
      K, NC, Iters, Degree, 2, Beam, Rounds,
      layerRatio = 4, nLayers = 2, entryWidth = 2)
    val nsw = Similarity.nswTopK(emb, queries, "vec_id", "embedding",
      K, NC, Iters, Degree, 2, Beam, Rounds)
    val rH = recallAt5(hnsw, queries)
    val rN = recallAt5(nsw, queries)
    // self-entry starts AT the answer's neighborhood (the query is a
    // corpus member), so it is the stronger baseline; layered entry
    // must stay close — within one neighbor in five on average
    assert(rH >= rN - 0.2,
      s"layered recall $rH fell too far below self-entry $rN")
  }
}
