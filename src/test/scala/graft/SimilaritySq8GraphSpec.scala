package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** s38 receipts: the SQ8-coded beam walk with exact re-rank is
  * deterministic, its scores are TRUE cosines (the re-rank is exact,
  * whatever the integer walk visited), and on a complete graph with
  * full shortlist it degenerates to brute force exactly — the
  * quantization can route, never corrupt. */
class SimilaritySq8GraphSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, Sf0001)
    .select(col("vec_id"), col("embedding")).persist()
  private lazy val queries = emb.filter(col("vec_id") % 25 === 0)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))).sortBy(t => (t._1, t._2)).toSeq

  test("clique graph + full shortlist degenerates to brute force") {
    val ids = emb.select(col("vec_id"))
    val clique = ids.withColumnRenamed("vec_id", "src")
      .crossJoin(ids.withColumnRenamed("vec_id", "dst"))
      .filter(col("src") =!= col("dst"))
    val n = emb.count().toInt
    val got = rows(Similarity.nswBeamSq8TopK(emb, clique, queries,
      "vec_id", "embedding", k = 5, beamWidth = 8, rounds = 1,
      candK = n))
    val exact = rows(Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", 5))
    assert(got == exact,
      "one clique round visits everything; an n-wide exact re-rank " +
        "must equal brute force bit for bit")
  }

  test("deterministic, and returned scores are true cosines") {
    val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
      nCells = 8, iters = 2)
    val g = Similarity.knnGraph(emb, cents, "vec_id", "embedding",
      degree = 4, nProbe = 2).persist()
    def run() = rows(Similarity.nswBeamSq8TopK(emb, g, queries,
      "vec_id", "embedding", k = 3, beamWidth = 6, rounds = 2,
      candK = 6))
    val a = run()
    assert(a == run(), "SQ8 beam serve must be deterministic")
    // every returned (query, neighbor) cosine matches the exact one
    val exactAll = rows(Similarity.bruteForceTopK(emb, queries,
        "vec_id", "embedding", emb.count().toInt - 1))
      .map(t => (t._1, t._3) -> t._4).toMap
    assert(a.forall { case (q, _, nb, cos) => exactAll((q, nb)) == cos },
      "the re-rank is exact: scores must be true cosines")
  }
}
