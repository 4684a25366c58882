package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** s24 graph-tier ANN receipts: bounded degree, beam-search contract
  * (k unique non-self neighbors, deterministic), recall monotone in
  * rounds by construction, and the headline receipt — beam search
  * recalls at least what the plain IVF probe recalls from the SAME
  * trained codebook at a comparable distance-eval budget. */
class SimilarityGraphSpec extends SparkSpec {

  private val NC = 8
  private val Iters = 2
  private val Degree = 6
  private val Beam = 8
  private val Rounds = 3
  private val K = 5

  private lazy val emb =
    Tables.embeddings(spark, Sf0001).persist()
  private lazy val queries = emb.filter(col("vec_id") % 25 === 0)
  private lazy val cents = Similarity.kmeansCentroids(emb, "vec_id",
    "embedding", NC, Iters).persist()

  private def recallAt5(approx: org.apache.spark.sql.DataFrame): Double = {
    val exact = Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", K)
    val hits = exact.select(col("query_id"), col("neighbor_id"))
      .join(approx.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"))
      .count()
    hits.toDouble / exact.count()
  }

  test("filtered serve fills k where the naive post-filter starves (s39)") {
    val g = Similarity.knnGraph(emb, cents, "vec_id", "embedding",
      Degree).persist()
    val pred = col("vec_id") % 3 === 0
    val filtered = Similarity.nswBeamFilteredTopK(emb, g, queries,
      "vec_id", "embedding", pred, K, Beam, Rounds).persist()
    // never returns an ineligible neighbor
    assert(filtered.filter(col("neighbor_id") % 3 =!= 0).count() == 0)
    // the classic bug: post-filtering the UNfiltered top-k underfills
    val naive = Similarity.nswBeamTopK(emb, g, queries, "vec_id",
        "embedding", K, Beam, Rounds)
      .filter(col("neighbor_id") % 3 === 0)
    def fullK(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("query_id")).count()
        .filter(col("count") === K).count()
    assert(fullK(filtered) > fullK(naive),
      "filter-then-rank over the visited pool must fill k for more " +
        "queries than post-filtering the k-cut at 1/3 selectivity")
    // scores are true cosines of eligible visited nodes: every row
    // also appears in the exact ranking restricted to the predicate
    val exactF = Similarity.bruteForceTopK(emb.filter(pred)
        .unionByName(queries).distinct(), queries, "vec_id",
        "embedding", emb.count().toInt)
    // (sanity only: the approx result is a subset of eligible pairs)
    val bad = filtered.select(col("query_id"), col("neighbor_id"))
      .join(exactF.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_anti")
    assert(bad.count() == 0)
  }

  test("knn graph: out-degree <= Degree, no self-loops, edges scored") {
    val g = Similarity.knnGraph(emb, cents, "vec_id", "embedding",
      Degree).persist()
    val deg = g.groupBy(col("src")).count()
    assert(deg.filter(col("count") > Degree).count() == 0)
    assert(g.filter(col("src") === col("dst")).count() == 0)
    // every corpus node has at least one out-edge (no orphan nodes —
    // a node always shares its own cell with someone at this scale)
    assert(deg.count() == emb.count())
  }

  test("beam search: k unique non-self neighbors per query, deterministic") {
    val r1 = Similarity.nswTopK(emb, queries, "vec_id", "embedding",
      K, NC, Iters, Degree, 2, Beam, Rounds).collect()
    val r2 = Similarity.nswTopK(emb, queries, "vec_id", "embedding",
      K, NC, Iters, Degree, 2, Beam, Rounds).collect()
    assert(r1.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq ==
      r2.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2)).toSeq)
    val byQ = r1.groupBy(_.getLong(0))
    assert(byQ.forall(_._2.length == K), "every query fills k")
    assert(byQ.forall { case (q, rows) =>
      val ns = rows.map(_.getLong(2))
      ns.distinct.length == K && !ns.contains(q)
    })
  }

  test("recall is monotone in rounds (visited set only grows)") {
    val g = Similarity.knnGraph(emb, cents, "vec_id", "embedding",
      Degree).persist()
    val r1 = recallAt5(Similarity.nswBeamTopK(emb, g, queries,
      "vec_id", "embedding", K, Beam, rounds = 1))
    val r3 = recallAt5(Similarity.nswBeamTopK(emb, g, queries,
      "vec_id", "embedding", K, Beam, rounds = Rounds))
    assert(r3 >= r1,
      s"rounds=3 recall $r3 must not lose to rounds=1 recall $r1")
  }

  test("beam search recalls >= the plain IVF probe from the same codebook") {
    // matched budget: IVF nProbe=2 of 8 cells scans ~n/4 candidates
    // per query (~125 here); the beam path evaluates at most
    // beam*degree*rounds = 144 — same order of work
    val ivf = Similarity.ivfTopKWithQueries(emb, cents, queries,
      "vec_id", "embedding", K, nProbe = 2)
    val nsw = Similarity.nswTopK(emb, queries, "vec_id", "embedding",
      K, NC, Iters, Degree, 2, Beam, Rounds)
    val rIvf = recallAt5(ivf)
    val rNsw = recallAt5(nsw)
    assert(rNsw >= rIvf,
      s"graph recall $rNsw must not regress vs IVF recall $rIvf")
  }
}
