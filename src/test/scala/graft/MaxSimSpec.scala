package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class MaxSimSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("MaxSim sees token-level structure pooled cosine is blind to") {
    // query tokens: [1,0] and [0,1]. Doc 1 has the SAME tokens in
    // swapped positions — pooled cosine(q, d1) = 0, but MaxSim gives
    // full marks (each query token finds its twin somewhere in d1).
    val corpus = df(
      1L -> Seq(0f, 1f, 1f, 0f), // swapped tokens: full MaxSim, 0 pooled
      2L -> Seq(1f, 0f, 0f, 1f), // identical: full MaxSim
      3L -> Seq(1f, 1f, 1f, 1f)) // diagonal tokens: cos 1/√2 per token
    val queries = df(100L -> Seq(1f, 0f, 0f, 1f))
    val out = Similarity.maxSimRerank(corpus, queries, "vec_id",
        "embedding", nTokens = 2, candK = 3, k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(2), r.getLong(3)))
    val diag = 2L * math.round(math.sqrt(0.5) * 1e6)
    assert(out.toSeq == Seq((1L, 2000000L), (2L, 2000000L), (3L, diag)))
  }

  test("nTokens=1 degenerates to pooled-cosine ranking") {
    val emb = Tables.embeddings(spark, Sf0001)
      .filter(col("vec_id") < 80)
    val queries = emb.filter(col("vec_id") % 40 === 0)
    val pooled = Similarity.bruteForceTopK(emb, queries, "vec_id",
        "embedding", 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val ms = Similarity.maxSimRerank(emb, queries, "vec_id",
        "embedding", nTokens = 1, candK = 10, k = 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(ms == pooled)
  }

  test("re-rank is candidate-bounded: a doc outside the shortlist " +
      "cannot appear, however good its tokens") {
    // doc 1 again has perfect swapped tokens but 0 pooled cosine; with
    // candK = 1 only the pooled-best doc 2 enters the re-rank
    val corpus = df(
      1L -> Seq(0f, 1f, 1f, 0f),
      2L -> Seq(1f, 0f, 0f, 1f),
      3L -> Seq(1f, 1f, 1f, 1f))
    val queries = df(100L -> Seq(1f, 0f, 0f, 1f))
    val out = Similarity.maxSimRerank(corpus, queries, "vec_id",
        "embedding", nTokens = 2, candK = 1, k = 3)
      .collect().map(_.getLong(2)).toSeq
    assert(out == Seq(2L))
  }
}
