package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** s25 streaming-append receipts: the appended index equals the
  * from-scratch re-assignment row for row, search from it equals the
  * rebuild search, the append itself is batch-sized, and the
  * rebalance-trigger census fires exactly when an append floods a
  * cell past the s22 cap. */
class SimilarityAppendSpec extends SparkSpec {

  private val NC = 8
  private val Iters = 2
  private val K = 5
  private val NProbe = 2

  private lazy val emb = Tables.embeddings(spark, Sf0001).persist()
  private lazy val base = emb.filter(col("vec_id") % 4 =!= 0)
  private lazy val incoming = emb.filter(col("vec_id") % 4 === 0)

  test("append ∪ base equals the from-scratch full re-assignment") {
    val (cents, baseIdx) = Similarity.buildIvfIndex(base, "vec_id",
      "embedding", NC, Iters)
    val appended = baseIdx.unionByName(
      Similarity.appendToIndex(incoming, cents, "vec_id", "embedding"))
    val rebuilt = Similarity.appendToIndex(emb, cents, "vec_id",
      "embedding")
    val a = appended.select(col("vec_id"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = rebuilt.select(col("vec_id"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
    // the append only carries the batch — batch-sized work
    assert(Similarity.appendToIndex(incoming, cents, "vec_id",
      "embedding").count() == incoming.count())
  }

  test("search from the appended index equals the rebuild search") {
    val queries = emb.filter(col("vec_id") % 25 === 0)
    val served = Similarity.ivfAppendSearch(base, incoming, queries,
      "vec_id", "embedding", K, NC, Iters, NProbe).collect()
      .map(_.toSeq).toSet
    val cents = Similarity.kmeansCentroids(base, "vec_id", "embedding",
      NC, Iters)
    val rebuilt = Similarity.ivfTopKWithQueries(emb, cents, queries,
      "vec_id", "embedding", K, NProbe).collect().map(_.toSeq).toSet
    assert(served == rebuilt)
  }

  test("rebalance trigger fires iff an append floods a cell past cap") {
    val (cents, baseIdx) = Similarity.buildIvfIndex(base, "vec_id",
      "embedding", NC, Iters)
    // balanced append: no hot cell on the near-uniform corpus
    val balanced = baseIdx.unionByName(
      Similarity.appendToIndex(incoming, cents, "vec_id", "embedding"))
    val t1 = Similarity.appendRebalanceTrigger(balanced, NC)
    assert(t1.filter(col("hot")).count() == 0)
    // skewed append: pull the batch toward the all-ones direction so
    // one stored cell swallows it, crossing the cap
    val skewed = incoming.select(col("vec_id"),
      transform(col("embedding"),
        x => lit(2.0f) + lit(0.05f) * x).as("embedding"))
    val big = skewed
    val flooded = baseIdx.unionByName(
      Similarity.appendToIndex(big, cents, "vec_id", "embedding"))
    val t2 = Similarity.appendRebalanceTrigger(flooded, NC)
    val hot = t2.filter(col("hot")).collect()
    assert(hot.nonEmpty,
      s"skewed append must trigger: ${t2.collect().mkString(",")}")
    // the trigger is the s22 cap: cnt > ceil(2n/C)
    val n = flooded.count()
    val cap = math.ceil(2.0 * n / NC).toLong
    assert(hot.forall(r => r.getLong(2) == cap && r.getLong(1) > cap))
  }
}
