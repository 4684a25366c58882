package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** s22 cell-balance receipts: the split fires on a skewed corpus,
  * halves the hot-cell population, is a no-op on a balanced codebook,
  * and recall does not regress at equal nProbe mass. */
class SimilarityBalanceSpec extends SparkSpec {

  private val NC = 8
  private val Iters = 2
  private val NProbe = 2
  private val K = 5

  /** The s22 skew: 4/5 of vectors pulled toward the all-ones
    * direction so one trained cell swallows most of the mass. */
  private def skewed: DataFrame =
    Tables.embeddings(spark, Sf0001).select(col("vec_id"),
      when(col("vec_id") % 5 === 0,
          transform(col("embedding"), x => x.cast("double")))
        .otherwise(transform(col("embedding"),
          x => lit(1.0) + lit(0.1) * x.cast("double")))
        .as("embedding"))

  private def sizesOf(emb: DataFrame, cents: DataFrame): Array[Long] = {
    val e = emb.select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
    val cw = cents.select(col("cell_id"), col("centroid").as("cv"))
      .withColumn("cnrm", Similarity.norm(col("cv")))
    e.crossJoin(broadcast(cw))
      .withColumn("sim", Similarity.dot(col("v"), col("cv")) /
        (col("nrm") * col("cnrm")))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("sim"), (-col("cell_id")).as("nc"),
        col("cell_id").as("c"))).as("m"))
      .groupBy(col("m.c")).agg(count(lit(1)).as("cnt"))
      .select("cnt").collect().map(_.getLong(0))
  }

  private def recallAt5(emb: DataFrame, approx: DataFrame): Double = {
    val queries = emb.filter(col("vec_id") % 25 === 0)
    val exact = Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", K)
    val hits = exact.select(col("query_id"), col("neighbor_id"))
      .join(approx.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"))
      .count()
    // denominator = the ACTUAL ground-truth pair count, not nq*K —
    // bruteForceTopK can return fewer than K neighbors per query on a
    // small/filtered corpus, and nq*K would understate absolute recall
    hits.toDouble / exact.count()
  }

  test("split fires on the skewed corpus and halves the hot cell") {
    val emb = skewed.persist()
    val n = emb.count()
    val cap = math.ceil(2.0 * n / NC).toLong
    val flat = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
      NC, Iters).persist()
    val before = sizesOf(emb, flat)
    assert(before.max > cap, s"skew fixture must create a hot cell " +
      s"(max=${before.max} cap=$cap)")
    val bal = Similarity.balancedCentroids(emb, "vec_id", "embedding",
      NC, Iters).persist()
    assert(bal.count() > NC, "hot cell must split into sub-cells")
    val after = sizesOf(emb, bal)
    assert(after.max * 2 <= before.max,
      s"balance must at least halve the hot cell " +
        s"(before=${before.max} after=${after.max})")
    assert(after.max <= cap + cap / 10,
      s"post-balance max cell ${after.max} must sit at ~cap $cap")
  }

  test("balanced corpus: repair is a no-op carrying the flat codebook") {
    // the raw (un-skewed) synthetic corpus is near-uniform: no cell
    // exceeds 2n/C, so the balanced codebook is exactly the flat one
    // under the cell·1024 id mapping
    val emb = Tables.embeddings(spark, Sf0001).persist()
    val flat = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
      NC, Iters)
    val bal = Similarity.balancedCentroids(emb, "vec_id", "embedding",
      NC, Iters)
    val flatIds = flat.select((col("cell_id") * 1024).as("id"))
      .collect().map(_.getLong(0)).sorted
    val balIds = bal.select(col("cell_id"))
      .collect().map(_.getLong(0)).sorted
    assert(balIds.sameElements(flatIds))
  }

  test("recall at equal nProbe does not regress after balancing") {
    val emb = skewed.persist()
    val queries = emb.filter(col("vec_id") % 25 === 0)
    val flat = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
      NC, Iters)
    val flatTopK = Similarity.ivfTopKWithQueries(emb, flat, queries,
      "vec_id", "embedding", K, NProbe)
    val balTopK = Similarity.balancedIvfTopK(emb, queries,
      "vec_id", "embedding", K, NC, Iters, NProbe)
    val rFlat = recallAt5(emb, flatTopK)
    val rBal = recallAt5(emb, balTopK)
    assert(rBal >= rFlat,
      s"balanced recall $rBal must not regress vs flat $rFlat")
  }

  test("s23 filtered ANN: pre-filter fills k where post-filter starves") {
    val emb = Tables.embeddings(spark, Sf0001).persist()
    val queries = emb.filter(col("vec_id") % 25 === 0)
    val pred = col("vec_id") % 3 === 0
    val flat = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
      NC, Iters)
    val pre = Similarity.ivfFilteredTopK(emb, flat, queries,
      "vec_id", "embedding", pred, K, NProbe).collect()
    // every neighbor satisfies the predicate
    assert(pre.forall(_.getLong(2) % 3 == 0))
    // pre-filtering fills k for every query
    val preCounts = pre.groupBy(_.getLong(0)).map(_._2.length)
    assert(preCounts.forall(_ == K))
    // the naive alternative — post-filtering an unfiltered top-k —
    // starves: at 1/3 selectivity most queries keep < k of their 5
    val post = Similarity.ivfTopKWithQueries(emb, flat, queries,
        "vec_id", "embedding", K, NProbe)
      .filter(col("neighbor_id") % 3 === 0)
      .groupBy(col("query_id")).count()
      .collect().map(_.getLong(1))
    assert(post.exists(_ < K),
      "post-filtering must starve at least one query at 1/3 selectivity")
  }
}
