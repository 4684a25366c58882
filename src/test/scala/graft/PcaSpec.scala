package graft

import org.apache.spark.sql.functions._

import graft.operators.{Pca, Similarity}

/** PCA train/project/serve (s48/s50) on fixtures with known
  * structure. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("solveComponents recovers a diagonal covariance's axes") {
    // diag(400, 100, 25): eigenvectors are the basis vectors in order
    val cov = for (i <- 0L until 3L; j <- 0L until 3L) yield
      (i, j, if (i != j) 0L else Seq(400L, 100L, 25L)(i.toInt))
    val comps = Pca.solveComponents(cov, dim = 3, nComp = 3, iters = 6)
    assert(comps.map(_._1) == Seq(0L, 1L, 2L))
    assert(comps(0)._2.toSeq == Seq(1000L, 0L, 0L))
    assert(comps(1)._2.toSeq == Seq(0L, 1000L, 0L))
    assert(comps(2)._2.toSeq == Seq(0L, 0L, 1000L))
    // on an exactly-diagonal matrix the power iteration is exact:
    // λ = diag value, evr = λ·1e6/trace
    assert(comps.map(_._3) == Seq(400L, 100L, 25L))
    assert(comps(0)._4 == math.floor(400L * 1000000.0 / 525L).toLong)
  }

  test("solveComponents canonicalizes the leading sign") {
    // a 2-dim rank-1 covariance along (1, -1): the component must come
    // out with its leading max-|v| coordinate positive
    val cov = Seq((0L, 0L, 100L), (0L, 1L, -100L),
      (1L, 0L, -100L), (1L, 1L, 100L))
    val c0 = Pca.solveComponents(cov, 2, 1, 6).head
    assert(c0._2(0) == 1000L && c0._2(1) == -1000L)
  }

  test("train aligns the first component with the spread axis") {
    // points spread 10× wider along dim 1 than dim 0, zero elsewhere
    val rows = (0 until 40).map { i =>
      val t = (i - 20) / 20.0
      (i.toLong, Array(0.05f * t.toFloat, 0.5f * t.toFloat, 0.0f,
        0.0f))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val comps = Pca.train(emb, "vec_id", "embedding", dim = 4,
      nComp = 2, iters = 6)
    val v0 = comps.filter(col("comp") === 0)
      .orderBy("idx").select("v_milli").as[Long].collect()
    assert(v0(1) == 1000L)            // dominant axis leads
    assert(math.abs(v0(0)) <= 150L)   // 10:1 spread ratio ≈ 100 milli
    assert(v0(2) == 0L && v0(3) == 0L)
    val evr = comps.select("comp", "evr_micro").distinct()
      .as[(Long, Long)].collect().toMap
    assert(evr(0L) > 900000L) // one direction carries the variance
  }

  test("pcaRerankTopK with candK = corpus equals brute force") {
    val rows = (0 until 30).map { i =>
      (i.toLong, Array.tabulate(8)(d =>
        (math.sin((i + 1) * (d + 1) * 0.7) * 0.4).toFloat))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") % 10 === 0)
    val got = Pca.pcaRerankTopK(emb, queries, "vec_id", "embedding",
        dim = 8, nComp = 3, iters = 6, candK = 29, k = 5)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect().toSet
    val want = Similarity.bruteForceTopK(emb, queries, "vec_id",
        "embedding", 5)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want) // full-corpus rerank makes the serve exact
  }
}
