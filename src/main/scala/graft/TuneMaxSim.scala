package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Dev harness: the MaxSim candidate-budget frontier, in TWO regimes.
  *
  * ADVERSARIAL (the oracle fixture): token views are the 8 contiguous
  * 8-dim slices of the md5-random 64-dim embedding — the slices are
  * mutually uninformative, so the pooled prefilter carries no signal
  * about MaxSim order (recall ≈ candK/n) and the sweep measures the
  * WORST case a candidate tier can face.
  *
  * CORRELATED (the realistic ColBERT regime): every token is the
  * document's pooled direction plus bounded token noise — slice_j is
  * re-mixed as m + λ·(slice_j − m) where m is the elementwise mean of
  * the document's 8 original slices and λ = 0.3 bounds the per-token
  * deviation. Late-interaction models look like this in production
  * (token embeddings cluster around the doc centroid; that is WHY a
  * pooled first stage works at all — Santhanam et al. 2022, ColBERTv2),
  * so this regime is where the candidate-tier choice is justified;
  * the adversarial table is the floor it degrades to.
  *
  * The re-rank is maxSimRerankOn throughout; only the candidate
  * source varies — the point of the seam.
  *
  * Usage: runMain graft.TuneMaxSim [sfDir]
  */
object TuneMaxSim {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.installOptimizations(spark)
    val embRaw = Tables.embeddings(spark, sfDir)

    // correlated fixture: tokens = pooled direction + λ·(deviation)
    def correlated(emb: DataFrame, lam: Double): DataFrame = emb
      .withColumn("m", expr(
        "transform(sequence(0, 7), i -> (" +
          "embedding[i] + embedding[i+8] + embedding[i+16] + " +
          "embedding[i+24] + embedding[i+32] + embedding[i+40] + " +
          "embedding[i+48] + embedding[i+56]) / 8.0)"))
      .withColumn("embedding", expr(
        s"transform(embedding, (x, j) -> " +
          s"cast(m[j % 8] + $lam * (x - m[j % 8]) as float))"))
      .drop("m")

    def sweep(regime: String, emb0: DataFrame): Unit = {
      val emb = emb0.persist()
      val queries = emb.filter(col("vec_id") % 25 === 0)
      val nQ = queries.count()

      // ground truth: exact MaxSim over ALL candidates (self excluded)
      val allCands = emb.select(col("vec_id").as("neighbor_id"))
        .crossJoin(broadcast(
          queries.select(col("vec_id").as("query_id"))))
        .filter(col("query_id") =!= col("neighbor_id"))
      val truth = Similarity.maxSimRerankOn(emb, queries, allCands,
          "vec_id", "embedding", nTokens = 8, k = 5)
        .select(col("query_id"), col("neighbor_id")).persist()
      val truthN = truth.count()

      def overlap(cands: DataFrame): Double = {
        val got = Similarity.maxSimRerankOn(emb, queries, cands,
            "vec_id", "embedding", nTokens = 8, k = 5)
          .select(col("query_id"), col("neighbor_id"))
        got.join(truth, Seq("query_id", "neighbor_id"), "left_semi")
          .count().toDouble / truthN
      }

      println(s"== regime=$regime |Q|=$nQ truth rows=$truthN " +
        "(exact MaxSim top-5)")
      // pooled brute-force shortlists at growing candK
      for (candK <- Seq(10, 30, 60, 120)) {
        val cands = Similarity.bruteForceTopK(emb, queries, "vec_id",
            "embedding", candK)
          .select(col("query_id"), col("neighbor_id"))
        println(f"$regime pooled-brute candK=$candK%4d           " +
          f"recall@5=${overlap(cands)}%.3f")
        InternalCaches.releaseAll()
      }
      // graph serve at growing beam/candK budgets — the index is
      // built on THIS regime's pooled vectors (fresh per regime, not
      // the shared sf cache: the correlated re-mix changes them)
      val cents = Similarity.kmeansCentroids(emb, "vec_id",
        "embedding", nCells = 64, iters = 2)
      val (top, graphs, ranked) = Similarity.buildHnswGraphIndexWith(
        emb, cents, "vec_id", "embedding", degree = 6,
        nProbeBuild = 2, layerRatio = 16, nLayers = 2)
      val (top12, graphs12) = Similarity.upgradeGraphIndexDegree(emb,
        ranked, top, "vec_id", "embedding", newDegree = 12,
        layerRatio = 16, nLayers = 2)
      for ((beam, candK) <- Seq((8, 30), (16, 30), (32, 64),
          (64, 128))) {
        val cands = Similarity.hnswServeIndexed(top12, graphs12, emb,
            queries, "vec_id", "embedding", k = candK,
            beamWidth = beam, rounds = 3, nLayers = 2,
            entryWidth = 2, upperRounds = 1)
          .select(col("query_id"), col("neighbor_id"))
        println(f"$regime graph beam=$beam%3d candK=$candK%4d     " +
          f"recall@5=${overlap(cands)}%.3f")
        InternalCaches.releaseAll()
      }
      truth.unpersist(); emb.unpersist()
    }

    sweep("adversarial", embRaw)
    sweep("correlated", correlated(embRaw, lam = 0.3))
    spark.stop()
  }
}
