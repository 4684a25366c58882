package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Dev harness: the MaxSim candidate-budget frontier. The s45 receipt
  * showed graph-served MaxSim top-5 overlapping exact MaxSim at ~0.5
  * when the shortlist is beam 16 / candK 30 — this sweep quantifies
  * how raising the candidate budget closes that gap, against the true
  * exact-MaxSim top-5 (candidates = whole corpus). The re-rank is
  * maxSimRerankOn throughout; only the candidate source varies — the
  * point of the seam.
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
    val emb = Tables.embeddings(spark, sfDir)
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

    def overlap(cands: org.apache.spark.sql.DataFrame): Double = {
      val got = Similarity.maxSimRerankOn(emb, queries, cands,
          "vec_id", "embedding", nTokens = 8, k = 5)
        .select(col("query_id"), col("neighbor_id"))
      got.join(truth, Seq("query_id", "neighbor_id"), "left_semi")
        .count().toDouble / truthN
    }

    println(f"|Q|=$nQ truth rows=$truthN (exact MaxSim top-5)")
    // pooled brute-force shortlists at growing candK
    for (candK <- Seq(10, 30, 60, 120)) {
      val cands = Similarity.bruteForceTopK(emb, queries, "vec_id",
          "embedding", candK)
        .select(col("query_id"), col("neighbor_id"))
      println(f"pooled-brute candK=$candK%4d           recall@5=${
        overlap(cands)}%.3f")
      InternalCaches.releaseAll()
    }
    // stored degree-12 graph serve at growing beam/candK budgets
    val dir = SparkEntry.degree12GraphIndexDir(spark, sfDir)
    val top = spark.read.parquet(s"$dir/toplayer")
    val graphs = spark.read.parquet(s"$dir/graphs")
    for ((beam, candK) <- Seq((8, 30), (16, 30), (32, 64), (64, 128))) {
      val cands = Similarity.hnswServeIndexed(top, graphs, emb,
          queries, "vec_id", "embedding", k = candK, beamWidth = beam,
          rounds = 3, nLayers = 2, entryWidth = 2, upperRounds = 1)
        .select(col("query_id"), col("neighbor_id"))
      println(f"graph beam=$beam%3d candK=$candK%4d     recall@5=${
        overlap(cands)}%.3f")
      InternalCaches.releaseAll()
    }
    truth.unpersist()
    spark.stop()
  }
}
