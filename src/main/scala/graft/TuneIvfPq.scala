package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** IVF-PQ tuning receipt: sweep (m, k, nProbe) for s10 (raw) and s11
  * (residual) at a given SF, measuring recall@5 against the exact
  * brute-force top-k and wall seconds per search — the
  * recall-vs-cost frontier that justifies the shipped defaults.
  *
  * Usage: runMain graft.TuneIvfPq [sfDir]
  */
object TuneIvfPq {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.installOptimizations(spark)
    import spark.implicits._

    val emb = Tables.embeddings(spark, dir).persist()
    val n = emb.count()
    val queries = emb.filter(col("vec_id") % 25 === 0).persist()
    val nQ = queries.count()
    val cells = Similarity.autoCells(n)
    println(s"n=$n queries=$nQ cells=$cells (auto) dir=$dir")

    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id",
        "embedding", 5)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    println(s"exact ground truth: ${exact.size} pairs")

    println(f"| variant | m | k | nProbe | recall@5 | sec |")
    println(f"|---|---|---|---|---|---|")
    for {
      m <- Seq(8, 16)
      k <- Seq(8, 16)
      np <- Seq(1, 2, 4, 8)
      variant <- Seq("raw", "residual", "rerank")
    } {
      val t0 = System.nanoTime()
      val res = variant match {
        case "raw" =>
          Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding",
            topK = 5, nCells = cells, ivfIters = 2, nProbe = np, m = m,
            k = k, dim = 64, pqIters = 2, seed = 777)
        case "residual" =>
          Similarity.ivfPqResidualTopK(emb, queries, "vec_id",
            "embedding", topK = 5, nCells = cells, ivfIters = 2,
            nProbe = np, m = m, k = k, dim = 64, pqIters = 2,
            seed = 777)
        case _ => // s16: ADC shortlist 25 + exact-cosine re-rank
          Similarity.ivfPqResidualRerankTopK(emb, queries, "vec_id",
            "embedding", topK = 5, shortK = 25, nCells = cells,
            ivfIters = 2, nProbe = np, m = m, k = k, dim = 64,
            pqIters = 2, seed = 777)
      }
      val got = res.select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = got.intersect(exact).size.toDouble / exact.size
      println(f"| $variant | $m | $k | $np | $recall%.3f | $sec%.2f |")
      InternalCaches.releaseAll()
      spark.catalog.clearCache()
      emb.persist(); queries.persist()
      emb.count(); queries.count()
    }
    spark.stop()
  }
}
