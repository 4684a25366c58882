package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Graph-vs-IVF recall frontier (the round-9 verdict's §6 extension):
  * recall@5 of the s28-served HNSW path vs the IVF family (s5 flat,
  * s16 residual-PQ re-rank, s17 two-level) at MATCHED per-query
  * distance-eval budgets — the number that says when the graph tier
  * earns its edge-coupling cost (s32's delete price, s31's splice
  * machinery).
  *
  * Budget model (analytic, computed with the measured n):
  *  - HNSW(ratio 16, 2 layers): ⌈n/16⌉ entry evals (brute top layer)
  *    + beam·degree·rounds layer-0 scoring (upper bound on fresh
  *    nodes per round).
  *  - flat IVF: C coarse + nProbe·n/C candidates.
  *  - s16 re-rank: C coarse + nProbe·n/C ADC (counted: it is a
  *    distance evaluation, just a cheap one) + shortK exact.
  *  - s17 two-level: G groups + C/G·nProbe cells + candidate evals
  *    of the probed cells ≈ nProbe·n/C (evaluated per probed cell).
  * The HNSW index is built ONCE and served (the s28 discipline); the
  * IVF legs pay their (cached) training inside the timed call, so
  * the wall column is indicative — the frontier's claim is
  * recall-at-budget, which timing noise cannot move.
  *
  * Usage: runMain graft.TuneGraphRecall [sfDir]
  */
object TuneGraphRecall {
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

    // build the graph index once (ratio 16, 2 layers, degree 6 — the
    // shipped s26/s28 geometry) and serve every config from it
    val scratch = java.nio.file.Files
      .createTempDirectory("tunegraph").toString
    val (top, graphs) = Similarity.buildHnswGraphIndex(emb, "vec_id",
      "embedding", nCells = 64, iters = 2, degree = 6,
      nProbeBuild = 2, layerRatio = 16, nLayers = 2)
    top.coalesce(1).write.mode("overwrite").parquet(s"$scratch/top")
    graphs.repartition(col("level")).write.mode("overwrite")
      .partitionBy("level").parquet(s"$scratch/graphs")
    InternalCaches.releaseAll()
    val topL = spark.read.parquet(s"$scratch/top")
    val graphsL = spark.read.parquet(s"$scratch/graphs")
    val degree = 6

    def measure(name: String, budget: Long,
        run: () => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val got = run().select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = got.intersect(exact).size.toDouble / exact.size
      println(f"| $name | $budget | $recall%.3f | $sec%.2f |")
      InternalCaches.releaseAll()
      spark.catalog.clearCache()
      emb.persist(); queries.persist(); emb.count(); queries.count()
    }

    println("| variant | evals/query | recall@5 | sec |")
    println("|---|---|---|---|")
    for ((beam, rounds) <- Seq((4, 2), (8, 3), (16, 4)))
      measure(s"hnsw b=$beam r=$rounds",
        n / 16 + beam.toLong * degree * rounds,
        () => Similarity.hnswServeIndexed(topL, graphsL, emb, queries,
          "vec_id", "embedding", k = 5, beamWidth = beam,
          rounds = rounds, nLayers = 2, entryWidth = 2))
    // a RICHER graph (degree 12 from 4-probe candidates): the build-
    // quality axis — at fixed serve budget, edge quality is what the
    // graph tier actually sells
    val (topR, graphsR) = Similarity.buildHnswGraphIndex(emb,
      "vec_id", "embedding", nCells = 64, iters = 2, degree = 12,
      nProbeBuild = 4, layerRatio = 16, nLayers = 2)
    topR.coalesce(1).write.mode("overwrite").parquet(s"$scratch/topR")
    graphsR.repartition(col("level")).write.mode("overwrite")
      .partitionBy("level").parquet(s"$scratch/graphsR")
    InternalCaches.releaseAll()
    val topRL = spark.read.parquet(s"$scratch/topR")
    val graphsRL = spark.read.parquet(s"$scratch/graphsR")
    for ((beam, rounds) <- Seq((4, 2), (8, 3), (16, 4)))
      measure(s"hnsw-d12 b=$beam r=$rounds",
        n / 16 + beam.toLong * 12 * rounds,
        () => Similarity.hnswServeIndexed(topRL, graphsRL, emb,
          queries, "vec_id", "embedding", k = 5, beamWidth = beam,
          rounds = rounds, nLayers = 2, entryWidth = 2))
    // SQ8-coded walk (s38) on the same two graphs: integer scoring
    // budget equals the graph rows' (the walk shape is identical);
    // the exact-rerank tail adds candK float evals
    val gFlat = spark.read.parquet(s"$scratch/graphs")
      .filter(col("level") === 0).select(col("src"), col("dst"))
    val gFlatR = spark.read.parquet(s"$scratch/graphsR")
      .filter(col("level") === 0).select(col("src"), col("dst"))
    for ((label, g, deg) <- Seq(("sq8-d6", gFlat, 6),
        ("sq8-d12", gFlatR, 12)))
      measure(s"$label b=8 r=3 candK=10",
        8L * deg * 3 + 10,
        () => Similarity.nswBeamSq8TopK(emb, g, queries, "vec_id",
          "embedding", k = 5, beamWidth = 8, rounds = 3, candK = 10))
    lazy val trained = Similarity.kmeansCentroids(emb, "vec_id",
      "embedding", nCells = cells, iters = 2)
    for (np <- Seq(1, 2, 4))
      measure(s"ivf flat np=$np", cells + np.toLong * n / cells,
        () => Similarity.ivfTopKWithQueries(emb, trained, queries,
          "vec_id", "embedding", k = 5, nProbe = np))
    for (np <- Seq(1, 2, 4))
      measure(s"s16 rerank np=$np",
        cells + np.toLong * n / cells + 25,
        () => Similarity.ivfPqResidualRerankTopK(emb, queries,
          "vec_id", "embedding", topK = 5, shortK = 25,
          nCells = cells, ivfIters = 2, nProbe = np, m = 8, k = 8,
          dim = 64, pqIters = 2, seed = 777))
    for (np <- Seq(1, 2, 4))
      measure(s"s17 twolevel np=$np",
        8 + (cells / 8) + np.toLong * n / cells,
        () => Similarity.ivfTwoLevelTopK(emb, queries, "vec_id",
          "embedding", k = 5, nCells = cells, nGroups = 8, iters = 2,
          nProbe = np))
    spark.stop()
  }
}
