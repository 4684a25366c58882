package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Pca, Similarity}

/** Compression-shortlist frontier: the three cheap-first-stage
  * families — PCA projection (s50, learned rotation), matryoshka
  * prefix (s15, truncation), sign-Hamming bits (s14, 1-bit) — swept
  * over (compression level × candK) with the SAME full-width re-rank
  * to top-5, measuring recall@5 against exact brute force and wall
  * seconds. The receipt that justifies the shipped defaults: how many
  * shortlist candidates each representation needs to buy back the
  * exact ranking, and what the scan pays for them.
  *
  * Usage: runMain graft.TuneCompression [sfDir]
  */
object TuneCompression {
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

    val embRaw = Tables.embeddings(spark, dir)

    // correlated regime: a dense rank-4 signal SPREAD ACROSS ALL 64
    // dims (md5-derived per-doc coefficients z_k against fixed ±1
    // patterns) plus the original vector as noise — the regime real
    // embedding models live in (information concentrated in a few
    // directions, none of them axis-aligned). A prefix slice sees the
    // patterns at 8/64 of their length (weak per-dim SNR); a learned
    // rotation integrates all 64 dims and captures the signal
    // directions exactly — the case where PCA earns its training pass.
    def correlated(emb: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame = emb
      .withColumn("z", expr(
        "transform(sequence(0, 3), k -> " +
          "cast(conv(substring(md5(concat(cast(vec_id as string), " +
          "'#z', cast(k as string))), 1, 8), 16, 10) as double) " +
          "/ 4294967296.0 - 0.5)"))
      .withColumn("embedding", expr(
        "transform(embedding, (x, j) -> cast(" +
          "0.25 * (z[0] * (cast(conv(substring(md5(concat('p0#', " +
          "cast(j as string))), 1, 8), 16, 10) as bigint) % 2 * 2 - 1) " +
          "+ z[1] * (cast(conv(substring(md5(concat('p1#', " +
          "cast(j as string))), 1, 8), 16, 10) as bigint) % 2 * 2 - 1) " +
          "+ z[2] * (cast(conv(substring(md5(concat('p2#', " +
          "cast(j as string))), 1, 8), 16, 10) as bigint) % 2 * 2 - 1) " +
          "+ z[3] * (cast(conv(substring(md5(concat('p3#', " +
          "cast(j as string))), 1, 8), 16, 10) as bigint) % 2 * 2 - 1))" +
          " + 0.75 * x as float))"))
      .drop("z")

    def sweep(regime: String,
        emb0: org.apache.spark.sql.DataFrame): Unit = {
      val emb = emb0.persist()
      val n = emb.count()
      val queries = emb.filter(col("vec_id") % 25 === 0).persist()
      val nQ = queries.count()
      println(s"[$regime] n=$n queries=$nQ dir=$dir")
      val exact = Similarity.bruteForceTopK(emb, queries, "vec_id",
          "embedding", 5)
        .select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet

      def row(variant: String, level: String, candK: Int)(
          f: => org.apache.spark.sql.DataFrame): Unit = {
        val t0 = System.nanoTime()
        val got = f.select("query_id", "neighbor_id")
          .as[(Long, Long)].collect().toSet
        val sec = (System.nanoTime() - t0) / 1e9
        val recall = got.intersect(exact).size.toDouble / exact.size
        println(
          f"| $regime | $variant | $level | $candK | $recall%.3f " +
            f"| $sec%.2f |")
        InternalCaches.releaseAll()
        emb.persist(); queries.persist()
      }

      println(
        "| regime | variant | level | candK | recall@5 | sec |")
      println("|---|---|---|---|---|---|")
      for (candK <- Seq(20, 50, 100)) {
        for (nc <- Seq(2, 4, 8))
          row("pca", s"$nc comps", candK) {
            Pca.pcaRerankTopK(emb, queries, "vec_id", "embedding",
              dim = 64, nComp = nc, iters = 6, candK = candK, k = 5)
          }
        for (pd <- Seq(8, 16))
          row("matryoshka", s"$pd dims", candK) {
            Similarity.prefixRerankTopK(emb, queries, "vec_id",
              "embedding", pdim = pd, candK = candK, k = 5)
          }
        row("sign", "64 bits", candK) {
          Similarity.signHammingRerankTopK(emb, queries, "vec_id",
            "embedding", dim = 64, candK = candK, k = 5)
        }
      }
      emb.unpersist(); queries.unpersist()
    }

    sweep("adversarial", embRaw)
    sweep("correlated", correlated(embRaw))
    spark.stop()
  }
}
