package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: write the FULL `.explain("formatted")` output of selected
  * queries to files — the before/after plan evidence the optimization
  * rounds commit under `plans/rNN/`.
  *
  * Args: <outDir> <suffix> [names...]  (names default: all queries)
  * Each query's plan lands at `<outDir>/<name>_<suffix>.txt`.
  *
  * The plan is captured AFTER one executed run (count()), so AQE's
  * final plan is what lands in the file (`explain` before execution
  * only shows `isFinalPlan=false`); the initial plan is appended too
  * so exchange placement pre-AQE stays visible.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("SPARK_GRAFT_OPEN_COST", "262144"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.installOptimizations(spark)
    new java.io.File(outDir).mkdirs()
    for (n <- names) {
      try {
        spark.sparkContext.setJobDescription(s"plandump: $n")
        val df = SparkEntry.queries(n)(spark, sfDir)
        val t0 = System.nanoTime()
        df.count()
        val sec = (System.nanoTime() - t0) / 1e9
        val fin = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val w = new java.io.PrintWriter(s"$outDir/${n}_$suffix.txt")
        try {
          w.println(f"== $n @ $sfDir cpus=$cpus  executed in $sec%.2f s ==")
          w.println(fin)
        } finally w.close()
        println(f"[plandump] $n $sec%.2f -> $outDir/${n}_$suffix.txt")
      } catch { case e: Throwable =>
        println(s"[plandump] $n FAILED: ${e.getMessage}")
      } finally InternalCaches.releaseAll()
    }
    spark.stop()
  }
}
