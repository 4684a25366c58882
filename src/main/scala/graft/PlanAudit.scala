package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: print executed-plan summaries for selected queries to audit
  * pushdown / join strategies / codegen spans (the SURVEY §4 checklist),
  * plus per-query timing for quick iteration. Args: [sfDir] [names...] */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.installOptimizations(spark)
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, sfDir)
      val t0 = System.nanoTime()
      df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"===== $n%-22s $sec%7.2fs =====")
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // compact signal lines only
      plan.linesIterator
        .filter(l => l.contains("Scan parquet") || l.contains("PushedFilters")
          || l.contains("Join") || l.contains("Exchange")
          || l.contains("ReadSchema") || l.contains("WholeStageCodegen")
          || l.contains("InMemory") || l.contains("SinglePartition")
          || l.contains("Window") || l.contains("Sort ") || l.contains("TakeOrdered")
          || l.contains("PartitionFilters") || l.contains("partition count"))
        .take(40).foreach(l => println(l.take(200)))
      // the one plan shape that dies at 100 TB: a full-relation
      // single-partition exchange (scalar aggregates over already-tiny
      // inputs are fine — grep context to tell them apart)
      if (plan.contains("SinglePartition"))
        println(s"!! SINGLE_PARTITION_EXCHANGE in $n")
      InternalCaches.releaseAll()
    }
    spark.stop()
  }
}
