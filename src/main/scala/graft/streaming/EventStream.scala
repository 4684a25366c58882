package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming slice (SURVEY.md §7 M6): the reference's only
  * streaming-like traits are bounded epoch-limited queues, backpressure,
  * and end-of-stream signaling (§2.8) — their Spark-native analogue is a
  * file-source stream with a watermark and a tumbling event-time window.
  *
  * `windowedCounts` builds the streaming DataFrame (unbounded plan);
  * `runOnce` executes it with Trigger.AvailableNow against a memory sink
  * and returns the bounded result — deterministic, so the DuckDB oracle
  * can check it against the equivalent batch GROUP BY.
  */
object EventStream {

  /** Tumbling-window counts per event_type with a watermark. */
  def windowedCounts(stream: DataFrame, windowDur: String,
      watermarkDelay: String): DataFrame =
    stream
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** Read `events.parquet`-shaped data as a file stream. The schema is
    * taken from a batch peek (file streams require an explicit schema);
    * maxFilesPerTrigger bounds each micro-batch — the C3 backpressure
    * analogue. ns-timestamps ride the same nanosAsLong + truncate path
    * as Tables.events. */
  /** The file-stream source wants a directory; when given a bare
    * `.parquet` file, stage it into a temp dir via symlink. */
  private def asStreamDir(path: String): String = {
    val f = new java.io.File(path)
    if (f.isDirectory) path
    else {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_stream_").toFile
      tmp.deleteOnExit()
      java.nio.file.Files.createSymbolicLink(
        new java.io.File(tmp, f.getName).toPath, f.toPath.toAbsolutePath)
      tmp.getAbsolutePath
    }
  }

  def eventsFileStream(spark: SparkSession, fileOrDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = asStreamDir(fileOrDir)
    val schema = spark.read.parquet(dir).schema
    val raw = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }

  /** Run a streaming DataFrame to completion (AvailableNow ≈ the
    * reference's bounded, epoch-limited queue that closes and signals
    * OutOfRange — B5) into a memory sink; return the bounded result. */
  def runOnce(streamed: DataFrame, queryName: String): DataFrame = {
    val spark = streamed.sparkSession
    val q = streamed.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
