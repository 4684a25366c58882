package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table (TESTDATA.md):
  * time-bucketed aggregation and gap-based sessionization. These are the
  * batch twins of the streaming slice (graft.streaming.EventStream) —
  * same semantics, one bounded and oracle-checked, one incremental.
  *
  * Time discipline for the oracle: timestamps are compared as
  * microsecond epochs (`unix_micros` ≡ DuckDB `epoch_us`) and emitted as
  * formatted strings, never as raw timestamp columns — sidesteps
  * ns-vs-µs and tz-representation mismatches between engines.
  */
object Events {

  /** Hourly (or any date_trunc unit) counts + value sums per event type. */
  def bucketCounts(events: DataFrame, unit: String): DataFrame =
    events
      .groupBy(date_format(date_trunc(unit, col("ts")),
        "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("value")), 4).as("sum_value"))

  /** Gap-based sessionization: a new session starts when the gap to the
    * user's previous event exceeds `gapSeconds`. Returns one row per
    * session: (user_id, session_id, n_events, duration_sec, ...).
    * Window ordering includes event_id as tiebreak so equal timestamps
    * order identically in both engines. */
  def sessionize(events: DataFrame, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val withGap = events
      .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
    val withSid = withGap.withColumn("session_id",
      sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
    withSid.groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        ((max(col("ts_us")) - min(col("ts_us"))) / 1000000L)
          .cast("double").as("duration_sec"),
        round(sum(col("value")), 4).as("sum_value"))
  }

  /** Top-k rows per group by a sortable measure (the generic window
    * top-k the reference lacks but any analytics surface needs). */
  def topKPerGroup(df: DataFrame, groupCols: Seq[Column], order: Seq[Column],
      k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols: _*).orderBy(order: _*)
    df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
