package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.functions._

import graft.functions.ZOrderExpr

/** Multi-dimensional data layout: Z-order clustering and its pruning
  * audit.
  *
  * The 100 TB story: file-level min/max statistics prune a scan only
  * when the written layout clusters the filtered dimensions. Ordering
  * by one column clusters that column alone — a box query on (x, y)
  * still reads every file for the y constraint. Interleaving the bits
  * of both dimensions ([[graft.functions.ZOrderExpr]]) and
  * range-splitting the interleaved key bounds BOTH per-file extents,
  * so the same stats prune on either dimension. `compareLayouts`
  * measures exactly that effect, relationally: bucket rows into
  * equal-width key ranges (the shape a range-partitioned write would
  * produce), compute per-bucket extents, and flag which buckets a
  * fixed box query would have to read under each layout.
  *
  * Everything is integer arithmetic over one aggregate + a broadcast
  * scalar extent — no global sort, no single-partition exchange — so
  * the audit itself scales like any groupBy.
  */
object Layout {

  /** Z-order key column: low 16 bits of x and y interleaved (codegen
    * Catalyst expression — see [[graft.functions.ZOrderExpr]]). */
  def zorderKey(x: Column, y: Column): Column =
    GraftSqlBridge.column(ZOrderExpr(
      GraftSqlBridge.expression(x.cast("long")),
      GraftSqlBridge.expression(y.cast("long"))))

  /** The write path the audit models: range-partition by the z key
    * into `nFiles` partitions and sort within each, so every written
    * file owns a DISJOINT z range — which is exactly what makes
    * file-level min/max statistics prune box queries on both
    * dimensions at read time. The cluster key is persisted (`zk`), the
    * production shape for re-clustering and range-pruned re-reads. */
  def zorderWrite(df: DataFrame, x: Column, y: Column, nFiles: Int,
      path: String, options: Map[String, String] = Map.empty): Unit =
    df.withColumn("zk", zorderKey(x, y))
      .repartitionByRange(nFiles, col("zk"))
      .sortWithinPartitions(col("zk"))
      .write.mode("overwrite").options(options).parquet(path)

  /** The audit proper: identical bucket stats for the z-order layout
    * and the x-only layout, one frame — the per-layout sum of
    * `must_read` is the number of buckets (≈ files) the box query
    * scans under each.
    *
    * One source scan total: the projected (x, y, zk) frame is persisted
    * (tracked — see [[graft.InternalCaches]]) and reused by the shared
    * 4-way extent aggregate and both layouts' bucket groupBys, instead
    * of re-scanning the source per layout per pass. */
  def compareLayouts(df: DataFrame, x: Column, y: Column, buckets: Int,
      xLo: Long, xHi: Long, yLo: Long, yHi: Long): DataFrame = {
    import graft.InternalCaches.TrackedPersist
    val keyed = df.select(x.cast("long").as("x"), y.cast("long").as("y"))
      .withColumn("zk", zorderKey(col("x"), col("y")))
      .persistTracked()
    val ext = keyed.agg(
      min(col("zk")).as("zmin"), max(col("zk")).as("zmax"),
      min(col("x")).as("xmin"), max(col("x")).as("xmax"))
    val withExt = keyed.crossJoin(broadcast(ext))
    def stats(layout: String, key: String, lo: String, hi: String) =
      withExt
        .withColumn("bucket", least(lit(buckets - 1L),
          expr(s"($key - $lo) * $buckets div ($hi - $lo + 1)")).cast("long"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("cnt"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"))
        .select(lit(layout).as("layout"), col("bucket"), col("cnt"),
          col("min_x"), col("max_x"), col("min_y"), col("max_y"),
          (col("min_x") <= xHi && col("max_x") >= xLo &&
            col("min_y") <= yHi && col("max_y") >= yLo)
            .cast("long").as("must_read"))
    stats("zorder", "zk", "zmin", "zmax")
      .unionByName(stats("x_only", "x", "xmin", "xmax"))
  }
}
