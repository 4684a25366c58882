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

  /** Smallest bit width that distinguishes `ndv` values (2^b ≥ ndv),
    * capped at the 16-bit interleave lane. Pure integer arithmetic —
    * the DuckDB twin is `list_min(list_filter(range(1,17),
    * b -> (1<<b) >= ndv))`, no float log2 anywhere. */
  def bitsFor(ndv: Long): Int = {
    var b = 1
    while (b < 16 && (1L << b) < ndv) b += 1
    b
  }

  /** NDV-weighted z-order key: each dimension is already quantized to
    * its cardinality-derived width (`bitsFor`); LEFT-ALIGN each lane
    * to the top of the 16-bit field before the standard Morton
    * interleave. Why it matters: interleaving RAW values gives a
    * low-cardinality dimension dead (constant-zero) high bits, so the
    * key order degrades to x-only and y-pruning evaporates; aligning
    * lanes puts both dimensions' INFORMATION bits at the top of the
    * key in proportion to their cardinality — at identical key bytes.
    * This is composition, not a new kernel: two shifts feeding the
    * existing codegen'd [[graft.functions.ZOrderExpr]]. */
  def weightedZorderKey(xq: Column, yq: Column, bx: Int, by: Int)
      : Column = {
    require(bx >= 1 && bx <= 16 && by >= 1 && by <= 16,
      s"lane widths out of range: bx=$bx by=$by")
    zorderKey(shiftleft(xq.cast("long"), 16 - bx),
      shiftleft(yq.cast("long"), 16 - by))
  }

  /** The NDV-weighted layout audit (q71): same bucket-extent method
    * as [[compareLayouts]], three layouts over the SAME quantized
    * inputs — `weighted` (NDV-aligned lanes), `uniform` (plain
    * interleave of the quantized values), `x_only` — so the only
    * variable is where each dimension's bits land in the key.
    *
    * The layout DECISION (NDVs, extents → bit widths) comes from one
    * bounded stats probe — exactly what a production OPTIMIZE job
    * reads from table metadata before rewriting; the audit itself
    * stays one aggregate per layout over one persisted projection. */
  def compareLayoutsNdv(df: DataFrame, x: Column, y: Column,
      buckets: Int, xLo: Long, xHi: Long, yLo: Long, yHi: Long)
      : DataFrame = {
    import graft.InternalCaches.TrackedPersist
    val base = df.select(x.cast("long").as("x"), y.cast("long").as("y"))
      .persistTracked()
    val st = base.agg(
      countDistinct(col("x")), countDistinct(col("y")),
      min(col("x")), max(col("x")), min(col("y")), max(col("y"))).head()
    val (ndvX, ndvY) = (st.getLong(0), st.getLong(1))
    val (xMin, xMax) = (st.getLong(2), st.getLong(3))
    val (yMin, yMax) = (st.getLong(4), st.getLong(5))
    val bx = bitsFor(ndvX); val by = bitsFor(ndvY)
    val qx = expr(
      s"(x - $xMin) * ${1L << bx} div (${xMax - xMin} + 1)")
    val qy = expr(
      s"(y - $yMin) * ${1L << by} div (${yMax - yMin} + 1)")
    val keyed = base
      .withColumn("wk", weightedZorderKey(qx, qy, bx, by))
      .withColumn("uk", zorderKey(qx, qy))
      .persistTracked()
    val ext = keyed.agg(
      min(col("wk")).as("wmin"), max(col("wk")).as("wmax"),
      min(col("uk")).as("umin"), max(col("uk")).as("umax"),
      min(col("x")).as("xmin"), max(col("x")).as("xmax"))
    val withExt = keyed.crossJoin(broadcast(ext))
    def stats(layout: String, key: String, lo: String, hi: String) =
      withExt
        .withColumn("bucket", least(lit(buckets - 1L),
          expr(s"($key - $lo) * $buckets div ($hi - $lo + 1)"))
          .cast("long"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("cnt"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"))
        .select(lit(layout).as("layout"), col("bucket"), col("cnt"),
          col("min_x"), col("max_x"), col("min_y"), col("max_y"),
          (col("min_x") <= xHi && col("max_x") >= xLo &&
            col("min_y") <= yHi && col("max_y") >= yLo)
            .cast("long").as("must_read"))
    stats("weighted", "wk", "wmin", "wmax")
      .unionByName(stats("uniform", "uk", "umin", "umax"))
      .unionByName(stats("x_only", "x", "xmin", "xmax"))
  }

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

  /** DETERMINISTIC range-clustered commit: the write-side producer of
    * the layout [[graft.sources.VersionedTable.readVersionWhere]]'s
    * data skipping is sharp on. `repartitionByRange` alone decides
    * file boundaries by SAMPLING — file contents (and so manifest
    * stats) vary run to run. Here shard assignment is exact
    * arithmetic on the global sort rank (`shard = (rn−1)·S div N` —
    * every shard within one row of N/S, boundaries a pure function
    * of the data), and rows reach their shard's file through an
    * exact integer partitioner, so the committed layout is
    * bit-reproducible: equal-size files, non-overlapping [min,max]
    * key ranges (adjacent files can share at most the boundary key
    * value when `keyCol` has duplicates — `tieCol` makes the SORT
    * total but cannot split a key value's stats), manifest stats on
    * `keyCol`. Returns (version, N). Scale: one range shuffle + one
    * shuffle to the exact partitioner — the same two passes any
    * global sort pays; no single-partition stage anywhere. */
  def rangeClusteredCommit(df: DataFrame, keyCol: String, tieCol: String,
      nShards: Int, dir: String): (Int, Long) = {
    require(nShards > 0, s"nShards=$nShards")
    val spark = df.sparkSession
    val (ranked, n) = PipelineOps.withGlobalSortRankAndCount(
      df, Seq(col(keyCol), col(tieCol)), "__graft_rn")
    // n = 0 would make the shard expression a div-by-zero (null shard →
    // NPE inside the exact partitioner); there is no meaningful "commit
    // an empty clustered layout", so fail loudly. When nShards > n the
    // arithmetic is still well-defined: shards 0..n-1 get exactly one
    // row each and the higher shards are empty partitions, so the
    // committed table simply has n single-row files.
    require(n > 0, s"rangeClusteredCommit on an empty input (keyCol=$keyCol)")
    // the shard id stays a real column of the committed table — shard
    // membership is part of the layout contract and lets any reader
    // audit it without re-deriving ranks
    val sharded = ranked
      .withColumn("shard", expr(s"((__graft_rn - 1) * $nShards) div $n"))
      .drop("__graft_rn")
    val schema = sharded.schema
    val shardIdx = schema.fieldIndex("shard")
    val exact = new org.apache.spark.Partitioner {
      override def numPartitions: Int = nShards
      override def getPartition(key: Any): Int =
        key.asInstanceOf[Long].toInt
    }
    val rdd = sharded.rdd
      .map(r => (r.getLong(shardIdx), r))
      .partitionBy(exact)
      .map(_._2)
    // per-partition sort is a narrow op: file↔shard mapping survives
    val clustered = spark.createDataFrame(rdd, schema)
      .sortWithinPartitions(col(keyCol), col(tieCol))
    (graft.sources.VersionedTable.commit(clustered, dir, keyCol), n)
  }
}
