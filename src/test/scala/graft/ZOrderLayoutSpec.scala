package graft

import org.apache.spark.sql.functions._

import graft.functions.ZOrderExpr
import graft.operators.Layout

/** Z-order expression semantics (interpreted twin vs the codegen'd
  * query path) and the layout audit's pruning claim. */
class ZOrderLayoutSpec extends SparkSpec {
  GraftFunctions.register(spark)
  import spark.implicits._

  test("morton16 interleaves known values") {
    assert(ZOrderExpr.morton16(0L, 0L) == 0L)
    assert(ZOrderExpr.morton16(3L, 1L) == 7L)    // x->bits 0,2; y->bit 1
    assert(ZOrderExpr.morton16(0L, 3L) == 10L)   // y alone on odd bits
    assert(ZOrderExpr.morton16(0xFFFFL, 0xFFFFL) == 0xFFFFFFFFL)
    // high bits are masked off by contract
    assert(ZOrderExpr.morton16(0x1FFFFL, 0L) == ZOrderExpr.morton16(0xFFFFL, 0L))
    // z-order sorts by y-major blocks: same cell prefix stays adjacent
    assert(ZOrderExpr.morton16(2L, 2L) == 12L)
  }

  test("codegen query path equals the interpreted twin; null in, null out") {
    val df = spark.range(1000)
      .select(col("id").as("x"), (col("id") * 37L % 1024L).as("y"))
      .repartition(3)
    val viaSql = df.selectExpr("x", "y", "graft_zorder(x, y) AS z")
      .as[(Long, Long, Long)].collect()
    viaSql.foreach { case (x, y, z) =>
      assert(z == ZOrderExpr.morton16(x, y), s"mismatch at ($x,$y)")
    }
    val withNull = Seq((Some(1L), None: Option[Long])).toDF("x", "y")
      .selectExpr("graft_zorder(x, y) AS z")
    assert(withNull.filter(col("z").isNull).count() == 1)
  }

  test("zorderWrite produces files owning disjoint z ranges, losslessly") {
    val n = 5000
    val df = spark.range(n).select(
      (col("id") * 7919L % 2048L).as("x"),
      (col("id") * 104729L % 2048L).as("y"))
    val path = java.nio.file.Files
      .createTempDirectory("graft_zw").toString + "/t"
    Layout.zorderWrite(df, col("x"), col("y"), nFiles = 8, path)
    val back = spark.read.parquet(path)
    assert(back.count() == n)
    assert(back.select(sum(col("x")), sum(col("y"))).head() ==
      df.select(sum(col("x")), sum(col("y"))).head())
    // each written file must own a disjoint z range — the property
    // that makes file-level min/max stats prunable
    val ranges = back
      .groupBy(input_file_name().as("f"))
      .agg(min(col("zk")).as("lo"), max(col("zk")).as("hi"))
      .select(col("lo"), col("hi"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(ranges.length == 8)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"overlapping file z-ranges: $hi1 vs $lo2")
      case _ =>
    }
  }

  test("z-order prunes real parquet row groups: storage-level receipt") {
    // the relational audit's claim, measured against actual files: write
    // the SAME data under both layouts (8 files each, ~64 KB row groups
    // so stats granularity is sub-file), run the SAME y-constrained box
    // query, and compare how many rows the parquet scan DELIVERS — with
    // filter pushdown, rows from row groups whose min/max exclude the
    // box never surface, so the scan's numOutputRows IS the volume of
    // row groups actually read
    val n = 200000
    val df = spark.range(n).select(
      (col("id") * 7919L % 4096L).as("x"),
      (col("id") * 104729L % 4096L).as("y"))
    val dir = java.nio.file.Files.createTempDirectory("graft_zp").toString
    val rg = Map("parquet.block.size" -> "65536")
    Layout.zorderWrite(df, col("x"), col("y"), nFiles = 8, s"$dir/z", rg)
    // x-only twin: identical schema/files/row-group size, sorted by x
    df.withColumn("zk", Layout.zorderKey(col("x"), col("y")))
      .repartitionByRange(8, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").options(rg).parquet(s"$dir/x")
    def scanned(path: String): (Long, Long) = {
      val q = spark.read.parquet(path)
        .filter(col("x").between(0L, 4095L) && col("y").between(100L, 200L))
      val result = q.collect().length.toLong
      val scanRows = q.queryExecution.executedPlan.collect {
        case s if s.nodeName.toLowerCase.contains("scan") =>
          s.metrics.get("numOutputRows").map(_.value).getOrElse(0L)
      }.sum
      (result, scanRows)
    }
    val (zRes, zScan) = scanned(s"$dir/z")
    val (xRes, xScan) = scanned(s"$dir/x")
    assert(zRes == xRes, "both layouts must return identical results")
    // x-only stats cannot exclude any row group for a y-slice box
    assert(xScan >= n * 9L / 10L, s"x_only unexpectedly pruned: $xScan")
    // z-order must skip the strict majority of row-group volume
    assert(zScan * 2 < xScan,
      s"z-order read too much: z=$zScan vs x=$xScan of $n")
    info(s"scan numOutputRows: zorder=$zScan x_only=$xScan of $n total")
  }

  test("z-order layout prunes the box query harder than x-only") {
    // two independent uniform dims: under x-only bucketing every bucket
    // spans all of y, so a tight box on (x, y) touches ~ the x-selective
    // buckets only — but a y-only box would touch ALL of them; z-order
    // bounds both extents per bucket
    val n = 20000
    val df = spark.range(n).select(
      (col("id") * 7919L % 4096L).as("x"),
      (col("id") * 104729L % 4096L).as("y"))
    val stats = Layout.compareLayouts(df, col("x"), col("y"), buckets = 64,
      xLo = 0L, xHi = 4095L, yLo = 100L, yHi = 200L)
      .groupBy("layout").agg(
        sum(col("must_read")).as("read"),
        count(lit(1)).as("buckets"))
      .as[(String, Long, Long)].collect()
      .map { case (l, r, b) => l -> ((r, b)) }.toMap
    val zs = stats("zorder")
    val xs = stats("x_only")
    // x-only layout cannot prune a y-constrained box at all
    assert(xs._1 == xs._2, s"x_only should read every bucket: $xs")
    // z-order must prune a strict majority of buckets for a ~2.5% y-slice
    assert(zs._1.toDouble / zs._2 < 0.5, s"zorder read too much: $zs")
  }

  test("NDV-weighted interleave restores low-cardinality pruning") {
    // x: 4096 distinct values (12 bits); y: 5 distinct (3 bits). With
    // RAW uniform interleave y's high lane bits are constant zero, so
    // the key order collapses to x-only and a y-selective box prunes
    // nothing extra; NDV-aligned lanes give y its share of the key top
    val n = 20000
    val df = spark.range(n).select(
      (col("id") * 7919L % 4096L).as("x"),
      (col("id") * 104729L % 5L).as("y"))
    val stats = Layout.compareLayoutsNdv(df, col("x"), col("y"),
      buckets = 64, xLo = 0L, xHi = 4095L, yLo = 2L, yHi = 2L)
      .groupBy("layout").agg(
        sum(col("must_read")).as("read"),
        count(lit(1)).as("buckets"))
      .as[(String, Long, Long)].collect()
      .map { case (l, r, b) => l -> (r.toDouble / b) }.toMap
    // x-only reads everything (no y clustering at all); uniform's
    // low-lane y bits salvage a little; weighted must beat uniform by
    // at least 2x and read less than the y fraction suggests
    assert(stats("x_only") > 0.9, s"x_only should read ~all: $stats")
    assert(stats("weighted") * 2 < stats("uniform"),
      s"weighting should at least halve the read fraction: $stats")
    assert(stats("weighted") < 0.5, s"weighted should prune: $stats")
    // bit-width policy is the pure-integer form
    assert(Layout.bitsFor(1) == 1 && Layout.bitsFor(2) == 1 &&
      Layout.bitsFor(5) == 3 && Layout.bitsFor(4096) == 12 &&
      Layout.bitsFor(1L << 40) == 16)
  }

  test("rangeClusteredCommit: equal files, disjoint stats, sharp pruning") {
    import graft.sources.VersionedTable
    val dir = java.nio.file.Files.createTempDirectory("vclu").toString
    // 1000 rows, key k = id*7 mod 1000 (a permutation → distinct keys),
    // arriving in scrambled order across 8 partitions
    val df = spark.range(1000)
      .select(col("id"), (col("id") * 7L % 1000L).as("k"))
      .repartition(8)
    val (v, n) = Layout.rangeClusteredCommit(df, "k", "id",
      nShards = 10, dir = dir)
    assert(n == 1000L)
    // exactly 10 files, each holding exactly one shard of 100 rows
    val perFile = VersionedTable.readVersion(spark, dir, v)
      .groupBy(col("_metadata.file_path").as("f"))
      .agg(countDistinct(col("shard")).as("nsh"), count(lit(1)).as("cnt"),
        min(col("k")).as("mn"), max(col("k")).as("mx"))
      .collect()
    assert(perFile.length == 10)
    assert(perFile.forall(r => r.getLong(1) == 1L && r.getLong(2) == 100L))
    // distinct keys → strictly disjoint per-file ranges: shard s holds
    // exactly keys [100s, 100s+99]
    val ranges = perFile.map(r => (r.getLong(3), r.getLong(4))).sorted
    assert(ranges.toSeq ==
      (0 until 10).map(s => (100L * s, 100L * s + 99L)))
    // manifest pruning is sharp: a range inside one shard opens 1 file
    assert(VersionedTable.filesInRange(spark, dir, v, 250L, 260L)
      ._1.size == 1)
    assert(VersionedTable.readVersionWhere(spark, dir, v, 250L, 260L)
      .agg(sum(col("k"))).as[Long].head() == (250L to 260L).sum)
    // bit-reproducible: a second commit of the same data yields
    // identical per-file stats in the manifest
    val dir2 = java.nio.file.Files.createTempDirectory("vclu2").toString
    Layout.rangeClusteredCommit(df, "k", "id", nShards = 10, dir = dir2)
    def stats(d: String) = VersionedTable.readVersion(spark, d, 0)
      .groupBy(col("shard")).agg(min(col("k")), max(col("k")),
        sum(col("id"))).collect().map(_.toSeq).toSet
    assert(stats(dir) == stats(dir2))
  }

  test("rangeClusteredCommit: empty input rejected, nShards > n tolerated") {
    import graft.sources.VersionedTable
    // empty input: the shard rank expression would divide by n = 0 —
    // must fail loudly at the operator boundary, not NPE mid-shuffle
    val empty = spark.range(0)
      .select(col("id"), (col("id") * 7L).as("k"))
    val e = intercept[IllegalArgumentException] {
      Layout.rangeClusteredCommit(empty, "k", "id", nShards = 4,
        dir = java.nio.file.Files.createTempDirectory("vclu_e").toString)
    }
    assert(e.getMessage.contains("empty input"))
    // more shards than rows: shards 0..n-1 get one row each, the rest
    // stay empty — the table round-trips with all rows intact
    val dir = java.nio.file.Files.createTempDirectory("vclu_s").toString
    val tiny = spark.range(3).select(col("id"), (col("id") * 7L).as("k"))
    val (v, n) = Layout.rangeClusteredCommit(tiny, "k", "id",
      nShards = 8, dir = dir)
    assert(n == 3L)
    val back = VersionedTable.readVersion(spark, dir, v)
    assert(back.count() == 3L)
    assert(back.select("shard").distinct().count() == 3L)
  }
}
