package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** The reference's dataflow operators re-expressed as composable
  * `DataFrame => DataFrame` builders (SURVEY.md §2.5/§2.6):
  * seeded shuffle (O1, reference `make_tf_record.py:155-156`), exact-count
  * train/validation split (O2, `make_tf_record.py:157-158`), epoch repeat
  * (B3, `dataset_queue.py:56`), fixed-size batching with short final batch
  * (B1, `dataset_queue.py:57` / `generator.py:44-51`), contiguous 5-way
  * sharding (K1, `make_tf_record.py:99-146`), and step-count arithmetic
  * (B6, `train.py:115-117`).
  *
  * Scale stance: the only inherently global operation here is "assign each
  * row its rank in a deterministic permutation". Two implementations are
  * provided — `globalRowNumber` (a window, single-partition shuffle; exact
  * SQL `row_number()` semantics, fine below ~10M rows) and
  * `scalableGlobalRowNumber` (range-repartition by the sort key +
  * per-partition zipWithIndex; no single-partition bottleneck, identical
  * output for unique keys — the 100 TB path). Everything downstream
  * (split/batch/shard ids) is embarrassingly parallel arithmetic on that
  * rank.
  */
object PipelineOps {

  /** Deterministic pseudo-shuffle rank 1..N ordered by md5(key, seed).
    * Unique tiebreak column REQUIRED for engine-identical output. */
  def globalRowNumber(key: Column, seed: Int): Column =
    row_number().over(
      Window.orderBy(Tables.shuffleKey(key, seed), key)).cast("long")

  /** Adds `out` = rank in the md5(key, seed) permutation via a window
    * (exact `row_number()` semantics — the oracle-checked path). */
  def withShuffleRank(df: DataFrame, key: Column, seed: Int,
      out: String = "rn"): DataFrame =
    df.withColumn(out, globalRowNumber(key, seed))

  /** Global top-k with a dense 1..k rank column, WITHOUT an
    * empty-partition window: `orderBy(sort).limit(k)` plans as
    * TakeOrderedAndProject (per-partition top-k heaps, driver merge —
    * the scalable shape for bounded k), then the rank is assigned by
    * position over the k surviving rows. Replaces the
    * `row_number().over(Window.orderBy(...))` idiom everywhere a rank
    * on a bounded result is needed: same values, same total order,
    * but no single-partition WindowExec and no "No Partition Defined"
    * WARN drowning real signals in the logs. `sort` must be a total
    * order (include a unique tiebreak) or ranks are ill-defined. */
  def rankedTopK(df: DataFrame, sort: Seq[Column], k: Int,
      rankOut: String = "rank"): DataFrame =
    df.orderBy(sort: _*).limit(k)
      .coalesce(1).sortWithinPartitions(sort: _*)
      .withColumn(rankOut,
        (monotonically_increasing_id() + 1).cast("long"))

  /** Scalable twin of [[withShuffleRank]]: range-repartition on the
    * shuffle key, sort within partitions, then assign global indices with
    * one extra count job (RDD zipWithIndex). Output is identical to the
    * window version when (shuffleKey, key) is unique — property-tested in
    * PipelineOpsSpec. This is the implementation that survives 100 TB:
    * every partition stays bounded and no executor sees the full dataset.
    */
  def withScalableShuffleRank(df: DataFrame, key: Column, seed: Int,
      out: String = "rn"): DataFrame =
    withScalableShuffleRankAndCount(df, key, seed, out)._1

  /** [[withScalableShuffleRank]] plus the exact row count, exposed for
    * free: assigning global indices needs per-partition counts anyway
    * (zipWithIndex semantics, hand-rolled here), so their sum comes out
    * of the same job — callers that need N (ntile arithmetic, step
    * counts) get it without a second scan or a single-partition
    * count aggregate. The count job materializes the range shuffle;
    * the indexing pass reuses the shuffle files. */
  def withScalableShuffleRankAndCount(df: DataFrame, key: Column, seed: Int,
      out: String = "rn"): (DataFrame, Long) = {
    val skCol = "__graft_sk"
    val keyed = df.withColumn(skCol, Tables.shuffleKey(key, seed))
    val (ranked, total) =
      withGlobalSortRankAndCount(keyed, Seq(col(skCol), key), out)
    (ranked.drop(skCol), total)
  }

  /** Global rank 1..N in the total order given by `sortCols` (callers
    * MUST include a tiebreak making the order total, or ranks are
    * partition-dependent), plus the exact row count — the same
    * range-repartition + per-partition zipWithIndex machinery as the
    * seeded-shuffle rank, exposed for SORTED layouts (range-clustered
    * sharding) where the order is a real key, not a permutation.
    * RangePartitioner samples, so partition BOUNDS vary run to run —
    * but the ranks are a pure function of the total order and never
    * vary. */
  def withGlobalSortRankAndCount(df: DataFrame, sortCols: Seq[Column],
      out: String = "rn"): (DataFrame, Long) = {
    val parts = math.max(df.sparkSession.sessionState.conf.numShufflePartitions, 1)
    val sorted = df
      .repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = sorted.schema.add(out, LongType, nullable = false)
    val rdd = sorted.rdd
    val counts = rdd
      .mapPartitionsWithIndex((pid, it) => Iterator(pid -> it.size.toLong))
      .collect().toMap
    val offsets = new Array[Long](counts.size + 1)
    for (pid <- 0 until counts.size)
      offsets(pid + 1) = offsets(pid) + counts.getOrElse(pid, 0L)
    val total = offsets(counts.size)
    val rowRdd = rdd.mapPartitionsWithIndex { (pid, it) =>
      var i = offsets(pid)
      it.map { r => i += 1; Row.fromSeq(r.toSeq :+ i) }
    }
    (df.sparkSession.createDataFrame(rowRdd, schema), total)
  }

  /** Exact-count split (O2): first `valCount` rows of the seeded
    * permutation are "validation", the rest "train" — mirrors the
    * reference's prefix slice after `random.seed(0); random.shuffle`.
    * (`randomSplit` is only approximate; never oracle-safe.)
    * Rides [[withScalableShuffleRank]] — no single-partition window, so
    * the same code path survives a 1000-executor 100 TB run. */
  def withSplit(df: DataFrame, key: Column, seed: Int, valCount: Long,
      rankCol: String = "rn", splitCol: String = "split"): DataFrame =
    withScalableShuffleRank(df, key, seed, rankCol)
      .withColumn(splitCol,
        when(col(rankCol) <= valCount, lit("validation")).otherwise(lit("train")))

  /** Exact stratified top-k sample: the k rows with the smallest
    * md5(key, seed) hash WITHIN EACH STRATUM — deterministic,
    * reproducible sampling for training-data curation (per-language /
    * per-source quotas). Two-phase so no reducer ever sees a whole
    * stratum (a per-stratum window would put each language's full
    * corpus through one task at 100 TB):
    *
    *   1. local: rank within (stratum, salt) — `salts`× parallelism per
    *      stratum — and keep each bucket's top k. The global per-stratum
    *      top-k is a subset of the union of per-salt top-ks (each global
    *      winner is ≤ k-th in its own bucket), so this loses nothing.
    *   2. global: exact rank over the ≤ salts·k survivors per stratum —
    *      bounded input, safe window.
    *
    * Appends `rankOut` (1..k within stratum). Output is EXACTLY the
    * rows a single per-stratum window would pick — property-tested. */
  def stratifiedTopK(df: DataFrame, stratum: Column, key: Column, k: Int,
      seed: Int, salts: Int = 32, rankOut: String = "sample_rank")
      : DataFrame = {
    require(k > 0 && salts > 0, s"k=$k salts=$salts must be positive")
    val h = "__graft_h"
    val salt = "__graft_salt"
    val local = "__graft_r1"
    val salted = df
      .withColumn(h, Tables.shuffleKey(key, seed))
      .withColumn(salt, pmod(Tables.hashU32(key, seed + 1), lit(salts.toLong)))
    val w1 = Window.partitionBy(stratum, col(salt))
      .orderBy(col(h), key)
    val w2 = Window.partitionBy(stratum).orderBy(col(h), key)
    salted
      .withColumn(local, row_number().over(w1))
      .filter(col(local) <= k)
      .withColumn(rankOut, row_number().over(w2).cast("long"))
      .filter(col(rankOut) <= k)
      .drop(h, salt, local)
  }

  /** Epoch repeat (B3): cross join against `spark.range(epochs)`, which
    * also materializes the per-epoch grouping column the consumer-side
    * metrics need (A4). Broadcast the tiny epoch side explicitly. */
  def withEpochs(df: DataFrame, epochs: Int,
      epochCol: String = "epoch"): DataFrame = {
    val spark = df.sparkSession
    val e = spark.range(epochs).toDF(epochCol)
    df.crossJoin(broadcast(e))
  }

  /** Fixed-size batching (B1): batch id = floor((rank-1)/B) within each
    * epoch; the final short batch falls out naturally
    * (`allow_smaller_final_batch=True`, reference `data_queue.py:60`). */
  def withBatchId(df: DataFrame, rankCol: String, batchSize: Int,
      out: String = "bid"): DataFrame =
    df.withColumn(out, floor((col(rankCol) - 1) / batchSize).cast("long"))

  /** Contiguous K-way sharding (K1): the reference writes shard i as the
    * contiguous slice [i*ceil(N/K), (i+1)*ceil(N/K)) of the shuffled list
    * (`make_tf_record.py:120-128`); SQL `ntile(K)` over the permutation
    * gives the same "contiguous, balanced" semantics. Implemented as
    * ARITHMETIC on the scalable shuffle rank — bit-identical to
    * `ntile(K)` (first N%K tiles get one extra row) but with no
    * single-partition window: the only global state is the row count,
    * cross-joined in as a broadcast scalar, so the plan stays fully
    * distributed at 100 TB. */
  def withShardId(df: DataFrame, key: Column, seed: Int, shards: Int,
      out: String = "shard"): DataFrame = {
    val rnCol = "__graft_shard_rn"
    val (ranked, n) =
      withScalableShuffleRankAndCount(df, key, seed, rnCol)
    val rn = col(rnCol)
    val base = n / shards                 // small-tile size
    val rem = n % shards                  // number of (base+1)-sized tiles
    val tile =
      if (base == 0L) rn                  // fewer rows than shards
      else when(rn <= rem * (base + 1),
          floor((rn - 1) / (base + 1)) + 1)
        .otherwise(lit(rem) + floor((rn - rem * (base + 1) - 1) / base) + 1)
    ranked.withColumn(out, tile.cast("long")).drop(rnCol)
  }

  /** Sharded write (K1/K3): one parquet part-file per shard via
    * repartitionByRange on the shard id, split name kept as a partition
    * directory (gives partition pruning on read — the reference's
    * "read only that split's shards" by file naming, §4). */
  def writeSharded(df: DataFrame, shardCol: String, splitCol: String,
      outDir: String): Unit =
    df.repartitionByRange(col(splitCol), col(shardCol))
      .write.mode("overwrite").partitionBy(splitCol).parquet(outDir)

  /** Compaction outcome: input fragment count, files actually
    * written, and the size-derived count the rewrite aimed for.
    * `targetFiles` may legitimately EXCEED `inFiles` once the inputs
    * total more than inFiles × targetBytes — compaction then re-sizes
    * rather than shrinks, so callers must assert
    * `outFiles <= max(inFiles, targetFiles)`, not strict shrink. */
  final case class CompactStats(inFiles: Int, outFiles: Int,
      targetFiles: Int, inBytes: Long)

  /** Small-files compaction — the standing maintenance job of any
    * 100 TB lake (streaming ingests and per-task writes strew tiny
    * files; every later scan pays per-file open/footer cost). Sizes
    * the output file count from the measured input bytes / the target
    * file size (never from the partition count that caused the
    * problem), round-robin repartitions to exactly that many writers,
    * and rewrites. Content is untouched — callers verify via the same
    * aggregate oracle as any round trip. */
  def compact(spark: org.apache.spark.sql.SparkSession, inDir: String,
      outDir: String, targetBytes: Long = 128L << 20): CompactStats = {
    val (nIn, nBytes) = countParquet(spark, inDir)
    val nOut = math.max(1L,
      (nBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir).repartition(nOut)
      .write.mode("overwrite").parquet(outDir)
    val (written, _) = countParquet(spark, outDir)
    CompactStats(nIn.toInt, written.toInt, nOut, nBytes)
  }

  /** Distributed recursive parquet census: (fileCount, totalBytes).
    * The driver lists only the DIRECT children of `dir`; each
    * subdirectory's recursive walk (the Hadoop paginated
    * remote-iterator, never a bulk listStatus) runs as an executor
    * task and returns just its (count, bytes) pair. At lake scale —
    * millions of files under thousands of partition dirs — listing
    * throughput scales with the cluster and nothing per-file ever
    * reaches the driver. */
  def countParquet(spark: org.apache.spark.sql.SparkSession,
      dir: String): (Long, Long) = {
    val hconf = new org.apache.spark.SerializableWritable(
      spark.sessionState.newHadoopConf())
    def walk(p: org.apache.hadoop.fs.Path,
        conf: org.apache.hadoop.conf.Configuration): (Long, Long) = {
      val it = p.getFileSystem(conf).listFiles(p, true)
      var n = 0L; var b = 0L
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet")) { n += 1; b += st.getLen }
      }
      (n, b)
    }
    val root = new org.apache.hadoop.fs.Path(dir)
    val top = root.getFileSystem(hconf.value).listStatus(root)
    val (dirs, files) = top.partition(_.isDirectory)
    val direct = files.filter(_.getPath.getName.endsWith(".parquet"))
    val fromDirs: (Long, Long) =
      if (dirs.isEmpty) (0L, 0L)
      else spark.sparkContext
        .parallelize(dirs.map(_.getPath.toString).toSeq,
          math.min(dirs.length, 64))
        .map(d => walk(new org.apache.hadoop.fs.Path(d), hconf.value))
        .fold((0L, 0L)) { case ((n1, b1), (n2, b2)) => (n1 + n2, b1 + b2) }
    (fromDirs._1 + direct.length, fromDirs._2 + direct.map(_.getLen).sum)
  }

  /** Bucketed write: hash-bucket a table by its join key so later
    * equi-joins between co-bucketed tables skip the shuffle entirely
    * (both sides arrive pre-partitioned; Spark plans SortMergeJoin with
    * no Exchange). At 100 TB this converts every recurring fact-to-fact
    * join on the bucket key from a full shuffle into a local merge —
    * the single biggest amortized saving for repeated pipelines.
    * Requires a catalog table (bucket metadata lives in the catalog). */
  def writeBucketed(df: DataFrame, bucketCol: String, buckets: Int,
      table: String, path: String): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Shuffle-buffer emulation (O3, the reference's `shuffle_batch`
    * bounded-buffer semantics, `data_queue.py:57-60`): per partition,
    * fill a ring buffer of `capacity`; once `minAfterDequeue` elements
    * are buffered, emit a uniformly drawn slot per incoming element;
    * drain the remainder at end — `allow_smaller_final_batch` semantics
    * fall out of the drain. A seeded per-partition RNG keeps it
    * deterministic for a fixed partitioning (document: the reference's
    * version is nondeterministic across thread schedules; ours is
    * stronger). The full `orderBy(shuffleKey)` operators elsewhere give
    * a *stronger* uniform shuffle — this exists for semantic parity and
    * for streaming-ish bounded-memory shuffling at scale. */
  def bufferShuffle(df: DataFrame, capacity: Int, minAfterDequeue: Int,
      seed: Long): DataFrame = {
    require(capacity > minAfterDequeue && minAfterDequeue >= 0)
    val schema = df.schema
    val shuffled = df.rdd.mapPartitionsWithIndex { (pid, it) =>
      val rng = new java.util.Random(seed * 1000003L + pid)
      val buf = new scala.collection.mutable.ArrayBuffer[Row](capacity)
      new Iterator[Row] {
        private def fill(): Unit =
          while (buf.length < capacity && it.hasNext) buf += it.next()
        override def hasNext: Boolean = { fill(); buf.nonEmpty }
        override def next(): Row = {
          fill()
          val idx = rng.nextInt(buf.length)
          val out = buf(idx)
          buf(idx) = buf.last
          buf.trimEnd(1)
          out
        }
      }
    }
    df.sparkSession.createDataFrame(shuffled, schema)
  }

  /** Step-count arithmetic (B6, `train.py:115-117`). */
  def trainSteps(n: Long, epochs: Int, batch: Int): Long =
    (n * epochs + batch - 1) / batch
  def epochSteps(n: Long, batch: Int): Long = (n + batch - 1) / batch
}
