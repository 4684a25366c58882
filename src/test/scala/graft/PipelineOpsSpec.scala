package graft

import org.apache.spark.sql.functions._

import graft.operators.PipelineOps

/** O1/O2/B1/B3/B6/K1 semantics (SURVEY §2.5–§2.6): split exactness,
  * scalable-rank equivalence, batch arithmetic incl. the short final
  * batch, shard balance, step counts. Property cases swept over a fixed
  * grid (the edge cases FIXTURES.md §3 calls out: N % B ≠ 0, N < B,
  * B = 1, multi-epoch). */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  private def range(n: Int) = spark.range(n).toDF("id")

  test("withSplit produces an exact-count, disjoint, exhaustive split") {
    val df = PipelineOps.withSplit(range(3670), col("id"), 42, 350L)
    val counts = df.groupBy("split").count().as[(String, Long)]
      .collect().toMap
    assert(counts == Map("validation" -> 350L, "train" -> 3320L))
    // rank is a permutation of 1..N
    val ranks = df.select("rn").as[Long].collect().sorted
    assert(ranks.toSeq == (1L to 3670L))
  }

  test("scalable rank matches the window row_number exactly") {
    val w = PipelineOps.withShuffleRank(range(5000), col("id"), 7)
      .select("id", "rn").as[(Long, Long)].collect().toMap
    val s = PipelineOps.withScalableShuffleRank(range(5000), col("id"), 7)
      .select("id", "rn").as[(Long, Long)].collect().toMap
    assert(w == s)
  }

  test("batching: all batches size B except a short final batch per epoch") {
    for ((n, b, e) <- Seq((17, 16, 2), (350, 16, 1), (16, 16, 2),
        (5, 16, 1), (100, 1, 2), (33, 8, 3))) {
      val ranked = PipelineOps.withShuffleRank(range(n), col("id"), 1)
      val batched = PipelineOps.withBatchId(
        PipelineOps.withEpochs(ranked, e), "rn", b)
      val sizes = batched.groupBy("epoch", "bid").count()
        .select("count").as[Long].collect()
      assert(sizes.sum == n.toLong * e, s"n=$n b=$b e=$e")  // nothing lost
      val perEpoch = batched.groupBy("epoch", "bid").count()
        .groupBy("epoch").agg(
          sum(when(col("count") =!= b, 1).otherwise(0)).as("short"))
        .select("short").as[Long].collect()
      // ≤ 1 short batch per epoch (0 when B divides N)
      assert(perEpoch.forall(_ <= (if (n % b == 0) 0 else 1)),
        s"n=$n b=$b e=$e")
    }
  }

  test("shard ids are contiguous slices of the permutation, balanced ±1") {
    val df = PipelineOps.withShardId(range(103), col("id"), 42, 5)
    val cnts = df.groupBy("shard").count().select("count").as[Long].collect()
    assert(cnts.sum == 103 && cnts.max - cnts.min <= 1)
    // contiguity: shard boundaries respect the shuffle order
    val ranked = PipelineOps.withShuffleRank(range(103), col("id"), 42)
    val joined = df.join(ranked, "id")
    val rangesOk = joined.groupBy("shard")
      .agg(min("rn").as("lo"), max("rn").as("hi"), count(lit(1)).as("c"))
      .filter(col("hi") - col("lo") + 1 =!= col("c")).count()
    assert(rangesOk == 0)
  }

  test("arithmetic shard id matches window ntile(K) exactly") {
    import org.apache.spark.sql.expressions.Window
    for ((n, k) <- Seq((103, 5), (100, 5), (3, 5), (3670, 5), (17, 4))) {
      val arith = PipelineOps.withShardId(range(n), col("id"), 42, k)
        .select("id", "shard").as[(Long, Long)].collect().toMap
      val win = range(n).withColumn("shard",
          ntile(k).over(Window.orderBy(
            Tables.shuffleKey(col("id"), 42), col("id"))).cast("long"))
        .select("id", "shard").as[(Long, Long)].collect().toMap
      assert(arith == win, s"n=$n k=$k")
    }
  }

  test("step counts match ceil arithmetic (train.py:115-117 semantics)") {
    assert(PipelineOps.trainSteps(3320, 2, 16) == 415)
    assert(PipelineOps.epochSteps(350, 16) == 22)
    assert(PipelineOps.trainSteps(17, 2, 16) == 3)
    for (n <- Seq(1L, 15L, 16L, 17L, 3320L, 9999L); b <- Seq(1, 7, 16, 64))
      assert(PipelineOps.epochSteps(n, b) == math.ceil(n.toDouble / b).toLong)
  }

  test("S7: toLocalIterator streams the batched epoch plan to the driver") {
    // the reference's single-process consumption loop (train.py's
    // session.run per step) maps to Dataset.toLocalIterator: the driver
    // pulls ONE PARTITION AT A TIME — never the whole dataset — so a
    // 100 TB epoch can feed a local consumer with bounded driver memory
    val batched = PipelineOps.withBatchId(
      PipelineOps.withSplit(range(100), col("id"), 42, 20L), "rn", 16)
      .orderBy(col("rn"))
    val viaIterator = {
      val it = batched.toLocalIterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      while (it.hasNext) {
        val r = it.next()
        buf += ((r.getAs[Long]("id"), r.getAs[Long]("rn"),
          r.getAs[Long]("bid")))
      }
      buf.toSeq
    }
    val viaCollect = batched.collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("rn"),
        r.getAs[Long]("bid"))).toSeq
    assert(viaIterator == viaCollect)   // same rows, same order
    assert(viaIterator.map(_._2) == (1L to 100L)) // a full ordered epoch
    // batch ids arrive contiguously: step semantics for the consumer
    assert(viaIterator.map(_._3).distinct == (0L to 6L))
  }

  test("writeSharded lays out split partitions readable with pruning") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_shard_").toString
    val df = PipelineOps.withShardId(
      PipelineOps.withSplit(range(100), col("id"), 42, 20L),
      col("id"), 42, 5)
    PipelineOps.writeSharded(df, "shard", "split", tmp)
    val back = spark.read.parquet(tmp)
    assert(back.filter(col("split") === "validation").count() == 20)
    assert(back.count() == 100)
  }

  test("compact shrinks fragmented dirs, including partitioned layouts") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_compact").toString
    val df = spark.range(20000)
      .withColumn("part", (col("id") % 4).cast("string"))
      .withColumn("pad", md5(col("id").cast("string")))
    // flat fragmentation: 32 slivers → few size-targeted files
    df.repartition(32).write.mode("overwrite").parquet(s"$base/flat")
    val flat = PipelineOps.compact(spark, s"$base/flat",
      s"$base/flat_out", targetBytes = 1L << 20)
    assert(flat.inFiles == 32 && flat.outFiles < flat.inFiles,
      s"flat: $flat")
    // partitioned layout: files live in nested part= dirs — the
    // recursive listing must measure them (a flat listing sees 0
    // bytes and would funnel everything into one file)
    df.repartition(16).write.mode("overwrite").partitionBy("part")
      .parquet(s"$base/nested")
    val nested = PipelineOps.compact(spark, s"$base/nested",
      s"$base/nested_out", targetBytes = 1L << 20)
    assert(nested.inFiles >= 32 && nested.outFiles < nested.inFiles,
      s"nested: $nested")
    // upward re-size: a tiny target makes targetFiles exceed the
    // input count — the invariant is outFiles <= max(in, target),
    // never strict shrink (ADVICE r4: q68 at larger SFs)
    val grown = PipelineOps.compact(spark, s"$base/flat_out",
      s"$base/grow_out", targetBytes = 16L << 10)
    assert(grown.targetFiles > grown.inFiles, s"grow setup: $grown")
    assert(grown.outFiles <= math.max(grown.inFiles, grown.targetFiles),
      s"grow: $grown")
    assert(spark.read.parquet(s"$base/grow_out").count() == 20000)
    // content identity both ways
    assert(spark.read.parquet(s"$base/flat_out").count() == 20000)
    assert(spark.read.parquet(s"$base/nested_out").count() == 20000)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }
}
