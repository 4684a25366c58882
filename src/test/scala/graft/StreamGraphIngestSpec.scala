package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.VersionedTable
import graft.streaming.EventStream

/** s36 streaming graph-ingest receipts: micro-batch splices compose
  * to the one-shot append (slicing independence — the property that
  * lets s31's rebuild twin serve as s36's oracle), and a full replay
  * of the stream is a no-op on every state table. */
class StreamGraphIngestSpec extends SparkSpec {

  private val NC = 8
  private val Iters = 2
  private val Degree = 4

  private lazy val emb = Tables.embeddings(spark, Sf0001)
    .select(col("vec_id"), col("embedding")).persist()
  private lazy val base = emb.filter(col("vec_id") % 4 =!= 0)
  private lazy val arrivals = emb.filter(col("vec_id") % 4 === 0)

  /** Seed the four state tables + centroids under a fresh dir and
    * stream the arrivals in 3 micro-batches; returns the state dir. */
  private def runIngest(): String = {
    val root = java.nio.file.Files.createTempDirectory("s36spec")
      .toString
    val cents = Similarity.kmeansCentroids(base, "vec_id",
      "embedding", NC, Iters).persist()
    val (top, graphs, ranked) = Similarity.buildHnswGraphIndexWith(
      base, cents, "vec_id", "embedding", Degree, nProbeBuild = 2,
      layerRatio = 4, nLayers = 3)
    VersionedTable.commit(emb.limit(0), s"$root/state/vectors")
    VersionedTable.commit(ranked, s"$root/state/ranked")
    VersionedTable.commit(top, s"$root/state/toplayer")
    VersionedTable.commit(graphs, s"$root/state/graphs")
    val streamDir = new java.io.File(root, "in")
    streamDir.mkdirs()
    for (i <- 0 until 3) {
      val tmp = s"$root/shard$i"
      arrivals.filter(col("vec_id") % 3 === i).coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(streamDir, f"batch$i%02d.parquet")
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      dst.setLastModified(1000000L * (i + 1))
    }
    EventStream.graphIngestOnce(
      EventStream.parquetFileStream(spark, streamDir.getAbsolutePath),
      s"$root/state", base, cents, "vec_id", "embedding", Degree,
      nProbeBuild = 2, layerRatio = 4, nLayers = 3)
    root
  }

  private def edges(g: org.apache.spark.sql.DataFrame) =
    g.select(col("level").cast("int"), col("src"), col("dst"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .toSet

  test("streamed splices ≡ the one-shot append (slicing independence)") {
    val root = runIngest()
    val streamed = edges(
      VersionedTable.readCurrent(spark, s"$root/state/graphs"))
    val cents = Similarity.kmeansCentroids(base, "vec_id",
      "embedding", NC, Iters)
    val (top1, graphs1, ranked1) = Similarity.buildHnswGraphIndexWith(
      base, cents, "vec_id", "embedding", Degree, nProbeBuild = 2,
      layerRatio = 4, nLayers = 3)
    val (_, oneShot) = Similarity.appendHnswGraphIndex(emb, arrivals,
      cents, ranked1, top1, graphs1, "vec_id", "embedding", Degree,
      nProbeBuild = 2, layerRatio = 4, nLayers = 3)
    assert(streamed == edges(oneShot))
    // ranked/vectors advanced O(batch): exactly the arrival rows
    assert(VersionedTable.readCurrent(spark, s"$root/state/vectors")
      .count() == arrivals.count())
  }

  test("crash between the four commits heals on replay") {
    // simulate a crash DURING batch 0: the vectors append landed,
    // then the process died before ranked/toplayer/graphs committed.
    // The restarted stream redelivers batch 0; the vectors guard must
    // skip (already at version 1) while the other three tables land —
    // and the final state must equal an uninterrupted run's
    val root = java.nio.file.Files.createTempDirectory("s36crash")
      .toString
    val cents = Similarity.kmeansCentroids(base, "vec_id",
      "embedding", NC, Iters).persist()
    val (top, graphs, ranked) = Similarity.buildHnswGraphIndexWith(
      base, cents, "vec_id", "embedding", Degree, nProbeBuild = 2,
      layerRatio = 4, nLayers = 3)
    VersionedTable.commit(emb.limit(0), s"$root/state/vectors")
    VersionedTable.commit(ranked, s"$root/state/ranked")
    VersionedTable.commit(top, s"$root/state/toplayer")
    VersionedTable.commit(graphs, s"$root/state/graphs")
    // the "crashed" half-applied batch 0 (arrivals with vec_id%3==0)
    VersionedTable.appendCommit(
      arrivals.filter(col("vec_id") % 3 === 0), s"$root/state/vectors")
    val streamDir = new java.io.File(root, "in")
    streamDir.mkdirs()
    for (i <- 0 until 3) {
      val tmp = s"$root/shard$i"
      arrivals.filter(col("vec_id") % 3 === i).coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(streamDir, f"batch$i%02d.parquet")
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      dst.setLastModified(1000000L * (i + 1))
    }
    EventStream.graphIngestOnce(
      EventStream.parquetFileStream(spark, streamDir.getAbsolutePath),
      s"$root/state", base, cents, "vec_id", "embedding", Degree,
      nProbeBuild = 2, layerRatio = 4, nLayers = 3)
    // no duplicate vector rows despite the pre-applied append
    assert(VersionedTable.readCurrent(spark, s"$root/state/vectors")
      .count() == arrivals.count())
    assert(VersionedTable.readCurrent(spark, s"$root/state/vectors")
      .select("vec_id").distinct().count() == arrivals.count())
    // final graph equals the clean run's
    val clean = runIngest()
    assert(edges(VersionedTable.readCurrent(spark,
        s"$root/state/graphs")) ==
      edges(VersionedTable.readCurrent(spark, s"$clean/state/graphs")))
  }

  test("crash on the FINAL batch (vectors+ranked landed) heals on replay") {
    // the batch-0 variant above is too forgiving: the two later
    // batches re-splice every touched cell and can mask a corpus
    // double-count. Here batches 0-1 complete, then the process
    // "dies" during batch 2 AFTER its vectors and ranked appends
    // landed but BEFORE toplayer/graphs committed — the deepest
    // partial-commit window. The restarted stream redelivers all
    // three batches; 0-1 must no-op, and batch 2's splice must see
    // the exact pre-batch state (the replay-proofing anti-joins in
    // graphIngestOnce), so the final edge set equals a clean run's
    val root = java.nio.file.Files.createTempDirectory("s36crash2")
      .toString
    val cents = Similarity.kmeansCentroids(base, "vec_id",
      "embedding", NC, Iters).persist()
    val (top, graphs, ranked) = Similarity.buildHnswGraphIndexWith(
      base, cents, "vec_id", "embedding", Degree, nProbeBuild = 2,
      layerRatio = 4, nLayers = 3)
    VersionedTable.commit(emb.limit(0), s"$root/state/vectors")
    VersionedTable.commit(ranked, s"$root/state/ranked")
    VersionedTable.commit(top, s"$root/state/toplayer")
    VersionedTable.commit(graphs, s"$root/state/graphs")
    val streamDir = new java.io.File(root, "in")
    streamDir.mkdirs()
    def addBatch(i: Int): Unit = {
      val tmp = s"$root/shard$i"
      arrivals.filter(col("vec_id") % 3 === i).coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(streamDir, f"batch$i%02d.parquet")
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      dst.setLastModified(1000000L * (i + 1))
    }
    addBatch(0); addBatch(1)
    EventStream.graphIngestOnce(
      EventStream.parquetFileStream(spark, streamDir.getAbsolutePath),
      s"$root/state", base, cents, "vec_id", "embedding", Degree,
      nProbeBuild = 2, layerRatio = 4, nLayers = 3)
    // the "crashed" half-applied batch 2: vectors AND ranked landed
    val b2 = arrivals.filter(col("vec_id") % 3 === 2)
    VersionedTable.appendCommit(b2, s"$root/state/vectors")
    VersionedTable.appendCommit(
      Similarity.rankedCellsFor(b2, cents, "vec_id", "embedding", 2)
        .select(col("node_id"), col("cell_id"), col("rk")),
      s"$root/state/ranked")
    addBatch(2)
    EventStream.graphIngestOnce(
      EventStream.parquetFileStream(spark, streamDir.getAbsolutePath),
      s"$root/state", base, cents, "vec_id", "embedding", Degree,
      nProbeBuild = 2, layerRatio = 4, nLayers = 3)
    assert(VersionedTable.readCurrent(spark, s"$root/state/vectors")
      .count() == arrivals.count())
    // nProbeBuild=2 → exactly two ranked rows per node; duplicates
    // from a replayed ranked append would break this count
    assert(VersionedTable.readCurrent(spark, s"$root/state/ranked")
      .count() == 2 * emb.count())
    val clean = runIngest()
    assert(edges(VersionedTable.readCurrent(spark,
        s"$root/state/graphs")) ==
      edges(VersionedTable.readCurrent(spark, s"$clean/state/graphs")))
  }

  test("a full stream replay is a no-op on every state table") {
    val root = runIngest()
    def vcounts = Seq("vectors", "ranked", "toplayer", "graphs")
      .map(t => VersionedTable.versions(spark, s"$root/state/$t").length)
    val before = vcounts
    val edgesBefore = edges(
      VersionedTable.readCurrent(spark, s"$root/state/graphs"))
    // no checkpoint: the re-run re-delivers all files as batches 0–2,
    // and every per-table lockstep guard must skip them
    EventStream.graphIngestOnce(
      EventStream.parquetFileStream(spark,
        new java.io.File(root, "in").getAbsolutePath),
      s"$root/state", base,
      Similarity.kmeansCentroids(base, "vec_id", "embedding", NC,
        Iters),
      "vec_id", "embedding", Degree, nProbeBuild = 2,
      layerRatio = 4, nLayers = 3)
    assert(vcounts == before, "replay must not advance any table")
    assert(edges(VersionedTable.readCurrent(spark,
      s"$root/state/graphs")) == edgesBefore)
  }
}
