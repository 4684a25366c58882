package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.VersionedTable
import graft.streaming.EventStream

/** s41/s42 self-healing ingest receipts: the per-batch drift census
  * rebuilds the index exactly when the stream skews (and the rebuilt
  * index equals a fresh full-corpus build), stays splice-only on a
  * natural stream, and heals from a partial-crash replay on the
  * FIRING batch (the rebuild decision is a pure function of pinned
  * pre-batch state, so the replay re-decides identically). */
class SelfHealingIngestSpec extends SparkSpec {

  private val NC = 32
  private val Iters = 2
  private val Degree = 12
  private val Cap = 3.0
  private val Drop6 = 150000L

  private lazy val emb = Tables.embeddings(spark, Sf0001)
    .select(col("vec_id"), col("embedding")).persist()
  private lazy val base = emb.filter(col("vec_id") % 4 =!= 0)
  private lazy val arrivals = emb.filter(col("vec_id") % 4 === 0)
  private lazy val skewed = emb.filter(col("vec_id") % 7 === 0)
    .select((col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"),
        x => (lit(1.0) + lit(0.1) * x.cast("double")).cast("float"))
        .as("embedding"))

  private def seed(root: String): Unit = {
    val cents = Similarity.kmeansCentroids(base, "vec_id",
      "embedding", NC, Iters).persist()
    val (top, graphs, ranked) = Similarity.buildHnswGraphIndexWith(
      base, cents, "vec_id", "embedding", Degree, nProbeBuild = 2,
      layerRatio = 16, nLayers = 2)
    val cells = Similarity.censusCells(
      Similarity.assignWithSim(base, cents, "vec_id", "embedding"))
      .persist()
    VersionedTable.commit(emb.limit(0), s"$root/state/vectors")
    VersionedTable.commit(ranked, s"$root/state/ranked")
    VersionedTable.commit(top, s"$root/state/toplayer")
    VersionedTable.commit(graphs, s"$root/state/graphs")
    VersionedTable.commit(cents, s"$root/state/centroids")
    VersionedTable.commit(cells, s"$root/state/cellsbuild")
    VersionedTable.commit(cells, s"$root/state/cellsnow")
  }

  private def addBatch(root: String, i: Int,
      df: org.apache.spark.sql.DataFrame): Unit = {
    val tmp = s"$root/shard$i"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val streamDir = new java.io.File(root, "in")
    streamDir.mkdirs()
    val dst = new java.io.File(streamDir, f"batch$i%02d.parquet")
    java.nio.file.Files.copy(part.toPath, dst.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    dst.setLastModified(1000000L * (i + 1))
  }

  private def ingest(root: String): Unit =
    EventStream.selfHealingGraphIngestOnce(
      EventStream.parquetFileStream(spark,
        new java.io.File(root, "in").getAbsolutePath),
      s"$root/state", base, "vec_id", "embedding", Degree,
      nProbeBuild = 2, layerRatio = 16, nLayers = 2, nCells = NC,
      iters = Iters, capFactor = Cap, drop6 = Drop6)

  private def edges(g: org.apache.spark.sql.DataFrame) =
    g.select(col("level").cast("int"), col("src"), col("dst"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .toSet

  private def centroidVersions(root: String): Seq[Set[(Long, Double)]] =
    VersionedTable.versions(spark, s"$root/state/centroids").map { v =>
      VersionedTable.readVersion(spark, s"$root/state/centroids", v)
        .select(col("cell_id").cast("long"),
          element_at(col("centroid"), 1).cast("double"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    }

  test("skewed stream fires mid-ingest; final index = fresh full build") {
    val root = java.nio.file.Files.createTempDirectory("s41spec")
      .toString
    seed(root)
    addBatch(root, 0, arrivals.filter(col("vec_id") % 3 === 0))
    addBatch(root, 1, arrivals.filter(col("vec_id") % 3 =!= 0))
    addBatch(root, 2, skewed)
    ingest(root)
    // centroids unchanged through the two natural batches, replaced
    // by the firing one — the rebuild happened exactly once, at the
    // skewed batch
    val cv = centroidVersions(root)
    assert(cv.length == 4)
    assert(cv(1) == cv(0) && cv(2) == cv(0), "natural batches must splice")
    assert(cv(3) != cv(0), "the skewed batch must retrain")
    // the rebuilt index IS the fresh full-corpus build
    val corpus = emb.unionByName(skewed)
    val cents2 = Similarity.kmeansCentroids(corpus, "vec_id",
      "embedding", NC, Iters)
    val (_, fresh, _) = Similarity.buildHnswGraphIndexWith(corpus,
      cents2, "vec_id", "embedding", Degree, nProbeBuild = 2,
      layerRatio = 16, nLayers = 2)
    assert(edges(VersionedTable.readCurrent(spark,
      s"$root/state/graphs")) == edges(fresh))
  }

  test("natural stream never rebuilds; splices compose to the append twin") {
    val root = java.nio.file.Files.createTempDirectory("s42spec")
      .toString
    seed(root)
    for (i <- 0 until 3)
      addBatch(root, i, arrivals.filter(col("vec_id") % 3 === i))
    ingest(root)
    val cv = centroidVersions(root)
    assert(cv.length == 4 && cv.forall(_ == cv(0)),
      "a natural stream must never retrain")
    val cents = Similarity.kmeansCentroids(base, "vec_id",
      "embedding", NC, Iters)
    val (top1, graphs1, ranked1) = Similarity.buildHnswGraphIndexWith(
      base, cents, "vec_id", "embedding", Degree, nProbeBuild = 2,
      layerRatio = 16, nLayers = 2)
    val (_, oneShot) = Similarity.appendHnswGraphIndex(emb, arrivals,
      cents, ranked1, top1, graphs1, "vec_id", "embedding", Degree,
      nProbeBuild = 2, layerRatio = 16, nLayers = 2)
    assert(edges(VersionedTable.readCurrent(spark,
      s"$root/state/graphs")) == edges(oneShot))
  }

  test("crash on the FIRING batch heals on replay") {
    // batches 0-1 complete, then the process dies during the firing
    // batch 2 AFTER its vectors append landed — the replay must
    // re-read pinned pre-batch state (NOT the half-advanced current
    // versions), re-decide REBUILD identically, and land the missing
    // six commits; the final state must equal a clean run's
    val root = java.nio.file.Files.createTempDirectory("s41crash")
      .toString
    seed(root)
    addBatch(root, 0, arrivals.filter(col("vec_id") % 3 === 0))
    addBatch(root, 1, arrivals.filter(col("vec_id") % 3 =!= 0))
    ingest(root)
    VersionedTable.appendCommit(skewed, s"$root/state/vectors")
    addBatch(root, 2, skewed)
    ingest(root)
    assert(VersionedTable.readCurrent(spark, s"$root/state/vectors")
      .count() == arrivals.count() + skewed.count())
    val clean = java.nio.file.Files.createTempDirectory("s41clean")
      .toString
    seed(clean)
    addBatch(clean, 0, arrivals.filter(col("vec_id") % 3 === 0))
    addBatch(clean, 1, arrivals.filter(col("vec_id") % 3 =!= 0))
    addBatch(clean, 2, skewed)
    ingest(clean)
    assert(edges(VersionedTable.readCurrent(spark,
        s"$root/state/graphs")) ==
      edges(VersionedTable.readCurrent(spark, s"$clean/state/graphs")))
    // census state healed too: baseline == running == the fresh
    // full-corpus aggregate on both paths
    def cells(r: String, t: String) =
      VersionedTable.readCurrent(spark, s"$r/state/$t")
        .collect().map(r0 => (r0.getLong(0), r0.getLong(1),
          r0.getLong(2))).toSet
    assert(cells(root, "cellsbuild") == cells(clean, "cellsbuild"))
    assert(cells(root, "cellsnow") == cells(clean, "cellsnow"))
  }
}
