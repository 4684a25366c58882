package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Similarity search over an embedding column (SURVEY.md §7 M7b):
  * brute-force cosine top-k as the exact baseline, and a sign-random-
  * projection LSH bucketing as the sublinear scale path.
  *
  * Float discipline: every dot product is a LEFT FOLD over doubles
  * (`aggregate(zip_with(...))`) so the DuckDB oracle — written as
  * `list_reduce` with the same operand order — produces bit-identical
  * IEEE results, making rank comparisons hash-stable without rounding
  * tolerance.
  */
object Similarity {

  /** Left-fold double dot product of two float arrays, as a native
    * codegen'd Catalyst Expression (graft.functions.DotProductExpr):
    * the loop is emitted straight into whole-stage codegen, reading
    * elements from columnar ArrayData — no UDF boundary, no per-row
    * Array[Float] materialization. Same IEEE summation order as the
    * DuckDB `list_reduce` oracle — bit-identical results. */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProductExpr.dot(a, b)

  /** L2 norm of a float-array column (left-fold, doubles). */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity of two float-array columns, computed in doubles.
    * For joins, prefer precomputing [[norm]] per side (O(n)) instead of
    * per pair (O(n²)) — see [[bruteForceTopK]]. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force top-k neighbours for each query vector: cross the
    * (small) query side against the corpus — Spark broadcasts it — rank
    * by cosine desc with id tiebreak, keep k. Norms are computed once
    * per vector before the join, not once per pair. The baseline every
    * ANN variant is measured against. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .withColumn("q_norm", norm(col("q_vec")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .withColumn("c_norm", norm(col("c_vec")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * uniform in [-1, 1), derived from md5 so both engines agree. */
  private def planeComponent(plane: Column, dim: Column): Column =
    Tables.hashRand(concat(plane.cast("string"), lit("_"),
      dim.cast("string")), 101) * 2.0 - 1.0

  /** The same md5-derived plane components computed driver-side (plain
    * Scala MessageDigest) — bit-identical to [[planeComponent]] and to
    * the DuckDB expression `('0x'||substr(md5(p||'_'||d||'#101'),1,8))
    * ::BIGINT / 4294967296.0 * 2 - 1`, so plans can embed the plane
    * matrix as a literal instead of evaluating 8×dim md5s per row. */
  def deterministicPlanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until nPlanes).map { p =>
      (0 until dim).map { d =>
        val hex = md.digest(s"${p}_${d}#101".getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex, 16) / 4294967296.0 * 2.0 - 1.0
      }
    }
  }

  /** Sign-random-projection bucket id computed by LEFT-FOLD over the
    * vector against literal plane rows — fully deterministic (a
    * groupBy-sum of exploded contributions is not: partial-aggregation
    * order perturbs the last ulp and can flip a sign at proj ≈ 0), so
    * the DuckDB oracle reproduces the bucket bit-for-bit. */
  def lshBucketFolded(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (row, p) =>
      val lit_p = typedlit(row)
      val proj = aggregate(
        zip_with(transform(vec, x => x.cast("double")), lit_p,
          (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << p)).otherwise(0L)
    }.reduce(_ + _)

  /** LSH-routed embedding near-dup (the scale path for
    * [[graft.operators.Dedup.embeddingNearDup]]): bucket every vector by
    * folded sign-projection, pair only within buckets, verify by exact
    * cosine ≥ threshold. All md5-derived — oracle-checkable end to end. */
  def lshNearDup(emb: DataFrame, idCol: String, vecCol: String,
      nPlanes: Int, dim: Int, threshold: Double): DataFrame = {
    val planes = deterministicPlanes(nPlanes, dim)
    val withB = emb.select(col(idCol), col(vecCol))
      .withColumn("bucket", lshBucketFolded(col(vecCol), planes))
      .withColumn("nrm", norm(col(vecCol)))
    val a = withB.select(col(idCol).as("id_a"), col(vecCol).as("v_a"),
      col("nrm").as("n_a"), col("bucket").as("b_a"))
    val b = withB.select(col(idCol).as("id_b"), col(vecCol).as("v_b"),
      col("nrm").as("n_b"), col("bucket").as("b_b"))
    a.join(b, col("b_a") === col("b_b") && col("id_a") < col("id_b"))
      .withColumn("cosine",
        dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("b_a").as("bucket"),
        col("cosine"))
  }

  /** Sign-random-projection LSH bucket id per vector: `nPlanes` md5-
    * derived hyperplanes; bit p = sign of <v, plane_p>. Vectors in the
    * same bucket are ANN candidates. At 100 TB this is the shuffle key
    * that replaces the quadratic cross join. */
  def lshBuckets(emb: DataFrame, idCol: String, vecCol: String,
      nPlanes: Int): DataFrame = {
    val planes = emb.sparkSession.range(nPlanes).toDF("p")
    val dims = emb.select(col(idCol), posexplode(col(vecCol))
      .as(Seq("d", "x")))
    dims.crossJoin(broadcast(planes))
      .withColumn("contrib",
        col("x").cast("double") * planeComponent(col("p"), col("d")))
      .groupBy(col(idCol), col("p"))
      .agg(sum(col("contrib")).as("proj"))
      .groupBy(col(idCol))
      .agg(sum(when(col("proj") > 0,
        pow(lit(2.0), col("p")).cast("long")).otherwise(0L)).as("bucket"))
  }

  /** IVF-style ANN top-k (the second scale path next to LSH): partition
    * the corpus into `nCells` Voronoi cells around deterministically
    * sampled seed vectors (the `nCells` corpus vectors with the lowest
    * md5 of their id — no training step, fully reproducible), then
    * search only the `nProbe` cells whose centroids are nearest the
    * query. Cell assignment is a broadcast join against the tiny
    * centroid set; the candidate join is an equi-join on cell id — the
    * same shuffle shape that scales to a real k-means codebook. */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      nCells: Int = 16, nProbe: Int = 2): DataFrame = {
    val seeds = emb
      .withColumn("__h", graft.Tables.hashU32(col(idCol), 77))
      .orderBy(col("__h"), col(idCol)).limit(nCells)
      .select(col(idCol).as("cell_id"), col(vecCol).as("centroid"))
    // cell assignment: nearest centroid by cosine (norms precomputed)
    val withNorm = emb.select(col(idCol), col(vecCol))
      .withColumn("nrm", norm(col(vecCol)))
    val cWithNorm = seeds.withColumn("c_nrm", norm(col("centroid")))
    val scoredCells = withNorm.crossJoin(broadcast(cWithNorm))
      .withColumn("sim",
        dot(col(vecCol), col("centroid")) / (col("nrm") * col("c_nrm")))
    val wAssign = Window.partitionBy(col(idCol))
      .orderBy(col("sim").desc, col("cell_id").asc)
    val assigned = scoredCells
      .withColumn("rk", row_number().over(wAssign))
      .filter(col("rk") === 1)
      .select(col(idCol), col(vecCol), col("nrm"), col("cell_id"))
    val probed = scoredCells
      .withColumn("rk", row_number().over(wAssign))
      .filter(col("rk") <= nProbe)
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        col("nrm").as("q_nrm"), col("cell_id").as("probe_cell"))
    val cand = probed.join(
      assigned.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
        col("nrm").as("c_nrm"), col("cell_id")),
      col("probe_cell") === col("cell_id") &&
        col("query_id") =!= col("neighbor_id"))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    cand.withColumn("cosine",
        dot(col("q_vec"), col("c_vec")) / (col("q_nrm") * col("c_nrm")))
      .select(col("query_id"), col("neighbor_id"), col("cosine")).distinct()
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** LSH-accelerated ANN top-k: candidates are corpus vectors sharing
    * the query's bucket (multi-probe: Hamming-1 neighbours of the bucket
    * included when `probeBits > 0`), ranked by exact cosine within the
    * bucket. Trades recall for a bucket-local join — property-tested
    * against [[bruteForceTopK]] for recall in SimilaritySpec. */
  def annTopK(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      nPlanes: Int = 8, probeBits: Int = 1): DataFrame = {
    val buckets = lshBuckets(emb, idCol, vecCol, nPlanes)
    val vecs = emb.select(col(idCol), col(vecCol))
      .withColumn("nrm", norm(col(vecCol)))
    val withB = vecs.join(buckets, idCol)
    // probe buckets: the bucket itself plus Hamming-1 flips
    val probes =
      if (probeBits <= 0) withB.withColumn("probe", col("bucket"))
      else withB.withColumn("probe",
        explode(concat(array(col("bucket")),
          transform(sequence(lit(0), lit(nPlanes - 1)), p =>
            // flip bit p: bucket XOR 2^p via arithmetic (engine-portable)
            when(floor(col("bucket") / pow(lit(2.0), p)).cast("long") % 2 === 1,
              col("bucket") - pow(lit(2.0), p).cast("long"))
              .otherwise(col("bucket") + pow(lit(2.0), p).cast("long"))))))
    val cand = probes.select(col(idCol).as("query_id"),
      col(vecCol).as("q_vec"), col("nrm").as("q_nrm"), col("probe"))
      .join(withB.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("c_vec"), col("nrm").as("c_nrm"), col("bucket")),
        col("probe") === col("bucket") &&
          col("query_id") =!= col("neighbor_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    cand.withColumn("cosine",
        dot(col("q_vec"), col("c_vec")) / (col("q_nrm") * col("c_nrm")))
      .select(col("query_id"), col("neighbor_id"), col("cosine")).distinct()
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }
}
