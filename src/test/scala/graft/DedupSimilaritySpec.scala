package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** North-star dedup + similarity operators (SURVEY §7 M7a/M7b) on
  * crafted corpora with known duplicates/neighbours. */
class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over a sleepy dog"), // near dup of 1
    (4L, "completely different content about spark engines here"),
    (5L, "THE  Quick   Brown FOX jumps over the lazy dog") // ws/case dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup groups normalized duplicates, keeps min id") {
    val out = Dedup.exact(docs, col("doc_id"), col("text"))
      .as[(String, Long, Long)].collect()
    val byKeep = out.map(r => r._2 -> r._3).toMap
    assert(byKeep(1L) == 3L) // 1, 2 and the case/ws variant 5
    assert(byKeep(3L) == 1L && byKeep(4L) == 1L)
  }

  test("minhash LSH surfaces the near-duplicate pair") {
    val mh = Dedup.minhash(docs, col("doc_id"), col("text"), 8)
    val cand = Dedup.lshCandidates(mh, 2)
    val pairs = cand.as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L))) // identical docs always collide
    assert(pairs.contains((1L, 5L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    val est = Dedup.minhashJaccard(cand, mh, 8)
      .filter(col("doc_a") === 1 && col("doc_b") === 2)
      .select("est_jaccard").as[Double].head()
    assert(est == 1.0)
  }

  test("prefix-filter Jaccard join is EXACT: equals brute force (d17)") {
    // deliberately adversarial set: near-dup pairs at/around the
    // threshold, an exact duplicate, and unrelated docs
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "the quick brown fox jumps over the lazy dog"), // dup of 1
      (4L, "an entirely different document about spark sql"),
      (5L, "the quick brown fox leaps over the lazy dog"),
      (6L, "spark sql document about an entirely different")
    ).toDF("doc_id", "text")
    def trigrams(t: String): Set[String] = {
      val w = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (w.length < 3) Set.empty
      else (0 until w.length - 2)
        .map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
    }
    val sets = docs.as[(Long, String)].collect().toMap.map {
      case (id, t) => id -> trigrams(t)
    }
    val expected = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) intersect sets(b)).size
      uni = (sets(a) union sets(b)).size
      if uni > 0 && inter * 100 >= uni * 70
    } yield (a, b, inter.toLong, uni.toLong)).toSet
    val got = Dedup.prefixJaccardJoin(docs, col("doc_id"), col("text"),
        thresholdPct = 70)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expected,
      s"exactness broke: got $got expected $expected")
    // sanity: the exact duplicate pair is found at Jaccard 1
    assert(got.exists { case (a, b, i, u) => a == 1L && b == 3L && i == u })
  }

  test("prefix containment join is EXACT: equals the co-occurrence " +
      "join and prunes candidates (d21)") {
    // the d20 corpus shape: base docs + quote-wrapped injections whose
    // containment is ~1 while Jaccard sits low, plus stop-shingle-heavy
    // docs that blow up the co-occurrence join's candidate set
    val base = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), col("text"), col("source"))
    val quotes = base.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat(lit("begin quoted passage "), col("text"),
          lit(" end of quoted passage with additional wrapper " +
            "commentary appended here")).as("text"),
        col("source"))
    val docs = base.unionByName(quotes)
    val brute = Dedup.containmentSameKey(docs, col("doc_id"),
        col("text"), col("source"), n = 3, minContainment = 0.9)
      .select("doc_a", "doc_b", "inter", "containment", "jaccard")
      .as[(Long, Long, Long, Double, Double)].collect().toSet
    val pref = Dedup.prefixContainmentJoin(docs, col("doc_id"),
        col("text"), col("source"), n = 3, thresholdPct = 90)
      .select("doc_a", "doc_b", "inter", "containment", "jaccard")
      .as[(Long, Long, Long, Double, Double)].collect().toSet
    assert(pref == brute,
      s"zero-miss broke: only-prefix=${(pref -- brute).take(3)} " +
        s"only-brute=${(brute -- pref).take(3)}")
    assert(brute.nonEmpty, "corpus produced no containment pairs")
    val (prefixPairs, coocPairs) = Dedup.prefixContainmentReceipt(docs,
      col("doc_id"), col("text"), col("source"), n = 3,
      thresholdPct = 90)
    info(s"candidate pairs: prefix=$prefixPairs cooc=$coocPairs")
    assert(prefixPairs < coocPairs,
      s"prefix filter must shrink candidates: $prefixPairs vs $coocPairs")
  }

  test("planBands picks the S-curve-optimal banding (d16)") {
    // knowns cross-checked against an independent integration of the
    // same objective (datasketch optimal_param semantics)
    assert(Dedup.planBands(8, 0.2) == ((8, 1)))
    assert(Dedup.planBands(8, 0.5) == ((4, 2)))
    assert(Dedup.planBands(8, 0.75) == ((2, 4)))
    assert(Dedup.planBands(8, 0.85) == ((1, 8)))
    assert(Dedup.planBands(128, 0.5) == ((32, 4)))
    assert(Dedup.planBands(128, 0.8) == ((8, 16)))
    // rows-per-band is monotone in the threshold: higher similarity
    // targets want steeper S-curves
    val rs = Seq(0.1, 0.3, 0.5, 0.7, 0.9)
      .map(t => Dedup.planBands(128, t)._2)
    assert(rs == rs.sorted, rs.toString)
    // weighting toward fewer false positives never lowers r
    assert(Dedup.planBands(128, 0.5, fpWeight = 0.9)._2 >=
      Dedup.planBands(128, 0.5, fpWeight = 0.1)._2)
    // b·r always reconstructs the signature length
    for (t <- Seq(0.2, 0.5, 0.8); n <- Seq(8, 16, 128)) {
      val (b, r) = Dedup.planBands(n, t)
      assert(b * r == n)
    }
  }

  test("incremental near-dup flags vs corpus and within-batch, min ref") {
    val existing = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (100L, "completely different content about spark engines here")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (7L, "the quick brown fox jumps over the lazy dog"),  // dup of 1
      (17L, "the quick brown fox jumps over the lazy dog"), // dup of 1 & 7
      (50L, "completely different content about spark engines here"),
      // ↑ dup of EXISTING 100 despite 100 > 50 (corpus match is
      //   id-order independent; only batch-internal refs need lower id)
      (27L, "nothing shares any shingle with this sentence at all ok")
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalNearDup(existing, incoming,
        col("doc_id"), col("text"), 8, 2, 0.5)
      .as[(Long, Int, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.size == 4)
    assert(out(7L) == ((1, Some(1L))))
    assert(out(17L) == ((1, Some(1L)))) // min of verified refs {1, 7}
    assert(out(50L) == ((1, Some(100L))))
    assert(out(27L) == ((0, None)))
  }

  test("decontaminate flags verified benchmark near-dups only") {
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"),
      (20L, "completely different content about spark engines here"),
      (30L, "nothing shares any shingle with this sentence at all ok")
    ).toDF("doc_id", "text")
    val bench = Seq(
      // near-identical to corpus 10 AND 20 (evidence = min bench id)
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (1L, "completely different content about spark engines here"),
      (9L, "the quick brown fox jumps over the lazy dog today")
    ).toDF("doc_id", "text")
    val out = Dedup.decontaminate(corpus, bench,
        col("doc_id"), col("text"), 8, 2, 0.5)
      .as[(Long, Int, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.size == 3)
    assert(out(10L) == ((1, Some(2L)))) // min of verified {2, 9}
    assert(out(20L) == ((1, Some(1L))))
    assert(out(30L) == ((0, None)))    // no band hit survives verify
  }

  test("ngram jaccard: identical docs = 1.0, disjoint docs = 0.0") {
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("doc_a", "doc_b")
    val j = Dedup.ngramJaccard(pairs, docs, col("doc_id"), col("text"), 3)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((1L, 3L)) > 0.3 && j((1L, 3L)) < 1.0)
    assert(j((1L, 4L)) == 0.0)
  }

  test("simhash: identical docs have hamming 0 and are paired") {
    val sh = Dedup.simhash(docs, col("doc_id"), col("text"))
    val fps = sh.as[(Long, Long)].collect().toMap
    assert(fps(1L) == fps(2L) && fps(1L) == fps(5L))
    assert(fps.values.forall(v => v >= 0L && v < (1L << 32)))
    val pairs = Dedup.simhashPairs(sh, 3).select("doc_a", "doc_b")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("cosine top-k ranks an exact duplicate vector first") {
    val emb = Seq(
      (10L, Array(1f, 0f, 0f, 0f)),
      (11L, Array(1f, 0f, 0f, 0f)),   // identical direction to 10
      (12L, Array(0.9f, 0.1f, 0f, 0f)),
      (13L, Array(0f, 1f, 0f, 0f)),
      (14L, Array(0f, 0f, 1f, 0f))
    ).toDF("vec_id", "embedding")
    val topk = Similarity.bruteForceTopK(emb,
      emb.filter(col("vec_id") === 10), "vec_id", "embedding", 3)
      .orderBy("rank").select("neighbor_id", "cosine")
      .as[(Long, Double)].collect()
    assert(topk.head._1 == 11L && math.abs(topk.head._2 - 1.0) < 1e-12)
    assert(topk(1)._1 == 12L)
    assert(topk.length == 3)
  }

  test("embedding near-dup finds only the identical pair at 0.99") {
    val emb = Seq(
      (1L, Array(1f, 0f)), (2L, Array(1f, 0f)), (3L, Array(0f, 1f))
    ).toDF("vec_id", "embedding")
    val nd = Dedup.embeddingNearDup(emb, col("vec_id"), col("embedding"), 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(nd == Set((1L, 2L)))
  }

  test("persisted IVF index searches identically to the live plan") {
    val emb = Tables.embeddings(spark, Sf0001)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivf_idx").toString
    try {
      val (cents, index) = Similarity.buildIvfIndex(emb, "vec_id",
        "embedding", nCells = 4, iters = 1)
      cents.write.mode("overwrite").parquet(s"$dir/centroids")
      index.write.mode("overwrite").partitionBy("cell")
        .parquet(s"$dir/index")
      val fromDisk = Similarity.ivfSearchIndexed(
        spark.read.parquet(s"$dir/index"),
        spark.read.parquet(s"$dir/centroids"),
        emb, "vec_id", "embedding", k = 3, nProbe = 2)
        .collect().map(_.toSeq).toSet
      val live = Similarity.ivfTopKWith(emb,
        Similarity.kmeansCentroids(emb, "vec_id", "embedding",
          nCells = 4, iters = 1),
        "vec_id", "embedding", k = 3, nProbe = 2)
        .collect().map(_.toSeq).toSet
      assert(fromDisk.nonEmpty && fromDisk == live)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("IVF-PQ routes candidates through probed cells only") {
    val emb = Tables.embeddings(spark, Sf0001)
    val out = Similarity.ivfPqTopK(emb,
      emb.filter(col("vec_id") % 10 === 0), "vec_id", "embedding",
      topK = 3, nCells = 4, ivfIters = 1, nProbe = 2, m = 8, k = 4,
      dim = 64, pqIters = 1, seed = 777)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // ≤ topK per query, ranks contiguous from 1
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.length <= 3 &&
        rows.map(_._2).sorted.sameElements(1L to rows.length))
    }
    // every neighbor's cell must be one of its query's probed cells
    val cells = Similarity.kmeansRefine(emb, "vec_id", "embedding",
        nCells = 4, iters = 1)
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    // probe list: top-2 cells per query by the same ranking the
    // operator uses — recompute via a tiny in-memory check against
    // the assignment (nProbe=2 ⊇ the assigned cell, so at minimum
    // same-cell neighbors are reachable; a cross-cell result must
    // still be some cell, i.e. the routing never invents vectors)
    out.foreach { case (_, _, n) => assert(cells.contains(n)) }
    // deterministic across runs
    val again = Similarity.ivfPqTopK(emb,
      emb.filter(col("vec_id") % 10 === 0), "vec_id", "embedding",
      topK = 3, nCells = 4, ivfIters = 1, nProbe = 2, m = 8, k = 4,
      dim = 64, pqIters = 1, seed = 777)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect()
    assert(out.toSet == again.toSet)
  }

  test("residual IVF-PQ matches raw IVF-PQ routing with >= recall") {
    val emb = Tables.embeddings(spark, Sf0001)
    val q = emb.filter(col("vec_id") % 10 === 0)
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val raw = Similarity.ivfPqTopK(emb, q, "vec_id", "embedding",
      topK = 5, nCells = 4, ivfIters = 1, nProbe = 2, m = 8, k = 8,
      dim = 64, pqIters = 2, seed = 777)
    val res = Similarity.ivfPqResidualTopK(emb, q, "vec_id", "embedding",
      topK = 5, nCells = 4, ivfIters = 1, nProbe = 2, m = 8, k = 8,
      dim = 64, pqIters = 2, seed = 777)
    val (rRaw, rRes) = (recallOf(raw), recallOf(res))
    info(f"recall@5: raw=$rRaw%.3f residual=$rRes%.3f")
    // identical routing (same cells, same probes) — residual coding
    // refines the SCORING, so recall must not degrade and usually
    // improves; both must beat chance by a wide margin
    assert(rRes >= rRaw - 1e-9, s"residual recall $rRes < raw $rRaw")
    // absolute floor is modest: synthetic 64-d embeddings are near-
    // orthogonal (the hard case for any ANN); measured raw=0.132,
    // residual=0.156 — the comparative claim is the assertion above
    assert(rRes > 0.1)
    // determinism
    val res2 = Similarity.ivfPqResidualTopK(emb, q, "vec_id",
      "embedding", topK = 5, nCells = 4, ivfIters = 1, nProbe = 2,
      m = 8, k = 8, dim = 64, pqIters = 2, seed = 777)
      .collect().map(_.toSeq).toSet
    assert(res.collect().map(_.toSeq).toSet == res2)
  }

  test("semantic dedup = within-cluster ε-ball rule over the kmeans cells") {
    val emb = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(1f, 0f, 0f, 0f)),      // identical to 1
      (3L, Array(0.99f, 0.1f, 0f, 0f)), // near 1
      (4L, Array(0f, 1f, 0f, 0f)),
      (5L, Array(0f, 0f, 1f, 0f)),
      (6L, Array(0f, 0f, 0.99f, 0.1f))  // near 5
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(emb, "vec_id", "embedding",
        nCells = 3, iters = 1, tau = 0.9)
      .select("vec_id", "keep").as[(Long, Int)].collect().toMap
    assert(out.size == 6)
    // contract: dropped ⇔ a lower-id member of the SAME kmeans cell
    // reaches tau — derive the expectation from the actual clustering
    val cells = Similarity.kmeansRefine(emb, "vec_id", "embedding",
        nCells = 3, iters = 1)
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    val vecs = emb.as[(Long, Array[Float])].collect().toMap
      .view.mapValues(_.map(_.toDouble)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map(p => p._1 * p._2).sum /
        (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    val expected = vecs.keys.map { id =>
      id -> (if (vecs.keys.exists(lo => lo < id &&
        cells(lo) == cells(id) && cos(vecs(lo), vecs(id)) >= 0.9)) 0 else 1)
    }.toMap
    assert(out == expected)
    // identical vectors always co-cluster → 2 is always dropped; the
    // globally lowest id can never be dropped
    assert(out(2L) == 0 && out(1L) == 1)
  }

  test("ANN LSH achieves high recall@5 against brute force on testdata") {
    val emb = Tables.embeddings(spark, Sf0001).filter(col("vec_id") % 5 === 0)
    val exact = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // 4 planes for a 100-vector corpus; on uniform-random embeddings the
    // top-5 "neighbours" are only weakly correlated (cosine ≈ 0.3), so
    // per-plane sign agreement is ~0.6 and recall@5 with Hamming-1
    // probing is theoretically ~0.5 — assert a conservative floor. On
    // clustered data (the real use case) recall approaches 1.
    val ann = Similarity.annTopK(emb, "vec_id", "embedding", 5,
      nPlanes = 4, probeBits = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect ann).size.toDouble / exact.size
    assert(recall >= 0.3, s"ANN recall too low: $recall")
  }

  test("duplicate-span excision removes shared windows, merges overlaps") {
    // docs 1 and 2 share the 5-token run "a b c d e" embedded in
    // different contexts; doc 3 is unique; doc 4 is too short to form
    // any window; doc 5 duplicates doc 1 wholesale (fully excised)
    val docs = Seq(
      (1L, "x a b c d e y z w v"),
      (2L, "p q a b c d e r s t"),
      (3L, "u1 u2 u3 u4 u5 u6 u7"),
      (4L, "tiny doc"),
      (5L, "x a b c d e y z w v")
    ).toDF("doc_id", "text")
    val out = Dedup.exciseDuplicateSpans(docs, col("doc_id"),
        col("text"), spanLen = 5)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // doc 1: its whole text duplicates doc 5 → every window dups →
    // all 10 tokens removed; same for 5
    assert(out(1L) == ((10L, 10L)), s"doc1: ${out(1L)}")
    assert(out(5L) == ((10L, 10L)))
    // doc 2: only the "a b c d e" window (start pos 2) is shared →
    // spans [2,7) → 5 tokens removed of 10
    assert(out(2L) == ((10L, 5L)), s"doc2: ${out(2L)}")
    // unique and too-short docs: untouched
    assert(out(3L) == ((7L, 0L)) && out(4L) == ((2L, 0L)))
    // surviving stream is the exact remainder: doc 2 keeps "p q r s t"
    val surv2 = Dedup.exciseDuplicateSpans(docs, col("doc_id"),
        col("text"), spanLen = 5)
      .filter(col("doc_id") === 2L).select(col("surv_sum"))
      .as[Long].head()
    val expected = docs.sparkSession.range(1)
      .select(graft.Tables.hashU32(lit("p q r s t"), 13)).as[Long].head()
    assert(surv2 == expected, "doc 2 must keep exactly 'p q r s t'")
  }

  test("connected components close duplicate chains to the min id") {
    // two chains (one long enough to need several propagation rounds)
    // and one isolated pair
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L),
      (10L, 11L),
      (20L, 22L), (21L, 22L)
    ).toDF("doc_a", "doc_b")
    val comp = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    (1L to 7L).foreach(v => assert(comp(v) == 1L))
    assert(comp(10L) == 10L && comp(11L) == 10L)
    assert(comp(20L) == 20L && comp(21L) == 20L && comp(22L) == 20L)

    val anno = Dedup.dedupComponents(edges)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(anno(7L) == (1L, 7L))  // chain of 7, canonical 1
    assert(anno(22L) == (20L, 3L))
    // exactly one canonical (doc_id == component) per cluster
    val canon = anno.collect { case (id, (c, _)) if id == c => c }
    assert(canon.toSeq.sorted == Seq(1L, 10L, 20L))
  }

  test("reliable checkpoint path matches localCheckpoint and writes files") {
    // the cluster-deployment flag (judge r4): identical results, with
    // every loop iterate recoverable from the checkpoint dir
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ckpt").toString
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L)
    ).toDF("doc_a", "doc_b")
    val local = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toSet
    val reliable = Dedup.connectedComponents(edges,
        reliableDir = Some(ckpt))
      .as[(Long, Long)].collect().toSet
    assert(local == reliable)
    val prLocal = Dedup.pageRank(edges, iters = 2)
      .as[(Long, Long, Long)].collect().toSet
    val prReliable = Dedup.pageRank(edges, iters = 2,
        reliableDir = Some(ckpt))
      .as[(Long, Long, Long)].collect().toSet
    assert(prLocal == prReliable)
    // the reliable path really checkpointed (rdd files on disk)
    val ckptDir = spark.sparkContext.getCheckpointDir
    assert(ckptDir.isDefined && ckptDir.get.contains("graft_ckpt"))
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
      .filter(p => p.getFileName.toString.startsWith("rdd-"))
      .count()
    assert(files > 0, "no reliable checkpoint data written")
    // do NOT delete ckpt: setCheckpointDir is process-global with no
    // unset, so the shared session keeps pointing here — deleting it
    // would silently break any later reliable-checkpoint user in this
    // JVM (it is a temp dir; the OS reaps it)
  }

  test("connected components converge with negative ids (seed sum 0)") {
    // path -2 — 4 — 5: the seed labels are (-2 → -2, 4 → -2, 5 → 4),
    // which sum to exactly 0 — a zero-sum early exit would return the
    // non-converged labels (5 still at 4 instead of -2)
    val edges = Seq((-2L, 4L), (4L, 5L)).toDF("doc_a", "doc_b")
    val comp = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(-2L -> -2L, 4L -> -2L, 5L -> -2L), s"got $comp")
    // and a genuinely empty edge list still returns an empty frame
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.connectedComponents(empty).isEmpty)
  }

  test("connected components match an in-memory union-find on random graphs") {
    // adversarial check for the partition-local contraction pre-pass:
    // random graphs (chains, stars, cliques, singleton pairs mixed by
    // chance), random partition counts, ids spread so co-partitioning
    // is arbitrary — every labeling must equal the reference union-find
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 8) {
      val nV = 2 + rnd.nextInt(40)
      val nE = 1 + rnd.nextInt(60)
      val ids = Array.fill(nV)(rnd.nextLong() % 1000000L)
      // self-loops allowed: a vertex whose only edge is (v, v) must
      // still appear in the labeling (as its own component)
      val edges = Seq.fill(nE) {
        (ids(rnd.nextInt(nV)), ids(rnd.nextInt(nV)))
      }
      if (edges.nonEmpty) {
        // reference: plain union-find over the same edges
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        val want = parent.keys.map(v => v -> find(v)).toMap
        // min-relabel: comp must be the component MIN, not just a root
        val minOf = want.groupBy(_._2).map { case (r, m) =>
          r -> m.keys.min }
        val wantMin = want.map { case (v, r) => v -> minOf(r) }
        val got = Dedup.connectedComponents(
          edges.toDF("doc_a", "doc_b").repartition(1 + rnd.nextInt(7)))
          .as[(Long, Long)].collect().toMap
        assert(got == wantMin, s"trial $trial: $edges")
      }
    }
    // deterministic corner: a pure self-loop graph labels the vertex
    val loop = Dedup.connectedComponents(
        Seq((5L, 5L)).toDF("doc_a", "doc_b"))
      .as[(Long, Long)].collect().toMap
    assert(loop == Map(5L -> 5L))
  }

  test("integer PageRank matches an in-memory reference; star centers rank highest") {
    def refPageRank(edges: Seq[(Long, Long)], iters: Int)
        : Map[Long, Long] = {
      val sym = edges.flatMap(e => Seq(e, e.swap)).distinct
      val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val n = deg.size
      val base6 = math.round(150000.0 / n)
      var pr = deg.map { case (v, _) =>
        v -> math.round(1000000.0 / n) }
      for (_ <- 0 until iters) {
        val sums = sym.groupBy(_._2).map { case (dst, es) =>
          dst -> es.map { case (src, _) => pr(src) / deg(src) }.sum
        }
        pr = deg.map { case (v, _) =>
          v -> (base6 + 85 * sums.getOrElse(v, 0L) / 100) }
      }
      pr
    }
    // star: center must outrank the leaves
    val star = Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L))
    val out = Dedup.pageRank(
        star.toDF("doc_a", "doc_b"), iters = 3)
      .select("doc_id", "pr6").as[(Long, Long)].collect().toMap
    assert(out == refPageRank(star, 3))
    assert(out(1L) > out(10L))
    // random graphs, random iteration counts
    val rnd = new scala.util.Random(4242)
    for (_ <- 0 until 3) {
      val nv = 2 + rnd.nextInt(20)
      val edges = (0 until 2 * nv).map(_ =>
        (rnd.nextInt(nv).toLong, rnd.nextInt(nv).toLong))
        .filter(e => e._1 != e._2).distinct
      if (edges.nonEmpty) {
        val iters = 1 + rnd.nextInt(3)
        val got = Dedup.pageRank(edges.toDF("doc_a", "doc_b"), iters)
          .select("doc_id", "pr6").as[(Long, Long)].collect().toMap
        assert(got == refPageRank(edges, iters),
          s"mismatch on edges=$edges iters=$iters")
      }
    }
  }

  test("internal persists are tracked and releasable by callers") {
    InternalCaches.releaseAll() // isolate from other suites
    val mh = Dedup.minhash(docs, col("doc_id"), col("text"), 8)
    val cand = Dedup.lshCandidates(mh, 2) // persists the banded relation
    val n = cand.count()
    assert(InternalCaches.trackedCount > 0,
      "operator-internal persist must register for release")
    InternalCaches.releaseAll()
    assert(InternalCaches.trackedCount == 0)
    // released caches silently recompute — same result
    assert(cand.count() == n)
  }

  test("segment dedup keeps first occurrence and reassembles in order") {
    // segLen=2 over tiny docs: doc 1 owns both segments; doc 2 repeats
    // doc 1's first segment ("a b") but has a novel second segment;
    // doc 3 is entirely doc 1's content (fully deduplicated away)
    val tiny = Seq(
      (1L, "a b c d"),
      (2L, "a b x y"),
      (3L, "c d a b"),
      (4L, "z")
    ).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(tiny, col("doc_id"), col("text"), 2)
      .select("doc_id", "n_segs", "n_kept", "kept_fp")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L)._1 == 2 && out(1L)._2 == 2)
    assert(out(2L)._1 == 2 && out(2L)._2 == 1) // "a b" seen in doc 1
    // doc 3's segments "c d" + "a b" both first-occurred in doc 1
    assert(out(3L)._1 == 2 && out(3L)._2 == 0)
    assert(out(4L)._1 == 1 && out(4L)._2 == 1) // short final segment
    // doc 2's surviving text is exactly "x y"
    val xyFp = tiny.sparkSession.range(1)
      .select(md5(lit("x y").cast("binary")).as("f")).as[String].head()
    assert(out(2L)._3 == xyFp)
    val emptyFp = tiny.sparkSession.range(1)
      .select(md5(lit("").cast("binary")).as("f")).as[String].head()
    assert(out(3L)._3 == emptyFp)
  }

  test("quantized k-means refinement is deterministic and non-degrading") {
    val emb = Tables.embeddings(spark, Sf0001)
    val refined = Similarity.kmeansRefine(emb, "vec_id", "embedding",
      nCells = 6, iters = 2)
      .select("vec_id", "cell", "sim").as[(Long, Long, Double)].collect()
    val n = emb.count()
    assert(refined.length == n)                       // every vector assigned
    assert(refined.map(_._2).distinct.length <= 6)    // at most nCells cells
    // bit-deterministic: a second run is identical including sims
    val again = Similarity.kmeansRefine(emb, "vec_id", "embedding",
      nCells = 6, iters = 2)
      .select("vec_id", "cell", "sim").as[(Long, Long, Double)].collect()
    assert(refined.toSet == again.toSet)
    // Lloyd rounds must not damage the clustering objective
    val seed = Similarity.kmeansRefine(emb, "vec_id", "embedding",
      nCells = 6, iters = 0)
      .select("sim").as[Double].collect()
    val meanSeed = seed.sum / seed.length
    val meanRef = refined.map(_._3).sum / refined.length
    assert(meanRef >= meanSeed - 0.01,
      s"refinement degraded mean sim: $meanSeed -> $meanRef")
  }

  test("PQ-ADC: codes cover all subspaces, search is deterministic") {
    val emb = Tables.embeddings(spark, Sf0001)
    val cb = Similarity.pqCodebooks(emb, "vec_id", "embedding",
      m = 8, k = 8, dim = 64, seed = 777)
    // 8 codebooks × 8 centroids, each an 8-dim sub-vector
    assert(cb.count() == 64)
    assert(cb.select(size(col("centroid"))).distinct()
      .as[Int].collect().toSeq == Seq(8))
    val codes = Similarity.pqEncode(emb, cb, "vec_id", "embedding",
      m = 8, dim = 64)
    val n = emb.count()
    assert(codes.count() == n * 8)       // every (vector, subspace) coded
    assert(codes.agg(max("cid")).as[Long].head() <= 8)
    val q = emb.filter(col("vec_id") % 25 === 0)
    val topk = Similarity.pqTopK(emb, q, "vec_id", "embedding", topK = 5)
      .select("query_id", "rank", "neighbor_id", "adc6")
      .as[(Long, Long, Long, Long)].collect()
    assert(topk.length == q.count() * 5)
    assert(topk.forall(_._4 >= 0)) // squared distances
    // bit-deterministic including the quantized ADC distances
    val again = Similarity.pqTopK(emb, q, "vec_id", "embedding", topK = 5)
      .select("query_id", "rank", "neighbor_id", "adc6")
      .as[(Long, Long, Long, Long)].collect()
    assert(topk.toSet == again.toSet)
  }

  test("trained-codebook IVF search matches seed-IVF recall shape") {
    val emb = Tables.embeddings(spark, Sf0001).filter(col("vec_id") % 5 === 0)
    val exact = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val codebook = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
      nCells = 4, iters = 2)
    val trained = Similarity.ivfTopKWith(emb, codebook, "vec_id",
      "embedding", k = 5, nProbe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect trained).size.toDouble / exact.size
    assert(recall >= 0.4, s"trained-IVF recall too low: $recall")
    val counts = Similarity.ivfTopKWith(emb, codebook, "vec_id",
      "embedding", k = 5, nProbe = 2)
      .groupBy("query_id").count().select("count").as[Long].collect()
    assert(counts.forall(_ <= 5))
  }

  test("CDC chunking re-aligns shared content across shifted offsets") {
    import spark.implicits._
    // the same long payload embedded at DIFFERENT offsets in two docs:
    // content-defined boundaries must re-align so the two docs share
    // chunks; a third unrelated doc must share none. Payload is
    // md5-varied (not periodic) so boundaries actually occur.
    val payload = (0 until 40).map(i =>
      java.util.UUID.nameUUIDFromBytes(s"cdc$i".getBytes).toString)
      .mkString(" ")
    val docs = Seq(
      (1L, "a", "PREFIX-ONE " + payload),
      (2L, "b", "a completely different and much longer prefix text " +
        payload),
      (3L, "c", (0 until 40).map(i =>
        java.util.UUID.nameUUIDFromBytes(s"other$i".getBytes).toString)
        .mkString(" "))
    ).toDF("doc_id", "source", "text")
    val c = Dedup.cdcChunks(docs, col("doc_id"), col("source"),
      col("text"), window = 8, divisor = 61, seed = 29)
    // chunks concatenate back to the exact original text per doc
    val rebuilt = c.groupBy("doc_id")
      .agg(concat_ws("", array_sort(collect_list(
        struct(col("chunk_idx"), col("chunk")))).getField("chunk"))
        .as("re"))
      .join(docs, "doc_id")
      .filter(col("re") =!= col("text")).count()
    assert(rebuilt == 0, "chunks must reassemble the original text")
    val byDoc = c.select("doc_id", "ch").as[(Long, String)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val shared12 = (byDoc(1L) intersect byDoc(2L)).size
    assert(shared12 >= 3,
      s"shifted shared payload must re-align on chunks, got $shared12")
    assert((byDoc(1L) intersect byDoc(3L)).isEmpty)
    // fixed-size blocking at the same mean length finds NO shared
    // blocks across the shifted copies — the property CDC buys
    val fixed = docs.select(col("doc_id"), posexplode(
      split(col("text"), "(?<=\\G.{64})")).as(Seq("i", "blk")))
      .withColumn("bh", md5(col("blk")))
      .select("doc_id", "bh").as[(Long, String)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    assert((fixed(1L) intersect fixed(2L)).isEmpty,
      "fixed blocking should stay misaligned under a shift")
  }

  test("SQ8 search matches a hand-computed quantizer bit for bit") {
    val emb = Tables.embeddings(spark, Sf0001).filter(col("vec_id") % 5 === 0)
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    val dim = vecs.head._2.length
    val mins = (0 until dim).map(j => vecs.map(_._2(j).toDouble).min)
    val maxs = (0 until dim).map(j => vecs.map(_._2(j).toDouble).max)
    def code(v: Seq[Float]): IndexedSeq[Long] =
      (0 until dim).map { j =>
        if (maxs(j) > mins(j))
          math.min(255L, math.max(0L,
            math.floor((v(j).toDouble - mins(j)) / (maxs(j) - mins(j))
              * 256).toLong))
        else 0L
      }
    val codes = vecs.map { case (id, v) => id -> code(v) }.toMap
    val qs = vecs.map(_._1).filter(_ % 3 == 0)
    val expected = qs.flatMap { q =>
      codes.keys.toSeq.filter(_ != q)
        .map(n => (n, (codes(q), codes(n)).zipped
          .map((a, b) => (a - b) * (a - b)).sum))
        .sortBy { case (n, d) => (d, n) }.take(5).zipWithIndex
        .map { case ((n, d), i) => (q, i + 1L, n, d) }
    }.toSet
    val got = Similarity.sq8TopK(emb,
        emb.filter(col("vec_id") % 3 === 0), "vec_id", "embedding", 5)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("SQ8 re-rank with a full shortlist equals exact brute force") {
    val emb = Tables.embeddings(spark, Sf0001).filter(col("vec_id") % 5 === 0)
    val qs = emb.filter(col("vec_id") % 3 === 0)
    val n = emb.count().toInt
    def triples(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect().toSet
    // shortlist = whole corpus → the quantized stage can drop nothing
    // and the exact pass must reproduce brute force EXACTLY (same
    // fold, same tiebreak)
    val exact = triples(Similarity.bruteForceTopK(emb, qs,
      "vec_id", "embedding", 5))
    val full = triples(Similarity.sq8RerankTopK(emb, qs,
      "vec_id", "embedding", candK = n, k = 5))
    assert(full == exact)
    // a narrow shortlist still recalls most of the exact top-5 — the
    // two-stage bargain
    val narrowIds = triples(Similarity.sq8RerankTopK(emb, qs,
      "vec_id", "embedding", candK = 10, k = 5))
      .map(t => (t._1, t._3))
    val exactIds = exact.map(t => (t._1, t._3))
    val recall = (narrowIds intersect exactIds).size.toDouble / exactIds.size
    assert(recall >= 0.5, s"two-stage recall too low: $recall")
  }

  test("two-level IVF with one group degenerates to flat IVF (s17)") {
    val emb = Tables.embeddings(spark, Sf0001)
    val qs = emb.filter(col("vec_id") % 5 === 0)
    def triples(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect().toSet
    // G = 1 puts every cell in the single group: the within-group
    // argmax ranges over ALL cells, so assignment, probing and the
    // exact tail must all reproduce the flat trained-IVF search
    val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
      nCells = 6, iters = 2)
    val flat = triples(Similarity.ivfTopKWith(emb, cents, "vec_id",
      "embedding", k = 5, nProbe = 2)
      .filter(col("query_id") % 5 === 0))
    val two = triples(Similarity.ivfTwoLevelTopK(emb, qs, "vec_id",
      "embedding", k = 5, nCells = 6, nGroups = 1, iters = 2,
      nProbe = 2))
    assert(two == flat, s"two-level(G=1) diverged from flat IVF")
    // with real groups the search still returns k well-formed rows
    // per query and respects the self-exclusion contract
    val routed = Similarity.ivfTwoLevelTopK(emb, qs, "vec_id",
      "embedding", k = 3, nCells = 6, nGroups = 2, iters = 2,
      nProbe = 2)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect()
    assert(routed.forall { case (q, _, n) => q != n })
    assert(routed.groupBy(_._1).values
      .forall(rs => rs.map(_._2).sorted.sameElements(1L to rs.length)))
  }

  test("IVF-PQ re-rank with all cells probed + full shortlist equals " +
      "brute force (s16)") {
    val emb = Tables.embeddings(spark, Sf0001).filter(col("vec_id") % 5 === 0)
    val qs = emb.filter(col("vec_id") % 3 === 0)
    val n = emb.count().toInt
    def triples(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect().toSet
    // nProbe = nCells covers every cell and shortK = n keeps every ADC
    // candidate, so the quantized stage can drop nothing: the exact
    // re-rank tail must reproduce brute force EXACTLY (same cosine
    // fold, same neighbor_id tiebreak)
    val exact = triples(Similarity.bruteForceTopK(emb, qs,
      "vec_id", "embedding", 5))
    val full = triples(Similarity.ivfPqResidualRerankTopK(emb, qs,
      "vec_id", "embedding", topK = 5, shortK = n, nCells = 4,
      ivfIters = 1, nProbe = 4, m = 8, k = 8, dim = 64, pqIters = 1,
      seed = 777))
    assert(full == exact)
    // the production shape (narrow probes + 25-shortlist) still
    // recalls well ABOVE the plain ADC top-5 — the refine bargain
    def ids(df: org.apache.spark.sql.DataFrame) = triples(df)
      .map(t => (t._1, t._3))
    val exactIds = exact.map(t => (t._1, t._3))
    val adc = ids(Similarity.ivfPqResidualTopK(emb, qs, "vec_id",
      "embedding", topK = 5, nCells = 4, ivfIters = 1, nProbe = 2,
      m = 8, k = 8, dim = 64, pqIters = 1, seed = 777))
    val rr = ids(Similarity.ivfPqResidualRerankTopK(emb, qs, "vec_id",
      "embedding", topK = 5, shortK = 25, nCells = 4, ivfIters = 1,
      nProbe = 2, m = 8, k = 8, dim = 64, pqIters = 1, seed = 777))
    val adcRecall = (adc intersect exactIds).size.toDouble / exactIds.size
    val rrRecall = (rr intersect exactIds).size.toDouble / exactIds.size
    assert(rrRecall > adcRecall,
      s"re-rank did not improve recall: adc=$adcRecall rerank=$rrRecall")
  }

  test("sign-Hamming codes pack the sign bits into 32-bit lanes exactly") {
    val df = Seq(
      (1L, Array.tabulate(64)(i => if (i % 3 == 0) 1.0f else -1.0f)),
      (2L, Array.fill(64)(-0.5f)),
      (3L, Array.fill(64)(0.0f))) // ties at zero are NOT set bits
      .toDF("vec_id", "embedding")
    val got = df.select(col("vec_id") +:
        Similarity.signCodeLanes(col("embedding"), 64, "c"): _*)
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    // dims 0,3,…,63 positive: lane0 bits {0,3,…,30} = 0x49249249,
    // lane1 bits {(33−32),(36−32),…,(63−32)} = {1,4,…,31} = 0x92492492
    assert(got(1L) == ((0x49249249L, 0x92492492L)))
    assert(got(2L) == ((0L, 0L)))
    assert(got(3L) == ((0L, 0L)))
  }

  test("sign-Hamming re-rank with a full shortlist equals brute force") {
    val emb = Tables.embeddings(spark, Sf0001).filter(col("vec_id") % 5 === 0)
    val qs = emb.filter(col("vec_id") % 3 === 0)
    val n = emb.count().toInt
    def triples(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect().toSet
    val exact = triples(Similarity.bruteForceTopK(emb, qs,
      "vec_id", "embedding", 5))
    val full = triples(Similarity.signHammingRerankTopK(emb, qs,
      "vec_id", "embedding", dim = 64, candK = n, k = 5))
    assert(full == exact)
    // 1-bit codes still steer the shortlist: a narrow Hamming scan
    // keeps most of the exact top-5
    val narrowIds = triples(Similarity.signHammingRerankTopK(emb, qs,
      "vec_id", "embedding", dim = 64, candK = 10, k = 5))
      .map(t => (t._1, t._3))
    val exactIds = exact.map(t => (t._1, t._3))
    val recall = (narrowIds intersect exactIds).size.toDouble / exactIds.size
    assert(recall >= 0.4, s"sign-Hamming recall too low: $recall")
  }

  test("Matryoshka prefix re-rank with a full shortlist equals brute force") {
    val emb = Tables.embeddings(spark, Sf0001).filter(col("vec_id") % 5 === 0)
    val qs = emb.filter(col("vec_id") % 3 === 0)
    val n = emb.count().toInt
    def triples(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect().toSet
    val exact = triples(Similarity.bruteForceTopK(emb, qs,
      "vec_id", "embedding", 5))
    val full = triples(Similarity.prefixRerankTopK(emb, qs,
      "vec_id", "embedding", pdim = 16, candK = n, k = 5))
    assert(full == exact)
    // a 16-of-64-dim shortlist still recalls most of the exact top-5
    val narrowIds = triples(Similarity.prefixRerankTopK(emb, qs,
      "vec_id", "embedding", pdim = 16, candK = 10, k = 5))
      .map(t => (t._1, t._3))
    val exactIds = exact.map(t => (t._1, t._3))
    val recall = (narrowIds intersect exactIds).size.toDouble / exactIds.size
    assert(recall >= 0.4, s"prefix recall too low: $recall")
  }

  test("IVF ANN finds identical-direction vectors and bounds candidates") {
    val emb = Tables.embeddings(spark, Sf0001).filter(col("vec_id") % 5 === 0)
    val exact = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", 5,
      nCells = 4, nProbe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    // nProbe/nCells = 1/2 the corpus is searched → recall well above that
    assert(recall >= 0.4, s"IVF recall too low: $recall")
    // every query emits at most k rows
    val counts = Similarity.ivfTopK(emb, "vec_id", "embedding", 5, 4, 2)
      .groupBy("query_id").count().select("count").as[Long].collect()
    assert(counts.forall(_ <= 5))
  }

  test("containment catches the quoted-inside pair that Jaccard misses") {
    // doc 1 is quoted verbatim inside doc 2 (with heavy wrapper), so
    // containment(1⊂2) = 1 while Jaccard is small; docs 3/4 share a
    // few trigrams but no containment
    val short1 = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, short1, "s"),
      (2L, ("intro words before the quote " + short1 +
        " and a long trailing commentary with many additional words " +
        "stretching the wrapper document much further onward still " +
        "even more filler words beyond any reasonable quote length"), "s"),
      (3L, "alpha beta gamma completely different ending here", "s"),
      (4L, "unrelated text with no shared trigrams at all present", "s")
    ).toDF("doc_id", "text", "source")
    val out = Dedup.containmentSameKey(docs, col("doc_id"), col("text"),
        col("source"), n = 3, minContainment = 0.9)
      .select("doc_a", "doc_b", "containment", "jaccard")
      .as[(Long, Long, Double, Double)].collect()
    assert(out.length == 1)
    val (a, b, c, j) = (out.head._1, out.head._2, out.head._3, out.head._4)
    assert(a == 1L && b == 2L)
    assert(c == 1.0) // every trigram of the short doc is in the wrapper
    assert(j < 0.5, s"the caught pair must be one Jaccard would drop: $j")
  }
}
