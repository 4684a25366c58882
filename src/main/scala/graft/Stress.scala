package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** Scale-up probe: multiply the sf0.1 corpus N× with deterministic
  * per-copy perturbations (each copy appends a distinct marker token, so
  * copies of a doc are genuine near-duplicates of each other — a
  * realistic dedup workload, unlike exact replication which degenerates)
  * and time the shuffle-heavy operators. The point is the growth CURVE:
  * LSH/banded operators should scale near-linearly in corpus size while
  * exact all-pairs ops grow quadratically — evidence for the 100 TB
  * design claims in README §Scale design.
  *
  * Usage: runMain graft.Stress [multiplier] (default 10)
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val mult = if (args.nonEmpty) args(0).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.installOptimizations(spark)
    val sf = "/root/testdata/sf0.1"

    def scaled(df: DataFrame, idCol: String, textCol: Option[String])
        : DataFrame = {
      val copies = (0 until mult).map { i =>
        val shifted = df.withColumn(idCol, col(idCol) + lit(i * 10000000L))
        textCol match {
          case Some(t) if i > 0 =>
            shifted.withColumn(t, concat(col(t), lit(s" copymarker$i")))
          case _ => shifted
        }
      }
      copies.reduce(_ unionByName _)
    }

    val docs = scaled(Tables.documents(spark, sf), "doc_id", Some("text"))
      .persist()
    val emb = scaled(Tables.embeddings(spark, sf), "vec_id", None).persist()
    // the changelog-shaped probes (as-of, SCD2): copies shift the KEY
    // space too, so per-key state stays constant as the corpus grows
    val ev = scaled(Tables.events(spark, sf), "event_id", None)
      .withColumn("user_id",
        col("user_id") + expr("event_id div 10000000") * 10000000L)
      .persist()
    // warm ALL shared inputs before any probe so timed regions measure
    // the operator, not input construction
    println(s"docs=${docs.count()} embeddings=${emb.count()} " +
      s"events=${ev.count()} (x$mult)")

    // SPARK_GRAFT_STRESS_ONLY=name1,name2 runs a subset (substring
    // match) — local iteration aid, mirrors SPARK_GRAFT_BENCH_ONLY
    val only = sys.env.get("SPARK_GRAFT_STRESS_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def t(name: String)(f: => Long): Unit = {
      if (only.exists(names => !names.exists(name.contains))) return
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
      InternalCaches.releaseAll()
      spark.catalog.clearCache()
      // clearCache drops EVERY cached relation — re-pin (and
      // re-materialize lazily) the shared inputs for the next probe
      docs.persist(); emb.persist(); ev.persist()
      docs.count(); emb.count(); ev.count()
    }
    // a sub-leg inside a t() block, run TWICE: the first execution
    // absorbs the JIT/codegen/GC debt the block's own setup leaves in
    // the JVM (measured 7.5–13.9 s single-shot spread on identical
    // serve code, while a warmed JVM repeats within ~10%), so the
    // steady number is the leg's cost and first quantifies warm-up
    def leg(name: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val n = f
      val first = (System.nanoTime() - t0) / 1e9
      InternalCaches.releaseAll()
      val t1 = System.nanoTime()
      val n2 = f
      val steady = (System.nanoTime() - t1) / 1e9
      require(n2 == n, s"$name: unstable row count $n vs $n2")
      println(f"    $name=$steady%.2fs (first=$first%.2fs) rows=$n")
      InternalCaches.releaseAll()
      n
    }

    t("d1_exact_dedup") {
      Dedup.exact(docs, col("doc_id"), col("text")).count()
    }
    t("d2_minhash_lsh") {
      val mh = Dedup.minhash(docs, col("doc_id"), col("text"), 8).persist()
      Dedup.minhashJaccard(Dedup.lshCandidates(mh, 2), mh, 8).count()
    }
    t("d4_simhash") {
      Dedup.simhash(docs, col("doc_id"), col("text")).count()
    }
    t("d5_simhash_pairs") {
      Dedup.simhashPairs(
        Dedup.simhash(docs, col("doc_id"), col("text")), 3).count()
    }
    // index sizes must scale with the corpus: constant cells/planes
    // means per-bucket population (and so per-query candidates) grows
    // linearly and total ANN work quadratically. Hold TARGET CELL SIZE
    // constant instead — cells ∝ n, candidates/query constant, total
    // work linear. Since round 2 that heuristic IS the operators'
    // default (Similarity.autoPlanes/autoCells) — this probe exercises
    // the defaults directly.
    t("s2_ann_lsh(auto)") {
      Similarity.annTopK(emb, "vec_id", "embedding", 5,
        probeBits = 1, dim = 64).count()
    }
    t("s3_ann_ivf(auto)") {
      Similarity.ivfTopK(emb, "vec_id", "embedding", 5, nProbe = 2).count()
    }
    t("t5_tfidf") {
      TextAnalysis.tfidf(docs, col("doc_id"), col("text"))
        .groupBy("token").agg(sum("tfidf")).count()
    }
    // pairs → clusters: the copy groups make every doc a member of a
    // mult-sized near-dup clique, so the component graph is dense —
    // worst-case for the propagation loop (rounds stay O(log diameter))
    t("d8_components") {
      Dedup.dedupComponents(
        Dedup.simhashPairs(
          Dedup.simhash(docs, col("doc_id"), col("text")), 3)
          .select(col("doc_a"), col("doc_b"))).count()
    }
    t("d9_segment_dedup") {
      Dedup.segmentDedup(docs, col("doc_id"), col("text"), 10).count()
    }
    t("p2_sequence_packing") {
      Curation.packSequences(docs, col("doc_id"), col("source"),
        size(TextAnalysis.tokens(col("text"))), ctxLen = 128, seed = 17,
        buckets = 32).count()
    }
    t("s4_kmeans(auto)") {
      Similarity.kmeansRefine(emb, "vec_id", "embedding", iters = 2).count()
    }
    // ADC is compressed EXHAUSTIVE search — per-query cost is linear in
    // the corpus by design. Hold the query count FIXED (the base-copy
    // queries only) so the probe measures corpus growth, not the
    // workload growing quadratically because queries are a fixed
    // fraction of the corpus.
    val pqQueries = emb.filter(col("vec_id") < 2000 &&
      col("vec_id") % 25 === 0)
    t("s6_pq_adc") {
      Similarity.pqTopK(emb, pqQueries,
        "vec_id", "embedding", topK = 5).count()
    }
    t("s7_pq_trained") {
      val cb = Similarity.pqTrainCodebooks(emb, "vec_id", "embedding",
        m = 8, k = 8, dim = 64, iters = 2, seed = 777)
      Similarity.pqTopKWith(emb, cb, pqQueries,
        "vec_id", "embedding", topK = 5, m = 8, dim = 64).count()
    }
    t("t13_bigram_lm") {
      TextAnalysis.bigramLogProb(docs, col("doc_id"), col("text")).count()
    }
    t("q37_hll_sketch") {
      Sketches.hllDistinct(docs, Seq(
        "doc_id" -> col("doc_id"), "source" -> col("source")),
        p = 8, seed = 5).count()
    }
    t("d10_triangles") {
      Dedup.triangles(
        Similarity.lshNearDup(emb, "vec_id", "embedding",
          nPlanes = Similarity.autoPlanes(emb.count()), dim = 64,
          threshold = 0.2)
          .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))).count()
    }
    t("q49_asof_native") {
      Events.asofJoinNative(
        ev.filter(col("event_type") === "purchase"),
        ev.filter(col("event_type") === "view"),
        "user_id", "ts", "event_id", "event_id").count()
    }
    // the composed window twin on the same input — head-to-head with
    // the custom operator at every scale
    t("q20_asof_composed") {
      Events.asofJoin(
        ev.filter(col("event_type") === "purchase"),
        ev.filter(col("event_type") === "view"),
        "user_id", "ts", "event_id", "event_id").count()
    }
    t("q51_scd2") {
      ChangeData.scd2(ev, col("user_id"),
        unix_micros(col("ts").cast("timestamp")),
        col("event_type"), col("event_id")).count()
    }
    t("q50_zorder_audit") {
      val o = scaled(Tables.orders(spark, sf), "o_orderkey", None)
      Layout.compareLayouts(
        o.select(col("o_custkey"),
          datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")
            .as("days")),
        col("o_custkey"), col("days"), buckets = 64,
        xLo = 100L, xHi = 400L, yLo = 8766L, yHi = 9131L).count()
    }
    // head-to-head with the relational q37 probe above: same sketch,
    // m-byte partials instead of a register-file groupBy
    t("q53_hll_agg_native") {
      docs.select(col("doc_id").cast("string").as("k"))
        .agg(Sketches.hllAggNative(col("k"), 8, 5)).count()
    }
    t("p1_pipeline") {
      val scored = docs
        .withColumn("q", TextAnalysis.qualityScore(col("text")))
      val mh = Dedup.minhash(docs, col("doc_id"), col("text"), 8).persist()
      val dupDrop = Dedup.minhashJaccard(Dedup.lshCandidates(mh, 2), mh, 8)
        .filter(col("est_jaccard") >= 0.5)
        .select(col("doc_b").as("doc_id")).distinct()
      scored.filter(col("q") >= 0.5)
        .join(dupDrop, Seq("doc_id"), "left_anti")
        .groupBy(col("lang")).count().count()
    }
    // —— round-4 additions ——
    // SemDeDup: pairwise work confined to cells; autoCells (⌈√n⌉)
    // keeps per-cell population ~√n, so total work grows ~n^1.5 —
    // the curve to watch vs d6's n²
    t("s8_semantic_dedup(auto)") {
      Similarity.semanticDedup(emb, "vec_id", "embedding",
        iters = 2, tau = 0.35).count()
    }
    // incremental ingest: the batch is the base copy, the corpus is
    // everything else — existing-side work is index-shaped (bands),
    // so the probe should track BATCH size, not corpus size
    t("d11_incremental(auto)") {
      Dedup.incrementalNearDup(
        docs.filter(col("doc_id") >= 10000000L),
        docs.filter(col("doc_id") < 10000000L),
        col("doc_id"), col("text")).count()
    }
    t("t14_chunking") {
      Curation.chunkDocuments(docs, col("doc_id"), col("text"),
        chunkLen = 64, stride = 48).count()
    }
    t("t15_nb_classifier") {
      TextAnalysis.nbLangIdConfusion(docs, col("doc_id"), col("text"),
        col("lang")).count()
    }
    // span excision: gram-explode + count + dup join + per-doc
    // collect — every stage keyed, should grow ~linearly. Summing
    // n_removed AND surv_sum: a bare count() would let Catalyst
    // eliminate the 1:1 left join and prune the mask/hash work
    t("d13_substring_dedup") {
      Dedup.exciseDuplicateSpans(docs, col("doc_id"), col("text"),
        spanLen = 8)
        .agg(sum(col("n_removed")).as("r"), sum(col("surv_sum")))
        .head().getLong(0)
    }
    // CDC: boundary detection is per-row (no shuffle); the chunk-hash
    // aggregate + membership join are md5-keyed — the curve should be
    // near-linear while DUPLICATED chunk chars grow superlinearly
    // (every copy shares chunks with every other copy)
    t("d14_cdc_chunks") {
      val c = Dedup.cdcChunks(docs, col("doc_id"), col("source"),
        col("text"), window = 8, divisor = 61, seed = 29)
        .persist()
      try {
        val freq = c.groupBy(col("ch")).agg(count(lit(1)).as("cnt"))
        c.join(freq, Seq("ch"))
          .agg(sum(when(col("cnt") >= 2, col("chunk_len"))
            .otherwise(0L)).as("dup_chars"))
          .head().getLong(0)
      } finally c.unpersist(false)
    }
    // BPE: word-count+top-V is the corpus-scale part; training cost
    // is bounded by the vocab cap, apply is a codegen'd replace
    // chain — total should grow ~linearly with corpus size
    t("t16_bpe_train+apply") {
      val merges = Bpe.train(Bpe.vocab(docs, col("text"), 4096), 16)
      // head() on the sum, NOT count(): count() lets column pruning
      // drop the aggregate expression and the apply chain would never
      // execute — the probe would time only the scan
      Bpe.words(docs, col("text"))
        .select(sum(Bpe.tokenCount(
          Bpe.applyMerges(col("word"), merges))).cast("long").as("s"))
        .head().getLong(0)
    }
    // IVF-PQ with fixed queries: candidates/query ≈ n·nProbe/nCells;
    // with auto cells that is ~√n — sublinear per query where s6/s7
    // are linear
    t("s10_ivfpq") {
      Similarity.ivfPqTopK(emb, pqQueries, "vec_id", "embedding",
        topK = 5, nCells = Similarity.autoCells(emb.count()),
        ivfIters = 2, nProbe = 2, m = 8, k = 8, dim = 64, pqIters = 2,
        seed = 777).count()
    }
    t("d12_pagerank") {
      Dedup.pageRank(
        Dedup.simhashPairs(
          Dedup.simhash(docs, col("doc_id"), col("text")), 3)
          .select(col("doc_a"), col("doc_b")), iters = 3).count()
    }
    // residual IVF-PQ: same routing curve as s10 plus the per-(query,
    // cell) residual LUT — still broadcast-sized at any corpus scale
    t("s11_ivfpq_residual") {
      Similarity.ivfPqResidualTopK(emb, pqQueries, "vec_id",
        "embedding", topK = 5,
        nCells = Similarity.autoCells(emb.count()), ivfIters = 2,
        nProbe = 2, m = 8, k = 8, dim = 64, pqIters = 2,
        seed = 777).count()
    }
    // binary/truncated rerank family with FIXED queries: both scans
    // are linear in the corpus per query (8 bytes/vector for s14,
    // 16 of 64 float lanes for s15) — the curve should track s6's
    // slope at a fraction of its constant
    t("s14_sign_hamming") {
      Similarity.signHammingRerankTopK(emb, pqQueries, "vec_id",
        "embedding", dim = 64, candK = 50, k = 5).count()
    }
    t("s15_matryoshka") {
      Similarity.prefixRerankTopK(emb, pqQueries, "vec_id",
        "embedding", pdim = 16, candK = 50, k = 5).count()
    }
    // DSIR: two corpus-sized hash-agg passes plus a broadcast of the
    // 256-bucket model — the curve should be linear with a flat model
    // cost; the Gumbel draw is TakeOrdered (k·partitions rows merged)
    t("t20_dsir_select") {
      TextAnalysis.dsirSelect(docs, "doc_id", "text",
        col("lang") === "en", nBuckets = 256, k = 100).count()
    }
    // canonical dedup = d8's cluster relation + one window over the
    // membership — the delta over d8 must stay O(n log n)
    t("p6_canonical_dedup") {
      val pairs = Dedup.simhashPairs(
        Dedup.simhash(docs, col("doc_id"), col("text")), 3)
        .select(col("doc_a"), col("doc_b"))
      val comp = Dedup.dedupComponents(pairs)
        .select(col("doc_id"), col("component"))
      val scored = docs.select(col("doc_id"), col("lang"),
        round(TextAnalysis.qualityScore(col("text")) * 1e6)
          .cast("long").as("q6"))
      val withComp = scored.join(comp, Seq("doc_id"), "left")
        .withColumn("component",
          coalesce(col("component"), col("doc_id")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("component"))
        .orderBy(col("q6").desc, col("doc_id").asc)
      withComp.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1).count()
    }
    // inverted index: one explode + (tok, block)-keyed aggregate —
    // should track t5's near-linear curve; block cells bound the
    // payload any single reducer assembles even though hot tokens'
    // full posting lists grow with the corpus
    t("t24_inverted_index") {
      graft.operators.InvertedIndex.indexCensus(docs, col("doc_id"),
        col("text"), blockSize = 64, seed = 13).count()
    }
    // refine tail: s11's routed ADC plus ONE extra corpus scan for
    // the broadcast-shortlist exact re-rank — the delta over s11
    // should stay a near-constant increment, not a new growth term
    t("s16_ivfpq_rerank") {
      Similarity.ivfPqResidualRerankTopK(emb, pqQueries, "vec_id",
        "embedding", topK = 5, shortK = 25,
        nCells = Similarity.autoCells(emb.count()), ivfIters = 2,
        nProbe = 2, m = 8, k = 8, dim = 64, pqIters = 2,
        seed = 777).count()
    }
    // two-level routing: n·(G + C/G) dots vs the flat n·C — compare
    // against s3/s5's flat curves; G = ⌈√C⌉ gives the n^1.25 shape
    t("s17_ivf_twolevel") {
      val cells = Similarity.autoCells(emb.count())
      Similarity.ivfTwoLevelTopK(emb, pqQueries, "vec_id", "embedding",
        k = 5, nCells = cells,
        nGroups = math.max(2, math.ceil(math.sqrt(cells)).toInt),
        iters = 2, nProbe = 2).count()
    }
    // —— round-6 additions: lakehouse scale claims ——
    // q80/q88 data skipping: a range-clustered commit with file count
    // ∝ corpus, then a FIXED-width key-range read. The claim under
    // test: files opened / files total ≈ range fraction regardless of
    // table size (manifest pruning decides from O(files) metadata,
    // zero data I/O for the rest) — the probe prints the ratio next
    // to the time so the curve and the selectivity are both receipts
    t("q80_skipping(clustered)") {
      import graft.sources.VersionedTable
      val dir = java.nio.file.Files
        .createTempDirectory("stress_q80").toString
      val keyed = docs.select(col("doc_id"), col("lang"),
        col("n_chars"))
      val (v, n) = Layout.rangeClusteredCommit(keyed, "doc_id",
        "doc_id", nShards = 16 * mult, dir = dir)
      // fixed absolute key range over the base copy's id space
      val (files, total) = VersionedTable.filesInRange(
        spark, dir, v, 100L, 1099L)
      val cnt = VersionedTable.readVersionWhere(spark, dir, v,
        100L, 1099L).count()
      println(f"    q80 receipt: opened=${files.size} of $total files " +
        f"(n=$n rows)")
      cnt
    }
    // q82 partial OPTIMIZE: the table carries mult-proportional BULK
    // data in at-target files plus a CONSTANT 20 small appended
    // shards. O(small files) means the probe's time stays flat as
    // mult grows — a full copy-on-write would grow linearly
    t("q82_optimize(small-files)") {
      import graft.sources.VersionedTable
      val dir = java.nio.file.Files
        .createTempDirectory("stress_q82").toString
      val bulk = docs.select(col("doc_id"), col("text"), col("lang"))
      VersionedTable.commit(bulk.repartition(2), dir)
      val small = Tables.documents(spark, sf)
        .select(col("doc_id"), col("text"), col("lang"))
        .filter(col("doc_id") % 100 === 0)
      for (i <- 0 until 20)
        VersionedTable.appendCommit(
          small.withColumn("doc_id", col("doc_id") + lit(i * 100000000L))
            .coalesce(1), dir)
      val before = VersionedTable.fileSizes(spark, dir,
        VersionedTable.versions(spark, dir).last)
      val target = 96L * 1024
      val t0 = System.nanoTime()
      val v = VersionedTable.optimizeCommit(spark, dir, target)
      val optSec = (System.nanoTime() - t0) / 1e9
      val after = VersionedTable.fileSizes(spark, dir, v)
      println(f"    q82 receipt: optimize=$optSec%.2fs files " +
        f"${before.size}->${after.size} " +
        f"(small=${before.count(_._2 < target)})")
      after.size.toLong
    }
    // t26 BM25: the vocab relation stays CONSTANT as the corpus grows
    // (copies reuse the base vocabulary + one marker token per copy),
    // so idf/query-term broadcasts are flat and the only growing
    // relation is the (query, doc) candidate pair set — linear with a
    // FIXED query count (base-copy queries only)
    t("t26_bm25(fixed-queries)") {
      TextAnalysis.bm25TopK(docs, col("doc_id"), col("text"),
        col("doc_id") % 500 === 0 && col("doc_id") < 10000000L,
        k = 5).count()
    }
    // s18 fusion legs: both shortlists are k·|Q| rows independent of
    // the corpus — the fusion join/window must stay FLAT as mult grows
    // (only the legs' own generation cost scales)
    t("s18_rrf_fusion(fixed-queries)") {
      val isQ = col("doc_id") % 500 === 0 && col("doc_id") < 10000000L
      val lex = TextAnalysis.bm25TopK(docs, col("doc_id"), col("text"),
        isQ, k = 20)
      val dense = Similarity.bruteForceTopK(emb,
        emb.filter(col("vec_id") % 500 === 0 &&
          col("vec_id") < 10000000L), "vec_id", "embedding", 20)
        .withColumnRenamed("neighbor_id", "doc_id")
      Similarity.rrfFuseTopK(lex, dense, k = 5).count()
    }
    // s19 recall census with FIXED queries: the exact leg is linear in
    // the corpus per query (it IS the ground truth), the trained-IVF
    // leg is sublinear, and the census join is k·|Q| — flat
    t("s19_recall(fixed-queries)") {
      val q = emb.filter(col("vec_id") % 500 === 0 &&
        col("vec_id") < 10000000L)
      val codebook = Similarity.kmeansCentroids(emb, "vec_id",
        "embedding", nCells = Similarity.autoCells(emb.count()),
        iters = 2)
      val approx = Similarity.ivfTopKWithQueries(emb, codebook, q,
        "vec_id", "embedding", k = 5, nProbe = 2)
      val exact = Similarity.bruteForceTopK(emb, q, "vec_id",
        "embedding", 5)
      Similarity.recallCensus(exact, approx).count()
    }
    // s22 cell balance on a DETERMINISTICALLY SKEWED corpus (4/5 of
    // vectors pulled toward the all-ones direction): the repair cost
    // is proportional to the HOT population, and the receipt is the
    // before/after max-cell census — the hot-reducer (and recall-sink)
    // bound the balanced codebook must restore at any corpus size
    t("s22_ivf_balanced(skew)") {
      val skew = emb.select(col("vec_id"),
        when(col("vec_id") % 5 === 0,
            transform(col("embedding"), x => x.cast("double")))
          .otherwise(transform(col("embedding"),
            x => lit(1.0) + lit(0.1) * x.cast("double")))
          .as("embedding")).persist()
      val n = skew.count()
      val nc = Similarity.autoCells(n)
      val cap = math.ceil(2.0 * n / nc).toLong
      def maxCell(cents: DataFrame): Long = {
        val e = skew.select(col("vec_id"), col("embedding").as("v"))
          .withColumn("nrm", Similarity.norm(col("v")))
        val cw = cents.select(col("cell_id"), col("centroid").as("cv"))
          .withColumn("cnrm", Similarity.norm(col("cv")))
        e.crossJoin(broadcast(cw))
          .withColumn("sim", Similarity.dot(col("v"), col("cv")) /
            (col("nrm") * col("cnrm")))
          .groupBy(col("vec_id"))
          .agg(max(struct(col("sim"), (-col("cell_id")).as("ng"),
            col("cell_id").as("c"))).as("m"))
          .groupBy(col("m.c")).agg(count(lit(1)).as("cnt"))
          .agg(max("cnt")).head().getLong(0)
      }
      val flat = Similarity.kmeansCentroids(skew, "vec_id",
        "embedding", nc, iters = 2).persist()
      val bal = Similarity.balancedCentroids(skew, "vec_id",
        "embedding", nc, iters = 2).persist()
      val nBal = bal.count()
      println(s"    s22 receipt: cells $nc->$nBal cap=$cap " +
        s"maxCell flat=${maxCell(flat)} balanced=${maxCell(bal)}")
      skew.unpersist()
      nBal
    }
    // t30 index-served BM25 with the SAME fixed queries as the t26 row
    // above — the head-to-head is the index-vs-rescan claim; the
    // blocks receipt is the pruning evidence (on this closed-vocab
    // corpus every block posts every term, so read≈total here — the
    // Zipf-corpus spec is the skip-rate proof; what must NOT grow is
    // the per-query read count relative to blocks_total)
    t("t30_bm25_wand(fixed-queries)") {
      val isQ = col("doc_id") % 500 === 0 && col("doc_id") < 10000000L
      // one core pass serves both outputs — the separate wrappers
      // would build the index and compute θ twice
      val (topk, rec) = InvertedIndex.bm25FromIndexWithReceipts(docs,
        col("doc_id"), col("text"), isQ, k = 5)
      val n = topk.count()
      val r = rec.agg(sum("blocks_total"), sum("blocks_read")).head()
      println(s"    t30 receipt: blocks total=${r.getLong(0)} " +
        s"read=${r.getLong(1)}")
      n
    }
    // the five-tier corpus build end to end: gates are map stages,
    // exact dedup a fingerprint groupBy, near-dup the banded simhash +
    // component closure (the copy cliques make it the dominant tier),
    // decontamination a broadcast probe, packing a prefix sum — the
    // census receipt shows where the corpus thins at every scale
    t("p9_corpus_build") {
      val merges = Bpe.train(Bpe.vocab(docs, col("text"), 4096), 16)
      val census = Curation.corpusBuildCensus(docs, col("doc_id"),
        col("text"), col("source"), merges)
      val rows = census.collect().sortBy(_.getLong(0))
      println("    p9 receipt: " + rows.map(r =>
        s"${r.getString(1)} ${r.getLong(2)}->${r.getLong(3)}")
        .mkString(", "))
      rows.length.toLong
    }
    // incremental refresh with the BATCH HELD FIXED while the state
    // grows with the corpus — the claim under test: admission cost
    // tracks the batch and its candidate set, with the state
    // contributing one linear signature scan (no state-wide shuffle;
    // the batch-bounded candidate set broadcasts AGAINST it). Compare
    // against the p9 rebuild at the same multiplier: rebuilding
    // re-pays the whole corpus every time, refreshing does not
    t("p10_corpus_refresh(fixed-batch)") {
      val state = docs.filter(col("doc_id") % 10 =!= 7)
      val batch = docs.filter(col("doc_id") % 10 === 7 &&
        col("doc_id") < 10000000L)
      val census = Curation.corpusRefreshCensus(state, batch,
        col("doc_id"), col("text"))
      val rows = census.collect().sortBy(_.getLong(0))
      println("    p10 receipt: " + rows.map(r =>
        s"${r.getString(1)} ${r.getLong(2)}->${r.getLong(3)}")
        .mkString(", "))
      rows.length.toLong
    }
    // shuffle-free map stage: must be exactly linear in corpus bytes
    t("t29_char_entropy") {
      TextAnalysis.charEntropy(docs, col("doc_id"), col("text")).count()
    }
    // two percentile aggs + broadcast-back: linear, no fact-side join
    t("q97_robust_outliers") {
      Events.robustOutliers(ev, "event_type", "event_id", "value",
        cutoff = 3.5).count()
    }
    // per-step user-keyed min-joins: linear in events, state ∝ users
    t("q99_funnel") {
      Events.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), windowUs = 86400000000L)
        .count()
    }
    // two scalable range-ranks: near-linear, no per-stage window
    t("p7_curriculum") {
      Curation.curriculumOrder(docs, col("doc_id"), col("n_chars"),
        nStages = 4, seed = 11).count()
    }
    // fixed query set: candidate generation scales with the corpus,
    // but the MMR rounds only ever touch m rows per query — the gap
    // between this curve and s1's IS the bounded-shortlist claim
    t("s20_mmr(fixed-queries)") {
      Similarity.mmrDiversify(emb,
        emb.filter(col("vec_id") % 500 === 0 &&
          col("vec_id") < 10000000L),
        "vec_id", "embedding", m = 8, k = 3, lambda = 0.5).count()
    }
    // one-sided delta refresh (the fact-append case): the delta stays
    // the original sf0.1 slice while the base grows with mult — the
    // refresh cost must track the DELTA (AQE collapses the empty-ΔB
    // join terms), not the base
    t("q98_ivm_delta(fixed-delta)") {
      val a = ev.select(col("user_id").as("k"),
        round(col("value") * 1e6).cast("long").as("m6"))
      val da = ev.filter(col("event_id") < 10000000L)
        .select(col("user_id").as("k"),
          round(col("value") * 1e6).cast("long").as("m6"))
      val a0 = ev.filter(col("event_id") >= 10000000L)
        .select(col("user_id").as("k"),
          round(col("value") * 1e6).cast("long").as("m6"))
      val b0 = a.select(col("k")).distinct()
        .withColumn("g", (col("k") % 16).cast("string"))
      val db = b0.limit(0)
      val v0 = b0.select(col("g").as("grp")).distinct()
        .withColumn("cnt", lit(0L)).withColumn("msum", lit(0L))
      ChangeData.viewMergeAdd(v0,
        ChangeData.joinAggDelta(a0, da, b0, db, "k", col("g"),
          col("m6"))).count()
    }
    // O(dims) metadata collect + a shuffle-free projection
    t("s21_opq_permute") {
      val perm = Similarity.dimEnergyPermutation(emb, "embedding",
        dim = 64, m = 8)
      Similarity.permuteVec(emb, "embedding", perm).count()
    }
    // 3 synchronous rounds over the near-dup graph: edge relation
    // grows with the copy cliques (the d8/d12 workload), each round a
    // vertex-keyed join + count + window argmax
    t("d19_label_propagation") {
      Dedup.labelPropagation(
        Dedup.simhashPairs(
          Dedup.simhash(docs, col("doc_id"), col("text")), 3)
          .select(col("doc_a"), col("doc_b")), iters = 3).count()
    }
    // (key, shingle) co-occurrence self-join: output-bound like d3 —
    // copy cliques inflate co-occurring pairs
    t("d20_containment") {
      Dedup.containmentSameKey(docs, col("doc_id"), col("text"),
        col("source"), n = 3, minContainment = 0.9).count()
    }
    // the candidate-bounded twin: same pairs, but candidates come from
    // rarest-prefix × full-set joins — the receipt (prefix vs cooc
    // candidate pairs) is the df²-term kill, head-to-head with d20
    t("d21_prefix_containment") {
      val n = Dedup.prefixContainmentJoin(docs, col("doc_id"),
        col("text"), col("source"), n = 3, thresholdPct = 90).count()
      val (pp, cp) = Dedup.prefixContainmentReceipt(docs,
        col("doc_id"), col("text"), col("source"), n = 3,
        thresholdPct = 90)
      println(s"    d21 receipt: prefix candidates=$pp cooc=$cp")
      n
    }
    // p2's prefix-sum layout + the window explode: near-linear
    t("p8_window_manifest") {
      Curation.packedWindowManifest(
        Curation.packSequences(docs, col("doc_id"), col("source"),
          size(TextAnalysis.tokens(col("text"))), ctxLen = 128,
          seed = 17, buckets = 8), ctxLen = 128).count()
    }
    // per-row codec decode + media-keyed islands: linear map stage
    t("m8_audio_vad") {
      Multimodal.vadSegments(
        docs.select(col("doc_id").as("media_id"),
          (lit(160) + (col("doc_id") % 80) * 2).cast("int").as("ns"))
          .withColumn("blob",
            Multimodal.synthBurstWavUdf(col("media_id"), col("ns"))),
        col("media_id"), col("blob"), win = 40,
        threshold = 1000000L).count()
    }
    // graph-tier ANN with FIXED queries: the graph build is the banded
    // IVF top-k (cells ∝ n via autoCells, per-node candidates
    // constant), and the beam search's per-query work is bounded by
    // beam·degree·rounds — both legs must stay near-linear while the
    // corpus grows
    val nswQueries = emb.filter(col("vec_id") < 2000 &&
      col("vec_id") % 25 === 0)
    t("s24_nsw_beam(fixed-queries)") {
      Similarity.nswTopK(emb, nswQueries, "vec_id", "embedding",
        k = 5, nCells = Similarity.autoCells(emb.count()), iters = 2,
        degree = 6, nProbeBuild = 2, beamWidth = 8, rounds = 3).count()
    }
    // streaming IVF append: base 9/10 trains + indexes, the FIXED
    // batch (1/10 of the base copy) appends at stored centroids —
    // the append leg's cost must track the batch while the index
    // grows; trigger census is metadata-sized
    t("s25_ivf_append(fixed-batch)") {
      val base = emb.filter(col("vec_id") % 10 =!= 7)
      val batch = emb.filter(col("vec_id") % 10 === 7 &&
        col("vec_id") < 2000000L)
      val (cents, baseIdx) = Similarity.buildIvfIndex(base, "vec_id",
        "embedding", Similarity.autoCells(base.count()), 2)
      val idx = baseIdx.unionByName(
        Similarity.appendToIndex(batch, cents, "vec_id", "embedding"))
      val hot = Similarity.appendRebalanceTrigger(idx,
        Similarity.autoCells(base.count()))
        .filter(col("hot")).count()
      val n = Similarity.ivfSearchIndexed(idx, cents, nswQueries,
        "vec_id", "embedding", 5, 2).count()
      println(s"    s25 receipt: hot_cells=$hot")
      n
    }
    // byte-level BPE: corpus-scale work is ONE pre-token count
    // (explode + map-side-combined agg); training runs over the
    // bounded top-V sketch, apply is a codegen'd replace fold
    t("t35_byte_bpe") {
      val merges = Bpe.trainEncoded(
        Bpe.byteVocab(docs, col("text"), 4096), 16)
      Bpe.byteWords(docs, col("text"))
        .select(Bpe.tokenCount(
          Bpe.applyByteMerges(col("word"), merges)).as("np"))
        .agg(sum(col("np"))).collect().length.toLong
    }
    // segment-served BM25 with fixed queries: per-segment build is
    // one keyed aggregate, compaction re-aggregates the prefix once,
    // serving cost tracks the query shortlist
    t("t36_segment_merge(fixed-queries)") {
      val isQ = col("doc_id") % 500 === 0 && col("doc_id") < 10000000L
      InvertedIndex.segmentServedBm25(docs, col("doc_id"),
        col("text"), isQ, nBatches = 11, every = 4, k = 5).count()
    }
    // line-frequency template mining: (source, line)-keyed counts +
    // a broadcast anti-join + per-doc reassembly — every stage keyed,
    // nothing corpus-global
    t("t37_boilerplate") {
      val seeded = docs.withColumn("text",
        concat_ws("\n",
          when(col("doc_id") % 4 =!= 3,
            concat(lit("navigation home about contact "),
              col("source"))),
          col("text"),
          when(col("doc_id") % 2 === 0,
            concat(lit("copyright "), col("source"),
              lit(" all rights reserved")))))
      Curation.boilerplateCensus(seeded, col("doc_id"), col("text"),
        col("source"), frac = 0.3).count()
    }
    // model-based quality filter: each GD iteration is one corpus
    // pass (the (doc, bucket) feature relation map-side combines into
    // 65 gradient rows, weights broadcast back) — iters fixed, so
    // time must track the corpus linearly
    t("t38_quality_filter") {
      TextAnalysis.qualityClassifierCensus(docs, col("doc_id"),
        col("text"), col("source"), (1 to 19 by 2).map("src" + _))
        .count()
    }
    // layered-entry graph ANN with FIXED queries: brute entry is
    // |Q|·n/ratio (the declared coarse tier), the rest is the s24
    // beam — per-query serving work bounded by entry + beam·degree·
    // rounds
    t("s26_hnsw(fixed-queries)") {
      Similarity.hnswTopK(emb, nswQueries, "vec_id", "embedding",
        k = 5, nCells = Similarity.autoCells(emb.count()), iters = 2,
        degree = 6, nProbeBuild = 2, beamWidth = 8, rounds = 3,
        layerRatio = 16, nLayers = 2, entryWidth = 2).count()
    }
    // leakage-free split: the cost IS d8's banded pair + closure
    // machinery (already curve-covered); the split adds one
    // broadcast join + a per-row hash — the row proves the
    // composition inherits the banded scaling, not all-pairs
    t("p12_leakage_split") {
      Curation.leakageFreeSplit(docs, col("doc_id"), col("text"))
        .groupBy(col("split")).count().count()
    }
    // datasheet: source-keyed aggregates only, nothing corpus-global
    t("p11_datasheet") {
      Curation.corpusDatasheet(docs, col("doc_id"), col("text"),
        col("source"), col("lang"), col("n_chars")).count()
    }
    // graph-index APPEND with a FIXED batch: the base index grows
    // with the corpus but is built OUTSIDE the timed region (it is
    // the amortized artifact); the timed leg is assign-to-stored-
    // centroids + re-derive edges for srcs probing a touched cell +
    // serve. Touched-cell population is what the append pays —
    // with cells ∝ √n and a fixed batch, affected srcs per cell
    // shrink as cells multiply, so the leg must grow sublinearly
    t("s31_graph_append(fixed-batch)") {
      val base = emb.filter(col("vec_id") % 10 =!= 7)
      val batch = emb.filter(col("vec_id") % 10 === 7 &&
        col("vec_id") < 2000000L)
      // the stored index round-trips through parquet exactly like
      // the registered entry: the file scan IS the lineage cut. An
      // in-memory persisted index keeps the full build tree hanging
      // off every leaf, and the serve's iterative beam plans re-pay
      // catalyst analysis over it each round — measured 74 s vs
      // 11 s for the SAME data at x1 before this round-trip
      val dir = java.nio.file.Files
        .createTempDirectory("s31stress").toString
      val cents = Similarity.kmeansCentroids(base, "vec_id",
        "embedding", Similarity.autoCells(base.count()), 2)
      val (top1, graphs1, ranked1) = Similarity
        .buildHnswGraphIndexWith(base, cents, "vec_id", "embedding",
          degree = 6, nProbeBuild = 2, layerRatio = 16, nLayers = 2)
      cents.coalesce(1).write.parquet(s"$dir/centroids")
      top1.coalesce(1).write.parquet(s"$dir/toplayer")
      graphs1.repartition(col("level")).write
        .partitionBy("level").parquet(s"$dir/graphs")
      ranked1.coalesce(1).write.parquet(s"$dir/ranked")
      val t0in = System.nanoTime()
      val (top2, graphs2) = Similarity.appendHnswGraphIndex(emb,
        batch, spark.read.parquet(s"$dir/centroids"),
        spark.read.parquet(s"$dir/ranked"),
        spark.read.parquet(s"$dir/toplayer"),
        spark.read.parquet(s"$dir/graphs"), "vec_id", "embedding",
        degree = 6, nProbeBuild = 2, layerRatio = 16, nLayers = 2)
      val n = Similarity.hnswServeIndexed(top2, graphs2, emb,
        nswQueries, "vec_id", "embedding", k = 5, beamWidth = 8,
        rounds = 3, nLayers = 2, entryWidth = 2).count()
      println(f"    s31 receipt: append+serve=" +
        f"${(System.nanoTime() - t0in) / 1e9}%.2fs")
      n
    }
    // the round-9 verdict's batch-boundedness receipt: the splice's
    // value is edge REUSE, and reuse ≈ 1 − hot_cells/cells — so it
    // only wins when cells ≫ batch (a 200-vector batch over ~233
    // auto cells touches most of them and append ≈ rebuild; the s31
    // row above runs that regime honestly). This row runs the regime
    // the splice is FOR: a 40-vector write batch against the same
    // index, reporting hot-cell count, touched-src fraction,
    // level-0 reused-edge fraction (all recomputed independently of
    // the splice's own joins), and append wall vs rebuild wall at
    // the SAME stored codebook and parquet lineage cut
    t("s31_splice(cells>>batch)") {
      val base = emb.filter(col("vec_id") % 10 =!= 7)
      val batch = emb.filter(col("vec_id") % 200 === 17 &&
        col("vec_id") < 2000000L)
      val corpus = base.unionByName(batch)
      val dir = java.nio.file.Files
        .createTempDirectory("s31splice").toString
      val cents = Similarity.kmeansCentroids(base, "vec_id",
        "embedding", Similarity.autoCells(base.count()), 2)
      val (top1, graphs1, ranked1) = Similarity
        .buildHnswGraphIndexWith(base, cents, "vec_id", "embedding",
          degree = 6, nProbeBuild = 2, layerRatio = 16, nLayers = 2)
      cents.coalesce(1).write.parquet(s"$dir/centroids")
      top1.coalesce(1).write.parquet(s"$dir/toplayer")
      graphs1.repartition(col("level")).write
        .partitionBy("level").parquet(s"$dir/graphs")
      ranked1.coalesce(1).write.parquet(s"$dir/ranked")
      InternalCaches.releaseAll()
      val centsS = spark.read.parquet(s"$dir/centroids")
      val rankedS = spark.read.parquet(s"$dir/ranked")
      val topS = spark.read.parquet(s"$dir/toplayer")
      val graphsS = spark.read.parquet(s"$dir/graphs")
      // independent splice metrics (metadata-sized aggregates)
      val hot = Similarity.assignWithSim(batch, centsS, "vec_id",
          "embedding")
        .select(col("cell").as("cell_id")).distinct().persist()
      val nCells = centsS.count(); val nHot = hot.count()
      val nSrc = rankedS.select("node_id").distinct().count()
      val affected = rankedS.join(hot, "cell_id")
        .select("node_id").distinct().persist()
      val nAff = affected.count()
      val lvl0 = graphsS.filter(col("level") === 0)
      val nEdges = lvl0.count()
      val nReused = lvl0.join(
        affected.withColumnRenamed("node_id", "src"),
        Seq("src"), "left_anti").count()
      // the size-independent receipt: candidate PAIRS the splice
      // re-scores vs the pairs a rebuild scores — at 100 TB the pair
      // scoring dominates both legs, so this ratio IS the asymptotic
      // append/rebuild cost ratio (wall clocks at this n still carry
      // fixed per-stage overheads both legs share)
      val assignedSz = rankedS.filter(col("rk") === 1)
        .groupBy(col("cell_id")).agg(count(lit(1)).as("a"))
      val pairsAll = rankedS
        .groupBy(col("cell_id")).agg(count(lit(1)).as("p"))
        .join(assignedSz, "cell_id")
        .agg(sum(col("p") * col("a"))).collect()(0).getLong(0)
      val pairsRecomp = rankedS
        .join(affected, "node_id")
        .groupBy(col("cell_id")).agg(count(lit(1)).as("p"))
        .join(assignedSz, "cell_id")
        .agg(sum(col("p") * col("a"))).collect()(0).getLong(0)
      val tA = System.nanoTime()
      val nApp = Similarity.appendHnswGraphIndex(corpus, batch,
        centsS, rankedS, topS, graphsS, "vec_id", "embedding",
        degree = 6, nProbeBuild = 2, layerRatio = 16,
        nLayers = 2)._2.count()
      val appendS = (System.nanoTime() - tA) / 1e9
      InternalCaches.releaseAll()
      val tR = System.nanoTime()
      Similarity.buildHnswGraphIndexWith(corpus, centsS, "vec_id",
        "embedding", degree = 6, nProbeBuild = 2, layerRatio = 16,
        nLayers = 2)._2.count()
      val rebuildS = (System.nanoTime() - tR) / 1e9
      hot.unpersist(); affected.unpersist()
      println(f"    s31 splice receipt: batch=${batch.count()} " +
        f"cells=$nCells hot=$nHot " +
        f"touched_src=${nAff.toDouble / nSrc}%.3f " +
        f"reused_edges=${nReused.toDouble / nEdges}%.3f " +
        f"pair_ratio=${pairsRecomp.toDouble / pairsAll}%.3f " +
        f"append=$appendS%.2fs rebuild=$rebuildS%.2fs")
      nApp
    }
    // compressed + filtered + upgraded graph serves: the graph is
    // built once OUTSIDE the timed legs (parquet lineage cut, the
    // s31 discipline); each serve leg's receipt is printed separately
    // so the row shows serve cost, with the upgrade leg's pair
    // re-scoring (n·nProbe·n/C — the build envelope, minus training
    // and assignment) alongside
    t("s38s39s40_graph_serves") {
      val dir = java.nio.file.Files
        .createTempDirectory("s38stress").toString
      val cents = Similarity.kmeansCentroids(emb, "vec_id",
        "embedding", Similarity.autoCells(emb.count()), 2)
      val (top1, graphs1, ranked1) = Similarity
        .buildHnswGraphIndexWith(emb, cents, "vec_id", "embedding",
          degree = 6, nProbeBuild = 2, layerRatio = 16, nLayers = 2)
      top1.coalesce(1).write.parquet(s"$dir/toplayer")
      graphs1.filter(col("level") === 0)
        .select(col("src"), col("dst"))
        .write.parquet(s"$dir/graph0")
      ranked1.coalesce(1).write.parquet(s"$dir/ranked")
      Similarity.sq8Codes(emb, "vec_id", "embedding")
        .write.parquet(s"$dir/codes")
      InternalCaches.releaseAll()
      val g0 = spark.read.parquet(s"$dir/graph0")
      leg("s38_sq8_serve") {
        Similarity.nswBeamSq8Serve(spark.read.parquet(s"$dir/codes"),
          emb, g0, nswQueries, "vec_id", "embedding", k = 5,
          beamWidth = 8, rounds = 3, candK = 10).count()
      }
      leg("s39_filtered_serve") {
        Similarity.nswBeamFilteredTopK(emb, g0, nswQueries, "vec_id",
          "embedding", col("vec_id") % 3 === 0, k = 5, beamWidth = 8,
          rounds = 3).count()
      }
      leg("s40_degree_upgrade") {
        Similarity.upgradeGraphIndexDegree(emb,
          spark.read.parquet(s"$dir/ranked"),
          spark.read.parquet(s"$dir/toplayer"), "vec_id", "embedding",
          newDegree = 12, layerRatio = 16, nLayers = 2)._2.count()
      }
    }
    // deployed-weight quality gate: training is the t38 row above;
    // this times the SERVING leg — one broadcast-weight scoring pass
    // over the corpus (the q103 per-batch shape at corpus width) —
    // which must track the corpus linearly with a fixed 65-row model
    t("q103_score_gate(fixed-model)") {
      val pos = (1 to 19 by 2).map("src" + _)
      val w = TextAnalysis.qualityWeights(docs, col("doc_id"),
        col("text"), col("source"), pos).persist()
      w.count() // the deployable artifact, built once
      val t0in = System.nanoTime()
      val n = TextAnalysis.scoreWithWeights(docs, col("doc_id"),
        col("text"), w)
        .groupBy(col("quality6") >= 500000L).count().count()
      println(f"    q103 receipt: score-only=" +
        f"${(System.nanoTime() - t0in) / 1e9}%.2fs")
      w.unpersist()
      n
    }
    // contamination family at corpus scale (t46 excision, t47
    // fixpoint, q104's per-batch detector kernel at corpus width —
    // q105's repair leg IS the t46 kernel, so t46's row covers it):
    // the benchmark side is FIXED at the base corpus's %97 slice
    // while the document side grows with mult, so a corpus-linear
    // shape shows ratios ≈ mult. The claimed shape: one broadcast
    // shingle probe + per-doc position collect + array-HOF mask —
    // the corpus never shuffles for the probe
    t("t46t47q104_contamination") {
      val bench = docs
        .filter(col("doc_id") < 10000000L &&
          pmod(col("doc_id"), lit(97)) === 0)
        .select(col("doc_id"), col("text"))
      val corpus = docs
        .filter(pmod(col("doc_id"), lit(97)) =!= 0)
        .select(col("doc_id"), col("text"))
      val benchSh = TextAnalysis.explodedShingles(bench,
          col("doc_id"), col("text"), 3)
        .select(col("shingle")).distinct()
        .persist()
      benchSh.count() // the stored gate artifact, built once
      leg("t46_excise") {
        TextAnalysis.exciseContaminatedSpans(corpus, bench,
          col("doc_id"), col("text"), n = 3).count()
      }
      leg("t47_fixpoint") {
        TextAnalysis.exciseContaminatedFixpoint(corpus, bench,
          col("doc_id"), col("text"), n = 3).count()
      }
      leg("q104_gate_score") {
        val sh = TextAnalysis.explodedShingles(corpus,
          col("doc_id"), col("text"), 3).distinct()
        val hits = sh.join(broadcast(benchSh), "shingle")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_shared"))
        corpus.join(hits, Seq("doc_id"), "left_outer")
          .groupBy(coalesce(col("n_shared"), lit(0L)) <= 0L)
          .count().count()
      }
      benchSh.unpersist()
      corpus.count()
    }

    t("r11_crawl_ops") {
      // WARC shards built once OUTSIDE the timed legs (the stored
      // corpus artifact, like the ANN indexes above); the CDX fetch
      // leg then reads the SAME fixed ~52-record set at every
      // multiplier — flat time is the Common Crawl random-access
      // contract (data I/O O(selected records), corpus-independent)
      val warcDir = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_stress_warc_${ProcessHandle.current().pid()}").toString
      val pages = docs.select(col("doc_id"),
        concat(lit("https://site"), pmod(col("doc_id"), lit(97)),
          lit(".example.com/p/"), col("doc_id")).as("uri"),
        col("text"))
      graft.sources.WarcShards.write(pages, "doc_id", "uri", "text",
        warcDir, "crawl", numShards = 32)
      val cdx = spark.read.parquet(
        graft.sources.WarcShards.cdxPath(warcDir, "crawl")).persist()
      cdx.count()
      leg("k15_cdx_fetch") {
        graft.sources.WarcShards.readIndexed(
          cdx.filter(col("doc_id") < 10000000L &&
            pmod(col("doc_id"), lit(97)) === 0), warcDir).count()
      }
      leg("t48_html_extract") {
        val esc = replace(replace(replace(col("text"),
          lit("&"), lit("&amp;")), lit("<"), lit("&lt;")),
          lit(">"), lit("&gt;"))
        val html = concat(
          lit("<html><head><title>Doc "), col("doc_id"),
          lit("</title></head><body><nav><a href=\"/\">Home</a> " +
            "<a href=\"/a\">About</a></nav><h1>Doc "), col("doc_id"),
          lit("</h1><p>"), esc,
          lit("</p><footer><a href=\"/t\">Terms</a></footer>" +
            "</body></html>"))
        // aggregate over main_text so the extraction cannot be pruned
        // by count()'s empty projection
        TextAnalysis.htmlMainText(
            docs.select(col("doc_id"), html.as("html")),
            col("doc_id"), col("html"), maxLinkDensity = 0.5)
          .agg(sum(length(col("main_text")))).count()
      }
      leg("d22_url_dedup") {
        Dedup.urlDedup(pages, col("doc_id"), col("uri")).count()
      }
      // q106's merge-commit claim measured the d11/s31 way: the state
      // is seeded from the WHOLE scaled corpus (untimed, batch 0),
      // then ONE FIXED ~52-record batch merges in — flat time across
      // multipliers = commit work O(batch), not O(state)
      val stateDir = s"$warcDir/state"
      val fixed = cdx.filter(col("doc_id") < 10000000L &&
        pmod(col("doc_id"), lit(97)) === 0)
      val seed = cdx.join(fixed.select(col("doc_id")), Seq("doc_id"),
        "left_anti")
      graft.streaming.EventStream.warcCensusMergeBatch(
        seed, warcDir, stateDir, batchId = 0L)
      InternalCaches.releaseAll()
      val preVersions =
        graft.sources.VersionedTable.versions(spark, stateDir).length
      // can't use leg() (a second run would violate lockstep): time
      // the single fixed-batch merge directly, steady-state absorbed
      // by the seed batch having just exercised the same code path
      val tFb = System.nanoTime()
      graft.streaming.EventStream.warcCensusMergeBatch(
        fixed, warcDir, stateDir, batchId = 1L)
      println(f"    q106_fixed_batch_merge=${
        (System.nanoTime() - tFb) / 1e9}%.2fs " +
        f"rows=${fixed.count()} (state versions $preVersions -> ${
          graft.sources.VersionedTable.versions(spark, stateDir).length})")
      InternalCaches.releaseAll()
      cdx.unpersist()
      def rmTree(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rmTree))
        f.delete(): Unit
      }
      rmTree(new java.io.File(warcDir))
      docs.count()
    }

    t("s44_maxsim(fixed-queries)") {
      // stage 1 (pooled shortlist) is the declared-exact corpus-linear
      // baseline; stage 2 is candK·T²-bounded per query — the growth
      // curve should track stage 1 alone
      val queries = emb.filter(col("vec_id") < 10000000L &&
        pmod(col("vec_id"), lit(125)) === 0)
      leg("s44_rerank") {
        Similarity.maxSimRerank(emb, queries, "vec_id", "embedding",
          nTokens = 8, candK = 30, k = 5).count()
      }
    }

    t("t51_ngram_lane") {
      // build leg: the corpus-linear one-pass count index (the honest
      // growing leg). serve leg: a FIXED query batch over the stored
      // index — the cost is one index scan + query-sized aggregates
      // (file-level ctx stats skipping, q80's machinery, is the
      // serve-flat upgrade path at 100 TB). merge receipt: ONE fixed
      // base-corpus batch advances a whole-corpus-seeded state — flat
      // across multipliers = the q109 commit is O(batch), not
      // O(state), same protocol as the q106 row
      val queries = docs.filter(col("doc_id") < 10000000L &&
          col("doc_id") % 37 === 0)
        .select(col("doc_id"),
          TextAnalysis.tokens(col("text")).as("w"))
        .filter(size(col("w")) >= 2)
        .select(col("doc_id").as("qid"), slice(col("w"), 1, 2).as("q"))
        .persist()
      queries.count()
      leg("t51_index_build") {
        TextAnalysis.ngramCounts(docs, col("doc_id"), col("text"), 3)
          .count()
      }
      val scratch = java.nio.file.Files
        .createTempDirectory("ngram_stress").toString
      val idxDir = s"$scratch/index"
      graft.sources.VersionedTable.commit(
        TextAnalysis.ngramCounts(docs, col("doc_id"), col("text"), 3),
        idxDir)
      InternalCaches.releaseAll()
      leg("t53_index_serve") {
        TextAnalysis.ngramServeFrom(
          graft.sources.VersionedTable.readCurrent(spark, idxDir), 3,
          queries).count()
      }
      // pruned serve (t54): the same index committed range-clustered
      // by ctx hash with file stats; the fixed probe-key set should
      // match a SHRINKING fraction of files as the corpus grows —
      // serve I/O O(matched files), not O(index)
      val prunedDir = s"$scratch/pruned"
      graft.sources.VersionedTable.commit(
        TextAnalysis.ngramCounts(docs, col("doc_id"), col("text"), 3)
          .withColumn("ctx_h", Tables.hashU32(col("ctx"), 71))
          .repartitionByRange(512, col("ctx_h")),
        prunedDir, statsCol = "ctx_h")
      InternalCaches.releaseAll()
      val keys = queries.select(explode(array(
          array_join(col("q"), " "), element_at(col("q"), 2),
          lit(""))).as("ctx")).distinct()
        .select(Tables.hashU32(col("ctx"), 71))
        .collect().map(_.getLong(0)).toSeq
      val pv = graft.sources.VersionedTable
        .versions(spark, prunedDir).last
      val (keptF, totalF) = graft.sources.VersionedTable
        .filesMatchingAny(spark, prunedDir, pv, keys)
      // full-scan twin over the SAME store: the wall-clock delta
      // (not just the file fraction) is the pruning receipt — at
      // higher multipliers each of the 512 range files is larger,
      // so the skipped bytes turn into skipped seconds
      leg("t54_full_scan") {
        TextAnalysis.ngramServeFrom(
          graft.sources.VersionedTable
            .readVersion(spark, prunedDir, pv)
            .drop("ctx_h"), 3, queries).count()
      }
      leg("t54_pruned_serve") {
        TextAnalysis.ngramServeFrom(
          graft.sources.VersionedTable
            .readVersionIn(spark, prunedDir, pv, keys)
            .drop("ctx_h"), 3, queries).count()
      }
      println(s"    t54_files_read=${keptF.length}/$totalF")
      // point-probe grain: a 4-query batch (the online-serving
      // shape) matches a handful of files — the regime where
      // data skipping pays hardest
      val qSmall = queries.orderBy(col("qid")).limit(4).persist()
      qSmall.count()
      val keysSmall = qSmall.select(explode(array(
          array_join(col("q"), " "), element_at(col("q"), 2),
          lit(""))).as("ctx")).distinct()
        .select(Tables.hashU32(col("ctx"), 71))
        .collect().map(_.getLong(0)).toSeq
      val (keptS, _) = graft.sources.VersionedTable
        .filesMatchingAny(spark, prunedDir, pv, keysSmall)
      leg("t54_point_full_scan") {
        TextAnalysis.ngramServeFrom(
          graft.sources.VersionedTable
            .readVersion(spark, prunedDir, pv)
            .drop("ctx_h"), 3, qSmall).count()
      }
      leg("t54_point_pruned") {
        TextAnalysis.ngramServeFrom(
          graft.sources.VersionedTable
            .readVersionIn(spark, prunedDir, pv, keysSmall)
            .drop("ctx_h"), 3, qSmall).count()
      }
      println(s"    t54_point_files_read=${keptS.length}/$totalF")
      qSmall.unpersist()
      val stateDir = s"$scratch/state"
      val fixedB = docs.filter(col("doc_id") < 10000000L &&
          pmod(col("doc_id"), lit(97)) === 0)
        .select(col("doc_id"), col("text"))
      val seed = docs.select(col("doc_id"), col("text"))
        .join(fixedB.select(col("doc_id")), Seq("doc_id"), "left_anti")
      graft.streaming.EventStream.ngramMergeBatch(seed, 3, stateDir, 0L)
      InternalCaches.releaseAll()
      // can't use leg() (a replayed batch id is a proven no-op): time
      // the single fixed-batch merge directly, steady state absorbed
      // by the seed batch having just exercised the same code path
      val tFb = System.nanoTime()
      graft.streaming.EventStream.ngramMergeBatch(fixedB, 3, stateDir,
        1L)
      println(f"    q109_fixed_batch_merge=${
        (System.nanoTime() - tFb) / 1e9}%.2fs rows=${fixedB.count()}")
      InternalCaches.releaseAll()
      queries.unpersist()
      def rmTree(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rmTree))
        f.delete(): Unit
      }
      rmTree(new java.io.File(scratch))
      docs.count()
    }
    // corpus-shaping wave (p13/p14/p15/q110): p13/p14 are pure
    // per-row maps (must track the corpus ~linearly); p15 fills a
    // FIXED total budget from a growing corpus (one md5-ordered
    // prefix-sum cut — scan corpus-linear, output budget-bounded);
    // q110 merges ONE fixed batch against whole-corpus-seeded
    // per-domain state (|domains| rows — a flat row IS the O(batch)
    // commit receipt, the q106/q109 protocol)
    t("p13p14p15q110_shaping") {
      leg("p13_fim") {
        Curation.fimTransform(docs, col("doc_id"), col("text"),
          ratePct = 90, seed = 41).count()
      }
      val toks = docs.select(col("doc_id"),
          col("source").as("domain"),
          size(TextAnalysis.tokens(col("text"))).cast("long")
            .as("n_toks")).persist()
      toks.count()
      leg("p14_sft_masks") {
        val counted = toks.select(col("doc_id"),
          col("domain").as("source"), col("n_toks"))
        val packed = Curation.packSequences(counted, col("doc_id"),
          col("source"), col("n_toks"), ctxLen = 128, seed = 17,
          buckets = 8)
        val prompts = counted.select(col("doc_id"),
          floor(col("n_toks") / 3).as("prompt_toks"))
        Curation.sftMaskManifest(packed.join(prompts, Seq("doc_id")),
          ctxLen = 128).count()
      }
      // uniform weights: the MW chain is metadata-sized (domain
      // count) and already receipt-checked; the fill is the leg
      val w = toks.select(col("domain")).distinct()
        .withColumn("weight_micro", lit(100000L))
      leg("p15_budget_fill(fixed-budget)") {
        Curation.tokenBudgetSample(toks, col("doc_id"),
          col("domain"), col("n_toks"), w, totalBudget = 20000L,
          seed = 91).count()
      }
      // q110: per-domain budgets large enough that the seeded state
      // carries corpus-scale consumed sums, then ONE fixed batch
      val budgets = toks.select(col("domain")).distinct()
        .withColumn("budget_toks", lit(1000000000000L))
      val stateDir = java.nio.file.Files
        .createTempDirectory("q110stress").toString + "/state"
      val fixedB = toks.filter(col("doc_id") < 10000000L &&
        pmod(col("doc_id"), lit(97)) === 0)
      val seedB = toks.join(fixedB.select(col("doc_id")),
        Seq("doc_id"), "left_anti")
      graft.streaming.EventStream.budgetIngestMergeBatch(seedB,
        budgets, stateDir, 0L)
      InternalCaches.releaseAll()
      val tFb = System.nanoTime()
      graft.streaming.EventStream.budgetIngestMergeBatch(fixedB,
        budgets, stateDir, 1L)
      println(f"    q110_fixed_batch_merge=${
        (System.nanoTime() - tFb) / 1e9}%.2fs rows=${fixedB.count()}")
      InternalCaches.releaseAll()
      val n = toks.count()
      toks.unpersist()
      n
    }
    // s46's production path (s47): candidates from two per-side
    // stored graph indexes — the pair relation must grow as
    // candK·(n+m) (corpus-LINEAR), never n·m; the printed receipt
    // pins candidate pairs against the crossJoin mass the exact
    // baseline would score
    t("s47_bitext_ann") {
      val srcE = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
      val tgtE = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
      val dir = java.nio.file.Files
        .createTempDirectory("s47stress").toString
      for ((nm, idx) <- Seq(("fwd", tgtE), ("bwd", srcE))) {
        val cents = Similarity.kmeansCentroids(idx, "vec_id",
          "embedding", Similarity.autoCells(idx.count()), 2)
        val (top1, graphs1, _) = Similarity.buildHnswGraphIndexWith(
          idx, cents, "vec_id", "embedding", degree = 12,
          nProbeBuild = 2, layerRatio = 16, nLayers = 2)
        top1.coalesce(1).write.parquet(s"$dir/$nm/toplayer")
        graphs1.repartition(col("level")).write
          .partitionBy("level").parquet(s"$dir/$nm/graphs")
        InternalCaches.releaseAll()
      }
      def serve(nm: String, corpus: DataFrame, queries: DataFrame) =
        Similarity.hnswServeIndexed(
          spark.read.parquet(s"$dir/$nm/toplayer"),
          spark.read.parquet(s"$dir/$nm/graphs"), corpus, queries,
          "vec_id", "embedding", k = 8, beamWidth = 8, rounds = 3,
          nLayers = 2, entryWidth = 2, upperRounds = 1)
      // the serves run ONCE, timed single-shot, and materialize to
      // parquet (lineage cut): per-query serve growth is already
      // curve-covered by the s26/s38–s40 legs, and re-walking two
      // full-side serves per leg() execution measures GC debt, not
      // the operator. The pair-count receipt is what this row pins:
      // candidates = candK·(n+m), never n·m.
      val tS = System.nanoTime()
      serve("fwd", tgtE, srcE)
        .select(col("query_id").as("src_id"),
          col("neighbor_id").as("tgt_id"))
        .write.mode("overwrite").parquet(s"$dir/fwdC")
      serve("bwd", srcE, tgtE)
        .select(col("neighbor_id").as("src_id"),
          col("query_id").as("tgt_id"))
        .write.mode("overwrite").parquet(s"$dir/bwdC")
      InternalCaches.releaseAll()
      val serveS = (System.nanoTime() - tS) / 1e9
      val fwdC = spark.read.parquet(s"$dir/fwdC")
      val bwdC = spark.read.parquet(s"$dir/bwdC")
      val nPairs = fwdC.count() + bwdC.count()
      val mined = leg("s47_margin_stage") {
        Similarity.marginBitextOn(srcE, tgtE, fwdC, bwdC, "vec_id",
          "embedding", k = 4, minMarginMicro = 1000000L).count()
      }
      println(f"    s47 serves(single-shot)=$serveS%.2fs " +
        s"candidate_pairs=$nPairs vs crossjoin_mass=${
          srcE.count() * tgtE.count()} mined=$mined")
      nPairs
    }
    // round-13 lanes: preference pairs + Bradley–Terry (corpus-linear
    // aggregation, entity-cardinality solve — the t55 wall must stay
    // flat in the solve and linear only in the outcome aggregation),
    // chat assembly (two windows over the session partitioning), and
    // the PCA lane (covariance pass corpus-linear; serve fixed-batch)
    t("p16t55p17s50_newlanes") {
      leg("p16_preference_pairs") {
        Preference.preferencePairs(docs, col("doc_id"), col("text"),
          groupSize = 8).count()
      }
      leg("t55_bradley_terry") {
        Preference.bradleyTerry(
          Preference.pairwiseOutcomes(docs, col("doc_id"),
            col("text"), col("source"), groupSize = 8),
          iters = 8).count()
      }
      leg("p17_chat_assembly") {
        Events.chatAssembly(ev, gapSeconds = 1800L, budgetToks = 96L)
          .count()
      }
      // fixed 200-query batch from the base slice: serve cost must be
      // query-bound, only the train/projection passes corpus-linear
      val qFixed = emb.filter(col("vec_id") < 10000000L &&
        col("vec_id") % 25 === 0)
      leg("s50_pca_serve(fixed-q)") {
        Pca.pcaRerankTopK(emb, qFixed, "vec_id", "embedding",
          dim = 64, nComp = 4, iters = 6, candK = 50, k = 5).count()
      }
      docs.count()
    }
    spark.stop()
  }
}
