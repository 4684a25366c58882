package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.InternalCaches.TrackedPersist

/** Deduplication operators for the LLM-data-pipeline extension surface
  * (SURVEY.md §7 M7a): exact hash-dedup, MinHash+LSH near-dup, SimHash
  * near-dup, exact n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design (the 100 TB stance):
  *  - Exact dedup is one hash-partitioned groupBy — Spark's map-side
  *    partial aggregation makes the shuffle carry one row per distinct
  *    fingerprint per map task, not per input row.
  *  - MinHash/SimHash candidate generation is the standard band trick:
  *    only documents sharing a band bucket are ever paired, so the
  *    quadratic all-pairs join never materializes; the self-join is an
  *    equi-join on (band, key) that AQE can handle skew for. Verification
  *    (exact Jaccard / Hamming) runs only on candidates.
  *  - All hashes are md5-derived (see Tables) so the DuckDB oracle can
  *    recompute them bit-for-bit.
  */
object Dedup {

  /** Materialize a loop iterate and truncate its lineage. Default is
    * `localCheckpoint` — executor-local block storage, fast, but lost
    * with the executor, so an executor failure mid-loop kills the job.
    * With `reliableDir` set, a RELIABLE `checkpoint` into that
    * directory (HDFS/object store on a cluster) makes every iterate
    * recoverable — the deployment setting for long closures over
    * 100 TB-scale graphs. An already-configured SparkContext
    * checkpoint dir wins over `reliableDir` (setCheckpointDir is
    * process-global; first caller pins it). */
  private def truncateLineage(df: DataFrame,
      reliableDir: Option[String]): DataFrame =
    reliableDir match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        // persist BEFORE checkpointing: reliable checkpoint runs one
        // job to materialize and a second to write the files — without
        // the persist, the second job recomputes the whole iterate
        // (Spark's own checkpoint guidance)
        df.persist()
        try df.checkpoint(true) finally df.unpersist()
      // pinStage = localCheckpoint + release registration: the CC
      // loop checkpoints per iteration, and unregistered checkpoint
      // blocks outlive the query (Dataset.unpersist never sees them),
      // accumulating across a 288-query suite run
      case None => graft.InternalCaches.pinStage(df)
    }

  /** Exact dedup: keep the lowest id per normalized-content fingerprint.
    * Returns (fingerprint, keep_id, dup_count). */
  def exact(docs: DataFrame, idCol: Column, textCol: Column): DataFrame =
    docs.groupBy(TextAnalysis.contentFingerprint(textCol).as("fp"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("dup_count"))

  /** MinHash signatures, wide form: one row per doc with a length-
    * `numHashes` array of band minima — min over the doc's word-n-gram
    * shingles of md5(h || '|' || shingle). Lexicographic min over hex
    * strings is the permutation-min — identical in DuckDB.
    *
    * Shape matters at scale: ONE explode + ONE groupBy with H min()
    * columns (map-side partial mins), instead of distinct + an H-way
    * hash cross join — the shuffle carries one row per doc. min() over
    * duplicate shingles equals min() over the distinct set, so no
    * distinct pass is needed. */
  def minhash(docs: DataFrame, idCol: Column, textCol: Column,
      numHashes: Int, shingleN: Int = 3): DataFrame = {
    require(numHashes <= 8, "one-permutation scheme provides 8 hash slots")
    val sh = TextAnalysis.explodedShingles(docs, idCol, textCol, shingleN)
    // One-permutation hashing: slot i reads an 8-hex-digit (32-bit)
    // window of md5(shingle) (slots 4-7 of md5('x'+shingle)) — 2 md5
    // evaluations per shingle instead of numHashes, same minima
    // statistics. Lexicographic min over fixed-width hex = numeric min.
    val m1 = md5(col("shingle").cast("binary"))
    val m2 = md5(concat(lit("x"), col("shingle")).cast("binary"))
    val mins = (0 until numHashes).map { h =>
      val src = if (h < 4) m1 else m2
      min(substring(src, 1 + 8 * (h % 4), 8)).as(s"mh$h")
    }
    sh.groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"mh$i")): _*).as("sig"))
  }

  /** Per-row minhash signature key: the whole one-permutation
    * signature collapsed to one md5 hex string, computed with array
    * HOFs only — no explode, no groupBy — so it is legal on an
    * UNAGGREGATED STREAM (a groupBy signature would be a streaming
    * aggregation and could not feed stateful dedup in append mode).
    * array_min over the per-shingle hash windows yields exactly the
    * minima [[minhash]] computes via explode+min; `sh` must be a
    * pre-projected shingle-array column ([[TextAnalysis.shinglesOf]]
    * over a named token column) or the lambda re-tokenizes per
    * element. Empty shingle arrays yield null (caller filters). */
  def minhashSigKey(sh: Column, numHashes: Int): Column = {
    require(numHashes <= 8, "one-permutation scheme provides 8 hash slots")
    val parts = (0 until numHashes).map { h =>
      array_min(transform(sh, x => {
        val src = if (h < 4) md5(x.cast("binary"))
          else md5(concat(lit("x"), x).cast("binary"))
        substring(src, 1 + 8 * (h % 4), 8)
      }))
    }
    when(size(sh) > 0,
      md5(concat_ws("|", parts: _*).cast("binary")))
  }

  /** Optimal (bands, rowsPerBand) for a `numHashes`-position MinHash
    * signature at a target Jaccard `threshold` — the datasketch
    * `optimal_param` computation: a (b, r) banding's collision
    * probability at similarity j is the S-curve 1 − (1 − j^r)^b, and
    * the best split minimizes fpWeight·∫₀ᵗ S + (1−fpWeight)·∫ₜ¹(1−S)
    * (weighted mass of false-positive candidates below the threshold
    * and missed pairs above it). Pure driver-side arithmetic over the
    * divisors of numHashes — call it once when configuring a dedup
    * pass instead of hand-picking rowsPerBand; deterministic, so an
    * oracle-checked entry can inline the planned constants on both
    * engines. */
  def planBands(numHashes: Int, threshold: Double,
      fpWeight: Double = 0.5): (Int, Int) = {
    require(numHashes > 0, s"numHashes=$numHashes")
    require(threshold > 0 && threshold < 1, s"threshold=$threshold")
    require(fpWeight >= 0 && fpWeight <= 1, s"fpWeight=$fpWeight")
    val cands = (1 to numHashes).filter(numHashes % _ == 0)
      .map(r => (numHashes / r, r))
    def s(j: Double, b: Int, r: Int): Double =
      1 - math.pow(1 - math.pow(j, r), b)
    def err(b: Int, r: Int): Double = {
      val n = 1024
      var fp = 0.0
      var fn = 0.0
      var i = 0
      while (i < n) {
        fp += s(threshold * (i + 0.5) / n, b, r) * threshold / n
        fn += (1 - s(threshold + (1 - threshold) * (i + 0.5) / n, b, r)) *
          (1 - threshold) / n
        i += 1
      }
      fpWeight * fp + (1 - fpWeight) * fn
    }
    cands.minBy { case (b, r) => err(b, r) }
  }

  /** EXACT set-similarity self-join via PREFIX FILTERING (the
    * AllPairs/PPJoin family, Bayardo et al. 2007) — the deterministic
    * complement to banded MinHash: no probability of a miss, every
    * pair with Jaccard ≥ `threshold` over its trigram-shingle SET is
    * found, with candidates bounded by a frequency-ordered prefix
    * instead of all pairs. The filter: order each doc's shingles
    * rarest-first (global df asc, shingle asc — a total order both
    * engines reproduce); two sets with |x∩y|/|x∪y| ≥ t must share at
    * least one of each other's first |x| − ⌈t·|x|⌉ + 1 shingles, so
    * the candidate join runs on prefix shingles only — rare by
    * construction, so the per-shingle bucket (and the shuffle) stays
    * small exactly where all-pairs would explode. Verification is an
    * exact integer cross-multiplication (100·|∩| ≥ thresholdPct·|∪| —
    * no float Jaccard to drift). Returns (doc_a, doc_b, n_inter, n_union)
    * for verified pairs. */
  def prefixJaccardJoin(docs: DataFrame, idCol: Column,
      textCol: Column, thresholdPct: Int): DataFrame = {
    require(thresholdPct > 0 && thresholdPct <= 100,
      s"thresholdPct=$thresholdPct")
    // trigram token shingles (the d2 relation) — a 3-gram space is
    // sparse enough that the rarest-first prefixes stay genuinely
    // rare; bigrams over a small vocabulary saturate (measured: the
    // bigram variant's prefix buckets ballooned candidate pairs ~50×
    // on the synthetic corpus)
    val sh = TextAnalysis
      .explodedShingles(docs, idCol, textCol, 3)
      .distinct()
    val df_ = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    // rarest-first rank within each doc's shingle set, plus set size
    val wDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("df").asc, col("shingle").asc)
    val ranked = sh.join(broadcast(df_), Seq("shingle"))
      .withColumn("rk", row_number().over(wDoc))
      .withColumn("sz", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .persistTracked() // prefix join + both verification sides
    // prefix length |x| − ⌈t·|x|⌉ + 1, via integer ceil division
    val prefix = ranked.filter(col("rk") <=
      col("sz") - expr(s"cast((sz * $thresholdPct + 99) div 100 as int)")
        + 1)
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val inter = cand
      .join(ranked.select(col("doc_id").as("doc_a"), col("shingle"),
        col("sz").as("sz_a")), Seq("doc_a"))
      .join(ranked.select(col("doc_id").as("doc_b"), col("shingle"),
        col("sz").as("sz_b")), Seq("doc_b", "shingle"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"), first(col("sz_a")).as("sz_a"),
        first(col("sz_b")).as("sz_b"))
    inter
      .withColumn("un", col("sz_a") + col("sz_b") - col("inter"))
      .filter(col("inter") * 100 >= col("un") * thresholdPct)
      .select(col("doc_a"), col("doc_b"),
        col("inter").cast("long").as("n_inter"),
        col("un").cast("long").as("n_union"))
  }

  /** (doc_id, band, bkey) band keys from wide signatures: bands of
    * `rowsPerBand` minima, keyed by the md5 of the band's sorted
    * values — the bucketing both the self-join (batch) and the
    * incremental probe share. */
  private def bandKeys(sig: DataFrame, rowsPerBand: Int): DataFrame =
    sig.select(col("doc_id"),
        posexplode(col("sig")).as(Seq("h", "mh")))
      .withColumn("band", floor(col("h") / rowsPerBand))
      .groupBy(col("doc_id"), col("band"))
      .agg(md5(concat_ws("|",
        array_sort(collect_list(col("mh")))).cast("binary")).as("bkey"))

  /** LSH candidate pairs from wide signatures: split the signature into
    * bands of `rowsPerBand`, bucket docs by the md5 of each band's
    * sorted minima, and emit distinct (doc_a < doc_b) pairs sharing any
    * bucket. The signature relation is persisted around the self-join —
    * at 100 TB you materialize signatures once (they are tiny relative
    * to the corpus) rather than recompute the corpus scan per side. */
  def lshCandidates(sig: DataFrame, rowsPerBand: Int): DataFrame = {
    val banded = bandKeys(sig, rowsPerBand)
      .persistTracked()
    val a = banded.select(col("band").as("band_a"), col("bkey").as("bkey_a"),
      col("doc_id").as("doc_a"))
    val b = banded.select(col("band").as("band_b"), col("bkey").as("bkey_b"),
      col("doc_id").as("doc_b"))
    a.join(b, col("band_a") === col("band_b") &&
        col("bkey_a") === col("bkey_b") && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
  }

  /** Estimated Jaccard for candidate pairs: fraction of matching
    * signature positions (exact rational n/numHashes —
    * engine-reproducible). Two broadcast-joins against the signature
    * relation, then a zip-compare — no per-hash shuffle. The hint is
    * explicit because the signature relation is usually a fresh
    * aggregate whose size Catalyst can't estimate (it would plan a
    * sort-merge join and shuffle the candidates twice); at corpus sizes
    * where even signatures outgrow broadcast, drop the hint and let AQE
    * pick the join — the candidate side is then the smaller relation. */
  def minhashJaccard(candidates: DataFrame, sig: DataFrame,
      numHashes: Int): DataFrame = {
    val sa = sig.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val sb = sig.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    candidates.join(broadcast(sa), Seq("doc_a"))
      .join(broadcast(sb), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1L).otherwise(0L)),
          lit(0L), (acc, v) => acc + v)
          / lit(numHashes.toDouble)).as("est_jaccard"))
  }

  /** Incremental (daily-ingest) near-dup: flag each INCOMING doc that
    * is a minhash near-duplicate of the EXISTING corpus or of a
    * lower-id incoming doc — the production shape where yesterday's
    * signatures are a stored index and only today's batch is scanned.
    * Band buckets route candidates (existing refs match regardless of
    * id order; incoming refs only when lower-id, so the batch also
    * self-dedups); candidates are verified by the signature-agreement
    * Jaccard estimate before flagging. At 100 TB the existing side of
    * the band join reads the persisted signature/band index — never
    * the corpus text — and the join shuffles by (band, bkey) with
    * bucket sizes capped by the banding, not by corpus size.
    * Returns one row per incoming doc: (doc_id, is_dup 1/0,
    * dup_of = lowest verified match or null). */
  def incrementalNearDup(existing: DataFrame, incoming: DataFrame,
      idCol: Column, textCol: Column, numHashes: Int = 8,
      rowsPerBand: Int = 2, minJaccard: Double = 0.5): DataFrame = {
    val inDocs = incoming.select(idCol.as("doc_id"), textCol.as("text"))
    val exSig = minhash(existing.select(idCol.as("doc_id"),
      textCol.as("text")), col("doc_id"), col("text"), numHashes)
      .persistTracked() // the stored index side: bands + verification
    val inSig = minhash(inDocs, col("doc_id"), col("text"), numHashes)
      .persistTracked() // probe bands + verification
    val inB = bandKeys(inSig, rowsPerBand).persistTracked()
    val refB = bandKeys(exSig, rowsPerBand)
      .select(col("band"), col("bkey"), col("doc_id").as("ref_id"),
        lit(false).as("ref_in"))
      .union(inB.select(col("band"), col("bkey"),
        col("doc_id").as("ref_id"), lit(true).as("ref_in")))
    val cand = inB.join(refB, Seq("band", "bkey"))
      .filter(!col("ref_in") || col("ref_id") < col("doc_id"))
      .select(col("doc_id"), col("ref_id")).distinct()
    // verification joins: the BATCH signature relation broadcasts
    // (batch-sized by contract); the corpus signature index must NOT —
    // instead the batch-bounded candidate ID set broadcasts AGAINST
    // the index, so the ref lookup is a broadcast-hash semi-probe:
    // the index is scanned (the unavoidable floor without point
    // lookups) but only candidate-matched signature rows survive the
    // scan stage — nothing corpus-sized is ever broadcast or shuffled
    val refSigs = exSig.union(inSig)
      .select(col("doc_id").as("ref_id"), col("sig").as("sig_r"))
      .join(broadcast(cand.select(col("ref_id")).distinct()),
        Seq("ref_id"))
    val verified = cand
      .join(broadcast(inSig.select(col("doc_id"), col("sig").as("sig_d"))),
        Seq("doc_id"))
      .join(refSigs, Seq("ref_id"))
      .filter(aggregate(zip_with(col("sig_d"), col("sig_r"),
          (x, y) => when(x === y, 1L).otherwise(0L)),
          lit(0L), (acc, v) => acc + v)
        / lit(numHashes.toDouble) >= minJaccard)
      .groupBy(col("doc_id")).agg(min(col("ref_id")).as("dup_of"))
    inDocs.select(col("doc_id"))
      .join(verified, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        when(col("dup_of").isNull, 0).otherwise(1).cast("int").as("is_dup"),
        col("dup_of"))
  }

  /** Benchmark DECONTAMINATION — the whole-document fuzzy tier of
    * the contamination family (t7 = exact n-gram overlap stats, t10 =
    * Bloom n-gram membership): flag every TRAINING doc that is a
    * verified near-duplicate of ANY benchmark doc, so it can be
    * dropped before training (the eval-leak guard every published
    * LLM data pipeline runs).
    *
    * Candidates route through the minhash band-bucket equi-join with
    * the BENCHMARK side broadcast — benchmarks are eval-suite-sized
    * while the corpus is the 100 TB side, so the corpus band relation
    * is computed in one scan and NEVER shuffled corpus-wide; the
    * broadcast-hash band probe is map-side. Candidates are then
    * verified by EXACT word-n-gram Jaccard, not the signature
    * estimate: a decision that deletes training data deserves the
    * exact statistic, and the verify joins touch only
    * candidate-matched docs (corpus shingles explode for candidates
    * only; the benchmark shingle relation is benchmark-sized and
    * broadcast too).
    *
    * Returns one row per corpus doc: (doc_id, contaminated 1/0,
    * bench_id = lowest verified benchmark match or null). */
  def decontaminate(corpus: DataFrame, benchmarks: DataFrame,
      idCol: Column, textCol: Column, numHashes: Int = 8,
      rowsPerBand: Int = 2, minJaccard: Double = 0.5,
      shingleN: Int = 3): DataFrame = {
    val cDocs = corpus.select(idCol.as("doc_id"), textCol.as("text"))
    val bDocs = benchmarks.select(idCol.as("bench_id"),
      textCol.as("text"))
    val cSig = minhash(cDocs, col("doc_id"), col("text"), numHashes,
      shingleN)
    val bSig = minhash(
      bDocs.select(col("bench_id").as("doc_id"), col("text")),
      col("doc_id"), col("text"), numHashes, shingleN)
    val bB = bandKeys(bSig, rowsPerBand)
      .select(col("band"), col("bkey"), col("doc_id").as("bench_id"))
    val cand = bandKeys(cSig, rowsPerBand)
      .join(broadcast(bB), Seq("band", "bkey"))
      .select(col("doc_id"), col("bench_id")).distinct()
      .persistTracked() // reused: corpus-side semi-probe + verify join
    val cSh = TextAnalysis.explodedShingles(
        cDocs.join(broadcast(cand.select(col("doc_id")).distinct()),
          Seq("doc_id")),
        col("doc_id"), col("text"), shingleN)
      .distinct().persistTracked() // reused: sizes + intersection
    val bSh = TextAnalysis.explodedShingles(bDocs, col("bench_id"),
        col("text"), shingleN)
      .withColumnRenamed("doc_id", "bench_id")
      .distinct().persistTracked() // reused: sizes + intersection
    val cSz = cSh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz_c"))
    val bSz = bSh.groupBy(col("bench_id")).agg(count(lit(1)).as("sz_b"))
    val bShR = bSh.select(col("bench_id").as("b_id"),
      col("shingle").as("s_b"))
    val inter = cand
      .join(cSh, Seq("doc_id"))
      .join(broadcast(bShR),
        col("bench_id") === col("b_id") && col("shingle") === col("s_b"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("inter"))
    val verified = cand
      .join(inter, Seq("doc_id", "bench_id"), "left")
      .na.fill(0L, Seq("inter"))
      .join(cSz, Seq("doc_id"))
      .join(broadcast(bSz), Seq("bench_id"))
      .filter(col("inter") /
        (col("sz_c") + col("sz_b") - col("inter")).cast("double")
        >= minJaccard)
      .groupBy(col("doc_id")).agg(min(col("bench_id")).as("bench_id"))
    cDocs.select(col("doc_id"))
      .join(verified, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        when(col("bench_id").isNull, 0).otherwise(1).cast("int")
          .as("contaminated"),
        col("bench_id"))
  }

  /** Exact n-gram Jaccard for given pairs: |A ∩ B| / |A ∪ B| over
    * distinct word n-grams, computed relationally (explode + join +
    * count), never materializing set products. */
  def ngramJaccard(pairs: DataFrame, docs: DataFrame, idCol: Column,
      textCol: Column, n: Int = 3): DataFrame = {
    val sh = docs.select(idCol.as("id"),
      explode(TextAnalysis.shingles(textCol, n)).as("s")).distinct()
      .persistTracked() // reused 3×: intersection (both sides) and set sizes
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val inter = pairs
      .join(sh.select(col("id").as("doc_a"), col("s").as("s_a")), "doc_a")
      .join(sh.select(col("id").as("id_b"), col("s").as("s_b")),
        col("doc_b") === col("id_b") && col("s_a") === col("s_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .na.fill(0L, Seq("inter"))
      .join(sizes.select(col("id").as("doc_a"), col("sz").as("sz_a")), "doc_a")
      .join(sizes.select(col("id").as("doc_b"), col("sz").as("sz_b")), "doc_b")
      .withColumn("jaccard",
        col("inter") / (col("sz_a") + col("sz_b") - col("inter"))
          .cast("double"))
  }

  /** Exact n-gram Jaccard over all same-key pairs with jaccard ≥
    * `minJaccard` (> 0): instead of materializing the quadratic pair
    * table and joining it against the shingle relation (O(pairs ×
    * shingles-per-doc) rows), self-join the shingle relation on
    * (key, shingle) — only co-occurring shingles generate rows, the
    * LSH-free version of candidate pruning. Equivalent to
    * [[ngramJaccard]] over all same-key pairs followed by the threshold
    * filter, because zero-intersection pairs can never pass a positive
    * threshold. */
  def ngramJaccardSameKey(docs: DataFrame, idCol: Column, textCol: Column,
      keyCol: Column, n: Int, minJaccard: Double): DataFrame = {
    val sh = docs.select(idCol.as("id"), keyCol.as("k"),
        TextAnalysis.tokens(textCol).as("toks"))
      .select(col("id"), col("k"),
        explode(TextAnalysis.shinglesOf(col("toks"), n)).as("s"))
      .distinct()
      .persistTracked()
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.k") === col("b.k") && col("a.s") === col("b.s") &&
          col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("doc_a"), col("sz").as("sz_a")), "doc_a")
      .join(sizes.select(col("id").as("doc_b"), col("sz").as("sz_b")), "doc_b")
      .withColumn("jaccard",
        col("inter") / (col("sz_a") + col("sz_b") - col("inter"))
          .cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Exact n-gram CONTAINMENT join: |A∩B| / min(|A|,|B|) over distinct
    * word n-grams — the asymmetric-duplicate semantic Jaccard dedup
    * systematically misses (a short doc quoted verbatim inside a long
    * one has containment ≈ 1 while Jaccard ≈ |A|/|B| can sit far
    * below any dedup threshold; C4/RealNews-style pipelines filter on
    * containment for exactly this). Same candidate shape as
    * [[ngramJaccardSameKey]]: self-join the shingle relation on
    * (key, shingle) so only co-occurring shingles generate rows —
    * a zero-intersection pair can never pass a positive threshold.
    * Emits both metrics so the caller sees what Jaccard would have
    * said about each caught pair. */
  def containmentSameKey(docs: DataFrame, idCol: Column, textCol: Column,
      keyCol: Column, n: Int, minContainment: Double): DataFrame = {
    val sh = docs.select(idCol.as("id"), keyCol.as("k"),
        TextAnalysis.tokens(textCol).as("toks"))
      .select(col("id"), col("k"),
        explode(TextAnalysis.shinglesOf(col("toks"), n)).as("s"))
      .distinct()
      .persistTracked() // both sides of the co-occurrence join + sizes
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    sh.as("a").join(sh.as("b"),
        col("a.k") === col("b.k") && col("a.s") === col("b.s") &&
          col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("id").as("doc_a"), col("sz").as("sz_a")),
        "doc_a")
      .join(sizes.select(col("id").as("doc_b"), col("sz").as("sz_b")),
        "doc_b")
      .withColumn("containment",
        col("inter") / least(col("sz_a"), col("sz_b")).cast("double"))
      .withColumn("jaccard",
        col("inter") / (col("sz_a") + col("sz_b") - col("inter"))
          .cast("double"))
      .filter(col("containment") >= minContainment)
      .select(col("doc_a"), col("doc_b"), col("inter"),
        col("containment"), col("jaccard"))
  }

  /** Candidate-BOUNDED exact containment join — [[containmentSameKey]]
    * re-armed with the prefix filter, killing the df² hot-shingle term
    * that is the co-occurrence join's 100 TB liability (a stop-shingle
    * like "one of the" has corpus-scale df, and the (key, shingle)
    * self-join emits df² candidate rows per shingle BEFORE any
    * containment math).
    *
    * Containment-specific prefix lemma (the asymmetric variant of
    * d17's): order all shingles by global (df asc, shingle asc) —
    * rarest first. For a pair with sz_S ≤ sz_L, containment ≥ τ means
    * |S∩L| ≥ ⌈τ·sz_S⌉; if none of S's first ⌊(1−τ)·sz_S⌋+1 shingles
    * (its PREFIX) occurs in L, every shared shingle sits in S's
    * suffix, which holds only ⌈τ·sz_S⌉ − 1 shingles — contradiction.
    * So joining each doc's prefix (as the smaller side) against FULL
    * shingle sets of same-key docs no smaller than it is zero-miss;
    * candidate rows per shingle are prefixDf·df instead of df², and
    * stop-shingles never enter prefixes, so prefixDf ≈ 0 exactly where
    * df explodes. Candidates are then verified EXACTLY (full
    * intersection count), emitting [[containmentSameKey]]'s columns —
    * the two operators are hash-equal at equal τ by construction. */
  def prefixContainmentJoin(docs: DataFrame, idCol: Column,
      textCol: Column, keyCol: Column, n: Int,
      thresholdPct: Int): DataFrame = {
    require(thresholdPct > 0 && thresholdPct <= 100,
      s"thresholdPct=$thresholdPct")
    val (_, ranked, cand) = prefixContainmentCandidates(docs, idCol,
      textCol, keyCol, n, thresholdPct)
    val inter = cand
      .join(ranked.select(col("id").as("doc_a"), col("s"),
        col("sz").as("sz_a")), Seq("doc_a"))
      .join(ranked.select(col("id").as("doc_b"), col("s"),
        col("sz").as("sz_b")), Seq("doc_b", "s"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"), first(col("sz_a")).as("sz_a"),
        first(col("sz_b")).as("sz_b"))
    inter
      .withColumn("containment",
        col("inter") / least(col("sz_a"), col("sz_b")).cast("double"))
      .withColumn("jaccard",
        col("inter") / (col("sz_a") + col("sz_b") - col("inter"))
          .cast("double"))
      .filter(col("containment") >= thresholdPct / 100.0)
      .select(col("doc_a"), col("doc_b"), col("inter"),
        col("containment"), col("jaccard"))
  }

  /** The d21 pruning receipt: prefix-filter candidate pairs vs the
    * co-occurrence join's candidate pairs on the same corpus — the
    * evidence the prefix bound is doing its job. */
  def prefixContainmentReceipt(docs: DataFrame, idCol: Column,
      textCol: Column, keyCol: Column, n: Int,
      thresholdPct: Int): (Long, Long) = {
    val (sh, _, cand) = prefixContainmentCandidates(docs, idCol,
      textCol, keyCol, n, thresholdPct)
    val coocPairs = sh.as("a").join(sh.as("b"),
        col("a.k") === col("b.k") && col("a.s") === col("b.s") &&
          col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id")).distinct().count()
    (cand.count(), coocPairs)
  }

  /** The d21 candidate machinery shared by [[prefixContainmentJoin]]
    * and [[prefixContainmentReceipt]] — ONE definition of the shingle
    * relation, the rarest-first rank, the prefix length, and the
    * orientation join, so the receipt can never drift from the
    * operator it measures. Returns (sh, ranked, candidatePairs). */
  private def prefixContainmentCandidates(docs: DataFrame, idCol: Column,
      textCol: Column, keyCol: Column, n: Int, thresholdPct: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    require(thresholdPct > 0 && thresholdPct <= 100,
      s"thresholdPct=$thresholdPct")
    val sh = docs.select(idCol.as("id"), keyCol.as("k"),
        TextAnalysis.tokens(textCol).as("toks"))
      .select(col("id"), col("k"),
        explode(TextAnalysis.shinglesOf(col("toks"), n)).as("s"))
      .distinct()
      .persistTracked() // df aggregate + (receipt only) cooc self-join
    val df_ = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
    // rarest-first rank within each doc + set size; persisted for the
    // prefix join (small side), the full-set join (big side) and both
    // verification sides
    val wDoc = Window.partitionBy(col("id"))
      .orderBy(col("df").asc, col("s").asc)
    val ranked = sh.join(df_, Seq("s"))
      .withColumn("rk", row_number().over(wDoc))
      .withColumn("sz",
        count(lit(1)).over(Window.partitionBy(col("id"))))
      .persistTracked()
    // prefix length ⌊(1−τ)·sz⌋+1 = sz − ⌈τ·sz⌉ + 1 via integer ceil
    val prefix = ranked.filter(col("rk") <=
      col("sz") - expr(s"cast((sz * $thresholdPct + 99) div 100 as int)")
        + 1)
    // smaller-side prefix × full sets of same-key docs no smaller
    // ((sz, id)-lexicographic makes "smaller" total, so each unordered
    // pair is generated from exactly one orientation)
    val cand = prefix.as("a").join(ranked.as("b"),
        col("a.k") === col("b.k") && col("a.s") === col("b.s") &&
          (col("a.sz") < col("b.sz") ||
            (col("a.sz") === col("b.sz") && col("a.id") < col("b.id"))))
      .select(least(col("a.id"), col("b.id")).as("doc_a"),
        greatest(col("a.id"), col("b.id")).as("doc_b"))
      .distinct()
    (sh, ranked, cand)
  }

  /** 32-bit SimHash fingerprint per doc over distinct word-3-gram
    * shingle features: for each bit b, sum +1/-1 over features whose
    * md5-derived u32 has bit b set/clear; bit b of the fingerprint is 1
    * iff the sum is positive. (Features are shingles, not tokens — a
    * 31-word vocabulary would make token-level fingerprints collide
    * corpus-wide.) Bit extraction uses floor(h / 2^b) % 2 — exact in
    * doubles below 2^52 and identical in DuckDB.
    * Returns (doc_id, simhash). */
  def simhash(docs: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val tok = TextAnalysis.explodedShingles(docs, idCol, textCol, 3)
      .withColumnRenamed("shingle", "tok")
      .distinct()
      .withColumn("hu", Tables.hashU32(col("tok"), 13))
    // One aggregation with 32 sum columns instead of a 32× row explosion:
    // the shuffle carries one row per doc, and the per-bit sums are
    // map-side partial aggregates (matters at 100 TB: the explode
    // variant shuffles 32× the feature relation).
    val bitSums = (0 until 32).map { b =>
      sum((floor(col("hu") / math.pow(2.0, b)).cast("long") % 2) * 2 - 1)
        .as(s"s$b")
    }
    val fp = (0 until 32).map { b =>
      when(col(s"s$b") > 0, 1L << b).otherwise(0L)
    }.reduce(_ + _)
    tok.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), fp.as("simhash"))
  }

  /** SimHash near-dup pairs: candidate = sharing any of the four 8-bit
    * bands (pigeonhole guarantees recall for Hamming ≤ 3 at 4 bands);
    * verified by exact Hamming distance ≤ maxHamming. */
  def simhashPairs(sh: DataFrame, maxHamming: Int): DataFrame = {
    val fps = sh.persistTracked() // both sides of the band self-join
    val banded = fps.select(col("doc_id"), col("simhash"),
      explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bkey",
        floor(col("simhash") / pow(lit(2.0), col("band") * 8)).cast("long") % 256)
    val a = banded.select(col("band").as("band_a"), col("bkey").as("bkey_a"),
      col("doc_id").as("doc_a"), col("simhash").as("fp_a"))
    val b = banded.select(col("band").as("band_b"), col("bkey").as("bkey_b"),
      col("doc_id").as("doc_b"), col("simhash").as("fp_b"))
    a.join(b, col("band_a") === col("band_b") &&
        col("bkey_a") === col("bkey_b") && col("doc_a") < col("doc_b"))
      // Hamming-filter BEFORE the distinct: the band join emits each
      // qualifying pair up to 4×, but it also emits every non-dup pair
      // that collides on one band — filtering first shrinks the distinct
      // shuffle to actual near-dups instead of all collisions.
      .withColumn("hamming", expr("bit_count(fp_a ^ fp_b)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming")).distinct()
  }

  /** Connected components over an undirected duplicate-pair edge list
    * (columns `doc_a`, `doc_b`) via iterative min-label propagation:
    * each round every vertex takes the minimum component id among
    * itself and its neighbors; at fixpoint every vertex carries the
    * minimum doc id reachable through any duplicate chain. This is the
    * pairs → groups step real dedup pipelines need between candidate
    * generation and survivor selection (a near-dup relation is not
    * transitive, so clusters must be closed explicitly).
    *
    * Scale shape: each round is two equi-joins (neighbor propagation +
    * POINTER JUMPING — every vertex also adopts its label's label, so
    * chains collapse in O(log diameter) rounds instead of O(diameter))
    * and one groupBy-min, all hash-partitioned on vertex id with
    * map-side partial mins; no global ordering anywhere. The per-round
    * driver sync is one sum() aggregate: labels only ever decrease, so
    * an unchanged label sum IS the fixpoint — no join-and-compare pass
    * (the standard Spark iterative-algorithm shape, same as GraphX
    * Pregel / GraphFrames CC, with the cheapest possible convergence
    * probe). Each round's labels are LOCALCHECKPOINTED, not just
    * persisted: the round plan references the previous labels three
    * times (neighbor, pointer, identity), so without lineage
    * truncation the logical plan triples per round and Catalyst
    * re-analysis goes exponential (measured: minutes on a 9-edge
    * graph). `reliableDir` swaps the executor-local checkpoint for a
    * RELIABLE one (HDFS/object-store): same shape, but an executor
    * loss mid-closure recovers from storage instead of killing the
    * job — the right setting for cluster deployments.
    *
    * A PARTITION-LOCAL UNION-FIND PRE-PASS runs before the distributed
    * loop: the symmetric edge list is hash-partitioned by src (so each
    * vertex's full neighborhood co-locates) and each partition runs an
    * in-memory union-find over the edges it holds, emitting only the
    * star edges (v, localRoot(v)). Within a partition every original
    * edge collapses to a self-loop after the unions, so those stars ARE
    * the contracted graph: they preserve components exactly (each star
    * edge links two vertices of one original component; each original
    * edge (s,d) is re-expressed as s—root—d through the shared local
    * root; and every vertex still appears — as a leaf if it is not its
    * partition's root, via its leaves if it is). The payoff is depth:
    * chains that are co-partitioned contract to depth-1 stars, so the
    * pointer-jumping loop starts near-converged and the round count —
    * each round ≈ a fixed job overhead at small SF — drops. Memory per
    * task is one long→long map over the vertices of that partition,
    * bounded by the shuffle partition sizing like any hash join.
    *
    * Returns (v, comp). */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20,
      reliableDir: Option[String] = None): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // No distinct on either side of the contraction: union-find is
    // idempotent under duplicate edges, and the min-aggregations of the
    // seed/loop are duplicate-insensitive, so the only shuffle phase 1
    // needs is the repartition-by-src. Star-edge multiplicity is
    // bounded by vertex degree (v appears in ≤ deg(v)+1 partitions).
    val sym0 = edges
      .select(col("doc_a").cast("long").as("src"),
        col("doc_b").cast("long").as("dst"))
      .union(edges.select(col("doc_b").cast("long").as("src"),
        col("doc_a").cast("long").as("dst")))
    // localContract emits the contracted graph already symmetric (plus
    // a self row per root) — a union-based second symmetrizing pass
    // here would re-run the whole per-partition union-find on each
    // branch of the union
    val sym = sym0.repartition(col("src")).as[(Long, Long)]
      .mapPartitions(localContract).toDF("src", "dst")
      .persistTracked()
    // seed each vertex with min(self, direct neighbors) — the first
    // propagation round for free, as one groupBy on the edge relation
    // (same shuffle the distinct-vertices init would have paid)
    var labels = truncateLineage(
      sym.groupBy(col("src")).agg(min(col("dst")).as("m"))
        .select(col("src").as("v"),
          least(col("m"), col("src")).as("comp")), reliableDir)
    // one job for both probes: (sum of labels, vertex count) — labels
    // are checkpointed, so this scans cached partitions, no shuffle
    def labelProbe(df: DataFrame): (Long, Long) = {
      val r = df.agg(sum(col("comp")), count(lit(1))).head()
      (Option(r.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L),
        r.getLong(1))
    }
    def step(prev: DataFrame): DataFrame = {
      val nbr = sym.join(prev, sym("src") === prev("v"))
        .select(col("dst").as("v"), col("comp"))
      // pointer jumping: comp is always itself a vertex, so every
      // label has a label to adopt
      val l2 = prev.select(col("v").as("cv"), col("comp").as("ccomp"))
      val ptr = prev.join(l2, col("comp") === col("cv"))
        .select(col("v"), col("ccomp").as("comp"))
      nbr.union(ptr).union(prev)
        .groupBy(col("v")).agg(min(col("comp")).as("comp"))
    }
    var (prevSum, nVerts) = labelProbe(labels)
    var iter = 0
    // Early exit ONLY on a genuinely empty edge list (vertex count 0).
    // Gating on the label sum being zero would misfire on graphs whose
    // seed labels happen to sum to 0 (possible with negative vertex
    // ids); the sum is only a CONVERGENCE probe (labels are per-vertex
    // non-increasing, so an unchanged sum means no label moved —
    // sign-independent).
    var done = nVerts == 0L
    while (!done && iter < maxIter) {
      // ONE step per materialization: a double step would re-execute
      // the un-materialized inner step at each of the outer step's
      // three references — measured slower than the extra driver sync
      val next = truncateLineage(step(labels), reliableDir)
      val s = labelProbe(next)._1
      labels = next
      done = s == prevSum
      prevSum = s
      iter += 1
    }
    sym.unpersist()
    labels
  }

  /** Partition-local union-find over one partition's symmetric edges.
    * Unions every edge, then emits the contracted graph ALREADY
    * SYMMETRIC: (v, find(v)) AND (find(v), v) for every non-root
    * vertex, and a (r, r) self row per root — so the caller consumes
    * the output directly (no second symmetrizing pass re-running the
    * contraction), and vertices whose only edges are self-loops still
    * appear in the labeling instead of being silently dropped. Roots
    * are component-local minima, so star edges point downhill. */
  private def localContract(it: Iterator[(Long, Long)])
      : Iterator[(Long, Long)] = {
    val parent = new java.util.HashMap[Long, Long]()
    def findRoot(x: Long): Long = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x // path compression: point the walked chain at the root
      while (c != r) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    it.foreach { case (a, b) =>
      if (!parent.containsKey(a)) parent.put(a, a)
      if (!parent.containsKey(b)) parent.put(b, b)
      val ra = findRoot(a); val rb = findRoot(b)
      if (ra != rb) {
        if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
      }
    }
    val vs = parent.keySet().iterator()
    new Iterator[(Long, Long)] {
      private val buf = scala.collection.mutable.Queue.empty[(Long, Long)]
      private def fill(): Unit = {
        while (buf.isEmpty && vs.hasNext) {
          val v = vs.next()
          val r = findRoot(v)
          if (r == v) buf.enqueue((v, v))
          else { buf.enqueue((v, r)); buf.enqueue((r, v)) }
        }
      }
      def hasNext: Boolean = { fill(); buf.nonEmpty }
      def next(): (Long, Long) = { fill(); buf.dequeue() }
    }
  }

  /** Fixed-iteration PageRank over the undirected near-dup graph —
    * the centrality signal next to d8's components (a highly-ranked
    * doc is the natural cluster representative; low-rank periphery
    * nodes are weak near-dups). All arithmetic is INTEGER micro-unit:
    * ranks live as longs, contributions are floor-divided by degree,
    * and the damping multiply is (85·s)//100 — so every round is
    * bit-identical under any partitioning and the whole unrolled
    * computation is oracle-checkable (float PageRank never is: its
    * per-vertex sums are accumulation-order-dependent). Fixed `iters`
    * = no driver-side convergence probe; each round is one join on
    * the symmetric edge relation (shuffle by src) + one groupBy dst —
    * the exact shape GraphX's Pregel runs, minus the framework. Rank
    * mass lost to integer floors is deterministic and identical in
    * both engines. Returns (doc_id, pr6, deg). */
  def pageRank(pairs: DataFrame, iters: Int = 3,
      reliableDir: Option[String] = None): DataFrame = {
    val sym = pairs
      .select(col("doc_a").cast("long").as("src"),
        col("doc_b").cast("long").as("dst"))
      .union(pairs.select(col("doc_b").cast("long").as("src"),
        col("doc_a").cast("long").as("dst")))
      .distinct()
      .persistTracked() // joined against every round's ranks
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .persistTracked() // every round's rebuild + the vertex count
    val n = deg.count()
    if (n == 0) return sym.select(col("src").as("doc_id"),
      lit(0L).as("pr6"), lit(0L).as("deg"))
    val base6 = math.round(150000.0 / n) // (1-d)/N in micro-units
    var pr = deg.select(col("src").as("v"),
      lit(math.round(1000000.0 / n)).as("pr6"), col("deg"))
    for (_ <- 0 until iters) {
      val sums = sym.join(pr, sym("src") === pr("v"))
        .select(col("dst"),
          floor(col("pr6") / col("deg")).cast("long").as("c6"))
        .groupBy(col("dst")).agg(sum(col("c6")).as("s6"))
      pr = truncateLineage(
        deg.select(col("src").as("v"), col("deg"))
          .join(sums, col("v") === col("dst"), "left_outer")
          .na.fill(0L, Seq("s6"))
          .select(col("v"),
            (lit(base6) + floor(col("s6") * 85 / 100).cast("long"))
              .as("pr6"),
            col("deg")), reliableDir)
    }
    pr.select(col("v").as("doc_id"), col("pr6"), col("deg"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007) over a
    * candidate-pair relation: each vertex starts as its own label;
    * every round it adopts the MODE of its neighbors' labels (ties →
    * smallest label). Where d8's closure answers "which docs are
    * transitively connected", LPA answers the finer "which docs form
    * a densely-linked community" — the clustering step of
    * cluster-then-curate pipelines. Fixed `iters` synchronous rounds
    * with deterministic tie-breaks ⇒ engine-reproducible (the
    * asynchronous variant of the paper is order-dependent and could
    * never hash-match an oracle).
    *
    * Scale shape: each round is one edge⋈label join (shuffle on the
    * vertex key) + a (dst,label)-keyed count + a dst-keyed window
    * argmax — all keyed by vertex, no global state; rounds unroll at
    * plan time. Returns (doc_id, community, csize). */
  def labelPropagation(pairs: DataFrame, iters: Int = 3): DataFrame = {
    val sym = pairs
      .select(col("doc_a").cast("long").as("src"),
        col("doc_b").cast("long").as("dst"))
      .union(pairs.select(col("doc_b").cast("long").as("src"),
        col("doc_a").cast("long").as("dst")))
      .distinct()
      .persistTracked() // joined against every round's labels
    var lab = sym.select(col("src").as("v")).distinct()
      .withColumn("lab", col("v"))
    val w = Window.partitionBy(col("dst"))
      .orderBy(col("c").desc, col("lab").asc)
    for (_ <- 0 until iters) {
      lab = sym.join(lab, sym("src") === lab("v"))
        .select(col("dst"), col("lab"))
        .groupBy(col("dst"), col("lab")).agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("dst").as("v"), col("lab"))
    }
    // lab feeds BOTH the size aggregate and the final join — without
    // the persist the whole unrolled round chain executes twice
    val finalLab = lab.persistTracked()
    val sizes = finalLab.groupBy(col("lab"))
      .agg(count(lit(1)).as("csize"))
    finalLab.join(sizes, Seq("lab"))
      .select(col("v").as("doc_id"), col("lab").as("community"),
        col("csize"))
  }

  /** Duplicate-cluster assignment for a candidate-pair relation:
    * closes the pairs into components and annotates each member with
    * its cluster id (= min doc id in the cluster — the canonical
    * survivor) and the cluster size. Returns
    * (doc_id, component, csize); docs not in any pair are untouched
    * upstream (they are their own survivors by definition). */
  def dedupComponents(pairs: DataFrame,
      reliableDir: Option[String] = None): DataFrame = {
    val comp = connectedComponents(pairs, reliableDir = reliableDir)
    val sizes = comp.groupBy(col("comp")).agg(count(lit(1)).as("csize"))
    comp.join(sizes, Seq("comp"))
      .select(col("v").as("doc_id"), col("comp").as("component"),
        col("csize"))
  }

  /** C4-style duplicate-line removal, re-expressed over fixed-length
    * token segments (the synthetic corpus has no newlines, so the
    * "line" unit is every run of `segLen` consecutive tokens). A
    * segment instance survives iff it is the globally-first occurrence
    * of its text — lowest (doc_id, position) — and each document is
    * reassembled from its surviving segments in order.
    *
    * Scale shape: the first-occurrence choice is a window partitioned
    * BY SEGMENT TEXT (millions of partitions, no global sort); the
    * reassembly is a per-doc groupBy whose collect_list is bounded by
    * document length. Returns (doc_id, n_segs, n_kept, kept_fp) where
    * kept_fp = md5 of the reassembled text. */
  def segmentDedup(docs: DataFrame, idCol: Column, textCol: Column,
      segLen: Int): DataFrame = {
    val base = docs
      .select(idCol.as("doc_id"), TextAnalysis.tokens(textCol).as("toks"))
      .filter(size(col("toks")) > 0)
      .withColumn("n_segs",
        ceil(size(col("toks")) / segLen.toDouble).cast("long"))
      .persistTracked() // reused: segment explode + final per-doc stats join
    val segs = base.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), (col("n_segs") - 1).cast("int")),
        i => array_join(slice(col("toks"), i * segLen + 1, lit(segLen)), " ")))
        .as(Seq("gi", "seg")))
    val kept = segs
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("seg")).orderBy(col("doc_id"), col("gi"))))
      .filter(col("rk") === 1)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        // array_sort on struct(gi, seg) orders by position — makes the
        // collect_list order-independent, so the fingerprint is
        // deterministic across partitionings
        array_sort(collect_list(struct(col("gi"), col("seg")))).as("ks"))
      .select(col("doc_id"), col("n_kept"),
        md5(array_join(transform(col("ks"), x => x("seg")), " ")
          .cast("binary")).as("kept_fp"))
    base.select(col("doc_id"), col("n_segs"))
      .join(kept, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_kept"))
      .withColumn("kept_fp",
        coalesce(col("kept_fp"), md5(lit("").cast("binary"))))
  }

  /** Triangle enumeration over an undirected duplicate-pair edge list
    * (columns `doc_a`, `doc_b`) — the local-clustering signal on the
    * near-dup graph (a pair inside a triangle is corroborated by a
    * third document; a triangle-free pair is more likely an LSH
    * accident). Returns one row per triangle as (ta, tb, tc) with
    * ta < tb < tc.
    *
    * Scale shape — degree-ordered orientation (the standard distributed
    * triangle-count trick): orient every edge from its lower-(degree,
    * id) endpoint to the higher, so each wedge is generated exactly
    * once AT ITS LOWEST-DEGREE VERTEX. Wedge count drops from
    * Σ deg(v)² (quadratic in the max degree — the star-node killer) to
    * O(edges^1.5); every step is an equi-join or map-side-combinable
    * groupBy, nothing global. */
  def triangles(edges: DataFrame): DataFrame = {
    val und = edges.select(least(col("doc_a"), col("doc_b")).as("a"),
        greatest(col("doc_a"), col("doc_b")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .persistTracked() // degree count + orientation join
    val deg = und.select(col("a").as("v"))
      .union(und.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.select(col("v").as("a"), col("deg").as("deg_a")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("deg_b")), "b")
    // orient low-(deg, id) → high-(deg, id); carry the head's rank key
    // so wedge arms can be ordered without re-joining degrees
    val oriented = withDeg.select(
        when(struct(col("deg_a"), col("a")) < struct(col("deg_b"), col("b")),
          struct(col("a").as("src"), col("b").as("dst"),
            col("deg_b").as("deg_dst")))
          .otherwise(struct(col("b").as("src"), col("a").as("dst"),
            col("deg_a").as("deg_dst"))).as("e"))
      .select(col("e.src"), col("e.dst"), col("e.deg_dst"))
      .persistTracked() // wedge arms (twice) + closing-edge probe
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.src") === col("e2.src") &&
          (struct(col("e1.deg_dst"), col("e1.dst")) <
            struct(col("e2.deg_dst"), col("e2.dst"))))
      .select(col("e1.src").as("w0"), col("e1.dst").as("w1"),
        col("e2.dst").as("w2"))
    wedges.join(oriented,
        col("src") === col("w1") && col("dst") === col("w2"))
      .select(array_sort(array(col("w0"), col("w1"), col("w2"))).as("t"))
      .select(col("t")(0).as("ta"), col("t")(1).as("tb"),
        col("t")(2).as("tc"))
  }

  /** ExactSubstr-style duplicate-SPAN excision (Lee et al. 2021,
    * "Deduplicating Training Data Makes Language Models Better",
    * arXiv:2107.06499, §4.1): every L-token window whose text occurs
    * MORE THAN ONCE corpus-wide marks its span as duplicated; a
    * document's surviving text is its tokens minus the union of its
    * marked spans. This is the missing REMOVAL half of t11, which only
    * measures duplicate-span coverage — together they are the
    * boilerplate-excision stage of an LLM ingest (licence headers,
    * templated paragraphs, copy-pasted snippets that document-level
    * dedup cannot see).
    *
    * (The paper builds a corpus suffix array; the L-gram-count
    * relational form computes the same "duplicated window of length
    * ≥ L" membership for a FIXED L, which is how the technique is
    * deployed per pass.)
    *
    * Scale shape: per-document arrays are bounded by document length
    * (the unit of the format); the shuffles are one gram-count
    * aggregate (map-side combined), one dup-membership equi-join, and
    * one per-document position collect. No corpus-wide window, no
    * driver state. Returns (doc_id, n_tokens, n_removed, surv_sum)
    * where surv_sum hashes the exact surviving token stream.
    */
  def exciseDuplicateSpans(docs: DataFrame, idCol: Column,
      textCol: Column, spanLen: Int): DataFrame = {
    require(spanLen >= 2, s"spanLen must be >= 2, got $spanLen")
    val t = docs.select(idCol.as("doc_id"),
      TextAnalysis.tokens(textCol).as("w"))
    // gram starts 0..n-L (guarded: Spark's sequence(0, -1) DESCENDS)
    val g = t.select(col("doc_id"), posexplode(
      when(size(col("w")) >= spanLen,
        transform(sequence(lit(0), size(col("w")) - spanLen),
          i => array_join(slice(col("w"), i + 1, lit(spanLen)), " ")))
        .otherwise(array().cast("array<string>")))
      .as(Seq("pos", "gram")))
    val dup = g.groupBy(col("gram"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
      .select(col("gram"))
    val starts = g.join(dup, Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(col("pos"))).as("starts"))
    t.join(starts, Seq("doc_id"), "left_outer")
      .withColumn("starts",
        coalesce(col("starts"), array().cast("array<int>")))
      .withColumn("mask",
        when(size(col("w")) > 0,
          transform(sequence(lit(0), size(col("w")) - 1),
            p => exists(col("starts"),
              s => s <= p && p < s + spanLen)))
          .otherwise(array().cast("array<boolean>")))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        size(filter(col("mask"), m => m)).cast("long").as("n_removed"),
        graft.Tables.hashU32(array_join(
          filter(zip_with(col("w"), col("mask"),
            (tok, m) => when(m, lit(null)).otherwise(tok)),
            x => x.isNotNull), " "), 13).as("surv_sum"))
  }

  /** Content-defined chunking (CDC) — the blob-level dedup primitive
    * for multimodal/file corpora (the chunk-store idea of LBFS,
    * Muthitacharoen et al. SOSP'01, and FastCDC, Xia et al. ATC'16):
    * chunk boundaries are a pure function of CONTENT (a boundary
    * wherever the hash of the trailing `window` chars ≡ 0 mod
    * `divisor`), so shared runs in different documents — or the same
    * document shifted by an insertion — re-align on identical chunks
    * after at most one boundary, where any fixed-size blocking stays
    * misaligned forever. Mean chunk length ≈ `divisor` chars.
    *
    * Returns the chunk relation (doc_id, source, chunk_idx, chunk,
    * ch = md5(chunk), chunk_len); dedup stats are one groupBy away
    * (d14). Empty documents contribute no chunks.
    *
    * Scale shape: boundary detection and chunk slicing are per-row
    * array HOFs (no shuffle, bounded by document length — the unit of
    * the format); the only shuffles downstream are the chunk-hash
    * aggregate and membership join, both keyed on md5 (uniform, no
    * skew). The boundary hash is an unrolled degree-(window−1)
    * polynomial over the trailing window's codepoints (base 131, the
    * gear-hash family) — pure integer multiply-adds inside
    * whole-stage codegen, ~8 scalar ops per position where an md5
    * window hash costs a digest + hex decode per position (measured
    * 5× slower at sf0.1). Both engines compute it bit-identically.
    * Use a PRIME divisor: a power of two degenerates through the
    * base's power cycle mod 2^k and fires boundaries off only a few
    * character positions.
    */
  def cdcChunks(docs: DataFrame, idCol: Column, srcCol: Column,
      textCol: Column, window: Int, divisor: Int, seed: Int): DataFrame = {
    require(window >= 2 && divisor >= 2,
      s"window/divisor must be >= 2, got $window/$divisor")
    // h(p) = seed + Σ_{j<window} (cp(text[p−j]) % 256)·131^j, read
    // from a per-doc codepoint array decoded ONCE — substr(p, 1) on a
    // UTF8 string is an O(p) walk (variable-length encoding), so
    // per-position substrs would make boundary detection O(n²·w) per
    // doc (measured 4× slower than even the md5 variant at sf0.1);
    // element_at on the int array is O(1). The array is BOUND AS A
    // LAMBDA VARIABLE (transform over a 1-element wrapper): a plain
    // projected column gets inlined by CollapseProject into all
    // `window` element_at references — re-decoding the whole string
    // per position — while a lambda argument is evaluated exactly
    // once per row, which Catalyst cannot inline through. The % 256
    // caps each term so the sum stays ≤ 255·Σ131^j ≈ 1.3e15 — far
    // inside BIGINT in BOTH engines (DuckDB THROWS on overflow where
    // Java wraps, so unbounded codepoints would break parity on
    // astral-plane text, not just hash badly).
    require(window <= 8, s"window must be <= 8 (131^8 overflows), got $window")
    val coef: IndexedSeq[Long] =
      (0 until window).map(j => (0 until j).foldLeft(1L)((a, _) => a * 131L))
    val cpsExpr = transform(
      filter(split(col("text"), ""), ch => ch =!= ""),
      ch => ascii(ch).cast("long") % 256)
    def boundaryHash(cps: Column, p: Column): Column =
      (0 until window).map(j =>
        element_at(cps, p - j) * lit(coef(j)))
        .reduce(_ + _) + lit(seed.toLong)
    docs.select(idCol.as("doc_id"), srcCol.as("source"),
        textCol.as("text"))
      .withColumn("n", length(col("text")))
      .filter(col("n") > 0)
      // boundary positions p (window <= p < n): chunk ends at p when
      // the trailing window's hash divides; p = n is excluded so the
      // final chunk is never empty
      .withColumn("bps", when(col("n") > window,
        element_at(transform(array(cpsExpr), cps =>
          filter(sequence(lit(window), col("n") - 1),
            p => boundaryHash(cps, p) % divisor === 0)), 1))
        .otherwise(array().cast("array<int>")))
      .withColumn("chunks", zip_with(
        concat(array(lit(1)), transform(col("bps"), b => b + 1)),
        concat(col("bps"), array(col("n"))),
        (s, e) => col("text").substr(s, e - s + 1)))
      .select(col("doc_id"), col("source"),
        posexplode(col("chunks")).as(Seq("chunk_idx", "chunk")))
      .withColumn("ch", md5(col("chunk")))
      .withColumn("chunk_len", length(col("chunk")).cast("long"))
  }

  /** Embedding-cosine near-dup: all pairs with cosine ≥ threshold.
    * Brute-force O(n²) pairing — correct at verification scale; at 100 TB
    * route candidates through
    * [[graft.operators.Similarity.lshNearDup]] instead — bucketed,
    * deterministic, and oracle-checked as d7. */
  def embeddingNearDup(emb: DataFrame, idCol: Column, vecCol: Column,
      threshold: Double): DataFrame = {
    val a = emb.select(idCol.as("id_a"), vecCol.as("v_a"))
      .withColumn("n_a", Similarity.norm(col("v_a")))
    val b = emb.select(idCol.as("id_b"), vecCol.as("v_b"))
      .withColumn("n_b", Similarity.norm(col("v_b")))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine",
        Similarity.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Query-string parameters dropped by [[canonicalizeUrl]]: the
    * click-tracking decorations that make one page arrive under
    * thousands of distinct URLs in a crawl (the reason raw-URL dedup
    * under-merges badly). Matched on the parameter NAME prefix. */
  private val TrackingParams =
    Seq("utm_", "fbclid=", "gclid=", "msclkid=", "ref=", "mc_cid=",
      "mc_eid=")

  /** Canonical form of a URL — the crawl-dedup key every web-scale
    * pipeline computes before anything content-based runs (one page =
    * many raw URLs: case-variant hosts, default ports, fragments,
    * tracking params, param order, trailing slashes, `www.`).
    *
    * Entirely a composition of codegen'd built-in expressions (regexp /
    * split / higher-order array functions) — NO UDF — so at 100 TB it
    * runs inside whole-stage codegen as a pure map stage and the dedup
    * itself is one hash-partitioned groupBy on the result.
    *
    * Normalizations (each deterministic and DuckDB-replicable):
    * scheme + host lowercased; `www.` stripped; default ports (:80
    * http, :443 https) stripped, other ports kept; fragment dropped;
    * tracking params dropped and the remainder SORTED; trailing
    * slashes stripped from the path. Percent-encoding case and dot-
    * segment resolution are out of scope (they need a decoder, not a
    * rewrite — documented non-goals). */
  def canonicalizeUrl(url: Column): Column = {
    val u = trim(url)
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.\\-]*)://", 1))
    // authority [host[:port]] = everything between :// and / ? #
    val noFrag = regexp_replace(
      regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.\\-]*://", ""), "#.*$", "")
    val authority = regexp_extract(noFrag, "^([^/?]*)", 1)
    val pathQuery = regexp_replace(noFrag, "^[^/?]*", "")
    val port = regexp_extract(authority, ":([0-9]+)$", 1)
    val host = regexp_replace(
      lower(regexp_replace(authority, ":[0-9]+$", "")), "^www\\.", "")
    val keepPort = when(port === "", lit(""))
      .when(scheme === lit("http") && port === "80", lit(""))
      .when(scheme === lit("https") && port === "443", lit(""))
      .otherwise(concat(lit(":"), port))
    val path = regexp_replace(regexp_extract(pathQuery, "^([^?]*)", 1),
      "/+$", "")
    val query = regexp_extract(pathQuery, "\\?(.*)$", 1)
    val kept = filter(split(query, "&"), p =>
      p =!= "" && !TrackingParams.map(t => p.startsWith(t))
        .reduce(_ || _))
    val q = array_join(array_sort(kept), "&")
    concat(scheme, lit("://"), host, keepPort, path,
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** Canonical-URL dedup census: groups whose raw URLs collapse to one
    * canonical form, with the lowest doc id the survivor (the house
    * dedup keep rule). One codegen'd map (canonicalize) + one
    * hash-partitioned groupBy — the cheapest dedup tier of all, run
    * FIRST in every crawl pipeline because it needs no content. */
  def urlDedup(docs: DataFrame, idCol: Column, urlCol: Column)
      : DataFrame =
    docs.select(idCol.as("doc_id"), urlCol.as("url"))
      .withColumn("canonical_url", canonicalizeUrl(col("url")))
      .groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("n_raw"),
        countDistinct(col("url")).as("n_raw_distinct"),
        min(col("doc_id")).as("keep_id"),
        (sum(col("doc_id")) - min(col("doc_id"))).as("dropped_id_sum"))
}
