package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Bpe, Curation, PipelineOps, TextAnalysis}

/** Tests for the round-2 curation operators: stratified sampling, PII
  * scrubbing, repetition metrics, contamination. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("chunkDocuments: overlap, tail chunk, full coverage, no shuffle") {
    // 10 tokens, chunkLen 4, stride 3 → starts 0,3,6 — the minimal
    // cover (start 6 reaches token 10); no degenerate tail window
    val docs = Seq((1L, "a b c d e f g h i j"), (2L, "x y"), (3L, "   "))
      .toDF("doc_id", "text")
    val out = Curation.chunkDocuments(docs, col("doc_id"), col("text"),
        chunkLen = 4, stride = 3)
      .select("doc_id", "chunk_idx", "n_tokens")
      .as[(Long, Long, Long)].collect().sorted
    assert(out.filter(_._1 == 1L).map(r => (r._2, r._3)).toSeq ==
      Seq((0L, 4L), (1L, 4L), (2L, 4L)))
    assert(out.filter(_._1 == 2L).map(r => (r._2, r._3)).toSeq ==
      Seq((0L, 2L))) // short doc: one short chunk
    assert(!out.exists(_._1 == 3L)) // token-less doc emits nothing
    // stride < chunkLen covers every token: last chunk end ≥ n
    // chunking is a pure map stage — no exchange anywhere in the plan
    val plan = Curation.chunkDocuments(docs, col("doc_id"), col("text"), 4, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("stratifiedTopK equals the single-window per-stratum top-k") {
    val df = spark.range(2000)
      .withColumn("stratum", (col("id") % 7).cast("string"))
      .withColumn("payload", col("id") * 3)
    val twoPhase = PipelineOps.stratifiedTopK(df, col("stratum"), col("id"),
      k = 13, seed = 5, salts = 8)
      .select("stratum", "sample_rank", "id")
      .as[(String, Long, Long)].collect().toSet
    // reference implementation: one window per stratum (the thing the
    // two-phase version must equal while staying bounded per reducer)
    val w = Window.partitionBy(col("stratum"))
      .orderBy(graft.Tables.shuffleKey(col("id"), 5), col("id"))
    val oneWindow = df.withColumn("sample_rank",
        row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= 13)
      .select("stratum", "sample_rank", "id")
      .as[(String, Long, Long)].collect().toSet
    assert(twoPhase == oneWindow)
    assert(twoPhase.groupBy(_._1).forall(_._2.size == 13))
    // k larger than a stratum returns the whole stratum, still ranked
    val tiny = spark.range(5).withColumn("stratum", lit("only"))
    val all = PipelineOps.stratifiedTopK(tiny, col("stratum"), col("id"),
      k = 50, seed = 1, salts = 4)
    assert(all.count() == 5)
    assert(all.agg(max("sample_rank")).as[Long].head() == 5L)
  }

  test("packSequences equals a flat cumulative layout; spans are tight") {
    val df = spark.range(500)
      .withColumn("grp", (col("id") % 3).cast("string"))
      .withColumn("n", col("id") % 37 + 1)
    val packed = Curation.packSequences(df, col("id"), col("grp"),
      col("n"), ctxLen = 100, seed = 9, buckets = 8)
      .select("doc_id", "grp", "n_toks", "start_off", "first_seq", "last_seq")
      .as[(Long, String, Long, Long, Long, Long)].collect()
    // reference: one flat window over the same (bucket, key, id) order
    val h = graft.Tables.shuffleKey(col("id"), 9)
    val bk = pmod(graft.Tables.hashU32(col("id"), 10), lit(8L))
    val w = Window.partitionBy(col("grp")).orderBy(bk, h, col("id"))
    val flat = df.withColumn("off", sum(col("n")).over(w) - col("n"))
      .select(col("id"), col("off")).as[(Long, Long)].collect().toMap
    packed.foreach { case (id, _, n, off, fs, ls) =>
      assert(off == flat(id), s"offset mismatch for $id")
      assert(fs == off / 100 && ls == (off + n - 1) / 100)
    }
    // offsets within each group tile the stream exactly (no gaps/overlap)
    packed.groupBy(_._2).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.head._4 == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 + a._3 == b._4)
        case _ =>
      }
    }
  }

  test("packSequences: a document longer than the context spans windows") {
    val df = Seq((1L, "g", 300L), (2L, "g", 50L), (3L, "g", 10L))
      .toDF("id", "grp", "n")
    val out = Curation.packSequences(df, col("id"), col("grp"), col("n"),
      ctxLen = 128, seed = 1, buckets = 4)
      .select("doc_id", "n_toks", "start_off", "first_seq", "last_seq")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // the 300-token doc must span ceil over at least 2 sequence windows
    val big = out(1L)
    assert(big._5 - big._4 >= 2 || big._5 > big._4,
      s"300-token doc in 128-token windows must span: $big")
    assert(big._5 == (big._3 + 300 - 1) / 128 && big._4 == big._3 / 128)
    // total stream length is conserved
    assert(out.values.map(_._2).sum == 360L)
  }

  test("temperatureResample at alpha=1 keeps the natural mixture rate") {
    val df = spark.range(1000).withColumn("cls",
      when(col("id") < 800, "a").otherwise("b"))
    // alpha=1: w_l = c_l / total, so rate = min(1, T/total) for EVERY
    // class — uniform downsampling, mixture preserved
    val rates = Curation.temperatureResample(df, col("id"), col("cls"),
      alpha = 1.0, targetCount = 500, seed = 7)
      .select("cls", "rate6").distinct()
      .as[(String, Long)].collect().toMap
    assert(rates("a") == 500000L && rates("b") == 500000L, s"got $rates")
  }

  test("temperatureResample flattens the mixture toward equal classes") {
    // skewed corpus: class a = 900 rows, b = 90, c = 10
    val df = spark.range(1000).withColumn("cls",
      when(col("id") < 900, "a").when(col("id") < 990, "b").otherwise("c"))
    val kept = Curation.temperatureResample(df, col("id"), col("cls"),
      alpha = 0.5, targetCount = 300, seed = 3)
      .select("cls", "doc_id").as[(String, Long)].collect()
    val byCls = kept.groupBy(_._1).view.mapValues(_.size).toMap
    // α=0.5 weights ∝ sqrt(c): 30/9.49/3.16 → rates ≈ .234/.74/1.0 —
    // c is kept whole, a is cut hardest
    assert(byCls("c") == 10, s"rare class must be fully kept: $byCls")
    assert(byCls("a") < 300 && byCls("a") > 130, s"got $byCls")
    assert(byCls("b") > 40 && byCls("b") <= 90, s"got $byCls")
    // deterministic: second run identical
    val again = Curation.temperatureResample(df, col("id"), col("cls"),
      alpha = 0.5, targetCount = 300, seed = 3)
      .select("cls", "doc_id").as[(String, Long)].collect()
    assert(kept.toSet == again.toSet)
  }

  test("lengthBucketedBatches: full batches, bounded waste, beats naive") {
    // bimodal lengths (10s and 1000s): naive batches mix modes and pad
    // the short docs to ~1000; bucketed batches keep modes apart
    val df = spark.range(400)
      .withColumn("n", when(col("id") % 2 === 0, col("id") % 7 + 10)
        .otherwise(col("id") % 13 + 1000))
    def assignment(byLength: Boolean) =
      Curation.lengthBucketedBatches(df, col("id"), col("n"),
        batchSize = 8, shards = 2, seed = 3, byLength = byLength)
    val b = assignment(byLength = true)
    // every doc assigned exactly once; batch sizes never exceed B and
    // only the LAST batch of a (bucket, shard) may be short
    assert(b.count() == 400 &&
      b.select("doc_id").distinct().count() == 400)
    val sizes = b.groupBy("bucket", "shard", "batch_id").count()
    assert(sizes.filter(col("count") > 8).count() == 0)
    val short = sizes.filter(col("count") < 8)
      .select("bucket", "shard", "batch_id")
      .as[(Long, Long, Long)].collect()
    val lastBatch = b.groupBy("bucket", "shard")
      .agg(max("batch_id").as("mx")).as[(Long, Long, Long)]
      .collect().map { case (bu, sh, mx) => (bu, sh) -> mx }.toMap
    short.foreach { case (bu, sh, bid) =>
      assert(bid == lastBatch((bu, sh)), "short batch must be the last")
    }
    // bit-length classes bound within-batch spread → far less padding
    def waste(byLength: Boolean): Long =
      assignment(byLength)
        .groupBy("bucket", "shard", "batch_id")
        .agg((count(lit(1)) * max("n_toks") - sum("n_toks")).as("w"))
        .agg(sum("w")).as[Long].head()
    val (wb, wn) = (waste(true), waste(false))
    assert(wb * 5 < wn, s"bucketed=$wb should be far below naive=$wn")
  }

  test("weightedTopK: heavier rows overrepresented, sample deterministic") {
    // 500 light rows (w=10) + 500 heavy rows (w=1000): heavy rows carry
    // ~99% of the total weight and must dominate a 100-row sample
    val df = spark.range(1000).select(col("id"),
      when(col("id") < 500, 10L).otherwise(1000L).as("w"))
    val sample = Curation.weightedTopK(df, col("id"), col("w"),
      k = 100, seed = 7)
    val rows = sample.select("doc_id", "rank").as[(Long, Long)].collect()
    assert(rows.length == 100)
    assert(rows.map(_._2).sorted.sameElements(1L to 100L))
    val heavy = rows.count(_._1 >= 500)
    assert(heavy > 80, s"heavy rows must dominate the sample: $heavy/100")
    // without-replacement: ids distinct; deterministic: re-run identical
    assert(rows.map(_._1).distinct.length == 100)
    val again = Curation.weightedTopK(df, col("id"), col("w"),
      k = 100, seed = 7).select("doc_id", "rank")
      .as[(Long, Long)].collect()
    assert(rows.sorted.sameElements(again.sorted))
  }

  test("dupSpanStats counts cross-doc repeated windows (t11)") {
    val docs = Seq(
      (1L, "a b c d e f"),    // spans: abcde, bcdef
      (2L, "a b c d e zzz"),  // shares abcde with doc 1
      (3L, "p q r s t u")     // nothing shared
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dupSpanStats(docs, col("doc_id"), col("text"),
      w = 5).select("doc_id", "n_spans", "n_dup_spans", "dup_frac")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 2 && out(1L)._3 == 1 && out(1L)._4 == 0.5)
    assert(out(2L)._2 == 2 && out(2L)._3 == 1)
    assert(out(3L)._2 == 2 && out(3L)._3 == 0 && out(3L)._4 == 0.0)
  }

  test("unigramLogProb scores common-token text higher (t12)") {
    val docs = Seq(
      (1L, "the the the the"),       // only common tokens
      (2L, "the the rareword1 rareword2") // half rare
    ).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(docs, col("doc_id"), col("text"))
      .select("doc_id", "n_tokens", "mean_logprob")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 4 && out(2L)._2 == 4)
    // "the" has p=6/8; doc 1's mean = ln(0.75); doc 2 mixes ln(1/8)s
    assert(math.abs(out(1L)._3 - math.log(0.75)) < 1e-5)
    assert(out(1L)._3 > out(2L)._3)
    // deterministic across runs
    val again = TextAnalysis.unigramLogProb(docs, col("doc_id"), col("text"))
      .select("doc_id", "n_tokens", "mean_logprob")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(again == out)
  }

  test("bloom-pre-filtered contamination equals the exact broadcast join") {
    val docs = Tables.documents(spark, Sf0001)
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val exact = TextAnalysis.contamination(docs, bench, col("doc_id"),
      col("text"), n = 3)
      .select("doc_id", "n_shared", "n_shingles", "contamination")
      .as[(Long, Long, Long, Double)].collect().toSet
    // a deliberately tiny filter (512 bits) guarantees false positives;
    // the exact verification join must remove every one of them
    val bloom = TextAnalysis.contaminationBloom(docs, bench, col("doc_id"),
      col("text"), n = 3, mBits = 512, kHashes = 3)
      .select("doc_id", "n_shared", "n_shingles", "contamination")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(bloom == exact)
    assert(exact.nonEmpty)
  }

  test("scrubPii redacts emails, IPs, phones; counts match (t6)") {
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.org and 192.168.0.1 now"),
      (2L, "call 555-123-4567 or 555-000-1111"),
      (3L, "clean text, no pii at all"),
      (4L, "1.2.3.4 5.6.7.8 a@b.io")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      TextAnalysis.piiCount(col("text"), TextAnalysis.PiiPatterns(0)._2)
        .as("ne"),
      TextAnalysis.piiCount(col("text"), TextAnalysis.PiiPatterns(1)._2)
        .as("ni"),
      TextAnalysis.piiCount(col("text"), TextAnalysis.PiiPatterns(2)._2)
        .as("np"),
      TextAnalysis.scrubPii(col("text")).as("s"))
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 1 && out(1L)._3 == 1 && out(1L)._4 == 0)
    assert(out(1L)._5 == "mail <EMAIL> and <IP> now")
    assert(out(2L)._4 == 2 &&
      out(2L)._5 == "call <PHONE> or <PHONE>")
    assert(out(3L)._5 == "clean text, no pii at all")
    assert(out(4L)._2 == 1 && out(4L)._3 == 2 &&
      out(4L)._5 == "<IP> <IP> <EMAIL>")
  }

  test("repetitionStats computes top-token share and repeated fraction (t8)") {
    val df = Seq(
      (1L, "a a a b"), // 4 tokens, 2 distinct, top 3/4, rep 1/2
      (2L, "x y z"), // no repetition
      (3L, "w w w w")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(df, col("doc_id"), col("text"))
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 4L, 2L, 0.75, 0.5)))
    assert(out(2L) == ((2L, 3L, 3L, 0.333333, 0.0))) // rounded to 6 dp
    assert(out(3L) == ((3L, 4L, 1L, 1.0, 0.75)))
  }

  test("contamination counts shared distinct n-grams, excludes bench docs (t7)") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"), // benchmark
      (1L, "a quick brown fox runs far away from here"), // shares 1 3-gram
      (2L, "totally different words appear in this one here"), // shares 0
      (3L, "the quick brown fox jumps over a cliff edge")) // shares 4
      .toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") === 0)
    val out = TextAnalysis.contamination(docs, bench, col("doc_id"),
      col("text"), n = 3)
      .select("doc_id", "n_shared").as[(Long, Long)].collect().toMap
    assert(!out.contains(0L)) // benchmark doc excluded
    assert(out(1L) == 1L) // "quick brown fox"
    assert(!out.contains(2L)) // zero shared → absent (inner join)
    // the-quick-brown, quick-brown-fox, brown-fox-jumps, fox-jumps-over
    assert(out(3L) == 4L)
  }

  test("contamination attribution names the argmax benchmark doc (t41)") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"), // bench
      (10L, "a quick brown fox runs far away from here"), // bench
      (1L, "the quick brown fox jumps over a cliff edge"), // 4 vs 0, 1 vs 10
      (2L, "quick brown fox runs far away from here now"), // 1 vs 0, 6 vs 10
      (3L, "totally different words appear in this one here"), // clean
      (4L, "whatever quick brown fox plus unrelated trailing words"))
      .toDF("doc_id", "text") // doc 4: exactly 1 vs BOTH → tie
    val bench = docs.filter(col("doc_id") === 0 || col("doc_id") === 10)
    val out = TextAnalysis.contaminationAttribution(docs, bench,
        col("doc_id"), col("text"), n = 3)
      .select("doc_id", "bench_id", "n_overlap")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == (0L, 4L)) // argmax picks the 4-shingle culprit
    assert(out(2L) == (10L, 6L)) // ...even when doc 0 also overlaps
    assert(out(4L) == (0L, 1L)) // ties break to the lowest bench id
    assert(!out.contains(3L)) // clean docs are absent
    assert(!out.contains(0L) && !out.contains(10L)) // bench excluded
    // the p9 tier report keeps only docs at/above tau: with tau 0.5
    // doc 2 (6/7 shingles) and doc 1 (4/7) qualify, doc 4 (1/7) not
    val report = graft.operators.Curation.decontamAttributionReport(
        docs, bench, col("doc_id"), col("text"), n = 3,
        contamTau = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(report == Seq(1L, 2L))
    // the span companion quotes the SAME dropped set, with ≥ 1
    // quotable excerpt per (doc, bench) pair it names
    val spanRep = graft.operators.Curation.decontamSpanReport(
        docs, bench, col("doc_id"), col("text"), n = 3,
        contamTau = 0.5)
    assert(spanRep.select("doc_id").distinct()
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    assert(spanRep.filter(col("excerpt") === "" ||
      col("tok_end") <= col("tok_start")).count() == 0)
  }

  test("uniMaxMixture: hand-computed water-filling, caps bind in order (t21)") {
    // sizes 100/400/10000 → weights √n = 10/20/100, total budget =
    // 10500 chars (10.5e6 milli). Uncapped √-temperature allocation
    // gives `a` 8.08 epochs and `b` 4.33 — both beyond the 1.2-epoch
    // cap — while the big class `c` ends at 0.99: K = 2, residual
    // budget 9.9e6 milli-chars flows entirely to `c`
    val docs = (Seq.fill(1)(("a", 100L)) ++ Seq.fill(2)(("b", 200L)) ++
      Seq.fill(4)(("c", 2500L))).toDF("lang", "n_chars")
    val out = Curation.uniMaxMixture(docs, col("lang"), col("n_chars"),
        capMilliEpochs = 1200)
      .select("lang", "n", "w", "capped", "alloc3", "ep3")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      ("a", 100L, 10L, 1L, 120000L, 1200L),
      ("b", 400L, 20L, 1L, 480000L, 1200L),
      ("c", 10000L, 100L, 0L, 9900000L, 990L)))
    // allocations never exceed the budget and capped rows sit exactly
    // at the cap
    assert(out.map(_._5).sum <= 10500L * 1000L)
  }

  test("uniMaxMixture: nothing capped when the cap is loose (K = 0)") {
    val docs = Seq(("a", 100L), ("b", 400L), ("c", 10000L))
      .toDF("lang", "n_chars")
    val out = Curation.uniMaxMixture(docs, col("lang"), col("n_chars"),
        capMilliEpochs = 10000) // 10 epochs — never binds
      .select("lang", "capped", "alloc3")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(out.forall(_._2 == 0L))
    // pure proportional split: alloc_i = A·w_i/totW (floor division)
    val a = 10500L * 1000L
    assert(out.map(_._3).toSeq ==
      Seq(a * 10 / 130, a * 20 / 130, a * 100 / 130))
  }

  test("uniMaxMixture: everything capped when the cap is tight (K = L)") {
    val docs = Seq(("a", 100L), ("b", 400L), ("c", 10000L))
      .toDF("lang", "n_chars")
    val out = Curation.uniMaxMixture(docs, col("lang"), col("n_chars"),
        capMilliEpochs = 500) // 0.5 epochs — every class hits it
      .select("lang", "capped", "alloc3", "ep3")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.forall(r => r._2 == 1L && r._4 == 500L))
    assert(out.map(_._3).toSeq == Seq(50000L, 200000L, 5000000L))
  }

  test("uniMaxMixture: no Long overflow at 100 TB-scale class sizes") {
    // Class sizes in the 1e13..5e15 char range (≈ the 100 TB corpus the
    // framework targets): the boundary product bigR·w reaches ~1e24,
    // which WRAPS in 64-bit arithmetic (Long.Max = 9.2e18). The decimal
    // path must keep it exact: a wrapped product flips the cap
    // comparisons, producing negative or budget-violating allocations.
    val docs = Seq(("small", 10_000_000_000_000L), // 1e13
      ("mid", 400_000_000_000_000L), // 4e14
      ("big", 5_000_000_000_000_000L)) // 5e15
      .toDF("lang", "n_chars")
    val out = Curation.uniMaxMixture(docs, col("lang"), col("n_chars"),
        capMilliEpochs = 1200)
      .select("lang", "n", "capped", "alloc3", "ep3")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1)
    val totN = docs.agg(sum(col("n_chars"))).as[Long].head()
    // sanity under exact arithmetic: every allocation positive, capped
    // rows sit exactly at the cap, nothing exceeds it, and the total
    // stays within the one-pass budget A = totN·1000
    assert(out.forall(_._4 > 0L), s"negative/zero alloc (overflow): ${out.toSeq}")
    assert(out.forall(r => r._5 <= 1200L))
    assert(out.filter(_._3 == 1L).forall(_._5 == 1200L))
    assert(out.map(_._4).sum <= totN * 1000L)
    // the small class is capped first (UniMax order), the big one isn't
    assert(out.find(_._1 == "small").get._3 == 1L)
    assert(out.find(_._1 == "big").get._3 == 0L)
  }

  test("curriculumOrder: contiguous easy→hard stages, exact sizes, " +
      "shuffled-but-deterministic positions") {
    // N=10, 4 stages → stage sizes ceil((s+1)N/4)−ceil(sN/4) = 3,2,3,2
    val docs = (1 to 10).map(i => (i.toLong, (11 - i).toLong * 10))
      .toDF("doc_id", "nch") // difficulty DESCENDS in doc_id
    val out = Curation.curriculumOrder(docs, col("doc_id"), col("nch"),
        nStages = 4, seed = 11)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length == 10)
    val byStage = out.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(byStage.keySet == Set(0L, 1L, 2L, 3L))
    assert(byStage.view.mapValues(_.length).toMap ==
      Map(0L -> 3, 1L -> 2, 2L -> 3, 3L -> 2))
    // positions are 1..size within each stage
    byStage.foreach { case (_, rows) =>
      assert(rows.map(_._2).toSeq == (1 to rows.length).map(_.toLong))
    }
    // stages are contiguous difficulty ranges: max(s) <= min(s+1)
    val maxD = byStage.view.mapValues(_.map(_._4).max).toMap
    val minD = byStage.view.mapValues(_.map(_._4).min).toMap
    for (s <- 0L to 2L) assert(maxD(s) <= minD(s + 1))
    // determinism
    val again = Curation.curriculumOrder(docs, col("doc_id"),
        col("nch"), nStages = 4, seed = 11)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.sortBy(r => (r._1, r._2)).toSeq ==
      again.sortBy(r => (r._1, r._2)).toSeq)
    // a different seed permutes within-stage order but not membership
    val other = Curation.curriculumOrder(docs, col("doc_id"),
        col("nch"), nStages = 4, seed = 12)
      .as[(Long, Long, Long, Long)].collect()
    assert(other.groupBy(_._1).view
      .mapValues(_.map(_._3).toSet).toMap ==
      byStage.view.mapValues(_.map(_._3).toSet).toMap)
  }

  test("packedWindowManifest: dense-layout invariants on the corpus") {
    val docs = Tables.documents(spark, Sf0001)
    val ctx = 128
    val packed = Curation.packSequences(docs, col("doc_id"),
      col("source"),
      size(graft.operators.TextAnalysis.tokens(col("text"))),
      ctxLen = ctx, seed = 17, buckets = 8)
    val man = Curation.packedWindowManifest(packed, ctx)
    val rows = man.select("grp", "seq_id", "n_docs", "n_resets",
        "filled").as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // the concat stream is dense: every window's start is covered by
    // exactly one slice (a continuation or an exactly-aligned start),
    // so n_docs == n_resets + 1 for EVERY window
    rows.foreach { case (g, sq, nd, nr, _) =>
      assert(nd == nr + 1, s"($g,$sq): n_docs=$nd n_resets=$nr")
    }
    // fill conservation: windows of a group sum to the group's tokens,
    // and every non-final window is exactly full
    val byGrp = rows.groupBy(_._1)
    val toks = packed.groupBy(col("grp"))
      .agg(sum(col("n_toks")).as("t"))
      .as[(String, Long)].collect().toMap
    byGrp.foreach { case (g, ws) =>
      assert(ws.map(_._5).sum == toks(g))
      val lastSeq = ws.map(_._2).max
      ws.filter(_._2 != lastSeq).foreach { w =>
        assert(w._5 == ctx, s"non-final window underfilled: $w")
      }
    }
    // deterministic fingerprints
    val fp1 = man.select("grp", "seq_id", "seg_fp")
      .as[(String, Long, String)].collect().toSet
    val fp2 = Curation.packedWindowManifest(packed, ctx)
      .select("grp", "seq_id", "seg_fp")
      .as[(String, Long, String)].collect().toSet
    assert(fp1 == fp2)
  }

  test("p9 corpus build: every tier carries live traffic; pack drops none") {
    val base = Tables.documents(spark, Sf0001)
    val dupes = base.filter(col("doc_id") % 13 === 0 &&
        col("doc_id") % 97 =!= 0)
      .withColumn("doc_id", col("doc_id") + 970000L)
    val leaks = base.filter(col("doc_id") % 97 === 0)
      .withColumn("doc_id", col("doc_id") + 1940001L)
    val aug = base.unionByName(dupes).unionByName(leaks)
    val merges = Bpe.train(Bpe.vocab(base, col("text"), 4096), 16)
    val census = Curation.corpusBuildCensus(aug, col("doc_id"),
        col("text"), col("source"), merges)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3))).toMap
    // chain consistency: stage N's input is stage N-1's output
    (2L to 5L).foreach { s =>
      assert(census(s)._1 == census(s - 1)._2, s"stage $s input")
    }
    // live traffic: every filtering tier drops at least one doc
    (1L to 4L).foreach { s =>
      assert(census(s)._2 < census(s)._1, s"stage $s must drop docs")
    }
    // packing assigns offsets, never drops documents
    assert(census(5L)._2 == census(5L)._1)
  }

  test("p10 corpus refresh: resubmissions die at the exact tier") {
    val docs = Tables.documents(spark, Sf0001)
    val state = docs.filter(col("doc_id") % 10 =!= 7)
    val resub = state.filter(col("doc_id") % 50 === 0)
      .withColumn("doc_id", col("doc_id") + 1000007L)
    val batch = docs.filter(col("doc_id") % 10 === 7)
      .unionByName(resub)
    val census = Curation.corpusRefreshCensus(state, batch,
        col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3))).toMap
    (2L to 3L).foreach { s =>
      assert(census(s)._1 == census(s - 1)._2, s"stage $s input")
    }
    // every tier drops at least one doc (gates, exact resubmissions,
    // natural cross-set near-dups)
    (1L to 3L).foreach { s =>
      assert(census(s)._2 < census(s)._1, s"stage $s must drop docs")
    }
    // every injected resubmission that survived the gates is caught
    // at the exact tier: run with NO resubmissions and compare —
    // stage-2 drops shrink by exactly the surviving resub count
    val noResub = Curation.corpusRefreshCensus(state,
        docs.filter(col("doc_id") % 10 === 7), col("doc_id"),
        col("text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3))).toMap
    val resubSurvivingGates = census(1L)._2 - noResub(1L)._2
    val dropsWith = census(2L)._1 - census(2L)._2
    val dropsWithout = noResub(2L)._1 - noResub(2L)._2
    assert(dropsWith - dropsWithout == resubSurvivingGates)
  }
}
