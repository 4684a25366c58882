package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, TextAnalysis}

/** The corpus-shaping wave: FIM re-serialization, SFT loss-mask
  * packing, cluster caps, multiplicative-weights mixture, and n-gram
  * continuation serving. */
class CorpusShapingSpec extends SparkSpec {
  import spark.implicits._

  /** JVM twin of Tables.hashU32 — independent of the Spark plan. */
  private def u32(key: String, seed: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$key#$seed".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    java.lang.Long.parseLong(hex, 16)
  }

  // ———— fimTransform ————

  test("fim: rate 100 reproduces the hand-derived PSM text exactly") {
    val docs = Seq((7L, "abcdefgh"), (8L, ""), (9L, "x"))
      .toDF("doc_id", "text")
    val out = Curation.fimTransform(docs, col("doc_id"), col("text"),
        ratePct = 100, seed = 5)
      .collect().map(r => r.getLong(0) -> r).toMap
    for ((id, text) <- Seq((7L, "abcdefgh"), (8L, ""), (9L, "x"))) {
      val n = text.length
      val c1 = u32(id.toString, 6) % (n + 1)
      val c2 = u32(id.toString, 7) % (n + 1)
      val (lo, hi) = (math.min(c1, c2).toInt, math.max(c1, c2).toInt)
      val expected = "<PRE>" + text.substring(0, lo) + "<SUF>" +
        text.substring(hi) + "<MID>" + text.substring(lo, hi)
      val r = out(id)
      assert(r.getInt(1) == 1, s"doc $id should be applied")
      assert(r.getLong(2) == lo && r.getLong(3) == hi,
        s"doc $id cuts: got (${r.getLong(2)},${r.getLong(3)}), " +
          s"want ($lo,$hi)")
      assert(r.getLong(4) == expected.length.toLong)
      assert(r.getLong(5) == u32(expected, 8),
        s"doc $id out_fp mismatch — transformed text differs")
    }
  }

  test("fim: rate 0 passes every document through untouched") {
    val docs = Seq((1L, "hello world")).toDF("doc_id", "text")
    val r = Curation.fimTransform(docs, col("doc_id"), col("text"),
      ratePct = 0, seed = 5).collect().head
    assert(r.getInt(1) == 0 && r.isNullAt(2) && r.isNullAt(3))
    assert(r.getLong(4) == 11L)
    assert(r.getLong(5) == u32("hello world", 8))
  }

  test("fim: applied docs grow by exactly the 15 sentinel chars") {
    val docs = (0L until 50L).map(i => (i, "doc text nr " + i))
      .toDF("doc_id", "text")
    val rows = Curation.fimTransform(docs, col("doc_id"), col("text"),
      ratePct = 100, seed = 11).collect()
    assert(rows.forall(r =>
      r.getLong(4) == ("doc text nr " + r.getLong(0)).length + 15L))
  }

  // ———— sftMaskManifest ————

  test("sft mask: window stats match a by-hand replay of the layout") {
    val docs = Seq(
      (1L, "g", 7L, 2L),   // prompt 2, response 5
      (2L, "g", 9L, 9L),   // fully-prompt doc: zero loss anywhere
      (3L, "g", 12L, 0L),  // fully-response doc
      (4L, "g", 5L, 1L)
    ).toDF("doc_id", "grp", "n_toks", "prompt_toks")
    val ctx = 10
    val packed = Curation.packSequences(docs, col("doc_id"), col("grp"),
        col("n_toks"), ctxLen = ctx, seed = 3, buckets = 2)
      .join(docs.select(col("doc_id"), col("prompt_toks")), Seq("doc_id"))
    // replay the packed layout in plain Scala: per window, intersect
    // each doc's [start, end) and its loss span [start+prompt, end)
    val lay = packed.select("doc_id", "start_off", "n_toks",
        "prompt_toks").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val expected = lay.flatMap { case (off, n, p) =>
      (off / ctx to (off + n - 1) / ctx).map { w =>
        val ws = w * ctx
        val s = math.max(off, ws); val e = math.min(off + n, ws + ctx)
        val ls = math.max(off + p, ws)
        (w, (e - s, math.max(e - ls, 0L)))
      }
    }.groupBy(_._1).map { case (w, xs) =>
      w -> (xs.size.toLong, xs.map(_._2._1).sum, xs.map(_._2._2).sum)
    }
    val got = Curation.sftMaskManifest(packed, ctxLen = ctx)
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expected)
    assert(got.values.map(_._3).sum == 5L + 0L + 12L + 4L,
      "total loss tokens must equal the sum of response lengths")
  }

  test("sft mask: fingerprint separates equal-count distinct masks") {
    // same filled/loss totals, different run structure → distinct fp
    val a = Seq((1L, "g", 4L, 0L, 0L, 0L, 0L),
        (2L, "g", 4L, 4L, 4L, 0L, 0L))
      .toDF("doc_id", "grp", "n_toks", "start_off", "prompt_toks",
        "first_seq", "last_seq")
    val b = Seq((1L, "g", 4L, 0L, 4L, 0L, 0L),
        (2L, "g", 4L, 4L, 0L, 0L, 0L))
      .toDF("doc_id", "grp", "n_toks", "start_off", "prompt_toks",
        "first_seq", "last_seq")
    def fp(df: org.apache.spark.sql.DataFrame): String =
      Curation.sftMaskManifest(df, ctxLen = 8).collect().head.getString(5)
    assert(fp(a) != fp(b),
      "mask_fp must encode WHERE loss sits, not just how much")
  }

  // ———— capByKey ————

  test("capByKey: keeps top-quality members per cluster, id ties") {
    val df = Seq(
      (1L, 10L, 0.9), (2L, 10L, 0.8), (3L, 10L, 0.7),
      (4L, 20L, 0.5), (5L, 20L, 0.5)
    ).toDF("id", "cell", "q")
    val out = Curation.capByKey(df, col("id"), col("cell"), col("q"),
        maxPer = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(10L) == ((3L, 2L, 3L)))  // keeps ids 1, 2
    assert(out(20L) == ((2L, 2L, 9L)))  // under cap: everything
  }

  // ———— mixtureWeights ————

  test("mw: two rounds match the hand-computed integer trajectory") {
    val dom = Seq(("a", 0L), ("b", 1000000L))
      .toDF("domain", "excess_micro")
    val out = Curation.mixtureWeights(dom, etaMicro = 500000L,
        rounds = 2)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // r1: (500000, 750000) → norm (400000, 600000)
    // r2: (400000, 900000) → norm (307692, 692307)
    assert(out("a") == 307692L && out("b") == 692307L)
  }

  test("mw: uniform excess keeps the mixture uniform; mass ≈ 1e6") {
    val dom = Seq(("a", 300000L), ("b", 300000L), ("c", 300000L))
      .toDF("domain", "excess_micro")
    val ws = Curation.mixtureWeights(dom, etaMicro = 200000L, rounds = 4)
      .collect().map(_.getLong(2))
    assert(ws.distinct.length == 1, "uniform excess must stay uniform")
    assert(ws.sum <= 1000000L && ws.sum >= 1000000L - 3)
  }

  // ———— tokenBudgetSample ————

  test("token budget: by-hand replay of the md5-ordered fill") {
    val docs = Seq(
      (1L, "a", 10L), (2L, "a", 10L), (3L, "a", 10L), (4L, "a", 10L),
      (5L, "b", 3L), (6L, "b", 3L)
    ).toDF("doc_id", "domain", "n_toks")
    val weights = Seq(("a", 600000L), ("b", 400000L))
      .toDF("domain", "weight_micro")
    // budgets: a = 30, b = 20 (of 50); replay the hash order in Scala
    val out = Curation.tokenBudgetSample(docs, col("doc_id"),
        col("domain"), col("n_toks"), weights, totalBudget = 50L,
        seed = 9)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    def replay(ids: Seq[Long], toks: Long, budget: Long) = {
      val order = ids.sortBy(id => (u32(id.toString, 9), id))
      var cum = 0L
      val kept = order.takeWhile { id => val pre = cum; cum += toks
        pre < budget }
      (kept.size.toLong, kept.size * toks, kept.sum)
    }
    val (ka, ta, sa) = replay(Seq(1L, 2L, 3L, 4L), 10L, 30L)
    assert(out("a") == ((30L, 4L, ka, ta, sa)))
    // b's total (6) is under its budget (20): everything kept
    assert(out("b") == ((20L, 2L, 2L, 6L, 11L)))
  }

  test("token budget: the boundary-crossing doc is kept, then cut") {
    val docs = Seq((1L, "a", 7L), (2L, "a", 7L), (3L, "a", 7L))
      .toDF("doc_id", "domain", "n_toks")
    val weights = Seq(("a", 1000000L)).toDF("domain", "weight_micro")
    val r = Curation.tokenBudgetSample(docs, col("doc_id"),
      col("domain"), col("n_toks"), weights, totalBudget = 8L,
      seed = 9).collect().head
    // budget 8: first doc (7) leaves pre=7 < 8, second crosses and is
    // kept (fill-then-cut), third starts at 14 ≥ 8 → dropped
    assert(r.getLong(1) == 8L && r.getLong(3) == 2L &&
      r.getLong(4) == 14L)
  }

  // ———— budget-capped streaming admission ————

  test("stream budget admission: consumed state gates later batches") {
    import graft.sources.VersionedTable
    import graft.streaming.EventStream
    val budgets = Seq(("a", 10L)).toDF("domain", "budget_toks")
    val dir = java.nio.file.Files.createTempDirectory("budget").toString
    val b0 = Seq((1L, "a", 6L), (2L, "a", 6L))
      .toDF("doc_id", "domain", "n_toks")
    val b1 = Seq((3L, "a", 6L)).toDF("doc_id", "domain", "n_toks")
    EventStream.budgetIngestMergeBatch(b0, budgets, dir, 0L)
    // batch 0: pre-sums 0 and 6, both < 10 (fill-then-cut) → both in
    EventStream.budgetIngestMergeBatch(b1, budgets, dir, 1L)
    // batch 1: base 12 ≥ 10 → rejected; state untouched for "a"
    val st = VersionedTable.readCurrent(spark, dir).collect()
    assert(st.length == 1)
    val r = st.head
    assert(r.getAs[Long]("consumed_toks") == 12L &&
      r.getAs[Long]("n_admitted") == 2L &&
      r.getAs[Long]("admitted_id_sum") == 3L)
    // crash-window replay of batch 1 must not commit again
    val before = VersionedTable.versions(spark, dir)
    EventStream.budgetIngestMergeBatch(b1, budgets, dir, 1L)
    assert(VersionedTable.versions(spark, dir) == before)
  }

  // ———— marginBitext ————

  test("margin bitext: mines the mutual pairs, kills the hub") {
    import graft.operators.Similarity
    // src0↔tgt1 and src2↔tgt3 are true pairs; tgt5 is a HUB equally
    // close to both srcs — absolute cosine would pair it everywhere,
    // the margin (cosine relative to neighborhood averages) must not
    val src = Seq(
      (0L, Array(1f, 0f, 0f)), (2L, Array(0f, 1f, 0f))
    ).toDF("vec_id", "embedding")
    val tgt = Seq(
      (1L, Array(0.95f, 0.05f, 0f)), (3L, Array(0.05f, 0.95f, 0f)),
      (5L, Array(0.6f, 0.6f, 0.2f))
    ).toDF("vec_id", "embedding")
    val mined = Similarity.marginBitext(src, tgt, "vec_id",
        "embedding", k = 2, minMarginMicro = 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mined == Set((0L, 1L), (2L, 3L)),
      s"expected the two true pairs, got $mined")
  }

  test("margin bitext: margin math replays by hand") {
    import graft.operators.Similarity
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def d(x: Array[Float], y: Array[Float]) =
        x.zip(y).foldLeft(0.0) { case (acc, (p, q)) =>
          acc + p.toDouble * q.toDouble }
      d(a, b) / (math.sqrt(d(a, a)) * math.sqrt(d(b, b)))
    }
    val sv = Array(1f, 0f); val tv1 = Array(0.8f, 0.6f)
    val tv2 = Array(0f, 1f)
    val src = Seq((0L, sv)).toDF("vec_id", "embedding")
    val tgt = Seq((1L, tv1), (3L, tv2)).toDF("vec_id", "embedding")
    val q1 = math.round(cos(sv, tv1) * 1e6)
    val q2 = math.round(cos(sv, tv2) * 1e6)
    // k=2: fsum = q1+q2; bsums are single-element (one src)
    val m1 = math.floor(q1 * 4.0 * 1e6 /
      math.max(q1 + q2 + q1, 1L)).toLong
    val out = Similarity.marginBitext(src, tgt, "vec_id", "embedding",
        k = 2, minMarginMicro = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq == Seq((0L, 1L, q1, m1)))
  }

  // ———— marginBitextOn (the ANN-sourced production path) ————

  test("margin bitext ANN: full candidate lists degrade to the " +
      "exact baseline") {
    import graft.operators.Similarity
    // at full candidate budget (every cross pair retrieved both
    // ways) the candidate-restricted miner must equal marginBitext
    // row for row — the seam's degenerate-case receipt
    val src = Seq(
      (0L, Array(1f, 0f, 0f)), (2L, Array(0f, 1f, 0f)),
      (4L, Array(0.7f, 0.7f, 0.1f))
    ).toDF("vec_id", "embedding")
    val tgt = Seq(
      (1L, Array(0.95f, 0.05f, 0f)), (3L, Array(0.05f, 0.95f, 0f)),
      (5L, Array(0.6f, 0.6f, 0.2f))
    ).toDF("vec_id", "embedding")
    val all = src.select(col("vec_id").as("src_id"))
      .crossJoin(tgt.select(col("vec_id").as("tgt_id")))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSet
    val exact = rows(Similarity.marginBitext(src, tgt, "vec_id",
      "embedding", k = 2, minMarginMicro = 0L))
    val ann = rows(Similarity.marginBitextOn(src, tgt, all, all,
      "vec_id", "embedding", k = 2, minMarginMicro = 0L))
    assert(ann == exact, s"full-budget ANN path diverged: $ann vs $exact")
  }

  test("margin bitext ANN: mines the true pairs from top-k " +
      "candidate lists, kills the hub") {
    import graft.operators.Similarity
    // candidates restricted to per-query top-2 (as a real ANN serve
    // would return): the hub tgt5 appears in BOTH srcs' lists but
    // the margin must still pick the true pairs
    val src = Seq(
      (0L, Array(1f, 0f, 0f)), (2L, Array(0f, 1f, 0f))
    ).toDF("vec_id", "embedding")
    val tgt = Seq(
      (1L, Array(0.95f, 0.05f, 0f)), (3L, Array(0.05f, 0.95f, 0f)),
      (5L, Array(0.6f, 0.6f, 0.2f))
    ).toDF("vec_id", "embedding")
    val fwd = Seq((0L, 1L), (0L, 5L), (2L, 3L), (2L, 5L))
      .toDF("src_id", "tgt_id")
    val bwd = Seq((0L, 1L), (2L, 3L), (0L, 5L), (2L, 5L))
      .toDF("src_id", "tgt_id")
    val mined = Similarity.marginBitextOn(src, tgt, fwd, bwd,
        "vec_id", "embedding", k = 2, minMarginMicro = 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mined == Set((0L, 1L), (2L, 3L)),
      s"expected the two true pairs, got $mined")
  }

  test("margin bitext ANN: a target with no backward candidates " +
      "cannot certify a pair") {
    import graft.operators.Similarity
    val src = Seq((0L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val tgt = Seq((1L, Array(0.9f, 0.1f))).toDF("vec_id", "embedding")
    val fwd = Seq((0L, 1L)).toDF("src_id", "tgt_id")
    val bwd = fwd.limit(0)
    val out = Similarity.marginBitextOn(src, tgt, fwd, bwd,
      "vec_id", "embedding", k = 2, minMarginMicro = 0L)
    assert(out.count() == 0L,
      "pair without a backward neighborhood must drop at the join")
  }

  // ———— ngramServe ————

  test("ngram serve: exact match, unigram backoff, empty-ctx backoff") {
    val docs = Seq((1L, "a b c"), (2L, "a b d"), (3L, "b c"))
      .toDF("doc_id", "text")
    val queries = Seq(
      (10L, Seq("a", "b")),  // L=2 hit: next ∈ {c, d}
      (11L, Seq("x", "b")),  // L=2 miss → L=1 "b": c:2 d:1
      (12L, Seq("a", "x"))   // L=2, L=1 miss → L=0: b:3 a:2 c:2 d:1
    ).toDF("qid", "q")
    val out = TextAnalysis.ngramServe(docs, col("doc_id"), col("text"),
        maxN = 3, queries = queries)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(out(10L) == ((2L, 2L, "c", 1L, 500000L)),
      "tie on count must pick the lexicographically smaller token")
    assert(out(11L) == ((1L, 3L, "c", 2L, 666666L)))
    assert(out(12L) == ((0L, 8L, "b", 3L, 375000L)))
  }
}
