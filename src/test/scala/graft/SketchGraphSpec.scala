package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Events, Similarity, Sketches, TextAnalysis}

/** Round-3 operators: deterministic HLL distinct sketch, binned
  * interval (range) join, bigram LM scoring, triangle enumeration,
  * and Lloyd-trained PQ codebooks. */
class SketchGraphSpec extends SparkSpec {

  test("KMV set ops estimate union and intersection within sketch error") {
    import spark.implicits._
    import graft.operators.Sketches
    // A = 1..1000, B = 500..1500 (|A∪B|=1500, |A∩B|=501), C disjoint
    val rows = (1L to 1000L).map(("A", _)) ++
      (500L to 1500L).map(("B", _)) ++
      (2000L to 2500L).map(("C", _))
    val out = Sketches.kmvSetOps(rows.toDF("t", "u"), col("t"),
        col("u"), k = 64, seed = 97)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val (abU, _, abI) = out(("A", "B"))
    // KMV error ~ 1/sqrt(k) ≈ 12.5%; allow 3σ-ish
    assert(math.abs(abU - 1500) < 1500 * 0.4, s"union est $abU")
    assert(math.abs(abI - 501) < 501 * 0.5, s"inter est $abI")
    // disjoint pairs: the shared-hash COUNT itself must be zero (not
    // just the derived estimate, which can round to zero on its own)
    assert(out(("A", "C"))._2 == 0L && out(("A", "C"))._3 == 0L)
    assert(out(("B", "C"))._2 == 0L)
    // unsaturated regime (|union| < k): the sketch holds every hash,
    // so union AND intersection must be EXACT — this is the regime a
    // divide-by-k estimator gets wrong
    val small = ((1L to 10L).map(("X", _)) ++ (1L to 10L).map(("Y", _))
      ++ (6L to 15L).map(("Z", _))).toDF("t", "u")
    val so = Sketches.kmvSetOps(small, col("t"), col("u"), k = 64,
        seed = 97)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(3), r.getLong(5)))).toMap
    assert(so(("X", "Y")) == ((10L, 10L)))  // identical sets
    assert(so(("X", "Z")) == ((15L, 5L)))   // half overlap
    // null keys are not set members and never corrupt a sketch
    val withNull = small.union(Seq(("X", Option.empty[Long]),
      ("Z", Option.empty[Long])).toDF("t", "u"))
    val sn = Sketches.kmvSetOps(withNull, col("t"), col("u"), k = 64,
        seed = 97)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(3), r.getLong(5)))).toMap
    assert(sn == so)
  }

  import spark.implicits._

  test("hllDistinct: raw estimate within HLL error bounds, small range exact-ish") {
    // 10k distinct longs (raw branch) + 40 distinct strings (linear
    // counting branch) sketched in one pass
    val df = spark.range(10000)
      .select(col("id"), (col("id") % 40).cast("string").as("s"))
    val out = Sketches.hllDistinct(df,
        Seq("big" -> col("id"), "small" -> col("s")), p = 8, seed = 5)
      .collect().map(r => r.getAs[String]("cname") ->
        (r.getAs[Long]("exact_nd"), r.getAs[Double]("est_hll"))).toMap
    val (exactBig, estBig) = out("big")
    assert(exactBig == 10000L)
    // standard error at m=256 is 1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert(math.abs(estBig - 10000.0) / 10000.0 < 0.2, s"est=$estBig")
    val (exactSmall, estSmall) = out("small")
    assert(exactSmall == 40L)
    // linear counting at 40/256 load is near-exact
    assert(math.abs(estSmall - 40.0) < 5.0, s"est=$estSmall")
    // determinism: identical second run
    val again = Sketches.hllDistinct(df,
        Seq("big" -> col("id"), "small" -> col("s")), p = 8, seed = 5)
      .collect().map(_.toSeq).toSet
    assert(again == Sketches.hllDistinct(df,
      Seq("big" -> col("id"), "small" -> col("s")), p = 8, seed = 5)
      .collect().map(_.toSeq).toSet)
  }

  test("hllDistinct registers merge: sketch of union = max of sketches") {
    // the property that makes HLL a sketch: half-corpus registers
    // combine by max into exactly the full-corpus registers — verified
    // through the public API by sketching overlapping halves
    val a = spark.range(6000).toDF("id")
    val b = spark.range(4000, 10000).toDF("id")
    val full = spark.range(10000).toDF("id")
    def est(df: org.apache.spark.sql.DataFrame): Double =
      Sketches.hllDistinct(df, Seq("c" -> col("id")))
        .head().getAs[Double]("est_hll")
    // union-of-inputs estimate equals full-corpus estimate (same
    // register maxima, duplicates collapse)
    assert(est(a.union(b)) == est(full))
  }

  test("grouped HLL matches the global sketch run per group") {
    val df = spark.range(5000).select(
      (col("id") % 3).cast("string").as("g"), (col("id") % 700).as("k"))
    val grouped = Sketches.hllDistinctByGroup(df, col("g"), col("k"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("exact_nd"), r.getAs[Double]("est_hll"))).toMap
    assert(grouped.keySet == Set("0", "1", "2"))
    for ((g, (exact, est)) <- grouped) {
      // per-group exact ~233; linear-counting regime → small error
      assert(exact > 200 && math.abs(est - exact) / exact < 0.15,
        s"g=$g exact=$exact est=$est")
      // grouped registers ≡ a standalone sketch of that group's keys
      val solo = Sketches.estimateFromRegisters(
        Sketches.hllRegisters(df.filter(col("g") === g), col("k"))
          .groupBy(col("bucket")).agg(max(col("rho")).as("maxrho")))
        .head().getAs[Double]("est_hll")
      assert(solo == est, s"g=$g grouped=$est solo=$solo")
    }
  }

  test("histogramQuantiles: estimates within one bin of exact quantiles") {
    val df = spark.range(10000).select(col("id").cast("double").as("v"))
    val out = Sketches.histogramQuantiles(df, col("v"), nBins = 1000,
        quantiles = Seq(0.25, 0.5, 0.9))
      .collect().map(r => r.getAs[Double]("q") ->
        r.getAs[Double]("est_value")).toMap
    // data is uniform 0..9999; bin width ~10, estimate = bin upper edge
    // → within one bin width above the exact quantile
    for ((q, exact) <- Seq(0.25 -> 2499.0, 0.5 -> 4999.0, 0.9 -> 8999.0)) {
      val est = out(q)
      assert(est >= exact && est <= exact + 11.0, s"q=$q est=$est")
    }
    // all-equal column degenerates to the single value, not NaN
    val const = spark.range(100).select(lit(7.5).as("v"))
    val cq = Sketches.histogramQuantiles(const, col("v"), 1000, Seq(0.5))
      .head().getAs[Double]("est_value")
    assert(cq == 7.5)
  }

  test("countMinTopK: one-sided error, exact when registers are wide") {
    val docs = Seq(
      (1L, "apple apple apple banana banana cherry"),
      (2L, "apple banana date egg fig grape"),
      (3L, "apple apple kiwi lemon mango nectarine")
    ).toDF("doc_id", "text")
    // wide sketch (no collisions possible at this vocab): est == exact
    val wide = Sketches.countMinTopK(docs, col("doc_id"), col("text"),
      d = 4, w = 4096, topK = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(wide.nonEmpty && wide.forall { case (_, ex, est) => est == ex })
    assert(wide.exists { case (t, ex, _) => t == "apple" && ex == 6L })
    // cramped sketch: still never underestimates
    val tight = Sketches.countMinTopK(docs, col("doc_id"), col("text"),
      d = 2, w = 4, topK = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(tight.forall { case (_, ex, est) => est >= ex })
  }

  test("binnedIntervalJoin equals the naive BETWEEN join") {
    val intervals = Seq(
      (1L, 100L, 250L), (2L, 240L, 260L), (3L, 0L, 50L),
      (4L, 500L, 500L), (5L, 90L, 710L)
    ).toDF("ivl_id", "start_us", "end_us")
    val points = Seq.tabulate(200)(i => (i.toLong, i * 5L))
      .toDF("pt_id", "pt_us")
    val binned = Events.binnedIntervalJoin(points, "pt_us", intervals,
        "start_us", "end_us", binUs = 128L)
      .select("ivl_id", "pt_id").as[(Long, Long)].collect().sorted
    val naive = intervals.join(points,
        col("pt_us") >= col("start_us") && col("pt_us") <= col("end_us"))
      .select("ivl_id", "pt_id").as[(Long, Long)].collect().sorted
    assert(binned.nonEmpty && binned.sameElements(naive))
    // each qualifying pair appears exactly once (no bin-overlap dupes)
    assert(binned.distinct.length == binned.length)
  }

  test("bigramLogProb: predictable transitions score above scrambled ones") {
    val docs = Seq(
      (1L, "a b a b a b a b a b"), // one dominant transition
      (2L, "a a b b b a a b a b"), // same unigrams, mixed transitions
      (3L, "x")                    // < 2 tokens: omitted
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("mean_logprob"))).toMap
    assert(!out.contains(3L))
    assert(out(1L)._1 == 9L && out(2L)._1 == 9L)
    assert(out(1L)._2 > out(2L)._2,
      s"repetitive transitions must score higher: $out")
  }

  test("triangles: degree-oriented enumeration matches the naive 3-join") {
    // K4 on {1..4} (4 triangles) + a pendant edge + a square 10-13
    // (0 triangles) + a star at 20 (0 triangles)
    val edges = (Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (10L, 11L), (11L, 12L), (12L, 13L), (10L, 13L)) ++
      Seq.tabulate(6)(i => (20L, 30L + i))).toDF("doc_a", "doc_b")
    val got = Dedup.triangles(edges)
      .as[(Long, Long, Long)].collect().toSet
    val expected = Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L),
      (2L, 3L, 4L))
    assert(got == expected, s"got $got")
    // orientation invariance: flipped/duplicated input edges change nothing
    val messy = edges.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b"))
      .union(edges)
    assert(Dedup.triangles(messy).as[(Long, Long, Long)]
      .collect().toSet == expected)
  }

  test("HofFusionRule fuses the squared-L2 fold, exactly preserving semantics") {
    import graft.plans.HofFusionRule
    val saved = spark.experimental.extraOptimizations
    try {
      GraftFunctions.installOptimizations(spark)
      assert(spark.experimental.extraOptimizations.contains(HofFusionRule))
      def sqHof(df: org.apache.spark.sql.DataFrame) = df.select(
        aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
          lit(0.0d), (acc, v) => acc + v).as("d"))
      // repartition keeps ConvertToLocalRelation from evaluating the
      // projection eagerly — the rewrite must be visible in the plan
      val df = Seq(
        (Seq(1.0, 2.0, 3.0), Seq(1.0, 0.0, 5.0)),  // 0+4+4 = 8
        (Seq(0.5, 0.5), Seq(0.5, 0.5))             // 0
      ).toDF("a", "b").repartition(2)
      val fused = sqHof(df)
      // the optimizer replaced the interpreted HOF with the codegen'd
      // Expression...
      assert(fused.queryExecution.optimizedPlan.toString
        .contains("graft_squared_l2"))
      assert(fused.as[Double].collect().toSeq == Seq(8.0, 0.0))
      // ...and edge semantics are bit-preserved vs the unfused HOF:
      // ragged pair → null (zip_with pads), null element → null,
      // null array → null
      val edge = Seq(
        (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0)),
        (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)),
        (null, Seq[java.lang.Double](1.0))
      ).toDF("a", "b")
      val withRule = sqHof(edge).collect().map(r =>
        if (r.isNullAt(0)) null else r.getDouble(0))
      // rule OFF: filter it out explicitly — the shared test session
      // installs it globally, so restoring `saved` is NOT enough
      spark.experimental.extraOptimizations =
        saved.filterNot(_ == HofFusionRule)
      val unfused = sqHof(edge)
      assert(!unfused.queryExecution.optimizedPlan.toString
        .contains("graft_squared_l2"))
      val withoutRule = unfused.collect().map(r =>
        if (r.isNullAt(0)) null else r.getDouble(0))
      assert(withRule.toSeq == Seq(null, null, null))
      assert(withRule.toSeq == withoutRule.toSeq)
    } finally spark.experimental.extraOptimizations = saved
  }

  test("pqTrainCodebooks: Lloyd rounds do not increase total distortion") {
    val emb = Tables.embeddings(spark, Sf0001)
    def distortion(cb: org.apache.spark.sql.DataFrame): Double = {
      val codes = Similarity.pqEncode(emb, cb, "vec_id", "embedding",
        m = 8, dim = 64)
      // re-score each (vid, s) against its assigned centroid
      val subs = emb.select(col("vec_id").as("vid"),
        posexplode(transform(sequence(lit(0), lit(7)),
          s => slice(col("embedding"), s * 8 + 1, lit(8))
            .cast("array<double>"))).as(Seq("s", "sub")))
      subs.join(codes, Seq("vid", "s")).join(cb, Seq("s", "cid"))
        .select(aggregate(zip_with(col("sub"), col("centroid"),
          (x, y) => (x - y) * (x - y)), lit(0.0d), (a, v) => a + v).as("d"))
        .agg(sum(col("d"))).head().getDouble(0)
    }
    val seed = Similarity.pqCodebooks(emb, "vec_id", "embedding",
      m = 8, k = 8, dim = 64, seed = 777)
    val trained = Similarity.pqTrainCodebooks(emb, "vec_id", "embedding",
      m = 8, k = 8, dim = 64, iters = 2, seed = 777)
    val d0 = distortion(seed)
    val d2 = distortion(trained)
    assert(d2 <= d0, s"training must not increase distortion: $d0 -> $d2")
    // and the trained codebook is deterministic
    val again = Similarity.pqTrainCodebooks(emb, "vec_id", "embedding",
      m = 8, k = 8, dim = 64, iters = 2, seed = 777)
      .select(col("s"), col("cid"), col("centroid").cast("string"))
      .collect().map(_.toSeq).toSet
    assert(again == trained
      .select(col("s"), col("cid"), col("centroid").cast("string"))
      .collect().map(_.toSeq).toSet)
  }

  test("labelPropagation separates bridged triangles that closure merges") {
    // two dense triangles {1,2,3} and {4,5,6} joined by one bridge
    // edge 3–4: transitive closure (d8) sees ONE component of 6; LPA
    // keeps the dense cores apart (traced by hand for 3 sync rounds
    // with the (count desc, label asc) tie-break)
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
      .toDF("doc_a", "doc_b")
    val lpa = Dedup.labelPropagation(pairs, iters = 3)
      .select("doc_id", "community", "csize")
      .as[(Long, Long, Long)].collect().toSet
    assert(lpa == Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (4L, 3L, 3L), (5L, 3L, 3L), (6L, 3L, 3L)))
    val comp = Dedup.dedupComponents(pairs)
      .select("component").distinct().as[Long].collect()
    assert(comp.length == 1) // closure: one blob — LPA is the finer cut
    // deterministic across runs
    val again = Dedup.labelPropagation(pairs, iters = 3)
      .select("doc_id", "community", "csize")
      .as[(Long, Long, Long)].collect().toSet
    assert(again == lpa)
  }
}
