package graft

import org.apache.spark.sql.functions._

import graft.operators.{Events, Similarity, TextAnalysis}

/** MMR diversification (s20), char-entropy gate (t29), robust
  * median/MAD outliers (q97). */
class DiversityOutlierSpec extends SparkSpec {
  import spark.implicits._

  test("mmrDiversify demotes a duplicate that plain top-k would keep") {
    // q=(1,0,0); c1 and c2 are IDENTICAL vectors (sim=1) at rel .9,
    // c3 points away in the second coordinate: rel .8, sim(c3,c1)=.458.
    // Pure relevance ranks (c1, c2, c3); MMR must demote the duplicate:
    //   pick1 = c1 (mmr .45, id tie-break over c2)
    //   pick2 = c3 (.5*.8 − .5*.458 = .171) over c2 (.5*.9 − .5*1 = −.05)
    //   pick3 = c2 (−.05)
    val vecs = Seq(
      (100L, Array(1f, 0f, 0f)),            // the query
      (1L, Array(0.9f, 0.43588989f, 0f)),   // unit-norm, rel .9
      (2L, Array(0.9f, 0.43588989f, 0f)),   // exact duplicate of c1
      (3L, Array(0.8f, -0.6f, 0f))          // unit-norm, rel .8
    ).toDF("vec_id", "embedding")
    val out = Similarity.mmrDiversify(vecs.filter(col("vec_id") < 100),
        vecs.filter(col("vec_id") === 100), "vec_id", "embedding",
        m = 3, k = 3, lambda = 0.5)
      .select("pick", "neighbor_id", "mmr_score")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq(1L, 3L, 2L))
    // float32 storage rounds the ideal-math values at ~1e-7
    assert(math.abs(out(0)._3 - 0.45) < 1e-3)
    assert(math.abs(out(1)._3 - 0.5 * (0.8 - 0.4584661)) < 1e-3)
    assert(math.abs(out(2)._3 - (-0.05)) < 1e-3)
  }

  test("mmrDiversify with lambda=1 is exactly relevance top-k") {
    val emb = Tables.embeddings(spark, Sf0001)
    val queries = emb.filter(col("vec_id") % 20 === 0)
    val mmr = Similarity.mmrDiversify(emb, queries, "vec_id",
        "embedding", m = 6, k = 3, lambda = 1.0)
      .select(col("query_id"), col("pick").as("rank"),
        col("neighbor_id"))
    val topk = Similarity.bruteForceTopK(emb, queries, "vec_id",
        "embedding", 3)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
    assert(mmr.exceptAll(topk).isEmpty && topk.exceptAll(mmr).isEmpty)
  }

  test("mmrDiversify picks are distinct shortlist members, k per query") {
    val emb = Tables.embeddings(spark, Sf0001)
    val out = Similarity.mmrDiversify(emb,
      emb.filter(col("vec_id") % 20 === 0), "vec_id", "embedding",
      m = 8, k = 3, lambda = 0.5)
    val perQ = out.groupBy("query_id")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("neighbor_id")).as("nd"))
      .as[(Long, Long, Long)].collect()
    assert(perQ.nonEmpty && perQ.forall(r => r._2 == 3 && r._3 == 3))
  }

  test("charEntropy: closed-form values and gate") {
    val docs = Seq(
      (1L, "aaaa"),       // H = 0
      (2L, "abcd"),       // uniform over 4 → 2 bits
      (3L, "aabb"),       // uniform over 2 → 1 bit
      (4L, "abcdefgh" * 4) // uniform over 8 → 3 bits, passes [3, 5.5]
    ).toDF("doc_id", "text")
    val out = TextAnalysis.charEntropy(docs, col("doc_id"), col("text"))
      .select("doc_id", "n_chars_text", "n_distinct", "entropy_bits",
        "pass_gate")
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .sortBy(_._1)
    assert(out(0) == ((1L, 4L, 1L, 0.0, false)))
    assert(out(1) == ((2L, 4L, 4L, 2.0, false)))
    assert(out(2) == ((3L, 4L, 2L, 1.0, false)))
    assert(out(3) == ((4L, 32L, 8L, 3.0, true)))
  }

  test("charEntropy is bounded by log2(alphabet) on the real corpus") {
    val out = TextAnalysis.charEntropy(Tables.documents(spark, Sf0001),
        col("doc_id"), col("text"))
      .select(col("entropy_bits"),
        log2(col("n_distinct").cast("double")).as("cap"))
      .as[(Double, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (h, cap) =>
      assert(h >= 0.0 && h <= cap + 1e-9, s"H=$h cap=$cap")
    }
  }

  test("robustOutliers flags the planted spike and nothing else") {
    // group a: a tight 1..101 ramp plus one 10000 spike; group b: tight
    val rows =
      (1 to 101).map(i => ("a", i.toLong, i.toDouble)) ++
      Seq(("a", 999L, 10000.0)) ++
      (1 to 100).map(i => ("b", 1000L + i, 50.0 + (i % 7)))
    val df = rows.toDF("event_type", "event_id", "value")
    val out = Events.robustOutliers(df, "event_type", "event_id",
        "value", cutoff = 3.5)
      .select("event_id").as[Long].collect().toSet
    assert(out == Set(999L))
  }

  test("robustOutliers median/MAD survive the outlier it flags") {
    // mean/stddev z-score of the same data would NOT flag the spike at
    // 3.5 sigma if the spike is big enough to inflate sigma; the
    // median/MAD score is unmoved. One 1e7 spike among 30 points:
    val rows = (1 to 30).map(i => ("g", i.toLong, 100.0 + i)) ++
      Seq(("g", 99L, 1e7))
    val df = rows.toDF("event_type", "event_id", "value")
    val robust = Events.robustOutliers(df, "event_type", "event_id",
      "value", cutoff = 3.5).select("event_id").as[Long].collect()
    assert(robust.toSet == Set(99L))
    // classical z-score comparison: spike z ≈ sqrt(n) ≈ 5.5 BUT every
    // other point sits within 0.2σ — the spike owns the entire spread,
    // so a cutoff tuned for normal data (3.5) barely clears while the
    // robust score is ~1e5; assert the robust margin dominates
    val med = 115.5
    val mad = 8.0 // median(|x−115.5|) over 1..30 ramp + far spike
    val rz = 0.6745 * (1e7 - med) / mad
    assert(rz > 1e5)
  }

  test("robustOutliers MAD=0: off-median rows flagged with NULL score") {
    // majority-constant group: median=5, MAD=0 — a naive rz = Δ/0
    // would be NULL in Spark (dropped!) and inf in DuckDB; the
    // explicit branch flags the spike with a NULL score instead
    val rows = (1 to 9).map(i => ("flat", i.toLong, 5.0)) ++
      Seq(("flat", 99L, 1000.0))
    val out = Events.robustOutliers(rows.toDF("event_type", "event_id",
        "value"), "event_type", "event_id", "value", cutoff = 3.5)
      .select("event_id", "robust_z")
      .as[(Long, Option[Double])].collect()
    assert(out.toSeq == Seq((99L, None)))
  }

  test("funnel: ordering, windowing, and first-match anchoring") {
    def ts(min: Long) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusMinutes(min))
    val rows = Seq(
      // A completes in order: view@0, click@10, purchase@20
      (1L, ts(0), "view"), (1L, ts(10), "click"), (1L, ts(20), "purchase"),
      // B: click lands OUTSIDE the 60-min window of the anchor
      (2L, ts(0), "view"), (2L, ts(90), "click"),
      // C: purchase BEFORE click — order violated, stops at click
      (3L, ts(0), "view"), (3L, ts(5), "purchase"), (3L, ts(10), "click"),
      // D: view only
      (4L, ts(0), "view"),
      // E: click with no view — never enters the funnel
      (5L, ts(0), "click"),
      // A extra: a second, later view must NOT re-anchor (first wins)
      (1L, ts(30), "view"))
    val ev = rows.toDF("user_id", "ts", "event_type")
    val out = Events.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), windowUs = 3600000000L)
      .select("step", "step_name", "n_users", "wait_us_sum")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, "view", 4L, 0L)))      // A B C D
    assert(out(1) == ((2L, "click", 2L,           // A@10min, C@10min
      2L * 10L * 60000000L)))
    assert(out(2) == ((3L, "purchase", 1L,        // A@20min only
      20L * 60000000L)))
  }

  test("streaming funnel across event-time-ordered batches == batch funnel") {
    import java.nio.file.{Files, Paths}
    import graft.streaming.EventStream
    def ts(min: Long) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 3, 1, 0, 0).plusMinutes(min))
    // batch 0: early events; batch 1: later events — user 1 converts
    // ACROSS the batch boundary (view+click in b0, purchase in b1),
    // user 2's purchase falls outside the window, user 3 joins late
    val b0 = Seq((1L, ts(0), "view"), (1L, ts(5), "click"),
      (2L, ts(0), "view"))
    val b1 = Seq((1L, ts(40), "purchase"), (2L, ts(200), "click"),
      (3L, ts(100), "view"), (3L, ts(110), "click"),
      (3L, ts(120), "purchase"))
    val streamDir = Files.createTempDirectory("graft_funnel").toString
    Seq(b0, b1).zipWithIndex.foreach { case (rows, i) =>
      val stage = Files.createTempDirectory(s"graft_funnel_s$i").toString
      rows.toDF("user_id", "ts", "event_type").coalesce(1)
        .write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, Paths.get(streamDir, s"batch$i.parquet"))
    }
    val steps = Seq("view", "click", "purchase")
    val winUs = 3600000000L // 60 min
    val reach = EventStream.funnelStream(
      EventStream.eventsFileStream(spark, streamDir), steps, winUs)
    val per = EventStream.runOnce(reach,
        s"funnel_mb_${System.nanoTime()}", outputMode = "append",
        rocksdb = true)
      .groupBy(col("user_id"))
      .agg(max(col("reached")).as("reached"))
      .as[(Long, Long)].collect().toMap
    assert(per == Map(1L -> 3L, 2L -> 1L, 3L -> 3L))
    // and the batch twin agrees on the census
    val batch = Events.funnel((b0 ++ b1).toDF("user_id", "ts",
        "event_type"), "user_id", "ts", "event_type", steps, winUs)
      .select("step", "n_users").as[(Long, Long)].collect().toMap
    assert(batch == Map(1L -> 3L, 2L -> 2L, 3L -> 2L))
  }
}
