package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Events, TextAnalysis}
import graft.streaming.EventStream

/** Sessionization + the Structured Streaming slice (M6): the streaming
  * windowed count must equal its batch twin on the same input. */
class EventsStreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionize splits on gaps > threshold, aggregates per session") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L, "click", 1.0, "{}"),
      (2L, ts("2024-01-01 10:10:00"), 100L, "view", 2.0, "{}"),
      (3L, ts("2024-01-01 11:30:00"), 100L, "click", 3.0, "{}"), // gap > 30m
      (4L, ts("2024-01-01 10:00:00"), 200L, "view", 4.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.sessionize(ev, 1800L)
      .select("user_id", "session_id", "n_events", "duration_sec")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(out == Set((100L, 1L, 2L, 600.0), (100L, 2L, 1L, 0.0),
      (200L, 1L, 1L, 0.0)))
  }

  test("equal timestamps order deterministically by event_id tiebreak") {
    val ev = Seq(
      (2L, ts("2024-01-01 10:00:00"), 1L, "a", 1.0, "{}"),
      (1L, ts("2024-01-01 10:00:00"), 1L, "b", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val n = Events.sessionize(ev, 1800L).count()
    assert(n == 1) // same instant → one session regardless of input order
  }

  test("streaming windowed counts equal the batch groupBy on events") {
    val batch = Events.bucketCounts(Tables.events(spark, Sf0001), "hour")
      .withColumnRenamed("bucket", "win_start")
      .as[(String, String, Long, Double)].collect().toSet
    val streamed = EventStream.runOnce(
      EventStream.windowedCounts(
        EventStream.eventsFileStream(spark, s"$Sf0001/events.parquet"),
        "1 hour", "1 hour"),
      s"spec_stream_${System.nanoTime()}")
      .as[(String, String, Long, Double)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("asofJoin attaches latest right row at-or-before, null when none") {
    val l = Seq(
      (10L, ts("2024-01-01 10:00:30"), 1L, "purchase", 1.0, "{}"),
      (11L, ts("2024-01-01 09:00:00"), 1L, "purchase", 1.0, "{}"), // before any view
      (12L, ts("2024-01-01 10:05:00"), 2L, "purchase", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Seq(
      (20L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0, "{}"),
      (21L, ts("2024-01-01 10:00:30"), 1L, "view", 1.0, "{}"), // tie with l=10
      (22L, ts("2024-01-01 10:04:00"), 2L, "view", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.asofJoin(l, r, "user_id", "ts", "event_id", "event_id")
      .select("event_id", "asof_event_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(out(10L).contains(21L)) // inclusive: equal-ts view counts
    assert(out(11L).isEmpty)       // no view at or before
    assert(out(12L).contains(22L))
  }

  test("topKPerGroup keeps exactly k rows per group with dense ranks") {
    val df = Seq(("a", 5), ("a", 3), ("a", 9), ("a", 1), ("b", 2))
      .toDF("g", "v")
    val out = Events.topKPerGroup(df, Seq(col("g")),
      Seq(col("v").desc), 2)
      .select("g", "rank", "v").as[(String, Long, Int)].collect().toSet
    assert(out == Set(("a", 1L, 9), ("a", 2L, 5), ("b", 1L, 2)))
  }

  test("stream-to-table ingest: one version per batch, replay is a no-op") {
    val scratch = java.nio.file.Files
      .createTempDirectory("ingest").toString
    val streamDir = new java.io.File(scratch, "in")
    streamDir.mkdirs()
    for (i <- 0 until 3) {
      val tmp = s"$scratch/shard$i"
      Seq((i.toLong, s"doc$i")).toDF("id", "s")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(streamDir, f"b$i%02d.parquet")
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      dst.setLastModified(1000000L * (i + 1))
    }
    val dir = s"$scratch/table"
    def ingest() = EventStream.tableIngestOnce(
      EventStream.parquetFileStream(spark, streamDir.getAbsolutePath),
      dir)
    ingest()
    val vt = graft.sources.VersionedTable
    assert(vt.versions(spark, dir) == Seq(0, 1, 2))
    def rows(v: Int) = vt.readVersion(spark, dir, v)
      .as[(Long, String)].collect().toSet
    assert(rows(0) == Set((0L, "doc0")))
    assert(rows(1) == Set((0L, "doc0"), (1L, "doc1")))
    assert(rows(2) ==
      Set((0L, "doc0"), (1L, "doc1"), (2L, "doc2")))
    // a full checkpoint-less re-run replays batches 0..2: every
    // version number already exists, so nothing commits twice
    ingest()
    assert(vt.versions(spark, dir) == Seq(0, 1, 2))
    assert(rows(2).size == 3)
  }

  test("gated ingest splits batches into table+quarantine; empty sides commit") {
    val scratch = java.nio.file.Files
      .createTempDirectory("gated").toString
    val streamDir = new java.io.File(scratch, "in")
    streamDir.mkdirs()
    // batch 0 mixes clean/dirty; batch 1 is FULLY clean (its
    // quarantine commit must still happen, empty, to keep lockstep)
    val batches = Seq(
      Seq((1L, 5L), (2L, -1L), (3L, 0L)), // -1, 0 violate n>0
      Seq((10L, 7L), (11L, 8L)))
    for ((rows, i) <- batches.zipWithIndex) {
      val tmp = s"$scratch/shard$i"
      rows.toDF("id", "n").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(streamDir, f"b$i%02d.parquet")
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      dst.setLastModified(1000000L * (i + 1))
    }
    val base = s"$scratch/gated"
    def run() = EventStream.gatedIngestOnce(
      EventStream.parquetFileStream(spark, streamDir.getAbsolutePath),
      Seq("n_positive" -> (col("n") > 0)), base)
    run()
    val vt = graft.sources.VersionedTable
    assert(vt.versions(spark, s"$base/table") == Seq(0, 1))
    assert(vt.versions(spark, s"$base/quarantine") == Seq(0, 1))
    assert(vt.readCurrent(spark, s"$base/table")
      .select("id").as[Long].collect().toSet == Set(1L, 10L, 11L))
    assert(vt.readCurrent(spark, s"$base/quarantine")
      .select("id", "reasons").as[(Long, Long)].collect().toSet ==
      Set((2L, 1L), (3L, 1L)))
    // quarantine v1 added nothing but the version exists (lockstep)
    assert(vt.readVersion(spark, s"$base/quarantine", 1).count() == 2L)
    // checkpoint-less replay: both tables already own every batch id
    run()
    assert(vt.versions(spark, s"$base/table") == Seq(0, 1))
    assert(vt.readCurrent(spark, s"$base/quarantine").count() == 2L)
  }

  test("streaming minhash dedup emits each signature class once across batches") {
    import java.nio.file.{Files, Paths}
    val streamDir = Files.createTempDirectory("graft_snd").toString
    // batch 0: docs A, B; batch 1: a re-crawled exact copy of A plus a
    // fresh doc C; batch 2: copies of B and C — only 3 classes total,
    // and cross-batch repeats must be suppressed by the keyed state
    val batches = Seq(
      Seq((1L, "alpha beta gamma delta epsilon"),
        (2L, "one two three four five six")),
      Seq((3L, "alpha beta gamma delta epsilon"),
        (4L, "seven eight nine ten eleven")),
      Seq((5L, "one two three four five six"),
        (6L, "seven eight nine ten eleven")))
    batches.zipWithIndex.foreach { case (rows, i) =>
      val stage = Files.createTempDirectory(s"graft_snd_stage$i").toString
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, Paths.get(streamDir, s"batch$i.parquet"))
    }
    val deduped = EventStream.parquetFileStream(spark, streamDir)
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .filter(size(col("toks")) >= 3)
      .withColumn("sh", TextAnalysis.shinglesOf(col("toks"), 3))
      .select(graft.operators.Dedup.minhashSigKey(col("sh"), 8)
        .as("sig_key"))
      .dropDuplicates("sig_key")
    val sink = EventStream.runOnce(deduped,
      s"snd_multibatch_${System.nanoTime()}", outputMode = "append")
    val keys = sink.select("sig_key").as[String].collect()
    assert(keys.length == 3 && keys.distinct.length == 3)
    // the per-row HOF signature must equal the batch explode+groupBy
    // signature key for the same docs
    val batchSigs = Dedup.minhash(
        batches.flatten.toDF("doc_id", "text"),
        col("doc_id"), col("text"), 8)
      .select(md5(concat_ws("|", col("sig")).cast("binary")).as("k"))
      .distinct().as[String].collect().toSet
    assert(keys.toSet == batchSigs)
  }

  test("streaming semantic dedup keeps the epsilon-net across batches") {
    import java.nio.file.{Files, Paths}
    import graft.operators.Similarity
    val streamDir = Files.createTempDirectory("graft_ssd").toString
    // two orthogonal cells (x-axis vs y-axis); batch 1's vec 10 is a
    // near-dup of batch 0's vec 20 → dropped by STATE from the earlier
    // batch; vec 5 arrives LAST despite its low id (out-of-order) and
    // is dropped against the kept vec 20 — decisions are final at
    // arrival, in (batch, vec_id) order
    val batches = Seq(
      Seq((20L, Array(1.0f, 0.0f, 0.0f)), (21L, Array(0.0f, 1.0f, 0.1f))),
      Seq((10L, Array(0.99f, 0.1f, 0.0f)), (30L, Array(0.0f, 0.9f, -0.4f))),
      Seq((5L, Array(0.98f, 0.05f, 0.0f))))
    batches.zipWithIndex.foreach { case (rows, i) =>
      val stage = Files.createTempDirectory(s"graft_ssd_stage$i").toString
      rows.toDF("vec_id", "embedding").coalesce(1)
        .write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = Paths.get(streamDir, s"batch$i.parquet")
      Files.copy(part.toPath, dst)
      dst.toFile.setLastModified(1000000L * (i + 1))
    }
    // hand-pinned codebook: cell 0 = x-axis, cell 1 = y-axis
    val cents = Array(
      (0L, Array(1.0, 0.0, 0.0), 1.0),
      (1L, Array(0.0, 1.0, 0.0), 1.0))
    val res = Similarity.streamingSemanticDedup(
      EventStream.parquetFileStream(spark, streamDir),
      "vec_id", "embedding", cents, tau = 0.9)
    val got = EventStream.runOnce(res,
      s"ssd_multibatch_${System.nanoTime()}", outputMode = "append")
      .select("vec_id", "keep").as[(Long, Int)].collect().toMap
    assert(got == Map(20L -> 1, 21L -> 1, 10L -> 0, 30L -> 1, 5L -> 0),
      s"got $got")
  }

  test("CDC apply loop converges across batches and is replay-idempotent") {
    import java.nio.file.{Files, Paths}
    val streamDir = Files.createTempDirectory("graft_cdc").toString
    val stateDir = streamDir + "_state"
    // 3 micro-batches with OUT-OF-ORDER event times across batches:
    // user 1's newest value (ts 30) arrives in batch 0, older updates
    // later — latest-wins must ignore arrival order entirely
    val batches = Seq(
      Seq((101L, 1L, "a", 1.0, 30L), (102L, 2L, "a", 2.0, 10L)),
      Seq((103L, 1L, "b", 9.0, 20L), (104L, 3L, "b", 3.0, 10L)),
      Seq((105L, 2L, "c", 7.0, 20L), (106L, 1L, "c", 8.0, 25L)))
    batches.zipWithIndex.foreach { case (rows, i) =>
      val stage = Files.createTempDirectory(s"graft_cdc_stage$i").toString
      rows.toDF("event_id", "user_id", "event_type", "value", "ts_us")
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, Paths.get(streamDir, s"b$i.parquet"))
    }
    def runApply(): Unit = EventStream.cdcApplyOnce(
      EventStream.parquetFileStream(spark, streamDir),
      stateDir, "user_id", "ts_us", "event_id")
    runApply()
    val state = spark.read.parquet(stateDir)
      .select("user_id", "event_type", "value", "ts_us")
      .as[(Long, String, Double, Long)].collect().toSet
    // per-user argmax over (ts_us, event_id): 1→ts 30 "a", 2→ts 20
    // "c", 3→ts 10 "b"
    assert(state == Set((1L, "a", 1.0, 30L), (2L, "c", 7.0, 20L),
      (3L, "b", 3.0, 10L)))
    // replay the whole stream into the existing state: idempotent
    runApply()
    val replayed = spark.read.parquet(stateDir)
      .select("user_id", "event_type", "value", "ts_us")
      .as[(Long, String, Double, Long)].collect().toSet
    assert(replayed == state)
    // crash recovery: simulate dying between the two swap renames
    // (state moved aside to __old, new table never installed) — the
    // next run must restore __old before applying, not destroy it
    val fs = new org.apache.hadoop.fs.Path(stateDir).getFileSystem(
      spark.sessionState.newHadoopConf())
    assert(fs.rename(new org.apache.hadoop.fs.Path(stateDir),
      new org.apache.hadoop.fs.Path(stateDir + "__old")))
    runApply()
    val recovered = spark.read.parquet(stateDir)
      .select("user_id", "event_type", "value", "ts_us")
      .as[(Long, String, Double, Long)].collect().toSet
    assert(recovered == state)
  }

  test("IVM view tracks deletes/out-of-order across batches; equals recompute") {
    import java.nio.file.{Files, Paths}
    val streamDir = Files.createTempDirectory("graft_ivm").toString
    val baseDir = streamDir + "_table"
    // out-of-order upserts AND a tombstone that beats a later-arriving
    // but OLDER upsert: u1's newest (ts30,"a") lands first; u3 is
    // deleted at ts40 in b1 and must stay dead when its ts25 upsert
    // arrives in b2
    val batches = Seq(
      Seq((101L, 1L, "upsert", "a", 10L, 30L),
        (102L, 2L, "upsert", "a", 20L, 10L)),
      Seq((103L, 1L, "upsert", "b", 90L, 20L),
        (104L, 3L, "delete", "b", 0L, 40L)),
      Seq((105L, 2L, "upsert", "c", 70L, 20L),
        (106L, 3L, "upsert", "c", 80L, 25L),
        (107L, 4L, "upsert", "a", 50L, 5L)))
    batches.zipWithIndex.foreach { case (rows, i) =>
      val stage = Files.createTempDirectory(s"graft_ivm_stage$i").toString
      rows.toDF("event_id", "user_id", "op", "event_type", "value6",
          "ts_us")
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, Paths.get(streamDir, s"b$i.parquet"))
    }
    def runApply(): Unit = EventStream.ivmApplyOnce(
      EventStream.parquetFileStream(spark, streamDir),
      baseDir, "user_id", "ts_us", "event_id", "op", "event_type",
      "value6")
    runApply()
    def view() = spark.read.parquet(s"$baseDir/view")
      .as[(String, Long, Long)].collect().toSet
    val expected = Set(("a", 2L, 60L), ("c", 1L, 70L))
    assert(view() == expected)
    // the maintained view must equal a recompute over the live state
    val recomputed = spark.read.parquet(s"$baseDir/state")
      .filter(col("op") =!= "delete")
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum(col("value6")).as("sum6"))
      .as[(String, Long, Long)].collect().toSet
    assert(recomputed == expected)
    // tombstone retained in state (order-independence across replays)
    assert(spark.read.parquet(s"$baseDir/state")
      .filter(col("op") === "delete").count() == 1)
    // full-stream replay is idempotent
    runApply()
    assert(view() == expected)
    // crash between the two swap renames: only __old survives
    val fs = new org.apache.hadoop.fs.Path(baseDir).getFileSystem(
      spark.sessionState.newHadoopConf())
    assert(fs.rename(new org.apache.hadoop.fs.Path(baseDir),
      new org.apache.hadoop.fs.Path(baseDir + "__old")))
    runApply()
    assert(view() == expected)
  }

  test("transformWithState stats survive a genuinely multi-batch source") {
    // three parquet files in one stream dir; maxFilesPerTrigger=1 makes
    // each its own micro-batch, so every user emits three cumulative
    // rows — the q57 max() reduction must still recover the final stats
    import java.nio.file.{Files, Paths}
    val streamDir = Files.createTempDirectory("graft_tws").toString
    for (i <- 0 until 3) {
      val stage = Files.createTempDirectory(s"graft_tws_stage$i").toString
      (1L to 10L).flatMap(u => (0 until 4).map(j =>
          (u, s"t${(i + j) % 2}", 1.0)))
        .toDF("user_id", "event_type", "value")
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, Paths.get(streamDir, s"batch$i.parquet"))
    }
    val sink = EventStream.runOnce(
      EventStream.userStatsStream(
        EventStream.parquetFileStream(spark, streamDir)),
      s"tws_multibatch_${System.nanoTime()}", outputMode = "append",
      rocksdb = true)
    // one cumulative row per user per batch proves multi-batch ran
    assert(sink.groupBy(col("user_id")).count()
      .filter(col("count") =!= 3).count() == 0)
    val finals = sink.groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n"), max(col("n_types")).as("t"))
      .select(col("n"), col("t")).distinct()
      .as[(Long, Long)].collect().toSeq
    assert(finals == Seq((12L, 2L)))
  }

  test("auto-compact ingest bounds small files; replay is a no-op (q93)") {
    import graft.sources.VersionedTable
    val base = java.nio.file.Files.createTempDirectory("q93").toString
    val in = new java.io.File(base, "in"); in.mkdirs()
    // 8 tiny single-file batches — without compaction the table ends
    // with 8 sliver files
    for (i <- 0 until 8) {
      val tmp = s"$base/stage$i"
      spark.range(i * 100, i * 100 + 50)
        .select(col("id"), concat(lit("row"), col("id")).as("s"))
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(in, f"b$i%02d.parquet").toPath)
    }
    val table = s"$base/table"
    def run(): Unit = EventStream.autoCompactIngestOnce(
      EventStream.parquetFileStream(spark, in.getAbsolutePath),
      table, targetBytes = 1L << 20, maxSmallFiles = 2)
    run()
    val vLast = VersionedTable.versions(spark, table).last
    // every batch's rows present exactly once, compaction lost nothing
    val got = VersionedTable.readVersion(spark, table, vLast)
      .select("id").as[Long].collect().sorted
    val want = (0 until 8).flatMap(i => i * 100 until i * 100 + 50)
      .map(_.toLong).sorted
    assert(got.toSeq == want)
    // the small-file bound held: every version's under-target file
    // count stays ≤ maxSmallFiles + 1 (a batch may land one sliver
    // past the bound before its compaction commits)
    val finalSmalls = VersionedTable.fileSizes(spark, table, vLast)
      .count(_._2 < (1L << 20))
    assert(finalSmalls <= 3, s"final small files: $finalSmalls")
    assert(VersionedTable.versions(spark, table).length > 8,
      "no compaction commit ever ran")
    // checkpoint-less replay: all 8 batches re-arrive, every one is
    // detected by its stamp — no new versions, identical content
    val before = VersionedTable.versions(spark, table)
    run()
    assert(VersionedTable.versions(spark, table) == before)
    assert(VersionedTable.readVersion(spark, table, before.last)
      .select("id").as[Long].collect().sorted.toSeq == want)
  }

  test("left-outer emissions are monotone in the watermark delay (q75)") {
    // the q75 pipeline swept across watermark delays on one bounded
    // multi-batch source: matched (inner) rows must be IDENTICAL for
    // every delay, and the unmatched-purchase (null-view) set must
    // shrink monotonically as the delay grows — a purchase emits its
    // outer row only once the watermark passes its join window, and a
    // larger delay holds the watermark further back
    val dir = java.nio.file.Files.createTempDirectory("wmsweep").toString
    def write(name: String, rows: Seq[(Long, Long, String, Timestamp)])
        : Unit = {
      val tmp = s"$dir/_stage_$name"
      rows.toDF("event_id", "user_id", "event_type", "ts")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(dir, s"$name.parquet").toPath)
    }
    // batch 1 (early hours): u1 matched (view 30 min before purchase),
    // u2 unmatched; batch 2: u3 unmatched, u4 unmatched near the end,
    // u5's view at 12:00 pushes the event-time high-water mark;
    // batch 3: one stale view (dropped as late for every delay) whose
    // batch flushes the evictions the batch-2 watermark armed
    write("00", Seq(
      (1L, 1L, "view", ts("2024-01-01 01:30:00")),
      (2L, 1L, "purchase", ts("2024-01-01 02:00:00")),
      (3L, 2L, "purchase", ts("2024-01-01 03:00:00"))))
    write("01", Seq(
      (4L, 3L, "purchase", ts("2024-01-01 08:00:00")),
      (5L, 4L, "purchase", ts("2024-01-01 11:30:00")),
      (6L, 5L, "view", ts("2024-01-01 12:00:00"))))
    write("02", Seq(
      (7L, 99L, "view", ts("2024-01-01 00:10:00"))))
    def run(delay: String): (Set[(Long, Long)], Set[Long]) = {
      val src = EventStream.eventsFileStream(spark, dir)
      val purchases = src.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("event_id").as("purchase_id"))
        .withWatermark("p_ts", delay)
      val views = src.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
          col("event_id").as("view_id"))
        .withWatermark("v_ts", delay)
      val joined = purchases.join(views,
          col("p_user") === col("v_user") &&
            col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
            col("v_ts") <= col("p_ts"), "leftOuter")
        .select(col("purchase_id"), col("view_id"))
      val rows = EventStream.runOnce(joined,
          s"wm_sweep_${System.nanoTime()}", "append")
        .as[(Long, Option[Long])].collect()
      (rows.collect { case (p, Some(v)) => (p, v) }.toSet,
        rows.collect { case (p, None) => p }.toSet)
    }
    val delays = Seq("30 minutes", "2 hours", "5 hours", "9 hours")
    val results = delays.map(d => d -> run(d)).toMap
    // inner rows: delay-invariant, exactly the one real match
    for (d <- delays)
      assert(results(d)._1 == Set((2L, 1L)), s"inner drifted at $d")
    // outer rows: monotone ⊇-chain as the delay grows
    for (Seq(d1, d2) <- delays.sliding(2))
      assert(results(d2)._2.subsetOf(results(d1)._2),
        s"outer set grew from $d1 to $d2: " +
          s"${results(d1)._2} -> ${results(d2)._2}")
    // and the cutoffs land where the watermark arithmetic says:
    // wm(30m)=11:30 → u2(03:00) and u3(08:00) closed; wm(5h)=07:00 →
    // only u2; wm(9h)=03:00 → nothing can close
    assert(Set(3L, 4L).subsetOf(results("30 minutes")._2))
    assert(results("5 hours")._2 == Set(3L))
    assert(results("9 hours")._2.isEmpty)
  }
}
