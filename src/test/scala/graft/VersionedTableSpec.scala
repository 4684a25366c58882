package graft

import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  test("time travel returns each snapshot exactly; current is latest") {
    val dir = java.nio.file.Files.createTempDirectory("vtab").toString
    val v0 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
    val v1 = Seq((1L, "a"), (3L, "c2")).toDF("id", "s")      // delete+update
    val v2 = Seq((1L, "a"), (3L, "c2"), (9L, "z")).toDF("id", "s")
    assert(VersionedTable.commit(v0, dir) == 0)
    assert(VersionedTable.commit(v1, dir) == 1)
    assert(VersionedTable.commit(v2, dir) == 2)
    assert(VersionedTable.versions(spark, dir) == Seq(0, 1, 2))
    def rows(v: Int) = VersionedTable.readVersion(spark, dir, v)
      .as[(Long, String)].collect().toSet
    // v0 read AFTER later commits still shows the pre-delete content
    assert(rows(0) == Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(rows(1) == Set((1L, "a"), (3L, "c2")))
    assert(rows(2) == Set((1L, "a"), (3L, "c2"), (9L, "z")))
    assert(VersionedTable.readCurrent(spark, dir)
      .as[(Long, String)].collect().toSet == rows(2))
  }

  test("a crashed commit is invisible: data without manifest, tmp junk") {
    val dir = java.nio.file.Files.createTempDirectory("vtab").toString
    VersionedTable.commit(Seq((1L, "a")).toDF("id", "s"), dir)
    // simulate a crash between data write and manifest rename: orphan
    // data files and a leftover .tmp manifest
    Seq((666L, "ghost")).toDF("id", "s")
      .write.parquet(s"$dir/data/v1")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_manifests", "v1.json.tmp"),
      "{\"version\":1,\"files\":[\"data/v1/broken\"]}".getBytes)
    // readers see only the committed version; the next commit takes
    // the number the crashed one never claimed... v1 data dir exists,
    // so the new commit's overwrite replaces the orphan files
    assert(VersionedTable.versions(spark, dir) == Seq(0))
    assert(VersionedTable.readCurrent(spark, dir)
      .as[(Long, String)].collect().toSet == Set((1L, "a")))
    val v = VersionedTable.commit(Seq((2L, "b")).toDF("id", "s"), dir)
    assert(v == 1)
    assert(VersionedTable.readVersion(spark, dir, 1)
      .as[(Long, String)].collect().toSet == Set((2L, "b")))
  }

  test("append commit reuses base files verbatim; history intact") {
    val dir = java.nio.file.Files.createTempDirectory("vtab").toString
    VersionedTable.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), dir)
    VersionedTable.appendCommit(Seq((3L, "c")).toDF("id", "s"), dir)
    assert(VersionedTable.readVersion(spark, dir, 1)
      .as[(Long, String)].collect().toSet
      == Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(VersionedTable.readVersion(spark, dir, 0)
      .as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
    // file-level reuse: v1's manifest lists v0's files UNCHANGED plus
    // only files under data/v1 — the append rewrote nothing
    def files(v: Int) = VersionedTable.parseFiles(new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, "_manifests", s"v$v.json")))).toSet
    assert(files(0).subsetOf(files(1)))
    assert((files(1) -- files(0)).forall(_.startsWith("data/v1/")))
    assert((files(1) -- files(0)).nonEmpty)
  }

  test("manifest files parse round-trips including empty") {
    assert(VersionedTable.parseFiles(
      """{"version":3,"files":["data/v3/a.parquet","data/v3/b.parquet"]}""")
      == Seq("data/v3/a.parquet", "data/v3/b.parquet"))
    assert(VersionedTable.parseFiles("""{"version":0,"files":[]}""")
      == Seq.empty)
    // pre-deletion-vector manifests have no dvs field — still parse
    assert(VersionedTable.parseArray(
      """{"version":0,"files":[]}""", "dvs").isEmpty)
    assert(VersionedTable.parseArray(
      """{"version":1,"files":[],"dvs":["deletes/v1/k.parquet"]}""",
      "dvs").contains(Seq("deletes/v1/k.parquet")))
  }

  test("deletion vectors: merge-on-read, versioned, rewrite pays debt") {
    val dir = java.nio.file.Files.createTempDirectory("vtab").toString
    VersionedTable.commit(
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "s"), dir)
    val v1 = VersionedTable.deleteCommit(Seq(2L, 4L).toDF("id"), dir)
    assert(v1 == 1)
    def rows(v: Int) = VersionedTable.readVersion(spark, dir, v)
      .as[(Long, String)].collect().toSet
    // v0 still sees everything; v1 hides the deleted keys
    assert(rows(0) == Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    assert(rows(1) == Set((1L, "a"), (3L, "c")))
    // the delete rewrote NO data file: v1 lists exactly v0's files
    def manifest(v: Int) = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_manifests", s"v$v.json")))
    assert(VersionedTable.parseFiles(manifest(1))
      == VersionedTable.parseFiles(manifest(0)))
    assert(VersionedTable.parseArray(manifest(1), "dvs").get.nonEmpty)
    // appends carry the live deletes along
    val v2 = VersionedTable.appendCommit(Seq((9L, "z")).toDF("id", "s"), dir)
    assert(rows(v2) == Set((1L, "a"), (3L, "c"), (9L, "z")))
    // deletes stack: a second vector removes more rows
    val v3 = VersionedTable.deleteCommit(Seq(1L).toDF("id"), dir)
    assert(rows(v3) == Set((3L, "c"), (9L, "z")))
    // rewrite: same content, fresh files, zero dvs
    val v4 = VersionedTable.rewriteCommit(spark, dir)
    assert(rows(v4) == rows(v3))
    assert(VersionedTable.parseArray(manifest(v4), "dvs").get.isEmpty)
    assert(VersionedTable.parseFiles(manifest(v4))
      .forall(_.startsWith(s"data/v$v4/")))
  }

  test("optimize packs only small files, carries big ones by path, " +
      "drops dead DVs") {
    val dir = java.nio.file.Files.createTempDirectory("vtab").toString
    // v0: four tiny files; v1: delete a key living only in them;
    // v2: append one file far larger than any v0 file
    VersionedTable.commit(
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "s")
        .repartition(4), dir)
    VersionedTable.deleteCommit(Seq(2L).toDF("id"), dir)
    val big = spark.range(100L, 400L)
      .select(col("id"), concat(lit("pad-pad-pad-"), col("id")).as("s"))
    VersionedTable.appendCommit(big.coalesce(1), dir)
    def rows(v: Int) = VersionedTable.readVersion(spark, dir, v)
      .as[(Long, String)].collect().toSet
    val before = rows(2)
    val target = VersionedTable.fileSizes(spark, dir, 2).map(_._2).max
    val v3 = VersionedTable.optimizeCommit(spark, dir, target)
    assert(v3 == 3)
    // content-invisible, history intact
    assert(rows(3) == before)
    assert(rows(0).map(_._1) == Set(1L, 2L, 3L, 4L))
    def manifest(v: Int) = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_manifests", s"v$v.json")))
    val files3 = VersionedTable.parseFiles(manifest(3))
    val files2 = VersionedTable.parseFiles(manifest(2))
    // the big v2 file carried by PATH; the four v0 files packed to one
    val carried = files3.filter(_.startsWith("data/v2/"))
    assert(carried == files2.filter(_.startsWith("data/v2/")))
    assert(files3.count(_.startsWith("data/v3/")) == 1)
    assert(files3.size == carried.size + 1)
    // the v1 vector masked only v0 files — all packed away, so the
    // vector is dead and dropped (path metadata alone decides this)
    assert(VersionedTable.parseArray(manifest(2), "dvs").get.nonEmpty)
    assert(VersionedTable.parseArray(manifest(3), "dvs").get.isEmpty)
    // nothing below target twice over → no-op, same version back
    assert(VersionedTable.optimizeCommit(spark, dir, 1L) == 3)
    assert(VersionedTable.versions(spark, dir) == Seq(0, 1, 2, 3))
  }

  test("optimize carries stats for kept files, re-measures packed ones") {
    val dir = java.nio.file.Files.createTempDirectory("vtab").toString
    // v0: [0,100) range-clustered over four small files
    VersionedTable.commit(
      spark.range(0L, 100L).toDF("id").repartitionByRange(4, col("id")),
      dir, statsCol = "id")
    // v1: [1000,5000) appended as one large file
    VersionedTable.appendCommit(
      spark.range(1000L, 5000L).toDF("id").coalesce(1), dir)
    val target = VersionedTable.fileSizes(spark, dir, 1).map(_._2).max
    val v2 = VersionedTable.optimizeCommit(spark, dir, target)
    assert(v2 == 2)
    // low range prunes the carried file (its CARRIED stats decide);
    // high range prunes the packed file (its RE-MEASURED stats decide)
    assert(VersionedTable.filesInRange(spark, dir, v2, 0L, 50L)
      == ((VersionedTable.parseFiles(new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
          dir, "_manifests", s"v$v2.json"))))
        .filter(_.startsWith("data/v2/")), 2)))
    assert(VersionedTable.filesInRange(spark, dir, v2, 2000L, 2500L)
      ._1.forall(_.startsWith("data/v1/")))
    assert(VersionedTable.filesInRange(spark, dir, v2, 2000L, 2500L)
      ._1.size == 1)
    assert(VersionedTable.readVersionWhere(spark, dir, v2, 0L, 50L)
      .agg(sum(col("id"))).as[Long].head() == (0L to 50L).sum)
    assert(VersionedTable.readVersionWhere(spark, dir, v2, 2000L, 2500L)
      .agg(count(lit(1))).as[Long].head() == 501L)
  }

  test("file-scoped DVs: re-inserting a deleted key becomes visible") {
    val dir = java.nio.file.Files.createTempDirectory("vtab").toString
    VersionedTable.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), dir)
    val v1 = VersionedTable.deleteCommit(Seq(2L).toDF("id"), dir)
    def rows(v: Int) = VersionedTable.readVersion(spark, dir, v)
      .as[(Long, String)].collect().toSet
    assert(rows(v1) == Set((1L, "a")))
    // the vector only masks files that existed when it was committed:
    // an append that re-inserts the key is visible (no forever-
    // tombstone), while the ORIGINAL copy stays masked — no dup
    val v2 = VersionedTable.appendCommit(Seq((2L, "b2")).toDF("id", "s"), dir)
    assert(rows(v2) == Set((1L, "a"), (2L, "b2")))
    // a fresh delete masks both the old file and the appended one
    val v3 = VersionedTable.deleteCommit(Seq(2L).toDF("id"), dir)
    assert(rows(v3) == Set((1L, "a")))
    // a misnamed key column is rejected BEFORE anything publishes
    intercept[IllegalArgumentException] {
      VersionedTable.deleteCommit(Seq(1L).toDF("nope"), dir)
    }
    assert(VersionedTable.versions(spark, dir) == Seq(0, 1, 2, 3))
  }

  test("mergeCommit upserts atomically in one version") {
    val dir = java.nio.file.Files.createTempDirectory("vtab").toString
    VersionedTable.commit(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"), dir)
    // one commit: 2 updates in place, 9 inserts, 1/3 untouched
    val v = VersionedTable.mergeCommit(
      Seq((2L, "b2"), (9L, "z")).toDF("id", "s"), dir, "id")
    assert(v == 1)
    def rows(v: Int) = VersionedTable.readVersion(spark, dir, v)
      .as[(Long, String)].collect().toSet
    assert(rows(1) == Set((1L, "a"), (2L, "b2"), (3L, "c"), (9L, "z")))
    assert(rows(0) == Set((1L, "a"), (2L, "b"), (3L, "c")))
    // exactly ONE version was created — no observable intermediate
    // deleted-only state, unlike deleteCommit + appendCommit
    assert(VersionedTable.versions(spark, dir) == Seq(0, 1))
    // merges chain: a second merge re-updates an already-merged key
    VersionedTable.mergeCommit(Seq((9L, "z2")).toDF("id", "s"), dir, "id")
    assert(rows(2) == Set((1L, "a"), (2L, "b2"), (3L, "c"), (9L, "z2")))
    // schema and key-column contracts are enforced up front
    intercept[IllegalArgumentException] {
      VersionedTable.mergeCommit(Seq(1L).toDF("id"), dir, "id")
    }
    intercept[IllegalArgumentException] {
      VersionedTable.mergeCommit(
        Seq((1L, "x")).toDF("id", "s"), dir, "nope")
    }
  }

  test("manifest stats prune files; range read equals filtered full read") {
    val dir = java.nio.file.Files.createTempDirectory("vtab").toString
    val base = spark.range(0, 1000)
      .select(col("id"), (col("id") % 7).as("m"))
      .repartitionByRange(8, col("id"))
    VersionedTable.commit(base, dir, statsCol = "id")
    // the skipping decision is manifest metadata only
    val (kept, total) = VersionedTable.filesInRange(spark, dir, 0, 100L, 220L)
    assert(total == 8 && kept.nonEmpty && kept.length < total,
      s"expected real pruning, got $kept of $total")
    def rng(v: Int, lo: Long, hi: Long) =
      VersionedTable.readVersionWhere(spark, dir, v, lo, hi)
        .as[(Long, Long)].collect().toSet
    assert(rng(0, 100L, 220L) ==
      (100L to 220L).map(i => (i, i % 7)).toSet)
    // an all-pruned range returns empty with the schema intact
    assert(rng(0, 5000L, 6000L) == Set.empty)
    // stats survive append (new files measured), merge and rewrite;
    // DVs still apply inside a pruned read
    VersionedTable.appendCommit(
      spark.range(2000, 2100)
        .select(col("id"), (col("id") % 7).as("m")), dir)
    assert(rng(1, 1990L, 2005L) ==
      (2000L to 2005L).map(i => (i, i % 7)).toSet)
    VersionedTable.mergeCommit(
      Seq((150L, -1L)).toDF("id", "m"), dir, "id")
    assert(rng(2, 149L, 151L) ==
      Set((149L, 149L % 7), (150L, -1L), (151L, 151L % 7)))
    // rewrite re-measures stats over its fresh files (which may be
    // few — compaction); the range read must stay correct through it
    val v3 = VersionedTable.rewriteCommit(spark, dir)
    assert(rng(v3, 149L, 151L) ==
      Set((149L, 149L % 7), (150L, -1L), (151L, 151L % 7)))
  }

  test("change feed labels inserts/updates/deletes; DV commits surface") {
    val dir = java.nio.file.Files.createTempDirectory("vtab").toString
    VersionedTable.commit(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"), dir)
    VersionedTable.commit(
      Seq((1L, "a"), (3L, "c2"), (4L, "d")).toDF("id", "s"), dir)
    def feed(a: Int, b: Int) = VersionedTable
      .changes(spark, dir, a, b, "id")
      .as[(Long, String)].collect().toSet
    assert(feed(0, 1) == Set((2L, "delete"), (3L, "update"),
      (4L, "insert")))
    // a deletion-vector commit shows up as plain deletes
    val v2 = VersionedTable.deleteCommit(Seq(1L).toDF("id"), dir)
    assert(feed(1, v2) == Set((1L, "delete")))
    // spans compose transitively
    assert(feed(0, v2) == Set((1L, "delete"), (2L, "delete"),
      (3L, "update"), (4L, "insert")))
    // identical versions → empty feed
    assert(feed(1, 1).isEmpty)
  }

  test("vacuum drops only files unreachable from retained versions") {
    val dir = java.nio.file.Files.createTempDirectory("vtab").toString
    VersionedTable.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), dir)
    VersionedTable.appendCommit(Seq((3L, "c")).toDF("id", "s"), dir)
    VersionedTable.deleteCommit(Seq(2L).toDF("id"), dir)
    VersionedTable.rewriteCommit(spark, dir) // v3: fresh files only
    def rows(v: Int) = VersionedTable.readVersion(spark, dir, v)
      .as[(Long, String)].collect().toSet
    val v3Rows = rows(3)
    // retain the last 2: v0/v1 manifests go; v2's files are shared
    // with retained v2... retained = v2,v3 — v0's data files are
    // still referenced by v2 (append lineage) so they must SURVIVE
    val deleted = VersionedTable.vacuum(spark, dir, retainLast = 2)
    assert(VersionedTable.versions(spark, dir) == Seq(2, 3))
    assert(rows(2) == Set((1L, "a"), (3L, "c")))
    assert(rows(3) == v3Rows)
    // nothing reachable was deleted (v0/v1 files all carried into v2)
    assert(deleted.isEmpty)
    // drop down to just the rewritten version: now the old data files
    // and the deletion vector really go away
    val deleted2 = VersionedTable.vacuum(spark, dir, retainLast = 1)
    assert(VersionedTable.versions(spark, dir) == Seq(3))
    assert(deleted2.exists(_.startsWith("data/v0/")))
    assert(deleted2.exists(_.startsWith("deletes/v2/")))
    assert(rows(3) == v3Rows)
    // unreferenced version DIRECTORIES go whole (no _SUCCESS orphans)
    assert(!new java.io.File(dir, "data/v0").exists())
    assert(!new java.io.File(dir, "deletes/v2").exists())
    assert(new java.io.File(dir, "data/v3").exists())
  }

  test("restore republishes an old manifest as a new version, zero I/O") {
    val dir = java.nio.file.Files.createTempDirectory("vtab").toString
    VersionedTable.commit(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"), dir)
    VersionedTable.deleteCommit(Seq(2L).toDF("id"), dir) // the bad load
    def rows(v: Int) = VersionedTable.readVersion(spark, dir, v)
      .as[(Long, String)].collect().toSet
    assert(rows(1) == Set((1L, "a"), (3L, "c")))
    val v2 = VersionedTable.restoreCommit(spark, dir, 0)
    assert(v2 == 2)
    // content rolled back; the bad version still time-travels
    assert(rows(2) == rows(0))
    assert(rows(1) == Set((1L, "a"), (3L, "c")))
    assert(VersionedTable.readCurrent(spark, dir)
      .as[(Long, String)].collect().toSet == rows(0))
    // METADATA-ONLY: no new data directory was written
    assert(!new java.io.File(dir, "data/v2").exists())
    def manifest(v: Int) = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_manifests", s"v$v.json")))
    assert(VersionedTable.parseFiles(manifest(2))
      == VersionedTable.parseFiles(manifest(0)))
    // restoring a DV-carrying version carries its vectors too
    val v3 = VersionedTable.restoreCommit(spark, dir, 1)
    assert(rows(v3) == Set((1L, "a"), (3L, "c")))
    // a never-committed version is rejected
    intercept[IllegalArgumentException] {
      VersionedTable.restoreCommit(spark, dir, 99)
    }
  }

  test("bloom point lookup prunes files with zero false negatives") {
    val dir = java.nio.file.Files.createTempDirectory("vtab").toString
    // hash-partitioned (NOT range-clustered) layout: min/max stats
    // could never prune this, blooms still do
    val base = spark.range(0, 2000)
      .select(col("id"), (col("id") % 13).as("m"))
      .repartition(16, col("id"))
    VersionedTable.commitWithBloom(base, dir, "id")
    // zero false negatives: every present key is found, exactly once
    for (key <- Seq(0L, 7L, 999L, 1999L)) {
      assert(VersionedTable.readVersionPoint(spark, dir, 0, key)
        .as[(Long, Long)].collect().toSeq == Seq((key, key % 13)),
        s"key $key lost by bloom pruning")
      // genuine pruning: a key lives in ONE file; false positives
      // should leave most of the other 15 pruned
      val (kept, total) = VersionedTable.filesForKey(spark, dir, 0, key)
      assert(total == 16 && kept.nonEmpty && kept.length < total / 2,
        s"expected sharp pruning for $key, kept ${kept.length}/$total")
    }
    // absent keys: usually zero files open, never a wrong row
    assert(VersionedTable.readVersionPoint(spark, dir, 0, 555555L)
      .count() == 0)
    // deletes mask inside a pruned read; appends extend the blooms
    VersionedTable.deleteCommit(Seq(7L).toDF("id"), dir)
    assert(VersionedTable.readVersionPoint(spark, dir, 1, 7L).count() == 0)
    val v2 = VersionedTable.appendCommit(
      Seq((5000L, -1L)).toDF("id", "m"), dir)
    assert(VersionedTable.readVersionPoint(spark, dir, v2, 5000L)
      .as[(Long, Long)].collect().toSeq == Seq((5000L, -1L)))
    val (kept2, total2) = VersionedTable.filesForKey(spark, dir, v2, 5000L)
    assert(total2 == 17 && kept2.contains(
      kept2.find(_.startsWith("data/v2/")).get))
    assert(kept2.length < total2 / 2)
  }

  test("append may widen the schema; old rows null-fill, history exact") {
    val dir = java.nio.file.Files.createTempDirectory("vtab").toString
    VersionedTable.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), dir)
    // widened append: new column `q` exists only in v1's files
    val v1 = VersionedTable.appendCommit(
      Seq((3L, "c", 9L)).toDF("id", "s", "q"), dir)
    val cur = VersionedTable.readVersion(spark, dir, v1)
    assert(cur.columns.toSet == Set("id", "s", "q"))
    assert(cur.as[(Long, String, Option[Long])].collect().toSet ==
      Set((1L, "a", None), (2L, "b", None), (3L, "c", Some(9L))))
    // time travel to the pre-widening version: narrow schema, exactly
    assert(VersionedTable.readVersion(spark, dir, 0).columns.toSet
      == Set("id", "s"))
    assert(VersionedTable.readVersion(spark, dir, 0)
      .as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
  }

  test("constraint gate partitions rows exactly; null rule = violation") {
    import graft.operators.Constraints
    val dir = java.nio.file.Files.createTempDirectory("vgate").toString
    val df = Seq(
      (1L, Some("en"), 10L),   // clean
      (2L, Some("xx"), 10L),   // bad lang           → bit 0
      (3L, Some("en"), -5L),   // bad count          → bit 1
      (4L, Some("xx"), -5L),   // both               → bits 0+1
      (5L, None, 10L)          // NULL lang: rule is UNKNOWN → bit 0
    ).toDF("id", "lang", "n")
    val rules = Seq(
      "lang_known" -> col("lang").isin("en", "de"),
      "n_positive" -> (col("n") > 0))
    val (v, quar) = Constraints.gateCommit(df, rules, dir)
    val clean = VersionedTable.readVersion(spark, dir, v)
      .select("id").as[Long].collect().toSet
    val quarM = quar.select("id", "reasons")
      .as[(Long, Long)].collect().toMap
    assert(clean == Set(1L))
    assert(quarM == Map(2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 1L))
    // partition property: every input row in exactly one side
    assert(clean.intersect(quarM.keySet).isEmpty)
    assert((clean ++ quarM.keySet) == (1L to 5L).toSet)
    // the gate plan is shuffle-free (one codegen'd map stage)
    val plan = Constraints.check(df, rules)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("optimistic append: interleaved committers serialize, none lost") {
    val dir = java.nio.file.Files.createTempDirectory("vcas").toString
    VersionedTable.commit(Seq((1L, "base")).toDF("id", "s"), dir)
    // A reads the latest, then B lands its append inside A's
    // read→claim window: A's claim fails, A rebases and lands after B
    var bV = -1
    val aV = VersionedTable.appendCommitAtomic(
      Seq((2L, "a")).toDF("id", "s"), dir,
      onBeforeClaim = () => if (bV < 0)
        bV = VersionedTable.appendCommitAtomic(
          Seq((3L, "b")).toDF("id", "s"), dir))
    assert(bV == 1 && aV == 2, s"serialization order broke: b=$bV a=$aV")
    // B's version holds base∪B; A's rebased version holds everything
    assert(VersionedTable.readVersion(spark, dir, bV)
      .select("id").as[Long].collect().toSet == Set(1L, 3L))
    assert(VersionedTable.readVersion(spark, dir, aV)
      .select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    // atomically-appended files live at canonical data/vN paths, so
    // the DV protocol masks their rows like any other file's: delete
    // one row from each atomic append and one from the base
    VersionedTable.deleteCommit(Seq(1L, 2L, 3L).toDF("id"), dir)
    assert(VersionedTable.readVersion(spark, dir,
        VersionedTable.versions(spark, dir).last)
      .select("id").as[Long].collect().isEmpty,
      "deletion vectors failed to mask atomically-appended rows")
  }

  test("optimistic append: claim-starved committer aborts, nothing " +
      "observable remains") {
    val dir = java.nio.file.Files.createTempDirectory("vcas2").toString
    VersionedTable.commit(Seq((1L, "base")).toDF("id", "s"), dir)
    // every retry finds its slot freshly taken (a new append lands in
    // each read→claim window) → the loser must give up cleanly
    val e = intercept[java.util.ConcurrentModificationException] {
      VersionedTable.appendCommitAtomic(
        Seq((99L, "loser")).toDF("id", "s"), dir, maxRetries = 2,
        onBeforeClaim = () => VersionedTable.appendCommit(
          Seq((50L, "noise")).toDF("id", "s"), dir))
    }
    assert(e.getMessage.contains("claim races"))
    // the aborted txn's data is gone: the latest version census holds
    // only base + the three noise appends
    val ids = VersionedTable.readVersion(spark, dir,
      VersionedTable.versions(spark, dir).last)
      .select("id").as[Long].collect().toSeq
    assert(!ids.contains(99L))
    assert(ids.count(_ == 50L) == 3 && ids.contains(1L))
    // no orphaned txn dirs under data/ either (the winner path keeps
    // its c-dir, but this table's only atomic committer aborted)
    val dataDirs = new java.io.File(dir, "data").listFiles().map(_.getName)
    assert(!dataDirs.exists(_.startsWith("c")), dataDirs.mkString(","))
  }

  test("mergeCommitAtomic: CAS merge lands at the expected base, " +
      "aborts after an interloper with nothing observable") {
    val dir = java.nio.file.Files.createTempDirectory("vcasm").toString
    val v0 = VersionedTable.commit(
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"), dir)
    // clean CAS merge: upsert id=2, insert id=3
    val v1 = VersionedTable.mergeCommitAtomic(
      Seq((2L, "b2"), (3L, "c")).toDF("id", "s"), dir, "id",
      expectedBase = v0)
    assert(v1 == 1)
    assert(VersionedTable.readVersion(spark, dir, v1)
      .as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b2"), (3L, "c")))
    // stale CAS: a transaction that read v0 must NOT merge over v1
    intercept[java.util.ConcurrentModificationException] {
      VersionedTable.mergeCommitAtomic(
        Seq((2L, "stale")).toDF("id", "s"), dir, "id",
        expectedBase = v0)
    }
    // nothing observable: no new version, v1 content intact, and no
    // data/deletes directories beyond v1's
    assert(VersionedTable.versions(spark, dir) == Seq(0, 1))
    assert(VersionedTable.readVersion(spark, dir, 1)
      .as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b2"), (3L, "c")))
    val dataDirs = new java.io.File(dir, "data").listFiles().map(_.getName)
    assert(dataDirs.toSet == Set("v0", "v1"), dataDirs.mkString(","))
  }

  test("TIMESTAMP AS OF resolves the latest commit at-or-before") {
    val dir = java.nio.file.Files.createTempDirectory("vts").toString
    VersionedTable.withCommitTimestamp(1000L) {
      VersionedTable.commit(Seq((1L, "a")).toDF("id", "s"), dir)
    }
    VersionedTable.withCommitTimestamp(2000L) {
      VersionedTable.appendCommit(Seq((2L, "b")).toDF("id", "s"), dir)
    }
    def idsAt(ts: Long) = VersionedTable.readAsOf(spark, dir, ts)
      .select("id").as[Long].collect().toSet
    assert(VersionedTable.versionAsOf(spark, dir, 1000L) == 0)
    assert(idsAt(1000L) == Set(1L))            // exact boundary
    assert(idsAt(1999L) == Set(1L))            // between commits
    assert(idsAt(2000L) == Set(1L, 2L))        // second boundary
    assert(idsAt(Long.MaxValue) == Set(1L, 2L)) // far future = latest
    // before the first commit: no version existed
    intercept[IllegalArgumentException] {
      VersionedTable.versionAsOf(spark, dir, 999L)
    }
    // unstamped scope falls back to wall clock: still resolvable
    VersionedTable.appendCommit(Seq((3L, "c")).toDF("id", "s"), dir)
    assert(idsAt(Long.MaxValue) == Set(1L, 2L, 3L))
  }

  test("shallow clone is metadata-only and isolates both directions") {
    val src = java.nio.file.Files.createTempDirectory("vclone_s").toString
    val dst = java.nio.file.Files.createTempDirectory("vclone_d").toString
    val v0 = VersionedTable.commit(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"), src)
    val cv = VersionedTable.cloneCommit(spark, src, dst, v0)
    // metadata-only: the clone wrote NO data files, just one manifest
    assert(!new java.io.File(dst, "data").exists())
    assert(new java.io.File(dst, "_manifests").listFiles()
      .count(_.getName.matches("v\\d+\\.json")) == 1)
    // content identical to the source version
    def ids(dir: String, v: Int) = VersionedTable
      .readVersion(spark, dir, v).select("id").as[Long].collect().toSet
    assert(ids(dst, cv) == Set(1L, 2L, 3L))
    // clone append never touches the source...
    val cv1 = VersionedTable.appendCommit(
      Seq((9L, "z")).toDF("id", "s"), dst)
    assert(ids(dst, cv1) == Set(1L, 2L, 3L, 9L))
    assert(VersionedTable.versions(spark, src) == Seq(0))
    assert(ids(src, v0) == Set(1L, 2L, 3L))
    // clone-local DELETEs mask carried files correctly (carried
    // absolute-path files read as version 0 against the clone's own
    // DV counter — the cross-counter trap)
    VersionedTable.deleteCommit(Seq(3L).toDF("id"), dst)
    assert(ids(dst, VersionedTable.versions(spark, dst).last) ==
      Set(1L, 2L, 9L))
    // ...and a later source delete never touches the clone
    VersionedTable.deleteCommit(Seq(2L).toDF("id"), src)
    assert(ids(src, 1) == Set(1L, 3L))
    assert(ids(dst, cv1) == Set(1L, 2L, 3L, 9L))
    // a clone must start from an empty table dir
    intercept[IllegalArgumentException] {
      VersionedTable.cloneCommit(spark, src, dst, v0)
    }
    // a DV-carrying source version cannot be shallow-cloned (its DV
    // version numbers are meaningless against the clone's counter) —
    // the error directs to rewriteCommit
    val dst2 = java.nio.file.Files.createTempDirectory("vclone_d2").toString
    val e = intercept[IllegalArgumentException] {
      VersionedTable.cloneCommit(spark, src, dst2,
        VersionedTable.versions(spark, src).last)
    }
    assert(e.getMessage.contains("rewriteCommit"))
    // the rewritten (DV-free) version clones fine
    val vr = VersionedTable.rewriteCommit(spark, src)
    assert(VersionedTable.cloneCommit(spark, src, dst2, vr) == 0)
    assert(ids(dst2, 0) == Set(1L, 3L))
  }

  test("commitIfUnchanged: CAS succeeds at the expected base, aborts " +
      "after an interloper") {
    val dir = java.nio.file.Files.createTempDirectory("vcas3").toString
    val v0 = VersionedTable.commit(Seq((1L, "x")).toDF("id", "s"), dir)
    // clean CAS: table still at v0
    val v1 = VersionedTable.commitIfUnchanged(
      Seq((2L, "y")).toDF("id", "s"), dir, expectedBase = v0)
    assert(v1 == 1)
    // stale CAS: transaction read v0, but the table moved to v1
    intercept[java.util.ConcurrentModificationException] {
      VersionedTable.commitIfUnchanged(
        Seq((3L, "z")).toDF("id", "s"), dir, expectedBase = v0)
    }
    // the abort published nothing: latest is still v1 with y's row
    assert(VersionedTable.versions(spark, dir) == Seq(0, 1))
    assert(VersionedTable.readVersion(spark, dir, 1)
      .select("id").as[Long].collect().toSet == Set(2L))
  }

  test("latest hint: every commit flavor refreshes it") {
    val dir = java.nio.file.Files.createTempDirectory("vtab").toString
    VersionedTable.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), dir)
    assert(VersionedTable.readHint(spark, dir) == Some(0))
    VersionedTable.appendCommit(Seq((3L, "c")).toDF("id", "s"), dir)
    assert(VersionedTable.readHint(spark, dir) == Some(1))
    VersionedTable.deleteCommit(Seq(Tuple1(2L)).toDF("id"), dir)
    assert(VersionedTable.readHint(spark, dir) == Some(2))
    assert(VersionedTable.currentVersionFast(spark, dir) == 2)
    assert(VersionedTable.readCurrentFast(spark, dir)
      .select("id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("latest hint: stale, missing, corrupt, and phantom hints all recover") {
    val dir = java.nio.file.Files.createTempDirectory("vtab").toString
    (0 to 3).foreach(i =>
      VersionedTable.commit(Seq((i.toLong, "x")).toDF("id", "s"), dir))
    // stale (committer crashed before refresh): probe-forward repairs
    VersionedTable.writeHint(spark, dir, 1)
    assert(VersionedTable.currentVersionFast(spark, dir) == 3)
    // missing: falls back to the LIST
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(dir, "_manifests", "_latest"))
    assert(VersionedTable.currentVersionFast(spark, dir) == 3)
    // corrupt: unparseable content falls back to the LIST
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_manifests", "_latest"),
      "not-a-number".getBytes)
    assert(VersionedTable.currentVersionFast(spark, dir) == 3)
    // phantom: hint names a version with no manifest → LIST fallback
    VersionedTable.writeHint(spark, dir, 99)
    assert(VersionedTable.currentVersionFast(spark, dir) == 3)
    // reads resolve identically through either path
    assert(VersionedTable.readCurrentFast(spark, dir)
      .select("id").as[Long].collect().toSet == Set(3L))
  }

  test("countFast: metadata-only, DV-narrowed, and degraded-but-correct") {
    val dir = java.nio.file.Files.createTempDirectory("vtab").toString
    def cf(v: Int) = VersionedTable.countFast(spark, dir, v)
      .as[(Long, Long, Long)].collect().head
    val base = (1L to 100L).map(i => (i, s"r$i")).toDF("id", "s")
    // v0+v1 counted commits: pure metadata, zero files scanned
    VersionedTable.commitWithCounts(base.filter(col("id") <= 60)
      .repartition(2), dir)
    VersionedTable.appendCommit(base.filter(col("id") > 60)
      .repartition(2), dir)
    assert(cf(1) == ((100L, 0L, 4L)))
    // v2 deletes 10 keys: every pre-delete file becomes scannable,
    // and the count is exact
    VersionedTable.deleteCommit(
      base.filter(col("id") % 10 === 0).select(col("id")), dir)
    assert(cf(2) == ((90L, 4L, 0L)))
    // v3 appends post-delete: its files answer from the manifest
    // while only the maskable older ones scan
    VersionedTable.appendCommit(
      (101L to 120L).map(i => (i, s"r$i")).toDF("id", "s")
        .repartition(2), dir)
    assert(cf(3) == ((110L, 4L, 2L)))
    // time travel still answers the pre-delete versions
    assert(cf(0) == ((60L, 0L, 2L)))
    // a counts-free table degrades to a full scan - correct, 0 meta
    val dir2 = java.nio.file.Files.createTempDirectory("vtab").toString
    VersionedTable.commit(base.repartition(3), dir2)
    assert(VersionedTable.countFast(spark, dir2, 0)
      .as[(Long, Long, Long)].collect().head == ((100L, 3L, 0L)))
    // the ATOMIC append carries + extends counts like the lockstep
    // one: the metadata path survives a multi-writer commit
    val dir3 = java.nio.file.Files.createTempDirectory("vtab").toString
    VersionedTable.commitWithCounts(base.repartition(2), dir3)
    VersionedTable.appendCommitAtomic(
      (101L to 110L).map(i => (i, s"r$i")).toDF("id", "s")
        .repartition(1), dir3)
    assert(VersionedTable.countFast(spark, dir3, 1)
      .as[(Long, Long, Long)].collect().head == ((110L, 0L, 3L)))
  }

  test("checkpointed resolution == chain resolution; loads = suffix") {
    val dir = java.nio.file.Files.createTempDirectory("vtab").toString
    val base = (1L to 30L).map(i => (i, s"r$i")).toDF("id", "s")
    VersionedTable.withCommitTimestamp(1000L) {
      VersionedTable.commit(base, dir)
    }
    for (v <- 1 to 9) {
      VersionedTable.withCommitTimestamp(1000L * (v + 1)) {
        VersionedTable.appendCommit(
          Seq((100L + v, s"a$v")).toDF("id", "s"), dir)
      }
      VersionedTable.maybeCheckpoint(spark, dir, every = 4)
    }
    // every 4: checkpoints land at v3 and v7
    assert(VersionedTable.checkpoints(spark, dir) == Seq(3, 7))
    assert(VersionedTable.latestCheckpoint(spark, dir).contains(7))
    // sweep: checkpointed resolution equals the chain scan everywhere,
    // and suffix loads are bounded by tip − checkpoint (+1 stop probe)
    for (ts <- Seq(1000L, 1500L, 4000L, 7999L, 8000L, 9500L, 99999L)) {
      val chain = VersionedTable.versionAsOf(spark, dir, ts)
      val (ck, loads) = VersionedTable.versionAsOfCheckpointed(
        spark, dir, ts)
      assert(ck == chain, s"ts=$ts: checkpointed $ck vs chain $chain")
      assert(loads <= 3, s"ts=$ts loaded $loads suffix manifests")
      if (ts < 8000L) assert(loads == 0,
        s"pre-checkpoint target ts=$ts must load zero manifests")
    }
    // checkpointed read == manifest read, at a checkpointed version
    // AND an ordinary one
    for (v <- Seq(3, 7, 5, 9)) {
      val a = VersionedTable.readVersion(spark, dir, v)
        .as[(Long, String)].collect().toSet
      val b = VersionedTable.readVersionCheckpointed(spark, dir, v)
        .as[(Long, String)].collect().toSet
      assert(a == b, s"v$v: checkpointed read diverged")
    }
    // the hint is never load-bearing: delete it, everything still works
    val f = new org.apache.hadoop.fs.Path(dir, "_checkpoints/_last_checkpoint")
      .getFileSystem(spark.sessionState.newHadoopConf())
    f.delete(new org.apache.hadoop.fs.Path(
      dir, "_checkpoints/_last_checkpoint"), false)
    assert(VersionedTable.latestCheckpoint(spark, dir).contains(7))
    assert(VersionedTable.versionAsOfCheckpointed(spark, dir, 5500L)
      ._1 == VersionedTable.versionAsOf(spark, dir, 5500L))
  }

  test("checkpoint carries DV state: checkpointed read applies deletes") {
    val dir = java.nio.file.Files.createTempDirectory("vtab").toString
    val base = (1L to 40L).map(i => (i, s"r$i")).toDF("id", "s")
    VersionedTable.commit(base, dir)
    VersionedTable.deleteCommit(
      base.filter(col("id") % 4 === 0).select(col("id")), dir)
    VersionedTable.checkpointCommit(spark, dir, 1)
    val viaCkpt = VersionedTable.readVersionCheckpointed(spark, dir, 1)
      .as[(Long, String)].collect().toSet
    val viaManifest = VersionedTable.readVersion(spark, dir, 1)
      .as[(Long, String)].collect().toSet
    assert(viaCkpt == viaManifest)
    assert(viaCkpt.size == 30 && !viaCkpt.exists(_._1 % 4 == 0))
  }

  test("incremental checkpoint history: later checkpoints keep the " +
      "full (version, ts) map") {
    val dir = java.nio.file.Files.createTempDirectory("vtab").toString
    VersionedTable.withCommitTimestamp(1000L) {
      VersionedTable.commit(Seq((1L, "a")).toDF("id", "s"), dir)
    }
    for (v <- 1 to 6) {
      VersionedTable.withCommitTimestamp(1000L * (v + 1)) {
        VersionedTable.appendCommit(
          Seq((10L + v, s"b$v")).toDF("id", "s"), dir)
      }
      VersionedTable.maybeCheckpoint(spark, dir, every = 3)
    }
    assert(VersionedTable.checkpoints(spark, dir) == Seq(2, 5))
    // a target far before the NEWEST checkpoint still resolves with
    // zero manifest loads — only possible if v5's checkpoint carried
    // v0/v1's history forward from v2's
    val (rv, loads) = VersionedTable.versionAsOfCheckpointed(
      spark, dir, 1500L)
    assert(rv == 0 && loads == 0, s"got v$rv with $loads loads")
  }

  test("a clone pins the version it was given while a CAS commit " +
      "races the source: stale but consistent, never torn") {
    val src = java.nio.file.Files.createTempDirectory("vtab_src").toString
    val dst = java.nio.file.Files.createTempDirectory("vtab_dst")
    java.nio.file.Files.delete(dst) // cloneCommit wants a fresh target
    val contentA = (1L to 20L).map(i => (i, s"a$i")).toDF("id", "s")
    val contentB = (1L to 5L).map(i => (i, s"b$i")).toDF("id", "s")
    VersionedTable.commit(contentA, src)
    // the race: the cloner read tip = v0, and BEFORE cloneCommit runs
    // an interloper CAS-commits v1 over the source. Manifests are
    // immutable — v0's manifest cannot change under the clone — so
    // the clone lands on exactly the v0 content it pinned.
    val pinned = VersionedTable.versions(spark, src).last
    assert(VersionedTable.commitIfUnchanged(contentB, src, 0) == 1)
    VersionedTable.cloneCommit(spark, src, dst.toString, pinned)
    val cloned = VersionedTable.readCurrent(spark, dst.toString)
      .as[(Long, String)].collect().toSet
    assert(cloned == contentA.as[(Long, String)].collect().toSet,
      "clone must see the pinned v0 content, not the racer's v1")
    // and the clone did not perturb the source's version counter: a
    // CAS committer expecting the racer's v1 still wins cleanly
    assert(VersionedTable.commitIfUnchanged(contentA, src, 1) == 2)
    // while a CAS expecting the stale base correctly aborts
    intercept[java.util.ConcurrentModificationException] {
      VersionedTable.commitIfUnchanged(contentB, src, 0)
    }
  }
}
