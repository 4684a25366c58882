package graft

import org.apache.spark.sql.functions._

import graft.operators.ChangeData

/** SCD2 historization and MERGE upsert semantics on hand-checked
  * changelogs. */
class ChangeDataSpec extends SparkSpec {
  import spark.implicits._

  test("scd2 collapses consecutive equal states into intervals") {
    // user 1: a,a,b,a -> three islands; user 2: single state
    val log = Seq(
      (1L, 10L, "a", 100L), (1L, 20L, "a", 101L), (1L, 30L, "b", 102L),
      (1L, 40L, "a", 103L), (2L, 5L, "x", 104L))
      .toDF("user_id", "t", "state", "event_id")
    val out = ChangeData.scd2(log, col("user_id"), col("t"), col("state"),
        col("event_id"))
      .select(col("k"), col("state"), col("n_events"),
        col("valid_from_us"), col("valid_to_us"), col("is_current"))
      .as[(Long, String, Long, Long, Option[Long], Long)]
      .collect().toSet
    assert(out == Set(
      (1L, "a", 2L, 10L, Some(30L), 0L),
      (1L, "b", 1L, 30L, Some(40L), 0L),
      (1L, "a", 1L, 40L, None, 1L),
      (2L, "x", 1L, 5L, None, 1L)))
  }

  test("scd2 breaks equal-timestamp ties by the tiebreak column") {
    val log = Seq((1L, 10L, "a", 1L), (1L, 10L, "b", 2L))
      .toDF("user_id", "t", "state", "event_id")
    val out = ChangeData.scd2(log, col("user_id"), col("t"), col("state"),
        col("event_id"))
      .select(col("state"), col("is_current"))
      .as[(String, Long)].collect().toSet
    // deterministic: a (tb=1) first, b (tb=2) current
    assert(out == Set(("a", 0L), ("b", 1L)))
  }

  test("snapshotDiff labels added/deleted/changed/unchanged per key") {
    val oldSnap = Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("doc_id", "text")
    val newSnap = Seq((2L, "b"), (3L, "X"), (4L, "d"))
      .toDF("doc_id", "text")
    val out = ChangeData.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "deleted", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("snapshotDiff: null content is a value, not an absent row") {
    val oldSnap = Seq((1L, Option.empty[String]), (2L, Some("x")),
      (3L, Some("y"))).toDF("doc_id", "text")
    val newSnap = Seq((1L, Option.empty[String]), (2L, Option.empty[String]),
      (4L, Option.empty[String])).toDF("doc_id", "text")
    val out = ChangeData.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    // 1: null→null is unchanged; 2: value→null is CHANGED (the row
    // still exists); 3: deleted; 4: added with null content
    assert(out == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "deleted", 4L -> "added"))
  }

  test("mergeLatest keeps the per-key max (ts, tiebreak) regardless of side") {
    val target = Seq((1L, 10L, 100L, "old"), (2L, 20L, 100L, "keep"))
      .toDF("k", "ts", "tb", "v")
    val updates = Seq((1L, 15L, 100L, "new"), (2L, 20L, 99L, "lose"),
      (3L, 5L, 100L, "ins")).toDF("k", "ts", "tb", "v")
    val out = ChangeData.mergeLatest(target, updates, "k", "ts", "tb")
      .select("k", "v").as[(Long, String)].collect().toMap
    // key 2: equal ts → higher tiebreak wins (the TARGET row)
    assert(out == Map(1L -> "new", 2L -> "keep", 3L -> "ins"))
  }

  test("mergeLatest full (ts, tb) tie resolves batching-independently") {
    // two DIFFERING rows tie on the whole version key — the content
    // tiebreaker must pick the same survivor however the rows are
    // split across target/updates (ADVICE r4)
    val a = Seq((1L, 10L, 100L, "alpha")).toDF("k", "ts", "tb", "v")
    val b = Seq((1L, 10L, 100L, "beta")).toDF("k", "ts", "tb", "v")
    val ab = ChangeData.mergeLatest(a, b, "k", "ts", "tb")
      .select("v").as[String].collect().toSeq
    val ba = ChangeData.mergeLatest(b, a, "k", "ts", "tb")
      .select("v").as[String].collect().toSeq
    assert(ab.length == 1 && ab == ba, s"$ab vs $ba")
  }

  test("mergeUpsert replaces rows wholesale, inserts, carries") {
    val target = Seq((1L, "seg1", 10.0), (2L, "seg2", 20.0))
      .toDF("k", "seg", "bal")
    val updates = Seq((2L, null.asInstanceOf[String], 99.0),
      (3L, "seg3", 30.0)).toDF("k", "seg", "bal")
    val out = ChangeData.mergeUpsert(target, updates, "k")
      .as[(Long, Option[String], Double, String)].collect().toSet
    assert(out == Set(
      (1L, Some("seg1"), 10.0, "carried"),
      // update-row null REPLACES the target value (MERGE, not coalesce)
      (2L, None, 99.0, "updated"),
      (3L, Some("seg3"), 30.0, "inserted")))
  }

  test("joinAggDelta + viewMergeAdd == full recompute (two-sided inserts)") {
    // A side: (key, measure); B side: (key, group). Deltas on BOTH
    // sides, including a key (30) whose A and B rows BOTH arrive in
    // the delta (the ΔA⋈ΔB term) and a group ("z") born in the delta.
    val a0 = Seq((10L, 1L), (10L, 2L), (20L, 3L)).toDF("k", "m")
    val da = Seq((10L, 4L), (30L, 5L)).toDF("k", "m")
    val b0 = Seq((10L, "x"), (20L, "y")).toDF("k", "g")
    val db = Seq((30L, "z")).toDF("k", "g")
    val v0 = a0.join(b0, Seq("k")).groupBy(col("g").as("grp"))
      .agg(count(lit(1)).as("cnt"), sum(col("m")).as("msum"))
    val dv = ChangeData.joinAggDelta(a0, da, b0, db, "k", col("g"),
      col("m"))
    val v1 = ChangeData.viewMergeAdd(v0, dv)
      .select("grp", "cnt", "msum", "delta_cnt")
      .as[(String, Long, Long, Long)].collect().toSet
    // full recompute from the final relations
    val full = a0.union(da).join(b0.union(db), Seq("k"))
      .groupBy(col("g")).agg(count(lit(1)).as("cnt"),
        sum(col("m")).as("msum"))
      .as[(String, Long, Long)].collect().toSet
    assert(v1.map(t => (t._1, t._2, t._3)) == full)
    // delta split: x gained the (10,4) row, y nothing, z is all-delta
    assert(v1.map(t => (t._1, t._4)) ==
      Set(("x", 1L), ("y", 0L), ("z", 1L)))
  }
}
