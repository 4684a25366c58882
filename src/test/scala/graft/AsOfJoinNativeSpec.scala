package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.operators.Events
import graft.plans.AsOfJoinExec

/** The custom physical as-of join must be (a) planned — AsOfJoinExec
  * actually present in the executed plan, no window fallback — and
  * (b) row-identical to the composed window twin on both synthetic
  * edge cases and the real events table. */
class AsOfJoinNativeSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  GraftFunctions.installOptimizations(spark)
  import spark.implicits._

  private def mk(rows: Seq[(Long, Long, Long)], tag: String) =
    rows.toDF("user_id", "secs", "event_id")
      .withColumn("ts", col("secs").cast("timestamp"))
      .withColumn("event_type", lit(tag))
      .drop("secs")

  test("native as-of join matches hand-computed edges") {
    // left purchases: user 1 at t=10,20; user 2 at t=5; user 3 at t=50
    val left = mk(Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, 102L),
      (3L, 50L, 103L)), "purchase")
    // right views: user 1 at t=10 (tie: ids 7 and 9 -> max 9), t=15;
    // user 2 only at t=6 (after the purchase); user 4 never matches
    val right = mk(Seq((1L, 10L, 7L), (1L, 10L, 9L), (1L, 15L, 8L),
      (2L, 6L, 11L), (4L, 1L, 12L)), "view")
    val out = Events.asofJoinNative(left, right,
        "user_id", "ts", "event_id", "event_id")
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("asof_event_id"))
      .as[(Long, Long, Long, Option[Long])].collect().toSet
    assert(out == Set(
      (1L, 10000000L, 100L, Some(9L)),   // equal time is eligible; tie -> max
      (1L, 20000000L, 101L, Some(8L)),   // latest <= 20 is t=15
      (2L, 5000000L, 102L, None),        // only later views exist
      (3L, 50000000L, 103L, None)))      // no views at all for the key
  }

  test("null right-side times are consumed, not match-blockers") {
    // the null-time row sorts NULLS FIRST within the key; the merge
    // must step over it or every later eligible row is unreachable
    val left = mk(Seq((1L, 20L, 100L)), "purchase")
    val right = Seq((1L, None: Option[Long], 5L), (1L, Some(10L), 7L))
      .toDF("user_id", "secs", "event_id")
      .withColumn("ts", col("secs").cast("timestamp"))
      .withColumn("event_type", lit("view")).drop("secs")
    val out = Events.asofJoinNative(left, right,
        "user_id", "ts", "event_id", "event_id")
      .select(col("asof_event_id")).as[Option[Long]].collect().toSeq
    assert(out == Seq(Some(7L)))
  }

  test("empty right side yields all-null matches; empty left is empty") {
    val left = mk(Seq((1L, 10L, 100L)), "purchase")
    val none = mk(Seq.empty[(Long, Long, Long)], "view")
    val out = Events.asofJoinNative(left, none,
      "user_id", "ts", "event_id", "event_id")
    assert(out.count() == 1)
    assert(out.filter(col("asof_event_id").isNull).count() == 1)
    val empty = Events.asofJoinNative(none, left,
      "user_id", "ts", "event_id", "event_id")
    assert(empty.count() == 0)
  }

  test("native equals composed twin on events; AsOfJoinExec is planned") {
    val ev = Tables.events(spark, Sf0001)
    val l = ev.filter(col("event_type") === "purchase")
    val r = ev.filter(col("event_type") === "view")
    val composed = Events.asofJoin(l, r, "user_id", "ts",
      "event_id", "event_id")
    val native = Events.asofJoinNative(l, r, "user_id", "ts",
      "event_id", "event_id")
    val cRows = composed.as[(Long, Long, Long, Option[Long])]
      .collect().toSet
    val nRows = native.as[(Long, Long, Long, Option[Long])]
      .collect().toSet
    assert(nRows == cRows)
    assert(nRows.nonEmpty)
    val execPlan = native.queryExecution.executedPlan
    assert(collectFirst(execPlan) {
      case e: AsOfJoinExec => e
    }.nonEmpty, s"expected AsOfJoinExec in:\n$execPlan")
    // and the merge really replaced the window machinery
    assert(collectFirst(execPlan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty)
  }

  test("non-long time columns are rejected at plan construction") {
    // the exec's merge reads the time projection as a raw long
    // (getLong), so anything not long-backed must fail LOUDLY when the
    // node is built — not read garbage at runtime
    import org.apache.spark.sql.GraftSqlBridge
    val l = Seq((1L, 10, 100L)).toDF("k", "t", "lid") // t: IntegerType
    val r = Seq((1L, 5, 7L)).toDF("rk", "rt", "rid")
    val lp = GraftSqlBridge.logicalPlan(l)
    val rp = GraftSqlBridge.logicalPlan(r)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        n: String) = p.output.find(_.name == n).get
    val err = intercept[IllegalArgumentException] {
      graft.plans.AsOfJoinPlan(lp, rp,
        Seq(attr(lp, "k")), Seq(attr(rp, "rk")),
        attr(lp, "t"), attr(rp, "rt"))
    }
    assert(err.getMessage.contains("LongType"))
  }

  test("result is partitioning-invariant") {
    val ev = Tables.events(spark, Sf0001)
    val l = ev.filter(col("event_type") === "purchase")
    val r = ev.filter(col("event_type") === "view")
    val base = Events.asofJoinNative(l, r, "user_id", "ts",
      "event_id", "event_id").collect().toSet
    val skewed = Events.asofJoinNative(l.repartition(1),
      r.repartition(7), "user_id", "ts", "event_id", "event_id")
      .collect().toSet
    assert(base == skewed)
  }
}
