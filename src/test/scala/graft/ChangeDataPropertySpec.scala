package graft

import org.apache.spark.sql.functions._

import graft.operators.{ChangeData, Events}

/** Randomized-but-seeded equivalence tests: the distributed CDC and
  * as-of operators must match straightforward in-memory reference
  * folds on adversarial changelogs (duplicate timestamps, null times,
  * keys with no matches, singleton islands). */
class ChangeDataPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812)

  /** Random changelog: few keys, clustered timestamps (many exact
    * collisions), few states (long islands AND singletons). */
  private def randomLog(n: Int) = Seq.tabulate(n) { i =>
    (rnd.nextInt(7).toLong, rnd.nextInt(20).toLong * 10L,
      s"s${rnd.nextInt(3)}", i.toLong)
  }

  test("scd2 equals an in-memory per-key fold on random changelogs") {
    val rows = randomLog(400)
    val out = ChangeData.scd2(
        rows.toDF("user_id", "t", "state", "event_id").repartition(5),
        col("user_id"), col("t"), col("state"), col("event_id"))
      .select(col("k"), col("state"), col("n_events"),
        col("valid_from_us"), col("valid_to_us"), col("is_current"))
      .as[(Long, String, Long, Long, Option[Long], Long)]
      .collect()

    // reference: sort each key by (t, tb), fold islands, close with next
    val expected = rows.groupBy(_._1).flatMap { case (k, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._4))
      val islands = scala.collection.mutable.ArrayBuffer
        .empty[(String, Long, Long)] // state, n, from
      for ((_, t, st, _) <- sorted) {
        if (islands.nonEmpty && islands.last._1 == st) {
          val (s0, n0, f0) = islands.last
          islands(islands.size - 1) = (s0, n0 + 1, f0)
        } else islands += ((st, 1L, t))
      }
      islands.zipWithIndex.map { case ((st, n, from), i) =>
        val to = if (i + 1 < islands.size) Some(islands(i + 1)._3) else None
        (k, st, n, from, to, if (to.isEmpty) 1L else 0L)
      }
    }
    // multiset compare: identical islands are legal (same state twice
    // at one timestamp cluster) — a Set would hide dropped duplicates
    def multi[T](xs: Iterable[T]) =
      xs.groupBy(identity).view.mapValues(_.size).toMap
    assert(multi(out.toSeq) == multi(expected))
  }

  test("native as-of equals an in-memory fold incl. ties and no-match keys") {
    val purchases = Seq.tabulate(200) { i =>
      (rnd.nextInt(9).toLong, rnd.nextInt(50).toLong + 1L, 1000L + i)
    }
    val views = Seq.tabulate(300) { i =>
      (rnd.nextInt(9).toLong, rnd.nextInt(50).toLong + 1L, 2000L + i)
    }
    def mk(rows: Seq[(Long, Long, Long)], tag: String) =
      rows.toDF("user_id", "secs", "event_id")
        .withColumn("ts", col("secs").cast("timestamp"))
        .withColumn("event_type", lit(tag)).drop("secs")
    val out = Events.asofJoinNative(
        mk(purchases, "purchase").repartition(4),
        mk(views, "view").repartition(3),
        "user_id", "ts", "event_id", "event_id")
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("asof_event_id"))
      .as[(Long, Long, Long, Option[Long])].collect().toSet

    val expected = purchases.map { case (k, t, id) =>
      val eligible = views.filter(v => v._1 == k && v._2 <= t)
      val m =
        if (eligible.isEmpty) None
        else {
          val tMax = eligible.map(_._2).max           // latest time wins,
          Some(eligible.filter(_._2 == tMax).map(_._3).max) // max id tie
        }
      (k, t * 1000000L, id, m)
    }.toSet
    assert(out == expected)
  }
}
