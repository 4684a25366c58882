package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Events}

/** l-diversity release gate (t58), DP noisy count release (t59) and
  * the agent tool-call trace audit (t60) on crafted fixtures. */
class PrivacyTraceSpec extends SparkSpec {
  import spark.implicits._

  // ---- l-diversity -------------------------------------------------

  // (a,x,1): 3 rows, one sensitive value → k passes, l fails → falls
  //   to tier 1 where (a,x) adds a second sensitive value
  // (b,y,1): 2 rows, 2 sensitive values → tier 0
  // (c,z,1): singleton → fails every tier → suppressed
  private val ldivRecs = Seq(
    (1L, "a", "x", "1", "s1"), (2L, "a", "x", "1", "s1"),
    (3L, "a", "x", "1", "s1"), (4L, "a", "x", "2", "s2"),
    (5L, "b", "y", "1", "s1"), (6L, "b", "y", "1", "s2"),
    (7L, "c", "z", "1", "s1")
  ).toDF("id", "q1", "q2", "q3", "sv")

  test("lDiversityRelease demotes sensitive-homogeneous classes") {
    val out = Curation.lDiversityRelease(ldivRecs, col("id"),
        col("q1"), col("q2"), col("q3"), col("sv"), k = 2L, l = 2L)
      .as[(Long, Long, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // ids 1-3: finest class is 3-anonymous but 1-diverse → tier 1,
    // where (a,x) has n=4, l=2
    for (i <- 1L to 3L)
      assert(out(i) == (i, 1L, "a|x|*", 4L, 2L))
    // id 4 shares (a,x) tier-1 release
    assert(out(4L) == (4L, 1L, "a|x|*", 4L, 2L))
    // ids 5-6: fully diverse finest class → tier 0
    assert(out(5L) == (5L, 0L, "b|y|1", 2L, 2L))
    assert(out(6L) == (6L, 0L, "b|y|1", 2L, 2L))
    // id 7: singleton everywhere → suppressed
    assert(out(7L) == (7L, 3L, "*|*|*", 0L, 0L))
  }

  // ---- DP release --------------------------------------------------

  test("dpNoiseThresholds is a valid symmetric inverse CDF") {
    val ths = Curation.dpNoiseThresholds
    assert(ths.map(_._1) == (-8 to 8))
    assert(ths.map(_._2) == ths.map(_._2).sorted)
    assert(ths.map(_._2).distinct.size == 17)
    assert(ths.last._2 == 4294967296L)
    // dyadic symmetry: P(noise ≤ −1) == P(noise ≥ 1) exactly on the
    // weight grid ⇒ the −1 threshold and the 2³²−(0-threshold) gap
    // bracket the same mass (255/766 each side)
    val at = ths.toMap
    assert(at(-1) == (BigInt(255) * BigInt(4294967296L) / 766).toLong)
  }

  test("dpNoise maps grid extremes and center correctly") {
    val u = Seq(0L, 2147483648L, 4294967295L).toDF("u")
    val got = u.select(Curation.dpNoise(col("u")).as("nz"))
      .as[Long].collect().toSeq
    assert(got == Seq(-8L, 0L, 8L)) // CDF(center) lands in the 0 arm
  }

  test("dpRelease is deterministic, clamped, and count-preserving") {
    val recs = (0L until 400L)
      .map(i => (i, "g" + (i % 3), "h" + (i % 2)))
      .toDF("id", "a", "b")
    def run() = Curation.dpRelease(recs, col("a"), col("b"), seed = 7)
      .as[(String, String, Long, Long, Long)].collect().toSet
    val out = run()
    assert(out == run()) // PRF noise: replay-identical
    assert(out.size == 6)
    for ((_, _, nTrue, noise, released) <- out) {
      assert(noise >= -8L && noise <= 8L)
      assert(released == math.max(nTrue + noise, 0L))
    }
    assert(out.toSeq.map(_._3).sum == 400L) // true counts partition
  }

  // ---- trace audit -------------------------------------------------

  private def ev(id: Long, user: Long, sec: Long, typ: String,
      props: String) =
    (id, new Timestamp(sec * 1000L), user, typ, props)

  // user 1, one session: call/result ok, dangling call (call follows
  // call), bad-arg call (k=90), orphan result (result after result),
  // one non-protocol event; then a gap > 1800 s opens session 2 with
  // a lone (dangling) call.
  // user 2: a single well-formed call/result exchange.
  private val traceEvents = Seq(
    ev(1L, 1L, 0L, "click", """{"k": 5}"""),
    ev(2L, 1L, 10L, "view", """{"k": 5}"""),
    ev(3L, 1L, 20L, "click", """{"k": 90}"""),
    ev(4L, 1L, 30L, "click", """{"k": 7}"""),
    ev(5L, 1L, 40L, "view", """{"k": 7}"""),
    ev(6L, 1L, 50L, "view", """{"k": 7}"""),
    ev(7L, 1L, 60L, "purchase", """{"k": 1}"""),
    ev(8L, 1L, 5000L, "click", """{"k": 2}"""),
    ev(9L, 2L, 0L, "click", """{"k": 11}"""),
    ev(10L, 2L, 5L, "view", """{"k": 11}""")
  ).toDF("event_id", "ts", "user_id", "event_type", "props")

  test("traceAudit counts dangling calls, orphan results, bad args") {
    val out = Events.traceAudit(traceEvents, gapSeconds = 1800L,
        argLimit = 80L)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // user 1 session 1: 6 protocol events; e3 dangles (next is a
    // call) AND has a bad arg; e6 orphans (prev is a result)
    assert(out((1L, 1L)) ==
      (1L, 1L, 6L, 3L, 3L, 1L, 1L, 1L, false))
    // user 1 session 2: the lone call dangles
    assert(out((1L, 2L)) ==
      (1L, 2L, 1L, 1L, 0L, 1L, 0L, 0L, false))
    // user 2: clean exchange
    assert(out((2L, 1L)) ==
      (2L, 1L, 2L, 1L, 1L, 0L, 0L, 0L, true))
  }

  test("traceAudit missing arg key is a schema violation") {
    val out = Events.traceAudit(Seq(
        ev(1L, 9L, 0L, "click", """{"x": 1}"""),
        ev(2L, 9L, 5L, "view", """{"x": 1}""")
      ).toDF("event_id", "ts", "user_id", "event_type", "props"),
      gapSeconds = 1800L, argLimit = 80L)
      .select("bad_args", "well_formed")
      .as[(Long, Boolean)].collect().toSeq
    assert(out == Seq((1L, false)))
  }
}
