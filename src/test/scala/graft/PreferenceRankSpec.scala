package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Events, Preference, RankEval,
  TextAnalysis}

/** Preference-data lane (p16/t55), chat assembly (p17), ranked metrics
  * (s49) and the license gate (t56) on crafted fixtures with
  * hand-computed expectations. */
class PreferenceRankSpec extends SparkSpec {
  import spark.implicits._

  // ---- preference pairs --------------------------------------------

  // group 0 = ids 0..3: rewards 4,2,2,1 → chosen 0, rejected {1,2,3}
  // group 1 = ids 8..9: equal rewards → tie, NO pairs
  private val prefDocs = Seq(
    (0L, "alpha beta gamma delta"),
    (1L, "alpha beta alpha beta"),
    (2L, "one two two two"),
    (3L, "same same same same"),
    (8L, "x y"),
    (9L, "p q")
  ).toDF("doc_id", "text")

  test("preferencePairs emits best-vs-rest with strict margins") {
    val out = Preference.preferencePairs(prefDocs, col("doc_id"),
        col("text"), groupSize = 4)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (0L, 0L, 1L, 4L, 2L, 2L),
      (0L, 0L, 2L, 4L, 2L, 2L),
      (0L, 0L, 3L, 4L, 1L, 3L)))
  }

  test("pairwiseOutcomes skips same-source and tied pairs") {
    val docs = Seq(
      (0L, "alpha beta gamma", "m1"), // reward 3
      (1L, "alpha beta", "m2"),       // reward 2
      (2L, "alpha", "m1"),            // reward 1
      (3L, "x y", "m3")               // reward 2: ties with id 1
    ).toDF("doc_id", "text", "source")
    val oc = Preference.pairwiseOutcomes(docs, col("doc_id"),
        col("text"), col("source"), groupSize = 4)
      .select("winner", "loser").as[(String, String)].collect()
    // (0,1): m1>m2; (0,3): m1>m3; (1,2): m2>m1; (2,3): m3>m1.
    // (0,2) same source, (1,3) tied — both absent.
    assert(oc.length == 4)
    assert(oc.count(_ == ("m1", "m2")) == 1)
    assert(oc.count(_ == ("m1", "m3")) == 1)
    assert(oc.count(_ == ("m2", "m1")) == 1)
    assert(oc.count(_ == ("m3", "m1")) == 1)
  }

  test("bradleyTerry orders strengths by dominance, mean stays 1e6") {
    // a beats b 3×, b beats c 3×, a beats c 1× — strict dominance
    val oc = Seq.fill(3)(("a", "b")) ++ Seq.fill(3)(("b", "c")) ++
      Seq(("a", "c"))
    val out = Preference.bradleyTerry(
        oc.toDF("winner", "loser"), iters = 8)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out("a")._1 == 4L && out("b")._1 == 3L && out("c")._1 == 0L)
    assert(out("a")._2 == 4L && out("b")._2 == 6L && out("c")._2 == 4L)
    val s = out.view.mapValues(_._3).toMap
    assert(s("a") > s("b") && s("b") > s("c"))
    assert(s("c") == 0L) // zero wins pins the MM fixed point at zero
    // renormalization keeps the mean at 1e6 micro (±1 per entity of
    // floor loss)
    val mean = s.values.sum / s.size
    assert(mean >= 999998L && mean <= 1000000L)
  }

  test("bradleyTerry is symmetric under balanced outcomes") {
    val oc = Seq(("a", "b"), ("b", "a"), ("a", "b"), ("b", "a"))
    val s = Preference.bradleyTerry(oc.toDF("winner", "loser"), 8)
      .select("entity", "strength_micro").as[(String, Long)]
      .collect().toMap
    assert(s("a") == s("b"))
  }

  // ---- chat assembly -----------------------------------------------

  test("chatAssembly keeps the longest suffix within budget") {
    def ev(id: Long, user: Long, t: Long, typ: String) =
      (id, new Timestamp(t * 1000L), user, typ, 1.0, "{}")
    val events = Seq(
      ev(1, 7, 1000, "click"), ev(2, 7, 1060, "error"),
      ev(3, 7, 1120, "view"), ev(4, 7, 1180, "purchase"),
      // 30-min gap → second session, single turn
      ev(5, 7, 4000, "click")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tokVals = events.select(
        typedLit((1L to 5L).toSeq).as("ids"))
      .select(explode(col("ids")).as("id"))
      .withColumn("tk", Tables.hashU32(col("id"), 23) % 37L + 3L)
      .as[(Long, Long)].collect().toMap
    // pick a budget that keeps exactly the last two turns of session 1
    val budget = tokVals(3L) + tokVals(4L)
    val out = Events.chatAssembly(events, gapSeconds = 1800L,
        budgetToks = budget)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._2 -> r).toMap
    val s1 = out(1L)
    assert(s1._3 == 4L) // n_turns
    assert(s1._4 == 2L) // kept: events 3 and 4 only
    assert(s1._6 == tokVals(3L) + tokVals(4L)) // kept_toks
    assert(s1._7 == 3L) // first kept event
    assert(s1._8 == 1L) // view→purchase = user→assistant flip
    val s2 = out(2L)
    assert(s2._3 == 1L && s2._4 == (
      if (tokVals(5L) <= budget) 1L else 0L))
  }

  test("chatAssembly drops a single turn larger than the budget") {
    val events = Seq((1L, new Timestamp(1000000L), 9L, "click", 1.0,
      "{}")).toDF("event_id", "ts", "user_id", "event_type", "value",
      "props")
    val row = Events.chatAssembly(events, 1800L, budgetToks = 2L)
      .select("kept_turns", "kept_toks").as[(Long, Long)].head()
    assert(row == ((0L, 0L))) // every turn costs ≥ 3 tokens
  }

  // ---- ranked metrics ----------------------------------------------

  private def ranking(rows: Seq[(Long, Long, Long)]) =
    rows.toDF("query_id", "rank", "neighbor_id")

  test("rankedMetrics scores a perfect ranking at 1e6 everywhere") {
    val t = ranking((1L to 3L).map(r => (1L, r, 100L + r)))
    val m = RankEval.rankedMetrics(t, t, k = 3)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(m == ((1L, 3L, 1000000L, 1000000L, 1000000L)))
  }

  test("rankedMetrics scores a disjoint ranking at zero") {
    val t = ranking(Seq((1L, 1L, 101L), (1L, 2L, 102L)))
    val s = ranking(Seq((1L, 1L, 201L), (1L, 2L, 202L)))
    val m = RankEval.rankedMetrics(t, s, k = 2)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(m == ((1L, 0L, 0L, 0L, 0L)))
  }

  test("rankedMetrics hand-check: one relevant at rank 2 of 2") {
    val t = ranking(Seq((1L, 1L, 101L), (1L, 2L, 102L)))
    val s = ranking(Seq((1L, 1L, 999L), (1L, 2L, 101L)))
    val m = RankEval.rankedMetrics(t, s, k = 2)
      .as[(Long, Long, Long, Long, Long)].head()
    val w = RankEval.ndcgWeights(2) // (1e6, 630930)
    assert(m._2 == 1L)
    assert(m._3 == 500000L)               // mrr = 1/2
    assert(m._4 == math.floor(
      w(1) * 1000000.0 / w(0)).toLong)    // dcg=w2, idcg=w1
    assert(m._5 == 250000L)               // ap = (1/2 prec at 2) / R=2
  }

  test("ndcgWeights are the published log2 discounts in micro") {
    val w = RankEval.ndcgWeights(3)
    assert(w(0) == 1000000L)
    assert(w(1) == math.round(1e6 / (math.log(3) / math.log(2))))
    assert(w(2) == 500000L) // log2(4) = 2
  }

  // ---- license gate ------------------------------------------------

  test("licenseClass precedence: SPDX > prose > proprietary > none") {
    val docs = Seq(
      (1L, "SPDX-License-Identifier: MIT\nAll rights reserved."),
      (2L, "Licensed under the Apache License, Version 2.0 terms"),
      (3L, "ships with the MIT License attached"),
      (4L, "GNU General Public License applies"),
      (5L, "Copyright 2024. All rights reserved."),
      (6L, "plain text, no license at all"),
      (7L, "SPDX-License-Identifier: BSD-3-Clause")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.licenseGate(docs, col("doc_id"), col("text"))
      .as[(Long, String, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == (("MIT", true))) // SPDX wins over the prose tail
    assert(out(2L) == (("Apache-2.0", true)))
    assert(out(3L) == (("MIT", true)))
    assert(out(4L) == (("GPL-3.0-only", false)))
    assert(out(5L) == (("proprietary", false)))
    assert(out(6L) == (("none", false)))
    assert(out(7L) == (("BSD-3-Clause", true)))
  }

  // ---- k-anonymity -------------------------------------------------

  test("kAnonymize releases at the finest tier clearing k") {
    // (en, web): 3 records — tier-0 group of 3 clears k=3
    // (en, books): 2 records — tier 0 fails, but (en, *) has 5 → tier 1?
    // no: tier 1 groups on (q1, q2) = (en, books) n=2 < 3 → tier 2
    // (en) n=5 ≥ 3 → tier 2. (fr, x): single → every tier < 3 → tier 3
    val rows = Seq(
      (1L, "en", "web", "a"), (2L, "en", "web", "a"),
      (3L, "en", "web", "a"),
      (4L, "en", "books", "b"), (5L, "en", "books", "c"),
      (6L, "fr", "x", "d")
    ).toDF("doc_id", "lang", "source", "bucket")
    val out = Curation.kAnonymize(rows, col("doc_id"), col("lang"),
        col("source"), col("bucket"), k = 3L)
      .as[(Long, Long, String, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == ((0L, "en|web|a", 3L)))
    assert(out(4L) == ((2L, "en|*|*", 5L)))
    assert(out(5L) == ((2L, "en|*|*", 5L)))
    assert(out(6L) == ((3L, "*|*|*", 0L)))
    // the released view is k-anonymous: every non-suppressed
    // qi_released value occurs >= k times OR generalizes a group of
    // >= k (tier counts are raw group sizes per level)
    assert(out.values.forall { case (tier, _, n) =>
      tier == 3L || n >= 3L })
  }
}
