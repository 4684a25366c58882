package graft

import org.apache.spark.sql.functions._

import graft.operators.Preference

/** GRPO group-relative advantages (p18) and rejection-sampling
  * best-of-n selection (p19) on crafted fixtures with hand-computed
  * expectations — including the exact-integer rewrite's floor
  * semantics and the degenerate all-tied group. */
class RlAlignmentSpec extends SparkSpec {
  import spark.implicits._

  // group 0 = ids 0..3: rewards 4,2,2,1 (distinct-token counts)
  // group 2 = ids 8..9: rewards 2,2 (tied — zero variance)
  private val docs = Seq(
    (0L, "alpha beta gamma delta"),
    (1L, "alpha beta alpha beta"),
    (2L, "one two two two"),
    (3L, "same same same same"),
    (8L, "x y"),
    (9L, "p q")
  ).toDF("doc_id", "text")

  test("groupAdvantage centers and scales by the exact-integer rule") {
    val out = Preference.groupAdvantage(docs, col("doc_id"),
        col("text"), groupSize = 4)
      .select("doc_id", "prompt_id", "reward", "n", "dev", "adv_micro")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // group 0: n=4, Σr=9, dev = 4r−9 ∈ {7,−1,−1,−5}, S = 76;
    // adv = floor(dev·10⁶·sqrt(4/76)) — hand-computed, floor toward −∞
    assert(out(0L) == (0L, 0L, 4L, 4L, 7L, 1605910L))
    assert(out(1L) == (1L, 0L, 2L, 4L, -1L, -229416L))
    assert(out(2L) == (2L, 0L, 2L, 4L, -1L, -229416L))
    assert(out(3L) == (3L, 0L, 1L, 4L, -5L, -1147079L))
    // tied group: dev = 0, S = 0 → advantage exactly 0, no NaN/null
    assert(out(8L) == (8L, 2L, 2L, 2L, 0L, 0L))
    assert(out(9L) == (9L, 2L, 2L, 2L, 0L, 0L))
  }

  test("groupAdvantage advantages sum to ~0 within every group") {
    // centering invariant: Σ dev = 0 exactly per group (integers),
    // so Σ adv_micro per group is within n·1 floor error of 0
    val sums = Preference.groupAdvantage(docs, col("doc_id"),
        col("text"), groupSize = 4)
      .groupBy("prompt_id")
      .agg(sum("dev").as("sd"), sum("adv_micro").as("sa"),
        count(lit(1)).as("n"))
      .as[(Long, Long, Long, Long)].collect()
    for ((_, sd, sa, n) <- sums) {
      assert(sd == 0L)
      assert(math.abs(sa) <= n) // floor loses < 1 micro-unit per row
    }
  }

  test("rejectionSample accepts only above-floor, above-mean bests") {
    val out = Preference.rejectionSample(docs, col("doc_id"),
        col("text"), groupSize = 4, minReward = 3L)
      .select("prompt_id", "chosen_id", "chosen_reward", "n",
        "mean_micro", "accepted")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // group 0: chosen id 0 (r=4), mean = 9/4 → 2250000 µ; 4 ≥ 3 and
    // 4·4−9 = 7 ≥ 4 → accepted
    assert(out(0L) == (0L, 0L, 4L, 4L, 2250000L, true))
    // group 2: tie broken by md5("9") < md5("8") → chosen 9; fails
    // both the floor (2 < 3) and the margin (2·2−4 = 0 < 2)
    assert(out(2L) == (2L, 9L, 2L, 2L, 2000000L, false))
  }

  test("rejectionSample margin alone rejects a tied group") {
    // floor of 0: the margin test still rejects zero-signal groups
    val out = Preference.rejectionSample(docs, col("doc_id"),
        col("text"), groupSize = 4, minReward = 0L)
      .filter(col("prompt_id") === 2L)
      .select("accepted").as[Boolean].collect()
    assert(out.toSeq == Seq(false))
  }
}
