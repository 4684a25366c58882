package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.InternalCaches.TrackedPersist

/** Preference-data construction for RLHF/DPO training sets, plus
  * Bradley–Terry strength aggregation over pairwise outcomes.
  *
  * The pipeline shape mirrors production preference tooling: candidate
  * responses are grouped per prompt, a deterministic reward orders
  * them, best-vs-rest pairs become the (chosen, rejected) training
  * rows, and cross-model outcomes aggregate into per-model strengths
  * via the Bradley–Terry MM iteration (Hunter 2004, "MM algorithms
  * for generalized Bradley-Terry models") — the same estimator behind
  * public chat-model leaderboards.
  *
  * Determinism doctrine: the reward is an exact integer (distinct
  * whitespace-token count), every division is a single IEEE operation
  * on exactly-representable integers followed by floor, and all
  * running state (strengths) lives in micro-unit BIGINTs — both
  * engines replay the identical arithmetic, so results hash-match.
  */
object Preference {

  /** Deterministic integer reward: distinct lowercase whitespace-token
    * count — an "information density" proxy that is exactly computable
    * in both engines (no model weights in the container; the pipeline
    * around the reward is the operator under test, and any integer
    * reward column can be swapped in). */
  def reward(text: Column): Column =
    size(array_distinct(TextAnalysis.tokens(text))).cast("long")

  /** Best-vs-rest preference pairs: group candidate docs into prompt
    * groups of `groupSize` consecutive ids, pick the top doc per group
    * by (reward DESC, md5(id) ASC), and emit one (chosen, rejected)
    * row against every other group member with STRICTLY lower reward —
    * a tie is not a preference. Output: (prompt_id, chosen_id,
    * rejected_id, chosen_reward, rejected_reward, margin).
    *
    * Scale shape: one hash shuffle on prompt_id; group size is a
    * constant, so the window and the pair fan-out are O(groupSize) per
    * group independent of corpus size. */
  def preferencePairs(docs: DataFrame, idCol: Column, textCol: Column,
      groupSize: Int): DataFrame = {
    val scored = docs.select(
        idCol.as("doc_id"),
        floor(idCol / groupSize).cast("long").as("prompt_id"),
        reward(textCol).as("reward"),
        md5(idCol.cast("string")).as("tb"))
    val byGroup = Window.partitionBy(col("prompt_id"))
      .orderBy(col("reward").desc, col("tb").asc)
    val best = scored.withColumn("rk", row_number().over(byGroup))
      .filter(col("rk") === 1)
      .select(col("prompt_id"), col("doc_id").as("chosen_id"),
        col("reward").as("chosen_reward"))
    best.join(scored, Seq("prompt_id"))
      .filter(col("reward") < col("chosen_reward"))
      .select(col("prompt_id"), col("chosen_id"),
        col("doc_id").as("rejected_id"), col("chosen_reward"),
        col("reward").as("rejected_reward"),
        (col("chosen_reward") - col("reward")).as("margin"))
  }

  /** Cross-model pairwise outcomes: within each prompt group, every
    * doc pair from DIFFERENT sources with strictly different rewards
    * yields one (winner, loser) row keyed by the docs' `source`
    * ("model") labels. Equal rewards are no contest and emit nothing.
    * O(groupSize²) per group — constant fan-out, one shuffle. */
  def pairwiseOutcomes(docs: DataFrame, idCol: Column, textCol: Column,
      sourceCol: Column, groupSize: Int): DataFrame = {
    val scored = docs.select(
        idCol.as("doc_id"),
        floor(idCol / groupSize).cast("long").as("prompt_id"),
        sourceCol.as("entity"),
        reward(textCol).as("reward"))
    val a = scored.select(col("prompt_id"), col("doc_id").as("id_a"),
      col("entity").as("ent_a"), col("reward").as("r_a"))
    val b = scored.select(col("prompt_id"), col("doc_id").as("id_b"),
      col("entity").as("ent_b"), col("reward").as("r_b"))
    a.join(b, Seq("prompt_id"))
      .filter(col("id_a") < col("id_b") &&
        col("ent_a") =!= col("ent_b") && col("r_a") =!= col("r_b"))
      .select(col("prompt_id"),
        when(col("r_a") > col("r_b"), col("ent_a"))
          .otherwise(col("ent_b")).as("winner"),
        when(col("r_a") > col("r_b"), col("ent_b"))
          .otherwise(col("ent_a")).as("loser"))
  }

  /** GRPO-style group-relative advantage (Shao et al. 2024,
    * "DeepSeekMath: Pushing the Limits of Mathematical Reasoning"):
    * within each prompt group the reward is centered by the group mean
    * and scaled by the group standard deviation — the critic-free
    * advantage estimate modern RLHF recipes feed the policy update.
    *
    * Integer replay: with n = |group|, sum_r = Σ reward, the per-row
    * deviation dev = n·reward − sum_r and its group square-sum
    * S = Σ dev² are EXACT integers (no division yet; dev ≤ n·max_r so
    * well under 2^53). The advantage (r − mean)/std rewrites as
    * dev·√(n/S), computed as floor((dev·10⁶)·sqrt(n/S)): dev·10⁶ is an
    * exact integer product, n/S is one IEEE division of exact
    * integers, sqrt is the IEEE-mandated correctly-rounded root, and
    * the final product rounds once — both engines replay the identical
    * double and the floors agree. S = 0 (all rewards equal) → 0.
    *
    * Scale shape: two window passes over one hash-partitioning on
    * prompt_id (group size is a constant, so state per key is O(1));
    * no self-join, no collect. Output: (doc_id, prompt_id, reward, n,
    * dev, adv_micro). */
  def groupAdvantage(docs: DataFrame, idCol: Column, textCol: Column,
      groupSize: Int): DataFrame = {
    val byGroup = Window.partitionBy(col("prompt_id"))
    docs.select(
        idCol.as("doc_id"),
        floor(idCol / groupSize).cast("long").as("prompt_id"),
        reward(textCol).as("reward"))
      .withColumn("n", count(lit(1)).over(byGroup))
      .withColumn("sum_r", sum(col("reward")).over(byGroup))
      .withColumn("dev", col("n") * col("reward") - col("sum_r"))
      .withColumn("s2", sum(col("dev") * col("dev")).over(byGroup))
      .select(col("doc_id"), col("prompt_id"), col("reward"),
        col("n"), col("dev"),
        when(col("s2") === 0L, lit(0L))
          .otherwise(floor((col("dev") * lit(1000000L)) *
            sqrt(col("n") / col("s2")))).as("adv_micro"))
  }

  /** Rejection-sampling (best-of-n) SFT selection (Touvron et al.
    * 2023, "Llama 2", §3.2.2): per prompt group keep only the
    * top-reward response, and accept it into the SFT set iff it
    * clears an absolute reward floor AND beats the group mean by at
    * least one reward unit (n·r_best − sum_r ≥ n, exact integers — a
    * group whose candidates all tie carries no selection signal).
    *
    * mean_micro = floor(sum_r·10⁶ / n) is the one IEEE division,
    * operands exact. One shuffle on prompt_id; the per-group window
    * and aggregates are O(groupSize) = O(1) state per key. Output:
    * (prompt_id, chosen_id, chosen_reward, n, mean_micro, accepted). */
  def rejectionSample(docs: DataFrame, idCol: Column, textCol: Column,
      groupSize: Int, minReward: Long): DataFrame = {
    val byGroup = Window.partitionBy(col("prompt_id"))
    val ranked = Window.partitionBy(col("prompt_id"))
      .orderBy(col("reward").desc, col("tb").asc)
    docs.select(
        idCol.as("doc_id"),
        floor(idCol / groupSize).cast("long").as("prompt_id"),
        reward(textCol).as("reward"),
        md5(idCol.cast("string")).as("tb"))
      .withColumn("rk", row_number().over(ranked))
      .withColumn("n", count(lit(1)).over(byGroup))
      .withColumn("sum_r", sum(col("reward")).over(byGroup))
      .filter(col("rk") === 1)
      .select(col("prompt_id"), col("doc_id").as("chosen_id"),
        col("reward").as("chosen_reward"), col("n"),
        floor(col("sum_r") * lit(1000000L) / col("n"))
          .as("mean_micro"),
        (col("reward") >= minReward &&
          col("n") * col("reward") - col("sum_r") >= col("n"))
          .as("accepted"))
  }

  /** Bradley–Terry strengths from (winner, loser) outcome rows via
    * `iters` MM updates (Hunter 2004): s_i ← W_i / Σ_j N_ij/(s_i+s_j),
    * renormalized to mean 1e6 micro-units each round.
    *
    * Integer replay: strengths are micro-unit BIGINTs; each update is
    *   term_ij = floor(N_ij·1e9 / (s_i+s_j))          [one IEEE div]
    *   raw_i   = floor(W_i·1e9 / max(Σ_j term_ij, 1))
    *   s_i     = floor(raw_i·n·1e6 / max(Σ raw, 1))
    * Every numerator stays below 2^53 for N_ij, W_i up to ~9e6 (a
    * 100 TB corpus aggregates its outcome counts per (i,j) BEFORE this
    * runs, and BT is invariant to scaling all counts down by a common
    * factor if they ever approach the bound), so both engines compute
    * bit-identical doubles and the floors agree. The entity relation
    * is model-cardinality (tiny); iteration composes narrow plans over
    * it — no driver-side data loop, no collect.
    *
    * Output: (entity, wins, n_comparisons, strength_micro). */
  def bradleyTerry(outcomes: DataFrame, iters: Int): DataFrame =
    bradleyTerryFromCounts(outcomes
      .groupBy(col("winner"), col("loser"))
      .agg(count(lit(1)).as("n")), iters)

  /** [[bradleyTerry]] over PRE-AGGREGATED directed counts
    * (winner, loser, n) — the shape the q111 streaming ingest's state
    * table carries (outcome counts aggregate additively, so the
    * stream's merged state feeds the same solve as a batch pass over
    * the full outcome set). */
  def bradleyTerryFromCounts(counts: DataFrame, iters: Int)
      : DataFrame = {
    // Distributed part: the corpus-sized outcome stream aggregates to
    // ENTITY-cardinality relations (models, not documents — a handful
    // to a few hundred rows in any deployment). The MM solve then runs
    // driver-side over that metadata — the dimEnergyPermutation
    // discipline (O(entities²) collect only). A relational iteration
    // was tried first and rejected: each MM round references the
    // strengths relation ~4×, so the logical plan grows ~4^rounds and
    // Catalyst analysis itself never terminates at 8 rounds.
    val directed = counts
      .groupBy(col("winner"), col("loser"))
      .agg(sum(col("n")).as("n"))
      .collect() // ONE corpus pass; E² rows of model metadata
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val winsM = directed.groupBy(_._1).view
      .mapValues(_.map(_._3).sum).toMap
    val pairs = directed
      .map { case (w0, l0, n) =>
        (if (w0 < l0) w0 else l0, if (w0 < l0) l0 else w0, n) }
      .groupBy(p => (p._1, p._2)).toSeq
      .map { case ((a, b), g) => (a, b, g.map(_._3).sum) }
    val entities = pairs.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val nCmp = entities.map(e => e ->
      pairs.collect { case (a, b, n) if a == e || b == e => n }.sum)
      .toMap
    // floorDiv twin of the relational floor(a·b/c): one IEEE division
    // of exact longs (numerators < 2^53 by the scaling argument in
    // the scaladoc), floored — identical in Spark, DuckDB, and here
    def fdiv(num: Long, den: Long): Long =
      math.floor(num.toDouble / math.max(den, 1L)).toLong
    var s = entities.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val den = entities.map { e =>
        e -> pairs.collect {
          case (a, b, n) if a == e || b == e =>
            val o = if (a == e) b else a
            fdiv(n * 1000000000L, s(e) + s(o))
        }.sum
      }.toMap
      val raw = entities.map { e =>
        e -> fdiv(winsM.getOrElse(e, 0L) * 1000000000L, den(e))
      }.toMap
      val tot = raw.values.sum
      s = raw.map { case (e, r) =>
        e -> fdiv(r * entities.size * 1000000L, tot)
      }
    }
    val spark = counts.sparkSession
    import spark.implicits._
    entities.map(e =>
        (e, winsM.getOrElse(e, 0L), nCmp(e), s(e))).toSeq
      .toDF("entity", "wins", "n_comparisons", "strength_micro")
  }
}
