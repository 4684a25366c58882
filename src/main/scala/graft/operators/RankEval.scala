package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked-retrieval quality metrics — NDCG@k, MRR and AP@k of a served
  * ranking against an exact ground-truth ranking, per query. The
  * recall census (s19/s30/s37) answers "how many of the true top-k
  * came back"; this answers the leaderboard question "and in what
  * order" — the metric set every retrieval system report publishes
  * (Järvelin & Kekäläinen 2002 for NDCG).
  *
  * Integer replay doctrine: binary relevance (served item ∈ exact
  * top-k set), all per-rank constants are PRE-QUANTIZED micro-unit
  * BIGINT literals baked identically into both engines' plans
  * ([[ndcgWeights]] — the only irrational math, log2, happens once in
  * the plan BUILDER, not in either engine), and every division is a
  * single IEEE op on exactly-representable integers followed by
  * floor. Per-query outputs are exact BIGINTs, so the oracle
  * hash-compares.
  *
  * Scale shape: both inputs are top-k-per-query relations (k·|Q| rows,
  * corpus-independent); one equi-join on (query_id, neighbor_id), one
  * rank-ordered window per query, one aggregate — bounded by the
  * shortlist, never the corpus. */
object RankEval {

  /** Micro-unit DCG weight per rank 1..k: round(1e6 / log2(i+1)).
    * Computed ONCE here (driver-side, exact literals) and inlined into
    * both the Spark plan and the DuckDB oracle so the two engines
    * never each evaluate a transcendental. */
  def ndcgWeights(k: Int): Seq[Long] =
    (1 to k).map(i =>
      math.round(1e6 / (math.log(i + 1.0) / math.log(2.0))))

  /** Per-query ranked metrics of `served` against `truth` (both
    * (query_id, rank, neighbor_id), rank 1-based dense within query,
    * truth holding the exact top-k). Queries present in `truth` and
    * absent from `served` score 0 across the board. Output:
    * (query_id, n_rel, mrr6, ndcg6, ap6) — all BIGINT micro-units.
    *
    *  - mrr6  = floor(1e6 / rank of first relevant served item)
    *  - ndcg6 = floor(1e6 · DCG / IDCG), DCG = Σ rel_i·w_i with w from
    *            [[ndcgWeights]], IDCG = Σ of the first n_rel weights
    *  - ap6   = floor(Σ_{rel i} floor(1e6·prefixRel_i / i) / R),
    *            R = |truth set for the query| (≤ k) */
  def rankedMetrics(truth: DataFrame, served: DataFrame, k: Int)
      : DataFrame = {
    val w = ndcgWeights(k)
    val wPrefix = w.scanLeft(0L)(_ + _).tail // idcg for n_rel = 1..k
    // alias every join column on both sides: truth and served may be
    // the SAME plan (self-eval), and fresh exprIds are what keeps the
    // join unambiguous in that case
    val truthSet = truth.select(col("query_id").as("t_qid"),
      col("neighbor_id").as("t_id"))
    val rSize = truthSet.groupBy(col("t_qid").as("query_id"))
      .agg(count(lit(1)).as("r_total"))
    val sv = served.select(col("query_id").as("s_qid"),
      col("rank").as("rank"), col("neighbor_id").as("s_id"))
    val rel = sv
      .join(truthSet, col("s_qid") === col("t_qid") &&
        col("s_id") === col("t_id"), "left_outer")
      .select(col("s_qid").as("query_id"), col("rank"),
        when(col("t_id").isNotNull, 1L).otherwise(0L).as("rel"))
    val byRank = Window.partitionBy(col("query_id"))
      .orderBy(col("rank"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wCol = element_at(
      array(w.map(lit): _*), col("rank").cast("int"))
    val idcgCol = element_at(
      array(wPrefix.map(lit): _*), col("n_rel").cast("int"))
    val perServed = rel
      .withColumn("prefix_rel", sum(col("rel")).over(byRank))
      .withColumn("p6", floor(col("prefix_rel") * lit(1000000L) /
        col("rank")))
    val agg = perServed.groupBy(col("query_id"))
      .agg(sum(col("rel")).as("n_rel"),
        max(when(col("rel") === 1L,
          floor(lit(1000000L) / col("rank")))).as("mrr6_raw"),
        sum(col("rel") * wCol).as("dcg6"),
        sum(when(col("rel") === 1L, col("p6")).otherwise(0L))
          .as("sum_p6"))
    rSize.join(agg, Seq("query_id"), "left_outer")
      .na.fill(0L, Seq("n_rel", "dcg6", "sum_p6"))
      .select(col("query_id"), col("n_rel"),
        coalesce(col("mrr6_raw"), lit(0L)).as("mrr6"),
        when(col("n_rel") > 0,
          floor(col("dcg6") * lit(1000000L) / idcgCol))
          .otherwise(0L).cast("long").as("ndcg6"),
        floor(col("sum_p6") / col("r_total")).cast("long").as("ap6"))
  }
}
