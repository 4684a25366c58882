package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture shapes: building and maintaining dimension /
  * snapshot tables from changelogs — the ingestion side of a training
  * corpus that is re-crawled and re-scored continuously.
  *
  * Both operators are pure relational plans: the SCD2 build is two
  * partitioned windows + one groupBy (shuffles on the key only, no
  * global sort), and the merge is one full-outer join — every shape
  * scales like the equivalent join/agg at 100 TB and both are
  * hash-checked against DuckDB twins.
  */
object ChangeData {

  /** SCD type-2 historization of a changelog: collapse consecutive
    * equal `state` values per key into validity intervals
    * [valid_from, valid_to), open-ended for the current state.
    *
    * Classic gaps-and-islands: a partitioned window ordered by
    * (time, tiebreak) marks state changes (`lag`), a running sum
    * numbers the islands, a groupBy collapses them, and `lead` closes
    * each interval with the next one's start. The tiebreak column
    * makes equal-timestamp changelog rows deterministic. */
  def scd2(df: DataFrame, key: Column, tsUs: Column, state: Column,
      tiebreak: Column): DataFrame = {
    val marked = df.select(key.as("k"), tsUs.as("t"), state.as("state"),
        tiebreak.as("tb"))
      .withColumn("changed",
        when(lag(col("state"), 1).over(
          Window.partitionBy(col("k")).orderBy(col("t"), col("tb")))
          === col("state"), 0L).otherwise(1L))
      .withColumn("island", sum(col("changed")).over(
        Window.partitionBy(col("k")).orderBy(col("t"), col("tb"))
          .rowsBetween(Window.unboundedPreceding, 0)))
    val islands = marked.groupBy(col("k"), col("island"))
      .agg(min(col("state")).as("state"),
        count(lit(1)).as("n_events"),
        min(col("t")).as("valid_from_us"))
    // island is monotone in (t, tb) and so breaks the tie when two
    // islands of one key START at the same timestamp — without it the
    // lead() below is ambiguous (and engine-divergent) on such keys
    val seq = Window.partitionBy(col("k"))
      .orderBy(col("valid_from_us"), col("island"))
    islands
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(seq))
      .select(col("k"), col("state"), col("n_events"),
        col("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.cast("long").as("is_current"))
  }

  /** Snapshot diff — the "what changed between two crawls" primitive:
    * one full-outer join on the key comparing content FINGERPRINTS
    * (never the contents: at 100 TB the md5s are computed map-side at
    * each scan and only 16-byte digests cross the shuffle). Returns
    * one row per key with status added/deleted/changed/unchanged. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keyCol: String, contentCol: String): DataFrame = {
    // presence is carried as its own flag — md5(NULL) is NULL, so a
    // null CONTENT must not read as an absent ROW (a key with null
    // content in both snapshots is unchanged, and a value that
    // becomes null is changed, not deleted)
    val o = oldSnap.select(col(keyCol), lit(true).as("o_present"),
      md5(col(contentCol).cast("binary")).as("o_fp"))
    val n = newSnap.select(col(keyCol), lit(true).as("n_present"),
      md5(col(contentCol).cast("binary")).as("n_fp"))
    o.join(n, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("o_present").isNull, "added")
          .when(col("n_present").isNull, "deleted")
          .when(col("o_fp") <=> col("n_fp"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Latest-wins upsert: per key, keep the row with the max
    * (tsCol, tbCol) across target ∪ updates. Unlike [[mergeUpsert]]
    * (updates authoritative), this is ORDER-INDEPENDENT: applying
    * change batches in any grouping or arrival order converges to the
    * same table, which is what lets a streaming foreachBatch apply
    * loop be restart- and replay-safe without coordination.
    *
    * Version contract: (tsCol, tbCol) SHOULD be unique per key (q65
    * satisfies it via event_id as the tiebreak column). When two
    * DIFFERING rows fully tie on it anyway, a content tiebreaker —
    * md5 over the remaining columns — picks the survivor, so the
    * result is still a pure function of the row multiset rather than
    * of how updates happened to be batched. */
  def mergeLatest(target: DataFrame, updates: DataFrame, keyCol: String,
      tsCol: String, tbCol: String): DataFrame = {
    val rest = target.columns.toSeq
      .filterNot(c => c == keyCol || c == tsCol || c == tbCol)
    val tie =
      if (rest.isEmpty) lit("") else md5(to_json(struct(rest.map(col): _*)))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(tbCol).desc, tie.desc)
    target.unionByName(updates)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1).drop("__rk")
  }

  /** MERGE-style upsert: rows of `updates` replace same-key rows of
    * `target` wholesale (update-row nulls win — MERGE replaces the row,
    * it does not coalesce columns), unmatched update keys are
    * inserted, unmatched target rows carried. Both inputs must share
    * the target's schema. One full-outer join on the key; `src` labels
    * each output row updated/inserted/carried. */
  def mergeUpsert(target: DataFrame, updates: DataFrame,
      keyCol: String): DataFrame = {
    val cols = target.columns.filter(_ != keyCol)
    val t = target.select(col(keyCol) +: lit(1L).as("t_present") +:
      cols.map(c => col(c).as(s"t_$c")): _*)
    val u = updates.select(col(keyCol) +: lit(1L).as("u_present") +:
      cols.map(c => col(c).as(s"u_$c")): _*)
    t.join(u, Seq(keyCol), "full_outer")
      .select(col(keyCol) +:
        cols.map(c => when(col("u_present").isNotNull, col(s"u_$c"))
          .otherwise(col(s"t_$c")).as(c)) :+
        when(col("u_present").isNotNull && col("t_present").isNotNull,
          lit("updated"))
          .when(col("u_present").isNotNull, lit("inserted"))
          .otherwise(lit("carried")).as("src"): _*)
  }

  /** The delta terms of an aggregate-over-join view
    *   V = γ_{grp; count, sum(measure)}(A ⋈ₖ B)
    * under insert-only deltas on BOTH sides — the textbook IVM rule
    *   (A₀∪ΔA) ⋈ (B₀∪ΔB) = A₀⋈B₀ ∪ ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB
    * so the view refresh aggregates only the three delta joins and
    * merges group-wise into the materialized V₀: the A₀⋈B₀ bulk is
    * NEVER rescanned. (Updates/deletes generalize by signed
    * multiplicities — same plan, measure negated on retractions.)
    *
    * Scale shape: each delta join shuffles (or broadcasts) a delta
    * side, sized by the change rate, not the table; the merge is a
    * full-outer join on the group key against the view, which is
    * group-cardinality-sized. */
  def joinAggDelta(a0: DataFrame, da: DataFrame, b0: DataFrame,
      db: DataFrame, key: String, grp: Column, measure: Column)
      : DataFrame = {
    val terms = da.join(b0, Seq(key))
      .unionByName(a0.join(db, Seq(key)))
      .unionByName(da.join(db, Seq(key)))
    terms.groupBy(grp.as("grp"))
      .agg(count(lit(1)).as("cnt"), sum(measure).as("msum"))
  }

  /** Merge a delta aggregate into a materialized view (both shaped
    * (grp, cnt, msum)): group-wise sum via one full-outer join —
    * O(|view| + |delta groups|), never O(base data). */
  def viewMergeAdd(v0: DataFrame, dv: DataFrame): DataFrame = {
    val t = v0.select(col("grp"), col("cnt").as("t_cnt"),
      col("msum").as("t_msum"))
    val u = dv.select(col("grp"), col("cnt").as("u_cnt"),
      col("msum").as("u_msum"))
    t.join(u, Seq("grp"), "full_outer")
      .select(col("grp"),
        (coalesce(col("t_cnt"), lit(0L)) +
          coalesce(col("u_cnt"), lit(0L))).as("cnt"),
        (coalesce(col("t_msum"), lit(0L)) +
          coalesce(col("u_msum"), lit(0L))).as("msum"),
        coalesce(col("u_cnt"), lit(0L)).as("delta_cnt"))
  }
}
