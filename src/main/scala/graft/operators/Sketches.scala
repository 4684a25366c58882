package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.InternalCaches.TrackedPersist

/** Distributed sketches (SURVEY §7's "custom operator" slot c —
  * compose existing ops where semantics allow): a deterministic
  * HyperLogLog distinct-count sketch built from md5-derived hashes and
  * pure integer register math, so — unlike `approx_count_distinct`
  * (whose HLL++ registers ride partition-order-dependent internals and
  * engine-private hashing) — the whole sketch is bit-reproducible in
  * DuckDB and therefore oracle-checkable.
  *
  * Scale shape (the entire point of a sketch): one scan, one
  * (column, register)-keyed groupBy with map-side partial max — at
  * 100 TB the shuffle carries at most `columns × m` rows of two longs
  * each, regardless of input size. Registers also MERGE by max, so
  * per-partition / per-day sketches can be combined without rescanning
  * (the property HLL was designed for).
  *
  * Determinism discipline:
  *  - register index = low `p` bits of the md5-u32; rank ρ = trailing
  *    zeros of the remaining bits + 1 — computed as
  *    `bit_count((h2 & -h2) - 1) + 1`, pure integer ops identical in
  *    both engines (no log2(), whose last-ulp rounding differs).
  *  - the harmonic sum Σ 2^(-ρ_max) is accumulated as exact integers in
  *    units of 2^-32 (`2^(32-ρ_max)` per register) — order-independent,
  *    where a float sum would carry partition-order ulp noise.
  *  - the raw-estimate constant α_m·m² is materialized ONCE as a Scala
  *    double literal ([[alphaM2]]) and textually embedded in the oracle,
  *    so both engines start the final division from the same bits; the
  *    small-range linear-counting branch quantizes its ln() to
  *    micro-nats (the same transcendental-granularity assumption the
  *    tf-idf and unigram-LM oracles rely on).
  */
object Sketches {

  /** α_m · m² for the standard HLL bias correction (Flajolet et al.
    * 2007): α_m = 0.7213 / (1 + 1.079/m) for m ≥ 128. Exposed so the
    * oracle SQL can embed the identical double literal. */
  def alphaM2(m: Int): Double = {
    require(m >= 128, s"alpha constant needs m >= 128, got $m")
    0.7213 / (1.0 + 1.079 / m) * m.toDouble * m.toDouble
  }

  /** The native-aggregate route to the same sketch: one Column whose
    * value is struct(v_zero, sum_int, est_hll), computed by
    * [[graft.functions.HllSketchAgg]] with register/estimator math
    * bit-identical to the relational path — `m`-byte partials merged
    * by bytewise max instead of a register-file groupBy. */
  def hllAggNative(k: Column, p: Int = 8, seed: Int = 5): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(
      graft.functions.HllSketchAgg(GraftSqlBridge.expression(k), p, seed)
        .toAggregateExpression())
  }

  /** THE single definition of the register math: adds (bucket, rho)
    * to a frame carrying a non-null string key column `k`. Every
    * sketch topology (global, multi-column, per-group, streaming)
    * derives from this — edit it in one place or not at all. */
  private def withRegCols(df: DataFrame, p: Int, seed: Int): DataFrame = {
    val m = 1 << p
    df.withColumn("h", Tables.hashU32(col("k"), seed))
      .withColumn("bucket", pmod(col("h"), lit(m.toLong)))
      .withColumn("h2", floor(col("h") / m).cast("long"))
      // rho: trailing zeros of the non-index bits + 1; all-zero suffix
      // (h2 = 0) saturates at 32-p+1
      .withColumn("rho", when(col("h2") === 0, lit((33 - p).toLong))
        .otherwise((expr("bit_count((h2 & -h2) - 1)") + 1).cast("long")))
  }

  /** THE single definition of the estimator: closes a SPINE-FILLED
    * register file (one row per (group key?, bucket) with `maxrho`,
    * empty registers = 0) to (…, v_zero, sum_int, est_hll). Harmonic
    * sum as exact integers in 2^-32 units; raw estimate from the
    * shared α·m² literal; linear-counting branch quantized to
    * micro-nats. `groupCols` empty = one global row. */
  private def closeEstimate(filled: DataFrame, p: Int,
      groupCols: Seq[String]): DataFrame = {
    val m = 1 << p
    val mD = m.toDouble
    val agg = filled.groupBy(groupCols.map(col): _*)
      .agg(sum(pow(lit(2.0), lit(32L) - col("maxrho")).cast("long"))
          .as("sum_int"),
        sum(when(col("maxrho") === 0, 1L).otherwise(0L)).as("v_zero"))
    val raw = lit(alphaM2(m)) * lit(4294967296.0) / col("sum_int")
    val lc = lit(mD) *
      round(log(lit(mD) / col("v_zero")) * 1e6).cast("long") / lit(1e6)
    agg.withColumn("est_hll", round(
      when(raw <= lit(2.5 * mD) && col("v_zero") > 0, lc).otherwise(raw),
      4))
  }

  /** Per-row HLL register coordinates (bucket, rho) for a key column —
    * the raw material any aggregation topology can max() over: batch
    * groupBy, per-group sketches, or a STREAMING aggregate (max is
    * order-independent, so incremental register maintenance is
    * deterministic). Feed the aggregated (bucket, maxrho) file to
    * [[estimateFromRegisters]]. */
  def hllRegisters(df: DataFrame, keyCol: Column, p: Int = 8,
      seed: Int = 5): DataFrame = {
    require(p >= 7 && p <= 16, s"p=$p out of range")
    withRegCols(df.select(keyCol.cast("string").as("k"))
        .filter(col("k").isNotNull), p, seed)
      .select(col("bucket"), col("rho"))
  }

  /** Distinct-count estimate from an aggregated (bucket, maxrho)
    * register file (missing buckets = empty registers). Returns one
    * row (v_zero, sum_int, est_hll) — the closing step shared by the
    * batch, grouped, and streaming sketch paths. */
  def estimateFromRegisters(regs: DataFrame, p: Int = 8): DataFrame = {
    val spark = regs.sparkSession
    val m = 1 << p
    val spine = spark.range(m).select(col("id").as("bucket"))
    val filled = spine.join(regs, Seq("bucket"), "left")
      .na.fill(0L, Seq("maxrho"))
    closeEstimate(filled, p, Nil)
      .select(col("v_zero"), col("sum_int"), col("est_hll"))
  }

  /** Per-GROUP HLL distinct estimates (e.g. distinct users per event
    * type): one scan, registers keyed by (group, bucket) — at any
    * corpus size the shuffle carries ≤ groups×m rows. Returns one row
    * per group: (grp, exact_nd, v_zero, sum_int, est_hll). */
  def hllDistinctByGroup(df: DataFrame, groupCol: Column, keyCol: Column,
      p: Int = 8, seed: Int = 5): DataFrame = {
    require(p >= 7 && p <= 16, s"p=$p out of range")
    val spark = df.sparkSession
    val m = 1 << p
    val melted = df.select(groupCol.cast("string").as("grp"),
        keyCol.cast("string").as("k"))
      .filter(col("grp").isNotNull && col("k").isNotNull)
    val regs = withRegCols(melted, p, seed)
      .groupBy(col("grp"), col("bucket"))
      .agg(max(col("rho")).as("maxrho"))
    val spine = melted.select(col("grp")).distinct().crossJoin(
      spark.range(m).select(col("id").as("bucket")))
    val filled = spine.join(regs, Seq("grp", "bucket"), "left")
      .na.fill(0L, Seq("maxrho"))
    val exact = melted.groupBy(col("grp"))
      .agg(countDistinct(col("k")).as("exact_nd"))
    closeEstimate(filled, p, Seq("grp"))
      .join(exact, Seq("grp"))
      .select(col("grp"), col("exact_nd"), col("v_zero"), col("sum_int"),
        col("est_hll"))
  }

  /** HLL distinct-count estimates for several columns in ONE pass.
    * `cols` = (label, column) pairs; each column is hashed as its
    * string rendering (safe for strings and integrals — the md5 parity
    * rule). Returns one row per label:
    * (cname, exact_nd, v_zero, sum_int, est_hll) where exact_nd is the
    * exact companion count (for error audit; drop it at true scale),
    * v_zero = empty registers, sum_int = Σ 2^(32-ρ_max) in 2^-32 units,
    * est_hll = the corrected estimate rounded to 4 decimals. */
  def hllDistinct(df: DataFrame, cols: Seq[(String, Column)], p: Int = 8,
      seed: Int = 5): DataFrame = {
    require(p >= 7 && p <= 16, s"p=$p out of range (alpha needs m >= 128)")
    val spark = df.sparkSession
    val m = 1 << p
    // melt: (cname, key-as-string) — one scan covers every column
    val melted = df.select(explode(array(cols.map { case (n, c) =>
        struct(lit(n).as("cname"), c.cast("string").as("k"))
      }: _*)).as("kv"))
      .select(col("kv.cname").as("cname"), col("kv.k").as("k"))
      .filter(col("k").isNotNull)
    val regs = withRegCols(melted, p, seed)
      .groupBy(col("cname"), col("bucket"))
      .agg(max(col("rho")).as("maxrho"))
    // register spine from the LITERAL label list (not the data): every
    // (label, bucket) slot exists even for an all-null column
    import spark.implicits._
    val spine = cols.map(_._1).toDF("cname").crossJoin(
      spark.range(m).select(col("id").as("bucket")))
    val filled = spine.join(regs, Seq("cname", "bucket"), "left")
      .na.fill(0L, Seq("maxrho"))
    val exact = melted.groupBy(col("cname"))
      .agg(countDistinct(col("k")).as("exact_nd"))
    closeEstimate(filled, p, Seq("cname"))
      .join(exact, Seq("cname"))
      .select(col("cname"), col("exact_nd"), col("v_zero"), col("sum_int"),
        col("est_hll"))
  }

  /** The mergeability property as one oracle-checked plan — the
    * "combine per-day sketches without rescanning" claim: per-batch
    * register files are built INDEPENDENTLY (groupBy (batch, bucket)
    * max), merged by register max alone (groupBy bucket — no access to
    * the underlying keys), and closed with the shared estimator. The
    * result is provably identical to sketching the union directly,
    * which is exactly what the oracle checks. Returns one row:
    * (n_batches, v_zero, sum_int, est_hll). */
  def hllMergeAcrossGroups(df: DataFrame, groupCol: Column, keyCol: Column,
      p: Int = 8, seed: Int = 5): DataFrame = {
    require(p >= 7 && p <= 16, s"p=$p out of range")
    val melted = df.select(groupCol.cast("string").as("grp"),
        keyCol.cast("string").as("k"))
      .filter(col("grp").isNotNull && col("k").isNotNull)
    val batchRegs = withRegCols(melted, p, seed)
      .groupBy(col("grp"), col("bucket"))
      .agg(max(col("rho")).as("maxrho"))
    val merged = batchRegs.groupBy(col("bucket"))
      .agg(max(col("maxrho")).as("maxrho"))
    val nb = melted.agg(countDistinct(col("grp")).as("n_batches"))
    estimateFromRegisters(merged, p).crossJoin(broadcast(nb))
      .select(col("n_batches"), col("v_zero"), col("sum_int"),
        col("est_hll"))
  }

  /** Fixed-bin histogram quantile estimates (the deterministic stand-in
    * for a t-digest, which is merge-order-dependent and so can never be
    * oracle-checked): one scan bins every value into `nBins` equal-width
    * buckets between the column min and max, a WINDOW OVER ≤ nBins ROWS
    * (bounded input — never the relation) accumulates the CDF, and each
    * requested quantile reads the first bin whose cumulative count
    * reaches q·n, reporting the bin's upper edge. Error is bounded by
    * the bin width; histograms from different partitions/days merge by
    * adding counts. Returns (q, bin, est_value) per quantile. */
  /** KMV (k-minimum-values / Theta-style) sketch SET OPERATIONS —
    * the capability HLL lacks: union AND intersection estimates for
    * every pair of groups. Per group, keep the k smallest distinct
    * md5-u32 hashes of the key (one window per group, k-bounded by
    * WindowGroupLimit). For a pair: the union sketch is the k
    * smallest of the merged hash sets; θ = its kth value; the
    * intersection estimate counts shared hashes ≤ θ scaled by the
    * union estimate — the standard KMV coincidence estimator.
    * Estimator arithmetic is ONE double division + round (engine-
    * identical), then integer math only, so every estimate is
    * hash-checkable. At scale: sketches are k rows per group — the
    * pair stage handles g²·k rows of longs, never the corpus.
    * Returns (type_a, type_b, n_union_mink, union_est, n_inter_mink,
    * inter_est). */
  def kmvSetOps(df: DataFrame, groupCol: Column, keyCol: Column,
      k: Int = 64, seed: Int = 97): DataFrame = {
    val h = df.select(groupCol.as("t"), keyCol.as("u"))
      .filter(col("u").isNotNull) // a null key is not a set member —
      // and its null hash would sort NULLS FIRST into rank 1 in Spark
      // but NULLS LAST in DuckDB, silently corrupting every sketch
      .distinct()
      .select(col("t"), Tables.hashU32(col("u"), seed).as("hv"))
      .distinct() // u32 collisions within a group collapse (both engines)
    val w = Window.partitionBy(col("t")).orderBy(col("hv"))
    val mink = h.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k).select(col("t"), col("hv"))
      .persistTracked() // both sides of the pair stage + intersection
    val types = mink.select(col("t")).distinct()
    val pairs = types.select(col("t").as("ta"))
      .crossJoin(broadcast(types.select(col("t").as("tb"))))
      .filter(col("ta") < col("tb"))
    val unioned = pairs
      .join(mink.select(col("t").as("ta"), col("hv")), Seq("ta"))
      .select(col("ta"), col("tb"), col("hv"))
      .union(pairs
        .join(mink.select(col("t").as("tb"), col("hv")), Seq("tb"))
        .select(col("ta"), col("tb"), col("hv")))
      .distinct()
    val wu = Window.partitionBy(col("ta"), col("tb"))
      .orderBy(col("hv"))
    val stats = unioned.withColumn("rk", row_number().over(wu))
      .filter(col("rk") <= k)
      .groupBy(col("ta"), col("tb"))
      .agg(max(col("hv")).as("theta"),
        count(lit(1)).as("n_union_mink"))
      .withColumn("union_est",
        when(col("n_union_mink") < k, col("n_union_mink"))
          .otherwise(round(lit((k - 1).toDouble) * 4294967296.0
            / greatest(col("theta"), lit(1L))).cast("long")))
    val inter = mink.select(col("t").as("ta"), col("hv"))
      .join(mink.select(col("t").as("tb"), col("hv")), Seq("hv"))
      .filter(col("ta") < col("tb"))
      .join(stats.select(col("ta"), col("tb"), col("theta")),
        Seq("ta", "tb"))
      .filter(col("hv") <= col("theta"))
      .groupBy(col("ta"), col("tb"))
      .agg(count(lit(1)).as("n_inter_mink"))
    // coincidence estimator divides by the union sketch's ACTUAL size
    // min(k, |union|) — dividing by k would underestimate exactly in
    // the unsaturated regime where the sketch should be exact
    stats.join(inter, Seq("ta", "tb"), "left_outer")
      .na.fill(0L, Seq("n_inter_mink"))
      .select(col("ta").as("type_a"), col("tb").as("type_b"),
        col("n_union_mink"), col("union_est"), col("n_inter_mink"),
        floor(col("n_inter_mink") * col("union_est")
          / col("n_union_mink")).cast("long").as("inter_est"))
  }

  def histogramQuantiles(df: DataFrame, valueCol: Column, nBins: Int,
      quantiles: Seq[Double]): DataFrame = {
    require(nBins > 0 && quantiles.nonEmpty, s"nBins=$nBins")
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(valueCol.cast("double").as("x"))
      .filter(col("x").isNotNull)
    val bounds = v.agg(min(col("x")).as("lo"), max(col("x")).as("hi"),
      count(lit(1)).as("n"))
    val binned = v.crossJoin(broadcast(bounds))
      .withColumn("bin", when(col("hi") === col("lo"), 0L)
        .otherwise(least(lit((nBins - 1).toLong),
          floor((col("x") - col("lo")) /
            ((col("hi") - col("lo")) / nBins)).cast("long"))))
      .groupBy(col("bin")).agg(count(lit(1)).as("c"))
    // CDF over the ≤ nBins histogram rows via a bounded θ-self-join
    // (≤ nBins² tiny tuples) instead of an empty-partition window —
    // same cumulative sums, no WindowExec WARN polluting the logs
    val cum = binned.as("b1")
      .join(broadcast(binned.as("b2")), col("b2.bin") <= col("b1.bin"))
      .groupBy(col("b1.bin").as("bin"))
      .agg(sum(col("b2.c")).as("cum"))
      .crossJoin(broadcast(bounds))
    val qdf = quantiles.toDF("q")
    cum.join(broadcast(qdf), col("cum") >= col("q") * col("n"))
      .groupBy(col("q"))
      .agg(min(col("bin")).as("bin"), first(col("lo")).as("lo"),
        first(col("hi")).as("hi"))
      .select(col("q"), col("bin"),
        round(when(col("hi") === col("lo"), col("lo"))
          .otherwise(col("lo") +
            (col("bin") + 1) * ((col("hi") - col("lo")) / nBins)), 6)
          .as("est_value"))
  }

  /** The CMS register positions of `keyCol`: one (j, pos) row per
    * hash row — the ONE place the position hash lives (registers,
    * probes, and the relational top-k all agree by construction). */
  private def cmsPositions(df: DataFrame, keyCol: Column, d: Int,
      w: Int, seed: Int): DataFrame = df
    .withColumn("j", explode(sequence(lit(0), lit(d - 1))))
    .withColumn("pos", pmod(
      Tables.hashU32(concat_ws("|", keyCol, col("j")), seed),
      lit(w.toLong)))

  /** Count-min REGISTER maintenance from a raw (possibly streaming)
    * key relation: each arriving key increments one register per hash
    * row, so the register file is a single order-independent sum
    * aggregate — legal as a streaming `complete`-mode aggregate and
    * deterministic under any arrival order (the counts twin of
    * [[hllRegisters]]). d·w longs of state regardless of stream
    * length; the d-way explode of the stream is the honest streaming
    * cost (exact pre-counting would need a second, disallowed,
    * streaming aggregate). Probe with [[cmsProbe]]. */
  def cmsRegisters(df: DataFrame, keyCol: Column, d: Int = 4,
      w: Int = 512, seed: Int = 333): DataFrame =
    cmsPositions(df.select(keyCol.cast("string").as("k")), col("k"),
      d, w, seed)
      .groupBy(col("j"), col("pos"))
      .agg(count(lit(1)).as("reg"))

  /** Probe a register file from [[cmsRegisters]] for the keys in
    * `cand` (string column `k`, other columns carried through):
    * est = min over the d row registers the key hashes to. A key the
    * register file never saw reads its registers as 0 (left join +
    * coalesce) — the CMS contract; an inner join would silently drop
    * unseen keys, or overestimate them from a colliding subset. */
  def cmsProbe(regs: DataFrame, cand: DataFrame, d: Int = 4,
      w: Int = 512, seed: Int = 333): DataFrame = {
    val carry = cand.columns.map(col)
    cmsPositions(cand, col("k"), d, w, seed)
      .join(regs, Seq("j", "pos"), "left_outer")
      .withColumn("reg", coalesce(col("reg"), lit(0L)))
      .groupBy(carry: _*)
      .agg(min(col("reg")).as("est_c"))
  }

  /** Count-min sketch heavy-hitter estimates: `d` hash rows × `w`
    * columns of integer counts (md5-positioned, bit_or-free plain sums
    * — order-independent, mergeable by addition), probed here for the
    * `topK` exact-top tokens so the oracle can verify the register
    * math AND the one-sided error (est ≥ exact always; ≤ exact +
    * 2n/w with probability 1 - 2^-d). The register file is d·w longs
    * regardless of corpus size — the CMS contract. Returns
    * (token, exact_c, est_c). */
  def countMinTopK(docs: DataFrame, idCol: Column, textCol: Column,
      d: Int = 4, w: Int = 512, topK: Int = 20,
      seed: Int = 333): DataFrame = {
    require(d > 0 && w > 0 && topK > 0, s"d=$d w=$w topK=$topK")
    val tok = docs.select(TextAnalysis.tokens(textCol).as("toks"))
      .select(explode(col("toks")).as("tok"))
    val counts = tok.groupBy(col("tok")).agg(count(lit(1)).as("exact_c"))
    // exact top-k (count desc, token asc) — TakeOrderedAndProject,
    // never a single-partition window
    val top = PipelineOps.rankedTopK(counts,
        Seq(col("exact_c").desc, col("tok").asc), topK, "rk")
      .drop("rk")
    def positions(df: DataFrame): DataFrame =
      cmsPositions(df, col("tok"), d, w, seed)
    // register build rides the exact counts relation (vocab-sized),
    // not the token stream — same registers, d× less explode
    val cms = positions(counts)
      .groupBy(col("j"), col("pos")).agg(sum(col("exact_c")).as("reg"))
    positions(top)
      .join(cms, Seq("j", "pos"))
      .groupBy(col("tok"), col("exact_c"))
      .agg(min(col("reg")).as("est_c"))
      .select(col("tok"), col("exact_c"), col("est_c"))
  }
}
