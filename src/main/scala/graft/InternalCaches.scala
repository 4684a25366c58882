package graft

import org.apache.spark.sql.Dataset

import scala.collection.mutable.ArrayBuffer

/** Registry for DataFrames persisted INSIDE operators (signature
  * relations, codebooks, shingle sets — relations an operator reuses
  * across join sides within one returned plan).
  *
  * The caching contract: operators persist internal relations because
  * they are read 2-3× within the plan they return; the persist handle
  * is not part of the operator's public result, so a library caller
  * could otherwise never release the storage and cached blocks would
  * accumulate for the session lifetime. Every internal persist is
  * therefore routed through [[track]], and callers release them all
  * with [[releaseAll]] once the action over the returned frame has run
  * (the bench harness does this between queries; a long-lived service
  * would call it per request). Unpersisting is always safe — a frame
  * re-referenced later silently recomputes.
  */
object InternalCaches {
  private val live = ArrayBuffer.empty[Dataset[_]]
  private val liveRdds =
    ArrayBuffer.empty[org.apache.spark.rdd.RDD[_]]

  /** Register an operator-internal persisted frame for later release.
    * Returns the frame for inline use: `track(df.persist())`. */
  def track[T <: Dataset[_]](ds: T): T = synchronized { live += ds; ds }

  /** Unpersist every tracked frame and forget them. BLOCKING on
    * purpose: the async form (unpersist(false)) lets freed blocks
    * linger while the next query's persists and sorts contend for the
    * same storage/execution memory — measured on the round-13 full
    * suite as selective 1.6–2.5× inflation of the heavy-sort queries
    * late in the run (s31 30.8 s in-suite vs 12.3 s fresh-JVM on
    * identical code/caches). Release happens between queries, outside
    * every timed region, so the blocking wait costs the harness, not
    * the measurement. */
  def releaseAll(): Unit = synchronized {
    live.foreach(ds => try ds.unpersist(true) catch { case _: Throwable => () })
    live.clear()
    liveRdds.foreach(r =>
      try r.unpersist(true) catch { case _: Throwable => () })
    liveRdds.clear()
  }

  /** Pin an operator-internal STAGE BOUNDARY: eager local checkpoint,
    * which both materializes the relation (like persist) AND truncates
    * its lineage — downstream plans see a flat scan of the
    * checkpointed rows instead of re-embedding the whole upstream
    * tree. Iterative/multi-stage operators (census pipelines, trained
    * classifiers, beam rounds) otherwise grow their logical plans
    * multiplicatively with stage count — the round-13 p9 plan was
    * 25k scan nodes / 134k formatted lines, and Catalyst + AQE replan
    * that tree at every query stage (guide §3.3: planning time itself
    * becomes the bottleneck; the fix is materializing an
    * intermediate). The checkpointed RDD is registered for
    * deterministic release in [[releaseAll]]. Fault-tolerance note:
    * a lost executor cannot recompute a truncated stage — acceptable
    * for these bounded, deterministic fixtures (re-run the query). */
  def pinStage(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val cp = df.localCheckpoint()
    org.apache.spark.sql.GraftSqlBridge.checkpointedRdd(cp)
      .foreach(r => synchronized { liveRdds += r })
    cp
  }

  /** Number of currently tracked frames (test/audit hook). */
  def trackedCount: Int = synchronized(live.size)

  /** `df.persistTracked()` = persist + register with the session-wide
    * release list — the one-token form operators use at their internal
    * persist sites. */
  implicit final class TrackedPersist[T <: Dataset[_]](private val ds: T)
      extends AnyVal {
    def persistTracked(): T = { ds.persist(); track(ds) }
  }
}
