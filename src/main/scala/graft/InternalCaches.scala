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

  /** Register an operator-internal persisted frame for later release.
    * Returns the frame for inline use: `track(df.persist())`. */
  def track[T <: Dataset[_]](ds: T): T = synchronized { live += ds; ds }

  /** Unpersist (non-blocking) every tracked frame and forget them. */
  def releaseAll(): Unit = synchronized {
    live.foreach(ds => try ds.unpersist(false) catch { case _: Throwable => () })
    live.clear()
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
