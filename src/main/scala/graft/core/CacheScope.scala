package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel
import scala.collection.mutable

/** Structural release for operator-persisted intermediates.
  *
  * Operators persist diamond-shaped subplans (consumed 2-3× inside one
  * returned lazy plan) and cannot unpersist them before the caller runs an
  * action — so the caller owns the release. The Verify/Bench harness and
  * the year-loop orchestrator honor that contract explicitly; an
  * interactive session that ignores it accumulates dead blocks until the
  * storage pool pressures real work (measured: up to 9× per-query
  * inflation late in a 54-query session).
  *
  * [[scoped]] makes the contract structural instead of disciplinary:
  *
  * {{{
  * CacheScope.scoped {
  *   DocDedup.minhashLshPairs(docs).count()   // actions run INSIDE
  * }                                          // intermediates freed here
  * }}}
  *
  * Operators route their persists through [[persisted]], which registers
  * the frame with the innermost active scope on this thread (plans are
  * built driver-side on the calling thread). Without an enclosing scope,
  * registration is a no-op and the documented caller-owns-release behavior
  * is unchanged.
  *
  * The body must CONSUME its results (run the actions) inside the scope:
  * the scope frees blocks on exit, so a lazy plan smuggled out re-computes
  * its diamonds from source on the next action — correct, just slower.
  */
object CacheScope {

  private val active = new ThreadLocal[mutable.Stack[mutable.Buffer[DataFrame]]] {
    override def initialValue(): mutable.Stack[mutable.Buffer[DataFrame]] = mutable.Stack.empty
  }

  /** Persist `df` (MEMORY_AND_DISK — every operator diamond uses the same
    * level) and register it with the innermost active scope, if any. */
  private[graft] def persisted(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    val stack = active.get()
    if (stack.nonEmpty) stack.top += p
    p
  }

  /** Run `body`; on exit unpersist every intermediate that operators
    * called within it registered. Scopes nest — each releases only its
    * own registrations. */
  def scoped[T](body: => T): T = {
    val stack = active.get()
    val frames = mutable.Buffer.empty[DataFrame]
    stack.push(frames)
    try body
    finally {
      stack.pop()
      frames.foreach(_.unpersist(blocking = false))
    }
  }
}
