package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/**
 * Persist-lifecycle scope for operator-internal caches.
 *
 * Several lazy operators (`nearDupPairs`, `simhashPairs`, `boilerplate`,
 * `embedNearDup`, `semanticDedup`, `quantizeEmbeddings`, the LM tables)
 * persist an intermediate frame that their returned plan consumes more
 * than once — without the barrier the expensive stage (shingling, LSH
 * folds, corpus aggregation) would run once per consumer. Because the
 * returned plan is LAZY, the operator itself can never know when the
 * caller's action has completed, so by default those caches live until
 * `spark.catalog.clearCache()` — fine for a batch job, an accumulating
 * leak for a long-lived session composing many operators.
 *
 * [[scoped]] is the explicit release hook: every frame an operator
 * persists inside the block is unpersisted (non-blocking) when the block
 * exits, success or failure. Run the ACTION inside the scope so the
 * caches are live while the plan executes and released right after:
 *
 * {{{
 * val pairs = Caches.scoped {
 *   TextOps.nearDupPairs(docs, threshold = 0.8).collect()
 * }
 * // no operator cache outlives the block
 * }}}
 *
 * Scopes nest (each block releases only its own registrations) and are
 * thread-confined: plan construction happens on the calling thread, so a
 * thread-local suffices and concurrent sessions cannot release each
 * other's caches.
 */
object Caches {

  private val active = new ThreadLocal[ArrayBuffer[DataFrame]]

  /** Persist `df`, registering it with the innermost active [[scoped]]
    * block (no-op registration when no scope is active — the pre-existing
    * plan-lifetime behavior). Operators call this instead of
    * `df.persist`. */
  private[graft] def persist(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val p = df.persist(level)
    val scope = active.get()
    if (scope != null) scope += p
    p
  }

  /** Run `f`; unpersist every frame graft operators persisted during it. */
  def scoped[T](f: => T): T = {
    val outer = active.get()
    val mine = ArrayBuffer.empty[DataFrame]
    active.set(mine)
    try f
    finally {
      if (outer != null) active.set(outer) else active.remove()
      mine.foreach(_.unpersist(false))
    }
  }
}
