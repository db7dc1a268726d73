package graft.engine

/** Central eviction registry for the session-scoped structure memos
  * (`Graphs.cached`, `Dedup`/`Similarity`/`SimHash`/`Round8` memo
  * maps). The memos deliberately pin persisted / localCheckpointed
  * frames for reuse across a query registry run — that is their job —
  * but a long-lived session that switches fixture dirs, or a harness
  * that wants a cold-cache measurement, needs a way to drop them all:
  * each memo object registers its own clear function here on first
  * use, and [[clearAll]] evicts every initialized memo (unpersisting
  * what it can and releasing the references so checkpoint blocks
  * become GC-reclaimable).
  *
  * Nothing calls this automatically on the driver's bench path: the
  * driver benches one fixture dir per session, where pinned reuse is
  * the documented methodology (BASELINE.md). */
object Memos {
  private val clearers =
    new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()

  /** Called once from each memo object's initializer. */
  def register(clear: () => Unit): Unit = clearers.add(clear)

  /** Evict every registered session memo. Safe to call between
    * fixtures or before a cold-cache measurement; the next query
    * rebuilds what it needs. */
  def clearAll(): Unit = clearers.forEach(f => f())
}
