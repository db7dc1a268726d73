package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** Central registry for the session-scoped structure memos
  * (`Graphs`, `Dedup`/`Similarity`/`SimHash`/`Round8`/... stores).
  * The memos deliberately pin persisted / localCheckpointed frames
  * for reuse across a query registry run — that is their job — but
  * pinned storage needs two controls:
  *
  *  1. [[clearAll]] — full eviction, for a harness that switches
  *     fixture dirs or wants a cold-cache measurement. Nothing calls
  *     it automatically on the driver's bench path: the driver
  *     benches one fixture dir per session, where pinned reuse is the
  *     documented methodology (BASELINE.md).
  *  2. A BYTE BUDGET (r15, VERDICT r14 task 4) — the memo set grows
  *     with the fixture (~347 MB at sf0.1, ~12 GB at sf1 per
  *     SCALING.md), and an unbounded session eventually outgrows the
  *     JVM. Every memo map is a [[Store]]; each ADMISSION checks the
  *     block manager's total pinned bytes against [[budgetBytes]]
  *     and evicts least-recently-HIT entries across ALL stores until
  *     the total fits (never the entry just admitted). Eviction is a
  *     real release — CacheManager entry AND any checkpoint RDD
  *     blocks in the frame's plan (`Dataset.unpersist` alone leaves
  *     the latter to ContextCleaner GC, the ADVICE-r14 leak) — and a
  *     later re-miss simply rebuilds (`MemoBudgetSpec` proves it).
  *
  * Eviction-safety contract: an evicted checkpointed frame is
  * unreadable (its lineage was truncated at materialization), so
  * handed-out memo frames must be consumed within the query that
  * fetched them — which the registry convention guarantees: every
  * access goes through `getOrElseUpdate` (bumping the LRU clock), so
  * the frames a running query depends on are always the NEWEST-hit
  * entries and are evicted last; queries materialize their result
  * before returning. A budget small enough to evict a same-query
  * dependency mid-build degrades persisted deps to lineage recompute
  * and is out of contract for checkpointed ones — set the budget
  * above the largest single query's working set (the default, half
  * the driver heap, is two orders above it at every measured SF). */
object Memos {
  private val clearers =
    new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()

  /** Called once from each memo object's initializer. */
  def register(clear: () => Unit): Unit = clearers.add(clear)

  /** Evict every registered session memo. Safe to call between
    * fixtures or before a cold-cache measurement; the next query
    * rebuilds what it needs. */
  def clearAll(): Unit = clearers.forEach(f => f())

  // ------------------------------------------------------------------
  // r15: byte-budgeted stores
  // ------------------------------------------------------------------

  /** Conf key for the memo byte budget (default: half the driver
    * JVM's max heap — in local mode the one JVM holds every block). */
  val BudgetConf = "spark.graft.memoBudgetBytes"

  /** The session's memo byte budget. */
  def budgetBytes(s: SparkSession): Long =
    s.conf.getOption(BudgetConf).map(_.toLong)
      .getOrElse(Runtime.getRuntime.maxMemory() / 2)

  /** Conf key for the WORKING-SET GUARD: the N newest-hit entries are
    * never eviction victims. A query fetches its memo frames over
    * several getOrElseUpdate calls and only then runs jobs over them;
    * pure LRU under an undersized budget can evict an already-fetched
    * checkpointed frame before the job reads it, and a checkpoint's
    * lineage is truncated — the read then dies with
    * CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND (observed at sf10 under a
    * deliberately out-of-contract 1.5 GB budget, r16). Keeping the
    * newest N resident turns that hard failure into a bounded
    * overshoot: the session can exceed the budget by at most the N
    * newest entries' bytes — which the contract already requires the
    * budget to accommodate (it must clear the largest single query's
    * working set). Default 8 covers the deepest current query (the
    * signed-LSH family touches ≤ 7 entries per invocation). */
  val MinResidentConf = "spark.graft.memoMinResident"

  /** The working-set guard size (entries). */
  def minResident(s: SparkSession): Int =
    s.conf.getOption(MinResidentConf).map(_.toInt).getOrElse(8)

  /** Bytes currently pinned in the block manager (memory + disk),
    * across ALL cached/checkpointed RDDs — memo entries and any
    * in-flight query scratch. The budget compares against this total:
    * what matters at runtime is the real storage pressure, not the
    * memos' own share of it. */
  def storedBytes(s: SparkSession): Long =
    s.sparkContext.getRDDStorageInfo.map(i => i.memSize + i.diskSize).sum

  /** Cumulative budget evictions (observability + spec hook). */
  val evictions = new java.util.concurrent.atomic.AtomicLong(0)

  /** Fully release a memoized frame: the CacheManager entry and any
    * checkpoint RDD blocks embedded in its plan THAT NO OTHER LIVE
    * SLOT'S PLAN STILL EMBEDS. The ownership guard matters (ADVICE
    * r15): a derived memo entry's plan can embed another live entry's
    * checkpoint RDD (e.g. a persisted bucket index built over a
    * localCheckpointed banded frame) — unpersisting every plan RDD on
    * eviction would destroy the still-live dependency's blocks and
    * the next hit on it fails with "checkpoint block not found".
    * A shared checkpoint RDD is therefore only freed when its LAST
    * referencing slot is released (no permanent leak: the exclusion
    * set shrinks as slots go). Blocking, so the budget check right
    * after an eviction reads post-release sizes.
    *
    * Two r16-ADVICE hardenings:
    *  - the keep-set scan and the unpersist loop run under the Memos
    *    lock, and admissions ([[Store.getOrElseUpdate]]'s insert path)
    *    take the same lock — so a slot admitted concurrently whose
    *    plan embeds the same checkpoint RDD can never slip in between
    *    the ownership scan and the free;
    *  - liveness is decided per SLOT, not by DataFrame reference: a
    *    victim slot is removed from its map BEFORE release is called
    *    (removeSelf / clear()'s drain / the never-inserted loser), so
    *    "live" = everything still in a store. If the SAME DataFrame
    *    instance is also memoized under another key, that twin slot
    *    keeps both the cache entry (the `df.unpersist` is skipped)
    *    and every plan RDD — releasing one alias is then a no-op
    *    instead of destroying the survivor's blocks. */
  def release(df: DataFrame): Unit = Memos.synchronized {
    val live = stores.asScala.flatMap(_.slots).toSeq
    val keep: Set[Int] = live
      .flatMap(sl => org.apache.spark.sql.graftbridge.Bridge.planRdds(sl.df))
      .map(_.id).toSet
    if (!live.exists(_.df eq df)) df.unpersist(blocking = true)
    org.apache.spark.sql.graftbridge.Bridge.planRdds(df).foreach { r =>
      if (!keep.contains(r.id) &&
          r.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)
        r.unpersist(blocking = true)
    }
  }

  private val tick = new java.util.concurrent.atomic.AtomicLong(0)
  private val stores =
    new java.util.concurrent.ConcurrentLinkedQueue[Store[_]]()

  /** Reference-equality slot (NOT a case class): `removeSelf` uses
    * the conditional `TrieMap.remove(key, slot)` so an eviction
    * selected from a stale snapshot can never drop a NEWER slot that
    * was re-admitted at the same key after the snapshot was taken. */
  private[engine] final class Slot(val df: DataFrame,
      @volatile var lastHit: Long) {
    @volatile var removeSelf: () => Unit = () => ()
  }

  /** A session memo map with LRU byte-budget participation — the
    * drop-in replacement for the per-module
    * `TrieMap[..., DataFrame] + Memos.register` pattern. */
  final class Store[K](val name: String) {
    private val m = TrieMap.empty[K, Slot]
    stores.add(this)
    register { () => clear() }

    /** Release and drop every entry in THIS store. The map is
      * emptied FIRST so [[release]]'s shared-RDD exclusion set no
      * longer counts sibling entries of this store as live — RDDs
      * shared only within the store are freed, those still embedded
      * by another store's live slot survive until it releases. */
    def clear(): Unit = {
      val dropped = m.values.toSeq
      m.clear()
      dropped.foreach(sl => release(sl.df))
    }

    /** Atomic memoized admission (ADVICE r15: the plain get-then-put
      * raced — two concurrent misses each built and persisted a
      * frame, the loser's overwrote the winner's slot and the
      * orphaned frame stayed pinned forever). `putIfAbsent` decides
      * the winner; a losing builder releases its freshly built frame
      * and returns the winner's. */
    def getOrElseUpdate(key: K, build: => DataFrame): DataFrame =
      m.get(key) match {
        case Some(sl) =>
          sl.lastHit = tick.incrementAndGet(); sl.df
        case None =>
          val df = build // outside the lock: builds run Spark jobs
          // Admission holds the Memos lock (ADVICE r16): release()'s
          // keep-set scan and unpersist loop hold the same lock, so a
          // slot can never become live between a scan and the free it
          // informs — the insert and the budget sweep are one atom.
          Memos.synchronized {
            val slot = new Slot(df, tick.incrementAndGet())
            slot.removeSelf = () => { m.remove(key, slot); () }
            m.putIfAbsent(key, slot) match {
              case Some(winner) =>
                release(df)
                winner.lastHit = tick.incrementAndGet()
                winner.df
              case None =>
                enforceBudget(df.sparkSession, df)
                df
            }
          }
      }

    def size: Int = m.size
    private[engine] def slots: Seq[Slot] = m.values.toSeq
  }

  /** Evict least-recently-hit entries (across every store) until the
    * block manager total fits the budget. The just-admitted frame is
    * exempt; if everything evictable is gone and the total still
    * exceeds the budget, the residue is in-flight query scratch —
    * released by its own query's end-of-call discipline.
    *
    * Known slack (ADVICE r15, accepted): the check runs at admission,
    * but a persisted (non-checkpointed) entry's blocks only
    * materialize at its first action, so `storedBytes` can exclude
    * the newest entry and the budget is enforced one admission late —
    * the session may transiently exceed it by the largest entry's
    * size. Acceptable under the documented half-heap default, which
    * leaves that headroom by construction. */
  private def enforceBudget(s: SparkSession,
                            justAdmitted: DataFrame): Unit = synchronized {
    val budget = budgetBytes(s)
    if (budget <= 0 || storedBytes(s) <= budget) return
    val sorted = stores.asScala.flatMap(_.slots).toSeq
      .filter(_.df ne justAdmitted)
      .sortBy(_.lastHit)
    // working-set guard: the newest-hit entries are never victims
    // (see MinResidentConf — the running query's fetched frames)
    val victims = sorted.dropRight(minResident(s))
    val it = victims.iterator
    while (storedBytes(s) > budget && it.hasNext) {
      val v = it.next()
      v.removeSelf()
      release(v.df)
      evictions.incrementAndGet()
    }
  }
}
