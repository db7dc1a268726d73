package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.engine.Memos

/** VERDICT r14 task 4 — the session memo stores carry a byte budget:
  * over-budget admissions evict least-recently-hit entries across all
  * stores, the release is REAL (checkpoint blocks freed at the RDD,
  * not left to ContextCleaner GC), and a later re-miss rebuilds
  * correctly. */
class MemoBudgetSpec extends SparkSpecBase {

  private def withBudget[A](bytes: Long)(body: => A): A = {
    try { spark.conf.set(Memos.BudgetConf, bytes.toString); body }
    finally spark.conf.unset(Memos.BudgetConf)
  }

  test("over-budget admission evicts the LRU entry; re-miss rebuilds " +
      "correctly; just-admitted entry is exempt") {
    // isolate: drop every module memo so only spec entries can be
    // victims (module memos rebuild on their next use by design)
    Memos.clearAll()
    val store = new Memos.Store[String]("spec")
    var builds = 0
    def build(lo: Long): org.apache.spark.sql.DataFrame = {
      builds += 1
      val df = spark.range(lo, lo + 10000).toDF("v").persist()
      df.count()
      df
    }
    withBudget(1L) { // everything is over budget: each admission evicts
      val before = Memos.evictions.get()
      val a = store.getOrElseUpdate("a", build(0))
      assert(a.count() == 10000)
      val b = store.getOrElseUpdate("b", build(100))
      // b's admission must evict a (the only other entry), never b
      assert(store.size == 1, s"expected only b to survive: ${store.size}")
      assert(Memos.evictions.get() > before, "eviction counter did not move")
      assert(b.storageLevel != StorageLevel.NONE,
        "the just-admitted entry must not be evicted")
      // a's frame was unpersisted but is lineage-backed: still readable
      assert(a.storageLevel == StorageLevel.NONE)
      // re-miss rebuilds from source
      val a2 = store.getOrElseUpdate("a", build(0))
      assert(builds == 3, s"expected a rebuild on re-miss, builds=$builds")
      assert(a2.count() == 10000 &&
        a2.agg(min(col("v"))).head().getLong(0) == 0L,
        "rebuilt entry returned wrong data")
    }
    store.clear()
  }

  test("eviction releases checkpoint blocks at the RDD (the real free)") {
    Memos.clearAll()
    val store = new Memos.Store[String]("spec_ckpt")
    // a checkpointed entry: Dataset.unpersist alone would NOT free it
    val ck = store.getOrElseUpdate("ck",
      spark.range(0, 50000).toDF("v").localCheckpoint())
    val rdds = org.apache.spark.sql.graftbridge.Bridge.planRdds(ck)
    assert(rdds.nonEmpty, "checkpointed frame must expose its plan RDD")
    assert(rdds.forall(_.getStorageLevel != StorageLevel.NONE),
      "checkpoint blocks should be cached before eviction")
    withBudget(1L) {
      // admitting anything evicts ck (LRU, ck is the only other entry)
      store.getOrElseUpdate("other", {
        val df = spark.range(0, 10).toDF("v").persist(); df.count(); df
      })
    }
    assert(store.size == 1, "ck must be evicted")
    assert(rdds.forall(_.getStorageLevel == StorageLevel.NONE),
      "eviction must unpersist the checkpoint RDD blocks, not just the " +
        "CacheManager entry")
    store.clear()
  }

  test("within budget nothing evicts; budget default derives from the " +
      "driver heap") {
    Memos.clearAll()
    assert(Memos.budgetBytes(spark) == Runtime.getRuntime.maxMemory() / 2)
    val store = new Memos.Store[String]("spec_nofree")
    val before = Memos.evictions.get()
    val a = store.getOrElseUpdate("a", {
      val df = spark.range(0, 1000).toDF("v").persist(); df.count(); df
    })
    store.getOrElseUpdate("b", {
      val df = spark.range(0, 1000).toDF("v").persist(); df.count(); df
    })
    assert(Memos.evictions.get() == before, "evicted under budget")
    assert(store.size == 2)
    assert(a.storageLevel != StorageLevel.NONE)
    store.clear()
    assert(store.size == 0)
  }
}
