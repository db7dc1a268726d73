package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.incr.IncrMerge

/** Incremental distinct-count via mergeable HLL sketches: the merged
  * estimate over independently-built partial sketches must equal the
  * single-pass sketch and closely track the exact distinct count —
  * the property that makes "distinct users per day, updated hourly"
  * a delta-only computation at scale. */
class IncrSketchSpec extends SparkSpecBase {

  test("union of per-delta sketches == single-pass sketch, ~= exact") {
    val ev = Tables.events(spark, sfDir)
    val cut = lit("2024-01-15").cast("timestamp")
    // two deltas, split by time — each sketched INDEPENDENTLY
    val p1 = IncrMerge.distinctSketch(
      ev.filter(col("ts") < cut), Seq("event_type"), "user_id")
    val p2 = IncrMerge.distinctSketch(
      ev.filter(col("ts") >= cut), Seq("event_type"), "user_id")
    val merged = IncrMerge.mergeDistinct(p1.unionByName(p2), Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val onePass = IncrMerge.mergeDistinct(
      IncrMerge.distinctSketch(ev, Seq("event_type"), "user_id"),
      Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // merge must be lossless vs sketching the union directly
    assert(merged == onePass, s"merged=$merged onePass=$onePass")

    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged.keySet == exact.keySet)
    for ((k, n) <- exact) {
      val est = merged(k)
      assert(math.abs(est - n) <= math.max(2L, (0.05 * n).toLong),
        s"$k: estimate $est vs exact $n")
    }
  }

  test("merging an empty delta is a no-op on the estimate") {
    val ev = Tables.events(spark, sfDir)
    val p = IncrMerge.distinctSketch(ev, Seq("event_type"), "user_id")
    val empty = IncrMerge.distinctSketch(
      ev.filter(lit(false)), Seq("event_type"), "user_id")
    val a = IncrMerge.mergeDistinct(p, Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = IncrMerge.mergeDistinct(p.unionByName(empty), Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
  }
}
