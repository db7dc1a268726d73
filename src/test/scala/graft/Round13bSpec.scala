package graft

import org.apache.spark.sql.functions._
import graft.text.Dedup

/** Round-13 specs, part 2: the generalized occupancy-costed pair
  * source (VERDICT r12 next step 4 — [[Dedup.guardedInterPairs]])
  * behind q65 (shingle Jaccard), q109 (containment) and q175
  * (graph-neighbor Jaccard). Pins:
  *  - the fixture decision is `exact` for all three declared rows
  *    (so the oracle hash covers the selector, via the plan column);
  *  - the capped branch is SOUND: output ⊆ exact output, and every
  *    emitted pair carries the exact inter/sz values (capping bounds
  *    recall, never values);
  *  - the decision flips at the volume cap, and the capped branch
  *    retains full recall whenever every key is under the key cap.
  */
class Round13bSpec extends SparkSpecBase {

  import spark.implicits._

  test("q65/q109/q175 declare plan=exact on the fixture") {
    for (q <- Seq("q_sim_shingle_jaccard", "q_text_containment",
                  "q_graph_jaccard_neighbors")) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      val plans = df.select("plan").distinct().as[String].collect().toSet
      assert(plans == Set("exact"), s"$q plans=$plans")
      assert(df.count() > 0, s"$q empty")
    }
  }

  /** A corpus with one hot key (df = n) plus per-doc discriminating
    * keys — the boilerplate-token shape the guard exists for. */
  private def hotRel(n: Int) = {
    val rows = (1 to n).flatMap { i =>
      Seq((i.toLong, "hot")) ++
        Seq((i.toLong, s"k${i % 7}"), (i.toLong, s"k${(i + 3) % 7}"))
    }.distinct
    rows.toDF("doc_id", "tok")
  }

  test("guard flips exact→capped at the volume cap; capped ⊆ exact " +
      "with identical values on emitted pairs") {
    val rel = hotRel(40)
    val (p1, exact) = Dedup.guardedInterPairs(rel, "tok", "doc_id",
      volumeCap = 1000000L)
    assert(p1 == "exact")
    val (p2, capped) = Dedup.guardedInterPairs(rel, "tok", "doc_id",
      volumeCap = 10L, keyCap = 8)
    assert(p2 == "capped")
    val e = exact.collect().map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val c = capped.collect().map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(c.nonEmpty && c.size < e.size) // hot-only pairs were dropped
    c.foreach { case (k, v) =>
      assert(e(k) == v, s"pair $k capped=$v exact=${e(k)}")
    }
  }

  test("capped branch's ADAPTIVE key cap bounds post-cap candidate " +
      "volume by the volume cap (r13 sf1 finding: a fixed per-key cap " +
      "admits unbounded volume on small key spaces)") {
    val rel = hotRel(60)
    val (vol, nKeys) = Dedup.pairStats(rel, "tok")
    val volumeCap = 4000L
    assert(vol > volumeCap, s"fixture must force the capped branch ($vol)")
    val k = Dedup.adaptiveKeyCap(volumeCap, 4096, nKeys)
    // the internal cap is the tested formula...
    assert(k == math.sqrt(volumeCap.toDouble / nKeys).toLong.toInt)
    // ...and it bounds the post-cap candidate volume by the cap
    val post = rel.groupBy("tok").count()
      .select(least(col("count"), lit(k.toLong)).as("c"))
      .agg(sum(col("c") * col("c"))).as[Long].head()
    assert(post <= volumeCap, s"post-cap volume $post > cap $volumeCap")
    // soundness still holds: capped ⊆ exact with identical values
    val (_, exact) = Dedup.guardedInterPairs(rel, "tok", "doc_id",
      volumeCap = 1000000L)
    val (p, capped) = Dedup.guardedInterPairs(rel, "tok", "doc_id",
      volumeCap = volumeCap)
    assert(p == "capped")
    assert(capped.exceptAll(exact).count() == 0)
  }

  test("pairVolume is the exact self-join cardinality; empty and " +
      "singleton relations cost 0/1") {
    val rel = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "tok")
    assert(Dedup.pairVolume(rel, "tok") == 4L + 1L)
    assert(Dedup.pairVolume(rel.filter(lit(false)), "tok") == 0L)
    assert(Dedup.pairVolume(rel.filter(col("tok") === "b"), "tok") == 1L)
  }

  test("capPerKey keeps the cap smallest ids per key, deterministic") {
    val rel = Seq((5L, "a"), (1L, "a"), (3L, "a"), (2L, "b"))
      .toDF("doc_id", "tok")
    val got = Dedup.capPerKey(rel, "tok", "doc_id", 2)
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (3L, "a"), (2L, "b")))
  }
}
