package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
import graft.text.Dedup

/** VERDICT r13 task 1 pin — the DE-CORPUSED capped-branch verify.
  *
  * The r13 shape broadcast the FULL per-doc token-set and size
  * relations (corpus-sized) to verify candidates: the branch that
  * exists precisely for corpora too big for the exact join shipped
  * the corpus to every executor. The fix semi-prunes the corpus
  * relation to the candidate doc ids (candidate-bounded by
  * construction) and places NO broadcast hint — AQE decides from the
  * post-prune runtime sizes. These pins make the fix mechanical:
  *  - the capped verify's ANALYZED plan carries zero ResolvedHint
  *    nodes (a hint is a forced broadcast regardless of size; its
  *    absence is exactly "no corpus-derived broadcast by plan");
  *  - the physical plan contains the LeftSemi prune;
  *  - end-to-end forced-cap output is unchanged by the rewrite:
  *    sound subset of exact with identical values (the Round13bSpec
  *    property, re-proven through the new plan). */
class DedupPlanSpec extends SparkSpecBase {

  private def hints(df: DataFrame): Seq[ResolvedHint] =
    df.queryExecution.analyzed.collect { case h: ResolvedHint => h }

  test("capped verify is hint-free (no corpus-derived broadcast) and " +
      "semi-prunes the corpus to candidate ids") {
    val rel = Dedup.subsetTokens(spark, sfDir)
      .select(col("doc_id"), col("tok"))
    val capped = Dedup.capPerKey(rel, "tok", "doc_id", 16)
    val cands = capped.select(col("doc_id").as("doc_a"), col("tok"))
      .join(capped.select(col("doc_id").as("doc_b"), col("tok")),
        Seq("tok"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct().localCheckpoint()
    val verify = Dedup.cappedVerify(rel, cands)
    assert(hints(verify).isEmpty,
      s"capped verify must not hint-broadcast anything; found " +
        s"${hints(verify).map(_.hints)}")
    val phys = verify.queryExecution.executedPlan.toString
    assert(phys.contains("LeftSemi"),
      s"corpus relation must be semi-pruned to candidate ids:\n$phys")
    assert(verify.count() > 0)
  }

  test("forced-cap guardedInterPairs through the de-corpused verify " +
      "is still a sound subset of exact with identical values") {
    val rel = Dedup.subsetTokens(spark, sfDir)
    val (pe, exact) = Dedup.guardedInterPairs(rel, "tok", "doc_id",
      volumeCap = Long.MaxValue)
    assert(pe == "exact")
    val (pc, cappedOut) = Dedup.guardedInterPairs(rel, "tok", "doc_id",
      volumeCap = 0L)
    assert(pc == "capped")
    val e = exact.collect().map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val c = cappedOut.collect().map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(c.nonEmpty, "forced-cap branch must still find pairs")
    c.foreach { case (k, v) =>
      assert(e.contains(k), s"capped emitted a non-exact pair $k")
      assert(e(k) == v, s"pair $k capped=$v exact=${e(k)}")
    }
  }
}
