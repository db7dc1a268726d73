package graft

import org.apache.spark.sql.functions._

/** Round-14 rows (SURVEY §2 rows 275–276):
  *  - q275 `q_sim_cosine_quantized`: int8 symmetric quantization of
  *    the embedding pair detection — recall vs the float pairs is
  *    the quality metric (the q159 recall-audit discipline), and the
  *    integer arithmetic invariants make the row oracle-checkable.
  *  - q276 `q_incr_contamination`: the signed-delta maintenance must
  *    equal q148's batch recompute over the post-delta corpus, with
  *    untouched train docs' rows passing through VERBATIM (the
  *    delta-proportionality argument). */
class Round14Spec extends SparkSpecBase {

  import spark.implicits._

  test("q_sim_cosine_quantized: exact integer invariants hold and " +
      "recall vs float pairs >= 0.9 at the shared threshold") {
    val qp = SparkEntry.queries("q_sim_cosine_quantized")(spark, sfDir)
      .collect()
    assert(qp.nonEmpty, "quantized pairs empty on fixture")
    // Cauchy–Schwarz on the integer side: qcos must be in [-1, 1]
    // and qdot consistent with the reported cosine
    qp.foreach { r =>
      val (qdot, qcos) = (r.getLong(2), r.getDouble(3))
      assert(qcos >= 0.32 && qcos <= 1.0 + 1e-12, s"qcos $qcos")
      assert((qdot > 0) == (qcos > 0))
    }
    val quantized = qp.map(r => (r.getLong(0), r.getLong(1))).toSet
    val float = SparkEntry.queries("q_sim_cosine_pairs")(spark, sfDir)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val recall = quantized.intersect(float).size.toDouble /
      math.max(1, float.size)
    assert(recall >= 0.9,
      s"int8 recall $recall too low (${quantized.size} vs ${float.size})")
  }

  test("q_incr_contamination: maintenance ≡ q148 batch recompute over " +
      "the post-delta corpus; untouched rows pass through") {
    val got = SparkEntry.queries("q_incr_contamination")(spark, sfDir)
    val doc = graft.engine.Tables.documents(spark, sfDir)
    // batch recompute over the post-delta train corpus via the
    // DECLARED batch row's own shape (doc-filtered q148 semantics)
    val full = SparkEntry.queries("q_text_contamination")(spark, sfDir)
    // q148 runs over ALL train docs; restrict to post-delta train ids
    val postIds = doc.filter(col("doc_id") % 97 =!= 0 &&
        col("doc_id") % 10 =!= 1)
      .select(col("doc_id").as("train_id"))
    val expect = full.join(postIds, "train_id")
      .select("train_id", "eval_id", "shared_grams")
    val gotSel = got.select("train_id", "eval_id", "shared_grams")
    assert(gotSel.exceptAll(expect).count() == 0 &&
      expect.exceptAll(gotSel).count() == 0,
      "maintenance diverged from batch recompute")
    assert(got.count() > 0, "incr contamination empty on fixture")
  }
}
