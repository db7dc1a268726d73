package graft

import graft.text.Similarity

/** IVF-bucketed ANN vs the exact brute-force baseline. */
class SimilaritySpec extends SparkSpecBase {

  test("IVF top-k is exact within its probed clusters and overlaps brute force") {
    val exact = Similarity.defs("q_sim_topk_cosine")(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    val ivf = Similarity.ivfTopK(spark, sfDir, nprobe = 3)
      .collect().map(_.getLong(0))
    assert(ivf.length == 10)
    val recall = ivf.count(exact).toDouble / exact.size
    assert(recall >= 0.3, s"IVF recall $recall too low for nprobe=3")
    // widening the probe to all clusters recovers brute force exactly
    val full = Similarity.ivfTopK(spark, sfDir, nprobe = 10)
      .collect().map(_.getLong(0)).toSet
    assert(full == exact, "nprobe=k must equal brute force")
  }
}
