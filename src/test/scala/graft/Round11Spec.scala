package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.engine.Dec._

/** Round-11 declared queries: the plan-shape half of what the oracle
  * hash cannot see — q157's join must consume the bucketed layout
  * without shuffling either side, q158's scan must prune to one
  * day=... partition directory. */
class Round11Spec extends SparkSpecBase {

  test("q_join_colocated runs a zero-exchange sort-merge join over buckets") {
    val df = SparkEntry.queries("q_join_colocated")(spark, sfDir)
    // the aggregate above the join shuffles on c_mktsegment (expected);
    // the JOIN sides must not — no exchange may be keyed on custkey
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("SortMergeJoin"), s"expected SMJ:\n$planStr")
    val flat = planStr.replaceAll("\\s", "")
    assert(!flat.contains("Exchangehashpartitioning(o_custkey") &&
      !flat.contains("Exchangehashpartitioning(c_custkey"),
      s"bucketed join must not shuffle either side:\n$planStr")
    // result identical to the plain join-aggregate over the originals
    val plain = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        dbl(sum(dec2(col("o_totalprice")))).as("revenue"))
      .orderBy("c_mktsegment")
    assert(df.collect().toSeq == plain.collect().toSeq)
  }

  test("q_quality_recall: sane counts, recall floors hold") {
    val rows = SparkEntry.queries("q_quality_recall")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    info(rows.toString)
    assert(rows.keySet == Set("minhash_pair_recall", "ivf_recall_at_3"))
    for ((m, (nE, nA, nH, rec)) <- rows) {
      assert(nE > 0 && nH <= nE && nH <= nA, s"$m: counts $nE/$nA/$nH")
      assert(rec >= 0.0 && rec <= 1.0, s"$m: recall $rec")
    }
    // floors: LSH banding over the boilerplate-heavy fixture and IVF
    // at nprobe=3 both sit well above these (measured this round);
    // a regression below them means an index family broke
    assert(rows("minhash_pair_recall")._4 >= 0.5,
      s"minhash recall ${rows("minhash_pair_recall")._4}")
    assert(rows("ivf_recall_at_3")._4 >= 0.6,
      s"ivf recall ${rows("ivf_recall_at_3")._4}")
  }

  test("autoPairs picks exact under the volume cap, LSH above, soundly") {
    import graft.text.Dedup
    val toks = Dedup.subsetTokens(spark, sfDir).persist()
    try {
      // measured Σdf² for this corpus is ~180k: default cap → exact
      val (p1, exact) = Dedup.autoPairs(spark, toks)
      assert(p1 == "exact")
      // cap 0 forces the scale path on the same corpus
      val (p2, lsh) = Dedup.autoPairs(spark, toks, exactVolumeCap = 0L)
      assert(p2 == "lsh")
      // sound: every LSH-verified pair is an exact J >= 0.5 pair
      val exactSet = exact.select("doc_a", "doc_b").collect().toSet
      val lshRows = lsh.select("doc_a", "doc_b").collect()
      assert(lshRows.nonEmpty, "LSH branch returned no pairs")
      assert(lshRows.forall(exactSet.contains),
        "LSH pair outside the exact pair set")
      // schema-compatible: downstream collapse is plan-agnostic
      assert(exact.columns.toSeq == lsh.columns.toSeq)
      // empty corpus: volume coalesces to 0 -> exact path, no NPE
      val (p3, empty) = Dedup.autoPairs(spark, toks.limit(0))
      assert(p3 == "exact" && empty.count() == 0)
      // q160's oracle asserts plan='exact', so the fixture must keep a
      // wide margin under the default cap — flag drift loudly here
      // rather than as an opaque oracle hash mismatch
      val vol = toks.groupBy("tok").agg(count(lit(1)).as("df"))
        .agg(coalesce(sum(col("df") * col("df")), lit(0L)).cast("long"))
        .head().getLong(0)
      assert(vol * 10 <= 20L * 1000 * 1000,
        s"subset pair volume $vol within 10x of the exact-path cap — " +
          "q_dedup_auto's pinned 'exact' decision is at risk")
    } finally toks.unpersist(blocking = false)
  }

  test("autoKnn picks brute under the volume cap, IVF above; nprobe=k is bit-equal") {
    import graft.text.Similarity
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).persist()
    try {
      val probes = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("embedding").as("probe"))
      val n = emb.count()
      // margin guard for q161's pinned 'brute' decision (fixture drift
      // must flag here, not as an opaque oracle hash diff)
      assert(n * 5 * 10 <= 50L * 1000 * 1000,
        s"probe x corpus volume ${n * 5} within 10x of the brute cap")
      val (p1, brute) = Similarity.autoKnn(spark, emb, probes, topK = 3)
      assert(p1 == "brute")
      // cap 0 forces the IVF path; nprobe = k (every cluster probed)
      // must reproduce the brute result bit-for-bit
      val k = math.max(1, math.ceil(math.sqrt(n.toDouble)).toInt)
      val (p2, ivf) = Similarity.autoKnn(spark, emb, probes, topK = 3,
        nprobe = k, bruteVolumeCap = 0L)
      assert(p2 == "ivf")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("probe_id", "rn").collect()
          .map(r => (r.getLong(0), r.getLong(1),
            java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getInt(3)))
          .toSeq
      assert(rows(brute) == rows(ivf), "nprobe=k IVF must equal brute")
    } finally emb.unpersist(blocking = false)
  }

  test("q_sim_knn_auto equals q91's neighbours with the brute decision attached") {
    val auto = SparkEntry.queries("q_sim_knn_auto")(spark, sfDir)
      .collect()
    val q91 = SparkEntry.queries("q_sim_knn_batch")(spark, sfDir).collect()
    assert(auto.map(_.getString(4)).forall(_ == "brute"))
    assert(auto.map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSeq ==
      q91.map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSeq)
  }

  test("q_dedup_auto equals q50's pairs with the exact decision attached") {
    val auto = SparkEntry.queries("q_dedup_auto")(spark, sfDir).collect()
    val q50 = SparkEntry.queries("q_sim_jaccard_pairs")(spark, sfDir)
      .collect()
    assert(auto.map(_.getString(4)).forall(_ == "exact"))
    assert(auto.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq ==
      q50.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq)
  }

  test("q_scan_partition_pruned prunes to the one day=... directory") {
    val df = SparkEntry.queries("q_scan_partition_pruned")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.replaceAll("\\s", "").contains("PartitionFilters:[isnotnull(day"),
      s"day filter must reach PartitionFilters:\n$plan")
    // result identical to the timestamp-range filter over the originals
    val plain = Tables.events(spark, sfDir)
      .filter(col("ts") >= lit("2024-01-05 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-06 00:00:00").cast("timestamp"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        count_distinct(col("user_id")).as("n_users"))
      .orderBy("event_type")
    assert(df.collect().toSeq == plain.collect().toSeq)
  }
}
