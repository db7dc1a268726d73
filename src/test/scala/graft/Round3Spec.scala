package graft

import org.apache.spark.sql.functions._

/** Round-3 operators: semantic invariants + the plan shapes their
  * scale story depends on (the value-level gate is the DuckDB oracle;
  * these specs cover what the oracle can't see). */
class Round3Spec extends SparkSpecBase {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q_graph_triangles: triangle joins broadcast the strong-edge list") {
    val p = q("q_graph_triangles").queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"strong-edge triangle joins should broadcast:\n$p")
  }

  test("q_join_skew_salted == the plain unsalted join on real tables") {
    import graft.engine.Tables._
    import graft.engine.Dec._
    val plain = lineitem(spark, sfDir)
      .join(part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"), sumd2(col("l_quantity")).as("sum_qty"))
      .orderBy("p_brand").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val salted = q("q_join_skew_salted").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("q_events_funnel: stage counts are monotonically non-increasing") {
    val r = q("q_events_funnel").collect().head
    val (users, view, click, full) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(users >= view && view >= click && click >= full && full >= 0,
      s"funnel not monotone: $users >= $view >= $click >= $full")
    assert(users > 0)
  }

  test("q_retention_cohort: activity never precedes its cohort day") {
    val rows = q("q_retention_cohort").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => !r.getDate(1).before(r.getDate(0))),
      "found activity_day < cohort_day")
    // every cohort has its own first day as an active day
    val firstDays = rows.filter(r => r.getDate(0) == r.getDate(1))
    assert(firstDays.nonEmpty && firstDays.forall(_.getLong(2) > 0))
  }

  test("q_grouped_map_mad: quantile interpolation matches a flat recompute") {
    import graft.engine.Tables._
    val byLang = documents(spark, sfDir).select("lang", "n_chars").collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble)
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def q50(a: Array[Double]): Double = {
      val h = (a.length - 1) * 0.5; val lo = h.toInt
      if (lo + 1 < a.length) a(lo) + (h - lo) * (a(lo + 1) - a(lo)) else a(lo)
    }
    val got = q("q_grouped_map_mad").collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3))))
      .toMap
    assert(got.keySet == byLang.keySet)
    for ((lang, xs) <- byLang) {
      val med = q50(xs)
      val mad = q50(xs.map(x => math.abs(x - med)).sorted)
      assert(got(lang) == ((med, mad, xs.length.toLong)),
        s"$lang: got ${got(lang)}, expected ($med, $mad, ${xs.length})")
    }
  }

  test("q_sim_knn_batch: probes broadcast; sims bounded; 3 hits per probe") {
    val df = q("q_sim_knn_batch")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Broadcast"), s"probe side should broadcast:\n$p")
    val rows = df.collect()
    assert(rows.length == 15, s"expected 5 probes x 3, got ${rows.length}")
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
    val perProbe = rows.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(perProbe == (0L until 5L).map(_ -> 3).toMap)
    // no self-matches
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
  }

  test("q_agg_histogram: buckets partition the full event count") {
    import graft.engine.Tables._
    val total = events(spark, sfDir).count()
    val rows = q("q_agg_histogram").collect()
    assert(rows.map(_.getLong(1)).sum == total)
    assert(rows.forall(_.getLong(0) >= 0))
  }
}
