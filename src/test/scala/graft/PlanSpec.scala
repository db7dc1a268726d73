package graft

/** Physical-plan shape assertions (SURVEY.md §4): the optimizations
  * the engine relies on must actually be in the plan — pushdown,
  * pruning, broadcast, top-N, partial aggregation, codegen. */
class PlanSpec extends SparkSpecBase {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q_scan_pushdown: shipdate predicate reaches the parquet scan") {
    val p = plan("q_scan_pushdown")
    assert(p.contains("PushedFilters:") && p.contains("LessThan(l_shipdate"),
      s"predicate not pushed:\n$p")
  }

  test("q_scan_project: parquet reads only the three projected columns") {
    val p = plan("q_scan_project")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_orderkey") && read.contains("l_extendedprice"))
    assert(!read.contains("l_shipdate") && !read.contains("l_quantity"),
      s"scan reads unprojected columns: $read")
  }

  test("q_join_broadcast: dimension side is a broadcast hash join") {
    assert(plan("q_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("q_limit_topk: global top-N plans TakeOrderedAndProject, not a full sort") {
    assert(plan("q_limit_topk").contains("TakeOrderedAndProject"))
  }

  test("q_agg_basic: partial+final hash aggregation, codegen enabled") {
    val df = SparkEntry.queries("q_agg_basic")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_sum"), "no map-side partial aggregation")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "not a 2-phase agg")
    // whole-stage codegen spans aren't renderable through the adaptive
    // plan wrapper in this build; assert the engine setting instead
    assert(spark.conf.get("spark.sql.codegen.wholeStage", "true") == "true")
  }

  test("q_join_exists_subquery decorrelates to a semi join") {
    val p = plan("q_join_exists_subquery")
    assert(p.contains("LeftSemi"), s"EXISTS did not decorrelate:\n$p")
  }

  test("q_join_semi and q_join_anti plan as semi/anti joins") {
    assert(plan("q_join_semi").contains("LeftSemi"))
    assert(plan("q_join_anti").contains("LeftAnti"))
  }

  test("q_join_range: interval table broadcasts, fact side never shuffles for the join") {
    val p = plan("q_join_range")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"range join should be a broadcast nested-loop on the dim-sized intervals:\n$p")
  }

  test("q_apriori_pairs: no self-join — exactly the set-build and pair-count aggregates") {
    val p = plan("q_apriori_pairs")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"apriori must not join:\n$p")
    assert(p.contains("collect_set"), "per-doc token sets must build in the agg")
  }

  test("q_win_range_frame: RANGE frame window, single partition-key exchange") {
    val p = plan("q_win_range_frame")
    assert(p.contains("RangeFrame"), s"not a RANGE frame:\n$p")
  }

  test("q_events_sessionize: lag + running-sum share ONE user_id exchange") {
    // both windows partition by user_id with the same (ts, event_id)
    // ordering, so Spark must plan a single hashpartitioning(user_id)
    // exchange feeding both Window operators — the scale-critical
    // property (one shuffle of the fact table, not two). The final
    // orderBy adds one rangepartitioning; nothing else may shuffle.
    val p = plan("q_events_sessionize")
    val hashEx = "hashpartitioning\\(user_id".r.findAllIn(p).size
    assert(hashEx == 1, s"expected exactly 1 user_id hash exchange, got $hashEx:\n$p")
  }

  test("q_join_temporal: interval table broadcasts, fact side never shuffles for the join") {
    val p = plan("q_join_temporal")
    assert(p.contains("BroadcastHashJoin"),
      s"temporal join should broadcast the change-row-sized interval table:\n$p")
  }

  test("q_incr_join_view_delete: all three signed branches broadcast the dim") {
    // base, insert, and retract branches each join the supplier⋈nation
    // dim as a broadcast — the fact table must never shuffle FOR THE
    // JOIN (its only exchanges are the per-branch partial aggregates'
    // n_name hash + the final merge/order)
    val p = plan("q_incr_join_view_delete")
    val bhj = "BroadcastHashJoin".r.findAllIn(p).size
    assert(bhj >= 3, s"expected >= 3 broadcast dim joins, got $bhj:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"fact table must not shuffle for the dim join:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"signed branches must pre-aggregate map-side:\n$p")
  }

  test("q_incr_sessionize_delete: preserved and recomputed partitions " +
       "each sessionize in ONE user_id exchange") {
    // the q111 invariant (lag + running sum share one user_id hash
    // exchange) must survive the signed split: the delta-user set is
    // BROADCAST into the anti/semi partition joins (never a
    // sort-merge — the event log must not shuffle for them), so the
    // fact rows sort on (user_id; ts, event_id) EXACTLY twice — once
    // per sessionize partition. Remaining user_id exchanges in the
    // plan are the delta-sized affected-set builds, not fact shuffles.
    val p = plan("q_incr_sessionize_delete")
    val winOps = "Window".r.findAllIn(p).size
    assert(winOps >= 4, s"both partitions need lag + running-sum windows:\n$p")
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      s"the delta-user set must broadcast into the partition joins:\n$p")
    val factSorts =
      "Sort \\[user_id#\\d+L? ASC NULLS FIRST, ts#".r.findAllIn(p).size
    assert(factSorts == 2,
      s"expected exactly 2 sessionize sorts of the fact rows, got $factSorts:\n$p")
  }

  test("q_text_repetition: two-level aggregation with map-side partials") {
    val p = plan("q_text_repetition")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"bigram counts must pre-aggregate map-side:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"expected 2-phase agg at both levels:\n$p")
  }

  test("q_pack_sequences: packing is ONE source-keyed exchange") {
    // the scale contract: per-source packing must cost exactly one
    // hashpartitioning(source) window exchange (plus the final
    // presentation sort) — never a global single-partition window
    val p = plan("q_pack_sequences")
    val srcEx = "hashpartitioning\\(source".r.findAllIn(p).size
    assert(srcEx == 1, s"expected exactly 1 source exchange, got $srcEx:\n$p")
    assert(!p.contains("SinglePartition"),
      s"packing must never collapse to a single partition:\n$p")
  }

  test("q_sample_reservoir: rank filter stays inside the window stage") {
    // the rn <= 5 filter must apply straight after the Window operator
    // (no extra exchange between them), and the window's sort key is
    // the md5 hash — the deterministic-sample contract.
    val p = plan("q_sample_reservoir")
    assert(p.contains("row_number"), s"no row_number window:\n$p")
    assert(p.contains("md5"), s"sample order must be the md5 hash:\n$p")
  }

  test("verifyPairsLazy: doc-set probes broadcast, candidate stream never shuffles") {
    // The exact-Jaccard verify is the hot half of every LSH batch: its
    // contract (Dedup scaladoc) is that the doc-count-sized set
    // relation broadcasts to BOTH probe sides and the pair stream
    // passes through map-side. A SortMergeJoin here means the
    // candidate stream shuffles — the r10 maintenance-cost fix relies
    // on this staying broadcast.
    import graft.text.Dedup
    val toks = Dedup.tokens(spark, sfDir)
    val sets = Dedup.docSets(toks)
    val cands = toks.select(org.apache.spark.sql.functions.col("doc_id"))
      .distinct().limit(50)
      .selectExpr("doc_id AS doc_a", "doc_id + 1 AS doc_b")
    val p = Dedup.verifyPairsLazy(cands, sets)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"both doc-set probes must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"candidate stream must not shuffle for the verify:\n$p")
  }

  test("candidatesFromBuckets: no shuffle beyond bucket agg + distinct") {
    // r10 removed the repartition(i, doc_a) between the two pair
    // generators (the MaxBucket cap already bounds per-row expansion)
    // — pin its absence so the extra candidate-stream shuffle cannot
    // silently return.
    import graft.text.{Dedup, MinHash}
    val p = MinHash.candidates(MinHash.signatures(Dedup.tokens(spark, sfDir)))
      .queryExecution.executedPlan.toString
    assert(!"hashpartitioning\\(i#".r.findFirstIn(p).isDefined,
      s"pair generation re-shuffles on (i, doc_a):\n$p")
  }

  test("q_profile_stats: each union branch scans exactly one column, no Expand") {
    val p = plan("q_profile_stats")
    // the q185 A/B rationale: 4 pruned scans beat the 4-way
    // multi-distinct Expand — pin both halves of that choice
    assert(!p.contains("Expand"),
      s"multi-distinct Expand crept back into the profile plan:\n$p")
    val schemas = "ReadSchema: struct<[^>]*>".r.findAllIn(p).toSeq
    assert(schemas.size == 4, s"expected 4 scans, got ${schemas.size}:\n$p")
    schemas.foreach(sch => assert(!sch.contains(","),
      s"a profile scan reads more than one column: $sch"))
  }

  test("q_incr_chunks: the affected-hash partition joins are broadcast") {
    val p = plan("q_incr_chunks")
    // the combinator's delta-proportionality claim: the affected set
    // broadcasts to both the anti (pass-through) and semi (recompute)
    // sides — a SortMergeJoin here means the corpus-sized occurrence
    // relation shuffled for the partition step
    assert("BroadcastHashJoin .*LeftAnti".r.findFirstIn(p).isDefined,
      s"pass-through side must anti-join against a broadcast:\n$p")
    assert("BroadcastHashJoin .*LeftSemi".r.findFirstIn(p).isDefined,
      s"recompute side must semi-join against a broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"occurrence relation shuffles for the affected partition:\n$p")
  }

  test("q_agg_filtered: one aggregation pass, no join, no expand") {
    val p = plan("q_agg_filtered")
    assert(!p.contains("Join"), s"filtered aggregates must not self-join:\n$p")
    assert(!p.contains("Expand"), s"no distinct-rewrite expected:\n$p")
    // exactly one data shuffle (the groupBy key) + the output sort
    val exch = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exch == 1, s"expected 1 hash exchange, got $exch:\n$p")
  }
}
