package graft.iter

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables.Q

/** MRBGraph-style incremental PageRank — the reference's PRESERVED
  * intermediate state + delta accumulation + change-threshold filter
  * ([P §3] fine-grained edge maintenance, [P §6] change propagation),
  * re-expressed over DataFrames:
  *
  *   C (src, dst, c)  — preserved per-edge contributions, the MRBG
  *                      edge state (at production scale: a stored
  *                      incremental view, maintained by MERGE)
  *   S (node, S)      — per-node contribution sums
  *   state (node, rs) — scaled-integer ranks (q41's representation)
  *
  * One incremental step recomputes contributions ONLY for frontier
  * sources, delta-adjusts S (newC minus the preserved oldC — edge
  * ADDITIONS and DELETIONS both reduce to this subtraction), rebuilds
  * ranks from S, and re-frontiers nodes whose rank moved more than
  * `threshold`. Because all arithmetic is 64-bit integer, the
  * accumulation is EXACT: with threshold = 0 the incremental run is
  * bit-equal to full re-iteration (q48's oracle checks it end-to-end);
  * threshold > 0 trades bounded rank error for a smaller frontier —
  * the paper's approximation knob. Unlike the monotone-min frontier
  * (IterQueries.iterateIncremental), deletions are fully supported:
  * the preserved C rows are what make subtraction possible.
  *
  * Scale: per-iteration work is frontier-proportional (newC builds
  * from frontier srcs only; S and C updates are delta-sized
  * anti-join/union merges of checkpointed state) — never a full
  * recompute of the graph. Frontier frames are node-bounded and
  * broadcast; C is edge-sized and only ever merged, exactly the
  * MRBG-Store's access pattern. */
object MrbgPagerank {

  private def f(sCol: String): String =
    s"CAST(1500000000 + (85 * coalesce($sCol, 0)) DIV 100 AS BIGINT)"

  /** Contributions of `srcs` (single `src` column) under `state` over
    * the given structure — the preserved-edge builder (public: specs
    * and callers maintaining their own C state use it too). */
  def contribsFor(edgesDeg: DataFrame, state: DataFrame,
                  srcs: DataFrame): DataFrame =
    edgesDeg.join(broadcast(srcs), "src")
      .join(broadcast(state), state("node") === col("src"))
      .selectExpr("src", "dst", "rs DIV outdeg AS c")

  /** `iters` incremental steps from (state0, C0, S0) over the NEW
    * structure, starting from `frontier0` (the sources whose preserved
    * rows are stale — for a structure delta: every src whose edge set
    * or outdeg changed). Returns the final state. */
  def incrRun(edgesDegNew: DataFrame, state0: DataFrame, c0: DataFrame,
              s0: DataFrame, frontier0: DataFrame, threshold: Long,
              iters: Int): DataFrame = {
    var state = state0
    var c = c0
    var s = s0
    var frontier = frontier0 // single column: src
    for (_ <- 1 to iters) {
      val newC = contribsFor(edgesDegNew, state, frontier).localCheckpoint()
      val oldC = c.join(broadcast(frontier), "src")
      // newC − oldC per dst: additions (no old row) add c, deletions
      // (no new row) subtract, survivors adjust by the difference
      val dS = newC.select(col("dst"), col("c"))
        .unionByName(oldC.select(col("dst"), (-col("c")).as("c")))
        .groupBy("dst").agg(sum(col("c")).as("dS"))
      val s1 = s.join(broadcast(dS), s("node") === dS("dst"), "left")
        .select(col("node"), (col("S") + coalesce(col("dS"), lit(0L))).as("S"))
        .localCheckpoint()
      val state1 = s1.selectExpr("node", s"${f("S")} AS rs")
      val moved = state1
        .join(state.select(col("node").as("pn"), col("rs").as("prev")),
          col("node") === col("pn"))
        .filter(abs(col("rs") - col("prev")) > threshold)
        .select(col("node").as("src"))
        .localCheckpoint()
      c = c.join(broadcast(frontier), Seq("src"), "left_anti")
        .unionByName(newC).localCheckpoint()
      s = s1
      state = state1.localCheckpoint()
      frontier = moved
    }
    state
  }

  /** Persist the MRBG iterative state — preserved edge contributions
    * C, per-node sums S, and the rank state — to Parquet for CROSS-
    * SESSION restart: the MRBG-Store's actual job for ITERATIVE
    * workloads [P §5] (q103 does the same for aggregation partials).
    * All three components are exact 64-bit integers, so a NEW session
    * reading them back via [[readState]] and running [[incrRun]] is
    * bit-equal to the in-session run — `Round5Spec` proves it across
    * two separate sessions. */
  def writeState(c: DataFrame, s: DataFrame, state: DataFrame,
                 path: String): Unit = {
    graft.incr.IncrMerge.writePartials(c, s"$path/C")
    graft.incr.IncrMerge.writePartials(s, s"$path/S")
    graft.incr.IncrMerge.writePartials(state, s"$path/state")
  }

  /** Read (C, S, state) written by [[writeState]] into `sp` — a fresh
    * session restarting an iterative job from the stored MRBG state. */
  def readState(sp: SparkSession, path: String)
      : (DataFrame, DataFrame, DataFrame) =
    (sp.read.parquet(s"$path/C"),
     sp.read.parquet(s"$path/S"),
     sp.read.parquet(s"$path/state"))

  val defs: Map[String, Q] = Map(
    /** q104: q48's exact computation (PageRank restart after an edge
      * deletion, 2 refinement iterations) via the MRBG mechanism with
      * threshold = 0 — integer delta accumulation makes it bit-equal
      * to full re-iteration, so the SAME unrolled-CTE oracle gates it.
      * The deleted edges' sources seed the frontier; everything the
      * delta never reaches is read once (C0/S0 build) and never
      * recomputed. */
    "q_incr_mrbg" -> ((s0, d) => {
      val s = s0
      Graphs.cached(s, d, "mrbgResult")(IterQueries.loopConf(s) {
        val nodes = Graphs.nodesCached(s, d)
        val edgesDegOld = Graphs.edgesDegCached(s, d)
        // converged base state — shared with q41/q48 (memoized)
        val base = IterQueries.converged5Shared(s, d).select("node", "rs")
        val removed = (col("src") + col("dst")) % 17 === 0
        val edgesNew = Graphs.edgesCached(s, d).filter(!removed)
        val degNew = edgesNew.groupBy("src").agg(count(lit(1)).as("outdeg"))
        val edgesDegNew = edgesNew.join(broadcast(degNew), "src")
          .select(col("src"), col("dst"), col("outdeg")).localCheckpoint()
        // preserved state under the OLD structure
        val allSrcs = nodes.select(col("node").as("src"))
        val c0 = contribsFor(edgesDegOld, base, allSrcs).localCheckpoint()
        val s0s = nodes.join(
            c0.groupBy("dst").agg(sum(col("c")).as("S")),
            nodes("node") === col("dst"), "left")
          .select(col("node"), coalesce(col("S"), lit(0L)).as("S"))
        // frontier: sources whose out-edge set / outdeg changed
        val frontier0 = Graphs.edgesCached(s, d).filter(removed)
          .select("src").distinct()
        incrRun(edgesDegNew, base, c0, s0s, frontier0, 0L, 2)
          .selectExpr("node", "rs",
            "CAST(rs AS DOUBLE) / 10000000000 AS rank")
      }).orderBy("node")
    })
  )

  val sql: Map[String, String] = Map(
    // identical full re-iteration oracle as q48: the MRBG delta path
    // must be result-invisible
    "q_incr_mrbg" -> IterQueries.pagerankIncrSql(5, 2)
  )
}
