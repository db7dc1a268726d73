package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables._
import graft.engine.Dec._

/** Round-9 extensions (SURVEY.md §2 rows 153–154): the COMPOSITE
  * 'update' delta — [P §3] defines update = delete + insert on the
  * SAME key, and q153 exercises both halves in ONE signed batch
  * against the aggregated join view — and the last paper workload's
  * incremental path promoted to a declared query (signed-delta
  * k-means warm restart, q154). */
object Round9 {

  /** Session memo for q154's STORED centroid model (the converged
    * base-corpus centroids — production writes them through
    * `KMeans.writeCentroids` / reads them back, `Round6Spec` proves
    * that round-trip bit-exact): k×dims doubles per (session, dir),
    * so repeated invocations measure the warm restart itself, not the
    * base convergence. Registered with [[graft.engine.Memos]] like
    * every other stored-state memo (plain arrays — nothing to
    * unpersist). */
  private val centsMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Array[Array[Double]]]
  graft.engine.Memos.register(() => centsMemo.clear())

  val defs: Map[String, Q] = Map(
    /** q153: the COMPOSITE UPDATE delta [P §3: update = delete +
      * insert on the same key] against q92/q142's aggregated join
      * view, all three delta shapes in ONE signed batch: plain
      * inserts (facts at shipdate >= the cut), plain updates (base
      * facts with l_orderkey % 10 == 3 get their price corrected by
      * +1.00 — the OLD version enters the merge as a retraction, the
      * NEW version as an insertion, same keys on both sides), and the
      * merge is the SAME [[Round8.viewApplyDelta]] as q142 — update
      * needs no third flag, exactly as the paper defines it. Group
      * keys whose rows are only revalued keep multiplicity (the −n/+n
      * cancel) while their sums move by the correction — the
      * abelian-group property doing the work. Oracle = the full view
      * over the post-update facts: the composite delta must be
      * result-invisible. */
    "q_incr_view_update" -> ((s, d) => {
      val cut = lit("1999-01-01").cast("timestamp")
      val dim = supplier(s, d)
        .join(nation(s, d), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      def view(rows: DataFrame): DataFrame = rows
        .join(broadcast(dim), col("l_suppkey") === col("s_suppkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n"), sum(dec2(col("l_extendedprice"))).as("rev"))
      val li = lineitem(s, d)
      val basePred = col("l_shipdate") < cut
      val updPred = basePred && col("l_orderkey") % 10 === 3
      val updNew = li.filter(updPred)
        .withColumn("l_extendedprice", col("l_extendedprice") + lit(1.0))
      Round8.viewApplyDelta(
          view(li.filter(basePred)),
          view(li.filter(col("l_shipdate") >= cut)).unionByName(view(updNew)),
          view(li.filter(updPred)))
        .orderBy("n_name")
    }),

    /** q154: INCREMENTAL K-MEANS under a SIGNED point delta [P §6-7]
      * as a declared query — the last paper workload's incremental
      * path under the driver's eye. The STORED model is the converged
      * base-corpus centroids (vec_id % 10 <> 0, eps=1e-4 — memoized
      * here, Parquet via `KMeans.writeCentroids` in production); each
      * invocation warm-restarts `KMeans.runIncremental` on the
      * POST-delta corpus (insert % 10 == 0, delete % 10 == 1 — the
      * Round8 convention) from those centroids and reports the
      * per-cluster assignment summary. Deletion needs no special
      * machinery: centroids are means recomputed from whatever corpus
      * is passed, so the '-' half is just the corpus filter.
      * oracle=none (FP-order-sensitive means, like q44); `Round9Spec`
      * pins the output to the library chain run directly and
      * `Round8Spec` proves warm-beats-cold + the fixed-point
      * invariant for the same signed delta. */
    "q_iter_kmeans_incr" -> ((s, d) => {
      val emb = embeddings(s, d).select(col("vec_id"), col("embedding"))
      val post = emb.filter(col("vec_id") % 10 =!= 1).persist()
      val baseCents = centsMemo.getOrElseUpdate((s, d), {
        val base = emb.filter(col("vec_id") % 10 =!= 0).persist()
        val seed = base.orderBy("vec_id").limit(10).collect()
          .map(_.getSeq[Float](1).map(_.toDouble).toArray)
        val cents = graft.iter.KMeans
          .runUntilFrom(s, base, seed, 1e-4, 60)._3
        base.unpersist(blocking = false)
        cents
      })
      val (assigned, _, _) = graft.iter.KMeans
        .runIncremental(s, post, baseCents, 1e-4, 60)
      val out = assigned.groupBy("cluster")
        .agg(count(lit(1)).as("n"), min(col("vec_id")).as("min_vec"))
        .orderBy("cluster")
      graft.iter.IterQueries.finish(out, post)
    })
  )

  val sql: Map[String, String] = Map(
    // q153's oracle is the full view over the POST-UPDATE facts: every
    // l_orderkey % 10 == 3 base row carries its corrected price, the
    // delta rows appear, nothing else moves.
    "q_incr_view_update" ->
      """SELECT n_name,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(CASE WHEN l_shipdate < TIMESTAMP '1999-01-01'
                               AND l_orderkey % 10 = 3
                              THEN l_extendedprice + 1.0
                              ELSE l_extendedprice END
                    AS DECIMAL(18,2))) AS DOUBLE) AS rev
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name"""
    // q154: oracle=none (FP-order-sensitive centroid means, like q44).
  )
}
