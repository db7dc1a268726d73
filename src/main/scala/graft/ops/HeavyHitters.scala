package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.engine.Tables._

/** Misra–Gries heavy hitters [N] — the frequent-items sketch a 100 TB
  * pipeline uses when the item domain (tokens, URLs, user agents) is
  * too large to aggregate exactly but only the head matters.
  *
  * Scale design: each partition keeps an MG summary of AT MOST `k`
  * (item, count) pairs — O(k) state regardless of partition size, no
  * shuffle during the scan. The per-partition guarantee
  * `trueCount_p(x) − n_p/(k+1) <= mgCount_p(x)` survives summary
  * union (undercounts add), so every item with GLOBAL frequency
  * > n/(k+1) appears in some summary — the candidate set is a
  * guaranteed superset of the true heavy hitters. A second exact pass
  * (semi-join on the tiny broadcast candidate set, then an ordinary
  * count) yields EXACT counts, which is what makes the operator
  * oracle-checkable end to end: sketch for candidate pruning, exact
  * arithmetic for the answer — the same sketch-then-verify shape as
  * the MinHash/SimHash dedup family. */
object HeavyHitters {

  /** One Misra–Gries pass over a partition: at most `k` survivors.
    * Decrement-all on a full summary is O(k) per miss — the classic
    * trade for O(k) memory. */
  def mgSummary(it: Iterator[String], k: Int): Iterator[(String, Long)] = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { x =>
      m.get(x) match {
        case Some(c) => m(x) = c + 1
        case None if m.size < k => m(x) = 1L
        case None =>
          val dead = List.newBuilder[String]
          m.foreach { case (key, c) =>
            if (c == 1L) dead += key else m(key) = c - 1
          }
          dead.result().foreach(m.remove)
      }
    }
    m.iterator
  }

  /** ASSOCIATIVE merge of two MG summaries (Agarwal et al.,
    * "Mergeable Summaries"): add counts, then if over capacity
    * subtract the (k+1)-th largest count from everything and drop the
    * non-positive — the result is itself an MG(k) summary of the
    * concatenated stream with total undercount <= n/(k+1). This is
    * the INCREMENTAL maintenance hook [P §3]: a preserved base
    * summary + a delta summary merge in O(k), no base re-scan —
    * the same preserved-state shape as the df-counts of q119. */
  def mergeSummaries(a: Iterable[(String, Long)], b: Iterable[(String, Long)],
                     k: Int): Map[String, Long] = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    (a.iterator ++ b.iterator).foreach { case (x, c) =>
      m(x) = m.getOrElse(x, 0L) + c
    }
    if (m.size <= k) m.toMap
    else {
      val thr = m.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      m.iterator.map { case (x, c) => (x, c - thr) }
        .filter(_._2 > 0).toMap
    }
  }

  /** Candidate items whose global frequency MAY exceed n/(k+1):
    * the union of per-partition MG summaries. */
  def candidates(items: Dataset[String], k: Int): DataFrame = {
    import items.sparkSession.implicits._
    items.mapPartitions(mgSummary(_, k)).toDF("tok", "mg_count")
      .select("tok").distinct()
  }

  val defs: Map[String, Q] = Map(
    /** q120: tokens with frequency > n/50 over the document corpus —
      * MG(k=63) per partition (63+1 > 50, so the sketch provably
      * retains every qualifying token), broadcast candidate semi-join,
      * exact count + integer threshold (cnt·50 > n — no division).
      * The oracle computes the same answer by brute-force GROUP BY:
      * the sketch path must be result-invisible. */
    "q_agg_heavy_hitters" -> ((s, d) => {
      import s.implicits._
      val toks = documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
      val n = toks.agg(count(lit(1)).as("n"))
      val cands = candidates(toks.as[String], 63)
      toks.join(broadcast(cands), "tok")
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(n))
        .filter(col("cnt") * 50 > col("n"))
        .select(col("tok"), col("cnt"))
        .orderBy(col("cnt").desc, col("tok"))
    }),

    /** q123: INCREMENTAL heavy hitters [P §3] — the q120 answer
      * maintained from PRESERVED state: the base corpus
      * (doc_id%10<>0) contributes only its O(k)-sized MG summary
      * (in production read from the partials store — the base is never
      * re-scanned for candidates), the delta contributes its own, and
      * [[mergeSummaries]] combines them in O(k). The mergeable-
      * summaries bound keeps the merged sketch's undercount <=
      * n/(k+1) < the n/50 threshold margin, so the merged candidate
      * set still provably covers every true heavy hitter; the exact
      * verify pass then makes the result identical to q120's — and the
      * oracle IS q120's brute-force SQL verbatim. Driver-side state is
      * k-bounded (63 entries per partition summary), never data-sized. */
    "q_incr_heavy_hitters" -> ((s, d) => {
      import s.implicits._
      val docs = documents(s, d)
      def toksOf(dd: DataFrame): DataFrame = dd
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
      def summaryOf(t: DataFrame): Map[String, Long] =
        t.as[String]
          .mapPartitions(it => Iterator.single(mgSummary(it, 63).toMap))
          .collect()
          .foldLeft(Map.empty[String, Long])(mergeSummaries(_, _, 63))
      val merged = mergeSummaries(
        summaryOf(toksOf(docs.filter(col("doc_id") % 10 =!= 0))),
        summaryOf(toksOf(docs.filter(col("doc_id") % 10 === 0))), 63)
      val cands = merged.keys.toSeq.toDF("tok")
      val all = toksOf(docs)
      val n = all.agg(count(lit(1)).as("n"))
      all.join(broadcast(cands), "tok")
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(n))
        .filter(col("cnt") * 50 > col("n"))
        .select(col("tok"), col("cnt"))
        .orderBy(col("cnt").desc, col("tok"))
    }),

    /** q138: incremental heavy hitters under a SIGNED delta [P §3] —
      * q123 completed with deletions. MG summaries do NOT subtract
      * (the sketch is monotone), so the '-' half rides on a MASS
      * BUDGET instead of summary arithmetic:
      *
      *   MG(k) retains every x with freq_pre(x) > n_pre/(k+1); any
      *   post-delta heavy hitter has freq_pre(x) >= freq_post(x)
      *   > n_post/50, so it is retained whenever
      *   n_post/50 >= n_pre/(k+1), i.e. deletions remove at most a
      *   1 − 50/(k+1) fraction of the token mass (21.9% at k=63).
      *
      * Within that budget the PRE-delta candidate set (preserved base
      * summary ⊕ insert summary — no base re-scan, no deleted-doc
      * scan) provably still covers every post-delta heavy hitter, and
      * the exact verify pass over the POST corpus restores
      * bit-exactness, exactly as in q120/q123. The budget is CHECKED
      * at runtime (two scalar counts) — exceeding it fails loudly
      * rather than silently under-reporting; the recovery is
      * re-summarizing the surviving corpus (one scan), never a
      * data-sized driver state. `Round8Spec` proves the bound on an
      * adversarial fixture sized at the budget edge. Oracle = the
      * brute-force GROUP BY over the post-delta corpus. */
    "q_incr_heavy_hitters_delete" -> ((s, d) => {
      import s.implicits._
      val docs = documents(s, d)
      def toksOf(dd: DataFrame): DataFrame = dd
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
      def summaryOf(t: DataFrame): Map[String, Long] =
        t.as[String]
          .mapPartitions(it => Iterator.single(mgSummary(it, 63).toMap))
          .collect()
          .foldLeft(Map.empty[String, Long])(mergeSummaries(_, _, 63))
      // pre-delta candidates: preserved base summary ⊕ insert summary
      val merged = mergeSummaries(
        summaryOf(toksOf(docs.filter(col("doc_id") % 10 =!= 0))),
        summaryOf(toksOf(docs.filter(col("doc_id") % 10 === 0))), 63)
      // deletion mass budget: n_post * (k+1) >= n_pre * 50, integer
      val nPre = toksOf(docs).count()
      val post = toksOf(docs.filter(col("doc_id") % 10 =!= 1))
        .persist()
      val nPost = post.count()
      require(nPost * 64L >= nPre * 50L,
        s"deletion mass budget exceeded ($nPre -> $nPost): " +
          "re-summarize the surviving corpus")
      val cands = merged.keys.toSeq.toDF("tok")
      val out = post.join(broadcast(cands), "tok")
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * 50 > nPost)
        .select(col("tok"), col("cnt"))
      graft.iter.IterQueries.finish(out, post)
        .orderBy(col("cnt").desc, col("tok"))
    })
  )

  val sql: Map[String, String] = Map(
    "q_agg_heavy_hitters" ->
      """WITH toks AS (
           SELECT unnest(string_split(text, ' ')) AS tok FROM documents
         ), filtered AS (
           SELECT tok FROM toks WHERE length(tok) > 0
         ), t AS (
           SELECT tok, count(*) AS cnt FROM filtered GROUP BY tok
         ), n AS (
           SELECT count(*) AS n FROM filtered
         )
         SELECT tok, CAST(cnt AS BIGINT) AS cnt
         FROM t, n WHERE cnt * 50 > n
         ORDER BY cnt DESC, tok"""
  ) ++ Map(
    // q123's oracle IS q120's: incremental candidate maintenance must
    // be result-invisible.
    "q_incr_heavy_hitters" ->
      """WITH toks AS (
           SELECT unnest(string_split(text, ' ')) AS tok FROM documents
         ), filtered AS (
           SELECT tok FROM toks WHERE length(tok) > 0
         ), t AS (
           SELECT tok, count(*) AS cnt FROM filtered GROUP BY tok
         ), n AS (
           SELECT count(*) AS n FROM filtered
         )
         SELECT tok, CAST(cnt AS BIGINT) AS cnt
         FROM t, n WHERE cnt * 50 > n
         ORDER BY cnt DESC, tok"""
  ) ++ Map(
    // q138's oracle: the brute-force GROUP BY over the POST-DELTA
    // corpus — the budget-guarded candidate path must be
    // result-invisible.
    "q_incr_heavy_hitters_delete" ->
      """WITH toks AS (
           SELECT unnest(string_split(text, ' ')) AS tok
           FROM documents WHERE doc_id % 10 <> 1
         ), filtered AS (
           SELECT tok FROM toks WHERE length(tok) > 0
         ), t AS (
           SELECT tok, count(*) AS cnt FROM filtered GROUP BY tok
         ), n AS (
           SELECT count(*) AS n FROM filtered
         )
         SELECT tok, CAST(cnt AS BIGINT) AS cnt
         FROM t, n WHERE cnt * 50 > n
         ORDER BY cnt DESC, tok"""
  )
}
