package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables._

/** Round-12 batch 10 (SURVEY §2 rows 234-236): Tukey-fence (IQR)
  * outlier detection — completing the outlier trio (q217 mean-rule,
  * q225 sigma-rule) — the token frequency spectrum (the Good-Turing
  * vocabulary curve), and signed-incremental lifecycle accounting.
  *
  * Determinism of the IQR row: p25/p75 are EXACT interpolated order
  * statistics over BIGINT daily counts — both engines compute
  * x[lo] + (x[hi] − x[lo])·frac at index f·(n−1) where frac ∈
  * {0, .25, .5, .75}: every step is a power-of-two division of an
  * integer below 2^53, hence IEEE-exact and bitwise identical (the
  * q182 exact-median argument extended to quarters); the fence
  * p75 + 1.5·IQR = (2k + 3m)/8 is likewise exact, so both engines
  * take the identical branch on every day.
  *
  * The reference tree at /root/reference is absent (SURVEY.md §0);
  * semantics follow SURVEY §2 rows 234-236.
  */
object Round12f {

  /** Per user over daily counts: exact p25/p75 and the count of
    * days beyond the upper Tukey fence. Two aggregates over one
    * user-keyed exchange; |users|·|days|-bounded intermediate. */
  def outlierIqr(ev: DataFrame): DataFrame = {
    val daily = ev
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val q = daily.groupBy("user_id")
      .agg(count(lit(1)).as("n_days"),
        percentile(col("cnt"), lit(0.25)).as("p25"),
        percentile(col("cnt"), lit(0.75)).as("p75"))
    daily.join(q, "user_id")
      .groupBy(col("user_id"), col("n_days"), col("p25"), col("p75"))
      .agg(sum(when(col("cnt") >
          col("p75") + (col("p75") - col("p25")) * 1.5, 1L)
        .otherwise(0L)).as("n_outlier_days"))
      .select(col("user_id"), col("n_days"), col("p25"), col("p75"),
        col("n_outlier_days"))
      .orderBy("user_id")
  }

  /** Corpus trigram frequency spectrum: for each corpus frequency k
    * (11+ is one bucket), the number of distinct 3-gram shingles
    * occurring k times and their total occurrences — the
    * vocabulary-growth / Good-Turing smoothing input (hapax count
    * first). Trigrams, not unigrams: the fixture vocabulary is a
    * closed word set, so the unigram spectrum is a single saturated
    * bucket, while the trigram space exhibits the Zipf tail the
    * statistic exists to measure. Gram-keyed partial-agg shuffle,
    * then an O(12)-group rollup. */
  def freqSpectrum(docs: DataFrame): DataFrame =
    docs.withColumn("toks", split(col("text"), " "))
      .select(explode(expr(
        // Guard size<3: sequence(1, size-2) counts DOWN for short
        // docs; empty array → explode drops the row (Dedup.shinglesOf
        // precedent).
        """CASE WHEN size(toks) >= 3 THEN
             transform(sequence(1, size(toks) - 2),
               i -> concat(element_at(toks, i), ' ',
                           element_at(toks, i + 1), ' ',
                           element_at(toks, i + 2)))
           ELSE array() END""")).as("g"))
      .groupBy("g").agg(count(lit(1)).as("f"))
      .select(when(col("f") >= 11, 11L).otherwise(col("f"))
        .as("freq_bucket"), col("f"))
      .groupBy("freq_bucket")
      .agg(count(lit(1)).as("n_grams"),
        sum(col("f")).as("n_occurrences"))
      .orderBy("freq_bucket")

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    /** q234: IQR (TUKEY-FENCE) OUTLIER DETECTION [N data-quality] —
      * the robust-statistics member of the outlier trio (q217 mean
      * cross-multiplication, q225 integer 3σ): a user's day is
      * outlying when its count exceeds p75 + 1.5·IQR of that user's
      * daily counts, with p25/p75 exact interpolated order
      * statistics — bitwise identical across engines (see object
      * scaladoc). */
    "q_events_outlier_iqr" -> ((s, d) =>
      outlierIqr(events(s, d))),

    /** q235: TRIGRAM FREQUENCY SPECTRUM [T corpus statistics] — how
      * many distinct 3-gram shingles occur exactly k times
      * (k = 1..10, 11+ bucketed): the vocabulary-growth /
      * Good-Turing input, and the hapax-legomena count every
      * corpus-quality report starts with. */
    "q_text_freq_spectrum" -> ((s, d) =>
      freqSpectrum(documents(s, d))),

    /** q236: SIGNED-INCREMENTAL LIFECYCLE [P one-step incremental]
      * — q233 maintained under the event delta: the distinct
      * (user, day) actives are user-local, so touched users'
      * actives recompute from post-delta facts while untouched
      * users' memoized actives pass through unread (first/last are
      * not invertible under deletes — group-recompute is the honest
      * rule); the per-day rollup then runs on the maintained
      * dimension-sized actives. Oracle = batch q233 over post-delta
      * ⇒ hash proves maintenance ≡ recompute. */
    "q_incr_lifecycle" -> ((s, d) => {
      val ev = events(s, d)
      val base = ev.filter(col("event_id") % 10 =!= 0)
      val post = ev.filter(col("event_id") % 10 =!= 1)
      val affected = ev.filter(col("event_id") % 10 === 0 ||
          col("event_id") % 10 === 1)
        .select("user_id").distinct()
      Round12e.lifecycleFromActives(
        Round11b.incrGroupRecomputeMemo(s, d, "lifecycle_actives",
          base, post, Seq("user_id"), affected)(Round12e.activesOf))
    }))

  def sql: Map[String, String] = Map(

    "q_events_outlier_iqr" ->
      """WITH daily AS (
           SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS cnt
           FROM events GROUP BY 1, 2
         ), q AS (
           SELECT user_id, count(*) AS n_days,
                  quantile_cont(cnt, 0.25) AS p25,
                  quantile_cont(cnt, 0.75) AS p75
           FROM daily GROUP BY 1
         )
         SELECT d.user_id, CAST(q.n_days AS BIGINT) AS n_days,
                q.p25, q.p75,
                CAST(sum(CASE WHEN d.cnt >
                    q.p75 + (q.p75 - q.p25) * 1.5
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_outlier_days
         FROM daily d JOIN q ON q.user_id = d.user_id
         GROUP BY 1, 2, 3, 4
         ORDER BY d.user_id""",

    "q_text_freq_spectrum" ->
      """WITH toks AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                  generate_subscripts(string_split(text, ' '), 1) AS i
           FROM documents
         ), tri AS (
           SELECT a.w || ' ' || b.w || ' ' || c.w AS g
           FROM toks a
           JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
           JOIN toks c ON c.doc_id = a.doc_id AND c.i = a.i + 2
         ), wf AS (
           SELECT g, count(*) AS f FROM tri GROUP BY g
         )
         SELECT CAST(CASE WHEN f >= 11 THEN 11 ELSE f END AS BIGINT)
                  AS freq_bucket,
                CAST(count(*) AS BIGINT) AS n_grams,
                CAST(sum(f) AS BIGINT) AS n_occurrences
         FROM wf GROUP BY 1 ORDER BY freq_bucket""",

    "q_incr_lifecycle" -> Round12e.lifecycleSql(
      "(SELECT * FROM events WHERE event_id % 10 <> 1)"))
}
