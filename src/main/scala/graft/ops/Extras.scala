package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.Tables._
import graft.engine.Dec._

/** Round-2 coverage extensions to SURVEY.md §2: distribution window
  * functions, boolean/conditional aggregates, regexp and bitwise
  * scalar surfaces, a snapshot-diff incremental operator [P §3], and
  * the IVF ANN scale path promoted to a declared query.
  *
  * All oracle-checked rows follow D1–D7 (Tables.Dec scaladoc):
  * integer/decimal internals, one IEEE double emission at the
  * boundary, unique total ORDER BY. */
object Extras {

  private val cutoff = "2024-01-20"

  val defs: Map[String, Q] = Map(
    /** q71: distribution window functions — ntile/percent_rank/
      * cume_dist. The window orders by the unique o_orderkey, so rank
      * == row_number and both engines evaluate the same integer
      * ratios (one IEEE division each — D3-safe). */
    "q_win_ntile" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          ntile(4).over(w).as("nt"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy("o_orderkey")
    }),

    /** q72: boolean + conditional aggregates per event_type —
      * bool_and/bool_or/count_if (reduce-side predicates [H]). */
    "q_agg_bool" -> ((s, d) => {
      events(s, d)
        .groupBy("event_type")
        .agg(expr("bool_and(value > 0)").as("all_pos"),
          expr("bool_or(value > 99)").as("any_big"),
          expr("count_if(value > 50)").cast("bigint").as("n_over50"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    /** q73: regexp scalar surface — replace-all + first-group
      * extract. No-match results are normalized to 'NONE' on both
      * engines ('' in Spark, engine-dependent ''/NULL elsewhere). */
    "q_fn_regexp" -> ((s, d) => {
      documents(s, d)
        .select(col("doc_id"),
          length(regexp_replace(col("text"), "[aeiou]", "")).cast("bigint")
            .as("novowel_len"),
          coalesce(nullif(regexp_extract(col("text"), "([a-z]{7,})", 1), lit("")),
            lit("NONE")).as("first_long_word"),
          size(split(col("text"), "[aeiou]+")).cast("bigint").as("vowel_runs"))
        .orderBy("doc_id")
    }),

    /** q74: bitwise scalar surface over integer keys. */
    "q_fn_bitwise" -> ((s, d) => {
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_orderkey").bitwiseAND(lit(255L))).as("k_and"),
          (col("l_orderkey").bitwiseOR(lit(4096L))).as("k_or"),
          (col("l_orderkey").bitwiseXOR(col("l_suppkey"))).as("k_xor"),
          shiftleft(col("l_linenumber"), 3).cast("bigint").as("ln_shl"),
          bit_count(col("l_orderkey")).cast("bigint").as("k_bits"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    /** q75: snapshot diff [P §3] — compare per-user aggregate state
      * across two event windows (before/after the cutoff): the
      * kv-store view of incremental processing. Exact decimal sums;
      * one double emission for the delta. */
    "q_incr_snapshot_diff" -> ((s, d) => {
      val ev = events(s, d)
      val cut = lit(cutoff).cast("timestamp")
      val a = ev.filter(col("ts") < cut).groupBy("user_id")
        .agg(sum(dec2(col("value"))).as("ta"))
      val b = ev.filter(col("ts") >= cut).groupBy("user_id")
        .agg(sum(dec2(col("value"))).as("tb"))
      a.join(b, Seq("user_id"), "full")
        .select(col("user_id"),
          when(col("ta").isNull, lit("added"))
            .when(col("tb").isNull, lit("removed"))
            .otherwise(lit("changed")).as("status"),
          dbl(coalesce(col("ta"), lit(0).cast("decimal(18,2)"))).as("before_sum"),
          dbl(coalesce(col("tb"), lit(0).cast("decimal(18,2)"))).as("after_sum"),
          dbl(coalesce(col("tb"), lit(0).cast("decimal(18,2)"))
            - coalesce(col("ta"), lit(0).cast("decimal(18,2)"))).as("delta"))
        .orderBy("user_id")
    }),

    /** q76: IVF ANN — the bucketed similarity-search scale path as a
      * declared query (top-10 neighbors of vec 0, nprobe=3 of k=10
      * clusters). oracle=none (approximate by construction);
      * SimilaritySpec asserts recall vs the exact q52 top-k and
      * nprobe=k ≡ brute force. */
    "q_sim_ann_ivf" -> ((s, d) =>
      graft.text.Similarity.ivfTopK(s, d).drop("cluster")),

    /** q77: deterministic train/val/test split — the holdout
      * mechanism of a training-data pipeline. Assignment hashes the
      * KEY (md5, engine-portable), never a random(): reproducible
      * across runs, engines and cluster sizes, and stable under
      * re-partitioning. ~80/10/10 via the first hex byte
      * (< 0xcc / < 0xe6); output = per-(lang, split) counts, i.e. the
      * stratification report. */
    "q_sample_split" -> ((s, d) => {
      documents(s, d)
        .withColumn("h2",
          substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2))
        .withColumn("split",
          when(col("h2") < "cc", "train")
            .when(col("h2") < "e6", "val")
            .otherwise("test"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("n_chars"),
          min(col("doc_id")).as("min_doc"))
        .orderBy("lang", "split")
    }),

    /** q78: range/interval join — events bucketed into static value
      * intervals [lo, hi). The bucket table broadcasts, so the range
      * condition evaluates in a broadcast nested-loop with NO shuffle
      * of the fact side — the scale shape for dim-sized interval
      * tables. (Interval tables that are themselves fact-sized need a
      * bucketing/binning pre-join instead.) */
    "q_join_range" -> ((s, d) => {
      import s.implicits._
      val buckets = (0 until 10)
        .map(i => (i.toLong, i * 10.0, (i + 1) * 10.0))
        .toDF("bucket", "lo", "hi")
      events(s, d)
        .join(broadcast(buckets),
          col("value") >= col("lo") && col("value") < col("hi"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("bucket")
    }),

    /** q82: LATERAL join — correlated subquery in FROM (top-2 orders
      * per customer for a deterministic customer subset): per-row
      * parameterized subplans, the join surface that window-rank
      * rewrites don't literally express. Catalyst decorrelates it
      * into a ranked join under the hood. */
    "q_join_lateral" -> ((s, d) => {
      // Path-based table refs (`parquet.`...``), NOT temp views: a
      // createOrReplaceTempView here would mutate the session catalog
      // at plan-build time, so two plans built in one session against
      // different data dirs would silently cross-contaminate.
      s.sql(s"""
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM parquet.`$d/customer.parquet` c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM parquet.`$d/orders.parquet`
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        WHERE c.c_custkey % 10 = 0
        ORDER BY c.c_custkey, o.o_orderkey""")
    }),

    /** q81: approximate percentiles — the sketch companion to q69's
      * exact percentiles (t-digest-style; at 100 TB the exact sort
      * per group is what you avoid). oracle=none (sketches differ
      * across engines); the spec bounds it against the exact values. */
    "q_agg_approx_percentile" -> ((s, d) => {
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          expr("approx_percentile(l_quantity, 0.5, 1000)").as("p50_approx"),
          expr("approx_percentile(l_quantity, 0.9, 1000)").as("p90_approx"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    /** q80: UNPIVOT (inverse of q68's PIVOT) — wide numeric columns
      * to (key, metric, value) long form via the stack() generator;
      * map-only, no shuffle until the output sort. */
    "q_agg_unpivot" -> ((s, d) => {
      orders(s, d)
        .selectExpr("o_orderkey",
          """stack(2, 'custkey', CAST(o_custkey AS DOUBLE),
                      'price', o_totalprice) AS (metric, value)""")
        .orderBy("o_orderkey", "metric")
    }),

    /** q79: RANGE window frame over event TIME (not row counts) —
      * per-user rolling 1-hour event count and exact-decimal sum.
      * The frame bound is integer µs on both engines. */
    "q_win_range_frame" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600000000L, 0L)
      events(s, d)
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("n_1h"),
          dbl(sum(dec2(col("value"))).over(w)).as("sum_1h"))
        .orderBy("event_id")
    })
  )

  val sql: Map[String, String] = Map(
    "q_win_ntile" ->
      """SELECT o_orderkey, o_custkey,
         ntile(4) OVER w AS nt,
         percent_rank() OVER w AS pr,
         cume_dist() OVER w AS cd
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
         ORDER BY o_orderkey""",
    "q_agg_bool" ->
      """SELECT event_type,
         bool_and(value > 0) AS all_pos,
         bool_or(value > 99) AS any_big,
         CAST(count(*) FILTER (WHERE value > 50) AS BIGINT) AS n_over50,
         CAST(count(*) AS BIGINT) AS n
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_fn_regexp" ->
      """SELECT doc_id,
         CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT)
           AS novowel_len,
         coalesce(nullif(regexp_extract(text, '([a-z]{7,})', 1), ''), 'NONE')
           AS first_long_word,
         CAST(length(string_split_regex(text, '[aeiou]+')) AS BIGINT)
           AS vowel_runs
         FROM documents ORDER BY doc_id""",
    "q_fn_bitwise" ->
      """SELECT l_orderkey, l_linenumber,
         l_orderkey & 255 AS k_and,
         l_orderkey | 4096 AS k_or,
         xor(l_orderkey, l_suppkey) AS k_xor,
         CAST(l_linenumber << 3 AS BIGINT) AS ln_shl,
         CAST(bit_count(l_orderkey) AS BIGINT) AS k_bits
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "q_incr_snapshot_diff" ->
      s"""WITH a AS (
           SELECT user_id, sum(CAST(ROUND(value,2) AS DECIMAL(18,2))) AS ta
           FROM events WHERE ts < TIMESTAMP '$cutoff' GROUP BY user_id
         ), b AS (
           SELECT user_id, sum(CAST(ROUND(value,2) AS DECIMAL(18,2))) AS tb
           FROM events WHERE ts >= TIMESTAMP '$cutoff' GROUP BY user_id
         )
         SELECT coalesce(a.user_id, b.user_id) AS user_id,
           CASE WHEN a.ta IS NULL THEN 'added'
                WHEN b.tb IS NULL THEN 'removed'
                ELSE 'changed' END AS status,
           CAST(coalesce(a.ta, 0) AS DOUBLE) AS before_sum,
           CAST(coalesce(b.tb, 0) AS DOUBLE) AS after_sum,
           CAST(coalesce(b.tb, 0) - coalesce(a.ta, 0) AS DOUBLE) AS delta
         FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
         ORDER BY user_id""",
    "q_join_lateral" ->
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
         FROM customer c, LATERAL (
           SELECT o_orderkey, o_totalprice FROM orders
           WHERE o_custkey = c.c_custkey
           ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
         WHERE c.c_custkey % 10 = 0
         ORDER BY c.c_custkey, o.o_orderkey""",
    "q_agg_unpivot" ->
      """SELECT o_orderkey, 'custkey' AS metric, CAST(o_custkey AS DOUBLE) AS value
         FROM orders
         UNION ALL
         SELECT o_orderkey, 'price' AS metric, o_totalprice AS value
         FROM orders
         ORDER BY o_orderkey, metric""",
    "q_join_range" ->
      """WITH buckets AS (
           SELECT i AS bucket, i * 10.0 AS lo, (i + 1) * 10.0 AS hi
           FROM range(0, 10) t(i)
         )
         SELECT bucket, CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         FROM events e JOIN buckets b ON e.value >= b.lo AND e.value < b.hi
         GROUP BY bucket ORDER BY bucket""",
    "q_win_range_frame" ->
      """SELECT event_id, user_id,
         CAST(count(*) OVER w AS BIGINT) AS n_1h,
         CAST(sum(CAST(ROUND(value,2) AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",
    "q_sample_split" ->
      """SELECT lang,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
              WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
              ELSE 'test' END AS split,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS n_chars,
         min(doc_id) AS min_doc
         FROM documents
         GROUP BY lang, split
         ORDER BY lang, split"""
  )
}
