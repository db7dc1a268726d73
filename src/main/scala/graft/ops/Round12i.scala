package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables._
import graft.engine.Dec

/** Round-12 batch 13 (SURVEY §2 rows 243-248): equi-depth histogram
  * statistics (the ANALYZE-style optimizer input, completing the
  * stats family: equi-width q87, moments q70, profile q185, sketches
  * q81/q190/q209), GROUPING_ID subtotal disambiguation on rollups
  * (separating NULL-as-data from NULL-as-subtotal), time-INTERVAL
  * RANGE window frames, week-over-week top movers, and the Spark-4
  * VARIANT and collation engines as declared rows.
  *
  * Determinism: equi-depth buckets come from SQL-standard ntile over
  * the provably UNIQUE (cents, orderkey) order — identical in any
  * engine (the q222 argument); boundaries are actual data values
  * (min/max per bucket), all BIGINT. grouping_id is engine-identical
  * by the SQL standard's bit-vector definition.
  *
  * The reference tree at /root/reference is absent (SURVEY.md §0);
  * semantics follow SURVEY §2 rows 243-248.
  */
object Round12i {

  /** Per-group equi-depth histogram: k buckets of near-equal row
    * count (sizes differ by ≤1 — ntile's contract), each reporting
    * its row count and ACTUAL value boundaries. One window sort +
    * one aggregate over a single group-keyed exchange. */
  def eqDepthHistogram(df: DataFrame, groupCol: String,
                       centsCol: String, keyCol: String,
                       k: Int): DataFrame = {
    require(k >= 1, s"bucket count must be >= 1, got $k")
    // Internal-name collision proofing (the gini discipline): a
    // caller value column named "bucket" must not be clobbered.
    val t = df.select(col(groupCol).as("_g"), col(centsCol).as("_x"),
      col(keyCol).as("_k"))
    val w = Window.partitionBy("_g").orderBy(col("_x"), col("_k"))
    t.withColumn("_b", ntile(k).over(w))
      .groupBy(col("_g"), col("_b"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("_x")).as("lo_cents"),
        max(col("_x")).as("hi_cents"))
      .select(col("_g").as(groupCol), col("_b").as("bucket"),
        col("n_rows"), col("lo_cents"), col("hi_cents"))
      .orderBy(groupCol, "bucket")
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    /** q243: EQUI-DEPTH HISTOGRAM [T stats surface] — per order
      * priority: 4 buckets of near-equal count over cent-scaled
      * order totals, each with its ACTUAL value boundaries — the
      * ANALYZE-style stats an optimizer consumes (selectivity from
      * depth, boundaries from data), complementing the equi-WIDTH
      * q87 (fixed ranges, varying counts). ntile over the unique
      * (cents, orderkey) order is SQL-standard and engine-identical. */
    "q_agg_histogram_eqdepth" -> ((s, d) =>
      eqDepthHistogram(
        orders(s, d).select(col("o_orderpriority"),
          (Dec.dec2(col("o_totalprice")) * 100).cast("long").as("cents"),
          col("o_orderkey")),
        "o_orderpriority", "cents", "o_orderkey", k = 4)),

    /** q244: GROUPING_ID SUBTOTAL DISAMBIGUATION [T relational
      * surface] — the rollup correctness tool q20 left implicit: a
      * rollup over nullable-looking dims cannot distinguish a data
      * NULL from a subtotal NULL by inspection; grouping_id's
      * standard bit vector (1 bit per dim, set when the dim is
      * rolled up) makes every subtotal level explicit and
      * engine-identical. Rollup over (returnflag, linestatus) with
      * counts and exact cent sums per level. */
    "q_agg_grouping_id" -> ((s, d) =>
      lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"),
          (Dec.dec2(col("l_extendedprice")) * 100).cast("long")
            .as("cents"))
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"),
          count(lit(1)).as("n_rows"),
          sum(col("cents")).as("cents_sum"))
        .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))),

    /** q245: TIME-INTERVAL RANGE FRAME [T window surface] — per
      * event: count and exact cent sum of the SAME user's events in
      * the trailing ONE HOUR, via a RANGE frame bounded by a
      * calendar INTERVAL on the timestamp order — the time-based
      * frame q79's numeric RANGE cannot express without manual
      * epoch conversion. RANGE (not ROWS) makes tied timestamps
      * peers in both engines, so the frame content is deterministic
      * even under ts duplicates. One user-keyed exchange + sort. */
    "q_win_time_range" -> ((s, d) => {
      events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          floor(col("value") * lit(100)).cast("long").as("cents"))
        .selectExpr("event_id", "user_id", "ts",
          """count(*) OVER (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW)
             AS n_1h""",
          """sum(cents) OVER (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW)
             AS cents_1h""")
        .orderBy("event_id")
    }),

    /** q246: WEEK-OVER-WEEK TOP MOVERS [T time-series analytics] —
      * per ISO week and event type: this week's count, the previous
      * observed week's (lag over the contiguous weekly series), the
      * exact delta, and the rank of that delta within the week
      * (unique (delta desc, type) order) — the "what changed"
      * dashboard readout. Facts reduce to |weeks|·|types| in ONE
      * exchange; windows run on the dimension. First observed week
      * is excluded (no predecessor). */
    "q_ts_top_movers" -> ((s, d) => {
      val weekly = events(s, d)
        .groupBy(date_trunc("week", col("ts")).cast("date").as("week"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
      val wLag = Window.partitionBy("event_type").orderBy("week")
      val wRank = Window.partitionBy("week")
        .orderBy(col("delta").desc, col("event_type"))
      weekly.withColumn("prev_n", lag(col("n"), 1).over(wLag))
        .filter(col("prev_n").isNotNull)
        .withColumn("delta", col("n") - col("prev_n"))
        .withColumn("rnk", rank().over(wRank))
        .select(col("week"), col("event_type"), col("n"),
          col("prev_n"), col("delta"), col("rnk"))
        .orderBy("week", "rnk")
    }),

    /** q247: VARIANT SEMI-STRUCTURED PATH [T scalar surface] — the
      * Spark-4 VARIANT type end to end: parse_json into the binary
      * variant encoding ONCE, then typed extraction
      * (variant_get(…, '$.k', 'bigint')) and missing-path semantics
      * (try_variant_get on an absent field → NULL, counted per
      * group). The open-schema answer q39's string-re-parsing
      * get_json_object approximates: at 100 TB the variant binary
      * parses once at ingest, and every later extraction is a typed
      * binary probe, not a JSON re-parse. Values are exact BIGINTs
      * — engine-identical. */
    "q_fn_variant" -> ((s, d) => {
      events(s, d)
        .selectExpr("parse_json(props) AS v")
        .selectExpr("variant_get(v, '$.k', 'bigint') AS k",
          "try_variant_get(v, '$.absent', 'bigint') AS miss")
        .groupBy("k")
        .agg(count(lit(1)).as("n"),
          sum(when(col("miss").isNull, 1L).otherwise(0L))
            .as("n_missing"))
        .orderBy("k")
    }),

    /** q248: COLLATION-AWARE GROUPING [T scalar surface] — the
      * Spark-4 collation engine end to end: event types are
      * case-mangled (even event_ids upper-cased), then grouped under
      * UTF8_LCASE so 'CLICK' and 'click' merge WITHOUT a normalizing
      * rewrite of the data — the i18n/dirty-data grouping a plain
      * binary GROUP BY cannot express. The group representative
      * under a case-insensitive collation is first-seen (engine
      * nondeterministic), so the OUTPUT key is lower()-normalized;
      * the upper-variant count per group pins that the merge really
      * crossed case. */
    "q_fn_collate" -> ((s, d) => {
      events(s, d)
        .select(expr("""CASE WHEN event_id % 2 = 0
            THEN upper(event_type) ELSE event_type END""").as("mixed"),
          (col("event_id") % 2 === 0).cast("long").as("was_upper"))
        .groupBy(expr("collate(mixed, 'UTF8_LCASE')").as("tci"))
        .agg(count(lit(1)).as("n"), sum(col("was_upper")).as("n_upper"))
        .select(lower(col("tci")).as("event_type_ci"), col("n"),
          col("n_upper"))
        .orderBy("event_type_ci")
    }))

  def sql: Map[String, String] = Map(

    "q_agg_histogram_eqdepth" ->
      """WITH t AS (
           SELECT o_orderpriority,
                  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                    AS BIGINT) AS cents,
                  o_orderkey
           FROM orders
         ), b AS (
           SELECT o_orderpriority, cents,
                  ntile(4) OVER (PARTITION BY o_orderpriority
                    ORDER BY cents, o_orderkey) AS bucket
           FROM t
         )
         SELECT o_orderpriority, CAST(bucket AS INT) AS bucket,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(min(cents) AS BIGINT) AS lo_cents,
                CAST(max(cents) AS BIGINT) AS hi_cents
         FROM b GROUP BY 1, 2
         ORDER BY o_orderpriority, bucket""",

    "q_agg_grouping_id" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(GROUPING(l_returnflag) * 2
                   + GROUPING(l_linestatus) AS BIGINT) AS gid,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                  * 100 AS BIGINT)) AS BIGINT) AS cents_sum
         FROM lineitem
         GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY gid, l_returnflag, l_linestatus""",

    "q_win_time_range" ->
      """SELECT event_id, user_id, ts,
                CAST(count(*) OVER w AS BIGINT) AS n_1h,
                CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER w
                  AS BIGINT) AS cents_1h
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts
           RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",

    "q_ts_top_movers" ->
      """WITH weekly AS (
           SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
                  event_type, count(*) AS n
           FROM events GROUP BY 1, 2
         ), lagged AS (
           SELECT week, event_type, n,
                  lag(n, 1) OVER (PARTITION BY event_type
                    ORDER BY week) AS prev_n
           FROM weekly
         )
         SELECT week, event_type, CAST(n AS BIGINT) AS n,
                CAST(prev_n AS BIGINT) AS prev_n,
                CAST(n - prev_n AS BIGINT) AS delta,
                CAST(rank() OVER (PARTITION BY week
                  ORDER BY n - prev_n DESC, event_type) AS INT) AS rnk
         FROM lagged WHERE prev_n IS NOT NULL
         ORDER BY week, rnk""",

    "q_fn_variant" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CASE WHEN json_extract(props, '$.absent')
                  IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
         FROM events GROUP BY 1 ORDER BY k""",

    "q_fn_collate" ->
      """SELECT lower(mixed) AS event_type_ci,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(was_upper) AS BIGINT) AS n_upper
         FROM (
           SELECT CASE WHEN event_id % 2 = 0
                    THEN upper(event_type) ELSE event_type END AS mixed,
                  CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END
                    AS was_upper
           FROM events
         ) GROUP BY 1 ORDER BY event_type_ci""")
}
