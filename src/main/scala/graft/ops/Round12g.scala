package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.engine.Tables._
import graft.engine.Dec

/** Round-12 batch 11 (SURVEY §2 rows 237-239): exact-rational Gini
  * concentration, per-node clustering coefficients on the
  * co-purchase graph, and rolling exact medians over trailing
  * windows.
  *
  * Determinism: Gini follows the q230 exact-rational discipline
  * (rank-weighted DECIMAL(38,0) sums; the rational emits as digit
  * strings) — its value is permutation-invariant among tied amounts
  * because equal x contribute the same Σi·x under any tie order, and
  * the (cents, orderkey) sort is unique anyway; clustering
  * coefficients emit the (2·tri, deg·(deg−1)) rational in BIGINT;
  * the rolling median interpolates at 0.5 over BIGINT counts — a
  * power-of-two fraction, bitwise identical across engines (q182's
  * argument).
  *
  * The reference tree at /root/reference is absent (SURVEY.md §0);
  * semantics follow SURVEY §2 rows 237-239.
  */
object Round12g {

  private val D38 = DecimalType(38, 0)

  /** Per-group exact-rational Gini over cent amounts:
    * G = (2·Σi·x − (n+1)·Σx) / (n·Σx) with i the 1-based rank under
    * the unique (cents, key) order. One window rank + one aggregate
    * over a single group-keyed exchange. */
  def gini(df: DataFrame, groupCol: String, centsCol: String,
           keyCol: String): DataFrame = {
    val w = Window.partitionBy(groupCol)
      .orderBy(col(centsCol), col(keyCol))
    df.withColumn("i", row_number().over(w))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        sum(col(centsCol).cast(D38)).as("sx"),
        sum(col("i").cast(D38) * col(centsCol).cast(D38)).as("six"))
      .select(col(groupCol), col("n").as("n_rows"),
        (lit(2).cast(D38) * col("six")
          - (col("n") + 1).cast(D38) * col("sx")).cast(D38)
          .cast("string").as("gini_num"),
        (col("n").cast(D38) * col("sx")).cast(D38)
          .cast("string").as("gini_den"))
      .orderBy(groupCol)
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    /** q237: EXACT-RATIONAL GINI CONCENTRATION [T analytics surface]
      * — revenue concentration per order priority: the Gini
      * coefficient of order totals, in the q230 exact-rational
      * discipline (the digit-string (num, den) IS the portable
      * answer; num/den ∈ [0,1) at display time). Rank-weighted sums
      * run in DECIMAL(38,0); the rank is a window over the UNIQUE
      * (cents, orderkey) order — and Gini is tie-permutation
      * invariant regardless. One window sort + one aggregate per
      * group-keyed exchange. */
    "q_agg_gini" -> ((s, d) =>
      gini(orders(s, d)
        .select(col("o_orderpriority"),
          (Dec.dec2(col("o_totalprice")) * 100).cast("long").as("cents"),
          col("o_orderkey")),
        "o_orderpriority", "cents", "o_orderkey")),

    /** q238: CLUSTERING COEFFICIENTS [T graph analytics] — per node
      * of the strong co-purchase graph (q83's structure): degree,
      * triangle count, and the local clustering coefficient as the
      * exact rational (2·tri, deg·(deg−1)) — how tightly each part's
      * co-purchase neighborhood closes. Per-node triangle incidences
      * come from the degree-ordered node-iterator (Σ outdeg² wedges,
      * one closing shuffle join — never an all-pairs or a broadcast
      * of a fact-sized edge list). Nodes with degree < 2 are
      * excluded (coefficient undefined). */
    "q_graph_clustering" -> ((s, d) => {
      val e = Round3.strongEdges(s, d)
      val deg = e.select(col("a").as("node"))
        .unionAll(e.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("degree"))
      val tri = Triangles.triangleVertices(e)
        .groupBy("node").agg(count(lit(1)).as("n_tri"))
      deg.join(tri, Seq("node"), "left")
        .filter(col("degree") >= 2)
        .select(col("node"), col("degree"),
          coalesce(col("n_tri"), lit(0L)).as("n_tri"),
          (coalesce(col("n_tri"), lit(0L)) * 2).as("coeff_num"),
          (col("degree") * (col("degree") - 1)).as("coeff_den"))
        .orderBy("node")
    }),

    /** q239: ROLLING EXACT MEDIAN [N time-series] — per user-day:
      * the day's count and the exact median of the trailing 7 daily
      * counts (ROWS frame over the unique (user, day) order) — the
      * robust smoother for burst-tolerant trend lines. The 0.5
      * interpolation is a power-of-two fraction over BIGINTs —
      * bitwise identical across engines. One user-keyed exchange,
      * |users|·|days|-bounded. */
    "q_ts_rolling_median" -> ((s, d) => {
      val daily = events(s, d)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(-6, 0)
      // percentile, not median: Spark's median aggregate rejects a
      // window frame (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC);
      // percentile(·, 0.5) is the same exact statistic and frames
      // fine.
      daily.withColumn("med7", percentile(col("cnt"), lit(0.5)).over(w))
        .orderBy("user_id", "day")
    }))

  def sql: Map[String, String] = Map(

    "q_agg_gini" ->
      """WITH t AS (
           SELECT o_orderpriority,
                  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                    AS BIGINT) AS cents,
                  o_orderkey,
                  row_number() OVER (PARTITION BY o_orderpriority
                    ORDER BY CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT), o_orderkey) AS i
           FROM orders
         ), p AS (
           SELECT o_orderpriority, count(*) AS n, sum(cents) AS sx,
                  sum(i * cents) AS six
           FROM t GROUP BY 1
         )
         SELECT o_orderpriority, CAST(n AS BIGINT) AS n_rows,
                CAST(2 * six - (n + 1) * sx AS VARCHAR) AS gini_num,
                CAST(n * sx AS VARCHAR) AS gini_den
         FROM p ORDER BY o_orderpriority""",

    "q_graph_clustering" ->
      """WITH op AS (
           SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
         ), pairs AS (
           SELECT a.l_partkey pa, b.l_partkey pb
           FROM op a JOIN op b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         ), e AS (
           SELECT pa, pb FROM pairs GROUP BY pa, pb HAVING count(*) >= 2
         ), deg AS (
           SELECT node, count(*) AS degree FROM (
             SELECT pa AS node FROM e UNION ALL SELECT pb FROM e
           ) GROUP BY node
         ), tri AS (
           SELECT e1.pa AS x, e1.pb AS y, e2.pb AS z
           FROM e e1
           JOIN e e2 ON e1.pb = e2.pa
           JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
         ), tv AS (
           SELECT node, count(*) AS n_tri FROM (
             SELECT x AS node FROM tri
             UNION ALL SELECT y FROM tri
             UNION ALL SELECT z FROM tri
           ) GROUP BY node
         )
         SELECT d.node, CAST(d.degree AS BIGINT) AS degree,
                CAST(coalesce(tv.n_tri, 0) AS BIGINT) AS n_tri,
                CAST(coalesce(tv.n_tri, 0) * 2 AS BIGINT) AS coeff_num,
                CAST(d.degree * (d.degree - 1) AS BIGINT) AS coeff_den
         FROM deg d LEFT JOIN tv ON tv.node = d.node
         WHERE d.degree >= 2
         ORDER BY d.node""",

    "q_ts_rolling_median" ->
      """SELECT user_id, day, CAST(cnt AS BIGINT) AS cnt,
                median(cnt) OVER (PARTITION BY user_id ORDER BY day
                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med7
         FROM (
           SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS cnt
           FROM events GROUP BY 1, 2
         ) ORDER BY user_id, day""")
}
