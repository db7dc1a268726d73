package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.engine.Tables._
import graft.engine.Dec

/** Round-12 batch 11 (SURVEY §2 rows 237-241): exact-rational Gini
  * concentration, per-node clustering coefficients on the
  * co-purchase graph, rolling exact medians over trailing windows,
  * and the exact-integer chi-square A/B test with its pure
  * signed-sum incremental maintenance.
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
  * semantics follow SURVEY §2 rows 237-241.
  */
object Round12g {

  private val D38 = DecimalType(38, 0)

  private val dfMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), DataFrame]
  graft.engine.Memos.register { () =>
    dfMemo.values.foreach(_.unpersist(blocking = false)); dfMemo.clear()
  }

  // ---------------------------------------------------------------
  // chi-square A/B kernel
  // ---------------------------------------------------------------

  /** Per-type arm counts (a = this type in arm 0, c = in arm 1) —
    * the fact-sized stage; ONE partial-aggregated exchange to
    * |types| rows. The counts are INVERTIBLE (plain sums), which is
    * what makes q241's signed-sum maintenance possible. */
  def chisqCounts(ev: DataFrame): DataFrame =
    ev.groupBy("event_type")
      .agg(sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L))
        .as("a"),
        sum(when(col("user_id") % 2 =!= 0, 1L).otherwise(0L))
        .as("c"))

  /** Counts → 2×2 chi-square per type, decided ENTIRELY in exact
    * integers: χ² = N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)) with
    * b/d the arm totals minus a/c; significance at α=0.05 is the
    * cross-multiplied 1000·num > 3841·den (χ²₀.₀₅,₁ = 3.841). The
    * rational emits as digit strings (q230 discipline). Overflow
    * bound: num ≈ N·(N·N)² needs N ≲ 10⁷ per arm-type cell for
    * DECIMAL(38,0)/HUGEINT — beyond that, test a uniform sample
    * (the statistic saturates long before). */
  def chisqFinalize(p: DataFrame): DataFrame = {
    val tot = p.agg(sum("a").cast(D38).as("ta"),
      sum("c").cast(D38).as("tc"))
    p.crossJoin(broadcast(tot))
      .withColumn("b", (col("ta") - col("a")).cast(D38))
      .withColumn("dd", (col("tc") - col("c")).cast(D38))
      .withColumn("ad", (col("a").cast(D38) * col("dd")).cast(D38))
      .withColumn("bc", (col("b") * col("c").cast(D38)).cast(D38))
      .withColumn("num", ((col("ta") + col("tc")).cast(D38) *
        ((col("ad") - col("bc")) * (col("ad") - col("bc"))).cast(D38))
        .cast(D38))
      .withColumn("den", ((col("a") + col("b")).cast(D38) *
        (col("c") + col("dd")).cast(D38) *
        (col("a") + col("c")).cast(D38) *
        (col("b") + col("dd")).cast(D38)).cast(D38))
      .select(col("event_type"),
        col("a").cast("long").as("arm0_type"),
        col("b").cast("long").as("arm0_rest"),
        col("c").cast("long").as("arm1_type"),
        col("dd").cast("long").as("arm1_rest"),
        col("num").cast("string").as("chisq_num"),
        col("den").cast("string").as("chisq_den"),
        (col("num") * 1000 > col("den") * 3841).as("significant"))
      .orderBy("event_type")
  }

  /** Per-group exact-rational Gini over cent amounts:
    * G = (2·Σi·x − (n+1)·Σx) / (n·Σx) with i the 1-based rank under
    * the unique (cents, key) order. One window rank + one aggregate
    * over a single group-keyed exchange. */
  def gini(df: DataFrame, groupCol: String, centsCol: String,
           keyCol: String): DataFrame = {
    // Project caller columns onto collision-proof internal names
    // first: a caller column literally named "i"/"n"/"sx" must not
    // be clobbered by the rank/aggregate intermediates.
    val t = df.select(col(groupCol).as("_g"), col(centsCol).as("_x"),
      col(keyCol).as("_k"))
    val w = Window.partitionBy("_g").orderBy(col("_x"), col("_k"))
    t.withColumn("_i", row_number().over(w))
      .groupBy("_g")
      .agg(count(lit(1)).as("_n"),
        sum(col("_x").cast(D38)).as("_sx"),
        sum(col("_i").cast(D38) * col("_x").cast(D38)).as("_six"))
      .select(col("_g").as(groupCol), col("_n").as("n_rows"),
        (lit(2).cast(D38) * col("_six")
          - (col("_n") + 1).cast(D38) * col("_sx")).cast(D38)
          .cast("string").as("gini_num"),
        (col("_n").cast(D38) * col("_sx")).cast(D38)
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
        .localCheckpoint() // read twice: orientation + output join
      val tri = Triangles.triangleVertices(e, Some(deg))
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
    }),

    /** q240: EXACT-INTEGER CHI-SQUARE A/B TEST [T analytics surface]
      * — per event type: the 2×2 contingency (hash arm × this-type/
      * rest) and its χ² independence test decided entirely in exact
      * integer arithmetic — N·(ad−bc)² vs the product of marginals,
      * significance at α=0.05 via the cross-multiplied
      * 1000·num > 3841·den. No float rates, no float χ²: both
      * engines take the identical verdict. The always-on experiment
      * readout, in the engine's integer-exact discipline. */
    "q_events_chisq" -> ((s, d) =>
      chisqFinalize(chisqCounts(events(s, d)))),

    /** q241: PURE SIGNED-SUM INCREMENTAL CHI-SQUARE [P one-step
      * incremental] — q240 maintained under the event delta by
      * SIGNED ADDITION ALONE (the q231 rule on a statistical test):
      * the per-type arm counts are invertible sums, so maintained
      * counts = stored partials + counts(inserts) − counts(deletes),
      * and the |types|-bounded finalize re-runs on the maintained
      * counts — the always-on A/B dashboard never re-reads history.
      * Oracle = batch q240 over post-delta ⇒ hash proves
      * maintenance ≡ recompute. */
    "q_incr_chisq" -> ((s, d) => {
      val ev = events(s, d)
      val base = ev.filter(col("event_id") % 10 =!= 0)
      val ins = ev.filter(col("event_id") % 10 === 0)
      val del = ev.filter(col("event_id") % 10 === 1)
      val baseP = dfMemo.getOrElseUpdate((s, d, "chisq_counts"), {
        val p = chisqCounts(base).persist()
        p.count(); p
      })
      def signed(p: DataFrame, sgn: Int) =
        p.select(col("event_type"),
          (col("a") * sgn).as("a"), (col("c") * sgn).as("c"))
      val merged = signed(baseP, 1)
        .unionByName(signed(chisqCounts(ins), 1))
        .unionByName(signed(chisqCounts(del), -1))
        .groupBy("event_type")
        .agg(sum("a").as("a"), sum("c").as("c"))
        .filter(col("a") + col("c") > 0)
      chisqFinalize(merged)
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
         ) ORDER BY user_id, day""",

    "q_events_chisq" -> chisqSql("events"),

    "q_incr_chisq" -> chisqSql(
      "(SELECT * FROM events WHERE event_id % 10 <> 1)"))

  /** q240's oracle over any events relation — rel-parameterized so
    * q241's post-delta oracle is built by construction. */
  def chisqSql(rel: String): String =
    s"""WITH p AS (
          SELECT event_type,
                 sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS a,
                 sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS c
          FROM $rel GROUP BY 1
        ), t AS (
          SELECT sum(a) AS ta, sum(c) AS tc FROM p
        ), f AS (
          SELECT p.event_type, p.a, t.ta - p.a AS b, p.c,
                 t.tc - p.c AS dd, t.ta + t.tc AS n
          FROM p, t
        ), g AS (
          SELECT event_type, a, b, c, dd,
                 n * (a * dd - b * c) * (a * dd - b * c) AS num,
                 (a + b) * (c + dd) * (a + c) * (b + dd) AS den
          FROM f
        )
        SELECT event_type,
               CAST(a AS BIGINT) AS arm0_type,
               CAST(b AS BIGINT) AS arm0_rest,
               CAST(c AS BIGINT) AS arm1_type,
               CAST(dd AS BIGINT) AS arm1_rest,
               CAST(num AS VARCHAR) AS chisq_num,
               CAST(den AS VARCHAR) AS chisq_den,
               num * 1000 > den * 3841 AS significant
        FROM g ORDER BY event_type"""
}
