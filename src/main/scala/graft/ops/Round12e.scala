package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.engine.Tables._
import graft.engine.Dec

/** Round-12 batch 9 (SURVEY §2 rows 230-233): exact-rational OLS
  * regression aggregates (the SQL-standard REGR_* family in the
  * engine's integer-exact discipline), its PURE signed-sum
  * incremental maintenance (the partials are invertible — the only
  * incremental family that needs NO recompute at all), the
  * signed-incremental form of multi-touch attribution, and per-day
  * user lifecycle accounting (new / returning / churned).
  *
  * Determinism: regression moments are exact DECIMAL(38,0) sums of
  * cent-scaled integers; the slope/intercept are emitted as exact
  * rationals (numerator, denominator) rather than doubles — BIGINT →
  * double conversion above 2^53 is not guaranteed identically
  * rounded across engines, so the rational IS the portable answer
  * (the caller divides at display time). Lifecycle and attribution
  * outputs are BIGINT counts over provably unique orders.
  *
  * The reference tree at /root/reference is absent (SURVEY.md §0);
  * semantics follow SURVEY §2 rows 230-233.
  */
object Round12e {

  private val dfMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), DataFrame]
  graft.engine.Memos.register { () =>
    dfMemo.values.foreach(_.unpersist(blocking = false)); dfMemo.clear()
  }

  // ---------------------------------------------------------------
  // OLS kernel (exact decimal moments)
  // ---------------------------------------------------------------

  private val D38 = DecimalType(38, 0)

  /** Per-group OLS moments (n, Σx, Σy, Σxy, Σx²) over integer
    * (x, y) columns — ONE partial-aggregated exchange to |groups|
    * rows; the classic mergeable (and INVERTIBLE) regression state.
    * Callers supply cent-scaled integers (facade: Graft.linreg);
    * per-row products must stay BIGINT-safe; sums are exact
    * DECIMAL(38,0). */
  def linregMoments(df: DataFrame, groupCol: String,
                    xCol: String, yCol: String): DataFrame = {
    // Cast operands to long BEFORE multiplying: an IntegerType input
    // would wrap its product at 2^31 even when the per-row product
    // honours the documented BIGINT-safe contract.
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    df.groupBy(groupCol)
      .agg(count(lit(1)).cast(D38).as("n"),
        sum(x.cast(D38)).as("sx"),
        sum(y.cast(D38)).as("sy"),
        sum((x * y).cast(D38)).as("sxy"),
        sum((x * x).cast(D38)).as("sxx"))
  }

  /** The q230/q231 instantiation: cent-scaled lineitem
    * (quantity → extendedprice) per return flag. */
  def linregPartials(li: DataFrame): DataFrame =
    linregMoments(
      li.select(col("l_returnflag"),
        (Dec.dec2(col("l_quantity")) * 100).cast("long").as("x"),
        (Dec.dec2(col("l_extendedprice")) * 100).cast("long").as("y")),
      "l_returnflag", "x", "y")

  /** Moments → exact-rational slope and intercept:
    * slope = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²),
    * intercept = (Σy·den − num·Σx) / (n·den). All products stay
    * inside DECIMAL(38,0) at bench scales (documented overflow bound
    * in SURVEY row 230). The rationals emit as DIGIT STRINGS — the
    * only lossless representation both engines and the comparing
    * harness round-trip above 2^63. */
  def linregFinalize(p: DataFrame,
                     groupCol: String = "l_returnflag"): DataFrame =
    p.withColumn("num", (col("n") * col("sxy") - col("sx") * col("sy")).cast(D38))
      .withColumn("den", (col("n") * col("sxx") - col("sx") * col("sx")).cast(D38))
      .select(col(groupCol), col("n").cast("long").as("n_rows"),
        col("num").cast("string").as("slope_num"),
        col("den").cast("string").as("slope_den"),
        (col("sy") * col("den") - col("num") * col("sx")).cast(D38)
          .cast("string").as("icept_num"),
        (col("n") * col("den")).cast(D38).cast("string").as("icept_den"))
      .orderBy(groupCol)

  // ---------------------------------------------------------------
  // lifecycle kernel
  // ---------------------------------------------------------------

  /** Per day: users newly seen, returning, and churning (last active
    * day). Facts reduce once to distinct (user, day); first/last
    * derive on the |users|-bounded dimension; the join back is
    * user-keyed. */
  def lifecycle(ev: DataFrame): DataFrame =
    lifecycleFromActives(activesOf(ev))

  /** Distinct (user, day) — the fact-sized reduction, and q236's
    * user-local stored state. */
  def activesOf(ev: DataFrame): DataFrame =
    ev.select(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01")).as("dnum"))
      .distinct()

  /** Actives → per-day new/returning/churned rollup (all stages
    * |users|- or |days|-bounded). */
  def lifecycleFromActives(actives: DataFrame): DataFrame = {
    val fl = actives.groupBy("user_id")
      .agg(min("dnum").as("first_d"), max("dnum").as("last_d"))
    actives.join(fl, "user_id")
      .groupBy("dnum")
      .agg(
        sum(when(col("dnum") === col("first_d"), 1L).otherwise(0L))
          .as("n_new"),
        sum(when(col("dnum") > col("first_d"), 1L).otherwise(0L))
          .as("n_returning"),
        sum(when(col("dnum") === col("last_d"), 1L).otherwise(0L))
          .as("n_churned"))
      .select(expr("date_add(DATE '1970-01-01', CAST(dnum AS INT))")
        .as("day"), col("n_new"), col("n_returning"), col("n_churned"))
      .orderBy("day")
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    /** q230: EXACT-RATIONAL OLS REGRESSION [T analytics surface] —
      * the SQL-standard REGR_SLOPE/REGR_INTERCEPT family, per
      * l_returnflag over cent-scaled (quantity → extendedprice), in
      * the engine's integer-exact discipline: moments are exact
      * DECIMAL(38,0), the answer is the exact rational (num, den) —
      * portable where a computed double is not (BIGINT→double above
      * 2^53 is not identically rounded across engines). ONE
      * partial-aggregated exchange; |flags|-bounded tail. */
    "q_agg_linreg" -> ((s, d) =>
      linregFinalize(linregPartials(lineitem(s, d)))),

    /** q231: PURE SIGNED-SUM INCREMENTAL OLS [P one-step
      * incremental] — q230 maintained under the lineitem delta
      * (l_orderkey%10: 0=insert, 1=delete) by SIGNED ADDITION ALONE:
      * every moment (count and the four sums) is invertible, so
      * maintained state = stored partials + partials(inserts) −
      * partials(deletes) — no touched-group recompute, no joins, no
      * re-read of any base fact; THE textbook one-step incremental
      * aggregate and the contrast row to the group-recompute family
      * (q224/q228) and the touched-cell family (q221/q229). Oracle =
      * batch q230 over post-delta ⇒ hash proves maintenance ≡
      * recompute. */
    "q_incr_linreg" -> ((s, d) => {
      val li = lineitem(s, d)
      val base = li.filter(col("l_orderkey") % 10 =!= 0)
      val ins = li.filter(col("l_orderkey") % 10 === 0)
      val del = li.filter(col("l_orderkey") % 10 === 1)
      val baseP = dfMemo.getOrElseUpdate((s, d, "linreg_partials"), {
        val p = linregPartials(base).persist()
        p.count(); p
      })
      def signed(p: DataFrame, sgn: Int) =
        p.select(col("l_returnflag"),
          (col("n") * sgn).cast(D38).as("n"),
          (col("sx") * sgn).cast(D38).as("sx"),
          (col("sy") * sgn).cast(D38).as("sy"),
          (col("sxy") * sgn).cast(D38).as("sxy"),
          (col("sxx") * sgn).cast(D38).as("sxx"))
      val merged = signed(baseP, 1)
        .unionByName(signed(linregPartials(ins), 1))
        .unionByName(signed(linregPartials(del), -1))
        .groupBy("l_returnflag")
        .agg(sum("n").cast(D38).as("n"), sum("sx").cast(D38).as("sx"),
          sum("sy").cast(D38).as("sy"), sum("sxy").cast(D38).as("sxy"),
          sum("sxx").cast(D38).as("sxx"))
        .filter(col("n") > 0)
      linregFinalize(merged)
    }),

    /** q232: SIGNED-INCREMENTAL ATTRIBUTION [P one-step incremental]
      * — q227 maintained under the event delta by the group-
      * recompute rule: a purchase's credit depends only on its OWN
      * user's timeline (the 7-day lookback never crosses users), so
      * touched users' per-purchase credits recompute from post-delta
      * facts while untouched users' memoized credits pass through
      * unread; the |channels|-bounded rollup then re-sums. Oracle =
      * batch q227 over post-delta ⇒ hash proves maintenance ≡
      * recompute. */
    "q_incr_attribution" -> ((s, d) => {
      val ev = events(s, d)
      val base = ev.filter(col("event_id") % 10 =!= 0)
      val post = ev.filter(col("event_id") % 10 =!= 1)
      val affected = ev.filter(col("event_id") % 10 === 0 ||
          col("event_id") % 10 === 1)
        .select("user_id").distinct()
      Round12d.attributionRollup(
        Round11b.incrGroupRecomputeMemo(s, d, "attr_credits",
          base, post, Seq("user_id"), affected)(
          df => Round12d.attrPerPurchase(df)))
    }),

    /** q233: USER LIFECYCLE ACCOUNTING [T analytics surface] — per
      * day: newly-seen users, returning users, and churning users
      * (their last active day) — the growth-accounting companion to
      * q226's DAU/WAU (n_new + n_returning = DAU by construction).
      * Facts reduce once to distinct (user, day); everything after
      * runs on the user dimension. */
    "q_events_lifecycle" -> ((s, d) =>
      lifecycle(events(s, d))))

  def sql: Map[String, String] = Map(

    "q_agg_linreg" -> linregSql("lineitem"),

    "q_incr_linreg" -> linregSql(
      "(SELECT * FROM lineitem WHERE l_orderkey % 10 <> 1)"),

    "q_incr_attribution" -> Round12d.attributionSql(
      "(SELECT * FROM events WHERE event_id % 10 <> 1)"),

    "q_events_lifecycle" -> lifecycleSql("events"))

  /** q233's oracle over any events relation — rel-parameterized so
    * q236's post-delta oracle is built by construction. */
  def lifecycleSql(rel: String): String =
    s"""WITH actives AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM $rel
        ), fl AS (
          SELECT user_id, min(day) AS first_d, max(day) AS last_d
          FROM actives GROUP BY 1
        )
        SELECT a.day,
               CAST(sum(CASE WHEN a.day = f.first_d THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_new,
               CAST(sum(CASE WHEN a.day > f.first_d THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_returning,
               CAST(sum(CASE WHEN a.day = f.last_d THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_churned
        FROM actives a JOIN fl f ON f.user_id = a.user_id
        GROUP BY a.day ORDER BY a.day"""

  private def linregSql(rel: String): String =
    s"""WITH t AS (
          SELECT l_returnflag,
                 CAST(CAST(ROUND(l_quantity, 2) AS DECIMAL(18,2)) * 100
                   AS BIGINT) AS x,
                 CAST(CAST(ROUND(l_extendedprice, 2) AS DECIMAL(18,2)) * 100
                   AS BIGINT) AS y
          FROM $rel
        ), p AS (
          SELECT l_returnflag, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                 sum(x * y) AS sxy, sum(x * x) AS sxx
          FROM t GROUP BY 1
        ), f AS (
          SELECT l_returnflag, n, sx, sy,
                 n * sxy - sx * sy AS num,
                 n * sxx - sx * sx AS den
          FROM p
        )
        SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
               CAST(num AS VARCHAR) AS slope_num,
               CAST(den AS VARCHAR) AS slope_den,
               CAST(sy * den - num * sx AS VARCHAR) AS icept_num,
               CAST(n * den AS VARCHAR) AS icept_den
        FROM f ORDER BY l_returnflag"""
}
