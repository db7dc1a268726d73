package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables._

/** Round-12 batch 8 (SURVEY §2 rows 226-229): rolling-window exact
  * distinct via the bitmap kernel (DAU/WAU — the sliding-window
  * companion to q219's static bitmap distinct), multi-touch
  * marketing attribution (first/last-touch channel credit), and the
  * signed-incremental maintenance of the 3-sigma anomaly test and
  * of the DAU/WAU partials.
  *
  * Determinism: all bitmap words are BIGINT bit_or over
  * `1 << (user_id % 32)` (bit 31 never reaches the sign bit — see
  * Round12c), attribution picks its touch by the provably UNIQUE
  * order (ts, event_id), and every output is BIGINT counts or DATE —
  * no floats anywhere in the family.
  *
  * The reference tree at /root/reference is absent (SURVEY.md §0);
  * semantics follow SURVEY §2 rows 226-229.
  */
object Round12d {

  private val dfMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), DataFrame]
  graft.engine.Memos.register { () =>
    dfMemo.values.foreach(_.unpersist(blocking = false)); dfMemo.clear()
  }

  // ---------------------------------------------------------------
  // DAU/WAU kernel (rolling exact distinct on bitmap partials)
  // ---------------------------------------------------------------

  /** Per-(day, 32-user block) presence bitmaps — the fact-sized
    * stage and q229's stored state. ONE partial-aggregated shuffle
    * to ≤ |days|·⌈domain/32⌉ words; every later rolling-window set
    * union runs on the words, never on facts. */
  def dailyBitmaps(ev: DataFrame): DataFrame =
    ev.groupBy(
        datediff(to_date(col("ts")), lit("1970-01-01")).as("dnum"),
        expr("user_id div 32").as("blk"))
      .agg(expr("bit_or(shiftleft(1L, CAST(user_id % 32 AS INT)))")
        .as("bm"))

  /** Bitmap partials → per-day exact DAU + trailing-7-day WAU.
    * The partials are densified onto the |days|×|blocks| grid
    * (dimension-sized) so a block absent on day d still contributes
    * its users from d-6..d-1 to d's window; the per-block rolling
    * bit_or runs under a RANGE frame on the day number (calendar
    * gaps handled by value arithmetic, not row offsets); bit_count
    * then sums exactly. Everything after the first exchange is
    * |days|·|blocks|-bounded — at 100 TB the rolling distinct never
    * re-reads facts. */
  def dauWau(daily: DataFrame): DataFrame = {
    val days = daily.select("dnum").distinct()
    val blks = daily.select("blk").distinct()
    val dense = days.crossJoin(blks)
      .join(daily, Seq("dnum", "blk"), "left")
      .withColumn("bm", coalesce(col("bm"), lit(0L)))
    val w = Window.partitionBy("blk").orderBy("dnum")
      .rangeBetween(-6, 0)
    dense
      .withColumn("bm7", expr("bit_or(bm)").over(w))
      .groupBy("dnum")
      .agg(sum(expr("bit_count(bm)")).cast("long").as("dau"),
        sum(expr("bit_count(bm7)")).cast("long").as("wau"))
      .select(expr("date_add(DATE '1970-01-01', CAST(dnum AS INT))")
        .as("day"), col("dau"), col("wau"))
      .orderBy("day")
  }

  // ---------------------------------------------------------------
  // attribution kernel
  // ---------------------------------------------------------------

  /** Per purchase: the first- and last-touch channel among the
    * user's view/click events in the trailing 7-day lookback,
    * picked by min_by/max_by over the UNIQUE (ts, event_id) order;
    * purchases with no touch in window credit 'none'. The join is
    * user-keyed (equi on user_id, band predicate as filter) — at
    * 100 TB the q208 (user, week)-grid band join is the drop-in
    * tightening if per-user histories outgrow a partition. */
  def attribution(ev: DataFrame): DataFrame =
    attributionRollup(attrPerPurchase(ev))

  /** Per conversion: (pid, user_id, last_ch, first_ch) — the
    * fact-sized stage, and q232's per-user-local stored state.
    * Conversion/touch types and the lookback are parameters so the
    * kernel serves any event taxonomy (facade: Graft.attribution). */
  def attrPerPurchase(ev: DataFrame,
                      convType: String = "purchase",
                      touchTypes: Seq[String] = Seq("view", "click"),
                      lookbackUs: Long = 7L * 24 * 3600 * 1000000)
      : DataFrame = {
    val p = ev.filter(col("event_type") === convType)
      .select(col("event_id").as("pid"), col("user_id"),
        unix_micros(col("ts")).as("ptsu"))
    val t = ev.filter(col("event_type").isin(touchTypes: _*))
      .select(col("user_id").as("tuser"), col("event_type").as("ch"),
        unix_micros(col("ts")).as("ttsu"), col("event_id").as("tid"))
    val ord = struct(col("ttsu"), col("tid"))
    // The band predicate must live IN the outer-join condition: a
    // post-join filter would also delete the null-extended row of a
    // purchase whose user has touches but none in window, silently
    // dropping its 'none' credit.
    p.join(t,
        col("user_id") === col("tuser") &&
          col("ttsu") <= col("ptsu") &&
          col("ptsu") - col("ttsu") <= lookbackUs,
        "left")
      .groupBy("pid", "user_id")
      .agg(coalesce(max_by(col("ch"), ord), lit("none")).as("last_ch"),
        coalesce(min_by(col("ch"), ord), lit("none")).as("first_ch"))
  }

  /** Per-purchase credits → per-channel rollup (|channels|-bounded).
    * Unpivots (last, first) into keyed rows so ONE aggregate over a
    * single plan subtree serves both columns — two separate
    * groupBys merged by an outer join would recompute the whole
    * purchase-touch join per branch (visible as two copies of the
    * join in the physical plan). */
  def attributionRollup(attr: DataFrame): DataFrame =
    attr.select(explode(array(
        struct(lit("L").as("kind"), col("last_ch").as("channel")),
        struct(lit("F").as("kind"), col("first_ch").as("channel"))))
      .as("kc"))
      .groupBy(col("kc.channel").as("channel"))
      .agg(sum(when(col("kc.kind") === "L", 1L).otherwise(0L))
        .as("n_last_touch"),
        sum(when(col("kc.kind") === "F", 1L).otherwise(0L))
        .as("n_first_touch"))
      .orderBy("channel")

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    /** q226: ROLLING EXACT DISTINCT — DAU/WAU [N analytics surface]
      * — per day: exact distinct active users that day (DAU) and in
      * the trailing 7 days (WAU), via per-(day, block) bitmap words
      * rolled up under a RANGE-framed bit_or. The classic sliding
      * distinct that COUNT(DISTINCT) OVER cannot express and no
      * sketch answers exactly; here it is one fact exchange + a
      * dimension-sized window. */
    "q_events_dau_wau" -> ((s, d) =>
      dauWau(dailyBitmaps(events(s, d)))),

    /** q227: MULTI-TOUCH ATTRIBUTION [T analytics surface] — per
      * channel (view/click/'none'): how many purchases credit it as
      * last touch and as first touch within a 7-day lookback. The
      * crediting touch is chosen by the UNIQUE (ts, event_id) order
      * so both engines pick the identical event. */
    "q_events_attribution" -> ((s, d) =>
      attribution(events(s, d))),

    /** q228: SIGNED-INCREMENTAL 3-SIGMA ANOMALY [P one-step
      * incremental] — q225 maintained under the event delta by the
      * generic group-recompute rule: the (n, S=Σx, Q=Σx²) stats and
      * the per-day branch are functions of ONE user's timeline, so
      * touched users recompute from post-delta facts while untouched
      * users pass through unread. Oracle = batch q225 over
      * post-delta ⇒ hash proves maintenance ≡ recompute. */
    "q_incr_anomaly_sigma" -> ((s, d) => {
      val ev = events(s, d)
      val base = ev.filter(col("event_id") % 10 =!= 0)
      val post = ev.filter(col("event_id") % 10 =!= 1)
      val affected = ev.filter(col("event_id") % 10 === 0 ||
          col("event_id") % 10 === 1)
        .select("user_id").distinct()
      Round11b.incrGroupRecompute(base, post, Seq("user_id"),
          affected)(Round12c.anomalySigma)
        .orderBy("user_id")
    }),

    /** q229: SIGNED-INCREMENTAL DAU/WAU [P one-step incremental] —
      * q226 maintained under the event delta by the touched-CELL
      * rule (q221's mechanism on the (day, block) grain): a delta
      * row invalidates exactly its own (dnum, blk) word — bit_or is
      * not invertible, so that word recomputes from cell-semi-joined
      * post-delta facts while every untouched word (memoized stored
      * partials) passes through unread; a recompute that empties a
      * cell (or a day) drops it, an insert that opens a new cell
      * creates it. The rolling/rollup stage then runs on the
      * maintained dimension-sized words. Oracle = batch q226 over
      * post-delta ⇒ hash proves maintenance ≡ recompute. */
    "q_incr_dau_wau" -> ((s, d) => {
      val ev = events(s, d)
      val base = ev.filter(col("event_id") % 10 =!= 0)
      val post = ev.filter(col("event_id") % 10 =!= 1)
      val touched = ev.filter(col("event_id") % 10 === 0 ||
          col("event_id") % 10 === 1)
        .select(
          datediff(to_date(col("ts")), lit("1970-01-01")).as("dnum"),
          expr("user_id div 32").as("blk"))
        .distinct()
      val baseP = dfMemo.getOrElseUpdate((s, d, "dauwau_partials"), {
        val p = dailyBitmaps(base).persist()
        p.count(); p
      })
      val keep = baseP
        .join(broadcast(touched), Seq("dnum", "blk"), "left_anti")
      val rec = dailyBitmaps(
        post.withColumn("dnum",
            datediff(to_date(col("ts")), lit("1970-01-01")))
          .withColumn("blk", expr("user_id div 32"))
          .join(broadcast(touched), Seq("dnum", "blk"), "left_semi"))
      dauWau(keep.unionByName(rec))
    }))

  def sql: Map[String, String] = Map(

    "q_events_dau_wau" ->
      """WITH days AS (
           SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
         )
         SELECT d.day,
                CAST((SELECT count(DISTINCT e.user_id) FROM events e
                      WHERE CAST(e.ts AS DATE) = d.day) AS BIGINT)
                  AS dau,
                CAST((SELECT count(DISTINCT e.user_id) FROM events e
                      WHERE CAST(e.ts AS DATE)
                        BETWEEN d.day - 6 AND d.day) AS BIGINT)
                  AS wau
         FROM days d ORDER BY d.day""",

    "q_events_attribution" -> attributionSql("events"),

    "q_incr_anomaly_sigma" ->
      """WITH daily AS (
           SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS x
           FROM events WHERE event_id % 10 <> 1 GROUP BY 1, 2
         ), stats AS (
           SELECT user_id, count(*) AS n, sum(x) AS s,
                  sum(x * x) AS q
           FROM daily GROUP BY 1
         )
         SELECT d.user_id, CAST(st.n AS BIGINT) AS n_days,
                CAST(sum(CASE WHEN (st.n * d.x - st.s)
                    * (st.n * d.x - st.s)
                    > (st.n * st.q - st.s * st.s) * 9
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalous,
                CAST(max(d.x) AS BIGINT) AS max_day_count
         FROM daily d JOIN stats st ON st.user_id = d.user_id
         GROUP BY d.user_id, st.n
         ORDER BY d.user_id""",

    "q_incr_dau_wau" ->
      """WITH post AS (
           SELECT * FROM events WHERE event_id % 10 <> 1
         ), days AS (
           SELECT DISTINCT CAST(ts AS DATE) AS day FROM post
         )
         SELECT d.day,
                CAST((SELECT count(DISTINCT e.user_id) FROM post e
                      WHERE CAST(e.ts AS DATE) = d.day) AS BIGINT)
                  AS dau,
                CAST((SELECT count(DISTINCT e.user_id) FROM post e
                      WHERE CAST(e.ts AS DATE)
                        BETWEEN d.day - 6 AND d.day) AS BIGINT)
                  AS wau
         FROM days d ORDER BY d.day""")

  /** q227's oracle over any events relation — rel-parameterized so
    * q232's post-delta oracle is built by construction, not by
    * string surgery. */
  def attributionSql(rel: String): String =
    s"""WITH p AS (
          SELECT event_id AS pid, user_id, epoch_us(ts) AS ptsu
          FROM $rel WHERE event_type = 'purchase'
        ), t AS (
          SELECT user_id, event_type AS ch, epoch_us(ts) AS ttsu,
                 event_id AS tid
          FROM $rel WHERE event_type IN ('view', 'click')
        ), j AS (
          SELECT p.pid, t.ch, t.ttsu, t.tid
          FROM p JOIN t ON t.user_id = p.user_id
           AND t.ttsu <= p.ptsu
           AND p.ptsu - t.ttsu <= 604800000000
        ), attr AS (
          SELECT p.pid,
                 coalesce(max(CASE WHEN rl = 1 THEN ch END), 'none')
                   AS last_ch,
                 coalesce(max(CASE WHEN rf = 1 THEN ch END), 'none')
                   AS first_ch
          FROM p LEFT JOIN (
            SELECT pid, ch,
                   row_number() OVER (PARTITION BY pid
                     ORDER BY ttsu DESC, tid DESC) AS rl,
                   row_number() OVER (PARTITION BY pid
                     ORDER BY ttsu ASC, tid ASC) AS rf
            FROM j) r ON r.pid = p.pid
          GROUP BY p.pid
        ), lastc AS (
          SELECT last_ch AS channel, count(*) AS n_last
          FROM attr GROUP BY 1
        ), firstc AS (
          SELECT first_ch AS channel, count(*) AS n_first
          FROM attr GROUP BY 1
        )
        SELECT coalesce(l.channel, f.channel) AS channel,
               CAST(coalesce(l.n_last, 0) AS BIGINT) AS n_last_touch,
               CAST(coalesce(f.n_first, 0) AS BIGINT) AS n_first_touch
        FROM lastc l FULL JOIN firstc f ON l.channel = f.channel
        ORDER BY channel"""
}
