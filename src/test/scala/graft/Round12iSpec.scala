package graft

import org.apache.spark.sql.functions._

/** Specs for SURVEY §2 rows 226-229: rolling exact distinct
  * (DAU/WAU via bitmap partials), multi-touch attribution, and the
  * signed-incremental maintenance of the 3-sigma anomaly test and
  * of the DAU/WAU partials. */
class Round12iSpec extends SparkSpecBase {

  private def ev = graft.engine.Tables.events(spark, sfDir)

  test("q_events_dau_wau: WAU ≥ DAU ≥ 1 on every day; days cover fixture") {
    val rows = SparkEntry.queries("q_events_dau_wau")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dau, wau) = (r.getLong(1), r.getLong(2))
      assert(dau >= 1 && wau >= dau,
        s"day ${r.get(0)}: dau=$dau wau=$wau")
    }
    val nDays = ev.select(to_date(col("ts"))).distinct().count()
    assert(rows.length == nDays)
  }

  test("dauWau: random sparse timelines ≡ brute-force trailing-window distinct") {
    // random-structure property: users across many blocks (gaps),
    // days with calendar holes — RANGE framing must use value
    // arithmetic, and grid densification must carry a block's users
    // into windows of days where the block itself has no row.
    val rnd = new scala.util.Random(922)
    import spark.implicits._
    val rows = Seq.tabulate(3000) { _ =>
      val day = 19700 + rnd.nextInt(40) * (1 + rnd.nextInt(2)) // holes
      (rnd.nextInt(900).toLong, day)
    }
    val df = rows.toDF("user_id", "dnum")
      .select(col("user_id"),
        expr("date_add(DATE '1970-01-01', CAST(dnum AS INT))")
          .cast("timestamp").as("ts"))
    val got = ops.Analytics.dauWau(ops.Analytics.dailyBitmaps(df))
      .collect()
      .map(r => r.getDate(0).toLocalDate.toEpochDay.toInt ->
        (r.getLong(1), r.getLong(2))).toMap
    val byDay = rows.groupBy(_._2)
    val expected = byDay.map { case (d, rs) =>
      val wau = byDay.filter { case (d2, _) => d2 >= d - 6 && d2 <= d }
        .values.flatten.map(_._1).toSet.size.toLong
      d -> (rs.map(_._1).distinct.size.toLong, wau)
    }
    assert(got == expected)
  }

  test("q_events_attribution: per-kind credits sum to |purchases|") {
    val rows = SparkEntry.queries("q_events_attribution")(spark, sfDir)
      .collect()
    val nPurch = ev.filter(col("event_type") === "purchase").count()
    assert(rows.map(_.getLong(1)).sum == nPurch, "last-touch total")
    assert(rows.map(_.getLong(2)).sum == nPurch, "first-touch total")
    val channels = rows.map(_.getString(0)).toSet
    assert(channels.subsetOf(Set("view", "click", "none")))
  }

  test("attribution: random timelines ≡ brute-force window scan") {
    val rnd = new scala.util.Random(4451)
    import spark.implicits._
    val types = Array("view", "click", "purchase", "error")
    val rows = Seq.tabulate(2500) { i =>
      (i.toLong, rnd.nextInt(40).toLong,
        types(rnd.nextInt(types.length)),
        1700000000000000L + rnd.nextInt(20 * 86400) * 1000000L)
    }
    val df = rows.toDF("event_id", "user_id", "event_type", "tsu")
      .select(col("event_id"), col("user_id"), col("event_type"),
        timestamp_micros(col("tsu")).as("ts"))
    val got = ops.Analytics.attribution(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // brute force: per purchase, scan the user's touches in window
    val look = 7L * 86400 * 1000000
    val byUser = rows.groupBy(_._2)
    var lastC = Map.empty[String, Long].withDefaultValue(0L)
    var firstC = Map.empty[String, Long].withDefaultValue(0L)
    rows.filter(_._3 == "purchase").foreach { case (_, u, _, ptsu) =>
      val cand = byUser(u).filter(e =>
        (e._3 == "view" || e._3 == "click") &&
          e._4 <= ptsu && ptsu - e._4 <= look)
      val lc = if (cand.isEmpty) "none"
        else cand.maxBy(e => (e._4, e._1))._3
      val fc = if (cand.isEmpty) "none"
        else cand.minBy(e => (e._4, e._1))._3
      lastC += lc -> (lastC(lc) + 1)
      firstC += fc -> (firstC(fc) + 1)
    }
    val expected = (lastC.keySet ++ firstC.keySet)
      .map(c => c -> (lastC(c), firstC(c))).toMap
    assert(got == expected)
  }

  test("q_incr_anomaly_sigma: maintenance ≡ batch recompute over post") {
    val post = ev.filter(col("event_id") % 10 =!= 1)
    val batch = ops.Analytics.anomalySigma(post)
    val got = SparkEntry.queries("q_incr_anomaly_sigma")(spark, sfDir)
    assert(got.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(got).count() == 0)
    assert(got.count() > 0)
  }

  test("q_incr_dau_wau: maintenance ≡ batch recompute; untouched cells pass through") {
    val post = ev.filter(col("event_id") % 10 =!= 1)
    val batch = ops.Analytics.dauWau(ops.Analytics.dailyBitmaps(post))
    val got = SparkEntry.queries("q_incr_dau_wau")(spark, sfDir)
    assert(got.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(got).count() == 0)
    // pass-through pin: every base (dnum, blk) word OUTSIDE the
    // touched cell set must appear verbatim among the post words —
    // the delta-proportionality argument.
    val base = ev.filter(col("event_id") % 10 =!= 0)
    val touched = ev.filter(col("event_id") % 10 === 0 ||
        col("event_id") % 10 === 1)
      .select(datediff(to_date(col("ts")), lit("1970-01-01")).as("dnum"),
        expr("(user_id - pmod(user_id, 32)) div 32").as("blk"))
      .distinct()
    val untouchedBase = ops.Analytics.dailyBitmaps(base)
      .join(touched, Seq("dnum", "blk"), "left_anti")
    val postWords = ops.Analytics.dailyBitmaps(post)
    assert(untouchedBase.exceptAll(postWords).count() == 0,
      "untouched base words must be verbatim post words")
  }
}
