package graft

import org.apache.spark.sql.functions._

/** Specs for SURVEY §2 rows 230-233: exact-rational OLS regression,
  * its pure signed-sum incremental maintenance, signed-incremental
  * attribution, and user lifecycle accounting. */
class Round12jSpec extends SparkSpecBase {

  private def ev = graft.engine.Tables.events(spark, sfDir)
  private def li = graft.engine.Tables.lineitem(spark, sfDir)

  test("q_agg_linreg: rationals ≡ brute-force BigInt recompute; den > 0") {
    val got = SparkEntry.queries("q_agg_linreg")(spark, sfDir).collect()
    val raw = li.select(col("l_returnflag"),
        (graft.engine.Dec.dec2(col("l_quantity")) * 100).cast("long"),
        (graft.engine.Dec.dec2(col("l_extendedprice")) * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byFlag = raw.groupBy(_._1)
    assert(got.length == byFlag.size)
    got.foreach { r =>
      val rows = byFlag(r.getString(0))
      val n = BigInt(rows.length)
      val sx = rows.map(t => BigInt(t._2)).sum
      val sy = rows.map(t => BigInt(t._3)).sum
      val sxy = rows.map(t => BigInt(t._2) * BigInt(t._3)).sum
      val sxx = rows.map(t => BigInt(t._2) * BigInt(t._2)).sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      assert(den > 0)
      assert(r.getLong(1) == rows.length)
      assert(BigInt(r.getString(2)) == num, "slope_num")
      assert(BigInt(r.getString(3)) == den, "slope_den")
      assert(BigInt(r.getString(4)) == sy * den - num * sx, "icept_num")
      assert(BigInt(r.getString(5)) == n * den, "icept_den")
    }
  }

  test("q_incr_linreg: signed-sum maintenance ≡ batch recompute over post") {
    val post = li.filter(col("l_orderkey") % 10 =!= 1)
    val batch = ops.Analytics.linregFinalize(
      ops.Analytics.linregPartials(post))
    val got = SparkEntry.queries("q_incr_linreg")(spark, sfDir)
    assert(got.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(got).count() == 0)
    assert(got.count() > 0)
  }

  test("q_incr_attribution: maintenance ≡ batch recompute; untouched credits pass through") {
    val post = ev.filter(col("event_id") % 10 =!= 1)
    val batch = ops.Analytics.attribution(post)
    val got = SparkEntry.queries("q_incr_attribution")(spark, sfDir)
    assert(got.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(got).count() == 0)
    // pass-through pin: untouched users' base per-purchase credits
    // must be verbatim post credits — the delta-proportionality
    // argument.
    val base = ev.filter(col("event_id") % 10 =!= 0)
    val affected = ev.filter(col("event_id") % 10 === 0 ||
        col("event_id") % 10 === 1)
      .select("user_id").distinct()
    val untouched = ops.Analytics.attrPerPurchase(base)
      .join(affected, Seq("user_id"), "left_anti")
    val postCredits = ops.Analytics.attrPerPurchase(post)
    assert(untouched.exceptAll(postCredits).count() == 0,
      "untouched credits must be verbatim post credits")
  }

  test("q_events_lifecycle: totals close; n_new + n_returning = DAU (vs q226)") {
    val rows = SparkEntry.queries("q_events_lifecycle")(spark, sfDir)
      .collect()
    val nUsers = ev.select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nUsers, "Σ n_new = |users|")
    assert(rows.map(_.getLong(3)).sum == nUsers, "Σ n_churned = |users|")
    // cross-query consistency with the DAU/WAU row
    val dau = SparkEntry.queries("q_events_dau_wau")(spark, sfDir)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) == dau(r.getDate(0).toString),
        s"day ${r.get(0)}: new+returning must equal DAU")
    }
  }
}
