package graft

import org.apache.spark.sql.functions._

/** Facade coverage for the round-12 analytics kernels (rows
  * 219-242): each adapter must reproduce its oracle-verified
  * declared-query output when fed the fixture under CALLER column
  * names (the rename path is what the facade adds — prove it). */
class FacadeSpec5 extends SparkSpecBase {

  private def ev = graft.engine.Tables.events(spark, sfDir)
  private def evRenamed = ev.select(
    col("event_id").as("eid"), col("user_id").as("uid"),
    col("ts").as("when"), col("event_type").as("kind"),
    col("value").as("amount"))

  private def sameRows(a: org.apache.spark.sql.DataFrame,
                       b: org.apache.spark.sql.DataFrame): Unit = {
    assert(a.exceptAll(b).count() == 0)
    assert(b.exceptAll(a).count() == 0)
  }

  test("bitmapBlocks adapter ≡ kernel on fixture columns") {
    sameRows(
      Graft.bitmapBlocks(evRenamed, "kind", "uid"),
      ops.Analytics.bitmapBlocks(ev))
  }

  test("rfmSegments adapter ≡ declared q_events_rfm") {
    sameRows(
      Graft.rfmSegments(evRenamed, "uid", "when", "amount"),
      SparkEntry.queries("q_events_rfm")(spark, sfDir))
  }

  test("dauWau adapter ≡ declared q_events_dau_wau") {
    sameRows(
      Graft.dauWau(evRenamed, "uid", "when"),
      SparkEntry.queries("q_events_dau_wau")(spark, sfDir))
  }

  test("attribution defaults ≡ declared; custom taxonomy closes") {
    sameRows(Graft.attribution(ev),
      SparkEntry.queries("q_events_attribution")(spark, sfDir))
    val custom = Graft.attribution(ev, convType = "signup",
      touchTypes = Seq("error"), lookbackUs = 3L * 24 * 3600 * 1000000)
      .collect()
    val nSignup = ev.filter(col("event_type") === "signup").count()
    assert(custom.map(_.getLong(1)).sum == nSignup)
    assert(custom.map(_.getString(0)).toSet.subsetOf(
      Set("error", "none")))
  }

  test("lifecycle adapter ≡ declared q_events_lifecycle") {
    sameRows(
      Graft.lifecycle(evRenamed, "uid", "when"),
      SparkEntry.queries("q_events_lifecycle")(spark, sfDir))
  }

  test("linreg generic ≡ BigInt brute force on a random frame") {
    val rnd = new scala.util.Random(6612)
    import spark.implicits._
    val rows = Seq.tabulate(500)(_ =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(1000).toLong,
        rnd.nextInt(100000).toLong))
    val got = Graft.linreg(rows.toDF("g", "x", "y"), "g", "x", "y")
      .collect()
    val byG = rows.groupBy(_._1)
    got.foreach { r =>
      val rs = byG(r.getString(0))
      val n = BigInt(rs.length)
      val sx = rs.map(t => BigInt(t._2)).sum
      val sy = rs.map(t => BigInt(t._3)).sum
      val sxy = rs.map(t => BigInt(t._2) * BigInt(t._3)).sum
      val sxx = rs.map(t => BigInt(t._2) * BigInt(t._2)).sum
      assert(BigInt(r.getString(2)) == n * sxy - sx * sy)
      assert(BigInt(r.getString(3)) == n * sxx - sx * sx)
    }
  }

  test("chisq adapter ≡ declared q_events_chisq") {
    sameRows(
      Graft.chisq(evRenamed, "kind", "uid"),
      SparkEntry.queries("q_events_chisq")(spark, sfDir))
  }

  test("freqSpectrum / outlierIqr / anomalySigma adapters ≡ declared") {
    sameRows(
      Graft.freqSpectrum(graft.engine.Tables.documents(spark, sfDir)
        .select(col("text").as("body")), "body"),
      SparkEntry.queries("q_text_freq_spectrum")(spark, sfDir))
    sameRows(
      Graft.outlierIqr(evRenamed, "uid", "when"),
      SparkEntry.queries("q_events_outlier_iqr")(spark, sfDir))
    sameRows(
      Graft.anomalySigma(evRenamed, "uid", "when").orderBy("user_id"),
      SparkEntry.queries("q_events_anomaly_sigma")(spark, sfDir))
  }
}
