package graft

import org.apache.spark.sql.functions._

/** Specs for SURVEY §2 rows 234-236: IQR outlier detection, the
  * trigram frequency spectrum, and signed-incremental lifecycle. */
class Round12kSpec extends SparkSpecBase {

  private def ev = graft.engine.Tables.events(spark, sfDir)

  test("q_events_outlier_iqr: ≡ brute-force sorted-quartile recompute") {
    val got = SparkEntry.queries("q_events_outlier_iqr")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
      .toMap
    val daily = ev
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    // brute force: exact interpolated quartile at index f*(n-1)
    def quart(sorted: Array[Long], f: Double): Double = {
      val pos = f * (sorted.length - 1)
      val lo = pos.toInt
      val frac = pos - lo
      if (lo + 1 < sorted.length)
        sorted(lo) + (sorted(lo + 1) - sorted(lo)) * frac
      else sorted(lo).toDouble
    }
    val expected = daily.groupBy(_._1).map { case (u, rows) =>
      val cs = rows.map(_._2).sorted
      val (p25, p75) = (quart(cs, 0.25), quart(cs, 0.75))
      val fence = p75 + (p75 - p25) * 1.5
      u -> (cs.length.toLong, p25, p75, cs.count(_ > fence).toLong)
    }
    assert(got == expected)
  }

  test("q_text_freq_spectrum: spectrum identities on the fixture") {
    val rows = SparkEntry.queries("q_text_freq_spectrum")(spark, sfDir)
      .collect()
    assert(rows.length > 1, "spectrum must have multiple buckets")
    rows.filter(_.getLong(0) <= 10).foreach { r =>
      assert(r.getLong(0) * r.getLong(1) == r.getLong(2),
        s"bucket ${r.getLong(0)}: k·n_grams must equal occurrences")
    }
    // total occurrences = total trigram count over the corpus
    val totalTri = graft.engine.Tables.documents(spark, sfDir)
      .select((greatest(size(split(col("text"), " ")) - 2, lit(0)))
        .as("k"))
      .agg(sum("k")).collect()(0).getLong(0)
    assert(rows.map(_.getLong(2)).sum == totalTri)
  }

  test("freqSpectrum: hapax count on a constructed corpus") {
    import spark.implicits._
    // doc1 has trigram "a b c" twice (via overlap with doc2), the
    // rest are hapax
    val docs = Seq((1L, "a b c d"), (2L, "a b c")).toDF("doc_id", "text")
    val got = ops.Analytics.freqSpectrum(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // trigrams: doc1 -> "a b c", "b c d"; doc2 -> "a b c"
    assert(got == Map(1L -> (1L, 1L), 2L -> (1L, 2L)))
  }

  test("q_incr_lifecycle: maintenance ≡ batch recompute over post") {
    val post = ev.filter(col("event_id") % 10 =!= 1)
    val batch = ops.Analytics.lifecycle(post)
    val got = SparkEntry.queries("q_incr_lifecycle")(spark, sfDir)
    assert(got.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(got).count() == 0)
    assert(got.count() > 0)
  }
}
