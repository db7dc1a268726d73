package graft

import org.apache.spark.sql.functions._

/** Specs for SURVEY §2 row 242: Z-order clustered layout with 2-D
  * box pruning. */
class Round12mSpec extends SparkSpecBase {

  test("zOf: Morton interleave is a bijection on the 16×16 grid") {
    val all = for { x <- 0 until 16; y <- 0 until 16 }
      yield ops.Round12h.zOf(x, y)
    assert(all.distinct.size == 256)
    assert(all.min == 0 && all.max == 255)
    // locality sanity: adjacent cells in x differ in interleaved
    // even/odd bit positions only
    assert(ops.Round12h.zOf(0, 0) == 0)
    assert(ops.Round12h.zOf(1, 0) == 2)
    assert(ops.Round12h.zOf(0, 1) == 1)
  }

  test("zCol ≡ zOf on the full grid") {
    import spark.implicits._
    val df = (for { x <- 0 until 16; y <- 0 until 16 } yield (x, y))
      .toDF("x", "y")
      .withColumn("z", ops.Round12h.zCol(col("x"), col("y")))
    val got = df.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getInt(2)).toMap
    for { x <- 0 until 16; y <- 0 until 16 }
      assert(got((x, y)) == ops.Round12h.zOf(x, y))
  }

  test("q_scan_zorder: result ≡ unpruned plain filter; plan prunes on zb") {
    val got = SparkEntry.queries("q_scan_zorder")(spark, sfDir)
    val plain = graft.engine.Tables.events(spark, sfDir)
      .filter(col("user_id").between(3, 8) &&
        to_date(col("ts")).between(lit("2024-01-08"), lit("2024-01-21")))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(floor(col("value") * lit(100)).cast("long"))
          .as("value_cents_sum"))
    assert(got.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(got).count() == 0)
    assert(got.collect()(0).getLong(0) > 0, "box must be non-empty")
    // the scan must carry a partition filter on the Z code — the
    // pruning is in the plan, not just the result
    val planStr = got.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") && planStr.contains("zb"),
      "executed plan must partition-prune on zb")
  }

  test("q_scan_zorder: candidate cell set is a strict subset of the grid") {
    // re-derive the candidate enumeration the query performs: the
    // box rectangle in cell space must cover far fewer than all 256
    // cells (that strictness IS the skipping claim)
    SparkEntry.queries("q_scan_zorder")(spark, sfDir).collect()
    val ev = graft.engine.Tables.events(spark, sfDir)
      .withColumn("dnum", datediff(to_date(col("ts")), lit("1970-01-01")))
    val r = ev.agg(max("user_id"), min("dnum"), max("dnum")).collect()(0)
    val (maxU, minD, maxD) = (r.getLong(0), r.getInt(1), r.getInt(2))
    def dnumOf(s: String) = java.time.LocalDate.parse(s).toEpochDay.toInt
    val uxs = (3L * 16 / (maxU + 1)).toInt to (8L * 16 / (maxU + 1)).toInt
    val dxs = ((dnumOf("2024-01-08") - minD) * 16 / (maxD - minD + 1)) to
      ((dnumOf("2024-01-21") - minD) * 16 / (maxD - minD + 1))
    val cand = (for { x <- uxs; y <- dxs } yield ops.Round12h.zOf(x, y))
      .distinct
    assert(cand.nonEmpty && cand.size < 256,
      s"candidates ${cand.size} must be a strict subset")
  }
}
