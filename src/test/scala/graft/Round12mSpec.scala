package graft

import org.apache.spark.sql.functions._

/** Specs for SURVEY §2 row 242: Z-order clustered layout with 2-D
  * box pruning. */
class Round12mSpec extends SparkSpecBase {

  test("zOf: Morton interleave is a bijection on the 16×16 grid") {
    val all = for { x <- 0 until 16; y <- 0 until 16 }
      yield ops.Layout.zOf(x, y)
    assert(all.distinct.size == 256)
    assert(all.min == 0 && all.max == 255)
    // locality sanity: adjacent cells in x differ in interleaved
    // even/odd bit positions only
    assert(ops.Layout.zOf(0, 0) == 0)
    assert(ops.Layout.zOf(1, 0) == 2)
    assert(ops.Layout.zOf(0, 1) == 1)
  }

  test("zCol ≡ zOf on the full grid") {
    import spark.implicits._
    val df = (for { x <- 0 until 16; y <- 0 until 16 } yield (x, y))
      .toDF("x", "y")
      .withColumn("z", ops.Layout.zCol(col("x"), col("y")))
    val got = df.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getInt(2)).toMap
    for { x <- 0 until 16; y <- 0 until 16 }
      assert(got((x, y)) == ops.Layout.zOf(x, y))
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

  test("q_incr_zorder: maintenance ≡ oracle box over post-delta") {
    val got = SparkEntry.queries("q_incr_zorder")(spark, sfDir)
    val plain = graft.engine.Tables.events(spark, sfDir)
      .filter(col("event_id") % 10 =!= 1)
      .filter(col("user_id").between(3, 8) &&
        to_date(col("ts")).between(lit("2024-01-08"), lit("2024-01-21")))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(floor(col("value") * lit(100)).cast("long"))
          .as("value_cents_sum"))
    assert(got.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(got).count() == 0)
  }

  test("zorderMaintain: touched cells rewrite, untouched files byte-stable, emptied cells deleted") {
    import spark.implicits._
    // base stats: users 0..15, days Jan 1..16 → cell = (user, day)
    // 1:1 (16 buckets each). Cell A=(1,1 day) gets modified, cell
    // B=(2,...) fully emptied, cell C=(3,...) untouched.
    def mk(rows: Seq[(Long, Long, Int)]) = rows.toDF("event_id", "user_id", "d")
      .selectExpr("event_id", "user_id",
        "timestamp_micros(CAST(1704067200000000 + d * 86400000000 AS BIGINT)) AS ts",
        "CAST(1.0 AS DOUBLE) AS value")
    val base = mk(Seq((10L, 1L, 0), (11L, 1L, 0), (20L, 2L, 1),
      (30L, 3L, 2), (31L, 3L, 2)))
    val post = mk(Seq((10L, 1L, 0), (12L, 1L, 0), // 11 deleted, 12 added
      (30L, 3L, 2), (31L, 3L, 2)))               // cell B emptied
    val delta = mk(Seq((11L, 1L, 0), (12L, 1L, 0), (20L, 2L, 1)))
    val stats = (15L, 19723, 19738) // maxU, minD, maxD (Jan 2024)
    val scratch = java.nio.file.Files
      .createTempDirectory("zorder_maint_spec").toString
    ops.Layout.zorderWrite(base, stats, scratch, dynamic = false)
    val fs = new org.apache.hadoop.fs.Path(scratch)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def cellFiles(c: Int) = {
      val p = new org.apache.hadoop.fs.Path(s"$scratch/zb=$c")
      if (!fs.exists(p)) Map.empty[String, (Long, Long)]
      else fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet"))
        .map(f => f.getPath.getName ->
          (f.getLen, f.getModificationTime)).toMap
    }
    val cellA = ops.Layout.cellsOf(mk(Seq((0L, 1L, 0))), stats).head
    val cellB = ops.Layout.cellsOf(mk(Seq((0L, 2L, 1))), stats).head
    val cellC = ops.Layout.cellsOf(mk(Seq((0L, 3L, 2))), stats).head
    val beforeC = cellFiles(cellC)
    assert(beforeC.nonEmpty && cellFiles(cellB).nonEmpty)
    Thread.sleep(1100) // mtime resolution guard
    ops.Layout.zorderMaintain(spark, scratch, post,
      ops.Layout.cellsOf(delta, stats), stats)
    // untouched cell C: files byte-identical (same names, sizes, mtimes)
    assert(cellFiles(cellC) == beforeC,
      "untouched cell's files must pass through unwritten")
    // emptied cell B: directory gone
    assert(cellFiles(cellB).isEmpty, "emptied cell must be deleted")
    // touched cell A rewritten: read-back equals post rows exactly
    val readBack = spark.read.parquet(scratch)
      .select("event_id", "user_id")
    val expected = post.select("event_id", "user_id")
    assert(readBack.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(readBack).count() == 0)
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
    val cand = (for { x <- uxs; y <- dxs } yield ops.Layout.zOf(x, y))
      .distinct
    assert(cand.nonEmpty && cand.size < 256,
      s"candidates ${cand.size} must be a strict subset")
  }
}
