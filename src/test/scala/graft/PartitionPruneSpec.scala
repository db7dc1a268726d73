package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** The write side of the 100 TB layout story: hive-partitioned
  * parquet output and the partition-pruned scans it enables, plus the
  * driver-side sketch surfaces (count-min, approximate quantiles)
  * used for planning decisions at scale. */
class PartitionPruneSpec extends SparkSpecBase {

  test("partitionBy write → filtered read-back prunes partitions at the scan") {
    val tmpPath = Files.createTempDirectory("graft_part")
    val tmp = tmpPath.toString
    try {
    val ev = Tables.events(spark, sfDir)
      .withColumn("day", to_date(col("ts")))
    ev.write.partitionBy("day").parquet(s"$tmp/ev_by_day")

    val oneDay = spark.read.parquet(s"$tmp/ev_by_day")
      .filter(col("day") === "2024-01-05")
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s", "").contains("PartitionFilters:[isnotnull(day"),
      s"day filter must prune partitions, not scan rows:\n$plan")
    // pruned read equals the in-memory filter
    val expected = ev.filter(col("day") === "2024-01-05").count()
    assert(oneDay.count() == expected && expected > 0)

    // directory layout is hive-style day=... (what external engines read)
    val dirs = new java.io.File(s"$tmp/ev_by_day").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("day=")), dirs.mkString(","))
    } finally deleteRecursively(tmpPath)
  }

  test("count-min sketch brackets exact event_type frequencies") {
    val ev = Tables.events(spark, sfDir)
    val cms = ev.stat.countMinSketch(col("event_type"),
      eps = 0.001, confidence = 0.99, seed = 42)
    val exact = ev.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((k, n) <- exact) {
      val est = cms.estimateCount(k)
      // CMS never under-counts; over-count bounded by eps * total
      assert(est >= n, s"$k: CMS $est < exact $n")
      assert(est <= n + (0.001 * exact.values.sum).ceil.toLong + 1,
        s"$k: CMS $est too far above exact $n")
    }
  }

  test("approxQuantile brackets the exact percentiles") {
    val ev = Tables.events(spark, sfDir)
    val Array(q25, q50, q90) =
      ev.stat.approxQuantile("value", Array(0.25, 0.5, 0.9), 0.01)
    val sorted = ev.select("value").collect().map(_.getDouble(0)).sorted
    def exact(p: Double) = sorted(((sorted.length - 1) * p).toInt)
    val span = sorted.last - sorted.head
    assert(math.abs(q25 - exact(0.25)) <= 0.05 * span)
    assert(math.abs(q50 - exact(0.5)) <= 0.05 * span)
    assert(math.abs(q90 - exact(0.9)) <= 0.05 * span)
    assert(q25 <= q50 && q50 <= q90)
  }
}
