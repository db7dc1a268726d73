package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Shuffle-avoidance surfaces that only show up in PHYSICAL plans:
  * bucketed co-located joins (the pre-shuffled join path for repeated
  * big⋈big joins at scale) and repartition+sortWithinPartitions
  * secondary sort (the Hadoop SecondarySort idiom [H] — per-key
  * ordered runs without a global sort). */
class ColocationSpec extends SparkSpecBase {

  test("bucketed tables join WITHOUT a shuffle exchange") {
    val tmpPath = Files.createTempDirectory("graft_bucketed")
    val tmp = tmpPath.toString
    val sp = spark
    sp.sql("DROP TABLE IF EXISTS g_ord_b")
    sp.sql("DROP TABLE IF EXISTS g_cust_b")
    try {
      Tables.orders(sp, sfDir).write
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$tmp/ord").saveAsTable("g_ord_b")
      Tables.customer(sp, sfDir).write
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$tmp/cust").saveAsTable("g_cust_b")
      // force a non-broadcast join so the exchange question is real
      val prev = sp.conf.get("spark.sql.autoBroadcastJoinThreshold")
      sp.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = sp.table("g_ord_b")
          .join(sp.table("g_cust_b"),
            col("o_custkey") === col("c_custkey"))
        val plan = j.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
        assert(!plan.contains("Exchange"),
          s"bucketed join must not shuffle either side:\n$plan")
        // co-located join result matches the plain join
        val expected = Tables.orders(sp, sfDir)
          .join(Tables.customer(sp, sfDir),
            col("o_custkey") === col("c_custkey")).count()
        assert(j.count() == expected)
      } finally sp.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      sp.sql("DROP TABLE IF EXISTS g_ord_b")
      sp.sql("DROP TABLE IF EXISTS g_cust_b")
      deleteRecursively(tmpPath)
    }
  }

  test("secondary sort: per-key ordered runs, no global sort in the plan") {
    val ev = Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id")
    val sorted = ev.repartition(4, col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts"), col("event_id"))
    val plan = sorted.queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"),
      s"secondary sort must not range-shuffle:\n$plan")
    assert(plan.contains("hashpartitioning"), s"expected hash exchange:\n$plan")
    // every partition holds contiguous, (ts, event_id)-sorted runs per user
    val bad = sorted.mapPartitions { it =>
      var prev: Option[(Long, java.sql.Timestamp, Long)] = None
      val seen = scala.collection.mutable.Set.empty[Long]
      var violations = 0
      it.foreach { r =>
        val cur = (r.getLong(0), r.getTimestamp(1), r.getLong(2))
        prev match {
          case Some((pu, pt, pe)) =>
            if (cur._1 == pu) {
              val cmp = cur._2.compareTo(pt)
              if (cmp < 0 || (cmp == 0 && cur._3 < pe)) violations += 1
            } else {
              if (seen.contains(cur._1)) violations += 1 // key run split
              seen += pu
            }
          case None =>
        }
        prev = Some(cur)
      }
      Iterator.single(violations)
    }(org.apache.spark.sql.Encoders.scalaInt).collect().sum
    assert(bad == 0, s"$bad ordering violations across partitions")
  }
}
