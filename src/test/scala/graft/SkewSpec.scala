package graft

import org.apache.spark.sql.functions._
import graft.ops.Skew

/** Salted-join skew mitigation: identical results to the plain join
  * on a pathologically skewed key distribution, and the hot key's
  * rows actually spread across salt buckets. */
class SkewSpec extends SparkSpecBase {
  import spark.implicits._

  test("saltedJoin == plain join on a 90%-hot-key fact table") {
    val fact = (0 until 5000).map { i =>
      val k = if (i % 10 != 9) 1L else (i % 100).toLong // ~90% key=1
      (i.toLong, k, i * 2.0)
    }.toDF("row_id", "k", "v")
    val dim = (0L until 100L).map(k => (k, s"dim_$k")).toDF("k", "name")

    val plain = fact.join(dim, Seq("k"))
      .select("row_id", "k", "v", "name").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
      .toSet
    val salted = Skew.saltedJoin(fact, dim, "k", Seq(col("row_id")), nSalts = 8)
      .select("row_id", "k", "v", "name").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
      .toSet
    assert(salted == plain)
  }

  test("a user column named like the salt column survives the join") {
    // withColumn silently replaces same-named columns; the temp salt
    // name must dodge whatever the caller's frames already contain.
    val fact = (0 until 100).map(i => (i.toLong, i % 5L, s"keep_$i"))
      .toDF("row_id", "k", "__graft_salt_0")
    val dim = (0L until 5L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val out = Skew.saltedJoin(fact, dim, "k", Seq(col("row_id")), nSalts = 4)
    assert(out.columns.contains("__graft_salt_0"),
      s"user column dropped: ${out.columns.mkString(",")}")
    val vals = out.select("row_id", "__graft_salt_0").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(vals(7L) == "keep_7")
    assert(out.count() == 100)
  }

  test("the hot key spreads across all salt buckets") {
    val fact = (0 until 4000).map(i => (i.toLong, 1L)).toDF("row_id", "k")
    val buckets = fact
      .withColumn("salt", pmod(hash(col("row_id")), lit(8)))
      .groupBy("salt").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(buckets.size == 8, s"expected 8 buckets, got ${buckets.keySet}")
    assert(buckets.values.max < 4000 / 2,
      s"hot key not spread: $buckets")
  }
}
