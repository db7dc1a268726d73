package graft

import org.apache.spark.sql.functions._
import graft.ops.BloomPrune
import graft.engine.Tables

/** Bloom-filter join pruning: exact equality to the plain join, real
  * pre-join selectivity, and the empty-dimension edge case. */
class BloomPruneSpec extends SparkSpecBase {

  test("bloomPrunedJoin == plain join on a selective dim") {
    val fact = Tables.lineitem(spark, sfDir)
    val dim = Tables.supplier(spark, sfDir)
      .filter(col("s_suppkey") % 25 === 3)
      .select(col("s_suppkey"), col("s_name"))
    val pruned = BloomPrune
      .bloomPrunedJoin(fact, dim, "l_suppkey", "s_suppkey")
      .select("l_orderkey", "l_linenumber", "s_name").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val plain = fact.join(dim, col("l_suppkey") === col("s_suppkey"))
      .select("l_orderkey", "l_linenumber", "s_name").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(pruned == plain)
    assert(plain.nonEmpty)
  }

  test("the Bloom filter prunes most fact rows BEFORE the join") {
    val sp = spark
    import sp.implicits._
    // 1000-key fact, 10-key dim: the pre-join filter output must be
    // near dim selectivity (1% + fpp), nowhere near the full fact
    val fact = (0L until 10000L).map(i => (i, i % 1000)).toDF("row_id", "k")
    val dim = (0L until 10L).map(k => (k * 100, s"d$k")).toDF("dk", "name")
    val bf = dim.stat.bloomFilter("dk", 1000L, 0.03)
    val kept = fact.filter(udf((k: Long) => bf.mightContainLong(k))
      .apply(col("k"))).count()
    assert(kept < 10000 / 2, s"filter kept $kept of 10000 — no pruning")
    val joined = BloomPrune.bloomPrunedJoin(fact, dim, "k", "dk").count()
    assert(joined == 100, s"expected 100 exact matches, got $joined")
  }

  test("same-named join keys use the USING form, no ambiguity") {
    val sp = spark
    import sp.implicits._
    val fact = (0L until 100L).map(i => (i, i % 10)).toDF("row_id", "k")
    val dim = (0L until 10L).map(k => (k, s"d$k")).toDF("k", "name")
    val out = BloomPrune.bloomPrunedJoin(fact, dim, "k", "k")
    assert(out.count() == 100)
    assert(out.columns.count(_ == "k") == 1, out.columns.mkString(","))
  }

  test("empty dimension yields an empty join, not an NPE") {
    val sp = spark
    import sp.implicits._
    val fact = (0L until 100L).map(i => (i, i)).toDF("row_id", "k")
    val dim = Seq.empty[(Long, String)].toDF("dk", "name")
    assert(BloomPrune.bloomPrunedJoin(fact, dim, "k", "dk").count() == 0)
  }
}
