package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Round-2 facade laws: the split assignment is a deterministic total
  * function of the key, and snapshotDiff's deltas reconcile the two
  * snapshot totals exactly. */
class PropertiesSpec2 extends SparkSpecBase {

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default.withSize(30), Seed(seed)).get

  test("sampleSplit: total, deterministic, key-functional for arbitrary ids") {
    val sp = spark
    import sp.implicits._
    for (seed <- 1L to 4L) {
      val ids = sample(Gen.listOf(Gen.chooseNum(-100000L, 100000L)), seed)
        .distinct
      if (ids.nonEmpty) {
        val df = ids.toDF("id")
        val a = Graft.sampleSplit(df, "id").collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
        val b = Graft.sampleSplit(df.repartition(7), "id").collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
        assert(a == b, "assignment must not depend on partitioning")
        assert(a.values.forall(Set("train", "val", "test")), "total function")
      }
    }
  }

  test("saltedJoin == plain join for arbitrary data and salt counts") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions.col
    for (seed <- 1L to 4L) {
      val n = 40 + (seed * 17 % 60).toInt
      val hot = seed % 5 // one over-represented key
      val fact = (0 until n)
        .map(i => (i.toLong, if (i % 3 == 0) hot else (i % 7).toLong))
        .toDF("row_id", "k")
      val dim = (0L until 7L).map(k => (k, s"d$k")).toDF("k", "name")
      val plain = fact.join(dim, Seq("k"))
        .select("row_id", "name").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      for (nSalts <- Seq(1, 3, 8)) {
        val salted = Graft.saltedJoin(fact, dim, "k",
            Seq(col("row_id")), nSalts)
          .select("row_id", "name").collect()
          .map(r => (r.getLong(0), r.getString(1))).toSet
        assert(salted == plain, s"seed=$seed nSalts=$nSalts")
      }
    }
  }

  test("bloomPrunedJoin == plain join for arbitrary key overlaps") {
    val sp = spark
    import sp.implicits._
    for (seed <- 1L to 3L) {
      val fact = (0 until 200)
        .map(i => (i.toLong, ((i * seed) % 50).toLong)).toDF("row_id", "k")
      val dim = (0L until 50L).filter(_ % (seed + 2) == 0)
        .map(k => (k, s"d$k")).toDF("dk", "name")
      val plain = fact.join(dim, fact("k") === dim("dk"))
        .select("row_id", "name").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      val pruned = Graft.bloomPrunedJoin(fact, dim, "k", "dk")
        .select("row_id", "name").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(pruned == plain, s"seed=$seed")
    }
  }

  test("snapshotDiff deltas reconcile the snapshot totals") {
    val sp = spark
    import sp.implicits._
    for (seed <- 1L to 4L) {
      val gen = Gen.listOf(for {
        k <- Gen.oneOf("a", "b", "c", "d", "e")
        v <- Gen.chooseNum(-50L, 50L)
      } yield (k, v))
      val beforeRows = sample(gen, seed).groupBy(_._1).view
        .mapValues(_.map(_._2).sum).toList
      val afterRows = sample(gen, seed * 17).groupBy(_._1).view
        .mapValues(_.map(_._2).sum).toList
      val d = Graft.snapshotDiff(
        beforeRows.toDF("k", "t"), afterRows.toDF("k", "t"), "k", "t")
        .collect().map(r => r.getString(0) -> r.getLong(2))
      // Σ delta == Σ after - Σ before (missing keys count as 0)
      assert(d.map(_._2).sum ==
        afterRows.map(_._2).sum - beforeRows.map(_._2).sum)
    }
  }
}
