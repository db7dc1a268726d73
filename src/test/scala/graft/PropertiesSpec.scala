package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** SURVEY.md §5 tier 2 — the reference's validation idea as
  * properties: incremental processing must equal full recomputation
  * for ARBITRARY base/delta splits [P §7], and the integer Jaccard
  * filter must equal the float definition. Cases are generated with
  * ScalaCheck Gen under fixed seeds (Spark jobs are expensive, so
  * few and tiny). */
class PropertiesSpec extends SparkSpecBase {

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default.withSize(20), Seed(seed)).get

  private val kvGen: Gen[List[(String, Double)]] = Gen.listOf(for {
    k <- Gen.oneOf("a", "b", "c")
    v <- Gen.chooseNum(0, 999)
  } yield (k, v / 100.0))

  test("incrMerge(base, delta) == recompute, for arbitrary splits and deletes") {
    val sp = spark
    import sp.implicits._
    for (seed <- 1L to 8L) {
      val rows = sample(kvGen, seed)
      if (rows.nonEmpty) {
        val splitPct = sample(Gen.chooseNum(0, 100), seed * 31)
        val n = rows.length * splitPct / 100
        val (baseRows, insRows) = rows.splitAt(n)
        val delRows = baseRows.zipWithIndex.filter(_._2 % 3 == 0).map(_._1)
        val base = baseRows.toDF("k", "v")
        val delta = (insRows.map { case (k, v) => (k, v, "+") }
          ++ delRows.map { case (k, v) => (k, v, "-") }).toDF("k", "v", "op")
        val merged = Graft.incrMerge(base, delta, Seq("k"), col("v"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val surviving = baseRows.diff(delRows) ++ insRows
        val expected =
          surviving.groupBy(_._1).view.mapValues(_.size.toLong).toMap
        assert(merged.filter(_._2 != 0) == expected.filter(_._2 != 0),
          s"seed=$seed")
      }
    }
  }

  test("integer threshold 2*inter >= union == Jaccard >= 0.5 exactly") {
    for (seed <- 1L to 500L) {
      val inter0 = sample(Gen.chooseNum(0, 50), seed)
      val extra = sample(Gen.chooseNum(1, 50), seed * 31)
      val inter = inter0.min(extra)
      val union = extra + inter0
      if (union > 0) {
        assert((2L * inter >= union) == (inter.toDouble / union >= 0.5),
          s"inter=$inter union=$union")
      }
    }
  }

  test("session splitting: gaps-and-islands count matches session_window") {
    val sp = spark
    import sp.implicits._
    for (seed <- 1L to 6L) {
      val offsets = sample(Gen.listOfN(12, Gen.chooseNum(0L, 6L * 3600)), seed)
      val rows = offsets.map(o =>
        (1L, new java.sql.Timestamp(1700000000000L + o * 1000)))
      val df = rows.toDF("user_id", "ts")
      val viaWindow = df
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .count().count()
      val sorted = rows.map(_._2.getTime).sorted
      val viaGaps = 1 + sorted.distinct.sorted.sliding(2).count {
        case Seq(a, b) => b - a >= 30 * 60 * 1000
        case _         => false
      }
      assert(viaWindow == viaGaps.toLong, s"seed=$seed offsets=$offsets")
    }
  }
}
