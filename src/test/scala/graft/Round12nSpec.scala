package graft

import org.apache.spark.sql.functions._

/** Specs for SURVEY §2 rows 243-244: equi-depth histogram and
  * grouping_id subtotal disambiguation. */
class Round12nSpec extends SparkSpecBase {

  test("q_agg_histogram_eqdepth: depth ±1, ordered boundaries, full cover") {
    val rows = SparkEntry.queries("q_agg_histogram_eqdepth")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val total = graft.engine.Tables.orders(spark, sfDir).count()
    assert(rows.map(_._3).sum == total, "buckets must cover all rows")
    rows.groupBy(_._1).foreach { case (p, bs) =>
      assert(bs.map(_._2).sorted.toSeq == (1 to 4), s"$p: bucket ids")
      val sizes = bs.map(_._3)
      assert(sizes.max - sizes.min <= 1,
        s"$p: equi-depth means sizes differ by at most 1")
      // boundaries: bucket k's hi ≤ bucket k+1's lo (unique-order
      // ntile splits never interleave values)
      val sorted = bs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._5 <= b._4, s"$p: boundary order")
        case _ =>
      }
      sorted.foreach(b => assert(b._4 <= b._5))
    }
  }

  test("eqDepthHistogram: random frame ≡ brute-force ntile") {
    val rnd = new scala.util.Random(8080)
    import spark.implicits._
    val rows = Seq.tabulate(1000)(i =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(50).toLong, i.toLong))
    val got = ops.Round12i.eqDepthHistogram(
        rows.toDF("g", "cents", "k"), "g", "cents", "k", 7)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val sorted = rs.sortBy(t => (t._2, t._3))
      val n = sorted.length
      // SQL-standard ntile: first (n % k) buckets get ceil(n/k)
      val k = 7
      val base = n / k; val extra = n % k
      var idx = 0
      (1 to k).foreach { b =>
        val size = base + (if (b <= extra) 1 else 0)
        if (size > 0) {
          val slice = sorted.slice(idx, idx + size)
          idx += size
          val (gn, lo, hi) = got((g, b))
          assert(gn == size, s"$g bucket $b size")
          assert(lo == slice.map(_._2).min && hi == slice.map(_._2).max,
            s"$g bucket $b bounds")
        }
      }
    }
  }

  test("q_agg_grouping_id: levels reconcile exactly") {
    val rows = SparkEntry.queries("q_agg_grouping_id")(spark, sfDir)
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getLong(3), r.getLong(4)))
    val detail = rows.filter(_._3 == 0)
    val byFlag = rows.filter(_._3 == 1)
    val grand = rows.filter(_._3 == 3)
    assert(grand.length == 1 && rows.count(_._3 == 2) == 0,
      "rollup (not cube): no gid=2 level")
    assert(grand.head._4 == detail.map(_._4).sum)
    assert(grand.head._5 == detail.map(_._5).sum)
    byFlag.foreach { case (f, _, _, n, cs) =>
      val d = detail.filter(_._1 == f)
      assert(n == d.map(_._4).sum && cs == d.map(_._5).sum,
        s"flag $f subtotal must equal its details")
    }
    // subtotal rows carry NULL in the rolled-up dim, detail rows don't
    assert(detail.forall(r => r._1.isDefined && r._2.isDefined))
    assert(byFlag.forall(r => r._1.isDefined && r._2.isEmpty))
    assert(grand.head._1.isEmpty && grand.head._2.isEmpty)
  }
}
