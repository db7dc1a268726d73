package graft

import org.apache.spark.sql.functions._

/** Random-structure properties for the round-12 batch-2/3 facade
  * generics ([[graft.Graft]] rows 201-211 surface): band self-join,
  * contiguous pattern matching, quality report, prefix-filtered
  * Jaccard, and the converged k-core. */
class FacadeSpec4 extends SparkSpecBase {

  private val rnd = new scala.util.Random(1207)

  test("bandSelfJoin ≡ naive theta join on random timelines") {
    import spark.implicits._
    val rows = (1L to 400L).map(i =>
      (i, rnd.nextLong(100000L), s"g${rnd.nextInt(4)}"))
    val df = rows.toDF("id", "t", "grp")
    Seq(1L, 7L, 500L, 5000L).foreach { band =>
      val got = Graft.bandSelfJoin(df, "id", "t", band, Seq("grp"))
        .select(col("id_a"), col("id_b"), col("gap"))
      val naive = df.as("a").join(df.as("b"),
          col("a.id") < col("b.id") &&
            abs(col("a.t") - col("b.t")) <= band)
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          abs(col("a.t") - col("b.t")).as("gap"))
      assert(got.exceptAll(naive).count() == 0, s"band=$band extra")
      assert(naive.exceptAll(got).count() == 0, s"band=$band lost")
    }
  }

  test("bandSelfJoin: negative timestamps bucket correctly") {
    import spark.implicits._
    // `div` floors toward negative infinity in Spark SQL? It
    // truncates toward zero — which would MIS-BUCKET negatives if the
    // pair logic relied on flooring. The probe side's ±1 explode
    // absorbs the off-by-one at the zero boundary; prove it.
    val rows = (1L to 200L).map(i => (i, rnd.nextLong(2000L) - 1000L))
    val df = rows.toDF("id", "t")
    val band = 100L
    val got = Graft.bandSelfJoin(df, "id", "t", band)
      .select(col("id_a"), col("id_b"))
    val naive = df.as("a").join(df.as("b"),
        col("a.id") < col("b.id") && abs(col("a.t") - col("b.t")) <= band)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    assert(got.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(got).count() == 0)
  }

  test("patternMatches ≡ sliding-window recount on random sequences") {
    import spark.implicits._
    val alphabet = Vector("a", "b", "c")
    val timelines = (1 to 12).map(u =>
      u.toLong -> Vector.fill(5 + rnd.nextInt(40))(
        alphabet(rnd.nextInt(3))))
    val ev = timelines.flatMap { case (u, ts) =>
      ts.zipWithIndex.map { case (t, i) => (u, i.toLong, i.toLong, t) }
    }.toDF("k", "t", "tie", "typ")
    Seq(Seq("a", "b"), Seq("c"), Seq("a", "a", "b", "c")).foreach { pat =>
      val got = Graft.patternMatches(ev, "k", "t", "tie", "typ", pat)
        .count()
      val want = timelines.map { case (_, ts) =>
        ts.sliding(pat.size).count(_ == pat.toVector)
      }.sum
      assert(got == want, s"pattern $pat")
    }
  }

  test("qualityReport ≡ per-rule filters on random data") {
    import spark.implicits._
    val df = Seq.fill(500)((rnd.nextInt(100), rnd.nextDouble(),
      if (rnd.nextBoolean()) "x" else "y")).toDF("a", "b", "c")
    val rules = Seq(
      "a_small" -> (col("a") >= 50),
      "b_low" -> (col("b") > 0.5),
      "c_is_x" -> (col("c") === "y"))
    val rep = Graft.qualityReport(df, rules).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rep.size == 3)
    rules.foreach { case (name, bad) =>
      assert(rep(name) == ((500L, df.filter(bad).count())), name)
    }
  }

  test("prefixJaccardPairs ≡ brute force on random token sets") {
    import spark.implicits._
    // skewed universe: a few stop-words in most docs + a rare tail —
    // the regime prefix filtering exists for
    val docs = (1L to 60L).map { i =>
      val stop = (0 until 8).filter(_ => rnd.nextInt(10) < 8)
        .map(j => s"stop$j")
      val rare = Seq.fill(3 + rnd.nextInt(10))(s"w${rnd.nextInt(120)}")
      (i, (stop ++ rare).distinct)
    }
    val toks = docs.flatMap { case (i, ts) => ts.map(t => (i, t)) }
      .toDF("doc_id", "tok")
    Seq((1, 2), (7, 10)).foreach { case (num, den) =>
      val got = Graft.prefixJaccardPairs(toks, num, den)
      val brute = docs.flatMap { case (i, ti) =>
        docs.collect { case (j, tj) if i < j =>
          val inter = ti.toSet.intersect(tj.toSet).size
          val uni = ti.size + tj.size - inter
          (i, j, inter.toLong, uni.toLong)
        }.filter { case (_, _, in, un) => in * den >= un * num }
      }
      val bruteDf = brute.toDF("doc_a", "doc_b", "inter", "union_sz")
      assert(got.exceptAll(bruteDf).count() == 0, s"tau=$num/$den extra")
      assert(bruteDf.exceptAll(got).count() == 0, s"tau=$num/$den lost")
    }
  }

  test("kcore: fixpoint is the unique maximal k-core on random graphs") {
    import spark.implicits._
    (1 to 3).foreach { trial =>
      val n = 40
      val canon = (1 to 150).map { _ =>
        val u = rnd.nextInt(n).toLong; val v = rnd.nextInt(n).toLong
        (math.min(u, v), math.max(u, v))
      }.distinct.filter(e => e._1 != e._2)
      val edges = (canon ++ canon.map(e => (e._2, e._1)))
        .toDF("src", "dst")
      val k = 3
      val core = Graft.kcore(edges, k)
      val coreNodes = core.select("src").distinct()
        .as[Long].collect().toSet
      // (a) min degree inside the core
      if (coreNodes.nonEmpty) {
        val deg = core.groupBy("src").agg(count(lit(1)).as("deg"))
        assert(deg.filter(col("deg") < k).count() == 0, s"trial $trial")
      }
      // (b) maximality: every PEELED node has < k neighbors in the core
      val adj = canon.flatMap(e => Seq(e, (e._2, e._1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      adj.keys.filterNot(coreNodes).foreach { v =>
        assert(adj(v).count(coreNodes) < k,
          s"trial $trial: peeled node $v has >= $k core neighbors")
      }
    }
  }
}
