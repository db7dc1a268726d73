package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.ops.Round12

/** Round-12 second batch (SURVEY §2 rows 189-192): each row checked
  * against an independent derivation — the SQL front-end against the
  * DataFrame-API build of the same plan, the sketch rollup against
  * exact distincts, and both signed-incremental rows against their
  * batch recomputes over the post-delta inputs. */
class Round12bSpec extends SparkSpecBase {

  test("q_sql_text_frontend == the DataFrame-API build of the same query") {
    val got = SparkEntry.queries("q_sql_text_frontend")(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val cut = lit("1997-06-30 00:00:00").cast("timestamp")
    val rev = col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1) - col("l_discount")).cast("decimal(8,4)")
    val api = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment") === "BUILDING" &&
        col("o_orderdate") < cut && col("l_shipdate") > cut)
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(sum(rev).cast("decimal(18,4)").cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
    val (g, a) = (got.collect().toSeq, api.collect().toSeq)
    assert(g == a, s"SQL text result differs from the API build")
    assert(g.nonEmpty, "frontend query returned no rows — cut is degenerate")
  }

  test("q_agg_sketch_union: estimates within 5% of exact, served from stored sketches") {
    val got = SparkEntry.queries("q_agg_sketch_union")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val ev = Tables.events(spark, sfDir)
    val exactAll = ev.select("user_id").distinct().count()
    val exactDays = ev.groupBy(to_date(col("ts")).as("day"))
      .agg(count_distinct(col("user_id")).as("n"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    assert(got.size == exactDays.size + 1, "one row per day plus ALL")
    def close(est: Long, exact: Long): Boolean =
      math.abs(est - exact).toDouble <= math.max(1.0, 0.05 * exact)
    assert(close(got("ALL"), exactAll),
      s"ALL estimate ${got("ALL")} vs exact $exactAll")
    exactDays.foreach { case (day, exact) =>
      assert(close(got(day), exact), s"day $day: ${got(day)} vs $exact")
    }
    // determinism of the stored-sketch serve: second invocation equal
    val again = SparkEntry.queries("q_agg_sketch_union")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(again == got)
  }

  test("q_incr_chunks == batch chunker over the post-delta corpus") {
    val got = SparkEntry.queries("q_incr_chunks")(spark, sfDir)
    val post = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 10 =!= 1)
    val batch = Round12.chunkDupGroups(post, "doc_id", "text", 16)
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty,
      "maintained chunk groups differ from the batch recompute")
    assert(got.count() > 0, "no duplicate chunks in the post-delta corpus")
  }

  test("q_incr_profile == batch profile over the post-delta table") {
    val got = SparkEntry.queries("q_incr_profile")(spark, sfDir)
    val post = Tables.lineitem(spark, sfDir)
      .filter(col("l_orderkey") % 10 =!= 1)
    val batch = Round12.profileStats(post,
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty,
      "state-derived profile differs from the batch profile")
  }

  test("valueCountState == from-scratch counts on random frames with random deltas") {
    val sp = spark
    import sp.implicits._
    for (seed <- 1L to 3L) {
      val rnd = new scala.util.Random(seed * 131)
      val all = (0 until 300).map(i =>
        (i.toLong, (rnd.nextInt(7) * 25).toDouble / 100.0))
      val (base, ins) = all.partition(_ => rnd.nextDouble() < 0.6)
      val del = base.filter(_ => rnd.nextDouble() < 0.3)
      val delIds = del.map(_._1).toSet
      def df(xs: Seq[(Long, Double)]) = xs.toDF("id", "x")
      val got = Round12.valueCountState(df(base), df(ins), df(del), "x")
        .collect().map(r => (r.getDouble(0), r.getLong(1))).toMap
      val post = base.filterNot(r => delIds(r._1)) ++ ins
      val brute = post.groupBy(_._2).map { case (v, xs) => (v, xs.size.toLong) }
      assert(got == brute, s"seed=$seed: state != from-scratch value counts")
    }
  }
}
