package graft

import org.apache.spark.sql.functions._

/** Specs for SURVEY §2 rows 219-222: the bitmap-index distinct
  * family (exact counts, block-wise intersection, signed-incremental
  * maintenance) and RFM segmentation. */
class Round12hSpec extends SparkSpecBase {

  private def ev = graft.engine.Tables.events(spark, sfDir)

  test("q_agg_bitmap_distinct: bitmap counts ≡ count(DISTINCT) per type") {
    val got = SparkEntry.queries("q_agg_bitmap_distinct")(spark, sfDir)
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users_exact"),
        countDistinct(expr("(user_id - pmod(user_id, 32)) div 32")).as("n_blocks"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")
    assert(got.exceptAll(exact).count() == 0)
    assert(exact.exceptAll(got).count() == 0)
    assert(got.count() == 5, "fixture has 5 event types")
  }

  test("bitmapBlocks: random non-negative ids — bit_count sums to distinct") {
    // random-structure property: ids drawn with duplicates and gaps
    // (sparse blocks), several types; the bitmap count must equal the
    // exact distinct per type regardless of block occupancy.
    val rnd = new scala.util.Random(12347)
    import spark.implicits._
    val rows = Seq.tabulate(4000) { i =>
      (s"t${rnd.nextInt(4)}", rnd.nextInt(3000).toLong)
    }
    val df = rows.toDF("event_type", "user_id")
    val got = ops.Analytics.bitmapBlocks(df)
      .groupBy("event_type")
      .agg(sum(expr("bit_count(bm)")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = rows.groupBy(_._1).map { case (t, rs) =>
      t -> rs.map(_._2).distinct.size.toLong }
    assert(got == exact)
  }

  test("bitmapBlocks: NEGATIVE ids — pmod/floor-div split still exact") {
    // round-12 advice: a truncating div/% pair maps negative ids to a
    // garbage shift amount; the pmod + floor-div split must keep the
    // bitmap count exact over mixed-sign ids.
    val rnd = new scala.util.Random(991)
    import spark.implicits._
    val rows = Seq.tabulate(2000) { _ =>
      (s"t${rnd.nextInt(3)}", (rnd.nextInt(2000) - 1000).toLong)
    }
    val df = rows.toDF("event_type", "user_id")
    val got = ops.Analytics.bitmapBlocks(df)
      .groupBy("event_type")
      .agg(sum(expr("bit_count(bm)")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = rows.groupBy(_._1).map { case (t, rs) =>
      t -> rs.map(_._2).distinct.size.toLong }
    assert(got == exact)
    // every bit index must be in [0,32): shiftleft stays in-word
    val bad = ops.Analytics.bitmapBlocks(df)
      .filter(expr("bm = 0 OR bm IS NULL")).count()
    assert(bad == 0, "a block word collapsed to 0/NULL - bad shift")
  }

  test("zOf/zCol: out-of-range coordinates clamp to edge cells") {
    // round-12 advice: coordinates beyond the pinned base range must
    // merge into the nearest edge cell, never alias into an interior
    // cell.
    assert(ops.Layout.zOf(17, 3) == ops.Layout.zOf(15, 3))
    assert(ops.Layout.zOf(-2, 9) == ops.Layout.zOf(0, 9))
    assert(ops.Layout.zOf(5, 99) == ops.Layout.zOf(5, 15))
    import spark.implicits._
    val pts = Seq((17L, 3L), (-2L, 9L), (5L, 99L), (15L, 3L), (0L, 9L))
      .toDF("ux", "dx")
    val got = pts.select(ops.Layout.zCol(col("ux"), col("dx")).as("z"))
      .collect().map(_.getLong(0))
    val want = Seq((17, 3), (-2, 9), (5, 99), (15, 3), (0, 9))
      .map { case (u, d) => ops.Layout.zOf(u, d).toLong }
    assert(got.toSeq == want)
  }

  test("q_agg_bitmap_intersect: block AND ≡ exact distinct co-presence") {
    val got = SparkEntry.queries("q_agg_bitmap_intersect")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // brute force: per unordered type pair, |users(t1) ∩ users(t2)|
    val byType = ev.select("event_type", "user_id").distinct()
      .collect().groupBy(_.getString(0))
      .map { case (t, rs) => t -> rs.map(_.getLong(1)).toSet }
    val types = byType.keys.toSeq.sorted
    for (i <- types.indices; j <- (i + 1) until types.size) {
      val expected = (byType(types(i)) & byType(types(j))).size.toLong
      assert(got((types(i), types(j))) == expected,
        s"pair (${types(i)}, ${types(j)})")
    }
    assert(got.size == types.size * (types.size - 1) / 2)
  }

  test("q_incr_bitmap_distinct: maintenance ≡ batch recompute; " +
    "untouched blocks pass through") {
    val post = ev.filter(col("event_id") % 10 =!= 1)
    val batch = ops.Analytics.bitmapBlocks(
        post.select(col("event_type"), col("user_id")))
      .groupBy("event_type")
      .agg(sum(expr("bit_count(bm)")).cast("long").as("n_users_exact"),
        count(lit(1)).as("n_blocks"), sum(col("n")).as("n_events"))
      .orderBy("event_type")
    val got = SparkEntry.queries("q_incr_bitmap_distinct")(spark, sfDir)
    assert(got.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(got).count() == 0)
    // pass-through pin: every base partial OUTSIDE the touched set
    // must appear verbatim in the post-delta partials (reused rows,
    // not recomputed ones) — the delta-proportionality argument.
    val base = ev.filter(col("event_id") % 10 =!= 0)
    val delta = ev.filter(col("event_id") % 10 === 0)
      .unionByName(ev.filter(col("event_id") % 10 === 1))
    val touched = delta
      .select(col("event_type"), expr("(user_id - pmod(user_id, 32)) div 32").as("blk"))
      .distinct()
    val untouchedBase = ops.Analytics.bitmapBlocks(
        base.select(col("event_type"), col("user_id")))
      .join(touched, Seq("event_type", "blk"), "left_anti")
    val postPartials = ops.Analytics.bitmapBlocks(
      post.select(col("event_type"), col("user_id")))
    assert(untouchedBase.exceptAll(postPartials).count() == 0,
      "an untouched (type, block) partial differs between base and " +
        "post — the pass-through would be wrong")
  }

  test("q_scan_dpp: dynamic partition pruning fires; result ≡ plain join") {
    val got = SparkEntry.queries("q_scan_dpp")(spark, sfDir)
    // plan shape: the fact scan must carry a DynamicPruningExpression
    // partition filter — the runtime star-schema pruning a literal
    // IN-filter cannot express.
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamicpruning partition filter on the fact scan;" +
        s" plan was:\n$plan")
    val plain = graft.engine.Tables.customer(spark, sfDir)
      .join(graft.engine.Tables.nation(spark, sfDir)
        .filter(col("n_regionkey") === 0),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_customers"),
        sum((graft.engine.Dec.dec2(col("c_acctbal")) * 100)
          .cast("long")).as("acctbal_cents_sum"))
    assert(got.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(got).count() == 0)
    assert(got.count() > 0)
  }

  test("q_incr_rfm: maintenance ≡ batch rescore; untouched users pass through") {
    val post = ev.filter(col("event_id") % 10 =!= 1)
    val batch = ops.Analytics.rfmSegments(ops.Analytics.rfmPerUser(
      post.select(col("event_id"), col("user_id"), col("ts"),
        col("value"))))
    val got = SparkEntry.queries("q_incr_rfm")(spark, sfDir)
    assert(got.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(got).count() == 0)
    // pass-through pin: untouched users' base partials ARE the post
    // partials (user-local aggregates) — the delta-proportionality
    // argument for the fact-sized stage.
    val base = ev.filter(col("event_id") % 10 =!= 0)
    val delta = ev.filter(col("event_id") % 10 === 0)
      .unionByName(ev.filter(col("event_id") % 10 === 1))
    val affected = delta.select("user_id").distinct()
    val untouched = ops.Analytics.rfmPerUser(base)
      .join(affected, Seq("user_id"), "left_anti")
    val postP = ops.Analytics.rfmPerUser(post)
    assert(untouched.exceptAll(postP).count() == 0,
      "an untouched user's base partial differs from its post partial")
  }

  test("q_events_anomaly_sigma: integer test ≡ exact rational 3-sigma") {
    val got = SparkEntry.queries("q_events_anomaly_sigma")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // independent recompute in exact BigInt rationals from raw rows
    val daily = ev.select(col("user_id"),
        to_date(col("ts")).cast("string").as("day"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(identity).map { case ((u, day), rs) =>
        (u, day, rs.length.toLong) }.toSeq
    val byUser = daily.groupBy(_._1)
    for ((u, rows) <- byUser) {
      val n = BigInt(rows.size)
      val s = BigInt(rows.map(_._3).sum)
      val q = rows.map(x => BigInt(x._3) * BigInt(x._3)).sum
      val anom = rows.count { case (_, _, x) =>
        val dev = n * BigInt(x) - s
        dev * dev > 9 * (n * q - s * s)
      }
      assert(got(u) == (n.toLong, anom.toLong), s"user $u")
    }
    assert(got.keySet == byUser.keySet.map(identity))
  }

  test("anomaly sigma: injected bursts are flagged, uniform days are not") {
    import spark.implicits._
    // 20 users × 20 quiet days (3-5 events, deterministic cycle — a
    // RANDOM low-variance draw can legitimately make a quiet day
    // 3σ-anomalous, turning the exact-set assertion seed-dependent)
    // + one 40-event burst day for even users: the burst must be the
    // ONLY anomalous day (provable: quiet-day deviation ≤ 1 vs
    // 9σ² = 6 without burst; ≤ 2.8² vs 9σ² ≈ 560 with burst).
    val rows = for {
      u <- 0 until 20
      d <- 0 until 20
      n = if (d == 7 && u % 2 == 0) 40 else 3 + (u + d) % 3
      i <- 0 until n
    } yield (u.toLong, java.sql.Timestamp.valueOf(
      f"2024-03-${d + 1}%02d 1${i % 9}:00:0${i % 10}"), i.toLong)
    val df = rows.toDF("user_id", "ts", "event_id")
      .withColumn("value", lit(1.0))
    val daily = df.groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val stats = daily.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
        sum(col("x") * col("x")).as("q"))
    val flagged = daily.join(stats, "user_id")
      .filter((col("n") * col("x") - col("s")) *
        (col("n") * col("x") - col("s")) >
        (col("n") * col("q") - col("s") * col("s")) * 9)
      .collect().map(r => (r.getLong(0),
        r.getAs[java.sql.Date]("day").toString))
    assert(flagged.toSet ==
      (0 until 20 by 2).map(u => (u.toLong, "2024-03-08")).toSet,
      "exactly the even users' burst day must be flagged")
  }

  test("q_events_rfm: partition of users; scores 1-5; bucket monotonicity") {
    val got = SparkEntry.queries("q_events_rfm")(spark, sfDir)
    val rows = got.collect()
    val nUsers = ev.select("user_id").distinct().count()
    assert(rows.map(_.getLong(3)).sum == nUsers,
      "segments must partition the user set")
    assert(rows.forall(r => (1 to 3).forall(i =>
      r.getInt(i - 1) >= 1 && r.getInt(i - 1) <= 5)))
    // frequency buckets are ordered: the max freq of bucket k cannot
    // exceed the min freq of bucket k+1 (ntile over a unique order);
    // asserted on a direct scored recompute of the per-user relation.
    val scored = ev.groupBy("user_id").agg(count(lit(1)).as("freq"))
      .withColumn("f_score", ntile(5).over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("freq"), col("user_id"))))
      .groupBy("f_score")
      .agg(min(col("freq")).as("lo"), max(col("freq")).as("hi"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    for (k <- 1 until 5)
      assert(scored(k)._2 <= scored(k + 1)._1,
        s"f bucket $k max must not exceed bucket ${k + 1} min")
  }
}
