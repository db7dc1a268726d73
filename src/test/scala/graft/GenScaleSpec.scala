package graft

import org.apache.spark.sql.functions._

/** Pins for the scale-out fixture generator behind SCALING.md
  * (graft.tools.GenScale): the properties that make a generated
  * sf-N× directory a VALID scale stress —
  *  - row counts scale by exactly the factor (dims excluded);
  *  - foreign keys shift consistently, so join fan-out per key is
  *    IDENTICAL to the source (the world gets bigger, not denser
  *    per key);
  *  - the `% 10` incremental delta classes keep their exact
  *    per-class counts × factor;
  *  - timestamps are untouched, so per-window density genuinely
  *    multiplies (the property that surfaced the r13 grid/containment
  *    guard bugs).
  * Runs GenScale in-process at factor 3 over sf0.001 into a temp dir. */
class GenScaleSpec extends SparkSpecBase {

  test("GenScale: counts, FK fan-out, %10 classes and time density " +
      "all scale correctly at factor 3") {
    val out = java.nio.file.Files.createTempDirectory("genscale_spec")
      .toString
    graft.tools.GenScale.mainWith(spark, sfDir, out, 3)

    def src(t: String) = spark.read.parquet(s"$sfDir/$t.parquet")
    def gen(t: String) = spark.read.parquet(s"$out/$t.parquet")

    // dims verbatim; scaled tables exactly 3x
    assert(gen("region").count() == src("region").count())
    assert(gen("nation").count() == src("nation").count())
    for (t <- Seq("customer", "orders", "lineitem", "events",
                  "documents", "embeddings"))
      assert(gen(t).count() == 3 * src(t).count(), s"$t count")

    // FK fan-out: per-order lineitem count distribution is identical
    // (every source (orderkey, n) appears exactly 3 times under
    // shifted keys — so the DISTRIBUTION of n is x3 per value)
    val srcDist = src("lineitem").groupBy("l_orderkey").count()
      .groupBy("count").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val genDist = gen("lineitem").groupBy("l_orderkey").count()
      .groupBy("count").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(genDist == srcDist.map { case (k, v) => k -> 3 * v },
      "per-order fan-out distribution changed")

    // referential integrity: no orphan lineitem rows
    assert(gen("lineitem").join(gen("orders"),
      col("l_orderkey") === col("o_orderkey"), "left_anti").count() == 0)

    // %10 delta classes: each class exactly 3x the source class
    val srcCls = src("events").groupBy(col("event_id") % 10).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val genCls = gen("events").groupBy(col("event_id") % 10).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(genCls == srcCls.map { case (k, v) => k -> 3 * v },
      "%10 delta classes not preserved")

    // time density: identical ts range, 3x rows per distinct ts-hour
    val srcHours = src("events").select(date_trunc("hour", col("ts")))
      .distinct().count()
    val genHours = gen("events").select(date_trunc("hour", col("ts")))
      .distinct().count()
    assert(srcHours == genHours, "timestamp domain changed")

    // KEY UNIQUENESS (ADVICE r13): shifted copies must never collide —
    // every primary key stays unique in the scaled output
    for ((t, k) <- Seq("customer" -> "c_custkey", "orders" -> "o_orderkey",
                       "events" -> "event_id", "documents" -> "doc_id",
                       "embeddings" -> "vec_id"))
      assert(gen(t).select(k).distinct().count() == gen(t).count(),
        s"$t.$k not unique after scaling — copy collision")

    // GUARD (ADVICE r13): re-scaling an already-scaled directory must
    // REFUSE (its keys exceed the per-copy offsets), not silently
    // write colliding copies
    val out2 = java.nio.file.Files.createTempDirectory("genscale_guard")
      .toString
    val e = intercept[IllegalArgumentException] {
      graft.tools.GenScale.mainWith(spark, out, out2, 2)
    }
    assert(e.getMessage.contains("escapes"), e.getMessage)
  }
}
