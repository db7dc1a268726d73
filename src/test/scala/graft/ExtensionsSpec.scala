package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.plans.FloatDotRewrite

/** The SparkSessionExtensions surface: the HOF-dot-product optimizer
  * rule fires, preserves results bit-for-bit, and leaves non-matching
  * aggregates alone. Uses experimental.extraOptimizations (the
  * runtime injection point backed by the same rule object that
  * GraftExtensions installs at session build). */
class ExtensionsSpec extends SparkSpecBase {

  private def hofDot = aggregate(
    zip_with(col("embedding"), col("embedding"),
      (x, y) => x.cast("double") * y.cast("double")),
    lit(0.0), (acc, v) => acc + v)

  test("FloatDotRewrite turns the HOF dot product into FloatDot") {
    val df = Tables.embeddings(spark, sfDir).select(hofDot.as("d"))
    val rewritten = FloatDotRewrite(df.queryExecution.analyzed)
    assert(rewritten.toString.toLowerCase.contains("floatdot"),
      s"rule did not fire:\n$rewritten")
  }

  test("rule is idempotent (fixed-point batches re-run it)") {
    val df = Tables.embeddings(spark, sfDir).select(hofDot.as("d"))
    val once = FloatDotRewrite(df.queryExecution.analyzed)
    val twice = FloatDotRewrite(once)
    assert(once == twice, "second application must be a no-op")
  }

  test("rewrite preserves results bitwise (equal-length arrays)") {
    val emb = Tables.embeddings(spark, sfDir)
    val expected = emb.select(col("vec_id"), hofDot.as("d")).collect()
      .map(r => r.getLong(0) -> java.lang.Double.doubleToLongBits(r.getDouble(1)))
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ FloatDotRewrite
    try {
      val df = emb.select(col("vec_id"), hofDot.as("d"))
      assert(df.queryExecution.optimizedPlan.toString.toLowerCase
        .contains("floatdot"), "rule not applied through the optimizer")
      val got = df.collect()
        .map(r => r.getLong(0) -> java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(got.toMap == expected.toMap)
    } finally spark.experimental.extraOptimizations = prev
  }

  test("rule leaves ragged/null inputs semantically intact") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, 2.0f), Array(3.0f, 4.0f)),   // equal: 11.0
      (2L, Array(1.0f, 2.0f), Array(3.0f)),          // ragged: HOF -> null
      (3L, null.asInstanceOf[Array[Float]], Array(1.0f)) // null -> null
    ).toDF("id", "a", "b")
    val hof = aggregate(
      zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val expected = df.select(col("id"), hof.as("d")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ FloatDotRewrite
    try {
      val got = df.select(col("id"), hof.as("d")).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      assert(got.toMap == expected.toMap)
      assert(got.toMap == Map(1L -> Some(11.0), 2L -> None, 3L -> None))
    } finally spark.experimental.extraOptimizations = prev
  }

  test("rule does NOT fire on a raw-float multiply (not bit-equivalent)") {
    // (x, y) -> x * y on floats: each product rounds to float before
    // the Add widens it, while FloatDot multiplies widened doubles.
    import spark.implicits._
    val df = Seq((1L, Array(1.1f, 2.2f), Array(3.3f, 4.4f))).toDF("id", "a", "b")
      .select(aggregate(
        zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("d"))
    val rewritten = FloatDotRewrite(df.queryExecution.analyzed)
    assert(!rewritten.toString.toLowerCase.contains("floatdot"),
      s"rule must not fire on float-typed multiply:\n$rewritten")
  }

  test("nullable-element arrays: null slot stays NULL under the rewrite") {
    // parquet list elements are containsNull=true; the rewrite must
    // still fire (runtime guard) and a genuine null element must fall
    // through to the HOF's NULL, not FloatDot's 0.0 treatment.
    val df = spark.range(2).select(
      col("id"),
      when(col("id") === 0, array(lit(1.0f), lit(null).cast("float")))
        .otherwise(array(lit(1.0f), lit(2.0f))).as("a"),
      array(lit(2.0f), lit(3.0f)).as("b"))
    val hof = aggregate(
      zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ FloatDotRewrite
    try {
      val q = df.select(col("id"), hof.as("d"))
      assert(q.queryExecution.optimizedPlan.toString.toLowerCase
        .contains("floatdot"), "rule must fire on nullable-element arrays")
      val got = q.collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap
      assert(got == Map(0L -> None, 1L -> Some(8.0)))
    } finally spark.experimental.extraOptimizations = prev
  }

  test("GraftExtensions class wires function + rule (smoke)") {
    // The builder-time path needs a fresh session; here we assert the
    // extension object is constructible and injects without error into
    // a SparkSessionExtensions instance.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext)
  }
}
