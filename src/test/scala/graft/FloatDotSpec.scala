package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.functions.FloatDot.{float_dot, register}

/** The native codegen expression must be bit-identical to the
  * built-in higher-order-function composition it accelerates. */
class FloatDotSpec extends SparkSpecBase {

  private def hofDot = {
    val e = col("embedding")
    aggregate(zip_with(e, e, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
  }

  test("float_dot == aggregate(zip_with(...)) bitwise on all embeddings") {
    val emb = Tables.embeddings(spark, sfDir)
    val both = emb.select(col("vec_id"),
      float_dot(col("embedding"), col("embedding")).as("native"),
      hofDot.as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("float_dot registers as a SQL function") {
    register(spark)
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("emb_fd")
    val r = spark.sql(
      "SELECT vec_id, float_dot(embedding, embedding) AS d FROM emb_fd ORDER BY vec_id LIMIT 1")
      .head()
    assert(r.getDouble(1) > 0.0)
  }

  test("microbenchmark: native expression vs HOF composition") {
    val emb = Tables.embeddings(spark, sfDir).persist()
    emb.count()
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val reps = 20
    var tNative = 0.0; var tHof = 0.0
    for (_ <- 1 to reps) {
      tNative += time(emb.select(
        float_dot(col("embedding"), col("embedding")).as("d"))
        .agg(sum("d")).head().getDouble(0).toLong)
      tHof += time(emb.select(hofDot.as("d"))
        .agg(sum("d")).head().getDouble(0).toLong)
    }
    info(f"native=${tNative / reps}%.4fs hof=${tHof / reps}%.4fs per pass")
    emb.unpersist()
  }
}
