package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Default to every core on the host (the driver benches at local[32]
    // and does not always export SPARK_GRAFT_CPUS).
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString)
    // Per-query repeats: the host carries external load (loadavg swings
    // 2→10 with zero local processes — BASELINE.md), so a single sample
    // can charge a query 3x its warm cost. Each query runs `repeats`
    // times back-to-back; the JSON reports the per-query MEDIAN (and
    // min), total = Σ medians. Contract unchanged: one JSON line,
    // "queries" maps name → seconds.
    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up: absorb one-time JVM/codegen/session costs so the
    // first timed query measures the query, not the cold start.
    try SparkEntry.queries.get("q_scan_project").foreach(_(spark, sfDir).count())
    catch { case _: Throwable => () }
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val samples = (1 to repeats).map(_ => timeOnce(fn)).sorted
      val median = samples(samples.length / 2)
      name -> (median, samples.head)
    }
    val qs = results.map { case (k, (med, _)) => s"\"" + k + "\":" + med }
      .mkString("{", ",", "}")
    val qmins = results.map { case (k, (_, mn)) => s"\"" + k + "\":" + mn }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.map(_._1).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","repeats":$repeats,"queries":$qs,"queries_min":$qmins,"sf":"$sfDir"}""")
    spark.stop()
  }
}
