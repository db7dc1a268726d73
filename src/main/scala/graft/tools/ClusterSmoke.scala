package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MULTI-PROCESS smoke tier (VERDICT r13 task 3): the whole declared
  * registry, the de-corpused capped verify, the TopK custom operator
  * and the Fenwick sweep, executed under `local-cluster[2,2,2048]` —
  * REAL executor JVMs, real closure/row serialization, real broadcast
  * transport and the real 8 GB relation ceiling machinery, none of
  * which local[n] (threads, one JVM) ever exercises. This is the
  * cheapest way to convert "works in local mode" into "survives a
  * cluster": any operator holding a non-serializable reference, any
  * InternalRow reuse bug that thread-mode sharing hides, any
  * driver-only state assumption fails HERE with a loud stack.
  *
  * A runMain tool rather than a ScalaTest suite because the test JVM
  * holds one shared local[4] SparkContext for all 57 suites — a
  * second context with a different master cannot coexist; `run / fork
  * := true` gives this its own JVM like Bench/Verify.
  *
  * Usage: SPARK_HOME=/opt/spark sbt "runMain graft.tools.ClusterSmoke
  *   [sfDir]"   (exit 0 = all green; failures listed on stderr).
  * The driver JVM needs SPARK_HOME so the in-process Worker can build
  * executor launch commands; executor classpath/module-opens are set
  * below. */
object ClusterSmoke {

  /** Queries whose empty result is legitimate at sf0.001 (mirrors
    * RegistrySmokeSpec). */
  private val mayBeEmpty = Set("q_join_anti", "q_set_except")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")
    val classes = new java.io.File("target/scala-2.13/classes")
      .getAbsolutePath
    val spark = SparkSession.builder()
      .master("local-cluster[2,2,2048]")
      .appName("graft-cluster-smoke")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.extraClassPath",
        s"$classes:/opt/spark/jars/*")
      .config("spark.executor.extraJavaOptions",
        s"$addOpens -Duser.timezone=UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    var failed = List.empty[(String, String)]
    def check(name: String)(body: => Unit): Unit =
      try body catch {
        case e: Throwable =>
          failed ::= (name, e.toString.linesIterator.next())
          System.err.println(s"[cluster-smoke] FAIL $name: $e")
      }

    // sanity: we really are multi-process (driver + 2 executors).
    // Registration is async — poll up to 60 s before declaring the
    // topology wrong.
    check("cluster-topology") {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      var hosts = spark.sparkContext.getExecutorMemoryStatus.size
      while (hosts < 3 && System.nanoTime() < deadline) {
        Thread.sleep(500)
        hosts = spark.sparkContext.getExecutorMemoryStatus.size
      }
      require(hosts == 3, s"expected driver + 2 executors, got $hosts")
    }

    // 1. the full declared registry under real executors
    val t0 = System.nanoTime()
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach {
      case (name, fn) =>
        check(name) {
          val n = fn(spark, sfDir).count()
          if (!mayBeEmpty(name))
            require(n > 0, s"$name returned no rows")
        }
    }
    println(f"[cluster-smoke] registry pass " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")

    // 2. the de-corpused capped verify (VERDICT r13 task 1) under a
    // REAL broadcast path: forced capped branch must equal the exact
    // branch values pair-for-pair
    check("capped-verify-decorpused") {
      val rel = graft.text.Dedup.subsetTokens(spark, sfDir)
      val (pe, exact) = graft.text.Dedup
        .guardedInterPairs(rel, "tok", "doc_id", volumeCap = Long.MaxValue)
      val (pc, capped) = graft.text.Dedup
        .guardedInterPairs(rel, "tok", "doc_id", volumeCap = 0L)
      require(pe == "exact" && pc == "capped", s"plans $pe/$pc")
      def m(df: DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      val (e, c) = (m(exact), m(capped))
      require(c.nonEmpty, "capped branch found no pairs")
      c.foreach { case (k, v) =>
        require(e.get(k).contains(v), s"pair $k: capped=$v exact=${e.get(k)}")
      }
    }

    // 3. the Fenwick sweep branch (forced) under real row
    // serialization: must equal the exact pair join
    check("sweep-vs-pairjoin") {
      val ev = graft.engine.Tables.events(spark, sfDir)
        .select(col("event_id"), col("event_type"),
          (unix_micros(col("ts"))).as("tsu"),
          floor(col("value") * 100).cast("long").as("vc"))
      val T = 900L * 1000000L
      val V = 5000L
      val exact = graft.ops.Round12b.gridPairs2d(ev, T, V).drop("plan")
      val swept = graft.ops.Round12b
        .gridPairs2d(ev, T, V, volumeCap = 1L).drop("plan")
      require(swept.exceptAll(exact).count() == 0 &&
        exact.exceptAll(swept).count() == 0, "sweep diverged")
    }

    val verdict =
      if (failed.isEmpty) "[cluster-smoke] ALL GREEN"
      else s"[cluster-smoke] ${failed.size} FAILURES: " +
        failed.map(_._1).mkString(", ")
    println(verdict)
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
