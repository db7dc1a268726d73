package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timing harness: runMain graft.BenchOne <query> [sfDir] [cpus] [reps] */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2) else "32"
    val reps = if (args.length > 3) args(3).toInt else 1
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // UTC like Verify/tests: events-time queries read the same
      // instants here as under the oracle on any host tz (ADVICE r10)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_PROFILE=1: per-rep Spark job count + total job wall
    // time, to attribute a slow query to job-launch granularity vs
    // actual compute (the r9 LSH-incr diagnosis tool).
    val profile = sys.env.get("SPARK_GRAFT_PROFILE").contains("1")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobNanos = new java.util.concurrent.atomic.AtomicLong(0L)
    if (profile) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        private val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val site = Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
          starts.put(j.jobId, (System.nanoTime(), site))
        }
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          jobs.incrementAndGet()
          Option(starts.remove(j.jobId)).foreach { case (t0, site) =>
            val dt = System.nanoTime() - t0
            jobNanos.addAndGet(dt)
            if (dt > 2e8) // report jobs over 0.2 s with their call site
              println(f"[benchone]   job ${j.jobId} ${dt / 1e9}%.2f s  $site")
          }
        }
      })
    for (r <- 1 to reps) {
      val (j0, n0) = (jobs.get(), jobNanos.get())
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      // drain the async listener bus so this rep's counters include
      // its own tail jobs instead of leaking into the next rep
      if (profile) org.apache.spark.sql.graftbridge.Bridge
        .drainListenerBus(spark, 10000L)
      val extra = if (profile)
        f" jobs=${jobs.get() - j0} jobtime=${(jobNanos.get() - n0) / 1e9}%.2f s" else ""
      println(f"[benchone] $name rep=$r rows=$n t=$t%.2f s$extra")
    }
    spark.stop()
  }
}
