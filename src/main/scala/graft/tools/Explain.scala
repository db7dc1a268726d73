import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/timing inspector.
  *   runMain Explain q1 q2 ...   — time the named queries
  *   runMain Explain ALL         — replicate the bench loop, split
  *                                 construction vs count time + GC */
object Explain {
  def gcMillis: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
  }
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").isDefined
    val names =
      if (args.sameElements(Array("ALL"))) graft.SparkEntry.queries.keys.toSeq
      else args.toSeq
    var total = 0.0
    for (q <- names) {
      val g0 = gcMillis
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(q)(spark, d)
      val t1 = System.nanoTime()
      if (explain) df.explain("formatted")
      df.count()
      val t2 = System.nanoTime()
      total += (t2 - t0) / 1e9
      println(f"TIMING $q%-32s build=${(t1 - t0) / 1e9}%7.2f count=${(t2 - t1) / 1e9}%7.2f gc=${(gcMillis - g0) / 1000.0}%6.2f")
    }
    println(f"TOTAL ${total}%.1f s")
    spark.stop()
  }
}
