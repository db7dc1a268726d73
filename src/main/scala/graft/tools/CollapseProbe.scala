package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc: per-round frontier sizes of the q136 LSH min-label
  * collapse — sizing evidence for the compact-collapse rework. */
object CollapseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pairs = graft.ops.Round8.probeLshPairs(spark, sfDir)
    val docs = graft.engine.Tables.documents(spark, sfDir)
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint()
    println(s"[probe] edges=${edges.count()}")
    var state = docs.select(col("doc_id").as("node"), col("doc_id").as("label"))
    var changed = state.select(col("node").as("cnode"), col("label").as("cval"))
    for (i <- 1 to 6) {
      val res = graft.iter.IterQueries
        .minPropagate(edges, state, changed, "label", 0L, 1, matEvery = 1)
      val n = res.filter(col("chg")).count()
      println(s"[probe] round $i frontier=$n")
      state = res.select("node", "label")
      changed = res.filter(col("chg"))
        .select(col("node").as("cnode"), col("label").as("cval"))
    }
    spark.stop()
  }
}
