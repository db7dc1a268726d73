package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.text.{Dedup, MinHash}

/** Ad-hoc stage timing for the signed LSH maintenance path — which
  * piece of the per-batch work actually carries the cost (bench
  * attribution for the q139 perf budget; not a declared surface). */
object LshProfile {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.maxFields",
        sys.env.getOrElse("SPARK_GRAFT_MAXFIELDS", "100"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[lshprof] $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // every staged frame (docSets, cands, ...) comes back MATERIALIZED
    // (localCheckpoint + count) — so verifyPairsLazy's double
    // consumption of cands downstream reads checkpointed rows, never
    // recomputing the candidate union/distinct inside the timed verify
    // step (ADVICE r14: the profiler must not skew its own attribution)
    def cnt(name: String)(df: => DataFrame): DataFrame =
      t(name) { val x = df.localCheckpoint(); println(s"[lshprof]   rows=${x.count()}"); x }

    for (rep <- 1 to 2) {
      println(s"[lshprof] === rep $rep ===")
      val toksAll = t("toksAll")(Dedup.tokens(s, d).persist())
      val docSets = cnt("docSets")(Dedup.docSets(toksAll))
      val bandedOld = cnt("bandedOld")(MinHash.banded(MinHash.signatures(
        toksAll.filter(col("doc_id") % 10 =!= 0))))
      val bandedIns = cnt("bandedIns")(MinHash.banded(MinHash.signatures(
        toksAll.filter(col("doc_id") % 10 === 0))))
      val deleted = Tables.documents(s, d).filter(col("doc_id") % 10 === 1)
        .select("doc_id")
      val touched = cnt("touchedKeys")(
        MinHash.touchedKeys(bandedOld, bandedIns, deleted))
      val rebuiltBk = cnt("bucketsTouched")(
        MinHash.bucketsTouched(bandedOld, bandedIns, deleted, Some(touched)))
      val cands = cnt("candidates")(
        MinHash.candidatesFromBuckets(rebuiltBk)
          .unionByName(MinHash.starCandidates(rebuiltBk)).distinct())
      val verified = cnt("verify")(
        Dedup.verifyPairsLazy(cands, docSets).select("doc_a", "doc_b"))
      println(s"[lshprof] verified=${verified.count()}")
      Seq(toksAll, docSets, bandedOld).foreach(_.unpersist(blocking = false))
    }
    s.stop()
  }
}
