package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.ops._
import graft.iter.{IterQueries, KMeans, Apriori, MrbgPagerank}
import graft.incr.{IncrMerge, MergeInto}
import graft.text.{Dedup, MinHash, SimHash, Similarity, TextStats}
import graft.stream.StreamOps
import graft.multimodal.Multimodal

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each §2 operator registers a query here; every oracle=SQL row also
  * registers a DuckDB-dialect oracle. Column names/aliases match
  * between the two maps (the driver sorts columns by name and
  * hash-compares values). */
object SparkEntry {

  /** Flagship query (TPC-H Q1 shape, q_agg_basic) on sf0.001; the
    * driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    Aggs.defs("q_agg_basic")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Scans.defs ++ Filters.defs ++ Aggs.defs ++ SortsSets.defs ++
      Joins.defs ++ Windows.defs ++ Scalars.defs ++
      IterQueries.defs ++ KMeans.defs ++ Apriori.defs ++ MrbgPagerank.defs ++
      IncrMerge.defs ++ MergeInto.defs ++
      Dedup.defs ++ MinHash.defs ++ SimHash.defs ++ Similarity.defs ++
      TextStats.defs ++
      Udaf.defs ++ StreamOps.defs ++ Multimodal.defs ++ Extras.defs ++
      Round3.defs ++ Round6.defs ++ Round8.defs ++
      Layout.defs ++ Selectors.defs ++ Round11b.defs ++ Round12.defs ++ Round12b.defs ++
      Analytics.defs ++
      Curation.defs ++
      HeavyHitters.defs ++ BloomPrune.defs ++ TpcH.defs

  /** Registry rows whose FIRST invocation executes a real Structured
    * Streaming run (file source → sink); repeats serve the memoized
    * result. Bench reports their first-sample cost on a dedicated
    * `stream_first` line (VERDICT r16 task 6) so regressions in the
    * stream path itself stay visible — the warm median only times the
    * memo serve. */
  val streamingRows: Set[String] = Set(
    "q_stream_sink_roundtrip", "q_stream_restart_exactly_once",
    "q_stream_join_interval", "q_stream_dedup", "q_stream_merge_upsert")

  /** For each key in queries, equivalent SQL runnable by DuckDB on the
    * same parquet tables. Omitted for non-SQL-expressible ops
    * (sketches, float-order-sensitive loops, streaming-only). */
  def oracleSql: Map[String, String] =
    Scans.sql ++ Filters.sql ++ Aggs.sql ++ SortsSets.sql ++
      Joins.sql ++ Windows.sql ++ Scalars.sql ++
      IterQueries.sql ++ KMeans.sql ++ Apriori.sql ++ MrbgPagerank.sql ++
      IncrMerge.sql ++ MergeInto.sql ++
      Dedup.sql ++ MinHash.sql ++ SimHash.sql ++ Similarity.sql ++
      TextStats.sql ++
      Udaf.sql ++ StreamOps.sql ++ Multimodal.sql ++ Extras.sql ++
      Round3.sql ++ Round6.sql ++ Round8.sql ++
      Layout.sql ++ Selectors.sql ++ Round11b.sql ++ Round12.sql ++ Round12b.sql ++
      Analytics.sql ++
      Curation.sql ++
      HeavyHitters.sql ++ BloomPrune.sql ++ TpcH.sql
}
