package graft.ops

import org.apache.spark.sql.functions._
import graft.engine.Tables._

/** §2 group A — scans / sources. Declarative scans so Catalyst pushes
  * predicates and prunes columns down to the parquet reader (verified
  * via .explain: PushedFilters + ReadSchema). At 100 TB these are the
  * difference between reading 2 columns of a few row groups and the
  * whole table. */
object Scans {

  val defs: Map[String, Q] = Map(
    /** q1: projection-only scan — parquet reads just the 3 columns. */
    "q_scan_project" -> ((s, d) => {
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice").as("price"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    /** q2: predicate reaches the parquet row-group filter. */
    "q_scan_pushdown" -> ((s, d) => {
      lineitem(s, d)
        .filter(col("l_shipdate") < lit("1996-07-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"),
          col("l_quantity").as("qty"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    /** q3: multi-source union of per-table counts (count-star uses
      * parquet footer metadata — no data read). */
    "q_source_all_tables" -> ((s, d) => {
      allNames.map { n =>
        tbl(s, d, n).groupBy().agg(count(lit(1)).as("n"))
          .select(lit(n).as("tbl"), col("n"))
      }.reduce(_ unionByName _).orderBy("tbl")
    })
  )

  val sql: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice AS price
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "q_scan_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity AS qty
         FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-07-01'
         ORDER BY l_orderkey, l_linenumber""",
    "q_source_all_tables" ->
      ("SELECT * FROM (" +
        Seq("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")
          .map(n => s"SELECT '$n' AS tbl, count(*) AS n FROM $n")
          .mkString(" UNION ALL ") +
        ") t ORDER BY tbl")
  )
}
