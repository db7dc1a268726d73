package graft.iter

import org.apache.spark.sql.functions._
import graft.engine.Tables._

/** §2 row 45 — Apriori-style frequent 2-itemset mining (paper workload
  * [P §7]); items = distinct tokens per document.
  *
  * Scale shape: ONE shuffle builds the per-doc sorted distinct token
  * set (collect_set dedups inline — no separate distinct pass), pairs
  * are generated in-map by two chained generators (per-doc set size is
  * bounded by vocabulary, so the expansion is linear in documents),
  * and the closing groupBy's map-side partial aggregation collapses
  * them to ~|vocab|² rows before the second shuffle — never a global
  * cartesian, never a self-join. */
object Apriori {

  val minSupport = 100

  val defs: Map[String, Q] = Map(
    "q_apriori_pairs" -> ((s, d) => {
      documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
        .groupBy("doc_id").agg(sort_array(collect_set(col("tok"))).as("ts"))
        .select(posexplode(col("ts")), col("ts"))
        .withColumnRenamed("col", "tok_a")
        // suffix after tok_a keeps tok_a < tok_b (ts is sorted asc)
        .select(col("tok_a"), explode(
          slice(col("ts"), col("pos") + lit(2), size(col("ts")))).as("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= minSupport)
        .orderBy("tok_a", "tok_b")
    })
  )

  val sql: Map[String, String] = Map(
    "q_apriori_pairs" ->
      s"""WITH toks AS (
           SELECT DISTINCT doc_id, tok FROM (
             SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
           ) r WHERE length(tok) > 0
         )
         SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS support
         FROM toks a JOIN toks b
           ON a.doc_id = b.doc_id AND a.tok < b.tok
         GROUP BY a.tok, b.tok
         HAVING count(*) >= $minSupport
         ORDER BY tok_a, tok_b"""
  )
}
