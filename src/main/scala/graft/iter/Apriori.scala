package graft.iter

import org.apache.spark.sql.functions._
import graft.engine.Tables._

/** §2 row 45 — Apriori-style frequent 2-itemset mining (paper workload
  * [P §7]); items = distinct tokens per document.
  *
  * Scale shape: the candidate join is per-document (equi-join on
  * doc_id) over *distinct* tokens with tok_a < tok_b — never a global
  * cartesian. At 100 TB the doc_id join key partitions evenly and the
  * per-doc set size is bounded by vocabulary, so the pair expansion is
  * linear in documents. */
object Apriori {

  val minSupport = 100

  val defs: Map[String, Q] = Map(
    "q_apriori_pairs" -> ((s, d) => {
      val toks = documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
        .distinct()
      val a = toks.select(col("doc_id"), col("tok").as("tok_a"))
      val b = toks.select(col("doc_id").as("doc_b"), col("tok").as("tok_b"))
      a.join(b, col("doc_id") === col("doc_b") && col("tok_a") < col("tok_b"))
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
