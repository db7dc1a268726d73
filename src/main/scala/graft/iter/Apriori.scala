package graft.iter

import org.apache.spark.sql.DataFrame
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

  /** GENERAL k-itemset Apriori (the paper's iterated workload [P §7]:
    * L1 → C2 → L2 → … → Lk). `toks` is the deduplicated (doc_id, tok)
    * relation; returns (items: array<string> sorted asc, support).
    *
    * Level-wise shape: per-doc instances of FREQUENT (k-1)-itemsets
    * (Dk-1) extend by one frequent item with tok > last(items) — the
    * sorted-array invariant makes each candidate unique — then the
    * level closes with (a) the support count and (b) a LEFT-SEMI join
    * restricting Dk to itemsets that met min-support, which is exactly
    * the Apriori pruning step: level k+1 never expands an infrequent
    * k-itemset. Every level is ONE shuffle-join on doc_id plus one
    * groupBy; the semi join keys on the sorted array itself. Pruning
    * is lossless (any frequent k-itemset has frequent subsets), so
    * the result equals the brute-force expansion the oracle runs. */
  def frequentItemsets(toks0: DataFrame, k: Int,
                       minSup: Long): DataFrame = {
    require(k >= 1, "k >= 1")
    val toks = toks0.select(col("doc_id"), col("tok"))
    val l1 = toks.groupBy("tok").agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSup)
    // frequent single items per doc — the expansion alphabet
    val freqToks = toks.join(broadcast(l1.select("tok")), "tok")
      .persist()
    var dk = freqToks.select(col("doc_id"), array(col("tok")).as("items"))
    var lk = l1.select(array(col("tok")).as("items"), col("support"))
    for (_ <- 2 to k) {
      val cand = dk.join(freqToks, "doc_id")
        .filter(col("tok") > element_at(col("items"), -1))
        .select(col("doc_id"),
          concat(col("items"), array(col("tok"))).as("items"))
      lk = cand.groupBy("items").agg(count(lit(1)).as("support"))
        .filter(col("support") >= minSup)
        .localCheckpoint() // referenced by the semi join AND the result
      dk = cand.join(lk.select("items"), Seq("items"), "left_semi")
    }
    freqToks.unpersist(blocking = false)
    lk
  }

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
    }),

    /** q102: frequent 3-itemsets via the general level-wise
      * [[frequentItemsets]] (L1 → L2 → L3 with per-level pruning);
      * oracle = the brute-force triple self-join, equal because
      * Apriori pruning is lossless. */
    "q_apriori_triples" -> ((s, d) => {
      val toks = documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
        .distinct()
      frequentItemsets(toks, 3, minSupport)
        .select(element_at(col("items"), 1).as("tok_a"),
          element_at(col("items"), 2).as("tok_b"),
          element_at(col("items"), 3).as("tok_c"),
          col("support"))
        .orderBy("tok_a", "tok_b", "tok_c")
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
         ORDER BY tok_a, tok_b""",
    "q_apriori_triples" ->
      s"""WITH toks AS (
           SELECT DISTINCT doc_id, tok FROM (
             SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
           ) r WHERE length(tok) > 0
         )
         SELECT a.tok AS tok_a, b.tok AS tok_b, c.tok AS tok_c,
                count(*) AS support
         FROM toks a
         JOIN toks b ON a.doc_id = b.doc_id AND a.tok < b.tok
         JOIN toks c ON b.doc_id = c.doc_id AND b.tok < c.tok
         GROUP BY a.tok, b.tok, c.tok
         HAVING count(*) >= $minSupport
         ORDER BY tok_a, tok_b, tok_c"""
  )
}
