package graft.text

import org.apache.spark.sql.functions._
import graft.engine.Tables._
import graft.engine.Dec._

/** §2 group I — text analysis + UDF/UDTF surfaces [N]. */
object TextStats {

  /** Scalar UDF surface (q54): text normalizer. Kept as a genuine
    * Scala UDF to exercise the extension point; the built-in-function
    * equivalent is what the oracle replicates. */
  val normalize: String => String =
    s => s.trim.toLowerCase.replaceAll(" +", " ")

  val defs: Map[String, Q] = Map(
    /** q53: per-language corpus stats. */
    "q_text_lang_stats" -> ((s, d) => {
      documents(s, d)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"),
          countDistinct(col("source")).as("n_sources"),
          avgd(sum(col("n_chars")), count(lit(1))).as("avg_chars"))
        .orderBy("lang")
    }),

    /** q54: scalar UDF — normalize a deliberately-uglified input;
      * result must equal the built-in pipeline the oracle uses. */
    "q_udf_norm" -> ((s, d) => {
      val normUdf = udf(normalize)
      documents(s, d)
        .select(col("doc_id"),
          normUdf(concat(lit("  "), upper(col("text")), lit("   "))).as("norm"))
        .orderBy("doc_id")
    }),

    /** q56: UDTF/generator surface — token bigrams per doc via typed
      * flatMap (the Dataset-native generator), top-20. */
    "q_udtf_bigrams" -> ((s, d) => {
      import s.implicits._
      documents(s, d)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .flatMap { case (_, t) =>
          t.split(" ").iterator.filter(_.nonEmpty).sliding(2)
            .collect { case Seq(a, b) => a + " " + b }
        }
        .toDF("bigram")
        .groupBy("bigram").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("bigram"))
        .limit(20)
    })
  )

  val sql: Map[String, String] = Map(
    "q_text_lang_stats" ->
      """SELECT lang, count(*) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS total_chars,
         min(n_chars) AS min_chars, max(n_chars) AS max_chars,
         count(DISTINCT source) AS n_sources,
         CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_chars
         FROM documents GROUP BY lang ORDER BY lang""",
    "q_udf_norm" ->
      """SELECT doc_id,
         regexp_replace(lower(trim('  ' || upper(text) || '   ')), ' +', ' ', 'g') AS norm
         FROM documents ORDER BY doc_id""",
    "q_udtf_bigrams" ->
      """SELECT bigram, count(*) AS cnt FROM (
           SELECT unnest(list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i + 1])) AS bigram
           FROM (SELECT string_split(text, ' ') AS toks FROM documents) t
         ) b
         GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 20"""
  )
}
