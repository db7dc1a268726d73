package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables._

/** §2 row 51 — MinHash + LSH banding near-dup detection [N], the
  * 100 TB-scale replacement for q50's exact pair join.
  *
  * Pipeline (all deterministic integer arithmetic, fixed seed):
  *   token → murmur3 hash → k=32 permutations (a·h+b mod p) →
  *   per-doc min per permutation (one groupBy) → 8 bands × 4 rows →
  *   band-hash bucket join (candidates) → exact Jaccard verify.
  * Cost: O(n·k) hashing + O(n·bands) bucket shuffle + |candidates|
  * verifications — never O(n²). oracle=none (sketch is engine-
  * specific); ScalaTest checks recall vs q50's exact pairs. */
object MinHash {

  val K = 32            // permutations
  val Bands = 8         // 8 bands × 4 rows
  val P = 2147483647L   // 2^31 - 1 (prime)

  /** Fixed-seed permutation coefficients (java.util.Random LCG is
    * specified, so this is stable across JVMs). */
  private val (as_, bs_) = {
    val r = new java.util.Random(42)
    (Array.fill(K)(1L + (r.nextLong().abs % (P - 1))),
     Array.fill(K)(r.nextLong().abs % P))
  }

  /** Per-doc minhash signature columns m0..m{K-1}. */
  def signatures(toks: DataFrame): DataFrame = {
    val h = (hash(col("tok")).cast("long") + (1L << 31)).as("h") // non-negative
    val withH = toks.select(col("doc_id"), h)
    val mins = (0 until K).map(i =>
      min((lit(as_(i)) * col("h") + lit(bs_(i))) % P).as(s"m$i"))
    withH.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** LSH candidate pairs: same band-hash in any band. Buckets are
    * materialized as sorted doc lists and pairs generated in-place
    * (m·(m-1)/2 per bucket) — one shuffle on the bucket key instead of
    * a self-join that re-shuffles the banded table twice. */
  def candidates(sig: DataFrame): DataFrame = {
    val bandStructs: Seq[Column] = (0 until Bands).map { j =>
      val cols = (0 until 4).map(r => col(s"m${j * 4 + r}"))
      struct(lit(j).as("band"), hash(cols: _*).as("bh"))
    }
    val banded = sig
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("x"))
      .select(col("doc_id"), col("x.band").as("band"), col("x.bh").as("bh"))
    banded
      .groupBy("band", "bh")
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) > 1)
      .select(explode(expr(
        """flatten(transform(ds, (x, i) ->
             transform(slice(ds, i + 2, size(ds)),
               y -> struct(x AS doc_a, y AS doc_b))))""")).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .distinct()
  }

  val defs: Map[String, Q] = Map(
    /** q51: LSH candidates, exactly verified (so output ⊆ q50's exact
      * pairs; recall is the sketch's quality metric). */
    "q_dedup_minhash" -> ((s, d) => {
      val toks = Dedup.subsetTokens(s, d).persist()
      val cands = candidates(signatures(toks))
      val out = Dedup.verifyPairs(cands, Dedup.docSets(toks))
        .orderBy("doc_a", "doc_b")
      graft.iter.IterQueries.finish(out, toks)
    })
  )

  val sql: Map[String, String] = Map.empty // oracle=none: sketch-based
}
