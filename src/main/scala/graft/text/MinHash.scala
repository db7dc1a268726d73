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

  /** LSH candidate pairs: same band-hash in any band. */
  def candidates(sig: DataFrame): DataFrame = {
    val bandStructs: Seq[Column] = (0 until Bands).map { j =>
      val cols = (0 until 4).map(r => col(s"m${j * 4 + r}"))
      struct(lit(j).as("band"), hash(cols: _*).as("bh"))
    }
    val banded = sig
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("x"))
      .select(col("doc_id"), col("x.band").as("band"), col("x.bh").as("bh"))
    val l = banded.select(col("band"), col("bh"), col("doc_id").as("doc_a"))
    val r = banded.select(col("band"), col("bh"), col("doc_id").as("doc_b"))
    l.join(r, Seq("band", "bh"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  val defs: Map[String, Q] = Map(
    /** q51: LSH candidates, exactly verified (so output ⊆ q50's exact
      * pairs; recall is the sketch's quality metric). */
    "q_dedup_minhash" -> ((s, d) => {
      val toks = Dedup.subsetTokens(s, d).persist()
      val cands = candidates(signatures(toks))
      Dedup.verifyPairs(cands, Dedup.docSets(toks))
        .orderBy("doc_a", "doc_b")
    })
  )

  val sql: Map[String, String] = Map.empty // oracle=none: sketch-based
}
