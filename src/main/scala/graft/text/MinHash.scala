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

  /** Bucket-size cap — the PRODUCTION GUARD for degenerate corpora
    * (SURVEY §8): a band bucket holding m near-identical boilerplate
    * docs (the common web-crawl failure mode) would otherwise emit
    * m·(m-1)/2 pairs no matter how the generation is spread. Buckets
    * larger than this are EXCLUDED from pair generation and routed to
    * [[quarantine]] instead (count + sample), bounding the pair count
    * at Bands · n/2 · (MaxBucket-1) — linear in the corpus. 64 keeps
    * a capped bucket's own pair cost at <= 2016 pairs. */
  val MaxBucket = 64

  /** Docs sampled per quarantined bucket (enough to eyeball the
    * boilerplate; the full membership is recoverable by re-hashing). */
  val QuarantineSample = 16

  /** Per-doc band hashes (doc_id, band, bh) — the LSH index relation.
    * Map-only from signatures; at production scale THIS is the stored
    * state of an evolving corpus (persist via
    * `IncrMerge.writePartials`), since it's per-doc and never needs
    * recomputation when other docs arrive. */
  def banded(sig: DataFrame): DataFrame = {
    val bandStructs: Seq[Column] = (0 until Bands).map { j =>
      val cols = (0 until 4).map(r => col(s"m${j * 4 + r}"))
      struct(lit(j).as("band"), hash(cols: _*).as("bh"))
    }
    sig
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("x"))
      .select(col("doc_id"), col("x.band").as("band"), col("x.bh").as("bh"))
  }

  /** Per-(band, band-hash) sorted doc lists of size >= 2 — the shared
    * bucket relation behind [[candidates]] and [[quarantine]]. */
  def buckets(sig: DataFrame): DataFrame = bucketsOf(banded(sig))

  /** [[buckets]] over a prebuilt [[banded]] index relation — the form
    * the incremental maintenance path uses (the stored index is the
    * banded frame, not the signatures). */
  def bucketsOf(bandedIdx: DataFrame): DataFrame =
    bandedIdx
      .groupBy("band", "bh")
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) > 1)

  /** Post-delta band-hash index under a SIGNED doc delta [P §3] —
    * the shared [[SignedLsh.applyDelta]] (see its scaladoc for the
    * doc-locality soundness argument). */
  def indexApplyDelta(bandedOld: DataFrame, bandedIns: DataFrame,
                      deletedIds: DataFrame): DataFrame =
    SignedLsh.applyDelta(bandedOld, bandedIns, deletedIds)

  /** The (band, bh) keys a SIGNED delta TOUCHES — delta-proportional
    * (each delta doc touches exactly [[Bands]] keys). */
  def touchedKeys(bandedOld: DataFrame, bandedIns: DataFrame,
                  deletedIds: DataFrame): DataFrame =
    SignedLsh.touchedKeys(bandedOld, bandedIns, deletedIds)

  /** SIGNED incremental bucket maintenance [P §3 — the MRBG
    * group-level recompute applied to the LSH index]: the POST-delta
    * bucket rows of exactly the [[touchedKeys]] buckets, so the
    * stored bucket relation updates as
    *
    *   buckets(post) = storedBuckets ANTI-JOIN touchedKeys  ∪  THIS
    *
    * (`SignedLshSpec` proves the equality; [[SignedLsh]] documents
    * why deletion under the [[MaxBucket]] cap forces bucket-level
    * maintenance — the cap-reveal argument). Downstream, the rebuilt
    * buckets feed the same [[candidatesFromBuckets]] /
    * [[starCandidates]] / [[quarantine]] consumers as the batch path.
    * Pass a precomputed `touched` frame when the caller also
    * anti-joins the stored buckets with it. */
  def bucketsTouched(bandedOld: DataFrame, bandedIns: DataFrame,
                     deletedIds: DataFrame,
                     touched: Option[DataFrame] = None): DataFrame =
    SignedLsh.bucketsTouched(bucketsOf)(
      bandedOld, bandedIns, deletedIds, touched)

  /** INCREMENTAL LSH candidates [P §3,6 applied to dedup]: the pairs
    * an insert-only doc delta ADDS — every pair with at least one new
    * doc. `bandedOld` is the STORED per-doc band-hash relation of the
    * existing corpus ([[banded]], persisted once); `bandedNew` the
    * delta's. Only buckets TOUCHED by a new doc are rebuilt (the join
    * on the delta's (band, bh) set), and pair generation is
    * new×bucket — delta-proportional, never corpus². Soundness: a
    * band bucket is keyed by the doc's own signature, so old docs'
    * bucket membership never changes; full-candidates(old ∪ delta) =
    * old-candidates ∪ THIS (uncapped; `Round6Spec` proves the
    * equality). The [[MaxBucket]] cap applies to the POST-delta
    * bucket size, consistent with a full recompute. This is the
    * insert-only fast path — pair generation is new×bucket; for the
    * SIGNED (insert+delete) delta use [[bucketsTouched]], which
    * rebuilds touched buckets instead (deletion can REVEAL
    * cap-suppressed pairs, so it is bucket-level by necessity). */
  def candidatesIncr(bandedOld: DataFrame, bandedNew: DataFrame,
                     maxBucket: Int = MaxBucket): DataFrame = {
    val all = bandedOld.withColumn("is_new", lit(false))
      .unionByName(bandedNew.withColumn("is_new", lit(true)))
    val touched = bandedNew.select("band", "bh").distinct()
    all.join(touched, Seq("band", "bh")) // delta-touched buckets only
      .groupBy("band", "bh")
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"),
        sort_array(collect_list(when(col("is_new"), col("doc_id"))))
          .as("ds_new"))
      .filter(size(col("ds")) > 1 && size(col("ds")) <= maxBucket)
      .select(col("ds"), explode(col("ds_new")).as("doc_n"))
      .repartition(col("doc_n"))
      .select(col("doc_n"), explode(col("ds")).as("doc_o"))
      .filter(col("doc_n") =!= col("doc_o"))
      .select(least(col("doc_n"), col("doc_o")).as("doc_a"),
        greatest(col("doc_n"), col("doc_o")).as("doc_b"))
      .distinct()
  }

  /** LSH candidate pairs: same band-hash in any band, bucket size
    * capped at `maxBucket` (oversized buckets are quarantined — see
    * [[MaxBucket]]). Within a bucket the m·(m-1)/2 pairs are generated
    * by TWO chained generators — posexplode picks the left element, a
    * second explode over the remaining suffix emits the partners —
    * with a repartition in between. Memory per row stays O(bucket),
    * never O(bucket²), and a large bucket's pair generation is spread
    * across every core instead of pinned to the one task that owns the
    * bucket row. (A previous single-expression
    * flatten(transform(transform(...))) built the entire quadratic
    * pair array of a bucket inside one row — with skewed buckets that
    * serializes the whole query onto one GC-bound task.) */
  def candidates(sig: DataFrame, maxBucket: Int = MaxBucket): DataFrame =
    candidatesFromBuckets(buckets(sig), maxBucket)

  /** Pair generation over a prebuilt [[buckets]] frame — callers that
    * also consume [[quarantine]] build the buckets once (persist or
    * localCheckpoint) and feed both from it. */
  def candidatesFromBuckets(bk: DataFrame,
                            maxBucket: Int = MaxBucket): DataFrame =
    bk.filter(size(col("ds")) <= maxBucket)
      .select(col("ds"), posexplode(col("ds")))
      .withColumnRenamed("pos", "i").withColumnRenamed("col", "doc_a")
      // no redistribution between the two generators: the cap bounds
      // a row's expansion at maxBucket-1 partners, so the posexplode
      // rows (already spread by the bucket groupBy's shuffle) bound
      // per-task work — a repartition here was one whole extra
      // shuffle of the candidate stream per run. (The historical
      // skew risk was the pre-cap quadratic in-row pair array; the
      // cap + slice-explode shape removed it.)
      .select(col("doc_a"), explode(
        slice(col("ds"), col("i") + lit(2), size(col("ds")))).as("doc_b"))
      .distinct()

  /** SPANNING-STAR candidates for the quarantined (oversized) buckets:
    * each member paired with the bucket's MINIMUM doc (its
    * representative) — O(bucket) pairs instead of the O(bucket²) the
    * cap forbids. The insight: a connected-components dedup collapse
    * needs a SPANNING structure over each near-dup cluster, not every
    * pair — members that exact-verify against the representative merge
    * transitively THROUGH it. Every star edge still goes through the
    * exact Jaccard verify, so soundness is untouched; only pairs whose
    * members are near-dup to each other but not to the representative
    * can be missed (they usually share a smaller, uncapped bucket).
    * Measured on the boilerplate-heavy full fixture corpus: capped
    * candidates alone reach 12% pair recall; capped ∪ star reaches
    * 98% group-level agreement with the exact collapse at +O(n) cost.
    * This is the out-of-band handling [[quarantine]]'s contract
    * promises, expressed in-plan. */
  def starCandidates(bk: DataFrame,
                     maxBucket: Int = MaxBucket): DataFrame =
    bk.filter(size(col("ds")) > maxBucket)
      // ds is sorted ascending, so element 1 is the representative
      .select(element_at(col("ds"), 1).as("doc_a"),
        explode(col("ds")).as("doc_b"))
      .filter(col("doc_a") =!= col("doc_b"))
      .distinct()

  /** [[candidatesFromBuckets]] WITH the generating bucket key — the
    * provenance the signed PAIR-STORE maintenance needs ([P §5]
    * per-group intermediates: stored verified pairs keyed by bucket
    * pass through untouched-bucket maintenance verbatim; only touched
    * buckets re-generate). Pair semantics are identical:
    * `candidatesFromBuckets(bk) == candidatesFromBucketsKeyed(bk)
    * .select("doc_a","doc_b").distinct()`. Within one bucket the
    * (i < j) enumeration is duplicate-free, so no distinct here. */
  def candidatesFromBucketsKeyed(bk: DataFrame,
                                 maxBucket: Int = MaxBucket): DataFrame =
    bk.filter(size(col("ds")) <= maxBucket)
      .select(col("band"), col("bh"), col("ds"), posexplode(col("ds")))
      .withColumnRenamed("pos", "i").withColumnRenamed("col", "doc_a")
      // no repartition — see [[candidatesFromBuckets]]
      .select(col("band"), col("bh"), col("doc_a"), explode(
        slice(col("ds"), col("i") + lit(2), size(col("ds")))).as("doc_b"))

  /** [[starCandidates]] WITH the generating bucket key (see
    * [[candidatesFromBucketsKeyed]]). */
  def starCandidatesKeyed(bk: DataFrame,
                          maxBucket: Int = MaxBucket): DataFrame =
    bk.filter(size(col("ds")) > maxBucket)
      .select(col("band"), col("bh"),
        element_at(col("ds"), 1).as("doc_a"),
        explode(col("ds")).as("doc_b"))
      .filter(col("doc_a") =!= col("doc_b"))

  /** Oversized buckets, one row per (band, bh): how many docs
    * collided and a bounded sample of them. A production pipeline
    * handles these out-of-band (exact dedup inside the bucket —
    * they're near-identical boilerplate by construction — or manual
    * triage); what they must NEVER do is silently expand to m²/2
    * pairs inside the LSH join. */
  def quarantine(bk: DataFrame, maxBucket: Int = MaxBucket): DataFrame =
    bk.filter(size(col("ds")) > maxBucket)
      .select(col("band"), col("bh"), size(col("ds")).as("n_docs"),
        slice(col("ds"), 1, QuarantineSample).as("sample"))

  val defs: Map[String, Q] = Map(
    /** q51: LSH candidates, exactly verified (so output ⊆ q50's exact
      * pairs; recall is the sketch's quality metric). */
    "q_dedup_minhash" -> ((s, d) => {
      val toks = Dedup.subsetTokens(s, d).persist()
      val cands = candidates(signatures(toks))
      // verifyPairs returns the UNSORTED result already materialized;
      // sorting the checkpointed rows avoids executing the pipeline
      // twice (orderBy's range-partition sampling pass + final pass
      // would rebuild the uncached broadcast sides — ~9 s of the old
      // 10 s).
      val mat = Dedup.verifyPairs(cands, Dedup.docSets(toks))
      toks.unpersist(blocking = false)
      mat.orderBy("doc_a", "doc_b")
    })
  )

  val sql: Map[String, String] = Map.empty // oracle=none: sketch-based
}
