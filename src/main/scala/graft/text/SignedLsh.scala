package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SIGNED (insert + delete) band-index maintenance shared by the
  * MinHash and SimHash families [P §3: update = delete + insert] —
  * one implementation, parameterized by each family's bucket
  * aggregation, so the two sketch families cannot drift.
  *
  * All three operations touch only (doc_id, band, bh); family-
  * specific columns (SimHash's `sig`) ride through untouched. The
  * soundness argument is the same for both families: bucket
  * membership is DOC-LOCAL (a doc's band hashes derive from its own
  * signature only), so no surviving doc's index rows change under a
  * delta, and the buckets whose membership can change are exactly the
  * [[touchedKeys]].
  *
  * Why deletion is bucket-level rather than pair-level: under a
  * bucket-size cap (MinHash.MaxBucket) a deletion can shrink a
  * quarantined mega-bucket BELOW the cap and REVEAL pairs that never
  * existed in any previous candidate set — no pair-subtraction scheme
  * can produce them. Rebuilding the touched buckets and re-deriving
  * their pairs through the same consumers as the batch path is the
  * only maintenance rule consistent with a full recompute, and it
  * stays delta-proportional: the rebuild semi-joins on delta-touched
  * keys only. `SignedLshSpec` proves
  * buckets(post) = stored ANTI-JOIN touchedKeys ∪ bucketsTouched
  * for both families, plus the cap-reveal case. */
private[text] object SignedLsh {

  /** Post-delta banded index: deleted docs leave by a delta-sized
    * broadcast anti-join, inserted docs' rows union in. */
  def applyDelta(bandedOld: DataFrame, bandedIns: DataFrame,
                 deletedIds: DataFrame): DataFrame =
    bandedOld.join(broadcast(deletedIds), Seq("doc_id"), "left_anti")
      .unionByName(bandedIns)

  /** The (band, bh) keys the delta touches — delta-proportional
    * (each delta doc touches exactly the family's band count). */
  def touchedKeys(bandedOld: DataFrame, bandedIns: DataFrame,
                  deletedIds: DataFrame): DataFrame =
    bandedIns.select("band", "bh")
      .unionByName(
        bandedOld.join(broadcast(deletedIds), Seq("doc_id"), "left_semi")
          .select("band", "bh"))
      .distinct()

  /** POST-delta bucket rows of exactly the touched buckets, under the
    * family's bucket aggregation. Pass a precomputed `touched` frame
    * when the caller also needs it for the untouched-bucket anti-join
    * — otherwise the key derivation would run twice. */
  def bucketsTouched(bucketsOf: DataFrame => DataFrame)
                    (bandedOld: DataFrame, bandedIns: DataFrame,
                     deletedIds: DataFrame,
                     touched: Option[DataFrame] = None): DataFrame =
    bucketsOf(
      applyDelta(bandedOld, bandedIns, deletedIds)
        .join(broadcast(touched.getOrElse(
            touchedKeys(bandedOld, bandedIns, deletedIds))),
          Seq("band", "bh")))
}
