package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.{Dedup, MinHash, SimHash}

/** SIGNED (insert+delete) incremental LSH index maintenance [P §3] —
  * the '-' half of the delta model applied to the MinHash and SimHash
  * band-bucket indexes.
  *
  * The load-bearing invariant for both families:
  *
  *   buckets(post-delta corpus) =
  *     storedBuckets ANTI-JOIN touchedKeys  ∪  bucketsTouched
  *
  * i.e. a full recompute of the bucket relation equals passthrough of
  * untouched buckets plus the delta-proportional rebuild. Everything
  * downstream (candidate pairs, star candidates, quarantine) consumes
  * the bucket relation through the SAME functions on both paths, so
  * bucket-relation equality is result-equality for the whole dedup
  * pipeline. Plus the cap-reveal case that forces the bucket-level
  * design: deletion shrinking a mega-bucket below MaxBucket exposes
  * pairs no previous candidate set ever contained. */
class SignedLshSpec extends SparkSpecBase {

  // fixture delta convention (Round8): base = %10<>0, ins = %10==0,
  // del = %10==1 (subset of base); post corpus = %10<>1
  private def toksAll = Dedup.tokens(spark, sfDir)

  private def bucketSet(df: DataFrame): Set[(Int, Long, Seq[Long])] =
    df.select(col("band").cast("int"), col("bh").cast("long"), col("ds"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2)))
      .toSet

  test("MinHash signed maintenance: full post buckets == untouched ∪ rebuilt") {
    val toks = toksAll.persist()
    val bandedOld = MinHash.banded(MinHash.signatures(
      toks.filter(col("doc_id") % 10 =!= 0))).persist()
    val bandedIns = MinHash.banded(MinHash.signatures(
      toks.filter(col("doc_id") % 10 === 0)))
    val deleted = toks.filter(col("doc_id") % 10 === 1)
      .select("doc_id").distinct()

    val touched = MinHash.touchedKeys(bandedOld, bandedIns, deleted)
    val maintained = bucketSet(
      MinHash.bucketsOf(bandedOld).join(touched, Seq("band", "bh"), "left_anti")
        .unionByName(MinHash.bucketsTouched(bandedOld, bandedIns, deleted)))
    val full = bucketSet(MinHash.buckets(MinHash.signatures(
      toks.filter(col("doc_id") % 10 =!= 1))))
    assert(maintained == full,
      s"maintained ${maintained.size} buckets, full recompute ${full.size}")
    toks.unpersist(); bandedOld.unpersist()
  }

  test("MinHash deletion REVEALS cap-suppressed pairs (bucket-level necessity)") {
    val sp = spark
    import sp.implicits._
    // one bucket of 5 member docs at cap 4: quarantined pre-delta, so
    // candidatesFromBuckets emits NOTHING for it. Deleting two members
    // shrinks it to 3 <= cap — the survivors' pairs appear for the
    // first time. A pair-subtraction scheme cannot produce them; the
    // touched-bucket rebuild must.
    val bandedOld = Seq(1L, 2L, 3L, 4L, 5L).map(d => (d, 0, 77L))
      .toDF("doc_id", "band", "bh")
    val bandedIns = Seq.empty[(Long, Int, Long)].toDF("doc_id", "band", "bh")
    val deleted = Seq(4L, 5L).toDF("doc_id")
    val cap = 4

    def pairs(bk: DataFrame) =
      MinHash.candidatesFromBuckets(bk, cap).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(pairs(MinHash.bucketsOf(bandedOld)).isEmpty,
      "pre-delta the bucket is over cap — no pairs may exist")
    val incr = pairs(MinHash.bucketsTouched(bandedOld, bandedIns, deleted))
    val full = pairs(MinHash.bucketsOf(
      MinHash.indexApplyDelta(bandedOld, bandedIns, deleted)))
    assert(incr == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(incr == full, "touched-bucket rebuild must equal full recompute")
  }

  test("SimHash signed maintenance: full post buckets == untouched ∪ rebuilt") {
    def simBucketSet(df: DataFrame): Set[(Int, Long, Seq[(Long, Long)])] =
      df.select(col("band").cast("int"), col("bh").cast("long"), col("ds"))
        .collect()
        .map { r =>
          (r.getInt(0), r.getLong(1),
            r.getSeq[org.apache.spark.sql.Row](2)
              .map(x => (x.getLong(0), x.getLong(1))))
        }.toSet

    val toks = toksAll.persist()
    val bandedOld = SimHash.banded(SimHash.signatures(
      toks.filter(col("doc_id") % 10 =!= 0))).persist()
    val bandedIns = SimHash.banded(SimHash.signatures(
      toks.filter(col("doc_id") % 10 === 0)))
    val deleted = toks.filter(col("doc_id") % 10 === 1)
      .select("doc_id").distinct()

    val touched = SimHash.touchedKeys(bandedOld, bandedIns, deleted)
    val maintained = simBucketSet(
      SimHash.bucketsOf(bandedOld).join(touched, Seq("band", "bh"), "left_anti")
        .unionByName(SimHash.bucketsTouched(bandedOld, bandedIns, deleted)))
    val full = simBucketSet(SimHash.bucketsOf(SimHash.banded(
      SimHash.signatures(toks.filter(col("doc_id") % 10 =!= 1)))))
    assert(maintained == full,
      s"maintained ${maintained.size} buckets, full recompute ${full.size}")
    toks.unpersist(); bandedOld.unpersist()
  }

  test("signed pair maintenance composes: pairs(post) == untouched ∪ rebuilt pairs") {
    // pair-level corollary of the bucket invariant, end-to-end through
    // candidatesFromBuckets: the union of untouched buckets' pairs and
    // rebuilt touched buckets' pairs equals the full post-delta
    // candidate set (pairs may arise from BOTH sides — distinct union)
    val toks = toksAll.persist()
    val bandedOld = MinHash.banded(MinHash.signatures(
      toks.filter(col("doc_id") % 10 =!= 0))).persist()
    val bandedIns = MinHash.banded(MinHash.signatures(
      toks.filter(col("doc_id") % 10 === 0)))
    val deleted = toks.filter(col("doc_id") % 10 === 1)
      .select("doc_id").distinct()

    def pairSet(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val touched = MinHash.touchedKeys(bandedOld, bandedIns, deleted)
    val untouchedPairs = pairSet(MinHash.candidatesFromBuckets(
      MinHash.bucketsOf(bandedOld)
        .join(touched, Seq("band", "bh"), "left_anti")))
    val rebuiltPairs = pairSet(MinHash.candidatesFromBuckets(
      MinHash.bucketsTouched(bandedOld, bandedIns, deleted)))
    val fullPairs = pairSet(MinHash.candidates(MinHash.signatures(
      toks.filter(col("doc_id") % 10 =!= 1))))
    assert((untouchedPairs ++ rebuiltPairs) == fullPairs)
    toks.unpersist(); bandedOld.unpersist()
  }
}
