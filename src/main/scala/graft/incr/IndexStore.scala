package graft.incr

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.iter.KMeans

/** CROSS-SESSION persistence for the signed-index families [P §5 —
  * the MRBG-Store must survive process death]: the MinHash / SimHash
  * band-hash relations and the IVF (assignment + centroids) index are
  * the stored state their signed maintenance paths
  * (`MinHash.indexApplyDelta` / `SimHash.indexApplyDelta` /
  * `Similarity.ivfApplyDelta`) read — in-session they live in the
  * structure memos, and THIS is how they outlive the session, the
  * same Parquet write-through `IncrMerge.writePartials` gives
  * aggregation partials, `MrbgPagerank.writeState` gives PageRank
  * state and `KMeans.writeCentroids` gives centroids.
  *
  * Why Parquet round-trips are exact here: every index relation is
  * integers only — MinHash (doc_id, band, bh) and SimHash (doc_id,
  * sig, band, bh) are long/int columns; the IVF assignment carries
  * the raw float32 embedding (stored verbatim) plus an int cluster;
  * centroids are IEEE doubles, which Parquet stores bit-exactly. So a
  * NEW session reading the store and applying a delta produces the
  * byte-identical relation the writing session would have — no
  * re-derivation, no float drift. `Round9Spec` proves each family's
  * restart ≡ the in-memory maintenance chain.
  *
  * Scale: the band index is O(docs·bands) narrow rows and the IVF
  * assignment is corpus-sized but written ONCE — nightly maintenance
  * then reads the store, applies a delta-proportional update, and
  * writes the post version (the read below is a plain parquet scan,
  * so partition pruning / column pruning apply as usual). */
object IndexStore {

  /** Persist an index relation (overwrite = the store's new version). */
  def write(index: DataFrame, path: String): Unit =
    index.write.mode("overwrite").parquet(path)

  /** Read an index relation back — in THIS or any later session. The
    * plan below the read is a genuine parquet scan: downstream signed
    * maintenance joins prune columns/partitions like any other scan. */
  def read(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)

  /** Persist an IVF index: the cluster assignment at `path`/corpus,
    * the centroid model at `path`/centroids (via
    * [[KMeans.writeCentroids]] — k·dims doubles, one file). */
  def writeIvf(indexed: DataFrame, cents: Array[Array[Double]],
               path: String): Unit = {
    write(indexed, s"$path/corpus")
    KMeans.writeCentroids(indexed.sparkSession, cents, s"$path/centroids")
  }

  /** Read an IVF index written by [[writeIvf]] back into the
    * (assignment, centroids) pair `Similarity.ivfApplyDelta` /
    * `Similarity.ivfSearchBatch` consume. */
  def readIvf(s: SparkSession, path: String)
      : (DataFrame, Array[Array[Double]]) =
    (read(s, s"$path/corpus"), KMeans.readCentroids(s, s"$path/centroids"))
}
