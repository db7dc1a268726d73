package graft

import org.apache.spark.sql.Row
import graft.text.{Dedup, TextStats}
import graft.iter.KMeans

/** Edge cases flagged by the round-1 advisor: inputs the fixture
  * corpus never produces but a library user's data will — documents
  * with fewer than 3 tokens (3-gram paths), empty text, and k-means
  * over id spaces that don't start at 0. */
class EdgeCaseSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs(texts: (Long, String)*) =
    texts.toDF("doc_id", "text")

  test("fingerprint of <3-token docs is NULL, not a crash (ANSI element_at)") {
    val out = TextStats.fingerprintOf(docs(
      1L -> "", 2L -> "one", 3L -> "one two", 4L -> "one two three",
      5L -> "a b c d")).collect()
    // < 3 tokens -> fp NULL; note split("", " ") yields [""] (1 token)
    assert(out.map(r => r.getLong(0) -> r.isNullAt(1)).toMap ==
      Map(1L -> true, 2L -> true, 3L -> true, 4L -> false, 5L -> false))
    // n_grams mirrors DuckDB's raw len-2 (may be <= 0 for short docs)
    assert(out.map(_.getLong(2)).toSeq == Seq(-1L, -1L, 0L, 1L, 2L))
  }

  test("shingles of <3-token docs are dropped, not a crash") {
    val out = Dedup.shinglesOf(docs(
      1L -> "x", 2L -> "x y", 3L -> "x y z")).collect()
    assert(out.map(_.getLong(0)).distinct.toSeq == Seq(3L))
  }

  test("kmeans seeds from first k rows of any id space, rejects n < k") {
    // ids 100..119 (not 0..k-1): must still produce k real centroids
    val vecs = (100 until 120).map(i =>
      (i.toLong, Array.fill(4)(i.toFloat))).toDF("vec_id", "embedding")
    val assigned = KMeans.runOn(spark, vecs, k = 3, iters = 2)
    assert(assigned.select("cluster").distinct().count() > 1,
      "multiple clusters must survive with non-0-based ids")
    val tiny = (0 until 2).map(i =>
      (i.toLong, Array.fill(4)(i.toFloat))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      KMeans.runOn(spark, tiny, k = 3, iters = 1)
    }
  }
}
