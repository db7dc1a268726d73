package graft

import org.apache.spark.sql.functions._

/** Round-2 facade entry points on caller-supplied (non-fixture) data. */
class FacadeSpec2 extends SparkSpecBase {

  test("sssp on a path graph counts hops; unreachable keeps sentinel") {
    val sp = spark
    import sp.implicits._
    // 0 -> 1 -> 2 -> 3, plus isolated-ish 9 -> 8 (unreachable from 0)
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (9L, 8L)).toDF("src", "dst")
    val d = Graft.sssp(edges, source = 0L, iters = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L,
      8L -> 999999999L, 9L -> 999999999L))
  }

  test("connectedComponents labels two components on a symmetric graph") {
    val sp = spark
    import sp.implicits._
    val und = Seq((0L, 1L), (1L, 2L), (5L, 6L))
    val edges = und.toDF("src", "dst")
      .union(und.map(_.swap).toDF("src", "dst"))
    val labels = Graft.connectedComponents(edges, iters = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 5L -> 5L, 6L -> 5L))
  }

  test("upsertLatest keeps the newest row per key") {
    val sp = spark
    import sp.implicits._
    val log = Seq(("a", 1L, 10), ("a", 3L, 30), ("a", 2L, 20), ("b", 1L, 99))
      .toDF("k", "ts", "v")
    val cur = Graft.upsertLatest(log, Seq("k"), Seq(col("ts").desc)).collect()
      .map(r => r.getString(0) -> r.getInt(2)).toMap
    assert(cur == Map("a" -> 30, "b" -> 99))
  }

  test("snapshotDiff classifies added/removed/changed") {
    val sp = spark
    import sp.implicits._
    val before = Seq(("a", 10L), ("b", 5L)).toDF("k", "total")
    val after = Seq(("a", 12L), ("c", 7L)).toDF("k", "total")
    val d = Graft.snapshotDiff(before, after, "k", "total").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(d == Map("a" -> ("changed", 2L), "b" -> ("removed", -5L),
      "c" -> ("added", 7L)))
  }

  test("sampleSplit is deterministic and roughly 80/10/10") {
    val sp = spark
    import sp.implicits._
    val df = (0L until 2000L).toDF("id")
    val s1 = Graft.sampleSplit(df, "id").groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val s2 = Graft.sampleSplit(df, "id").groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1 == s2, "split must be reproducible")
    assert(s1("train") > 1400 && s1("train") < 1800)
    assert(s1.values.sum == 2000)
  }

  test("autoNearDupPairs and autoKnn choose by the cap and keep schemas stable") {
    val sp = spark
    import sp.implicits._
    val toks = Seq(
      (1L, "alpha"), (1L, "beta"), (1L, "gamma"),
      (2L, "alpha"), (2L, "beta"), (2L, "gamma"),
      (3L, "delta"), (3L, "epsilon")
    ).toDF("doc_id", "tok")
    val (p1, exact) = Graft.autoNearDupPairs(toks)
    assert(p1 == "exact")
    assert(exact.columns.toSeq ==
      Seq("doc_a", "doc_b", "inter", "union_sz"))
    assert(exact.collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq == Seq((1L, 2L)))
    val (p2, _) = Graft.autoNearDupPairs(toks, exactVolumeCap = 0L)
    assert(p2 == "lsh")
    val vecs = (0L until 12L).map(i =>
      (i, Array.fill(4)((i % 3).toFloat + 1f))).toDF("vec_id", "embedding")
    val probes = vecs.filter(col("vec_id") < 2)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe"))
    val (k1, knn) = Graft.autoKnn(vecs, probes, topK = 2)
    assert(k1 == "brute")
    assert(knn.columns.toSeq == Seq("probe_id", "vec_id", "sim", "rn"))
    assert(knn.groupBy("probe_id").count().collect()
      .forall(_.getLong(1) == 2L))
    val (k2, _) = Graft.autoKnn(vecs, probes, topK = 2,
      bruteVolumeCap = 0L)
    assert(k2 == "ivf")
  }

  test("simhashPairs finds identical docs at Hamming 0") {
    val sp = spark
    import sp.implicits._
    val toks = Seq(
      (1L, "alpha"), (1L, "beta"), (1L, "gamma"),
      (2L, "alpha"), (2L, "beta"), (2L, "gamma"), // identical to 1
      (3L, "delta"), (3L, "epsilon"), (3L, "zeta"), (3L, "eta"),
      (3L, "theta"), (3L, "iota"), (3L, "kappa"), (3L, "lambda")
    ).toDF("doc_id", "tok")
    val pairs = Graft.simhashPairs(toks).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.contains((1L, 2L, 0L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }
}
