package graft

import org.apache.spark.sql.functions._

/** Round-11 facade entry points on caller-supplied (non-fixture)
  * data: the curation/analytics generics behind declared rows
  * 163-174. Expectations are hand-computed. */
class FacadeSpec3 extends SparkSpecBase {

  test("balancedSample keeps exactly the minority size per class, reproducibly") {
    val sp = spark
    import sp.implicits._
    val df = ((0L until 3L).map(i => (i, "small")) ++
      (10L until 17L).map(i => (i, "big"))).toDF("id", "cls")
    val kept = Graft.balancedSample(df, "cls", "id")
    val sizes = kept.groupBy("cls").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes == Map("small" -> 3L, "big" -> 3L))
    // deterministic: same survivors on re-evaluation
    assert(kept.collect().map(_.getLong(0)).sorted.toSeq ==
      Graft.balancedSample(df, "cls", "id")
        .collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("temperatureRebalance keeps the min class whole and thins larger ones") {
    val sp = spark
    import sp.implicits._
    val df = ((0L until 4L).map(i => (i, "rare")) ++
      (100L until 164L).map(i => (i, "common"))).toDF("id", "cls")
    val kept = Graft.temperatureRebalance(df, "cls", "id").cache()
    val sizes = kept.groupBy("cls").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes("rare") == 4L, "min class must survive intact")
    // rate sqrt(4/64) = 1/4: threshold exactly 2^16/4 = 16384; the md5
    // filter keeps ~16 of 64 — assert the broad band plus determinism
    assert(sizes("common") < 40L && sizes("common") >= 4L,
      s"common kept ${sizes("common")}")
    val t = kept.filter(col("cls") === "common")
      .select("t_int").head().getLong(0)
    assert(t == 16384L, s"threshold $t != floor(sqrt(1/16)*65536)")
    kept.unpersist()
  }

  test("transitionMatrix counts hand-built journeys") {
    val sp = spark
    import sp.implicits._
    // u1: a b a ; u2: a a — transitions: a->b, b->a, a->a
    val ev = Seq((1L, 1L, 10L, "a"), (1L, 2L, 20L, "b"), (1L, 3L, 30L, "a"),
      (2L, 4L, 10L, "a"), (2L, 5L, 15L, "a"))
      .toDF("u", "id", "t", "typ")
    val m = Graft.transitionMatrix(ev, "u", "t", "id", "typ").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m == Map(("a", "b") -> 1L, ("b", "a") -> 1L, ("a", "a") -> 1L))
  }

  test("activityStreaks finds islands of consecutive days") {
    val sp = spark
    import sp.implicits._
    // user 1 active on Jan 1,2,3 and Jan 10 — streaks 3 and 1
    val ev = Seq((1L, "2024-01-01 05:00:00"), (1L, "2024-01-02 09:00:00"),
      (1L, "2024-01-02 11:00:00"), (1L, "2024-01-03 01:00:00"),
      (1L, "2024-01-10 23:00:00"))
      .toDF("u", "t").withColumn("t", col("t").cast("timestamp"))
    val r = Graft.activityStreaks(ev, "u", "t").head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((4L, 2L, 3L)),
      s"got $r")
  }

  test("nearestAsofJoin picks the closest ms, breaking sub-ms ties by id") {
    val sp = spark
    import sp.implicits._
    def ts(us: Long) = new java.sql.Timestamp(us / 1000) // ms precision
    val left = Seq((100L, 1L, ts(1000000L))).toDF("lid", "k", "lt")
    // right: id 7 at +2ms, id 3 and 5 both at -2ms (tie -> id 3)
    val right = Seq((7L, 1L, ts(1002000L)), (5L, 1L, ts(998000L)),
      (3L, 1L, ts(998000L))).toDF("rid", "k", "rt")
    val r = Graft.nearestAsofJoin(left, "lid", "lt", right, "rid", "rt", "k")
      .head()
    assert((r.getLong(0), r.getLong(2), r.getLong(3)) == ((100L, 3L, 2L)),
      s"got $r")
  }

  test("lmRarity scores a tiny corpus exactly") {
    val sp = spark
    import sp.implicits._
    // bigrams: d1 (a b), (b a); d2 (a b) — c1(a)=2, c2(a,b)=2 p=1;
    // c1(b)=1, c2(b,a)=1 p=1 → nothing rare at denom 2; min_p = 1.0
    val docs = Seq((1L, "a b a"), (2L, "a b")).toDF("doc_id", "text")
    val r = Graft.lmRarity(docs, "doc_id", "text", rarityDenom = 2)
      .orderBy("doc_id").collect()
    assert(r.length == 2)
    assert(r(0).getLong(1) == 2L && r(0).getLong(2) == 0L &&
      r(0).getDouble(3) == 1.0, s"doc1 ${r(0)}")
    assert(r(1).getLong(1) == 1L && r(1).getLong(2) == 0L &&
      r(1).getDouble(3) == 1.0, s"doc2 ${r(1)}")
  }
}
