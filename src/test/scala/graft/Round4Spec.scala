package graft

import org.apache.spark.sql.functions._
import graft.ops.{Round3, Triangles}

/** Round-4 depth items: triangle-counting scale guard (broadcast path
  * ≡ degree-ordered node-iterator fallback). */
class Round4Spec extends SparkSpecBase {
  import spark.implicits._

  test("triangle paths agree on the q83 strong-edge graph") {
    val e = Round3.strongEdges(spark, sfDir).localCheckpoint()
    val b = Triangles.countBroadcast(e).head().getLong(0)
    val n = Triangles.countNodeIterator(e).head().getLong(0)
    assert(b === n)
    assert(b > 0) // non-degenerate fixture
  }

  test("triangle guard falls back and stays equal when forced") {
    val e = Round3.strongEdges(spark, sfDir)
    val viaGuardBroadcast = Triangles.count(e).head().getLong(0)
    // threshold 0 forces the node-iterator path through the guard
    val viaGuardFallback = Triangles.count(e, broadcastMaxEdges = 0L)
      .head().getLong(0)
    assert(viaGuardBroadcast === viaGuardFallback)
  }

  test("triangle paths agree on a synthetic graph with known count") {
    // K4 on {1,2,3,4} (4 triangles) + path 5-6-7 (0 triangles)
    //  + triangle {8,9,10}
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (6L, 7L),
      (8L, 9L), (8L, 10L), (9L, 10L)).toDF("a", "b")
    assert(Triangles.countBroadcast(edges).head().getLong(0) === 5L)
    assert(Triangles.countNodeIterator(edges).head().getLong(0) === 5L)
  }
}
