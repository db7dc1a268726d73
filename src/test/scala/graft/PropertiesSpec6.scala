package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.incr.MergeInto

/** Random-structure properties for the round-16 MERGE family. The
  * fixture proofs (Round16Spec) use hand-built frames and the orders
  * table; these re-prove the load-bearing claims on seeded random
  * inputs where the clause interactions cannot hide a hole:
  *
  *  1. mergeInto == a driver-side reference merge for ARBITRARY
  *     clause combinations (delete condition, partial vs SET * vs
  *     empty update, insert on/off, by-source delete) over random
  *     key overlaps including NULL keys on both sides;
  *  2. the streaming merge sink's final snapshot is INVARIANT to the
  *     partition of rows into micro-batches AND to batch order —
  *     the global argmax-by-orderCol, for random row sets and random
  *     batch splits (the q280 out-of-order contract, randomized).
  */
class PropertiesSpec6 extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType),
    StructField("amt", DoubleType)))
  private val deltaSchema = schema.add(StructField("op", StringType))

  private def df(rows: Seq[Row], sch: StructType): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, sch)
  }

  /** Driver-side reference merge over unique-key maps. */
  private def refMerge(base: Seq[(Option[Long], String, Double)],
                       delta: Seq[(Option[Long], String, Double, String)],
                       partialUpdate: Boolean, setStar: Boolean,
                       insert: Boolean, bySourceDelete: Boolean)
      : Set[(Option[Long], String, Double)] = {
    val dMap = delta.map(d => d._1 -> d).toMap
    val baseKeys = base.map(_._1).toSet
    val fromBase = base.flatMap { case t @ (k, tv, tamt) =>
      dMap.get(k) match {
        case Some((_, sv, samt, sop)) =>
          if (sop == "D") None // matched delete
          else if (setStar) Some((k, sv, samt))
          else if (partialUpdate) Some((k, sv, tamt)) // only v updated
          else Some(t) // empty SET: unchanged
        case None =>
          if (bySourceDelete) None else Some(t) // target-only
      }
    }
    val inserted =
      if (!insert) Seq.empty
      else delta.filter(d => !baseKeys.contains(d._1))
        .map(d => (d._1, d._2, d._3))
    (fromBase ++ inserted).toSet
  }

  test("mergeInto == reference merge for random key overlaps, NULL " +
      "keys, and every clause combination") {
    val rnd = new scala.util.Random(16161L)
    for (trial <- 0 until 12) {
      val keyspace = 30
      def rk(): Option[Long] =
        if (rnd.nextInt(12) == 0) None else Some(rnd.nextInt(keyspace).toLong)
      // unique keys per side (the MERGE target/source contract)
      val baseKeys = rnd.shuffle((0 until keyspace).toList)
        .take(12 + rnd.nextInt(10)).map(i => Some(i.toLong): Option[Long]) ++
        (if (rnd.nextBoolean()) Seq(None) else Seq.empty)
      val deltaKeys = rnd.shuffle((0 until keyspace).toList)
        .take(12 + rnd.nextInt(10)).map(i => Some(i.toLong): Option[Long]) ++
        (if (rnd.nextBoolean()) Seq(None) else Seq.empty)
      val base = baseKeys.map(k =>
        (k, s"b${rnd.nextInt(100)}", rnd.nextInt(50).toDouble))
      val delta = deltaKeys.map(k =>
        (k, s"d${rnd.nextInt(100)}", rnd.nextInt(50).toDouble,
          if (rnd.nextInt(4) == 0) "D" else "U"))
      val (partial, star) = rnd.nextInt(3) match {
        case 0 => (false, false) // empty SET
        case 1 => (true, false)  // partial: only v
        case _ => (false, true)  // SET *
      }
      val insert = rnd.nextBoolean()
      val bySource = rnd.nextBoolean()
      val baseDf = df(base.map(t => Row(t._1.orNull, t._2, t._3)), schema)
      val deltaDf = df(delta.map(t =>
        Row(t._1.orNull, t._2, t._3, t._4)), deltaSchema)
      val updateMap =
        if (star) MergeInto.updateAll(baseDf)
        else if (partial) Map("v" -> col("s.v"))
        else Map.empty[String, org.apache.spark.sql.Column]
      val got = MergeInto.mergeInto(baseDf, deltaDf, Seq("k"),
          whenMatchedUpdate = updateMap,
          whenMatchedDelete = col("s.op") === "D",
          insertWhenNotMatched = insert,
          whenNotMatchedBySourceDelete = lit(bySource))
        .collect()
        .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
          r.getString(1), r.getDouble(2))).toSet
      // reference: matched deletes apply regardless of update mode
      val want = refMerge(base, delta, partial, star, insert, bySource)
      assert(got == want,
        s"trial $trial (partial=$partial star=$star insert=$insert " +
          s"bySource=$bySource): got ${got.toSeq.sortBy(_.toString)} " +
          s"want ${want.toSeq.sortBy(_.toString)}")
    }
  }

  test("merge sink final state is invariant to batch partitioning and " +
      "batch order (random rows, random splits)") {
    import graft.stream.Streams
    val rnd = new scala.util.Random(2816L)
    for (trial <- 0 until 3) {
      // rows: (k, v, amt) with amt the order column, unique per key
      val rows = (0 until 60).map { i =>
        Row(rnd.nextInt(12).toLong, s"v$i", i.toDouble)
      }
      val rndOrder = rnd.shuffle(rows.toList)
      // two different partitions into batches, different orders
      def run(tag: String, batches: Seq[Seq[Row]]): Seq[(Long, String)] = {
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft_p6_${tag}_$trial")
        try {
          batches.foreach(b =>
            Streams.applyMergeBatch(df(b, schema), Seq("k"), "amt",
              s"$dir/store"))
          Streams.readStore(spark, s"$dir/store").get.orderBy("k")
            .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
        } finally deleteRecursively(dir)
      }
      val a = run("a", rndOrder.grouped(7).toSeq)
      val b = run("b", rnd.shuffle(rows.toList).grouped(13).toSeq.reverse)
      // reference: per key, the row with max amt
      val want = rows.groupBy(_.getLong(0)).toSeq
        .map { case (k, rs) => (k, rs.maxBy(_.getDouble(2)).getString(1)) }
        .sortBy(_._1)
      assert(a == want && b == want,
        s"trial $trial: a=$a b=$b want=$want")
    }
  }
}
