package graft

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.stream.Streams

/** §2J streaming behaviors on MemoryStream: batch/stream plan
  * equivalence, watermark late-data drop, stateful dedup,
  * stream-static join, session windows. */
class StreamingSpec extends SparkSpecBase {

  private def ts(s: String): Timestamp =
    Timestamp.from(Instant.parse(s"2024-01-01T${s}Z"))

  test("tumbling window agg: stream (complete mode) equals batch") {
    val sp = spark
    import sp.implicits._
    implicit val sq = sp.sqlContext
    val ms = MemoryStream[(Timestamp, String, Double)]
    val stream = ms.toDF.toDF("ts", "event_type", "value")
    val q = Streams.tumbling(stream).writeStream
      .format("memory").queryName("tumb").outputMode("complete").start()
    val data = Seq(
      (ts("10:00:00"), "click", 1.0), (ts("10:30:00"), "click", 2.5),
      (ts("10:45:00"), "view", 3.0), (ts("11:05:00"), "view", 4.0))
    ms.addData(data)
    q.processAllAvailable()
    val got = sp.table("tumb").orderBy("hour_start", "event_type").collect()
    val want = Streams.tumbling(data.toDF("ts", "event_type", "value"))
      .orderBy("hour_start", "event_type").collect()
    assert(got.toSeq == want.toSeq)
    q.stop()
  }

  test("watermark drops late events in append mode") {
    val sp = spark
    import sp.implicits._
    implicit val sq = sp.sqlContext
    val ms = MemoryStream[(Timestamp, String, Double)]
    val stream = ms.toDF.toDF("ts", "event_type", "value")
    val q = Streams.tumbling(stream, Some("10 minutes")).writeStream
      .format("memory").queryName("late").outputMode("append").start()
    ms.addData((ts("10:00:00"), "click", 1.0), (ts("10:05:00"), "click", 1.0))
    q.processAllAvailable()
    ms.addData((ts("11:30:00"), "view", 1.0)) // watermark → 11:20
    q.processAllAvailable()
    ms.addData((ts("10:10:00"), "click", 5.0)) // late: 10:10 < 11:20 → dropped
    q.processAllAvailable()
    val hour10 = sp.table("late")
      .filter(col("hour_start") === ts("10:00:00")).collect()
    assert(hour10.length == 1)
    assert(hour10.head.getAs[Long]("n") == 2, "late event must not be counted")
    q.stop()
  }

  test("checkpointed query restarts from the state store exactly-once") {
    // The fault-tolerance surface VERDICT r10 named untested: a
    // file-source query with a checkpointLocation is STOPPED mid-input
    // and a NEW query object restarts from the same checkpoint — the
    // second run must resume from persisted offsets + state (no
    // double-count of run-1 files, no gap), i.e. the final aggregate
    // equals the batch computation over all files.
    val sp = spark
    import sp.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_ckpt")
    val (in, ck, out) = (s"$root/in", s"$root/ck", s"$root/out")
    new java.io.File(in).mkdirs()
    def writeFile(n: Int, rows: Seq[(String, Long)]): Unit =
      rows.toDF("k", "v").coalesce(1)
        .write.mode("overwrite").parquet(s"$in/batch_$n")
    def startQuery() = sp.readStream
      .schema("k STRING, v BIGINT").option("pathGlobFilter", "*.parquet")
      .parquet(s"$in/*")
      .groupBy("k").agg(sum("v").as("total"), count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("ckpt_agg")
      .outputMode("complete").option("checkpointLocation", ck).start()
    try {
      writeFile(1, Seq(("a", 1L), ("b", 10L)))
      val q1 = startQuery()
      q1.processAllAvailable()
      q1.stop() // simulated failure/redeploy
      writeFile(2, Seq(("a", 2L), ("c", 100L)))
      val q2 = startQuery() // NEW query object, SAME checkpoint
      q2.processAllAvailable()
      val got = sp.table("ckpt_agg").orderBy("k").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      // batch truth over all files: a=1+2, b=10, c=100, one row each —
      // a double-processed run-1 would show a=4/n=3, a gap a=2/n=1
      assert(got == Seq(("a", 3L, 2L), ("b", 10L, 1L), ("c", 100L, 1L)),
        s"restart not exactly-once: $got")
      q2.stop()
    } finally deleteRecursively(root)
  }

  test("AvailableNow + maxFilesPerTrigger drives micro-batches into an exactly-once parquet sink") {
    // The production trigger/sink shapes MemoryStream cannot exercise:
    // a FILE source split into MULTIPLE micro-batches (maxFilesPerTrigger=1),
    // a real self-terminating trigger (Trigger.AvailableNow), and the
    // PARQUET FILE SINK whose _spark_metadata transaction log is the
    // exactly-once mechanism — then a NEW query on the SAME checkpoint
    // + sink resumes without re-emitting closed windows. Append-mode
    // windowed agg means every window is emitted exactly once, when
    // the watermark passes it — across micro-batches AND across runs.
    val sp = spark
    import sp.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_filesink")
    val (in, ck, out) = (s"$root/in", s"$root/ck", s"$root/out")
    new java.io.File(in).mkdirs()
    def writeFile(n: Int, rows: Seq[Timestamp]): Unit = {
      rows.map(Tuple1(_)).toDF("ts").coalesce(1)
        .write.mode("overwrite").parquet(s"$in/f$n")
      // FileStreamSource orders files by modification time; pin it so
      // the micro-batch order (and thus watermark progression) is
      // deterministic regardless of fs timestamp granularity
      new java.io.File(s"$in/f$n").listFiles()
        .foreach(_.setLastModified(1700000000000L + n * 60000L))
    }
    def runAvailableNow() = {
      val q = sp.readStream
        .schema("ts TIMESTAMP").option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$in/*")
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("hour_start"), col("n"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000L)
      q
    }
    try {
      writeFile(1, Seq(ts("10:00:00"), ts("10:05:00"))) // wm → 09:55
      writeFile(2, Seq(ts("10:20:00"), ts("11:05:00"))) // wm → 10:55
      writeFile(3, Seq(ts("11:40:00")))                 // wm → 11:30 closes hour 10
      val q1 = runAvailableNow()
      assert(q1.recentProgress.count(_.numInputRows > 0) >= 3,
        "maxFilesPerTrigger=1 over 3 files must produce >= 3 non-empty micro-batches")
      val run1 = sp.read.parquet(out).collect()
        .map(r => (r.getAs[Timestamp]("hour_start"), r.getAs[Long]("n")))
      assert(run1.toSeq == Seq((ts("10:00:00"), 3L)),
        s"run 1 must emit exactly the closed hour-10 window, got ${run1.toSeq}")
      writeFile(4, Seq(ts("14:00:00"))) // wm → 13:50 closes hour 11
      runAvailableNow() // NEW query object, SAME checkpoint + sink
      val got = sp.read.parquet(out).collect()
        .map(r => (r.getAs[Timestamp]("hour_start"), r.getAs[Long]("n")))
        .sortBy(_._1.getTime).toSeq
      // hour 10 exactly once (not re-emitted by run 2), hour 11 closed
      // by run 2's watermark, hour 14 still open → absent
      assert(got == Seq((ts("10:00:00"), 3L), (ts("11:00:00"), 2L)),
        s"sink after restart must be exactly-once per window: $got")
    } finally deleteRecursively(root)
  }

  test("stream-stream interval join matches within the window only") {
    val sp = spark
    import sp.implicits._
    implicit val sq = sp.sqlContext
    val views = MemoryStream[(Timestamp, Long)]
    val buys = MemoryStream[(Timestamp, Long)]
    val joined = graft.stream.Streams.intervalJoin(
      views.toDF.toDF("lt", "l_user"),
      buys.toDF.toDF("rt", "r_user"))
    val q = joined.writeStream
      .format("memory").queryName("ssj").outputMode("append").start()
    views.addData((ts("10:00:00"), 1L), (ts("10:00:00"), 2L))
    buys.addData(
      (ts("10:10:00"), 1L),  // in window for user 1
      (ts("10:40:00"), 2L),  // outside 15-min window for user 2
      (ts("10:05:00"), 3L))  // no matching view
    q.processAllAvailable()
    // advance both watermarks so in-window results are emitted
    views.addData((ts("12:00:00"), 99L))
    buys.addData((ts("12:00:00"), 98L))
    q.processAllAvailable()
    val rows = sp.table("ssj").collect()
      .map(r => (r.getAs[Long]("l_user"), r.getAs[Timestamp]("rt")))
    assert(rows.toSet == Set((1L, ts("10:10:00"))),
      s"expected only the in-window match, got ${rows.toSeq}")
    q.stop()
  }

  test("dropDuplicatesWithinWatermark removes stream duplicates") {
    val sp = spark
    import sp.implicits._
    implicit val sq = sp.sqlContext
    val ms = MemoryStream[(Timestamp, Long)]
    val stream = ms.toDF.toDF("ts", "event_id")
    val q = Streams.dedupWithinWatermark(stream, "1 hour").writeStream
      .format("memory").queryName("dedup").outputMode("append").start()
    ms.addData((ts("10:00:00"), 1L), (ts("10:01:00"), 1L), (ts("10:02:00"), 2L))
    q.processAllAvailable()
    ms.addData((ts("10:03:00"), 1L), (ts("10:04:00"), 3L)) // 1 is a dup
    q.processAllAvailable()
    val ids = sp.table("dedup").select("event_id").collect().map(_.getLong(0))
    assert(ids.sorted.toSeq == Seq(1L, 2L, 3L))
    q.stop()
  }

  test("stream-static dimension join enriches events") {
    val sp = spark
    import sp.implicits._
    implicit val sq = sp.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val ms = MemoryStream[(Timestamp, Long)]
    val stream = ms.toDF.toDF("ts", "user_id")
    val q = Streams.enrich(stream, dim, "user_id").writeStream
      .format("memory").queryName("enrich").outputMode("append").start()
    ms.addData((ts("10:00:00"), 1L), (ts("10:01:00"), 3L))
    q.processAllAvailable()
    val rows = sp.table("enrich").orderBy("user_id")
      .select("user_id", "tier").collect()
    assert(rows.map(r => (r.getLong(0), r.isNullAt(1))).toSeq ==
      Seq((1L, false), (3L, true)))
    q.stop()
  }

  test("flatMapGroupsWithState: gap-split emitted eagerly, tail flushed on event-time timeout") {
    val sp = spark
    import sp.implicits._
    implicit val sq = sp.sqlContext
    val ms = MemoryStream[(Timestamp, Long)]
    val stream = ms.toDF.toDF("ts", "user_id")
    val q = Streams.customSessions(stream).writeStream
      .format("memory").queryName("csess").outputMode("append").start()
    ms.addData((ts("10:00:00"), 1L), (ts("10:05:00"), 1L))
    q.processAllAvailable()
    ms.addData((ts("11:30:00"), 1L)) // 85-min gap: closes session 1 eagerly
    q.processAllAvailable()
    ms.addData((ts("14:00:00"), 2L)) // watermark 13:50 > 12:00 → flush tail
    q.processAllAvailable()
    val u1 = sp.table("csess").filter(col("user_id") === 1L)
      .orderBy("start").collect()
      .map(r => (r.getAs[Long]("n"), r.getAs[Timestamp]("start"),
        r.getAs[Timestamp]("end")))
    assert(u1.toSeq == Seq(
      (2L, ts("10:00:00"), ts("10:05:00")),
      (1L, ts("11:30:00"), ts("11:30:00"))))
    q.stop()
  }

  test("session windows close on watermark and split on 30-min gaps") {
    val sp = spark
    import sp.implicits._
    implicit val sq = sp.sqlContext
    val ms = MemoryStream[(Timestamp, Long)]
    val stream = ms.toDF.toDF("ts", "user_id")
    val q = Streams.sessions(stream, Some("10 minutes")).writeStream
      .format("memory").queryName("sess").outputMode("append").start()
    // user 1: two sessions (gap 80 min between 10:10 and 11:30)
    ms.addData((ts("10:00:00"), 1L), (ts("10:10:00"), 1L), (ts("11:30:00"), 1L))
    q.processAllAvailable()
    ms.addData((ts("14:00:00"), 2L)) // watermark → 13:50, closes user 1
    q.processAllAvailable()
    val u1 = sp.table("sess").filter(col("user_id") === 1L)
      .orderBy("sess_start").collect()
    assert(u1.map(r => (r.getAs[Timestamp]("sess_start"), r.getAs[Long]("n_ev")))
      .toSeq == Seq((ts("10:00:00"), 2L), (ts("11:30:00"), 1L)))
    q.stop()
  }
}
