package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.incr.MergeInto

/** Round-16 rows:
  *  - q278 `q_incr_merge_into`: the declarative MERGE surface —
  *    clause semantics on constructed frames, the one-shuffle /
  *    no-broadcast plan pin, and result-invisibility vs the full
  *    recompute on the fixture.
  *  - q279 `q_sim_ann_ivf_batch_quantized`: the declared batch
  *    quantized-IVF row (its algorithmic pins — chunk invariance,
  *    nprobe=k ≡ quantized brute batch, recall — live in
  *    Round15Spec; here the registry row itself is pinned). */
class Round16Spec extends SparkSpecBase {

  private def frame(rows: Seq[Row], schema: StructType) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
  }

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType),
    StructField("amt", DoubleType)))
  private val deltaSchema = schema.add(StructField("op", StringType))

  test("mergeInto: delete, update-set, insert and target-only clauses " +
      "compose in one pass; extra source columns are ignored") {
    val base = frame(Seq(
      Row(1L, "keep", 10.0), Row(2L, "upd", 20.0),
      Row(3L, "del", 30.0)), schema)
    val delta = frame(Seq(
      Row(2L, "upd2", 99.0, "U"),
      Row(3L, "x", 0.0, "D"),
      Row(4L, "new", 40.0, "I")), deltaSchema)
    val out = MergeInto.mergeInto(base, delta, Seq("k"),
        whenMatchedUpdate = Map("v" -> col("s.v")),
        whenMatchedDelete = col("s.op") === "D")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1),
        r.getDouble(2)))
    assert(out.toSeq == Seq(
      (1L, "keep", 10.0),   // target-only: unchanged
      (2L, "upd2", 20.0),   // matched update: only v in the SET map
      (4L, "new", 40.0)))   // source-only: inserted; k=3 deleted
  }

  test("mergeInto: updateAll = UPDATE SET *; insertWhenNotMatched=false " +
      "drops source-only rows; NULL keys pair null-safely") {
    val base = frame(Seq(Row(1L, "a", 1.0), Row(null, "nullk", 5.0)), schema)
    val delta = frame(Seq(
      Row(1L, "a2", 2.0, "U"),
      Row(null, "nullk2", 6.0, "U"),
      Row(9L, "ghost", 0.0, "I")), deltaSchema)
    val out = MergeInto.mergeInto(base, delta, Seq("k"),
        whenMatchedUpdate = MergeInto.updateAll(base),
        insertWhenNotMatched = false)
      .orderBy(col("k").asc_nulls_first).collect()
    assert(out.length == 2, "ghost must not insert; null keys must MATCH " +
      s"(not duplicate): ${out.mkString(",")}")
    assert(out(0).isNullAt(0) && out(0).getString(1) == "nullk2" &&
      out(0).getDouble(2) == 6.0, "null-key row must take the update")
    assert(out(1).getLong(0) == 1L && out(1).getString(1) == "a2" &&
      out(1).getDouble(2) == 2.0)
  }

  test("mergeInto: delete clause wins over update on the same matched " +
      "row (Delta/Iceberg clause order); empty update map passes " +
      "matched rows through unchanged") {
    val base = frame(Seq(Row(1L, "a", 1.0), Row(2L, "b", 2.0)), schema)
    val delta = frame(Seq(
      Row(1L, "changed", 9.0, "D"),
      Row(2L, "changed", 9.0, "U")), deltaSchema)
    val out = MergeInto.mergeInto(base, delta, Seq("k"),
        whenMatchedUpdate = Map.empty,
        whenMatchedDelete = col("s.op") === "D")
      .orderBy("k").collect()
    assert(out.length == 1 && out(0).getLong(0) == 2L &&
      out(0).getString(1) == "b" && out(0).getDouble(2) == 2.0,
      "k=1 deleted despite matching; k=2 unchanged under empty SET")
  }

  test("mergeInto: WHEN NOT MATCHED BY SOURCE THEN DELETE drops stale " +
      "target-only rows (full-sync shape) without touching matched or " +
      "inserted rows") {
    val base = frame(Seq(
      Row(1L, "keep", 1.0),    // matched → survives (empty SET)
      Row(2L, "stale", 2.0),   // target-only + cond → dropped
      Row(3L, "pinned", 3.0)), // target-only, cond false → survives
      schema)
    val delta = frame(Seq(
      Row(1L, "x", 0.0, "U"),
      Row(4L, "new", 4.0, "I")), deltaSchema)
    val out = MergeInto.mergeInto(base, delta, Seq("k"),
        whenNotMatchedBySourceDelete = col("t.v") === "stale")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "keep"), (3L, "pinned"), (4L, "new")),
      s"got ${out.toSeq}")
    // full-sync: delete EVERY target-only row → result == source ids
    val sync = MergeInto.mergeInto(base, delta, Seq("k"),
        whenMatchedUpdate = MergeInto.updateAll(base),
        whenNotMatchedBySourceDelete = lit(true))
      .orderBy("k").collect().map(_.getLong(0))
    assert(sync.toSeq == Seq(1L, 4L))
  }

  test("mergeInto plan pin: ONE key-hashed shuffle join, never a " +
      "fact-side broadcast (the 100 TB contract)") {
    val q = SparkEntry.queries("q_incr_merge_into")(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastExchange"),
      s"MERGE must not broadcast either side:\n$plan")
    val joins = "(SortMergeJoin|ShuffledHashJoin)".r
      .findAllIn(plan).length
    assert(joins == 1, s"expected exactly 1 shuffle join, got $joins:\n$plan")
    assert(plan.contains("FullOuter"), "the single pass is a full outer join")
  }

  test("q278 on the fixture: result-invisible vs the full recompute " +
      "(the q153 discipline, in-JVM replica of the DuckDB oracle)") {
    val merged = SparkEntry.queries("q_incr_merge_into")(spark, sfDir)
    val expected = graft.engine.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        when(col("o_orderkey") % 10 === 3, col("o_totalprice") + lit(1.0))
          .otherwise(col("o_totalprice")).as("o_totalprice"))
      .filter(col("o_orderkey") % 10 =!= 7)
    assert(merged.exceptAll(expected).count() == 0 &&
      expected.exceptAll(merged).count() == 0,
      "MERGE result must equal the full recompute exactly")
    assert(merged.count() > 0)
  }

  test("quantized IVF index roundtrip: stored index reproduces the " +
      "in-session search bit-exactly and the probed scan partition-" +
      "prunes on cluster") {
    import graft.text.Similarity
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfidx")
    try {
      val emb = graft.engine.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding")).localCheckpoint()
      val (indexedQ, cents) = Similarity.ivfIndexQuantized(spark, emb)
      Similarity.ivfWriteIndex(indexedQ, cents, dir.toString)
      val (stored, storedCents) = Similarity.ivfReadIndex(spark, dir.toString)
      // the model roundtrips exactly (doubles in parquet are exact)
      assert(storedCents.length == cents.length &&
        storedCents.zip(cents).forall { case (a, b) => a.sameElements(b) })
      // the stored corpus is the same relation (column order aside)
      val canon = (df: org.apache.spark.sql.DataFrame) =>
        df.select("vec_id", "cluster", "qv", "qn")
      assert(canon(stored).exceptAll(canon(indexedQ)).count() == 0 &&
        canon(indexedQ).exceptAll(canon(stored)).count() == 0)
      // search over the stored index ≡ search over the in-session one
      val probes = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("embedding").as("probe"))
      def run(ix: org.apache.spark.sql.DataFrame,
              cs: Array[Array[Double]]) =
        Similarity.ivfSearchBatchQuantized(spark, ix, cs, probes,
            nprobe = math.max(1, cs.length / 4), topK = 8)
          .collect().map(_.toSeq).toSet
      assert(run(stored, storedCents) == run(indexedQ, cents),
        "stored-index search diverged from the in-session index")
      // partition pruning: a cluster-filtered scan of the stored
      // corpus must carry the filter at the scan (pruned read)
      val probed = stored.filter(col("cluster").isin(0, 1))
      val scan = probed.queryExecution.executedPlan.toString
      assert(scan.contains("PartitionFilters") &&
        scan.contains("cluster"),
        s"cluster filter did not reach the partitioned scan:\n$scan")
      assert(probed.count() ==
        indexedQ.filter(col("cluster").isin(0, 1)).count())
    } finally deleteRecursively(dir)
  }

  test("streaming merge sink: last-write-wins per batch, upserts across " +
      "batches, idempotent under batch replay (exactly-once story)") {
    import graft.stream.Streams
    val dir = java.nio.file.Files.createTempDirectory("graft_mergesink")
    val store = s"$dir/store"
    try {
      val b1 = frame(Seq(
        Row(1L, "a", 1.0), Row(1L, "a2", 2.0),  // same key: LWW on amt
        Row(2L, "b", 1.0)), schema)
      Streams.applyMergeBatch(b1, Seq("k"), "amt", store)
      val s1 = Streams.readStore(spark, store).get.orderBy("k").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(s1 == Seq((1L, "a2"), (2L, "b")), s"batch-1 state: $s1")
      val b2 = frame(Seq(
        Row(2L, "b9", 9.0),                      // update existing key
        Row(3L, "c", 1.0)), schema)              // insert new key
      Streams.applyMergeBatch(b2, Seq("k"), "amt", store)
      def state() = Streams.readStore(spark, store).get.orderBy("k").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      val s2 = state()
      assert(s2 == Seq((1L, "a2"), (2L, "b9"), (3L, "c")), s"batch-2: $s2")
      // replay batch 2 (a foreachBatch retry): state must not change
      Streams.applyMergeBatch(b2, Seq("k"), "amt", store)
      assert(state() == s2, "replaying a batch changed the snapshot")
      // empty batch is a no-op
      Streams.applyMergeBatch(b2.filter(lit(false)), Seq("k"), "amt", store)
      assert(state() == s2)
    } finally deleteRecursively(dir)
  }

  test("streaming merge sink is out-of-order safe: a LATE batch " +
      "(older orderCol) never clobbers newer stored state; final " +
      "snapshot is batch-order invariant") {
    import graft.stream.Streams
    val dir = java.nio.file.Files.createTempDirectory("graft_ooo")
    val (p1, p2) = (s"$dir/fwd", s"$dir/rev")
    try {
      val newer = frame(Seq(Row(1L, "v2", 2.0), Row(2L, "w2", 9.0)), schema)
      val older = frame(Seq(Row(1L, "v1", 1.0), Row(3L, "x1", 3.0)), schema)
      // forward order: older then newer
      Streams.applyMergeBatch(older, Seq("k"), "amt", p1)
      Streams.applyMergeBatch(newer, Seq("k"), "amt", p1)
      // reverse order: newer first, the late batch second — and the
      // reverse store is addressed by an EXPLICIT file: scheme, so
      // the existence check provably resolves through the Hadoop
      // FileSystem API (ADVICE r16: java.io.File treated any
      // scheme'd path as absent and silently reset the store)
      Streams.applyMergeBatch(newer, Seq("k"), "amt", s"file://$p2")
      Streams.applyMergeBatch(older, Seq("k"), "amt", s"file://$p2")
      def state(p: String) = Streams.readStore(spark, p).get
        .orderBy("k").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      val expected = Seq((1L, "v2", 2.0), (2L, "w2", 9.0), (3L, "x1", 3.0))
      assert(state(p1) == expected, s"forward: ${state(p1)}")
      assert(state(p2) == expected,
        s"late batch clobbered newer state: ${state(p2)}")
    } finally deleteRecursively(dir)
  }

  test("q280 on the fixture: stream-maintained LWW snapshot equals the " +
      "batch recompute (in-JVM replica of the DuckDB oracle)") {
    val merged = SparkEntry.queries("q_stream_merge_upsert")(spark, sfDir)
    val expected = SparkEntry.queries("q_incr_upsert_latest")(spark, sfDir)
    assert(merged.count() > 0)
    assert(merged.exceptAll(expected).count() == 0 &&
      expected.exceptAll(merged).count() == 0,
      "streamed MERGE state diverged from the batch LWW recompute")
  }

  test("q279 registry row: deterministic, rn-bounded, Cauchy–Schwarz " +
      "scores, equals a direct ivfSearchBatchQuantized call") {
    val a = SparkEntry.queries("q_sim_ann_ivf_batch_quantized")(spark, sfDir)
      .collect()
    assert(a.nonEmpty && a.length <= 5 * 8)
    a.foreach { r =>
      assert(r.getLong(0) < 5, "probes are vec_id < 5")
      val qcos = r.getDouble(2)
      assert(qcos >= -1.0 - 1e-12 && qcos <= 1.0 + 1e-12)
      assert(r.getInt(3) >= 1 && r.getInt(3) <= 8)
    }
    val b = SparkEntry.queries("q_sim_ann_ivf_batch_quantized")(spark, sfDir)
      .collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq,
      "declared row must be run-to-run deterministic")
  }
}
