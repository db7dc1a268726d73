package graft

import org.apache.spark.sql.functions._
import graft.text.Similarity

/** Round-15 row (SURVEY §2 row 277):
  *  - q277 `q_sim_ann_ivf_quantized`: IVF search over the
  *    int8-quantized index. Two independent approximations compose
  *    (IVF pruning × int8 scoring); the audit isolates each — recall
  *    vs the exact FLOAT top-k measures the joint loss, nprobe=k vs
  *    the quantized brute force proves the pruning is the ONLY
  *    IVF-side approximation (the q159/q275 recall-audit discipline),
  *    and the index schema check pins the 4× memory claim (no float
  *    embedding stored). */
class Round15Spec extends SparkSpecBase {

  test("q277 quantized IVF: recall vs float exact; nprobe=k ≡ quantized " +
      "brute force; zero-norm exclusion") {
    // exact float top-10 (q52, the oracle-checked baseline)
    val floatTop = SparkEntry.queries("q_sim_topk_cosine")(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    // INDEPENDENT quantized brute force: quantize + LongDot over the
    // full corpus with NO cluster machinery at all, same exclusions
    // and tie-break as the IVF probe — the representation loss alone,
    // anchored by q275's oracle-checked integer arithmetic
    val emb = graft.engine.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val probe = Similarity.quantize(emb.filter(col("vec_id") === 0))
      .select(col("qv").as("qp"), col("qn").as("qnp"))
    val ldot = graft.functions.LongDot.long_dot _
    val qBrute = Similarity.quantize(emb)
      .crossJoin(broadcast(probe))
      .filter(col("vec_id") =!= 0 && col("qn") > 0 && col("qnp") > 0)
      .select(col("vec_id"),
        (ldot(col("qv"), col("qp")).cast("double") /
          (sqrt(col("qn")) * sqrt(col("qnp")))).as("qcos"))
      .orderBy(col("qcos").desc, col("vec_id").asc)
      .limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val bruteRecall = qBrute.map(_._1).count(floatTop).toDouble / floatTop.size
    assert(bruteRecall >= 0.8,
      s"int8 representation recall $bruteRecall too low vs float top-k")
    // the declared row: nprobe=3 of k=10 clusters
    val ivfq = SparkEntry.queries("q_sim_ann_ivf_quantized")(spark, sfDir)
      .collect()
    assert(ivfq.length == 10, s"expected 10 rows, got ${ivfq.length}")
    ivfq.foreach { r =>
      val qcos = r.getDouble(1)
      assert(qcos >= -1.0 - 1e-12 && qcos <= 1.0 + 1e-12,
        s"qcos $qcos outside Cauchy–Schwarz bound")
    }
    val jointRecall =
      ivfq.map(_.getLong(0)).count(floatTop).toDouble / floatTop.size
    assert(jointRecall >= 0.3,
      s"quantized-IVF recall $jointRecall too low for nprobe=3 (q76's pin)")
    // pruning-loss isolation: widening the probe to every cluster must
    // reproduce the INDEPENDENT quantized brute force above EXACTLY
    // (ids and scores) — integer dots are order-exact, so this is
    // bit-equality, and it proves IVF pruning is the only IVF-side
    // approximation on top of the declared int8 representation
    val full = Similarity.ivfTopKQuantized(spark, sfDir, nprobe = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(full.toSeq == qBrute.toSeq,
      "nprobe=k must equal the quantized brute force bit-exactly")
  }

  test("batch quantized IVF: chunking invariance and nprobe=k ≡ " +
      "quantized brute batch (pruning is the only IVF-side loss)") {
    val vecs = graft.engine.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val (indexedQ, cents) = Similarity.ivfIndexQuantized(spark, vecs)
    val indexedM = indexedQ.localCheckpoint()
    val probes = vecs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe"))
    val k = cents.length
    def run(nprobe: Int, chunk: Int) = Similarity
      .ivfSearchBatchQuantized(spark, indexedM, cents, probes, nprobe, 8,
        chunkSize = chunk)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val base = run(k / 4, 1024)
    assert(base.nonEmpty)
    assert(run(k / 4, 2) == base, "chunking must be result-invisible")
    // nprobe = k searches every bucket: integer dots are exact, so
    // this IS the quantized brute force — and it must contain the
    // same neighbours the float brute force finds at recall >= 0.8
    val all = run(k, 1024)
    val dot = graft.functions.FloatDot.float_dot _
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(col("sim").desc, col("vec_id"))
    val brute = vecs.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        (dot(col("embedding"), col("probe")) /
          (sqrt(dot(col("embedding"), col("embedding")))
            * sqrt(dot(col("probe"), col("probe"))))).as("sim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 8)
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val allIds = all.map(t => (t._1, t._2))
    val recall = (allIds & brute).size.toDouble / brute.size
    assert(recall >= 0.8,
      s"quantized batch recall $recall too low vs float brute force")
  }

  test("quantized IVF index: no float embedding stored, assignment " +
      "identical to the float index, quantizer shared with q275") {
    val vecs = graft.engine.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val n = vecs.count()
    val (qIndexed, qCents) = Similarity.ivfIndexQuantized(spark, vecs)
    // the 4× memory shape: the stored index carries ONLY the int8
    // codes + norm, never the float embedding
    assert(qIndexed.columns.toSeq == Seq("vec_id", "cluster", "qv", "qn"),
      s"unexpected index schema: ${qIndexed.columns.mkString(",")}")
    assert(qIndexed.count() == n, "assignment must be total")
    // bucket membership bit-identical to the float index (assignment
    // runs on float vectors in both — quantization moves only scoring)
    val (fIndexed, fCents) = Similarity.ivfIndex(spark, vecs)
    assert(qCents.length == fCents.length)
    val qa = qIndexed.select("vec_id", "cluster")
    val fa = fIndexed.select("vec_id", "cluster")
    assert(qa.exceptAll(fa).count() == 0 && fa.exceptAll(qa).count() == 0,
      "quantized index bucket membership diverged from the float index")
    // the quantizer is the SAME declared representation q275 checks:
    // norms are exact integer self-dots, zero vector ⇒ qn = 0
    val q = Similarity.quantize(vecs)
    assert(q.filter(col("qn") < 0).count() == 0, "qn must be >= 0")
    val maxAbs = q.select(max(expr(
      "aggregate(qv, 0L, (acc, x) -> greatest(acc, abs(x)))"))).head().getLong(0)
    assert(maxAbs <= 127, s"int8 code out of range: $maxAbs")
  }
}
