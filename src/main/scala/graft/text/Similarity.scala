package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables._
import graft.iter.KMeans

/** §2 row 52 — similarity search over the embedding column [N]:
  * brute-force cosine top-k against a probe vector.
  *
  * Scale shape: the probe is a broadcast single-row side of a cross
  * join (no driver collect in the plan); the scan computes dot/norm
  * per row map-only and TakeOrderedAndProject keeps only k rows per
  * partition — at 100 TB this is one pass over the table with a
  * per-partition heap, the standard brute-force ANN baseline. The
  * bucketed scale-up path is MinHash-banding (q51) or IVF-style
  * cluster pruning via q44's centroids (assign probe → search its
  * cluster only).
  *
  * Determinism: dot products are explicit left-to-right double folds —
  * the DuckDB oracle uses the same element order and width, so the
  * doubles match bitwise. */
object Similarity {

  /** Session-scoped memo for the cosine>=0.4 pair graph (the
    * Dedup.cachedSubsetPairs pattern): q110 and q126 consume the same
    * deterministic O(n²) cosine computation, so it materializes once
    * per (session, dir). */
  private val memo =
    new graft.engine.Memos.Store[(SparkSession, String)]("similarity")

  def cachedCosinePairs04(s: SparkSession, d: String): DataFrame =
    memo.getOrElseUpdate((s, d),
      cosinePairs(embeddings(s, d).select(col("vec_id"), col("embedding")),
        0.4).select("vec_a", "vec_b").localCheckpoint())

  val defs: Map[String, Q] = Map(
    "q_sim_topk_cosine" -> ((s, d) => {
      val emb = embeddings(s, d)
      val probe = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("probe"))
      // native codegen expression; bit-identical to the HOF fold
      val dot = graft.functions.FloatDot.float_dot _
      emb.crossJoin(broadcast(probe))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"),
          (dot(col("embedding"), col("probe")) /
            (sqrt(dot(col("embedding"), col("embedding")))
              * sqrt(dot(col("probe"), col("probe"))))).as("sim"))
        .orderBy(col("sim").desc, col("vec_id").asc)
        .limit(10)
    }),

    /** q67: embedding-cosine near-dup PAIRS — all pairs with cosine
      * >= 0.32, the exact all-pairs baseline (O(n²) by definition;
      * the scale paths are IVF cluster pruning and LSH banding).
      * Norms are precomputed once per vector; the threshold compares
      * bit-identical doubles on both engines, so the cut is exact. */
    "q_sim_cosine_pairs" -> ((s, d) =>
      cosinePairs(embeddings(s, d), 0.32).orderBy("vec_a", "vec_b")),

    /** q275: INT8-QUANTIZED cosine pairs [N scale path] — q67's pair
      * detection run on symmetric int8 quantization (per-vector scale
      * 127/max|x|, floor), the memory/bandwidth shape production ANN
      * actually ships: 4× smaller vectors, integer dot products
      * (exact BIGINT — SIMD-friendly at the executor), one double
      * division at the end. The whole quantize→dot→threshold chain is
      * deterministic cross-engine (exact float→double widening, one
      * IEEE multiply+divide then floor, integer sums), so unlike
      * every other ANN row this one is FULLY oracle-checkable — the
      * approximation is in the declared representation, not in the
      * arithmetic. Recall vs the float pairs is measured in
      * Round14Spec (the q159 recall-audit discipline). Zero vectors
      * quantize to all-zero (qn = 0) and are excluded — cosine is
      * undefined there in the float row too. */
    "q_sim_cosine_quantized" -> ((s, d) => {
      // per-VECTOR quantization runs as HOFs (|vectors| rows —
      // interpreted is fine); the per-PAIR dot is the hot path and
      // runs as the codegen LongDot expression (integer sums are
      // exactly order-independent, so the swap from the HOF chain is
      // hash-invisible; the HOF chain measured 26.7 s at sf0.1's
      // 12.5M pairs)
      val ldot = graft.functions.LongDot.long_dot _
      val q = quantize(embeddings(s, d).select(col("vec_id"), col("embedding")))
        .select("vec_id", "qv", "qn")
      val a = q.select(col("vec_id").as("vec_a"), col("qv").as("qa"),
        col("qn").as("qna"))
      val b = q.select(col("vec_id").as("vec_b"), col("qv").as("qb"),
        col("qn").as("qnb"))
      a.join(b, col("vec_a") < col("vec_b"))
        .filter(col("qna") > 0 && col("qnb") > 0)
        .withColumn("qdot", ldot(col("qa"), col("qb")))
        .withColumn("qcos",
          col("qdot").cast("double") / (sqrt(col("qna")) * sqrt(col("qnb"))))
        .filter(col("qcos") >= 0.32)
        .select(col("vec_a"), col("vec_b"), col("qdot"), col("qcos"))
        .orderBy("vec_a", "vec_b")
    }),

    /** q277: QUANTIZED IVF ANN [N scale path] — q76's bucketed search
      * run over the int8-quantized index ([[ivfIndexQuantized]]): the
      * memory shape production ANN actually ships at 100 TB — the
      * stored index is (vec_id, cluster, qv, qn), ~4× smaller than
      * the float corpus, and every in-bucket dot is the codegen
      * integer [[graft.functions.LongDot]] (SIMD-friendly BIGINT
      * sums), one double division at the end. Centroids stay FLOAT
      * (they are the model, k rows — quantizing them buys nothing);
      * bucket membership is computed on the float vectors at build
      * time and is bit-identical to q76's index, so quantization
      * moves ONLY the scoring — the two approximations (IVF pruning,
      * int8 representation) compose independently. oracle=none
      * (approximate by construction, like q76); Round15Spec audits
      * recall against BOTH the exact float top-k (joint loss) and the
      * quantized brute force (pruning loss isolated — nprobe=k must
      * reproduce it exactly), the q159/q275 recall-audit discipline. */
    "q_sim_ann_ivf_quantized" -> ((s, d) =>
      ivfTopKQuantized(s, d).drop("cluster")),

    /** q279: BATCH QUANTIZED IVF ANN [N scale path] — the production
      * many-probe × quantized-index composition (VERDICT r15 task 6):
      * q135's batch shape run over q277's int8 index. Top-8 quantized
      * cosine neighbours for each of 5 probes, nprobe = k/4; probes
      * quantize in-plan (float vector still drives cluster selection,
      * exactly like the index build), each probe chunk broadcasts
      * against the cluster-pruned int8 corpus, every dot the codegen
      * integer [[graft.functions.LongDot]]. oracle=none (approximate
      * by construction, like q76/q135/q277); Round15Spec pins chunk
      * invariance, nprobe=k ≡ quantized brute batch (pruning is the
      * only IVF-side loss) and recall >= 0.8 vs the float brute
      * force. */
    "q_sim_ann_ivf_batch_quantized" -> ((s, d) => {
      val emb = embeddings(s, d).select(col("vec_id"), col("embedding"))
      val (indexedQ, cents) = ivfIndexQuantized(s, emb)
      val probes = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("embedding").as("probe"))
      ivfSearchBatchQuantized(s, indexedQ, cents, probes,
          nprobe = math.max(1, cents.length / 4), topK = 8)
        .orderBy("probe_id", "rn")
    }),

    /** q110: EMBEDDING-COSINE DEDUP COLLAPSE — the embedding-space
      * analogue of q108 [N]: connected components of the cosine>=0.4
      * pair graph (min-label, FIXED 5 rounds) giving one canonical
      * keep_id per vector. At scale the pair source swaps for the IVF
      * bucketed search (pairs within probed clusters only); the
      * collapse is unchanged. Threshold compares bit-identical
      * doubles, labels are integer — fully oracle-checkable.
      *
      * CONVERGENCE NOTE: the FIXED 5 rounds are the oracle's
      * determinism requirement and under-merge >5-hop similarity
      * chains; production runs
      * [[graft.iter.IterQueries.minPropagateUntilStable]] instead —
      * frontier-driven min-label iteration until no label moves —
      * with every other line unchanged (see the q108 scaladoc). */
    "q_dedup_embedding_groups" -> ((s, d) => {
      // pair graph = the MEMOIZED checkpointed cosine computation
      // (shared with q126) — the loop reads materialized rows, never
      // re-running the O(n²) join; label loop under the loop conf
      val pairs = cachedCosinePairs04(s, d)
      val edges = pairs.select(col("vec_a").as("src"), col("vec_b").as("dst"))
        .union(pairs.select(col("vec_b").as("src"), col("vec_a").as("dst")))
      // r17: compact driver-frontier collapse — see the q108 note
      graft.iter.IterQueries.loopConf(s) {
        graft.iter.IterQueries.minLabelCollapseLocal(edges,
            embeddings(s, d).select(col("vec_id").as("node")), 5)
          .select(col("node").as("vec_id"), col("label").as("keep_id"))
      }.orderBy("vec_id")
    })
  )

  /** Exact cosine pairs (vec_a < vec_b) at `threshold` — q67's
    * computation, shared with the q110 collapse. Norms computed once
    * per vector; dot products are the codegen [[graft.functions
    * .FloatDot]] with the oracle's exact fold order. */
  def cosinePairs(emb0: DataFrame, threshold: Double): DataFrame = {
    val dot = graft.functions.FloatDot.float_dot _
    val emb = emb0
      .withColumn("norm", sqrt(dot(col("embedding"), col("embedding"))))
    val a = emb.select(col("vec_id").as("vec_a"),
      col("embedding").as("emb_a"), col("norm").as("norm_a"))
    val b = emb.select(col("vec_id").as("vec_b"),
      col("embedding").as("emb_b"), col("norm").as("norm_b"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        (dot(col("emb_a"), col("emb_b")) / (col("norm_a") * col("norm_b")))
          .as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** IVF-style ANN, the bucketed scale path for q52: partition the
    * corpus once by nearest centroid (the inverted-file "index" — at
    * production scale a bucketed/partitioned table built offline),
    * then search only the probe's `nprobe` nearest clusters. Scanning
    * cost drops from |corpus| to ~nprobe/k of it; recall is traded
    * via nprobe. oracle=none (approximate by construction) —
    * SimilaritySpec measures recall against the exact q52 top-k. */
  def ivfTopK(s: SparkSession, d: String, k: Int = 10, nprobe: Int = 3,
              topK: Int = 10): DataFrame = {
    val emb = embeddings(s, d).select(col("vec_id"), col("embedding"))
    val cents = emb.filter(col("vec_id") < k).orderBy("vec_id").collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val indexed = KMeans.assign(s, emb, cents) // the IVF assignment
    val probeVec = emb.filter(col("vec_id") === 0).collect()
      .head.getSeq[Float](1).map(_.toDouble).toArray
    val probeClusters = cents.zipWithIndex
      .map { case (c, i) =>
        (i, c.zip(probeVec).map { case (a, b) => (a - b) * (a - b) }.sum)
      }
      .sortBy(_._2).take(nprobe).map(_._1).toSeq
    val probe = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("probe"))
    val dot = graft.functions.FloatDot.float_dot _
    indexed.filter(col("cluster").isInCollection(probeClusters))
      .crossJoin(broadcast(probe))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("cluster"),
        (dot(col("embedding"), col("probe")) /
          (sqrt(dot(col("embedding"), col("embedding")))
            * sqrt(dot(col("probe"), col("probe"))))).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(topK)
  }

  /** Symmetric int8 quantization of a (vec_id, embedding: array<float>)
    * relation — THE declared quantized representation, shared by q275
    * (exact all-pairs over it) and q277 (IVF search over it): per-
    * vector scale 127/max|x|, floor, values in [-127, 127] as BIGINT
    * (BIGINT because the dot-product sums are the hot consumers —
    * the 4× claim is about the STORED int8 codes; at rest the column
    * dictionary/bit-packs to ~1 byte/element in parquet). The squared
    * norm `qn` rides along as one exact codegen [[graft.functions
    * .LongDot]] per vector. Every step is exact or deterministically
    * IEEE (float→double widening, one multiply+divide, floor), so the
    * representation is fully oracle-checkable (q275 proves it). Zero
    * vectors quantize to all-zero (qn = 0); consumers exclude them —
    * cosine is undefined there in the float rows too. Output keeps
    * the input columns and appends (qv, qn); fixed-width transform
    * output with no null elements, satisfying LongDot's contract. */
  def quantize(emb: DataFrame): DataFrame = {
    val ldot = graft.functions.LongDot.long_dot _
    emb
      .withColumn("demb",
        expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("m",
        expr("aggregate(demb, 0D, (acc, x) -> greatest(acc, abs(x)))"))
      .withColumn("qv", expr(
        """CASE WHEN m = 0D THEN transform(demb, x -> 0L)
           ELSE transform(demb, x -> CAST(floor(x * 127.0 / m) AS BIGINT))
           END"""))
      .withColumn("qn", ldot(col("qv"), col("qv")))
      .drop("demb", "m")
  }

  /** q277's index: IVF assignment with an int8-quantized payload —
    * the production ANN memory shape. The stored index drops the
    * float embedding entirely: (vec_id, cluster, qv, qn). Assignment
    * runs on the FLOAT vectors against FLOAT centroids (the same
    * codegen FloatL2Argmin as [[ivfIndex]] — at production scale the
    * build is offline and the float corpus never ships past it), so
    * bucket membership is bit-identical to the float index and
    * quantization affects only in-bucket scoring. `k = 0` sizes the
    * centroid count at ~√n, as [[ivfIndex]]. Map-only: quantize and
    * assign fuse into one scan, no join, no shuffle. */
  def ivfIndexQuantized(s: SparkSession, vecs: DataFrame, k: Int = 0)
      : (DataFrame, Array[Array[Double]]) = {
    val kk = if (k > 0) k
      else math.max(1, math.ceil(math.sqrt(vecs.count().toDouble)).toInt)
    val cents = vecs.orderBy("vec_id").limit(kk).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    require(cents.length == kk, s"ivfIndexQuantized: need >= $kk vectors")
    (KMeans.assign(s, quantize(vecs), cents)
      .select("vec_id", "cluster", "qv", "qn"), cents)
  }

  /** Quantized IVF top-k (q277): [[ivfTopK]]'s probe path over the
    * [[ivfIndexQuantized]] index. Probe→cluster selection is float
    * (k driver-side centroid distances, same as q76); the probe's
    * int8 codes broadcast as a one-row side and every in-bucket dot
    * is the codegen integer [[graft.functions.LongDot]]. Zero-norm
    * rows are excluded (cosine undefined). */
  def ivfTopKQuantized(s: SparkSession, d: String, k: Int = 10,
                       nprobe: Int = 3, topK: Int = 10): DataFrame = {
    val emb = embeddings(s, d).select(col("vec_id"), col("embedding"))
    val (indexed, cents) = ivfIndexQuantized(s, emb, k)
    val probeVec = emb.filter(col("vec_id") === 0).collect()
      .head.getSeq[Float](1).map(_.toDouble).toArray
    val probeClusters = cents.zipWithIndex
      .map { case (c, i) =>
        (i, c.zip(probeVec).map { case (a, b) => (a - b) * (a - b) }.sum)
      }
      .sortBy(_._2).take(nprobe).map(_._1).toSeq
    val probe = quantize(emb.filter(col("vec_id") === 0))
      .select(col("qv").as("qp"), col("qn").as("qnp"))
    val ldot = graft.functions.LongDot.long_dot _
    indexed.filter(col("cluster").isInCollection(probeClusters))
      .crossJoin(broadcast(probe))
      .filter(col("vec_id") =!= 0 && col("qn") > 0 && col("qnp") > 0)
      .select(col("vec_id"), col("cluster"),
        (ldot(col("qv"), col("qp")).cast("double") /
          (sqrt(col("qn")) * sqrt(col("qnp")))).as("qcos"))
      .orderBy(col("qcos").desc, col("vec_id").asc)
      .limit(topK)
  }

  /** BATCH quantized IVF search — [[ivfSearchBatch]]'s probe path over
    * the [[ivfIndexQuantized]] index: probes quantize in-plan (their
    * float vector still drives cluster selection against the float
    * centroids, exactly like the index build), each probe chunk
    * broadcasts (probe_id, qp, qnp, cluster) against the cluster-
    * pruned int8 corpus, and every dot is the codegen integer
    * [[graft.functions.LongDot]]. Scores are integer-exact, so
    * nprobe = k reproduces the quantized brute force bit-equally
    * (Round15Spec) — the IVF pruning stays the ONLY approximation on
    * top of the declared int8 representation. Same eager/chunking
    * discipline as the float batch (corpus persisted for the call,
    * result checkpointed, scratch released). */
  def ivfSearchBatchQuantized(s: SparkSession, indexedQ: DataFrame,
                              cents: Array[Array[Double]],
                              probes: DataFrame, nprobe: Int, topK: Int,
                              chunkSize: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bc = s.sparkContext.broadcast(cents)
    val np = nprobe
    val nearClusters = udf { (p: Seq[Float]) =>
      val cs = bc.value
      cs.indices.map { i =>
        val c = cs(i); var d2 = 0.0; var j = 0
        while (j < c.length) { val df = p(j) - c(j); d2 += df * df; j += 1 }
        (d2, i)
      }.sortBy(identity).take(np).map(_._2)
    }
    val nProbes = probes.count()
    val nChunks = math.max(1, math.ceil(nProbes.toDouble / chunkSize).toInt)
    val withChunk = quantize(
        probes.select(col("probe_id").as("vec_id"),
          col("probe").as("embedding")))
      .select(col("vec_id").as("probe_id"), col("qv").as("qp"),
        col("qn").as("qnp"),
        explode(nearClusters(col("embedding"))).as("cluster"),
        pmod(abs(hash(col("vec_id"))), lit(nChunks)).as("chunk"))
      .localCheckpoint()
    val corpus = indexedQ.persist()
    val ldot = graft.functions.LongDot.long_dot _
    val w = Window.partitionBy("probe_id")
      .orderBy(col("qcos").desc, col("vec_id"))
    val perChunk = (0 until nChunks).map { c =>
      corpus.join(broadcast(withChunk.filter(col("chunk") === c)
          .select("probe_id", "qp", "qnp", "cluster")), Seq("cluster"))
        .filter(col("vec_id") =!= col("probe_id") &&
          col("qn") > 0 && col("qnp") > 0)
        .select(col("probe_id"), col("vec_id"),
          (ldot(col("qv"), col("qp")).cast("double") /
            (sqrt(col("qn")) * sqrt(col("qnp")))).as("qcos"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= topK)
        .select("probe_id", "vec_id", "qcos", "rn")
    }
    val out = perChunk.reduce(_.unionByName(_)).localCheckpoint()
    corpus.unpersist(blocking = false)
    out
  }

  /** Build an IVF index over `vecs` (vec_id, embedding): assignment of
    * every vector to its nearest centroid. `k = 0` (default) sizes the
    * centroid count at ~√n — the standard IVF balance point where
    * centroid scan and cluster scan cost the same — so the index keeps
    * its sub-linear search as the corpus grows; pass k explicitly to
    * override. Centroids are deterministically seeded from the first k
    * vectors by id (at production scale: k-means-train offline, store
    * the assignment as a bucketed table). Returns (indexed corpus,
    * centroids). */
  def ivfIndex(s: SparkSession, vecs: DataFrame,
               k: Int = 0): (DataFrame, Array[Array[Double]]) = {
    val kk = if (k > 0) k
      else math.max(1, math.ceil(math.sqrt(vecs.count().toDouble)).toInt)
    val cents = vecs.orderBy("vec_id").limit(kk).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    require(cents.length == kk, s"ivfIndex: need >= $kk vectors")
    (KMeans.assign(s, vecs, cents), cents)
  }

  /** Persist a quantized IVF index (r16): the int8 corpus relation
    * written PARTITIONED BY CLUSTER — so at read time the nprobe
    * cluster filter becomes parquet PARTITION PRUNING and a probe
    * reads only its nprobe/k share of the index from disk, which is
    * the actual 100 TB ANN-store shape (the in-session path gets the
    * same pruning from the cluster filter over the cached relation;
    * the stored path gets it from the directory layout). Centroids —
    * the k-row model — ride along as a tiny parquet.
    * `Round16Spec` proves the roundtrip is search-result bit-equal
    * and that the probed scan carries the cluster partition filter. */
  def ivfWriteIndex(indexedQ: DataFrame, cents: Array[Array[Double]],
                    path: String): Unit = {
    indexedQ.write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$path/corpus")
    val s = indexedQ.sparkSession
    import s.implicits._
    cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cluster", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Load a stored quantized IVF index: (corpus, centroids). The
    * corpus frame's cluster column is the partition column — any
    * `cluster IN (...)` filter on it prunes directories before a
    * byte of payload is read. */
  def ivfReadIndex(s: SparkSession, path: String)
      : (DataFrame, Array[Array[Double]]) = {
    val corpus = s.read.parquet(s"$path/corpus")
      .select(col("vec_id"), col("cluster").cast("int").as("cluster"),
        col("qv"), col("qn"))
    val cents = s.read.parquet(s"$path/centroids").orderBy("cluster")
      .collect().map(_.getSeq[Double](1).toArray)
    (corpus, cents)
  }

  /** Brute-force batch KNN: top-`topK` cosine neighbours per probe,
    * probes broadcast against the corpus-partitioned scan (never the
    * reverse), the q91 shape as a library entry. Same FloatDot IEEE
    * op order, self-exclusion and (sim desc, vec_id) tie-break as
    * [[ivfSearchBatch]], so nprobe = k makes the two bit-identical —
    * the property [[autoKnn]]'s branch swap rests on. */
  def bruteKnn(corpus: DataFrame, probes: DataFrame,
               topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dot = graft.functions.FloatDot.float_dot _
    val w = Window.partitionBy("probe_id")
      .orderBy(col("sim").desc, col("vec_id"))
    corpus.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        (dot(col("embedding"), col("probe")) /
          (sqrt(dot(col("embedding"), col("embedding")))
            * sqrt(dot(col("probe"), col("probe"))))).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select("probe_id", "vec_id", "sim", "rn")
  }

  /** COST-BASED brute↔IVF KNN selection — [[graft.text.Dedup.autoPairs]]'s
    * pattern applied to the ANN family (the second half of VERDICT
    * r10's "the exact↔approximate swap is manual" gap). The brute
    * path's dominant cost is the |probes| × |corpus| dot-product
    * volume, computed exactly from two count aggregates BEFORE
    * committing to a plan: at/below the cap the zero-recall-loss
    * brute scan runs (no index build, no approximation); above it the
    * √n-centroid IVF index prunes each probe to `nprobe` clusters.
    * Both branches emit (probe_id, vec_id, sim, rn) with identical
    * op order and tie-break, so consumers are plan-agnostic;
    * `Round11Spec` pins both decisions and the nprobe=k bit-equality.
    * At 100 TB the counts are parquet metadata reads and the cap
    * expresses the real tradeoff: below it the index build costs more
    * than it saves, above it the brute volume is the scale killer. */
  def autoKnn(s: SparkSession, corpus: DataFrame, probes: DataFrame,
              topK: Int, nprobe: Int = 3,
              bruteVolumeCap: Long = 50L * 1000 * 1000)
      : (String, DataFrame) = {
    val vol = corpus.count() * probes.count()
    if (vol <= bruteVolumeCap) ("brute", bruteKnn(corpus, probes, topK))
    else ("ivf", {
      val (indexed, cents) = ivfIndex(s, corpus)
      ivfSearchBatch(s, indexed, cents, probes, nprobe, topK)
    })
  }

  /** SIGNED incremental IVF index maintenance [P §3: update = delete
    * + insert] — the LSH `indexApplyDelta` idea for the embedding
    * family: given FIXED centroids (the stored model — retraining is
    * a separate offline concern), a vector's cluster assignment is
    * vec-local, so deleted vectors leave the stored index by a
    * delta-sized broadcast anti-join and inserted vectors are
    * assigned against the SAME centroids and unioned — no surviving
    * vector's row changes, no corpus re-scan. `Round8Spec` proves the
    * maintained index row-equal to a from-scratch assignment of the
    * post-delta corpus, and batch search over it bit-equal. */
  def ivfApplyDelta(s: SparkSession, indexedOld: DataFrame,
                    cents: Array[Array[Double]], insVecs: DataFrame,
                    deletedIds: DataFrame): DataFrame =
    indexedOld.join(broadcast(deletedIds), Seq("vec_id"), "left_anti")
      .unionByName(KMeans.assign(s, insVecs, cents))

  /** BATCH IVF search: top-`topK` cosine neighbours for EVERY probe in
    * `probes` (probe_id, probe: array<float>). Probe→cluster
    * assignment runs IN-PLAN (map-only UDF over broadcast centroids —
    * no driver collect of probes), and probes are processed in
    * `chunkSize`-bounded chunks: each chunk is a dim-sized broadcast
    * against the cluster-pruned corpus, so the corpus is never
    * re-shuffled and the broadcast never outgrows memory no matter how
    * many probes arrive. Per-probe results are exact within the probed
    * clusters; recall is traded via `nprobe` (nprobe = k ≡ brute
    * force — `SimilaritySpec` proves it).
    *
    * EAGER: the probe→cluster assignment and the indexed corpus are
    * persisted for the duration of the call and the result is
    * materialized (localCheckpoint) before both are released — so the
    * chunk loop reads cached rows instead of re-scanning the corpus
    * and re-running the centroid-distance UDF once per chunk, and the
    * caller gets a self-contained result with no dangling cache. */
  def ivfSearchBatch(s: SparkSession, indexed: DataFrame,
                     cents: Array[Array[Double]], probes: DataFrame,
                     nprobe: Int, topK: Int,
                     chunkSize: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bc = s.sparkContext.broadcast(cents)
    val np = nprobe
    val nearClusters = udf { (p: Seq[Float]) =>
      val cs = bc.value
      cs.indices.map { i =>
        val c = cs(i); var d2 = 0.0; var j = 0
        while (j < c.length) { val df = p(j) - c(j); d2 += df * df; j += 1 }
        (d2, i)
      }.sortBy(identity).take(np).map(_._2)
    }
    val nProbes = probes.count()
    val nChunks = math.max(1, math.ceil(nProbes.toDouble / chunkSize).toInt)
    // materialize assignment ONCE: each chunk filter below reads
    // checkpointed rows instead of re-running the probe scan + the
    // O(nProbes x k x dims) centroid-distance UDF per chunk
    val withChunk = probes
      .select(col("probe_id"), col("probe"),
        explode(nearClusters(col("probe"))).as("cluster"),
        pmod(abs(hash(col("probe_id"))), lit(nChunks)).as("chunk"))
      .localCheckpoint()
    val corpus = indexed.persist()
    val dot = graft.functions.FloatDot.float_dot _
    val w = Window.partitionBy("probe_id")
      .orderBy(col("sim").desc, col("vec_id"))
    val perChunk = (0 until nChunks).map { c =>
      corpus.join(broadcast(withChunk.filter(col("chunk") === c)
          .select("probe_id", "probe", "cluster")), Seq("cluster"))
        .filter(col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id"),
          (dot(col("embedding"), col("probe")) /
            (sqrt(dot(col("embedding"), col("embedding")))
              * sqrt(dot(col("probe"), col("probe"))))).as("sim"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= topK)
        .select("probe_id", "vec_id", "sim", "rn")
    }
    val out = perChunk.reduce(_.unionByName(_)).localCheckpoint()
    corpus.unpersist(blocking = false)
    out
  }

  val sql: Map[String, String] = Map(
    /** q275 oracle: the identical quantize→integer-dot→one-division
      * chain in DuckDB list ops — every step exact or
      * deterministically IEEE (see the Spark scaladoc). */
    "q_sim_cosine_quantized" ->
      """WITH e AS (
           SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
             list_max(list_transform(embedding,
               x -> abs(CAST(x AS DOUBLE)))) AS m
           FROM embeddings
         ), q AS (
           SELECT vec_id,
             CASE WHEN m = 0 THEN list_transform(emb, x -> CAST(0 AS BIGINT))
                  ELSE list_transform(emb,
                    x -> CAST(floor(x * 127.0 / m) AS BIGINT)) END AS qv
           FROM e
         ), n AS (
           SELECT vec_id, qv,
             CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS qn
           FROM q
         ), pairs AS (
           SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             CAST(list_sum(list_transform(list_zip(a.qv, b.qv),
               p -> p[1] * p[2])) AS BIGINT) AS qdot,
             a.qn AS qna, b.qn AS qnb
           FROM n a JOIN n b ON a.vec_id < b.vec_id
           WHERE a.qn > 0 AND b.qn > 0
         )
         SELECT vec_a, vec_b, qdot,
                CAST(qdot AS DOUBLE) / (sqrt(qna) * sqrt(qnb)) AS qcos
         FROM pairs
         WHERE CAST(qdot AS DOUBLE) / (sqrt(qna) * sqrt(qnb)) >= 0.32
         ORDER BY vec_a, vec_b""",
    "q_sim_topk_cosine" ->
      """WITH probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0)
         SELECT vec_id,
           list_sum(list_transform(list_zip(embedding, p),
             x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(list_zip(embedding, embedding),
                x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))))
              * sqrt(list_sum(list_transform(list_zip(p, p),
                  x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))))
           AS sim
         FROM embeddings, probe
         WHERE vec_id <> 0
         ORDER BY sim DESC, vec_id ASC
         LIMIT 10""",
    /** q110 oracle: q67's validated cosine formulation at 0.4, then
      * the same 5 unrolled min-label stages as q108. */
    "q_dedup_embedding_groups" -> {
      def stage(k: Int): String = {
        val prev = s"label${k - 1}"
        s"""label$k AS (
            SELECT p.node, least(p.label, coalesce(s.mc, 999999999)) AS label
            FROM $prev p LEFT JOIN (
              SELECT e.dst AS node, MIN(p2.label) AS mc
              FROM emb_edges e JOIN $prev p2 ON p2.node = e.src
              GROUP BY e.dst
            ) s ON s.node = p.node
          )"""
      }
      s"""WITH n AS (
           SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(list_zip(embedding, embedding),
               x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))) AS norm
           FROM embeddings
         ),
         pairs AS (
           SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
           FROM n a JOIN n b ON a.vec_id < b.vec_id
           WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding),
               x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
             / (a.norm * b.norm) >= 0.4
         ),
         emb_edges AS (
           SELECT vec_a AS src, vec_b AS dst FROM pairs
           UNION ALL
           SELECT vec_b AS src, vec_a AS dst FROM pairs
         ),
         label0 AS (SELECT vec_id AS node, vec_id AS label FROM n),
         ${(1 to 5).map(stage).mkString(",\n")}
         SELECT node AS vec_id, label AS keep_id
         FROM label5 ORDER BY vec_id"""
    },
    "q_sim_cosine_pairs" ->
      """WITH n AS (
           SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(list_zip(embedding, embedding),
               x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))) AS norm
           FROM embeddings
         )
         SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           list_sum(list_transform(list_zip(a.embedding, b.embedding),
             x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
           / (a.norm * b.norm) AS sim
         FROM n a JOIN n b ON a.vec_id < b.vec_id
         WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding),
             x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
           / (a.norm * b.norm) >= 0.32
         ORDER BY vec_a, vec_b"""
  )
}
