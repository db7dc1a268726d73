package graft

import org.apache.spark.sql.functions._
import graft.ops.Curation

/** Invariants for the corpus-curation operators (SURVEY.md §2 rows
  * 150–152) beyond their DuckDB oracles: scrub idempotence and
  * completeness, mixture-rule monotonicity and the keep-all bucket,
  * and prefix-dedup refinement of exact dedup. */
class CurationSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = graft.engine.Tables.documents(spark, sfDir)

  test("q_text_scrub: scrubbing is idempotent and complete") {
    val scrubbed = docs.select(col("doc_id"),
      regexp_replace(col("text"), Curation.ScrubPattern, "[X]").as("t"))
    // complete: no blocklist term survives one pass
    val residual = scrubbed
      .filter(regexp_count(col("t"), lit(Curation.ScrubPattern)) > 0)
      .count()
    assert(residual == 0L, s"$residual docs still carry blocklist terms")
    // idempotent: a second pass is byte-identical
    val changed = scrubbed
      .filter(regexp_replace(col("t"), Curation.ScrubPattern, "[X]")
        =!= col("t")).count()
    assert(changed == 0L)
    // the declared query returns exactly the docs with ≥1 hit
    val q = SparkEntry.queries("q_text_scrub")(spark, sfDir)
    val expected = docs
      .filter(regexp_count(col("text"), lit(Curation.ScrubPattern)) > 0)
      .count()
    assert(q.count() == expected)
  }

  test("q_mix_sources: keep rule is threshold-monotone; bucket 3 keeps all") {
    val h2 = substring(md5(col("doc_id").cast("string")), 1, 2)
    val at25 = docs.filter(h2 < "40").select("doc_id")
    val at50 = docs.filter(h2 < "80").select("doc_id")
    // monotone: raising the target rate never evicts a kept doc
    assert(at25.except(at50).count() == 0L)
    val q = SparkEntry.queries("q_mix_sources")(spark, sfDir)
    val keepAll = q.filter(col("target_rate") === 1.0)
      .filter(col("n_kept") =!= col("n_total")).count()
    assert(keepAll == 0L, "a rate-1.0 source dropped documents")
    // counts are conserved: Σ n_total over sources = corpus size
    val total = q.agg(sum("n_total")).as[Long].head()
    assert(total == docs.count())
  }

  test("q_dedup_prefix refines q_dedup_exact: full-text dups share a prefix group") {
    // every exact full-text duplicate pair is also a prefix duplicate
    // pair, so each multi-member exact group maps inside ONE prefix
    // group with at least its cardinality
    val exact = docs
      .select(col("doc_id"), md5(col("text")).as("h"),
        md5(substring(col("text"), 1, 64)).as("ph"))
    val violating = exact.groupBy("h")
      .agg(countDistinct("ph").as("nph"), count(lit(1)).as("n"))
      .filter(col("n") > 1 && col("nph") =!= 1).count()
    assert(violating == 0L, "an exact-dup group spans prefix groups")
    val q = SparkEntry.queries("q_dedup_prefix")(spark, sfDir)
    // keep_id is a member min: re-derive and compare
    val rederived = exact.groupBy("ph")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keep_id"))
      .filter(col("n_docs") > 1)
      .select(col("ph"), col("n_docs").cast("long"), col("keep_id"))
    assert(q.select(col("ph"), col("n_docs"), col("keep_id"))
      .except(rederived).count() == 0L)
  }

  test("curation plans: scrub is map-only; mix aggregates partially") {
    val scrub = SparkEntry.queries("q_text_scrub")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the only exchange is the final deterministic-dump range sort
    assert(!scrub.contains("hashpartitioning"),
      s"scrub shuffled on a hash key:\n$scrub")
    val mix = SparkEntry.queries("q_mix_sources")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(mix.contains("partial_count") || mix.contains("partial_sum"),
      "mixture aggregate lost its map-side partial")
  }
}
