package graft.ops

import org.apache.spark.sql.functions._
import graft.engine.Tables._

/** Round-10 extensions (SURVEY.md §2 rows 155–156), both closing
  * VERDICT r9 gaps:
  *  - q155 `q_fn_ts_absolute`: an ABSOLUTE-time anchor query over the
  *    event stream. Every other events-time query is either
  *    ordering-invariant (funnel, as-of) or fails the oracle with an
  *    opaque row-count diff when the fixture's timestamp unit skews
  *    (the r9 regression: 12 red rows, zero direct evidence). This
  *    row outputs raw timestamp bounds AND counts against a fixed
  *    wall-clock literal, so a unit-skewed ingest fails HERE with
  *    visibly-1970 values — the oracle-side complement of
  *    FixtureContractSpec.
  *  - q156 `q_source_csv_json`: the CSV/JSON source capability as a
  *    declared oracle-checked surface instead of unit-test-only. */
object Round10 {

  val defs: Map[String, Q] = Map(
    /** q155: per-type absolute time bounds + a fixed-cutoff count.
      * min/max pass raw TimestampType through to the output (any unit
      * error is directly visible in the dumped parquet), and the
      * 2024-01-15 literal comparison breaks under ANY skew — a
      * 1000x-too-small ts makes every row land before the cutoff. */
    "q_fn_ts_absolute" -> ((s, d) =>
      events(s, d)
        .groupBy("event_type")
        .agg(min(col("ts")).as("ts_min"),
          max(col("ts")).as("ts_max"),
          sum(when(col("ts") >= lit("2024-01-15 00:00:00").cast("timestamp"),
            1L).otherwise(0L)).as("n_2nd_half"),
          count(lit(1)).as("n"))
        .orderBy("event_type")),

    /** q156: CSV + JSON source surface as a DECLARED query (VERDICT r9
      * gap 2: the formats were unit-test-only). The dims round-trip
      * through both text formats BEFORE the join-aggregate — header
      * CSV for nation, line-JSON for region, explicit schemas (the
      * production pattern: never infer on a 100 TB lake) — so any
      * read-path defect (quoting, null encoding, type coercion)
      * breaks the oracle hash, which is computed from the parquet
      * originals. Scratch is a fixed per-fixture temp dir, mode
      * OVERWRITE: repeated invocations never accumulate files. Dims
      * only — at scale the text-format pattern is identical, just
      * partitioned; nothing here assumes a single file. */
    "q_source_csv_json" -> ((s, d) => {
      // scratch keyed by fixture AND Spark application id: stable
      // within a session (mode overwrite — no accumulation across
      // invocations) but isolated from concurrent processes benching
      // the same fixture, which previously raced on one shared dir
      // (ADVICE r10); the app id also breaks cross-fixture 32-bit
      // hashCode collisions between processes.
      val scratch = s"${sys.props("java.io.tmpdir")}/graft_srcmix_" +
        Integer.toHexString(d.hashCode) + "_" + s.sparkContext.applicationId
      val nat = nation(s, d)
      val reg = region(s, d)
      nat.write.mode("overwrite").option("header", "true")
        .csv(s"$scratch/nation_csv")
      reg.write.mode("overwrite").json(s"$scratch/region_json")
      val natBack = s.read.option("header", "true").schema(nat.schema)
        .csv(s"$scratch/nation_csv")
      val regBack = s.read.schema(reg.schema).json(s"$scratch/region_json")
      natBack.join(broadcast(regBack),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_nations"),
          min("n_name").as("first_nation"))
        .orderBy("r_name")
    })
  )

  val sql: Map[String, String] = Map(
    "q_fn_ts_absolute" ->
      """SELECT event_type,
           min(ts) AS ts_min, max(ts) AS ts_max,
           CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-15 00:00:00'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_2nd_half,
           CAST(count(*) AS BIGINT) AS n
         FROM events GROUP BY event_type ORDER BY event_type""",
    // q156's oracle reads the parquet originals — the Spark side must
    // produce identical values through the CSV/JSON round-trip.
    "q_source_csv_json" ->
      """SELECT r_name,
           CAST(count(*) AS BIGINT) AS n_nations,
           min(n_name) AS first_nation
         FROM nation JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name"""
  )
}
