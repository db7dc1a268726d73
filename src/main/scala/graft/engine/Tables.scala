package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed fixture readers for the driver-generated testdata
  * (FIXTURES.md). The reference tree at /root/reference is absent
  * (SURVEY.md §0), so semantics cite the published i2MapReduce paper
  * via SURVEY.md instead of reference file:line.
  *
  * Scale note: every reader is a plain parquet scan — columnar,
  * splittable, predicate-pushdown-capable. At cluster scale the same
  * code reads a partitioned table directory; nothing here assumes a
  * single file.
  */
object Tables {
  /** The driver contract's query shape: (session, sf-dir) => result. */
  type Q = (SparkSession, String) => DataFrame

  def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(s, dir)
    else s.read.parquet(s"$dir/$name.parquet")

  /** events.parquet physical schema with ts as a raw integer epoch —
    * the fallback read used only when Spark's schema inference rejects
    * the footer (TIMESTAMP(NANOS), SPARK-40819). A user-supplied
    * LongType schema reads the raw int64 without any session-wide
    * legacy conf, so no session state is mutated. */
  private val eventsRawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Convert a raw int64 epoch `ts` column to µs by sniffing the unit
    * from one non-null sample's magnitude (2024-era epochs: seconds
    * ≈1.7e9, millis ≈1.7e12, micros ≈1.7e15, nanos ≈1.7e18 — four
    * decades apart, so one row decides unambiguously). The sample read
    * is one row of one column chunk — O(1) even on a 100 TB table. */
  private def longEpochToMicros(df: DataFrame): Column = {
    val sample = df.select(col("ts")).where(col("ts").isNotNull).head(1)
    val v = if (sample.isEmpty) 0L else math.abs(sample(0).getLong(0))
    if (v >= 1e17) expr("ts div 1000")            // nanos
    else if (v >= 1e14) col("ts")                 // micros
    else if (v >= 1e11) col("ts") * lit(1000L)    // millis
    else col("ts") * lit(1000000L)                // seconds
  }

  def region(s: SparkSession, d: String): DataFrame    = tbl(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = tbl(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = tbl(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = tbl(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = tbl(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = tbl(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = tbl(s, d, "lineitem")
  /** events with `ts` normalized to TimestampType (µs precision),
    * whatever the fixture's physical layout. The driver has shipped
    * this column as parquet TIMESTAMP(NANOS) (rounds 1–8) and as
    * timestamp[us] with isAdjustedToUTC=false (round 9+) — a reader
    * that hardcodes one layout breaks on the next regeneration
    * (VERDICT r9), so we sniff instead of assuming:
    *  1. native `spark.read.parquet` first — handles TIMESTAMP(MICROS/
    *     MILLIS) directly; TIMESTAMP_NTZ (isAdjustedToUTC=false under
    *     Spark 4's default inferTimestampNTZ) is cast to TimestampType,
    *     which under the engine's UTC session timezone preserves the
    *     instant bit-for-bit (DuckDB reads the same column as a naive
    *     timestamp, so the engines agree);
    *  2. if schema inference rejects the footer (TIMESTAMP(NANOS),
    *     SPARK-40819) — fall back to an explicit LongType schema and
    *     integer-divide nanos→µs (`div`, not double: ns-since-epoch
    *     exceeds double's 53-bit mantissa);
    *  3. a plain int64 `ts` is unit-sniffed by magnitude
    *     (longEpochToMicros).
    * FixtureContractSpec pins the resulting values to the documented
    * 2024 range so the NEXT layout change fails loudly in `sbt test`,
    * not silently in the oracle. */
  def events(s: SparkSession, d: String): DataFrame = {
    val path = s"$d/events.parquet"
    // Fall back ONLY on the schema-inference rejection the fallback
    // is built for (TIMESTAMP(NANOS), SPARK-40819) — any other failure
    // (missing path, corrupt footer, permissions) propagates as
    // itself instead of resurfacing later as a confusing wrong-schema
    // read under the nanos-specific `div 1000` (ADVICE r10).
    val native =
      try Some(s.read.parquet(path))
      catch {
        case scala.util.control.NonFatal(e)
            if Option(e.getMessage).exists(m =>
              m.contains("TIMESTAMP(NANOS") ||
              m.contains("Illegal Parquet type")) => None
      }
    native match {
      case Some(df) => df.schema("ts").dataType match {
        case TimestampType    => df
        case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
        case LongType         => df.withColumn("ts", timestamp_micros(longEpochToMicros(df)))
        // insurance against the next plausible drifts: a DATE column
        // (day precision) and an ISO-8601 string both cast cleanly
        // under the UTC session; FixtureContractSpec's 2024-range
        // check still arbitrates whether the values are sane
        case DateType         => df.withColumn("ts", col("ts").cast(TimestampType))
        case _: StringType    => df.withColumn("ts", col("ts").cast(TimestampType))
        case other => throw new IllegalStateException(
          s"events.ts: unsupported physical type $other in $path")
      }
      case None =>
        s.read.schema(eventsRawSchema).parquet(path)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = tbl(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = tbl(s, d, "embeddings")

  val allNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")
}

/** Determinism helpers implementing SURVEY.md rules D1–D6 so Spark
  * output hash-matches the DuckDB oracle.
  *
  * Cross-engine numeric contract (validated against DuckDB 1.0.0 on
  * this box, 2026-08-12):
  *  - Raw money columns are exact 2-dp doubles (verified per column),
  *    so a scale-2/4 decimal cast is tie-free and exact on BOTH
  *    engines. All arithmetic that feeds an aggregate happens in
  *    decimal — exact and order-independent, so shuffle order can
  *    never perturb a sum.
  *  - Output floats are DOUBLE on both sides, produced from the exact
  *    decimal by one CAST (correctly rounded in both engines —
  *    validated on 40k random values) and at most one IEEE division
  *    (exact-rounded, bit-identical). This survives any driver
  *    normalization: float64 == float64 bitwise.
  *  - NEVER round() a computed double: Spark rounds the shortest
  *    decimal repr (BigDecimal.valueOf) while DuckDB rounds via
  *    scale-multiply, and they can disagree at x.xxx5 boundaries.
  *    Rounding raw 2-dp columns is safe (no ties); rounding computed
  *    expressions is not.
  *  - 2^53 BOUNDARY RULE: decimal→double is only correctly rounded
  *    while the decimal's UNSCALED value fits in 2^53 — above that,
  *    both engines' fast paths (unscaled long→double, then divide by
  *    10^scale) double-round, and they can disagree by 1 ulp (caught
  *    live on a scale-10 sum at ~4e17 unscaled). Any decimal whose
  *    unscaled magnitude can exceed 2^53 must be re-scaled down
  *    (e.g. CAST to DECIMAL(18,4) / ROUND(...,4) — half-up on both
  *    engines) before the double cast.
  */
object Dec {
  /** Exact money decimal (tie-free for the 2-dp raw columns). */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  /** Small factor like (1-discount) — exact at 4 dp. */
  def dec4s(c: Column): Column = c.cast(DecimalType(8, 4))
  /** Output-normalize an exact decimal to double. */
  def dbl(c: Column): Column = c.cast(DoubleType)
  /** Exact decimal sum of a 2-dp column, output as double. */
  def sumd2(c: Column): Column = sum(dec2(c)).cast(DoubleType)
  /** Average via one IEEE double division of exact operands. */
  def avgd(sumDec: Column, cnt: Column): Column =
    sumDec.cast(DoubleType) / cnt.cast(DoubleType)
}
