package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables._

/** Round-12 batch 12 (SURVEY §2 row 242): Z-ORDER clustered layout —
  * the multi-dimensional data-skipping member of the layout family
  * (hive partition pruning q158, dynamic partition pruning q223,
  * bucketed co-location q157, small-file compaction q186). Facts are
  * written partitioned by the Morton (bit-interleaved) code of the
  * two query dimensions; a 2-D box predicate then prunes to exactly
  * the partitions whose Z-cell rectangle intersects the box — the
  * mechanism behind Delta/Iceberg OPTIMIZE ZORDER, expressed with
  * stock Spark partitioned writes.
  *
  * The reference tree at /root/reference is absent (SURVEY.md §0);
  * semantics follow SURVEY §2 row 242.
  */
object Round12h {

  private val statsMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), (Long, Int, Int)]
  graft.engine.Memos.register { () => statsMemo.clear() }

  private def scratchRoot(s: SparkSession, d: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_r12h_" +
      Integer.toHexString(d.hashCode) + "_" + s.sparkContext.applicationId

  /** Morton interleave of two 4-bit cell coordinates → 8-bit Z code
    * (driver-side mirror of [[zCol]]; used to enumerate the
    * candidate cells of a query box). */
  def zOf(ux: Int, dx: Int): Int =
    (0 until 4).map(i =>
      (((ux >> i) & 1) << (2 * i + 1)) | (((dx >> i) & 1) << (2 * i))).sum

  /** Column form of [[zOf]]. */
  def zCol(ux: Column, dx: Column): Column =
    (0 until 4).map(i =>
      shiftleft(shiftright(ux, i).bitwiseAND(lit(1)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(dx, i).bitwiseAND(lit(1)), 2 * i)))
      .reduce(_.bitwiseOR(_))

  /** The fixed 2-D query box (chosen non-empty at every fixture SF:
    * users 0..14 exist even at sf0.001; days are always Jan 2024). */
  private val (uLo, uHi) = (3L, 8L)
  private val (dayLo, dayHi) = ("2024-01-08", "2024-01-21")
  private def dnumOf(day: String): Int =
    java.time.LocalDate.parse(day).toEpochDay.toInt

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    /** q242: Z-ORDER LAYOUT + 2-D BOX PRUNING [N scale path] —
      * events are written ONCE (session-memoized, appId-isolated
      * scratch) partitioned by the 8-bit Morton code of
      * (user-bucket, day-bucket), both dimensions normalized to 16
      * cells from data-derived stats (Z-order IS a data-dependent
      * layout). The query enumerates driver-side the ≤256 Z cells
      * whose rectangle intersects the box — O(cells), never a scan —
      * and reads only those partitions (static partition pruning on
      * the Z code), then applies the exact box predicate. At 100 TB
      * this is the difference between scanning the corpus and
      * scanning the box's Morton rectangle; the result is
      * layout-invisible (oracle = the plain filter). `Round12mSpec`
      * pins PartitionFilters-on-zb in the executed plan, candidate
      * strictness (<256), Morton bijectivity, and result ≡ unpruned
      * scan. */
    "q_scan_zorder" -> ((s, d) => {
      val scratch = s"${scratchRoot(s, d)}/zorder"
      val (maxU, minD, maxD) =
        statsMemo.getOrElseUpdate((s, d, "zorder_stats"), {
          val ev = events(s, d)
            .withColumn("dnum",
              datediff(to_date(col("ts")), lit("1970-01-01")))
          val r = ev.agg(max("user_id"), min("dnum"), max("dnum"))
            .collect()(0)
          val stats = (r.getLong(0), r.getInt(1), r.getInt(2))
          val (mu, lo, hi) = stats
          // DIV, not '/': Column./ is floating division; the cell
          // coordinate must be the exact integer quotient.
          ev.withColumn("ux",
              expr(s"CAST(user_id * 16 DIV ${mu + 1} AS INT)"))
            .withColumn("dx",
              expr(s"CAST((dnum - $lo) * 16 DIV ${hi - lo + 1} AS INT)"))
            .withColumn("zb", zCol(col("ux"), col("dx")))
            .drop("ux", "dx", "dnum")
            .write.mode("overwrite").partitionBy("zb").parquet(scratch)
          stats
        })
      val uxs = (uLo * 16 / (maxU + 1)).toInt to
        (uHi * 16 / (maxU + 1)).toInt
      val dxs = ((dnumOf(dayLo) - minD) * 16 / (maxD - minD + 1)) to
        ((dnumOf(dayHi) - minD) * 16 / (maxD - minD + 1))
      val cand = (for { x <- uxs; y <- dxs } yield zOf(x, y)).distinct
      s.read.parquet(scratch)
        .filter(col("zb").isin(cand: _*))
        .filter(col("user_id").between(uLo, uHi) &&
          to_date(col("ts")).between(lit(dayLo), lit(dayHi)))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          sum(floor(col("value") * lit(100)).cast("long"))
            .as("value_cents_sum"))
    }))

  def sql: Map[String, String] = Map(
    "q_scan_zorder" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_events,
                CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
                CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                  AS value_cents_sum
         FROM events
         WHERE user_id BETWEEN 3 AND 8
           AND CAST(ts AS DATE) BETWEEN DATE '2024-01-08'
                                    AND DATE '2024-01-21'""")
}
