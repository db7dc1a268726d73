package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for fact ⋈ dim joins whose key distribution is
  * pathological (one hot key owning most rows): SALT the fact side
  * into `nSalts` sub-keys and replicate the dim side once per salt,
  * so the hot key's rows spread across `nSalts` tasks instead of
  * long-poling one.
  *
  * This is the MANUAL form of what AQE's skew-join handling does for
  * sort-merge joins at runtime; it exists for the cases AQE doesn't
  * cover (broadcast-ineligible dims with extreme fact skew, or
  * deterministic plan shapes where runtime re-planning is disabled,
  * e.g. inside iterative loops).
  *
  * The salt is derived from deterministic row content (a hash of the
  * provided columns), never `rand()` — results are reproducible and
  * retries/speculative tasks see the same assignment. */
object Skew {

  /** Inner-join `fact ⋈ dim` on `key`, fact side salted by a hash of
    * `saltBy` columns. Semantically identical to
    * `fact.join(dim, key)` for any `nSalts >= 1`.
    *
    * `saltBy` must include at least one column with per-row variance
    * BEYOND the join key: if it is only the key, every row of the hot
    * key hashes to one salt and the mitigation is a no-op. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltBy: Seq[Column], nSalts: Int): DataFrame = {
    require(nSalts >= 1, s"nSalts must be >= 1, got $nSalts")
    // Collision-free temp name: withColumn silently REPLACES an
    // existing column, which would make a user's same-named column
    // vanish from the output instead of failing.
    val salt = Iterator.from(0).map(i => s"__graft_salt_$i")
      .find(n => !fact.columns.contains(n) && !dim.columns.contains(n)).get
    val salted = fact.withColumn(salt, pmod(hash(saltBy: _*), lit(nSalts)))
    val replicated = dim
      .withColumn(salt, explode(array((0 until nSalts).map(lit): _*)))
    salted.join(replicated, Seq(key, salt)).drop(salt)
  }
}
