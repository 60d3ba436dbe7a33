package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities for hot-key joins (SURVEY.md §2.C / PLANS.md:
  * near-dup candidate joins and fact joins degrade when one key dominates a
  * shuffle partition).
  *
  * Two complementary paths:
  *  - AQE skew-join splitting (`spark.sql.adaptive.skewJoin.*`) — automatic,
  *    but only rebalances sort-merge joins at runtime.
  *  - [[saltedJoin]] — structural: spreads each hot left-side key over
  *    `salt` sub-keys and replicates the right side per sub-key, so the
  *    shuffle distributes a hot key across `salt` reducers regardless of
  *    join strategy. Right-side replication costs `salt ×` its size —
  *    use for dimension-sized or pre-filtered right sides.
  */
object Skew {

  /** Inner equi-join on `key` with left-side salting. Result rows equal the
    * plain join exactly (every left row joins the full right key-group
    * because the right side is replicated across all salt values).
    *
    * The salt must distribute rows of the SAME key across values — it must
    * NOT be a function of the key alone. `monotonically_increasing_id()` is
    * per-row unique and partition-local (no shuffle to compute).
    */
  /** Internal salt column — collision-proof name so a user `_salt` column is
    * never silently overwritten (and guarded anyway).
    */
  private val SaltCol = "__graft_salt"

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salt: Int): DataFrame = {
    require(salt > 1, "salt must be > 1")
    require(!left.columns.contains(SaltCol) && !right.columns.contains(SaltCol),
      s"saltedJoin: inputs must not contain a $SaltCol column")
    val l = left.withColumn(SaltCol,
      pmod(monotonically_increasing_id(), lit(salt.toLong)))
    val reps = explode(array((0 until salt).map(i => lit(i.toLong)): _*))
    val r = right.withColumn(SaltCol, reps)
    l.join(r, l(SaltCol) === r(SaltCol) && l(key) === r(key))
      .drop(r(key)).drop(l(SaltCol)).drop(r(SaltCol))
  }

  /** Per-key occupancy report — the diagnostic that decides between AQE
    * (moderate skew) and salting / key-widening (pathological skew). Returns
    * (key, n) for the `topK` hottest keys.
    */
  def hotKeys(df: DataFrame, key: Column, topK: Int = 20): DataFrame =
    df.groupBy(key.as("key"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("key"))
      .limit(topK)
}
