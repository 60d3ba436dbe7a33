package graft.ops

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame

/** Scoped release registry for the persisted / locally-checkpointed
  * intermediates some operators create by design (batch signature tables,
  * lined payloads, window tables, k-means codebooks, the final
  * connected-components checkpoint). Each operator that caches takes a
  * registry argument and registers its handles there; the OWNER of the
  * registry releases them once the operator's outputs are materialized —
  * NOT between the call and its outputs' actions (the caches are what let
  * an output's multiple readers share one scan).
  *
  * Two block kinds, because they need different release paths:
  *  - `add`: Dataset-level `persist()` handles (released via
  *    `Dataset.unpersist`, also visible to `spark.catalog.clearCache`);
  *  - `addRdd`: RDD-level blocks backing a `localCheckpoint` — invisible to
  *    `Dataset.unpersist` and `clearCache`, so they MUST be released on the
  *    backing RDD directly or they accumulate in executor storage. Note a
  *    released localCheckpoint's DataFrame cannot be re-executed (lineage
  *    is truncated), so release only after its consumer's action.
  *
  * Concurrency contract: a registry is as scoped as its owner makes it.
  * Concurrent callers construct one registry per logical task and release
  * it at that task's end — no call can then free another live caller's
  * blocks (the global-queue trap this class replaced). The shared
  * [[CacheRegistry.harness]] instance exists only for the sequential
  * Bench/Verify/SparkEntry query path, where exactly one query runs at a
  * time and releases between queries.
  */
final class CacheRegistry {
  private val q = new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()

  /** Register a persisted Dataset handle; returns it for chaining. */
  def add(df: DataFrame): DataFrame = { q.add(() => { df.unpersist(blocking = false); () }); df }

  /** Register the backing RDD of a localCheckpoint (see class note). */
  def addRdd(rdd: RDD[_]): Unit = q.add(() => { rdd.unpersist(blocking = false); () })

  /** Release every handle registered since the last release. Safe to call
    * when none are live, and safe to interleave with new registrations
    * (queue semantics — only handles present at call time are drained).
    */
  def release(): Unit = {
    var f = q.poll()
    while (f != null) { f(); f = q.poll() }
  }
}

object CacheRegistry {
  /** The sequential-harness scope: the default registry of the
    * uniform-signature `SparkEntry.queries` entry points, drained by
    * Bench/Verify after each query's action. One query at a time by
    * construction — a concurrent programmatic caller must pass its own
    * registry to the library functions instead of using this one.
    */
  val harness = new CacheRegistry
}
