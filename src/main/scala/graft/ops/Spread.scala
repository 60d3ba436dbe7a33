package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate,
  Distinct, Except, Intersect, Join, LogicalPlan, RepartitionOperation,
  Sort, Window}

/** Floor a CPU-dense map stage's parallelism at the session's core count.
  *
  * Parquet scan splits are floored at `spark.sql.files.openCostInBytes`
  * (4 MB), so a small input file arrives as 1-3 partitions regardless of
  * core count — and every stage BEFORE the first exchange (payload
  * synthesis + codec decode, tokenize/shingle/hash partial aggregation)
  * then runs on one or two cores while the rest of the machine idles
  * (guide §2.5, input skew: "one huge unsplittable file … repartition
  * immediately after the read"; measured at sf0.1/local[32]: the image
  * hash pass 3.7 s → 0.5 s, the MJPEG frame decode 6.6 s → 0.9 s).
  *
  * The repartition is CONDITIONAL on the input actually being narrower
  * than the session's default parallelism, so at production scale — where
  * the corpus arrives as thousands of splits — it never fires and plans
  * are unchanged; when it fires, the bytes moved are the pre-explosion
  * input rows (ids + text), the cheapest point in the pipeline to move
  * them. Partitioning is BY KEY (hash), not round-robin: deterministic
  * row placement under retries, and no sort-before-repartition tax
  * (guide §2.5 on keyless repartition). Downstream per-key aggregations
  * on the same key reuse the partitioning, eliding their own exchange.
  *
  * The narrowness probe must not execute the plan. `df.rdd` is exact and
  * free on a NARROW plan (scans/projections/filters/generates carry no
  * exchange, so no AdaptiveSparkPlan wrapper exists and building the RDD
  * runs no job), but on a join/aggregate-rooted plan AQE materializes
  * every query stage just to answer `getNumPartitions` — the whole
  * sub-plan would run twice per invocation (once here, once at the real
  * action). Those callers (the incremental novelty batches: left-anti
  * joins against a roster) are decided from the optimizer's size
  * ESTIMATE instead: spread iff the estimated bytes cannot fill
  * `defaultParallelism` scan splits at the open-cost floor. The estimate
  * needs no execution, is exact enough at both extremes (KB-scale bench
  * batches vs TB-scale production inputs), and errs only in a band where
  * either choice costs one cheap exchange of narrow rows.
  */
object Spread {
  def byKey(df: DataFrame, key: Column): DataFrame = {
    val s = df.sparkSession
    val p = s.sparkContext.defaultParallelism
    val qe = df.queryExecution
    val spread =
      if (isNarrow(qe.analyzed)) df.rdd.getNumPartitions < p
      else {
        val openCost = s.sessionState.conf.filesOpenCostInBytes
        qe.optimizedPlan.stats.sizeInBytes < BigInt(p) * openCost
      }
    if (spread) df.repartition(p, key) else df
  }

  /** No exchange-introducing operator anywhere in the plan — the shapes
    * whose RDD construction is job-free (and which AQE does not wrap).
    */
  private def isNarrow(plan: LogicalPlan): Boolean = plan.collectFirst {
    case _: Join => ()
    case _: Aggregate => ()
    case _: Window => ()
    case _: Sort => ()
    case _: Deduplicate => ()
    case _: Distinct => ()
    case _: Except => ()
    case _: Intersect => ()
    case _: RepartitionOperation => ()
  }.isEmpty
}
