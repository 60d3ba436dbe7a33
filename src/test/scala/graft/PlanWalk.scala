package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Test-side plan traversal that sees THROUGH the adaptive-execution
  * wrappers: `SparkPlan.collect` stops at `AdaptiveSparkPlanExec` /
  * `QueryStageExec` leaves, so a naive walk over an executed AQE plan
  * misses everything inside the stages — exactly the scans and exchanges
  * the plan-shape specs need to assert on.
  */
object PlanWalk {

  /** Every node of the FINAL adaptive plan, stages and reused exchanges
    * included.
    */
  def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: allNodes(a.executedPlan)
    case s: QueryStageExec => p +: allNodes(s.plan)
    case r: ReusedExchangeExec => p +: allNodes(r.child)
    case _ => p +: p.children.flatMap(allNodes)
  }

  /** Like [[allNodes]], but does NOT descend through broadcast exchanges:
    * the nodes returned are the ones whose ROWS actually flow through the
    * subtree root. Use under a `ShuffleExchangeExec` to ask "what is being
    * shuffled here" — a scan sitting below a broadcast inside the subtree
    * is shipped as a broadcast variable, not moved by the shuffle.
    */
  def nonBroadcastNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
      Seq(b)
    case b: org.apache.spark.sql.execution.adaptive.BroadcastQueryStageExec =>
      Seq(b)
    case a: AdaptiveSparkPlanExec => p +: nonBroadcastNodes(a.executedPlan)
    case s: QueryStageExec => p +: nonBroadcastNodes(s.plan)
    case r: ReusedExchangeExec => p +: nonBroadcastNodes(r.child)
    case _ => p +: p.children.flatMap(nonBroadcastNodes)
  }

  /** Like [[allNodes]], but additionally descends into the BUILD plan of
    * every InMemoryRelation encountered — a persist()ed intermediate
    * hides its source scans inside the cache's own plan, and a spec
    * asserting scan properties (bucket pruning, pushed filters) of a
    * cached view must look there: those scans genuinely execute at first
    * materialization.
    */
  def allNodesThroughCaches(p: SparkPlan): Seq[SparkPlan] =
    allNodes(p).flatMap {
      case im: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        im +: allNodesThroughCaches(im.relation.cachedPlan)
      case n => Seq(n)
    }

  /** File scans whose root path contains `pathFragment`. */
  def scansOf(p: SparkPlan, pathFragment: String): Seq[FileSourceScanExec] =
    allNodes(p).collect {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(
          _.toString.contains(pathFragment)) => f
    }
}
