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

  /** File scans whose root path contains `pathFragment`. */
  def scansOf(p: SparkPlan, pathFragment: String): Seq[FileSourceScanExec] =
    allNodes(p).collect {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(
          _.toString.contains(pathFragment)) => f
    }
}
