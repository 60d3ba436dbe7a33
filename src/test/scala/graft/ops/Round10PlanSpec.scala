package graft.ops

import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec
import graft.multimodal.Multimodal

/** Executed-plan assertions for the round-10 operators — each pins the
  * physical property its scaladoc claims, the same discipline
  * TrainingPipelineOpsSpec applies to t69/t71.
  */
class Round10PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("t99 plan: bad-words membership is a broadcast join, tokens never shuffle on the word") {
    val df = TextOps.t99BlocklistFilter(spark, sf)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"bad-words membership is not broadcast:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(w#") &&
      !plan.contains("Exchange hashpartitioning(bad_w"),
      s"token table shuffled on the word:\n$plan")
    CacheRegistry.harness.release()
  }

  test("t100 plan: the only per-doc rank window partitions by (source, bucket), never source alone") {
    val df = TextOps.t100SourceCap(spark, sf)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    // the boundary-bucket rank: row_number over (source, bucket)
    assert(plan.contains("windowspecdefinition(source"),
      s"no windowed stage found:\n$plan")
    // a windowspec partitioned by source ONLY (followed by the orderBy
    // spec, not a bucket column) would be the global per-source sort the
    // two-phase selection exists to avoid; every row_number spec must
    // carry the bucket in its partition keys
    val rankSpecs = "windowspecdefinition\\(source#\\d+[^)]*row_number".r
    val specs = "windowspecdefinition\\(source#\\d+, [a-z_]+#\\d+L?,"
      .r.findAllIn(plan).toList
    assert(specs.nonEmpty && specs.forall(_.contains("bucket")),
      s"rank window not (source, bucket)-partitioned: $specs\n")
    CacheRegistry.harness.release()
  }

  test("d98/d103 plans: candidate generation is equi-join, no cartesian product") {
    for (df <- Seq(Multimodal.d98ImageNearDup(spark, sf),
        Multimodal.d103VideoOverlap(spark, sf))) {
      df.count()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"near-dup candidates planned a cartesian product:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"near-dup candidates planned a nested-loop join:\n$plan")
      CacheRegistry.harness.release()
    }
  }

  test("d105 clusters: labels are component minima and csize is consistent") {
    val out = Multimodal.d105ImageClusters(spark, sf).persist()
    CacheRegistry.harness.add(out)
    // component label == min doc_id of the component
    val bad = out.groupBy("component")
      .agg(min("doc_id").as("mn"), count(lit(1)).as("n"))
      .filter(col("component") =!= col("mn"))
    assert(bad.count() == 0)
    // csize matches the actual component population; clusters are >= 2 docs
    val sz = out.groupBy("component").agg(count(lit(1)).as("n"))
    assert(out.join(sz, "component").filter(col("csize") =!= col("n"))
      .count() == 0)
    assert(out.filter(col("csize") < 2).count() == 0)
    // every clustered doc appears in the d98 pair set and vice versa
    val pairDocs = Multimodal.d98ImageNearDup(spark, sf)
      .select(col("d1").as("doc_id"))
      .unionByName(Multimodal.d98ImageNearDup(spark, sf)
        .select(col("d2").as("doc_id"))).distinct()
    assert(out.select("doc_id").exceptAll(pairDocs).count() == 0 &&
      pairDocs.exceptAll(out.select("doc_id")).count() == 0)
    CacheRegistry.harness.release()
  }
}
