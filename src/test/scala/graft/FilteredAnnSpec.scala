package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BaseJoinExec
import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec
import graft.ops.{CacheRegistry, VectorOps}

/** v122 filtered ANN, serving-layout edition: the metadata predicate must
  * run INSIDE the probe — on the bucketed index scan, below the score
  * join and the rank — so that (a) it composes with clabel bucket pruning,
  * (b) an ingest-materialized attribute column pushes into the parquet
  * scan (PushedFilters), and (c) top-k fills to exactly k from FILTERED
  * candidates wherever the filtered lists allow (a post-top-k filter
  * would under-fill).
  */
class FilteredAnnSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def bucketedScans(p: SparkPlan): Seq[FileSourceScanExec] =
    p.collect { case f: FileSourceScanExec if f.bucketedScan => f }

  test("filtered probe: pushed filter + bucket pruning + no state exchange" +
      " + exact k") {
    val wh = betfair.Fixtures.tempDir("fann")
    spark.sql("DROP TABLE IF EXISTS g_fann_state")
    val emb = CacheRegistry.harness.add(
      spark.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id"), col("label"), col("embedding"))
        // the serve-time attribute, materialized at ingest as a plain
        // column (parity of the label) so the predicate is a pushable
        // equality rather than in-plan arithmetic
        .withColumn("parity", (col("label") % 2).cast("int")).persist())
    val cent = CacheRegistry.harness.add(VectorOps.ivfCodebookOn(emb)
      .persist())
    val assigned = CacheRegistry.harness.add(
      VectorOps.assignToIvfLists(spark, emb, cent,
        carry = Seq("label", "parity")).persist())
    VectorOps.writeIvfBucketedState(assigned, "g_fann_state",
      s"$wh/g_fann_state")
    val probes = CacheRegistry.harness.add(VectorOps.ivfQueryProbes(spark,
      emb.filter(col("vec_id") < 10), cent).persist())

    val aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val cands = VectorOps.probeIvfBucketedState(spark, "g_fann_state",
        probes, pred = col("parity") === 0)
      val plan = cands.queryExecution.executedPlan
      val scans = bucketedScans(plan)
      // (a) bucket pruning from the probed-list literals
      assert(scans.exists(_.toString.contains("SelectedBucketsCount")),
        scans.map(_.toString).mkString("\n"))
      // (b) the attribute predicate reached the parquet scan
      assert(scans.exists(s =>
        s.toString.contains("PushedFilters") &&
          s.toString.contains("EqualTo(parity,0)")),
        scans.map(_.toString).mkString("\n"))
      // (c) the state side of the score join is never exchanged
      val joins = plan.collect { case j: BaseJoinExec => j }
      val stateJoins =
        joins.filter(_.children.exists(bucketedScans(_).nonEmpty))
      assert(stateJoins.nonEmpty, s"no join reads the bucketed state:\n$plan")
      stateJoins.foreach { j =>
        val side = j.children.find(bucketedScans(_).nonEmpty).get
        assert(side.collect { case e: ShuffleExchangeExec => e }.isEmpty,
          s"state side re-shuffled:\n$side")
      }
      // output identity with the in-plan filtered path
      val expected = VectorOps.ivfProbeCandidates(spark,
        assigned.filter(col("parity") === 0), probes)
      assert(cands.exceptAll(expected).count() == 0 &&
        expected.exceptAll(cands).count() == 0)
      // exact k wherever the filtered probed lists hold >= k candidates
      val k = 3
      val topk = VectorOps.ivfTopK(cands, k)
      val candCounts = cands.groupBy("query_id")
        .agg(count(lit(1)).as("n")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val served = topk.groupBy("query_id")
        .agg(count(lit(1)).as("n")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      candCounts.foreach { case (q, n) =>
        assert(served(q) == math.min(n, k.toLong),
          s"query $q: ${served(q)} served of $n filtered candidates")
      }
      assert(candCounts.values.exists(_ >= k),
        "fixture too small: no query has a full filtered top-k")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
      CacheRegistry.harness.release()
      spark.sql("DROP TABLE IF EXISTS g_fann_state")
    }
  }
}
