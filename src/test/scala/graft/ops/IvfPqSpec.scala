package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BaseJoinExec
import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** The combined IVF+PQ index (v132): coarse pruning decides WHICH code
  * rows a query touches, PQ decides WHAT a code row stores. The spec pins
  * the three properties that make it the 100 TB layout:
  *
  *  - soundness: a served neighbor always lies in one of its query's
  *    probed lists, and k fills exactly (the probed lists hold far more
  *    than k candidates on the driver tables);
  *  - the pruned ADC is EXACTLY the full-corpus ADC restricted to
  *    probed-list members — pruning never invents or perturbs a score,
  *    it only skips rows that could not have been candidates;
  *  - on the clabel-bucketed serving layout the probe reads only the
  *    probed lists' buckets (SelectedBucketsCount), never exchanges the
  *    state side, and serves the in-memory answer — with the v130
  *    tombstone heal available at serve time.
  */
class IvfPqSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def bucketedScans(p: SparkPlan): Seq[FileSourceScanExec] =
    p.collect { case f: FileSourceScanExec if f.bucketedScan => f }

  private def assertStateSideUnshuffled(df: DataFrame): Unit = {
    val plan = df.queryExecution.executedPlan
    val joins = plan.collect { case j: BaseJoinExec => j }
    val stateJoins = joins.filter(_.children.exists(bucketedScans(_).nonEmpty))
    assert(stateJoins.nonEmpty, s"no join reads the bucketed state:\n$plan")
    stateJoins.foreach { j =>
      val side = j.children.find(bucketedScans(_).nonEmpty).get
      val shuffles = side.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty, s"state side re-shuffled:\n$side")
    }
  }

  private def sameSet(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0

  private def fixture() = {
    val emb = CacheRegistry.harness.add(
      spark.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id"), col("label"), col("embedding")).persist())
    val cent = CacheRegistry.harness.add(
      VectorOps.ivfCodebookOn(emb).persist())
    val assigned = CacheRegistry.harness.add(
      VectorOps.assignToIvfLists(spark, emb, cent).persist())
    val subs = CacheRegistry.harness.add(
      VectorOps.pqSubvectors(assigned, carry = Seq("clabel")).persist())
    val cb = CacheRegistry.harness.add(
      VectorOps.trainPqCodebooksOn(spark, subs,
        col("vec_id") < VectorOps.PqK).persist())
    val codes = CacheRegistry.harness.add(
      VectorOps.encodePq(spark, subs, cb, carry = Seq("clabel")).persist())
    val probes = CacheRegistry.harness.add(VectorOps.ivfQueryProbes(spark,
      emb.filter(col("vec_id") < 5), cent).persist())
    (emb, cent, assigned, subs, cb, codes, probes)
  }

  test("v132: served neighbors lie in probed lists; exact-k fill") {
    val (_, _, assigned, _, _, _, probes) = fixture()
    val out = VectorOps.v132IvfPq(spark, sf).persist()
    CacheRegistry.harness.add(out)
    val perQuery = out.groupBy("query_id").count().collect()
    assert(perQuery.length == 5 && perQuery.forall(_.getLong(1) == 3L),
      perQuery.mkString(","))
    // soundness: every (query, neighbor) is a probed-list membership fact
    val member = assigned.select(col("vec_id").as("neighbor_id"),
      col("clabel"))
    val outside = out.join(member, Seq("neighbor_id"))
      .join(probes.select("query_id", "clabel"),
        Seq("query_id", "clabel"), "left_anti")
    assert(outside.count() == 0)
    CacheRegistry.harness.release()
  }

  test("v132: pruned ADC == full ADC restricted to probed-list members") {
    val (_, _, assigned, subs, cb, codes, probes) = fixture()
    val querySubs = subs.filter(col("vec_id") < 5)
    val pruned = VectorOps.ivfPqAdcScore(spark, codes, querySubs, cb, probes)
    val member = assigned.select(col("vec_id").as("neighbor_id"),
      col("clabel"))
    val expected = VectorOps.pqAdcScore(spark, codes, querySubs, cb)
      .join(member, Seq("neighbor_id"))
      .join(probes.select("query_id", "clabel"),
        Seq("query_id", "clabel"), "left_semi")
      .select("query_id", "neighbor_id", "sim")
    assert(sameSet(pruned.select("query_id", "neighbor_id", "sim"), expected))
    CacheRegistry.harness.release()
  }

  test("bucketed code table: pruned, exchange-free, tombstone-healable") {
    val wh = graft.betfair.Fixtures.tempDir("ivfpqstate")
    spark.sql("DROP TABLE IF EXISTS g_ivfpq_state")
    val (_, _, _, subs, cb, codes, probes) = fixture()
    val querySubs = CacheRegistry.harness.add(
      subs.filter(col("vec_id") < 5).persist())
    // two ingest appends (the batch-accumulation contract)
    VectorOps.writeIvfPqBucketedState(codes.filter(col("vec_id") % 2 === 0),
      "g_ivfpq_state", s"$wh/g_ivfpq_state")
    VectorOps.writeIvfPqBucketedState(codes.filter(col("vec_id") % 2 === 1),
      "g_ivfpq_state", s"$wh/g_ivfpq_state")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val cands = VectorOps.probeIvfPqBucketedState(spark, "g_ivfpq_state",
        querySubs, cb, probes)
      assertStateSideUnshuffled(cands)
      // list pruning reached the scan: the literal clabel filter lets the
      // planner select only the probed lists' buckets
      val scans = bucketedScans(cands.queryExecution.executedPlan)
      assert(scans.exists(_.toString.contains("SelectedBucketsCount")),
        scans.map(_.toString).mkString("\n"))
      // output identity with the in-memory scan
      assert(sameSet(cands,
        VectorOps.ivfPqAdcScore(spark, codes, querySubs, cb, probes)))
      // serve-time tombstone heal: deleted vec_ids vanish, nothing else
      val dead = codes.select("vec_id").distinct()
        .filter(col("vec_id") % 7 === 3)
      val healed = VectorOps.probeIvfPqBucketedState(spark, "g_ivfpq_state",
        querySubs, cb, probes, tombstones = Some(dead))
      val expectedHealed = VectorOps.ivfPqAdcScore(spark,
        codes.join(dead, Seq("vec_id"), "left_anti"), querySubs, cb, probes)
      assert(sameSet(healed, expectedHealed))
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
    CacheRegistry.harness.release()
    spark.sql("DROP TABLE IF EXISTS g_ivfpq_state")
  }
}
