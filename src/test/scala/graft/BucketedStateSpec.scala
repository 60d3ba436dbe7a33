package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BaseJoinExec
import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec
import graft.ops.{CacheRegistry, TextOps, VectorOps}

/** The bucketed state layout for incremental/streaming dedup state: the
  * accumulated side of the per-batch probe join must arrive
  * pre-partitioned (no Exchange of corpus-scale state per batch), and the
  * semantic state scan must bucket-prune to the batch's touched clusters.
  * Proves the plan properties [[TextOps.probeBandBucketedState]] and
  * [[VectorOps.probeCidBucketedState]] claim, plus output identity with
  * the unbucketed probes.
  */
class BucketedStateSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def bucketedScans(p: SparkPlan): Seq[FileSourceScanExec] =
    p.collect { case f: FileSourceScanExec if f.bucketedScan => f }

  /** Joins whose one child subtree holds the bucketed state scan; assert
    * that subtree has no shuffle.
    */
  private def assertStateSideUnshuffled(df: DataFrame): Unit = {
    val plan = df.queryExecution.executedPlan
    val joins = plan.collect { case j: BaseJoinExec => j }
    val stateJoins = joins.filter(_.children.exists(bucketedScans(_).nonEmpty))
    assert(stateJoins.nonEmpty,
      s"no join reads the bucketed state:\n$plan")
    stateJoins.foreach { j =>
      val side = j.children.find(bucketedScans(_).nonEmpty).get
      val shuffles = side.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        s"state side re-shuffled:\n$side")
    }
  }

  private def withProbeConfs(f: => Unit): Unit = {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    // static plans for tree assertions; no broadcast so the probe join
    // actually exercises the co-partitioned path it would take at scale
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
    }
  }

  private def sameSet(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0

  test("minhash band state: probe join never exchanges the bucketed state") {
    val wh = betfair.Fixtures.tempDir("bandstate")
    spark.sql("DROP TABLE IF EXISTS g_band_state")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val evens = docs.filter(col("doc_id") % 2 === 0)
    val odds = docs.filter(col("doc_id") % 2 === 1)
    TextOps.writeBandBucketedState(TextOps.minhashSignaturesWithKeys(evens),
      "g_band_state", s"$wh/g_band_state")
    withProbeConfs {
      val pairs = TextOps.probeBandBucketedState(spark, "g_band_state", odds)
      assertStateSideUnshuffled(pairs)
      // output identity with the unbucketed incremental probe (batch 2 of
      // the d84 flow: evens accumulated, odds probing)
      val (_, expected) = TextOps.incrementalMinhashDedup(
        TextOps.minhashSignatures(evens), odds)
      assert(sameSet(pairs, expected))
    }
    CacheRegistry.harness.release()
    spark.sql("DROP TABLE IF EXISTS g_band_state")
  }

  test("semantic cid state: probe is exchange-free AND bucket-pruned") {
    val wh = betfair.Fixtures.tempDir("cidstate")
    spark.sql("DROP TABLE IF EXISTS g_cid_state")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).persist()
    CacheRegistry.harness.add(emb)
    val evens = emb.filter(col("vec_id") % 2 === 0)
    val odds = emb.filter(col("vec_id") % 2 === 1)
    val codebook = VectorOps.trainCodebook(spark, evens).persist()
    CacheRegistry.harness.add(codebook)
    val a1 = VectorOps.assignToCentroids(spark, evens, codebook).persist()
    CacheRegistry.harness.add(a1)
    val a2 = VectorOps.assignToCentroids(spark, odds, codebook).persist()
    CacheRegistry.harness.add(a2)
    VectorOps.writeCidBucketedState(a1, "g_cid_state", s"$wh/g_cid_state")
    withProbeConfs {
      val pairs = VectorOps.probeCidBucketedState(spark, "g_cid_state", a2)
      assertStateSideUnshuffled(pairs)
      // cluster pruning reached the scan: the literal cid filter lets the
      // planner select only the touched clusters' buckets
      val scans = bucketedScans(pairs.queryExecution.executedPlan)
      assert(scans.exists(_.toString.contains("SelectedBucketsCount")),
        scans.map(_.toString).mkString("\n"))
      // output identity with the plain in-memory prior
      val expected = VectorOps.semanticPairs(spark, a1, a2)
      assert(sameSet(pairs, expected))
    }
    CacheRegistry.harness.release()
    spark.sql("DROP TABLE IF EXISTS g_cid_state")
  }

  test("ivf index state: query probe is exchange-free AND bucket-pruned") {
    val wh = betfair.Fixtures.tempDir("ivfstate")
    spark.sql("DROP TABLE IF EXISTS g_ivf_state")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding")).persist()
    CacheRegistry.harness.add(emb)
    val evens = emb.filter(col("vec_id") % 2 === 0)
    val odds = emb.filter(col("vec_id") % 2 === 1)
    // frozen quantizer trained on batch 1 (the v120 contract)
    val cent = VectorOps.ivfCodebookOn(evens).persist()
    CacheRegistry.harness.add(cent)
    val a1 = VectorOps.assignToIvfLists(spark, evens, cent).persist()
    CacheRegistry.harness.add(a1)
    val a2 = VectorOps.assignToIvfLists(spark, odds, cent).persist()
    CacheRegistry.harness.add(a2)
    // two ingest batches appended to the clabel-bucketed index
    VectorOps.writeIvfBucketedState(a1, "g_ivf_state", s"$wh/g_ivf_state")
    VectorOps.writeIvfBucketedState(a2, "g_ivf_state", s"$wh/g_ivf_state")
    val probes = VectorOps
      .ivfQueryProbes(spark, emb.filter(col("vec_id") < 10), cent).persist()
    CacheRegistry.harness.add(probes)
    withProbeConfs {
      val cands = VectorOps.probeIvfBucketedState(spark, "g_ivf_state", probes)
      assertStateSideUnshuffled(cands)
      // list pruning reached the scan: the literal clabel filter lets the
      // planner select only the probed lists' buckets
      val scans = bucketedScans(cands.queryExecution.executedPlan)
      assert(scans.exists(_.toString.contains("SelectedBucketsCount")),
        scans.map(_.toString).mkString("\n"))
      // output identity with the in-memory probe path
      val expected = VectorOps.ivfProbeCandidates(spark,
        a1.unionByName(a2), probes)
      assert(sameSet(cands, expected))
    }
    CacheRegistry.harness.release()
    spark.sql("DROP TABLE IF EXISTS g_ivf_state")
  }
}
