package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** The filtered combined index (v142) and filtered re-rank (v143): the
  * serve-time metadata predicate on the index a deployment actually runs
  * (v133's residual IVFADC). Pins the properties that make it the right
  * 100 TB shape:
  *
  *  - the predicate never perturbs a score — filtered ADC == unfiltered
  *    ADC restricted to attribute-matching neighbors;
  *  - k fills exactly from FILTERED candidates, and every served row
  *    matches the predicate (a post-top-k filter would under-fill);
  *  - v143 filters in STAGE 1, so its shortlist is attribute-pure and
  *    the exact re-rank never discards;
  *  - on the clabel-bucketed serving layout, an ingest-materialized
  *    attribute pushes into the parquet scan (PushedFilters) and
  *    composes with bucket pruning (SelectedBucketsCount), no state-side
  *    exchange, and with the serve-time tombstone heal.
  */
class FilteredIvfPqSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def bucketedScans(p: SparkPlan): Seq[FileSourceScanExec] =
    p.collect { case f: FileSourceScanExec if f.bucketedScan => f }

  private def sameSet(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0

  private def labelsOf(out: DataFrame): DataFrame = {
    val lab = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").as("neighbor_id"), col("label"))
    out.join(lab, Seq("neighbor_id"))
  }

  test("v142: exact-k fill and every served neighbor matches the filter") {
    val out = CacheRegistry.harness.add(
      VectorOps.v142FilteredIvfPq(spark, sf).persist())
    val perQuery = out.groupBy("query_id").count().collect()
    assert(perQuery.length == 5 && perQuery.forall(_.getLong(1) == 3L),
      perQuery.mkString(","))
    assert(labelsOf(out).filter(col("label") % 2 =!= 0).count() == 0,
      "a served neighbor violates the predicate")
    CacheRegistry.harness.release()
  }

  test("v142: the filter restricts, never perturbs — filtered scores == " +
      "unfiltered scores on matching neighbors") {
    val filtered = VectorOps.ivfPqResidualCands(spark, sf,
      col("label") % 2 === 0)
    val evenIds = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("label") % 2 === 0)
      .select(col("vec_id").as("neighbor_id"))
    val restricted = VectorOps.ivfPqResidualCands(spark, sf)
      .join(evenIds, Seq("neighbor_id"), "left_semi")
      .select("query_id", "neighbor_id", "sim")
    assert(sameSet(filtered.select("query_id", "neighbor_id", "sim"),
      restricted))
    CacheRegistry.harness.release()
  }

  test("v143: stage-1 filter — attribute-pure exact-scored top-k that a " +
      "post-re-rank filter could not serve") {
    val out = CacheRegistry.harness.add(
      VectorOps.v143FilteredRerank(spark, sf).persist())
    val perQuery = out.groupBy("query_id").count().collect()
    assert(perQuery.length == 5 && perQuery.forall(_.getLong(1) == 3L),
      perQuery.mkString(","))
    assert(labelsOf(out).filter(col("label") % 2 =!= 0).count() == 0)
    // filtering AFTER the re-rank demonstrably differs: v134's served
    // top-3 contains odd-label neighbors on this corpus, so post-filtering
    // it under-fills at least one query
    val post = labelsOf(VectorOps.v134IvfPqRerank(spark, sf))
      .filter(col("label") % 2 === 0)
      .groupBy("query_id").count()
    assert(post.filter(col("count") < 3).count() > 0 ||
      post.count() < 5,
      "corpus regression: post-re-rank filtering no longer under-fills — " +
        "pick a sharper predicate for the spec")
    CacheRegistry.harness.release()
  }

  test("filtered serving probe: pushed filter + bucket pruning + no state" +
      " exchange + tombstone composition") {
    val wh = graft.betfair.Fixtures.tempDir("fivfpq")
    spark.sql("DROP TABLE IF EXISTS g_fivfpq_state")
    val emb = CacheRegistry.harness.add(
      spark.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id"), col("label"), col("embedding"))
        // ingest-materialized pushable attribute (the FilteredAnnSpec
        // convention): parity as a plain int column
        .withColumn("parity", (col("label") % 2).cast("int")).persist())
    val cent = CacheRegistry.harness.add(VectorOps.ivfCodebookOn(emb)
      .persist())
    val assigned = VectorOps.assignToIvfLists(spark, emb, cent,
      carry = Seq("parity"))
    val subs = CacheRegistry.harness.add(VectorOps.pqSubvectors(
      VectorOps.residualOf(assigned, cent, carry = Seq("parity")),
      carry = Seq("clabel", "parity")).persist())
    val cb = CacheRegistry.harness.add(VectorOps.trainPqCodebooksOn(spark,
      subs, col("vec_id") < VectorOps.PqK).persist())
    val codes = CacheRegistry.harness.add(VectorOps.encodePq(spark, subs,
      cb, carry = Seq("clabel", "parity")).persist())
    val probes = CacheRegistry.harness.add(VectorOps.ivfQueryProbes(spark,
      emb.filter(col("vec_id") < 5), cent).persist())
    val lut = CacheRegistry.harness.add(
      VectorOps.residualLut(spark, probes, cent, cb).persist())
    VectorOps.writeIvfPqBucketedState(codes, "g_fivfpq_state",
      s"$wh/g_fivfpq_state")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val cands = VectorOps.probeIvfPqResidualState(spark, "g_fivfpq_state",
        lut, pred = col("parity") === 0)
      val scans = bucketedScans(cands.queryExecution.executedPlan)
      assert(scans.nonEmpty, "no bucketed scan in the filtered probe")
      // the attribute predicate reached the parquet scan, alongside the
      // probed-list bucket pruning
      assert(scans.exists(sc => sc.toString.contains("PushedFilters") &&
        sc.toString.contains("parity") &&
        sc.toString.contains("SelectedBucketsCount")),
        scans.map(_.toString).mkString("\n"))
      // no state-side exchange below the score join (the IvfPqSpec
      // contract: the bucketed-scan child of the join is shuffle-free —
      // the aggregation above the join may exchange, the state may not)
      val joins = cands.queryExecution.executedPlan.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec
          if j.children.exists(bucketedScans(_).nonEmpty) => j
      }
      assert(joins.nonEmpty, "no join reads the bucketed state")
      joins.foreach { j =>
        val side = j.children.find(bucketedScans(_).nonEmpty).get
        assert(side.collect { case e: ShuffleExchangeExec => e }.isEmpty,
          s"state side re-shuffled:\n$side")
      }
      // identity with the in-memory filtered scan
      assert(sameSet(cands, VectorOps.listLutAdcScore(
        codes.filter(col("parity") === 0), lut)))
      // composes with the serve-time tombstone heal
      val dead = codes.select("vec_id").distinct()
        .filter(col("vec_id") % 7 === 3)
      val healed = VectorOps.probeIvfPqResidualState(spark,
        "g_fivfpq_state", lut, tombstones = Some(dead),
        pred = col("parity") === 0)
      val expected = VectorOps.listLutAdcScore(
        codes.filter(col("parity") === 0)
          .join(dead, Seq("vec_id"), "left_anti"), lut)
      assert(sameSet(healed, expected))
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
    CacheRegistry.harness.release()
    spark.sql("DROP TABLE IF EXISTS g_fivfpq_state")
  }
}
