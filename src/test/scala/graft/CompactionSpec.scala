package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BaseJoinExec
import org.apache.spark.sql.functions._
import graft.betfair.{Fixtures, SparkSpec}
import graft.multimodal.Multimodal
import graft.ops.{CacheRegistry, TextOps, VectorOps}
import graft.streaming.StreamOps

/** The dedup-state compaction family (round 11): each streaming sink's
  * append-only `batch=N` layout compacts into its probe-optimal bucketed
  * serving layout — minhash (band,bkey), semantic cid, Hamming
  * (ahash + tb), clip-overlap fp. For each schema this spec proves
  * (a) the compacted state's probe output ≡ the in-memory incremental
  * probe over the same accumulated state, (b) the probe plan never
  * exchanges the state side and bucket-prunes the keyed scans, and
  * (c) latest-batch-wins: a replayed/re-delivered item collapses to its
  * newest row.
  */
class CompactionSpec extends SparkSpec {

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
      assert(side.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"state side re-shuffled:\n$side")
    }
  }

  private def assertPruned(df: DataFrame): Unit = {
    val scans = bucketedScans(df.queryExecution.executedPlan)
    assert(scans.exists(_.toString.contains("SelectedBucketsCount")),
      scans.map(_.toString).mkString("\n"))
  }

  /** The composite probes (hamming, frames) aggregate and expand on top of
    * the state scans, so some exchange of DERIVED rows (partial occupancy
    * counts, candidate pairs) is by design. The scale property to protect
    * is narrower: no exchange ever moves RAW state rows — every
    * ShuffleExchange input must be more than narrow ops over a bucketed
    * scan.
    */
  private def assertNoRawStateExchange(df: DataFrame): Unit = {
    import org.apache.spark.sql.execution.{ColumnarToRowExec, FilterExec,
      InputAdapter, ProjectExec, WholeStageCodegenExec}
    def narrowOverBucketedScan(p: SparkPlan): Boolean = p match {
      case f: FileSourceScanExec => f.bucketedScan
      case u: ProjectExec => narrowOverBucketedScan(u.child)
      case u: FilterExec => narrowOverBucketedScan(u.child)
      case u: InputAdapter => narrowOverBucketedScan(u.child)
      case u: WholeStageCodegenExec => narrowOverBucketedScan(u.child)
      case u: ColumnarToRowExec => narrowOverBucketedScan(u.child)
      case _ => false
    }
    val plan = df.queryExecution.executedPlan
    assert(bucketedScans(plan).nonEmpty, s"no bucketed scan in:\n$plan")
    val bad = plan.collect {
      case e: ShuffleExchangeExec if narrowOverBucketedScan(e.child) => e
    }
    assert(bad.isEmpty,
      s"raw state rows exchanged:\n${bad.mkString("\n")}")
  }

  private def sameSet(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0

  private def withProbeConfs(f: => Unit): Unit = {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
    }
  }

  test("minhash: compacted band state serves the batch=N probe verbatim") {
    val wh = Fixtures.tempDir("cmp-mh").toString
    spark.sql("DROP TABLE IF EXISTS g_cmp_band")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val evens = docs.filter(col("doc_id") % 2 === 0)
    val odds = docs.filter(col("doc_id") % 2 === 1)
    // sink layout: two micro-batches of the even half
    val sigs = TextOps.minhashSignaturesWithKeys(evens).persist()
    CacheRegistry.harness.add(sigs)
    sigs.filter(col("doc_id") % 4 === 0)
      .write.parquet(s"$wh/state/batch=0")
    sigs.filter(col("doc_id") % 4 === 2)
      .write.parquet(s"$wh/state/batch=1")
    StreamOps.compactMinhashState(spark, s"$wh/state", "g_cmp_band",
      s"$wh/g_cmp_band")
    withProbeConfs {
      val got = TextOps.probeBandBucketedState(spark, "g_cmp_band", odds)
      assertStateSideUnshuffled(got)
      val (_, expected) = TextOps.incrementalMinhashDedup(
        TextOps.minhashSignatures(evens), odds)
      assert(sameSet(got, expected))
    }
    CacheRegistry.harness.release()
    spark.sql("DROP TABLE IF EXISTS g_cmp_band")
  }

  test("semantic: compacted cid state serves the probe, pruned") {
    val wh = Fixtures.tempDir("cmp-sem").toString
    spark.sql("DROP TABLE IF EXISTS g_cmp_cid")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).persist()
    CacheRegistry.harness.add(emb)
    val evens = emb.filter(col("vec_id") % 2 === 0)
    val odds = emb.filter(col("vec_id") % 2 === 1)
    val codebook = CacheRegistry.harness.add(
      VectorOps.trainCodebook(spark, evens).persist())
    val a1 = CacheRegistry.harness.add(
      VectorOps.assignToCentroids(spark, evens, codebook).persist())
    val a2 = CacheRegistry.harness.add(
      VectorOps.assignToCentroids(spark, odds, codebook).persist())
    a1.filter(col("vec_id") % 4 === 0).write.parquet(s"$wh/state/batch=0")
    a1.filter(col("vec_id") % 4 === 2).write.parquet(s"$wh/state/batch=1")
    StreamOps.compactSemanticState(spark, s"$wh/state", "g_cmp_cid",
      s"$wh/g_cmp_cid")
    withProbeConfs {
      val got = VectorOps.probeCidBucketedState(spark, "g_cmp_cid", a2)
      assertStateSideUnshuffled(got)
      assertPruned(got)
      assert(sameSet(got, VectorOps.semanticPairs(spark, a1, a2)))
    }
    CacheRegistry.harness.release()
    spark.sql("DROP TABLE IF EXISTS g_cmp_cid")
  }

  test("hamming: compacted two-table state serves the probe; latest wins") {
    val wh = Fixtures.tempDir("cmp-ham").toString
    Seq("g_cmp_ham_m", "g_cmp_ham_b")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val ids = spark.read.parquet(s"$sf/documents.parquet").select("doc_id")
    val hashes = CacheRegistry.harness.add(
      Multimodal.aHash64(Multimodal.imageDedupPayload(ids))
        .filter(col("ahash").isNotNull).persist())
    val evens = hashes.filter(col("doc_id") % 2 === 0)
    val odds = hashes.filter(col("doc_id") % 2 === 1)
    // batch 0 delivers doc 0 with a WRONG hash; batch 1 re-delivers the
    // even half (including doc 0's true hash) — latest must win
    evens.withColumn("ahash",
        when(col("doc_id") === 0, lit(-1L)).otherwise(col("ahash")))
      .write.parquet(s"$wh/state/batch=0")
    evens.write.parquet(s"$wh/state/batch=1")
    StreamOps.compactHammingState(spark, s"$wh/state",
      "g_cmp_ham_m", s"$wh/g_cmp_ham_m", "g_cmp_ham_b", s"$wh/g_cmp_ham_b")
    // latest-batch-wins + one row per doc
    val m = spark.table("g_cmp_ham_m")
    assert(m.count() == evens.count())
    val trueHash0 = evens.filter(col("doc_id") === 0)
      .head().getLong(1)
    assert(m.filter(col("doc_id") === 0).head().getLong(1) == trueHash0)
    withProbeConfs {
      val got = Multimodal.probeHammingBucketedState(spark,
        "g_cmp_ham_m", "g_cmp_ham_b", odds)
      assertNoRawStateExchange(got)
      assertPruned(got)
      assert(sameSet(got, Multimodal.incrementalHammingPairs(evens, odds)))
    }
    CacheRegistry.harness.release()
    Seq("g_cmp_ham_m", "g_cmp_ham_b")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("frames: compacted fp state serves the containment probe") {
    val wh = Fixtures.tempDir("cmp-fr").toString
    spark.sql("DROP TABLE IF EXISTS g_cmp_fp")
    // synthetic clips: 100 docs in 5 classes, shifted windows over a
    // shared class stream (the d103 model at spec scale)
    val frames = CacheRegistry.harness.add(spark.range(100)
      .select(col("id").as("doc_id"),
        explode(transform(
          sequence((col("id") % 5) * lit(0) + (expr("id div 5") % 3) * 4,
            (expr("id div 5") % 3) * 4 + 15),
          k => md5(concat((col("id") % 5).cast("string"), lit(":"),
            k.cast("string"))))).as("fp")).persist())
    val evens = frames.filter(col("doc_id") % 2 === 0)
    val odds = frames.filter(col("doc_id") % 2 === 1)
    // doc 0's frames delivered in batches 0 AND 1 (a replay) — the
    // compacted state must hold them once, with the right size
    evens.write.parquet(s"$wh/state/batch=0")
    evens.filter(col("doc_id") === 0).write.parquet(s"$wh/state/batch=1")
    StreamOps.compactFrameState(spark, s"$wh/state", "g_cmp_fp",
      s"$wh/g_cmp_fp")
    val st = spark.table("g_cmp_fp")
    assert(st.filter(col("doc_id") === 0).count() == 16)
    assert(st.filter(col("doc_id") === 0).agg(max("sz")).head().getLong(0)
      == 16)
    withProbeConfs {
      val got = Multimodal.probeFrameBucketedState(spark, "g_cmp_fp", odds)
      assertNoRawStateExchange(got)
      assertPruned(got)
      assert(sameSet(got, Multimodal.incrementalClipPairs(evens, odds)))
    }
    CacheRegistry.harness.release()
    spark.sql("DROP TABLE IF EXISTS g_cmp_fp")
  }
}
