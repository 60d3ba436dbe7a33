package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.betfair.{Fixtures, SparkSpec}
import graft.multimodal.Multimodal
import graft.ops.{CacheRegistry, TextOps, VectorOps}
import graft.streaming.StreamOps

/** Round-12 lifecycle hardening — makes `StreamOps.tombstoneStream`'s
  * documented contract physically true and proves it per state schema:
  *
  *  1. tombstone → compact → probe ≡ the survivor-only probe: every
  *     compaction job compacts from the tombstone-healed view, so a
  *     deleted id never reaches a serving layout and cannot be
  *     resurrected by maintenance;
  *  2. compactions are full rewrites: a re-run REPLACES the serving
  *     tables (the round-11 append mode silently doubled member rows and
  *     — for the Hamming layout — occupancy counts);
  *  3. deletes that arrive BETWEEN compactions are served through each
  *     probe's `tombstones` parameter (a broadcast anti-join on the
  *     pruned state side, below the pair/score join).
  */
class TombstoneCompactionSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def sameSet(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0

  test("minhash: tombstone → compact → probe ≡ survivor-only; " +
      "re-run replaces") {
    val wh = Fixtures.tempDir("tmb-mh").toString
    spark.sql("DROP TABLE IF EXISTS g_tmb_band")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val evens = docs.filter(col("doc_id") % 2 === 0)
    val odds = docs.filter(col("doc_id") % 2 === 1)
    TextOps.minhashSignaturesWithKeys(evens)
      .write.parquet(s"$wh/state/batch=0")
    val dels = evens.filter(col("doc_id") % 3 === 0).select("doc_id")
    dels.write.parquet(s"$wh/state.tombstones/batch=0")
    StreamOps.compactMinhashState(spark, s"$wh/state", "g_tmb_band",
      s"$wh/g_tmb_band")
    assert(spark.table("g_tmb_band")
      .join(dels, Seq("doc_id"), "left_semi").count() == 0,
      "a tombstoned doc reached the serving state")
    val n1 = spark.table("g_tmb_band").count()
    StreamOps.compactMinhashState(spark, s"$wh/state", "g_tmb_band",
      s"$wh/g_tmb_band")
    assert(spark.table("g_tmb_band").count() == n1,
      "re-running the compaction doubled the serving state")
    val got = TextOps.probeBandBucketedState(spark, "g_tmb_band", odds)
    val (_, expected) = TextOps.incrementalMinhashDedup(
      TextOps.minhashSignatures(
        evens.join(dels, Seq("doc_id"), "left_anti")), odds)
    assert(sameSet(got, expected))
    CacheRegistry.harness.release()
    spark.sql("DROP TABLE IF EXISTS g_tmb_band")
  }

  test("semantic: tombstone → compact → probe ≡ survivor-only; " +
      "post-compaction deletes via the tombstones param") {
    val wh = Fixtures.tempDir("tmb-sem").toString
    spark.sql("DROP TABLE IF EXISTS g_tmb_cid")
    val emb = CacheRegistry.harness.add(
      spark.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id"), col("embedding")).persist())
    val evens = emb.filter(col("vec_id") % 2 === 0)
    val odds = emb.filter(col("vec_id") % 2 === 1)
    val codebook = CacheRegistry.harness.add(
      VectorOps.trainCodebook(spark, evens).persist())
    val a1 = CacheRegistry.harness.add(
      VectorOps.assignToCentroids(spark, evens, codebook).persist())
    val a2 = CacheRegistry.harness.add(
      VectorOps.assignToCentroids(spark, odds, codebook).persist())
    a1.write.parquet(s"$wh/state/batch=0")
    val dels = a1.filter(col("vec_id") % 3 === 0).select("vec_id")
    dels.write.parquet(s"$wh/state.tombstones/batch=0")
    StreamOps.compactSemanticState(spark, s"$wh/state", "g_tmb_cid",
      s"$wh/g_tmb_cid")
    assert(spark.table("g_tmb_cid")
      .join(dels, Seq("vec_id"), "left_semi").count() == 0)
    val n1 = spark.table("g_tmb_cid").count()
    StreamOps.compactSemanticState(spark, s"$wh/state", "g_tmb_cid",
      s"$wh/g_tmb_cid")
    assert(spark.table("g_tmb_cid").count() == n1)
    val live1 = a1.join(dels, Seq("vec_id"), "left_anti")
    assert(sameSet(
      VectorOps.probeCidBucketedState(spark, "g_tmb_cid", a2),
      VectorOps.semanticPairs(spark, live1, a2)))
    // a second delete wave lands AFTER the compaction — the probe's
    // tombstones view must serve survivor-only pairs until the next
    // maintenance run applies it physically
    val dels2 = a1.filter(col("vec_id") % 5 === 1).select("vec_id")
    assert(sameSet(
      VectorOps.probeCidBucketedState(spark, "g_tmb_cid", a2, Some(dels2)),
      VectorOps.semanticPairs(spark,
        live1.join(dels2, Seq("vec_id"), "left_anti"), a2)))
    CacheRegistry.harness.release()
    spark.sql("DROP TABLE IF EXISTS g_tmb_cid")
  }

  test("hamming: tombstone → compact → probe ≡ survivor-only; " +
      "occupancy cannot double; tombstones param heals the member reads") {
    val wh = Fixtures.tempDir("tmb-ham").toString
    Seq("g_tmb_ham_m", "g_tmb_ham_b")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val ids = spark.read.parquet(s"$sf/documents.parquet").select("doc_id")
    val hashes = CacheRegistry.harness.add(
      Multimodal.aHash64(Multimodal.imageDedupPayload(ids))
        .filter(col("ahash").isNotNull).persist())
    val evens = hashes.filter(col("doc_id") % 2 === 0)
    val odds = hashes.filter(col("doc_id") % 2 === 1)
    evens.write.parquet(s"$wh/state/batch=0")
    val dels = evens.filter(col("doc_id") % 7 === 3).select("doc_id")
    dels.write.parquet(s"$wh/state.tombstones/batch=0")
    StreamOps.compactHammingState(spark, s"$wh/state",
      "g_tmb_ham_m", s"$wh/m", "g_tmb_ham_b", s"$wh/b")
    assert(spark.table("g_tmb_ham_m")
      .join(dels, Seq("doc_id"), "left_semi").count() == 0)
    val (m1, b1) = (spark.table("g_tmb_ham_m").count(),
      spark.table("g_tmb_ham_b").count())
    // the round-11 append mode doubled BOTH tables here — doubled bucket
    // rows also doubled probe-side occupancy counts (spurious hot cells)
    StreamOps.compactHammingState(spark, s"$wh/state",
      "g_tmb_ham_m", s"$wh/m", "g_tmb_ham_b", s"$wh/b")
    assert(spark.table("g_tmb_ham_m").count() == m1 &&
      spark.table("g_tmb_ham_b").count() == b1,
      "re-running the compaction doubled member/occupancy state")
    val live1 = evens.join(dels, Seq("doc_id"), "left_anti")
    assert(sameSet(
      Multimodal.probeHammingBucketedState(spark,
        "g_tmb_ham_m", "g_tmb_ham_b", odds),
      Multimodal.incrementalHammingPairs(live1, odds)))
    val dels2 = evens.filter(col("doc_id") % 11 === 5).select("doc_id")
    assert(sameSet(
      Multimodal.probeHammingBucketedState(spark,
        "g_tmb_ham_m", "g_tmb_ham_b", odds, tombstones = Some(dels2)),
      Multimodal.incrementalHammingPairs(
        live1.join(dels2, Seq("doc_id"), "left_anti"), odds)))
    CacheRegistry.harness.release()
    Seq("g_tmb_ham_m", "g_tmb_ham_b")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("frames: tombstone → compact → probe ≡ survivor-only") {
    val wh = Fixtures.tempDir("tmb-fr").toString
    spark.sql("DROP TABLE IF EXISTS g_tmb_fp")
    val frames = CacheRegistry.harness.add(spark.range(100)
      .select(col("id").as("doc_id"),
        explode(transform(
          sequence((expr("id div 5") % 3) * 4,
            (expr("id div 5") % 3) * 4 + 15),
          k => md5(concat((col("id") % 5).cast("string"), lit(":"),
            k.cast("string"))))).as("fp")).persist())
    val evens = frames.filter(col("doc_id") % 2 === 0)
    val odds = frames.filter(col("doc_id") % 2 === 1)
    evens.write.parquet(s"$wh/state/batch=0")
    val dels = evens.select("doc_id").distinct()
      .filter(col("doc_id") % 5 === 0)
    dels.write.parquet(s"$wh/state.tombstones/batch=0")
    StreamOps.compactFrameState(spark, s"$wh/state", "g_tmb_fp",
      s"$wh/g_tmb_fp")
    assert(spark.table("g_tmb_fp")
      .join(dels, Seq("doc_id"), "left_semi").count() == 0)
    val n1 = spark.table("g_tmb_fp").count()
    StreamOps.compactFrameState(spark, s"$wh/state", "g_tmb_fp",
      s"$wh/g_tmb_fp")
    assert(spark.table("g_tmb_fp").count() == n1)
    val live1 = evens.join(dels, Seq("doc_id"), "left_anti")
    assert(sameSet(
      Multimodal.probeFrameBucketedState(spark, "g_tmb_fp", odds),
      Multimodal.incrementalClipPairs(live1, odds)))
    val dels2 = evens.select("doc_id").distinct()
      .filter(col("doc_id") % 7 === 2)
    assert(sameSet(
      Multimodal.probeFrameBucketedState(spark, "g_tmb_fp", odds,
        tombstones = Some(dels2)),
      Multimodal.incrementalClipPairs(
        live1.join(dels2, Seq("doc_id"), "left_anti"), odds)))
    CacheRegistry.harness.release()
    spark.sql("DROP TABLE IF EXISTS g_tmb_fp")
  }

  test("ann: deleted vec_ids leave BOTH query paths — the raw batch=N " +
      "read and the compacted serving index") {
    val wh = Fixtures.tempDir("tmb-ann").toString
    spark.sql("DROP TABLE IF EXISTS g_tmb_ann")
    val emb = CacheRegistry.harness.add(
      spark.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id"), col("label"), col("embedding")).persist())
    val evens = emb.filter(col("vec_id") % 2 === 0)
    val cent = CacheRegistry.harness.add(
      VectorOps.ivfCodebookOn(evens).persist())
    cent.write.mode("overwrite").parquet(s"$wh/codebook")
    val assigned = CacheRegistry.harness.add(
      VectorOps.assignToIvfLists(spark, emb, cent).persist())
    assigned.filter(col("vec_id") % 2 === 0)
      .write.parquet(s"$wh/state/batch=0")
    assigned.filter(col("vec_id") % 2 === 1)
      .write.parquet(s"$wh/state/batch=1")
    val dels = emb.filter(col("vec_id") % 7 === 3).select("vec_id")
    dels.write.parquet(s"$wh/state.tombstones/batch=0")
    val queries = emb.filter(col("vec_id") < 10)
      .select("vec_id", "embedding")
    val survivors = assigned.join(dels, Seq("vec_id"), "left_anti")
    val probes = VectorOps.ivfQueryProbes(spark, queries, cent)
    val expected = VectorOps.ivfTopK(
      VectorOps.ivfProbeCandidates(spark, survivors, probes))
    // raw-state query path heals through liveRaw
    assert(sameSet(
      StreamOps.annIndexQuery(spark, s"$wh/state", s"$wh/codebook", queries),
      expected))
    // compaction applies the tombstones physically
    StreamOps.compactAnnIndex(spark, s"$wh/state", "g_tmb_ann", s"$wh/ann")
    assert(spark.table("g_tmb_ann")
      .join(dels, Seq("vec_id"), "left_semi").count() == 0)
    val n1 = spark.table("g_tmb_ann").count()
    StreamOps.compactAnnIndex(spark, s"$wh/state", "g_tmb_ann", s"$wh/ann")
    assert(spark.table("g_tmb_ann").count() == n1)
    assert(sameSet(
      VectorOps.ivfTopK(
        VectorOps.probeIvfBucketedState(spark, "g_tmb_ann", probes)),
      expected))
    // a post-compaction delete wave through the probe's tombstones view
    val dels2 = emb.filter(col("vec_id") % 11 === 5).select("vec_id")
    assert(sameSet(
      VectorOps.ivfTopK(
        VectorOps.probeIvfBucketedState(spark, "g_tmb_ann", probes,
          tombstones = Some(dels2))),
      VectorOps.ivfTopK(VectorOps.ivfProbeCandidates(spark,
        survivors.join(dels2, Seq("vec_id"), "left_anti"), probes))))
    CacheRegistry.harness.release()
    spark.sql("DROP TABLE IF EXISTS g_tmb_ann")
  }
}
