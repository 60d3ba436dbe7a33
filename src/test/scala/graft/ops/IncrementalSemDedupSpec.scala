package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** Incremental semantic dedup ([[VectorOps.incrementalSemanticDedup]]): the
  * claim under test is that at FIXED centroids, deduplicating batch by
  * batch produces exactly the one-shot pair set and assignment state — the
  * SemDeDup contract that lets the codebook train once and ingest stream
  * forever after.
  */
class IncrementalSemDedupSpec extends SparkSpec {

  // two fixed unit-ish centroids; cluster membership is unambiguous except
  // for v5 = (1,1), whose tie resolves to cid 0 by the cid tiebreak
  private def codebook: DataFrame = {
    import spark.implicits._
    Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0))).toDF("cid", "cvec")
  }

  private def emb(rows: (Long, Seq[Float])*): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  // cluster 0: v0, v2 (near dups), v4 = (1,-1) and v5 = (1,1) — mutual
  // cosine 0 < threshold, so they are keepers despite sharing the cluster;
  // cluster 1: v1, v3 (near dups)
  private def corpus = emb(
    0L -> Seq(1.0f, 0.0f), 1L -> Seq(0.0f, 1.0f),
    2L -> Seq(0.9f, 0.1f), 3L -> Seq(0.1f, 0.9f),
    4L -> Seq(1.0f, -1.0f), 5L -> Seq(1.0f, 1.0f))

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet

  private def stateSet(df: DataFrame): Set[(Long, Int)] =
    df.select("vec_id", "cid").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet

  private def emptyState =
    VectorOps.assignToCentroids(spark, corpus.filter(lit(false)), codebook)

  test("two-batch pairs and state equal the one-shot at fixed centroids") {
    val evens = corpus.filter(col("vec_id") % 2 === 0)
    val odds = corpus.filter(col("vec_id") % 2 === 1)
    val (s1, p1) =
      VectorOps.incrementalSemanticDedup(spark, codebook, emptyState, evens)
    val (s2, p2) =
      VectorOps.incrementalSemanticDedup(spark, codebook, s1, odds)
    val (oneShotState, oneShotPairs) =
      VectorOps.incrementalSemanticDedup(spark, codebook, emptyState, corpus)
    assert(pairSet(p1.unionByName(p2)) == pairSet(oneShotPairs))
    assert(stateSet(s2) == stateSet(oneShotState))
    // the interesting rows: v0-v2 and v1-v3 are dups, the orthogonal
    // cluster-0 pair (v4, v5) is not
    assert(pairSet(oneShotPairs).contains((0L, 2L)))
    assert(pairSet(oneShotPairs).contains((1L, 3L)))
    assert(!pairSet(oneShotPairs).contains((4L, 5L)))
    CacheRegistry.harness.release()
  }

  test("tie between centroids resolves to the smaller cid") {
    val assigned =
      VectorOps.assignToCentroids(spark, emb(5L -> Seq(1.0f, 1.0f)), codebook)
    assert(stateSet(assigned) == Set(5L -> 0))
    CacheRegistry.harness.release()
  }

  test("a zero vector pins similarity to 0 and assigns to the smallest cid") {
    val assigned =
      VectorOps.assignToCentroids(spark, emb(9L -> Seq(0.0f, 0.0f)), codebook)
    assert(stateSet(assigned) == Set(9L -> 0))
    CacheRegistry.harness.release()
  }

  test("replaying a batch whose assignments already reached state is a no-op") {
    val evens = corpus.filter(col("vec_id") % 2 === 0)
    val odds = corpus.filter(col("vec_id") % 2 === 1)
    val (s1, _) =
      VectorOps.incrementalSemanticDedup(spark, codebook, emptyState, evens)
    val (s2, p2) =
      VectorOps.incrementalSemanticDedup(spark, codebook, s1, odds)
    // crash-replay: batch 2 runs again with the already-updated state
    val (s2r, p2r) =
      VectorOps.incrementalSemanticDedup(spark, codebook, s2, odds)
    assert(stateSet(s2r) == stateSet(s2))
    assert(pairSet(p2r) == pairSet(p2))
    CacheRegistry.harness.release()
  }

  test("d92 equals the fixed-centroid one-shot on the corpus") {
    val sf = "/root/testdata/sf0.001"
    val incr = VectorOps.d92IncrementalSemDedup(spark, sf)
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val frozen = VectorOps.codebookOf(
      VectorOps.kmeansLoopOn(spark,
        all.filter(col("vec_id") % 2 === 0))._2).persist()
    CacheRegistry.harness.add(frozen)
    val empty = VectorOps.assignToCentroids(
      spark, all.filter(lit(false)), frozen)
    val (state, pairs) =
      VectorOps.incrementalSemanticDedup(spark, frozen, empty, all)
    val dups = pairs.groupBy(col("d2").as("vec_id"))
      .agg(count(lit(1)).as("n_smaller_dups"))
    val oneShot = state.join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"),
        coalesce(col("n_smaller_dups"), lit(0L)).as("n_smaller_dups"))
      .withColumn("keeper", col("n_smaller_dups") === 0L)
    assert(incr.exceptAll(oneShot).count() == 0)
    assert(oneShot.exceptAll(incr).count() == 0)
    CacheRegistry.harness.release()
  }
}
