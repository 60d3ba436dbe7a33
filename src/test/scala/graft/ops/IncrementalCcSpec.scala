package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** Incremental connected components
  * ([[TextOps.incrementalConnectedComponents]]): the claim under test is
  * that merging a batch of new edges into an existing labeling produces
  * EXACTLY the full-recompute labels while the fixpoint only ever sees the
  * condensed graph — touched components and new docs, never the
  * accumulated edge set.
  */
class IncrementalCcSpec extends SparkSpec {

  private def edges(ps: (Long, Long)*): DataFrame = {
    import spark.implicits._
    ps.toDF("d1", "d2")
  }

  private def labelMap(df: DataFrame): Map[Long, Long] =
    df.select("doc_id", "component").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("three-batch incremental labels equal one-shot labels") {
    // batch 1: three separate components {1,2}, {3,4}, {10,11}
    val b1 = edges(1L -> 2L, 3L -> 4L, 10L -> 11L)
    // batch 2: merge {1,2} with {3,4}; add a brand-new component {20,21}
    val b2 = edges(2L -> 3L, 20L -> 21L)
    // batch 3: merge the merged comp with {10,11} THROUGH a new doc (15),
    // extend the new comp, and add an edge inside an existing component
    // (4-1, a no-op)
    val b3 = edges(4L -> 15L, 15L -> 10L, 21L -> 22L, 4L -> 1L)
    val l1 = TextOps.connectedComponents(b1)
    val l2 = TextOps.incrementalConnectedComponents(l1, b2)
    val l3 = TextOps.incrementalConnectedComponents(l2, b3)
    val oneShot = TextOps.connectedComponents(
      b1.unionByName(b2).unionByName(b3))
    assert(labelMap(l2) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
    assert(labelMap(l3) == labelMap(oneShot))
    assert(labelMap(l3) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 1L, 11L -> 1L, 15L -> 1L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
    CacheRegistry.harness.release()
  }

  test("untouched components never enter the condensed graph") {
    val prior = TextOps.connectedComponents(
      edges(1L -> 2L, 10L -> 11L, 30L -> 31L))
    // the batch touches only component 1 (via doc 2) and adds new docs
    val condensed = TextOps.condenseEdges(prior, edges(2L -> 50L, 50L -> 51L))
    val nodes = condensed.select(col("d1").as("d")).unionByName(
      condensed.select(col("d2").as("d"))).distinct()
      .collect().map(_.getLong(0)).toSet
    // components {10,11} and {30,31} are structurally absent — the
    // fixpoint that follows cannot iterate over them
    assert(nodes == Set(1L, 50L, 51L))
    CacheRegistry.harness.release()
  }

  test("edges inside an existing component are dropped before the fixpoint") {
    val prior = TextOps.connectedComponents(edges(1L -> 2L, 2L -> 3L))
    val condensed = TextOps.condenseEdges(prior, edges(1L -> 3L, 3L -> 2L))
    assert(condensed.count() == 0)
    // and the incremental step passes every label through unchanged
    val merged =
      TextOps.incrementalConnectedComponents(prior, edges(1L -> 3L))
    assert(labelMap(merged) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    CacheRegistry.harness.release()
  }

  test("a new doc with the smallest id becomes the merged component label") {
    val prior = TextOps.connectedComponents(edges(5L -> 6L, 8L -> 9L))
    // doc 0 (smaller than every prior label) bridges both components
    val merged = TextOps.incrementalConnectedComponents(
      prior, edges(0L -> 6L, 0L -> 9L))
    assert(labelMap(merged) ==
      Map(0L -> 0L, 5L -> 0L, 6L -> 0L, 8L -> 0L, 9L -> 0L))
    CacheRegistry.harness.release()
  }

  test("d91 equals the one-shot d46 labeling on the corpus") {
    val sf = "/root/testdata/sf0.001"
    val incr = TextOps.d91IncrementalCc(spark, sf)
      .select("doc_id", "component", "csize")
    val full = TextOps.d46DedupClusters(spark, sf)
      .select("doc_id", "component", "csize")
    assert(incr.exceptAll(full).count() == 0)
    assert(full.exceptAll(incr).count() == 0)
    CacheRegistry.harness.release()
  }
}
