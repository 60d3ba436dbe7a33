package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** Incremental near-dup detection ([[TextOps.incrementalMinhashDedup]]):
  * the claim under test is that batch N+1 costs O(batch) — accumulated
  * TEXT is never re-read — while the emitted pairs are exactly what a full
  * recompute would produce for pairs involving the new batch.
  */
class IncrementalDedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def docs = graft.Tables.documents(spark, sf)
    .select("doc_id", "text")

  private def pairSet(df: DataFrame): Set[(Long, Long, Long)] =
    df.select("d1", "d2", "n_bands").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("three-batch incremental run reproduces the full recompute exactly") {
    val full = pairSet(TextOps.d26MinhashLsh(spark, sf))
    val b1 = docs.filter(col("doc_id") < 150)
    val b2 = docs.filter(col("doc_id") >= 150 && col("doc_id") < 350)
    val b3 = docs.filter(col("doc_id") >= 350)
    val empty = TextOps.minhashSignatures(docs.filter(lit(false)))
    val (sigs1, pairs1) = TextOps.incrementalMinhashDedup(empty, b1)
    val (sigs2, pairs2) = TextOps.incrementalMinhashDedup(sigs1, b2)
    val (sigs3, pairs3) = TextOps.incrementalMinhashDedup(sigs2, b3)
    // each batch emits exactly the full-recompute pairs whose NEWEST doc
    // falls in that batch (d1 < d2, batches ascend by doc_id)
    assert(pairSet(pairs1) == full.filter(_._2 < 150))
    assert(pairSet(pairs2) == full.filter(p => p._2 >= 150 && p._2 < 350))
    assert(pairSet(pairs3) == full.filter(_._2 >= 350))
    // the accumulated state equals a from-scratch signature build
    val direct = TextOps.minhashSignatures(docs)
    assert(sigs3.count() == direct.count())
    assert(sigs3.exceptAll(direct).count() == 0)
    assert(direct.exceptAll(sigs3).count() == 0)
  }

  test("replaying a batch against already-updated state is idempotent") {
    // the crash window: state write completed, caller's commit did not —
    // the replay sees its OWN signatures already in accumSigs. The update
    // must not duplicate them and the pairs must match the first run
    // (no self-pairs, no doubled n_bands).
    val b1 = docs.filter(col("doc_id") < 250)
    val b2 = docs.filter(col("doc_id") >= 250)
    val empty = TextOps.minhashSignatures(docs.filter(lit(false)))
    val (sigs1, _) = TextOps.incrementalMinhashDedup(empty, b1)
    val (sigs2, pairs2) = TextOps.incrementalMinhashDedup(sigs1, b2)
    val (replayed, replayPairs) = TextOps.incrementalMinhashDedup(sigs2, b2)
    assert(pairSet(replayPairs) == pairSet(pairs2))
    assert(replayed.count() == sigs2.count())
    assert(replayed.exceptAll(sigs2).count() == 0)
    assert(replayPairs.filter(col("d1") === col("d2")).count() == 0)
    CacheRegistry.harness.release()
  }

  test("accumulated signatures pass through untouched (no corpus re-scan)") {
    val b1 = docs.filter(col("doc_id") < 250)
    val b2 = docs.filter(col("doc_id") >= 250)
    // tamper with the stored state: a fabricated signature for a doc that
    // does not exist in any batch's text. If the implementation ever
    // re-derived signatures from text, the marker could not survive into
    // the updated state.
    val marker = TextOps.minhashSignatures(b1).limit(0)
      .unionByName(spark.range(1).select(
        (lit(-1L)).as("doc_id") +:
          (0 until 16).map(i => lit(424242L + i).as(s"s$i")): _*))
    val accum = TextOps.minhashSignatures(b1).unionByName(marker)
    val (updated, pairs) = TextOps.incrementalMinhashDedup(accum, b2)
    val survived = updated.filter(col("doc_id") === -1L).collect()
    assert(survived.length == 1)
    assert((0 until 16).forall(i =>
      survived(0).getAs[Long](s"s$i") == 424242L + i))
    // the fabricated signature's band keys match nothing real
    assert(pairs.filter(col("d1") === -1L || col("d2") === -1L).count() == 0)
  }
}
