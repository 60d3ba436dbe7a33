package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** [[TextOps.ccTombstoneHeal]] — the delete that anti-join cannot heal:
  * removing a bridge doc must SPLIT its component, which monotone
  * min-label propagation cannot undo. The heal re-runs the fixpoint over
  * ONLY the touched components' surviving edges; this spec pins the
  * designed split case, equality with the survivor-only full recompute,
  * the replay fixpoint, and that untouched components pass through
  * unchanged.
  */
class TombstoneCcSpec extends SparkSpec {

  private def labelsOf(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  test("deleting a bridge doc splits its component into two") {
    val s = spark
    import s.implicits._
    // a path 1-2-3-4-5 plus a separate pair 10-11: doc 3 is the bridge
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("d1", "d2")
    val labels = TextOps.connectedComponents(edges)
    assert(labelsOf(labels) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
        10L -> 10L, 11L -> 10L))
    val healed = TextOps.ccTombstoneHeal(labels, edges,
      Seq(3L).toDF("doc_id"))
    // the component SPLIT: {1,2} and {4,5}, each under its new min label;
    // the untouched {10,11} pair is byte-identical
    assert(labelsOf(healed) ==
      Map(1L -> 1L, 2L -> 1L, 4L -> 4L, 5L -> 4L, 10L -> 10L, 11L -> 10L))
    // equality with the survivor-only full recompute (the oracle shape)
    val surviving = edges.filter(col("d1") =!= 3L && col("d2") =!= 3L)
    assert(labelsOf(healed) == labelsOf(
      TextOps.connectedComponents(surviving)))
  }

  test("deleting a component's LABEL doc relabels the fragment to its " +
      "new min; edge-less survivors drop out") {
    val s = spark
    import s.implicits._
    // triangle {1,2,3} (survives any single delete) and pair {7,8}
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (7L, 8L)).toDF("d1", "d2")
    val labels = TextOps.connectedComponents(edges)
    // delete the min-id label doc itself: the rest must re-label to 2
    val healed = TextOps.ccTombstoneHeal(labels, edges,
      Seq(1L).toDF("doc_id"))
    assert(labelsOf(healed) == Map(2L -> 2L, 3L -> 2L, 7L -> 7L, 8L -> 7L))
    // delete one end of the pair: the surviving end has no edge left and
    // leaves the clustered set entirely (one-shot semantics)
    val healed2 = TextOps.ccTombstoneHeal(labels, edges,
      Seq(7L).toDF("doc_id"))
    assert(labelsOf(healed2) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("replay fixpoint: re-applying the same tombstone batch is the " +
      "identity, and a delete of unclustered docs touches nothing") {
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("d1", "d2")
    val labels = TextOps.connectedComponents(edges)
    val dels = Seq(3L).toDF("doc_id")
    val healed = TextOps.ccTombstoneHeal(labels, edges, dels)
    // the state (edge set) is never rewritten — the replay passes the
    // ORIGINAL accumulated edges with the healed labels, exactly what a
    // re-delivered tombstone batch would see
    val replayed = TextOps.ccTombstoneHeal(healed, edges, dels)
    assert(labelsOf(replayed) == labelsOf(healed))
    // deleting a doc that was never clustered finds no touched component
    val noop = TextOps.ccTombstoneHeal(labels, edges,
      Seq(99L).toDF("doc_id"))
    assert(labelsOf(noop) == labelsOf(labels))
    CacheRegistry.harness.release()
  }
}
