package graft.ops

import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** Fixpoint behavior of the min-label propagation loop on synthetic graphs
  * (the oracle checks d46 end-to-end on real minhash pairs; these pin the
  * loop's convergence on shapes the corpus may not contain).
  */
class ConnectedComponentsSpec extends SparkSpec {

  private def cc(pairs: (Long, Long)*): Map[Long, Long] = {
    import spark.implicits._
    val edges = pairs.toSeq.toDF("d1", "d2")
    TextOps.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain: labels cross the full diameter") {
    // path 1-2-3-4-5-6: min label must travel 5 hops
    val labels = cc(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L)
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 1L, 6L -> 1L))
  }

  test("two components stay separate; star collapses in one round") {
    val labels = cc(
      // star centered at 10
      10L -> 11L, 10L -> 12L, 10L -> 13L,
      // disjoint triangle with smaller ids
      1L -> 2L, 2L -> 3L, 1L -> 3L)
    assert(labels(11L) == 10L && labels(12L) == 10L && labels(13L) == 10L)
    assert(labels(1L) == 1L && labels(2L) == 1L && labels(3L) == 1L)
  }

  test("1000-node path graph converges well under the round cap") {
    // worst case for plain propagation (diameter 999 > cap 50); pointer
    // jumping must collapse it in ~log2(1000) rounds — no exception, and
    // every node labeled with the path's minimum id
    import spark.implicits._
    val edges = (1L until 1000L).map(i => (i, i + 1)).toDF("d1", "d2")
    val labels = TextOps.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 1000)
    assert(labels.values.forall(_ == 1L))
  }

  test("empty edge list yields empty labeling") {
    import spark.implicits._
    val edges = Seq.empty[(Long, Long)].toDF("d1", "d2")
    assert(TextOps.connectedComponents(edges).count() == 0)
  }
}
