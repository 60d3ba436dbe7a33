package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec
import graft.ops.TextOps

/** Streaming PageRank maintenance: per-batch edge deltas advanced by the
  * t145 touched-node overlay must serve BIT-exactly the full power
  * iteration over the accumulated graph — the stream ≡ batch identity,
  * here with the extra teeth that the served trajectory is the EXACT
  * fixed-depth trajectory, not an approximation. Also pins the
  * incremental write volume: a delta batch's first-iteration overlay
  * covers only the directly-perturbed nodes, never the corpus.
  */
class PagerankStreamSpec extends SparkSpec {

  test("streamed edge deltas serve the full-recompute trajectory") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = Files.createTempDirectory("prstream").toString

    val docs = graft.Tables.documents(s, "/root/testdata/sf0.001")
      .select("doc_id").persist()
    val nodes = docs.collect().map(_.getLong(0)).sorted
    val nn = nodes.length.toLong

    // deterministic synthetic edges over the node set — exactness under
    // ANY edge set is the claim, so a simple affine index rule suffices
    def edge(i: Int, j: Int): (Long, Long) =
      (nodes(i), nodes(((i * 31 + j * 17 + 7) % nn).toInt))
    val batch1 = nodes.indices
      .flatMap(i => Seq(edge(i, 0), edge(i, 1)))
      .filter(e => e._1 != e._2).distinct
    // a small delta: two srcs gain a third outlink
    val batch2 = nodes.indices.filter(_ % 29 == 0).map(edge(_, 2))
      .filter(e => e._1 != e._2).distinct
    assert(batch2.exists(e => !batch1.contains(e)),
      "the delta batch must add at least one novel edge")

    val state = s"$dir/state"
    val mem = MemoryStream[(Long, Long)]
    val q = StreamOps.pagerankDeltaStream(s,
      mem.toDF().toDF("src", "dst"), docs, state)
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    val served = StreamOps.pagerankState(s, state)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getDouble(1)))

    // one-shot: the full power iteration over the union graph
    val union = (batch1 ++ batch2).distinct.toDF("src", "dst")
    val outdeg = union.groupBy("src").agg(count(lit(1)).as("outdeg"))
    var ranks = TextOps.prInit(docs, nn)
    for (_ <- 1 to TextOps.PrIters)
      ranks = TextOps.prStep(docs, ranks, union, outdeg, nn)
    val oneShot = ranks.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))

    assert(served.length == nn)
    assert(served.toSeq == oneShot.toSeq,
      "served ranks must equal the full recompute bit-exactly")

    // localization: the delta batch's first-iteration overlay holds only
    // the directly-perturbed nodes, a strict subset of the graph
    val ov1 = s.read.parquet(s"$state/pr/iter=1")
      .filter(col("batch") === 1).count()
    assert(ov1 > 0 && ov1 < nn,
      s"delta overlay must be node-local (got $ov1 of $nn)")
    // and the full build really did publish all nodes once
    assert(s.read.parquet(s"$state/pr/iter=${TextOps.PrIters}")
      .filter(col("batch") === 0).count() == nn)

    // compaction: each iteration collapses to ONE partition under the max
    // batch id, the served trajectory is unchanged, and a re-run is a
    // no-op rewrite
    StreamOps.compactPagerankState(s, state)
    StreamOps.compactPagerankState(s, state)
    for (i <- 1 to TextOps.PrIters) {
      val parts = new java.io.File(s"$state/pr/iter=$i")
        .listFiles.filter(_.getName.startsWith("batch=")).map(_.getName)
      assert(parts.toSeq == Seq("batch=1"),
        s"iter $i must hold exactly the max-batch partition, got ${parts.toSeq}")
    }
    val servedC = StreamOps.pagerankState(s, state)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(servedC.toSeq == oneShot.toSeq,
      "compaction must not change the served trajectory")
    docs.unpersist()
  }
}
