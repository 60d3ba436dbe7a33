package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec
import graft.ops.{CacheRegistry, TextOps}

/** Streaming DSIR maintenance: micro-batch delivery — including a
  * within-batch conflicting double delivery, a cross-batch revision, and
  * a terminal tombstone — must serve exactly the one-shot t152 selection
  * over the final corpus. The teeth are in the bag models: a revision
  * moves its old features out of BOTH distributions (every bucket weight
  * can shift, not just the doc's own score), and a tombstoned doc's
  * features stop counting everywhere.
  */
class DsirStreamSpec extends SparkSpec {

  test("streamed DSIR == one-shot; revision and delete shift the bags") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = Files.createTempDirectory("dsirstream").toString

    val corpus = graft.Tables.documents(s, "/root/testdata/sf0.001")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val (b1, b2) = corpus.partition(_._1 < 250)
    // within-batch conflict: the same doc delivered twice in ONE trigger
    // with different texts — the sink must collapse to the max (text,
    // source) struct deterministically, or its features double-count
    val conflicted = b1.last
    val conflictText = "aaaa conflicting in batch delivery text"
    val conflictKept =
      Seq(conflicted._3, conflictText).max // the sink's own total order
    // cross-batch revision: new text with bigrams nowhere else
    val revised = b1.head
    val revisedText = "freshly rewritten vocabulary strung into bigrams " +
      "appearing nowhere else at all"
    val deletedId = b2.find(_._2 != TextOps.DsirTargetSource).get._1

    val state = s"$dir/state"
    val mem = MemoryStream[(Long, String, String)]
    val q = StreamOps.dsirIngestStream(s,
      mem.toDF().toDF("doc_id", "source", "text"), state)
    mem.addData((b1.toSeq :+
      ((conflicted._1, conflicted._2, conflictText))): _*)
    q.processAllAvailable()
    mem.addData(b2.toSeq: _*)
    q.processAllAvailable()
    mem.addData((revised._1, revised._2, revisedText))
    q.processAllAvailable()
    q.stop()
    // terminal delete rides the shared tombstone sink
    val dmem = MemoryStream[Long]
    val dq = StreamOps.tombstoneStream(s, dmem.toDF().toDF("doc_id"), state)
    dmem.addData(deletedId)
    dq.processAllAvailable()
    dq.stop()

    // one-shot ground truth over the final corpus: the conflicted doc at
    // its deterministically-kept text, the revision applied, the deleted
    // doc gone
    val finalDocs = (corpus.filter(c =>
        c._1 != revised._1 && c._1 != deletedId && c._1 != conflicted._1)
      .toSeq :+
      ((revised._1, revised._2, revisedText)) :+
      ((conflicted._1, conflicted._2, conflictKept)))
      .toDF("doc_id", "source", "text")
    val oneShot = TextOps.dsirSelectOn(finalDocs).collect().map(_.toSeq)
    CacheRegistry.harness.release()

    val served = StreamOps.dsirServed(s, state).collect().map(_.toSeq)
    assert(oneShot.nonEmpty)
    assert(served.toSeq == oneShot.toSeq,
      "served DSIR selection must equal the one-shot over the final corpus")

    // the tombstoned doc never serves
    assert(StreamOps.dsirServed(s, state)
      .filter(col("doc_id") === deletedId).count() == 0)

    // compaction: the serving layout (posts/roster generations + the
    // 4096-row .bags artifact) must serve the identical selection, with
    // the tombstone applied physically
    val cpath = s"$dir/compacted"
    StreamOps.compactDsirState(s, state, cpath)
    val compacted = StreamOps.dsirCompacted(s, cpath)
      .collect().map(_.toSeq)
    assert(compacted.toSeq == oneShot.toSeq,
      "compacted serve must equal the direct serve")
    assert(s.read.parquet(s"$cpath/posts")
      .filter(col("doc_id") === deletedId).count() == 0,
      "compaction must apply tombstones physically")

    // a post-compaction delete passes as the tombstones param and is
    // EXACT: every surviving doc's weight shifts (bag counts adjust)
    val deleted2 = b1.find(c =>
      c._2 != TextOps.DsirTargetSource && c._1 != revised._1 &&
        c._1 != conflicted._1).get._1
    val postDocs = finalDocs.filter(col("doc_id") =!= deleted2)
    val postOne = TextOps.dsirSelectOn(postDocs).collect().map(_.toSeq)
    CacheRegistry.harness.release()
    val postServed = StreamOps.dsirCompacted(s, cpath,
      Some(Seq(deleted2).toDF("doc_id"))).collect().map(_.toSeq)
    assert(postServed.toSeq == postOne.toSeq,
      "post-compaction tombstones must adjust the bag counts exactly")
    CacheRegistry.harness.release()
  }
}
