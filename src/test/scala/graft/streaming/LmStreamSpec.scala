package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec
import graft.ops.TextOps

/** Streaming bigram-LM maintenance: the accumulated additive count state
  * must serve the one-shot t157 scores bit-exactly at every lifecycle
  * point — across two ingest batches, a revision of a TRAIN doc (which
  * shifts c1/c2/nt and with them EVERY doc's info_q — the no-caching
  * truth), and a tombstoned train doc. Then the compaction trio:
  * compacted ≡ direct, and a post-compaction delete applied EXACTLY via
  * the additive model deltas.
  */
class LmStreamSpec extends SparkSpec {

  test("streamed LM == one-shot across revision and delete; compacted == direct") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = Files.createTempDirectory("lmstream").toString
    val state = s"$dir/state"

    val corpus = graft.Tables.documents(s, "/root/testdata/sf0.001")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))

    def oneShot(current: Seq[(Long, String)]): Seq[Seq[Any]] = {
      val docs = current.toDF("doc_id", "text")
      val out = TextOps.lmScoreFrom(docs.select("doc_id"),
        TextOps.lmTokPartials(docs), TextOps.lmPairPartials(docs))
        .collect().map(_.toSeq).toSeq
      graft.ops.CacheRegistry.harness.release()
      out
    }
    def served(): Seq[Seq[Any]] = {
      val out = StreamOps.lmServed(s, state).collect().map(_.toSeq).toSeq
      graft.ops.CacheRegistry.harness.release()
      out
    }

    val (b1, b2) = corpus.partition(_._1 < 250)
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.lmIngestStream(s,
      mem.toDF().toDF("doc_id", "text"), state)
    mem.addData(b1.toSeq: _*); q.processAllAvailable()
    mem.addData(b2.toSeq: _*); q.processAllAvailable()
    assert(served() == oneShot(corpus.toSeq),
      "two-batch state must serve the one-shot scores")

    // revision of a TRAIN doc (even id): the model itself must shift
    val revisedId = corpus.map(_._1).filter(_ % 2 == 0).head
    val revisedText = "utterly fresh train vocabulary rewrites the model"
    mem.addData((revisedId, revisedText)); q.processAllAvailable()
    q.stop()
    val afterRev = corpus.filter(_._1 != revisedId).toSeq :+
      (revisedId, revisedText)
    val servedRev = served()
    assert(servedRev == oneShot(afterRev),
      "a train-doc revision must shift the model and every score")

    // tombstoned TRAIN doc: leaves the roster AND the train counts
    val deadId = corpus.map(_._1).filter(id => id % 2 == 0 &&
      id != revisedId).head
    val dmem = MemoryStream[Long]
    val dq = StreamOps.tombstoneStream(s, dmem.toDF().toDF("doc_id"), state)
    dmem.addData(deadId); dq.processAllAvailable(); dq.stop()
    val afterDel = afterRev.filterNot(_._1 == deadId)
    assert(served() == oneShot(afterDel),
      "a tombstoned train doc must leave the model, not just the roster")

    // compaction: artifacts pre-aggregate the train model physically;
    // compacted serve ≡ direct serve ≡ one-shot
    StreamOps.compactLmState(s, state, s"$dir/compacted")
    val compacted = StreamOps.lmCompacted(s, s"$dir/compacted")
      .collect().map(_.toSeq).toSeq
    graft.ops.CacheRegistry.harness.release()
    assert(compacted == oneShot(afterDel),
      "compacted serve must equal the one-shot over the survivors")

    // a post-compaction delete (another train doc) applies EXACTLY via
    // the additive model deltas
    val lateDead = corpus.map(_._1).filter(id => id % 2 == 0 &&
      id != revisedId && id != deadId).head
    val late = StreamOps.lmCompacted(s, s"$dir/compacted",
      Some(Seq(lateDead).toDF("doc_id")))
      .collect().map(_.toSeq).toSeq
    graft.ops.CacheRegistry.harness.release()
    assert(late == oneShot(afterDel.filterNot(_._1 == lateDead)),
      "a post-compaction delete must subtract the dead doc's own " +
        "partials from the model exactly")
  }
}
