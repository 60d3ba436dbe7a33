package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec
import graft.ops.{BpeOps, CacheRegistry}

/** Streaming BPE tokenization under the frozen merge artifact: micro-batch
  * delivery (including a revised re-delivery) must serve exactly the
  * one-shot tokenization of the final corpus — the stream ≡ batch identity
  * every streaming member of this repo pins.
  */
class BpeStreamSpec extends SparkSpec {

  test("streamed tokenization == one-shot under frozen rules; revision supersedes") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = Files.createTempDirectory("bpestream").toString

    // frozen artifact: rules learned once on the corpus, persisted
    val corpus = graft.Tables.documents(s, "/root/testdata/sf0.001")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val rules = BpeOps.learnBpeOn(
      corpus.toSeq.toDF("doc_id", "text"))._2
    CacheRegistry.harness.release()
    val rulesPath = s"$dir/rules"
    rules.map(r => (r.rnk, r.pair)).toDF("rnk", "pair")
      .write.parquet(rulesPath)
    val pairs = rules.map(_.pair)

    val (b1, b2) = corpus.partition(_._1 < 250)
    val revisedId = b1.head._1
    val revisedText = "a completely rewritten document with previously " +
      "unseen vocabulary zzyzx qwerty"

    val state = s"$dir/state"
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.bpeTokenizeStream(s,
      mem.toDF().toDF("doc_id", "text"), rulesPath, state)
    mem.addData(b1.toSeq: _*)
    q.processAllAvailable()
    mem.addData(b2.toSeq: _*)
    q.processAllAvailable()
    // revision: the same doc_id re-delivered with new text must supersede
    mem.addData((revisedId, revisedText))
    q.processAllAvailable()
    q.stop()

    val served = StreamOps.bpeTokenState(s, state)
      .orderBy("doc_id").collect().map(_.toSeq)

    val finalDocs = (corpus.filter(_._1 != revisedId).toSeq :+
      (revisedId, revisedText)).toDF("doc_id", "text")
    val oneShot = BpeOps.docSummary(
        BpeOps.piecesOver(finalDocs, BpeOps.tokTableFor(finalDocs, pairs)))
      .orderBy("doc_id").collect().map(_.toSeq)

    assert(served.length == corpus.length)
    assert(served.toSeq == oneShot.toSeq,
      "streamed token state must equal the one-shot tokenization")
  }
}
