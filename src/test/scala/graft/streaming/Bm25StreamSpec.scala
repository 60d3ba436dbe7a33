package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec
import graft.ops.TextOps

/** Streaming BM25 postings maintenance: micro-batch delivery — including
  * a revised re-delivery and a terminal tombstone — must serve exactly
  * the one-shot BM25 ranking over the final corpus. The teeth are in the
  * statistics: a revision drops the OLD version's term rows (df and
  * corpus length shift, not just the doc's own scores), and a tombstoned
  * doc stops counting everywhere.
  */
class Bm25StreamSpec extends SparkSpec {

  test("streamed postings == one-shot BM25; revision and delete shift stats") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = Files.createTempDirectory("bm25stream").toString

    val corpus = graft.Tables.documents(s, "/root/testdata/sf0.001")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val (b1, b2) = corpus.partition(_._1 < 250)
    val revisedId = b1.head._1
    val revisedText = "a rewritten document stocked with entirely fresh " +
      "vocabulary nowhere else in the corpus"
    val deletedId = b2.head._1

    val state = s"$dir/state"
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.postingsStream(s,
      mem.toDF().toDF("doc_id", "text"), state)
    mem.addData(b1.toSeq: _*)
    q.processAllAvailable()
    mem.addData(b2.toSeq: _*)
    q.processAllAvailable()
    // revision: same doc_id, new text — old postings must stop counting
    mem.addData((revisedId, revisedText))
    q.processAllAvailable()
    q.stop()
    // terminal delete rides the shared tombstone sink
    val dmem = MemoryStream[Long]
    val dq = StreamOps.tombstoneStream(s, dmem.toDF().toDF("doc_id"), state)
    dmem.addData(deletedId)
    dq.processAllAvailable()
    dq.stop()

    // one-shot ground truth over the final corpus (revised, minus deleted)
    val finalDocs = (corpus.filter(c =>
        c._1 != revisedId && c._1 != deletedId).toSeq :+
      (revisedId, revisedText)).toDF("doc_id", "text")
    val tf = finalDocs
      .select(col("doc_id"), explode(TextOps.words(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf")).persist()
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val qterms = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 3)
      .orderBy(col("df").asc, col("term")).limit(10)
      .select("term").persist()

    val oneShot = TextOps.bm25TopK(tf, dl, qterms)
      .orderBy("term", "rn").collect().map(_.toSeq)
    val served = StreamOps.bm25Served(s, state, qterms)
      .orderBy("term", "rn").collect().map(_.toSeq)
    assert(oneShot.nonEmpty)
    assert(served.toSeq == oneShot.toSeq,
      "served BM25 must equal the one-shot ranking over the final corpus")

    // the tombstoned doc never serves, under any query set
    val allTerms = spark.read.parquet(state).select("term").distinct()
    assert(StreamOps.bm25Served(s, state, allTerms)
      .filter(col("doc_id") === deletedId).count() == 0)

    // compaction: term-bucketed serving layout, probe ≡ direct read,
    // query terms bucket-prune the scan
    StreamOps.compactPostingsState(s, state, "bm25_postings_spec",
      s"$dir/compacted")
    val termsSeq = qterms.collect().map(_.getString(0)).toSeq
    val probe = StreamOps.bm25Compacted(s, "bm25_postings_spec",
      s"$dir/compacted", termsSeq)
    assert(probe.collect().map(_.toSeq).sortBy(_.toString).toSeq
      == oneShot.map(_.toSeq).sortBy(_.toString).toSeq,
      "compacted probe must serve the same ranking")
    // AQE wraps the plan in a leaf AdaptiveSparkPlanExec, so inspect the
    // executed plan STRING (final plan = element 0 of the AQE double-print)
    val pplan = probe.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(pplan.contains("SelectedBucketsCount"),
      s"query terms must bucket-prune the postings scan:\n$pplan")
    // corpus stats serve from the compacted 1-row `.stats` artifact: the
    // plan scans `.dl` exactly ONCE (the per-doc length join) — the former
    // per-serve count/sum over one `.dl` row per live doc is gone
    val exec = probe.queryExecution.executedPlan
    assert(graft.PlanWalk.scansOf(exec, "compacted.dl").size == 1,
      s"the probe must scan .dl exactly once (lengths join only):\n$exec")
    assert(graft.PlanWalk.scansOf(exec, "compacted.stats").size == 1,
      s"corpus stats must come from the 1-row .stats artifact:\n$exec")

    // a post-compaction delete rides the tombstones param: stats shift
    val lateDeleted = b2(1)._1
    val probeT = StreamOps.bm25Compacted(s, "bm25_postings_spec",
      s"$dir/compacted", termsSeq, Some(Seq(lateDeleted).toDF("doc_id")))
    val finalDocs2 = finalDocs.filter(col("doc_id") =!= lateDeleted)
    val tf2 = finalDocs2
      .select(col("doc_id"), explode(TextOps.words(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl2 = tf2.groupBy("doc_id").agg(sum("tf").as("dl"))
    val oneShot2 = TextOps.bm25TopK(tf2, dl2, qterms)
      .orderBy("term", "rn").collect().map(_.toSeq)
    assert(probeT.orderBy("term", "rn").collect().map(_.toSeq).toSeq
      == oneShot2.toSeq,
      "post-compaction tombstone must shift df and corpus stats")
    tf.unpersist(); qterms.unpersist()
  }
}
