package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** The raw-vector state lifecycle — the exact re-rank side's source of
  * truth. The accumulated (vec_id, embedding) state must serve the
  * survivor set with latest-revision-wins semantics at every lifecycle
  * point (two ingest batches, a within-batch double delivery, a
  * revision, a tombstoned delete), and the compacted vec_id-bucketed
  * re-rank store rebuilt from it must equal the one-shot
  * writeRerankState over the same survivors — so fusedServe's
  * `rerankTable` is a maintained artifact, not a caller-synced side
  * table.
  */
class RawVecStreamSpec extends SparkSpec {

  test("raw-vector state: live view, within-batch collapse, revision, delete, compacted store") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = Files.createTempDirectory("rawvecstream").toString
    val state = s"$dir/rawstate"
    s.sql("DROP TABLE IF EXISTS rawvec_store_spec")
    s.sql("DROP TABLE IF EXISTS rawvec_store_oneshot")

    val corpus = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toSeq

    val mem = MemoryStream[(Long, Seq[Float])]
    val q = StreamOps.rawVecIngestStream(s,
      mem.toDF().toDF("vec_id", "embedding"), state)

    def live(): Seq[(Long, Seq[Float])] =
      StreamOps.liveRawVecs(s, state).orderBy("vec_id")
        .as[(Long, Seq[Float])].collect().toSeq

    // batch 0: the even half. batch 1: the odd half PLUS a second
    // delivery of one odd vec_id carrying a lexicographically SMALLER
    // embedding — within a batch there is no delivery order, so the
    // collapse must pick the TOTAL-order winner (max over the orderable
    // array), which is the original embedding
    val (evens, odds) = corpus.partition(_._1 % 2 == 0)
    val dupId = odds.head._1
    val loser = (dupId, odds.head._2.updated(0, odds.head._2.head - 10f))
    mem.addData(evens: _*); q.processAllAvailable()
    mem.addData((loser +: odds): _*); q.processAllAvailable()
    assert(live() == corpus.sortBy(_._1),
      "two-batch state with a within-batch duplicate must serve the " +
        "deterministic winner per vec_id")

    // batch 2: a revision re-delivers one vector REVERSED — latest batch
    // wins over both earlier deliveries
    val revId = odds(1)._1
    val revised = (revId, corpus.find(_._1 == revId).get._2.reverse)
    mem.addData(revised); q.processAllAvailable()
    q.stop()
    val afterRev = corpus.map { case (id, e) =>
      if (id == revId) (id, e.reverse) else (id, e) }

    // a tombstoned delete heals the live view without a state rewrite
    val delId = evens.head._1
    val tmem = MemoryStream[Long]
    val tq = StreamOps.tombstoneStream(s,
      tmem.toDF().toDF("vec_id"), state, "vec_id")
    tmem.addData(delId); tq.processAllAvailable()
    tq.stop()
    val expected = afterRev.filter(_._1 != delId).sortBy(_._1)
    assert(live() == expected,
      "the live view must serve latest-revision survivors only")

    // the compacted re-rank store rebuilt from the state must equal the
    // one-shot writeRerankState over the same survivors, and keep the
    // store's serving property: a probe at a bounded id literal is
    // bucket-pruned physical I/O
    StreamOps.compactRerankState(s, state, "rawvec_store_spec",
      s"$dir/storec")
    graft.ops.VectorOps.writeRerankState(
      expected.toDF("vec_id", "embedding"), "rawvec_store_oneshot",
      s"$dir/storeo")
    def table(t: String): Seq[(Long, Seq[Float])] =
      s.table(t).orderBy("vec_id").as[(Long, Seq[Float])].collect().toSeq
    assert(table("rawvec_store_spec") == table("rawvec_store_oneshot"),
      "the state-compacted store must equal the one-shot store")
    // probe shape = the serving use (the scan feeds a per-id operation;
    // a bare filter+collect lets the planner's auto-bucketed-scan drop
    // the bucketed layout and with it the pruning)
    val probeIds = expected.take(3).map(_._1)
    val probe = s.table("rawvec_store_spec")
      .filter(col("vec_id").isin(probeIds: _*))
      .groupBy("vec_id").agg(count(lit(1)).as("n"))
    probe.collect()
    val pruned = graft.PlanWalk.allNodesThroughCaches(
      probe.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.bucketedScan && f.toString.contains("SelectedBucketsCount") => f
    }
    assert(pruned.nonEmpty,
      "the compacted store must serve id probes bucket-pruned:\n" +
        probe.queryExecution.executedPlan)

    Seq("rawvec_store_spec", "rawvec_store_oneshot")
      .foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
