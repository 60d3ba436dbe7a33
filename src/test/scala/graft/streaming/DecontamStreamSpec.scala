package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** The streaming decontamination gate: the accumulated per-doc overlap
  * state must serve the one-shot t163 report cut over the current
  * corpus bit-exactly at every lifecycle point — two ingest batches, a
  * revision that GAINS contamination (eval text delivered under a train
  * doc_id), a revision that LOSES it (clean text superseding a
  * contaminated doc — the zero-row supersession the sink keeps zero
  * rows for), and a tombstoned delete. The one-shot comparator is the
  * shared decontamCountsAll/decontamReport tail over the corpus as it
  * stands after each step, against the same frozen eval-gram artifact.
  */
class DecontamStreamSpec extends SparkSpec {

  test("decontam stream == one-shot report across revision and delete") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = Files.createTempDirectory("decontamstream").toString
    val state = s"$dir/gate"
    val egPath = s"$dir/evalgrams"

    val docs = graft.Tables.documents(s, "/root/testdata/sf0.001")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val isEval = (id: Long) =>
      id % graft.ops.TextOps.DecontamEvalMod ==
        graft.ops.TextOps.DecontamEvalRem
    val evalDocs = docs.filter(t => isEval(t._1))
    val train = docs.filterNot(t => isEval(t._1))

    // frozen eval-gram artifact (the benchmark, fixed before ingest)
    graft.ops.TextOps.shingleTableN(
        evalDocs.toDF("doc_id", "text"), 5)
      .select("sh").distinct()
      .write.mode("overwrite").parquet(egPath)
    val evalGrams = s.read.parquet(egPath)

    def oneShot(current: Seq[(Long, String)]): Seq[(Long, Long)] =
      graft.ops.TextOps.decontamReport(graft.ops.TextOps.decontamCountsAll(
          current.toDF("doc_id", "text"), evalGrams))
        .as[(Long, Long)].collect().toSeq
    def served(): Seq[(Long, Long)] =
      StreamOps.decontamServed(s, state).as[(Long, Long)].collect().toSeq

    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.decontamStream(s,
      mem.toDF().toDF("doc_id", "text"), egPath, state)

    // two ingest batches of train docs
    val (b1, b2) = train.partition(_._1 % 2 == 0)
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    val base = oneShot(train)
    assert(base.nonEmpty, "the corpus must have contaminated train docs")
    assert(served() == base, "two-batch state must serve the one-shot cut")

    // revision GAINING contamination: a clean train doc re-delivers with
    // an eval doc's text — it must enter the report
    val dirty = base.map(_._1).toSet
    val cleanId = train.map(_._1).find(id => !dirty.contains(id)).get
    val gained = (cleanId, evalDocs.head._2)
    mem.addData(gained); q.processAllAvailable()
    val afterGain = train.map(t => if (t._1 == cleanId) gained else t)
    val gainRep = oneShot(afterGain)
    assert(served() == gainRep)
    assert(gainRep.map(_._1).contains(cleanId),
      "the gaining revision must enter the report")

    // revision LOSING contamination: the most-contaminated doc
    // re-delivers clean text — its ZERO row must supersede the old
    // nonzero row and drop it from the report
    val topId = base.head._1
    val lost = (topId, "clean short text")
    mem.addData(lost); q.processAllAvailable()
    q.stop()
    val afterLoss = afterGain.map(t => if (t._1 == topId) lost else t)
    val lossRep = oneShot(afterLoss)
    assert(served() == lossRep)
    assert(!lossRep.map(_._1).contains(topId),
      "the losing revision must drop from the report")

    // tombstoned delete of a currently-reported doc
    val delId = lossRep.head._1
    val tmem = MemoryStream[Long]
    val tq = StreamOps.tombstoneStream(s, tmem.toDF().toDF("doc_id"), state)
    tmem.addData(delId); tq.processAllAvailable()
    tq.stop()
    val afterDel = afterLoss.filter(_._1 != delId)
    assert(served() == oneShot(afterDel),
      "a tombstoned doc must vanish from the served report")

    // compaction: the physical ledger serves the same report; a
    // post-compaction delete heals by anti-join
    StreamOps.compactDecontamState(s, state, s"$dir/ledger")
    assert(StreamOps.decontamCompacted(s, s"$dir/ledger")
      .as[(Long, Long)].collect().toSeq == oneShot(afterDel),
      "compacted must equal direct")
    val del2 = oneShot(afterDel).head._1
    assert(StreamOps.decontamCompacted(s, s"$dir/ledger",
        Some(Seq(del2).toDF("doc_id")))
      .as[(Long, Long)].collect().toSeq ==
      oneShot(afterDel.filter(_._1 != del2)),
      "post-compaction tombstones must heal the compacted report")
  }
}
