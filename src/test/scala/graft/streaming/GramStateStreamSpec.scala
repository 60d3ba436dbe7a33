package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** The streaming gram-postings state: onboarding a never-seen benchmark
  * suite against the accumulated state must equal the stateless one-shot
  * check over the corpus AS IT CURRENTLY STANDS at every lifecycle
  * point — two ingest batches, an exact replay (latest-batch-wins
  * republishes identical grams), a revision that GAINS contamination
  * (re-crawl lands a roster doc's text under a train id), a revision
  * that loses ALL its grams (a <5-word stub — the authoritative
  * version-pointer case: the new version has no postings rows, so only
  * the roster pointer can stop the old grams from counting), a
  * tombstoned delete, and the compacted layout with a post-compaction
  * delete. The one-shot comparator is the shared
  * fixedSuiteRoster/decontamCountsOn/decontamReport tail over the
  * current docs, so the served probe and the batch forms cannot drift.
  */
class GramStateStreamSpec extends SparkSpec {

  private val M = graft.ops.TextOps.OnboardSuiteMod
  private val R = graft.ops.TextOps.OnboardSuiteRem

  test("gram-state onboard == one-shot across replay, revisions, delete, " +
      "compaction") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = Files.createTempDirectory("gramstate").toString
    val state = s"$dir/grams"

    val docs = graft.Tables.documents(s, "/root/testdata/sf0.001")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq

    def oneShot(current: Seq[(Long, String)]): Seq[(Long, Long)] = {
      val df = current.toDF("doc_id", "text")
      val roster = graft.ops.TextOps.fixedSuiteRoster(df, M, R)
      val eg = graft.ops.TextOps.shingleTableN(
          df.join(broadcast(roster), Seq("doc_id"), "left_semi"), 5)
        .select("sh").distinct()
      graft.ops.TextOps.decontamReport(graft.ops.TextOps.decontamCountsOn(
          graft.ops.TextOps.shingleTableN(
            df.join(broadcast(roster), Seq("doc_id"), "left_anti"), 5), eg))
        .as[(Long, Long)].collect().toSeq
    }
    def served(): Seq[(Long, Long)] =
      StreamOps.suiteOnboardServed(s, state, M, R)
        .as[(Long, Long)].collect().toSeq

    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.gramPostingsStream(s,
      mem.toDF().toDF("doc_id", "text"), state)

    // two ingest batches
    val (b1, b2) = docs.partition(_._1 % 2 == 0)
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    val base = oneShot(docs)
    assert(base.nonEmpty, "the fold must flag contaminated train docs")
    assert(served() == base, "two-batch state must serve the one-shot probe")

    // exact replay: every tenth doc re-delivers identical bytes — the
    // latest-wins pointer moves but the gram sets are identical
    mem.addData(docs.filter(_._1 % 10 == 0): _*); q.processAllAvailable()
    assert(served() == base, "an exact replay must not change the probe")

    // revision GAINING contamination: a clean train doc re-crawls to a
    // roster doc's text — it must enter the report
    val rIds = docs.map(_._1).filter(_ % M == R).sorted
      .take(graft.ops.TextOps.DecontamFixedEvalK).toSet
    val flagged = base.map(_._1).toSet
    val cleanId = docs.map(_._1)
      .find(id => !flagged.contains(id) && !rIds.contains(id)).get
    val rosterText = docs.find(t => rIds.contains(t._1)).get._2
    val gained = (cleanId, rosterText)
    mem.addData(gained); q.processAllAvailable()
    val afterGain = docs.map(t => if (t._1 == cleanId) gained else t)
    val gainRep = oneShot(afterGain)
    assert(served() == gainRep)
    assert(gainRep.map(_._1).contains(cleanId),
      "the gaining revision must enter the report")

    // revision losing ALL grams: the top reported doc re-crawls to a
    // <5-word stub — zero postings rows in the new version, so only the
    // roster version pointer can retire its old grams
    val topId = gainRep.head._1
    val lost = (topId, "tiny stub")
    mem.addData(lost); q.processAllAvailable()
    q.stop()
    val afterLoss = afterGain.map(t => if (t._1 == topId) lost else t)
    val lossRep = oneShot(afterLoss)
    assert(served() == lossRep)
    assert(!lossRep.map(_._1).contains(topId),
      "a gramless revision must retire its old grams from the probe")

    // tombstoned delete of a currently-reported doc
    val delId = lossRep.head._1
    val tmem = MemoryStream[Long]
    val tq = StreamOps.tombstoneStream(s, tmem.toDF().toDF("doc_id"), state)
    tmem.addData(delId); tq.processAllAvailable()
    tq.stop()
    val afterDel = afterLoss.filter(_._1 != delId)
    assert(served() == oneShot(afterDel),
      "a tombstoned doc must vanish from the served probe")

    // compaction serves the same probe; a post-compaction delete heals
    StreamOps.compactGramState(s, state, "gram_state_spec", s"$dir/ledger")
    val compacted = StreamOps.suiteOnboardCompacted(s, "gram_state_spec",
      M, R)
    assert(compacted.as[(Long, Long)].collect().toSeq == oneShot(afterDel),
      "compacted must equal direct")
    // the compacted probe is the layout's whole point: BOTH generations
    // scan bucket-pruned (the suite ids prune the roster's doc_id
    // buckets upstream inside the eval-gram fetch; the fetched gram
    // literal prunes the posts generation's sh buckets here), and the
    // probe contains ZERO tokenization — no Generate/explode over text
    // anywhere downstream of the state
    val pplan = compacted.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(pplan.contains("SelectedBucketsCount"),
      s"the eval gram set must bucket-prune the posts scan:\n$pplan")
    assert(!pplan.contains("words") && !pplan.contains("split("),
      s"the compacted onboard probe must not tokenize text:\n$pplan")
    val del2 = oneShot(afterDel).head._1
    assert(StreamOps.suiteOnboardCompacted(s, "gram_state_spec", M, R,
        Some(Seq(del2).toDF("doc_id")))
      .as[(Long, Long)].collect().toSeq ==
      oneShot(afterDel.filter(_._1 != del2)),
      "post-compaction tombstones must heal the compacted probe")
  }
}
