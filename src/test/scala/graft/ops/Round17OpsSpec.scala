package graft.ops

import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** Invariants for the round-17 operators (exact outputs are
  * oracle-checked at sf0.001/sf0.01; these properties must hold at ANY
  * corpus size or partitioning):
  *  - t174 multi-suite decontamination: the Bloom pre-filter is
  *    RESULTS-INVISIBLE (bit-equal to the exact form without it), it
  *    reaches the plan as a scalar-subquery literal (never a blob
  *    crossJoin), the exact confirm broadcasts, and the top-N is
  *    TakeOrderedAndProject;
  *  - t170 training plane: the packed boundary map accounts for exactly
  *    the mixture-drawn docs, and the draw is a subset of the clean
  *    selection — the stage interfaces compose with no loss.
  *  - t172 fixed-eval decontamination: no fold doc is ever flagged, the
  *    report is bounded and ordered (the t163 invariants on the frozen
  *    artifact).
  */
class Round17OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("t174 bloom pre-filter is results-invisible and plan-shaped right") {
    val s = spark
    val got = TextOps.t174MultiSuiteDecontam(s, sf)
    val rows = got.collect().map(_.toSeq).toSeq
    // plan assertions on the EXECUTED first invocation: before an action,
    // AQE has not run and the plan string has no '== Initial Plan =='
    // marker — the split would no-op and the assertions would silently
    // check the initial plan, missing an AQE runtime downgrade (e.g. to
    // SortMergeJoin)
    val plan = got.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("isFinalPlan=true"),
      s"the collect above must have finalized the adaptive plan:\n$plan")
    CacheRegistry.harness.release()

    // exact twin WITHOUT the bloom stage
    val docs = graft.Tables.documents(s, sf).select("doc_id", "text")
    val evalIds = TextOps.MultiSuiteFolds.map { case (m, r) =>
        docs.filter(col("doc_id") % m === r)
          .select("doc_id").orderBy("doc_id").limit(TextOps.DecontamFixedEvalK)
      }.reduce(_.unionByName(_)).distinct().persist()
    val evalGrams = TextOps.shingleTableN(
        docs.join(broadcast(evalIds), Seq("doc_id"), "left_semi"), 5)
      .select("sh").distinct()
    val exact = TextOps.decontamReport(TextOps.decontamCountsOn(
        TextOps.shingleTableN(
          docs.join(broadcast(evalIds), Seq("doc_id"), "left_anti"), 5),
        evalGrams))
      .collect().map(_.toSeq).toSeq
    evalIds.unpersist()
    assert(rows.nonEmpty && rows == exact,
      "the bloom stage must be results-invisible vs the exact form")

    // plan: scalar-subquery bloom literal, broadcast exact confirm,
    // bounded report (AQE prints the plan twice — use the final section)
    assert(plan.contains("bloom_might_contain"),
      s"the bloom pre-filter must appear in the scan-side filter:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the bloom blob must ride a scalar subquery, never a crossJoin:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the exact confirm must broadcast the union gram set:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no corpus-side shuffle join in the check:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"the top-N must be per-partition top-k, not a global sort:\n$plan")
  }

  test("t170 stages compose losslessly: pack accounts for the draw, " +
      "draw within the selection") {
    val s = spark
    val sel = TextOps.t168CleanSelect(s, sf).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val drawn = TextOps.mixtureSampleOn(
        graft.Tables.documents(s, sf)
          .filter(col("doc_id").isin(sel.toSeq: _*))
          .select("doc_id", "lang"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    CacheRegistry.harness.release()
    assert(drawn.nonEmpty && drawn.subsetOf(sel),
      "the mixture draw must come from the clean selection only")
    val packed = TextOps.t170TrainingPlane(s, sf).collect()
    CacheRegistry.harness.release()
    assert(packed.map(_.getLong(4)).sum == drawn.size,
      "the boundary map must account for every drawn doc exactly once")
  }

  test("t172 flags only non-roster docs, bounded and ordered") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val roster = TextOps.fixedSuiteRoster(docs,
        TextOps.DecontamEvalMod, TextOps.DecontamEvalRem)
      .collect().map(_.getLong(0)).toSet
    val rows = TextOps.t172FixedEvalDecontam(spark, sf).collect()
    CacheRegistry.harness.release()
    assert(rows.nonEmpty && rows.length <= TextOps.DecontamTopN)
    // the frozen ROSTER is the benchmark; a fold doc beyond the cap is
    // ordinary train data and MAY legitimately be flagged (the t174
    // residue convention — in production a doc not in the frozen
    // benchmark IS the corpus)
    assert(rows.forall(r => !roster.contains(r.getLong(0))),
      "a frozen-roster doc must never be flagged as contaminated train")
    assert(rows.forall(_.getLong(1) >= 1L))
    val ov = rows.map(_.getLong(1)).toSeq
    assert(ov == ov.sorted.reverse, "overlap must be non-increasing")
  }
}
