package graft.ops

import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** Invariants for the round-18 operators (exact outputs are
  * oracle-checked at sf0.001/sf0.01; these properties must hold at ANY
  * corpus size or partitioning):
  *  - d175 suite onboarding: the state probe is hash-indistinguishable
  *    from the stateless one-shot check at the unseen fold, the replayed
  *    wave never double-counts a gram, and no roster doc is flagged;
  *  - t176 per-suite attribution: the Bloom pre-filter stays
  *    RESULTS-INVISIBLE in front of the per-suite exact check, each
  *    (doc, suite) count equals the doc's overlap with THAT suite's
  *    grams, and the plan keeps the t174 shape (scalar-subquery bloom,
  *    broadcast confirm, bounded top-N);
  *  - v177 semantic-dedup recall: the audit's counters are internally
  *    consistent (hits bounded by truth and candidates, truth monotone
  *    in the floor, ratios in basis-point range) and the candidate set
  *    is exactly v83's same-final-cluster pair set on the sample;
  *  - the bloom temp views are dropped, not leaked per invocation.
  */
class Round18OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("d175 state probe ≡ the stateless one-shot at the unseen fold, " +
      "replay dropped exactly") {
    val s = spark
    val got = TextOps.d175SuiteOnboard(s, sf).collect().map(_.toSeq).toSeq
    CacheRegistry.harness.release()

    // the stateless one-shot twin at the same fold (t172's shape)
    val docs = graft.Tables.documents(s, sf).select("doc_id", "text")
    val roster = TextOps.fixedSuiteRoster(docs,
      TextOps.OnboardSuiteMod, TextOps.OnboardSuiteRem)
    val evalGrams = TextOps.shingleTableN(
        docs.join(broadcast(roster), Seq("doc_id"), "left_semi"), 5)
      .select("sh").distinct()
    val oneShot = TextOps.decontamReport(TextOps.decontamCountsOn(
        TextOps.shingleTableN(
          docs.join(broadcast(roster), Seq("doc_id"), "left_anti"), 5),
        evalGrams))
      .collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == oneShot,
      "onboarding from state must equal the stateless one-shot check")

    // replay exactness: the novelty gate must make the accumulated
    // postings the one-shot shingle table, no double-counted grams
    val b1 = docs.filter(col("doc_id") % 2 === 0)
    val b2 = docs.filter(col("doc_id") % 2 === 1)
      .unionByName(docs.filter(col("doc_id") % 20 === 0))
    val novel2 = b2.join(b1.select("doc_id"), Seq("doc_id"), "left_anti")
    val statePosts = TextOps.shingleTableN(b1, 5)
      .unionByName(TextOps.shingleTableN(novel2, 5))
    assert(statePosts.count() == TextOps.shingleTableN(docs, 5).count(),
      "the novelty-gated postings must BE the one-shot shingle table")

    // the frozen roster is eval data — never flagged
    val rosterIds = roster.collect().map(_.getLong(0)).toSet
    assert(got.forall(r => !rosterIds.contains(r(0).asInstanceOf[Long])),
      "a roster doc must never be flagged as contaminated train")
  }

  test("t176 bloom stays results-invisible in front of the per-suite " +
      "exact check; plan keeps the t174 shape") {
    val s = spark
    val got = TextOps.t176SuiteAttribution(s, sf)
    val rows = got.collect().map(_.toSeq).toSeq
    // executed-plan assertions (AQE finalized by the collect above)
    val plan = got.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("isFinalPlan=true"),
      s"the collect above must have finalized the adaptive plan:\n$plan")
    CacheRegistry.harness.release()
    assert(plan.contains("bloom_might_contain"),
      s"the bloom pre-filter must appear in the scan-side filter:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the bloom blob must ride a scalar subquery, never a crossJoin:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the per-suite confirm must broadcast the tagged gram set:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no corpus-side shuffle join in the check:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"the top-N must be per-partition top-k, not a global sort:\n$plan")

    // exact twin WITHOUT the bloom stage
    val docs = graft.Tables.documents(s, sf).select("doc_id", "text")
    val idSuite = TextOps.MultiSuiteFolds.zipWithIndex
      .map { case ((m, r), i) =>
        TextOps.fixedSuiteRoster(docs, m, r)
          .select(col("doc_id"), lit(i.toLong).as("suite"))
      }.reduce(_.unionByName(_)).persist()
    val unionIds = idSuite.select("doc_id").distinct()
    val suiteGrams = TextOps.shingleTableN(
        docs.join(broadcast(unionIds), Seq("doc_id"), "left_semi"), 5)
      .join(broadcast(idSuite), Seq("doc_id"))
      .select("suite", "sh").distinct()
    val exact = TextOps.shingleTableN(
        docs.join(broadcast(unionIds), Seq("doc_id"), "left_anti"), 5)
      .join(broadcast(suiteGrams), Seq("sh"))
      .groupBy("doc_id", "suite").agg(count(lit(1)).as("n_overlap"))
      .orderBy(col("n_overlap").desc, col("doc_id"), col("suite"))
      .limit(TextOps.DecontamTopN)
      .collect().map(_.toSeq).toSeq
    idSuite.unpersist()
    assert(rows.nonEmpty && rows == exact,
      "the bloom stage must be results-invisible vs the exact form")
    // attribution is per-suite: at least one doc must attribute to a
    // specific suite, and every suite id must be a declared fold index
    val suites = rows.map(_(1).asInstanceOf[Long]).toSet
    assert(suites.subsetOf(
      TextOps.MultiSuiteFolds.indices.map(_.toLong).toSet))
  }

  test("v177 counters are internally consistent and the candidates are " +
      "v83's same-cluster pairs on the sample") {
    val s = spark
    val rows = VectorOps.v177SemdedupRecall(s, sf).collect()
    CacheRegistry.harness.release()
    assert(rows.length == VectorOps.SemRecallFloors.length)
    val nCands = rows.map(_.getLong(2)).distinct
    assert(nCands.length == 1,
      "the candidate count is floor-independent by construction")
    rows.foreach { r =>
      val (truth, cand, hit) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (recQ, precQ, ok) = (r.getLong(4), r.getLong(5), r.getBoolean(6))
      assert(hit <= truth && hit <= cand,
        "hits are an intersection — bounded by both sides")
      assert(recQ >= 0 && recQ <= 10000 && precQ >= 0 && precQ <= 10000)
      val minQ = VectorOps.SemRecallFloorMinQ(r.getLong(0))
      assert(ok == (truth == 0 || recQ >= minQ),
        "recall_ok must be derivable from the row itself")
    }
    // truth counts are monotone non-increasing in the floor
    val truths = rows.sortBy(_.getLong(0)).map(_.getLong(1)).toSeq
    assert(truths == truths.sorted.reverse,
      "raising the cosine floor can only shrink the truth set")
    // the audit must be measuring a LOSSY generator against a real truth
    // set at the dedup floor (0.35): some truth, not all of it recalled
    val atDedup = rows.find(_.getLong(0) == 35L).get
    assert(atDedup.getLong(1) > 0, "no truth pairs at the dedup floor — " +
      "the audit would be vacuous at this sf")
    assert(atDedup.getLong(3) < atDedup.getLong(1),
      "cluster scoping misses cross-cluster near-dups by construction")
  }

  test("the bloom temp views are dropped, not leaked per invocation") {
    val s = spark
    def bloomViews(): Seq[String] =
      s.catalog.listTables().collect().map(_.name)
        .filter(n => n.startsWith("t109_bloom_") ||
          n.startsWith("t174_bloom_") || n.startsWith("t176_bloom_")).toSeq
    val before = bloomViews()
    TextOps.t109BloomDecontaminate(s, sf).count()
    TextOps.t174MultiSuiteDecontam(s, sf).count()
    TextOps.t176SuiteAttribution(s, sf).count()
    CacheRegistry.harness.release()
    assert(bloomViews() == before,
      "each invocation must drop its call-unique bloom view")
  }
}
