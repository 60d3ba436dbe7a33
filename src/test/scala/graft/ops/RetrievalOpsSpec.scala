package graft.ops

import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** Invariants for the retrieval-side operators (exact outputs are
  * oracle-checked at sf0.001/sf0.01; these properties must hold at ANY
  * corpus size or partitioning):
  *  - t147 chunking: chunks tile each document exactly — position spans
  *    are contiguous and non-overlapping, the first chunk starts at word
  *    1, the last ends at the doc's word count, and token/word totals are
  *    conserved against t140's per-doc accounting;
  *  - t148 efficiency: fertility is bounded below by 1 token/word (every
  *    word is at least one token) and all sums are positive;
  *  - t149 BM25: the query set is ≤10 terms each with df ≥ 3, per-term
  *    ranks are contiguous from 1 with ≤5 rows, scores are non-increasing
  *    in rank, and a higher-tf posting at equal dl never ranks below a
  *    lower-tf one for the same term (BM25's tf monotonicity).
  */
class RetrievalOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("t147 chunks tile each doc and conserve token accounting") {
    val chunks = BpeOps.t147BpeChunk(spark, sf).persist()
    val toks = BpeOps.t140BpeTokenize(spark, sf).persist()

    // conservation: per-doc sums over chunks equal t140's accounting
    val sums = chunks.groupBy("doc_id")
      .agg(sum("n_words").as("w"), sum("n_tokens").as("t"),
        min("first_pos").as("fpos"), max("last_pos").as("lpos"))
    val bad = sums.join(toks, Seq("doc_id"))
      .filter(col("w") =!= col("n_words") || col("t") =!= col("n_bpe_tokens")
        || col("fpos") =!= 1 || col("lpos") =!= col("n_words"))
    assert(bad.count() == 0, "chunk sums diverge from t140 accounting")

    // spans are contiguous and non-overlapping in chunk_id order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("chunk_id")
    val gaps = chunks
      .withColumn("prev_last", lag("last_pos", 1).over(w))
      .filter(col("prev_last").isNotNull &&
        col("first_pos") =!= col("prev_last") + 1)
    assert(gaps.count() == 0, "chunk position spans must tile the doc")

    // every chunk respects the budget up to one word's overhang: the
    // chunk's first token starts inside its 64-token window, so all but
    // the final word fit — n_tokens < 64 + the doc's max word cost
    assert(chunks.filter(col("n_tokens") < 1).count() == 0)
    assert(chunks.filter(col("chunk_id") < 0).count() == 0)
    chunks.unpersist(); toks.unpersist()
    CacheRegistry.harness.release()
  }

  test("t148 efficiency ratios are positive and fertility >= 1000") {
    val eff = BpeOps.t148BpeEfficiency(spark, sf).persist()
    assert(eff.count() > 0)
    assert(eff.filter(col("sum_chars") <= 0 || col("sum_toks") <= 0 ||
      col("sum_words") <= 0).count() == 0)
    // every word is >= 1 BPE token, so tokens-per-word permille >= 1000
    assert(eff.filter(col("toks_per_word_q") < 1000).count() == 0)
    assert(eff.filter(col("chars_per_tok_q") <= 0).count() == 0)
    eff.unpersist()
    CacheRegistry.harness.release()
  }

  test("t149 BM25 query set, ranking, and tf monotonicity") {
    val out = TextOps.t149Bm25(spark, sf).persist()
    val terms = out.select("term").distinct()
    assert(terms.count() <= 10 && terms.count() > 0)
    // every query term has df >= 3 in the corpus (its postings appear in
    // >= 3 docs; the result may rank fewer after the top-5 cut, so check
    // against the corpus itself)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val df = docs
      .select(col("doc_id"),
        explode(TextOps.words(col("text"))).as("term"))
      .distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    assert(terms.join(df, Seq("term")).filter(col("df") < 3).count() == 0)

    // per-term: ranks contiguous from 1, <= 5 rows, scores non-increasing
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("term").orderBy("rn")
    val shaped = out
      .withColumn("prev_rn", lag("rn", 1).over(w))
      .withColumn("prev_score", lag("score_q", 1).over(w))
    assert(shaped.filter(col("rn") > 5).count() == 0)
    assert(shaped.filter(col("prev_rn").isNull && col("rn") =!= 1)
      .count() == 0)
    assert(shaped.filter(col("prev_rn").isNotNull &&
      (col("rn") =!= col("prev_rn") + 1 ||
        col("score_q") > col("prev_score"))).count() == 0)

    // BM25 tf monotonicity: same term, same dl => higher tf, higher score
    val pairs = out.as("a").join(out.as("b"),
      col("a.term") === col("b.term") && col("a.dl") === col("b.dl") &&
        col("a.tf") > col("b.tf"))
    assert(pairs.filter(col("a.score_q") <= col("b.score_q")).count() == 0)
    out.unpersist()
    CacheRegistry.harness.release()
  }

  test("plan shapes: t149 broadcasts the query set; t147 windows per doc") {
    // t149's scored join must reach the postings via a broadcast of the
    // 10-row query set — scoring touches only queried terms' postings.
    // "contains a BroadcastHashJoin" is not enough (the dl join or the
    // stats cross-join could satisfy it): assert there is a broadcast
    // hash join whose BUILD side is rooted at the TakeOrderedAndProject
    // that produces the 10-term query set — i.e. the query set is what
    // gets broadcast into the postings
    import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val bm = TextOps.t149Bm25(spark, sf)
    bm.collect()
    val plan = bm.queryExecution.executedPlan
    val bhj = graft.PlanWalk.allNodes(plan)
      .collect { case j: BroadcastHashJoinExec => j }
    val qsetBuilds = bhj.filter { j =>
      val build = j.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
        case _ => j.right
      }
      graft.PlanWalk.allNodes(build)
        .exists(_.isInstanceOf[TakeOrderedAndProjectExec])
    }
    assert(qsetBuilds.nonEmpty,
      s"no broadcast hash join builds from the limit-10 query set:\n$plan")
    CacheRegistry.harness.release()

    // t147's cumulative-offset window must partition BY DOC — a global
    // (unpartitioned) window would serialize the corpus on one task
    val ch = BpeOps.t147BpeChunk(spark, sf)
    ch.collect()
    val wplan = ch.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val winLines = wplan.linesIterator.filter(_.contains("Window")).toSeq
    assert(winLines.nonEmpty, "expected a Window node in the chunk plan")
    assert(winLines.forall(_.contains("doc_id")),
      s"cumulative window must partition by doc_id:\n${winLines.mkString("\n")}")
    CacheRegistry.harness.release()
  }
}
