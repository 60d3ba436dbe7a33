package graft.ops

import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** t112 hashed linear classifier: plan shape (broadcast model, no
  * feature-key shuffle) and scoring invariants the oracle hash can't state.
  */
class ClassifierSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("t112: model join is broadcast; tokens never shuffle on the feature key") {
    val df = TextOps.t112QualityClassifier(spark, sf)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"model join is not broadcast:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(bucket#") &&
      !plan.contains("Exchange hashpartitioning(feat#"),
      s"feature stream shuffled on feature/bucket key:\n$plan")
  }

  test("t112: every non-null-text doc is scored; n_feats = 2*tokens - 1") {
    val out = TextOps.t112QualityClassifier(spark, sf).persist()
    CacheRegistry.harness.add(out)
    val docs = graft.Tables.documents(spark, sf)
      .filter(col("text").isNotNull)
    assert(out.count() == docs.count())
    // unigrams (n) + adjacent bigrams (n-1): feature count is exactly
    // 2n-1 for every doc (n >= 1 always — split('') = [''])
    val toks = docs.select(col("doc_id"),
      size(split(trim(lower(col("text"))), "\\s+")).cast("long").as("n"))
    val bad = out.join(toks, "doc_id")
      .filter(col("n_feats") =!= col("n") * 2 - 1)
    assert(bad.count() == 0, s"feature-count mismatch: ${bad.head(3).mkString}")
    // the md5-derived weights are sign-balanced enough that both labels
    // must appear over any non-trivial corpus
    assert(out.select("label").distinct().count() == 2)
    CacheRegistry.harness.release()
  }
}
