package graft.ops

import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** [[TextOps.t94PerplexityBuckets]] — the CCNet head/middle/tail cut:
  * buckets must partition the corpus into contiguous score bands with
  * every doc labeled and the ordering head ≤ middle ≤ tail on the LM
  * score (head = most-fluent-under-the-LM third, what CCNet trains on).
  */
class PerplexitySpec extends SparkSpec {

  test("buckets partition the corpus into contiguous score bands") {
    val out = TextOps.t94PerplexityBuckets(spark, "/root/testdata/sf0.001")
      .persist()
    CacheRegistry.harness.add(out)
    val total = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert(out.count() == total)
    val byBucket = out.groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min("lm_score").as("mn"), max("lm_score").as("mx"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    // tertile cut: each band holds roughly a third of the corpus
    byBucket.values.foreach { case (n, _, _) =>
      assert(n >= total / 5 && n <= total / 2, byBucket)
    }
    // contiguous bands: max(head) <= min(middle), max(middle) <= min(tail)
    assert(byBucket("head")._3 <= byBucket("middle")._2, byBucket)
    assert(byBucket("middle")._3 <= byBucket("tail")._2, byBucket)
    CacheRegistry.harness.release()
  }
}
