package graft.ops

import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** Pipeline observability via `Dataset.observe`: named metrics computed
  * inline with the job (no second pass over the data), the mechanism a
  * production 100 TB run uses to publish row counts / quality tallies per
  * batch without re-scanning.
  */
class ObservabilitySpec extends SparkSpec {

  test("observe publishes quality metrics without a second scan") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "tiny"),
      (3L, "a longer document with several reasonable words inside it"),
      (4L, "")
    ).toDF("doc_id", "text")
    val observed = docs.observe("quality",
      count(lit(1)).as("n_docs"),
      sum(when(length(col("text")) < 5, 1L).otherwise(0L)).as("n_too_short"),
      sum(length(col("text")).cast("long")).as("total_chars"))
    // one action drives both the pipeline and the metrics (read them from
    // the executed query — a derived DataFrame has its own QueryExecution)
    val filtered = observed.filter(length(col("text")) >= 5)
    assert(filtered.collect().length == 2) // collect() executes THIS plan
    val metrics = filtered.queryExecution.observedMetrics("quality")
    assert(metrics.getAs[Long]("n_docs") == 4L)
    assert(metrics.getAs[Long]("n_too_short") == 2L)
    assert(metrics.getAs[Long]("total_chars") > 0L)
  }
}
