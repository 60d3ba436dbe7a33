package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** Two-stage serving (v134): ADC shortlist + exact re-rank. Pins the
  * pattern's contract:
  *
  *  - recall dominance, executably: per query, the re-ranked top-3 hits
  *    at least as many brute-force ground-truth neighbors as the pure ADC
  *    top-3 (a theorem — any GT member of the ADC top-3 is in the
  *    shortlist, where at most its true superiors outrank it — so a
  *    violation is a bug, not data noise);
  *  - cost bound: the exact-cosine stage touches exactly
  *    queries × RerankR rows, never the corpus;
  *  - the re-rank is the brute-force ranking RESTRICTED to shortlist
  *    members — stage 2 never invents a score.
  */
class RerankSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def hitsPerQuery(topk: DataFrame, truth: DataFrame): DataFrame =
    topk.join(truth, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").count().withColumnRenamed("count", "hits")

  test("v134: rerank recall >= ADC recall per query; cost is queries x R") {
    graft.expressions.GraftFunctions.register(spark)
    val emb = CacheRegistry.harness.add(
      spark.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id"), col("label"), col("embedding")).persist())
    // brute-force ground truth top-3 per query (vec_id < 5), self excluded
    val q = emb.select(col("vec_id").as("query_id"),
      col("embedding").as("qv")).filter(col("query_id") < 5)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("ex").desc, col("neighbor_id"))
    val truth = CacheRegistry.harness.add(
      emb.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          expr("cosine_sim(qv, embedding)").as("ex"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3).select("query_id", "neighbor_id")
        .persist())
    val adc = CacheRegistry.harness.add(
      VectorOps.v133IvfPqResidual(spark, sf)
        .select("query_id", "neighbor_id").persist())
    val rerank = CacheRegistry.harness.add(
      VectorOps.v134IvfPqRerank(spark, sf).persist())
    val adcHits = hitsPerQuery(adc, truth)
      .withColumnRenamed("hits", "adc_hits")
    val rrHits = hitsPerQuery(rerank.select("query_id", "neighbor_id"),
      truth).withColumnRenamed("hits", "rr_hits")
    val joined = adcHits.join(rrHits, Seq("query_id"), "full")
      .select(col("query_id"), coalesce(col("adc_hits"), lit(0L)).as("a"),
        coalesce(col("rr_hits"), lit(0L)).as("r")).collect()
    assert(joined.nonEmpty)
    joined.foreach(row => assert(row.getLong(2) >= row.getLong(1),
      s"query ${row.get(0)}: rerank hits ${row.getLong(2)} < " +
        s"ADC hits ${row.getLong(1)}"))
    // exact-k fill
    val perQuery = rerank.groupBy("query_id").count().collect()
    assert(perQuery.length == 5 && perQuery.forall(_.getLong(1) == 3L))
    CacheRegistry.harness.release()
  }

  test("v134: stage 2 equals brute force restricted to the shortlist") {
    graft.expressions.GraftFunctions.register(spark)
    val emb = CacheRegistry.harness.add(
      spark.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id"), col("label"), col("embedding")).persist())
    val rerank = CacheRegistry.harness.add(
      VectorOps.v134IvfPqRerank(spark, sf).persist())
    // reconstruct the shortlist from v133's candidate scores
    val shortlist = VectorOps.pqTopK(
        VectorOps.ivfPqResidualCands(spark, sf), k = VectorOps.RerankR)
      .select("query_id", "neighbor_id")
    // cost bound: the exact stage's input is exactly queries × R rows
    assert(shortlist.count() == 5L * VectorOps.RerankR)
    // shortlist membership: every served row is a shortlist member
    assert(rerank.join(shortlist, Seq("query_id", "neighbor_id"),
      "left_anti").count() == 0)
    // and the served ORDER is the exact-cosine order within the shortlist:
    // recomputing the exact score for served rows reproduces exact_r
    val q = emb.select(col("vec_id").as("query_id"),
      col("embedding").as("qv"))
    val nb = emb.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("nv"))
    val recomputed = rerank.join(nb, Seq("neighbor_id"))
      .join(q, Seq("query_id"))
      .filter(round(expr("cosine_sim(qv, nv)"), 4) =!= col("exact_r"))
    assert(recomputed.count() == 0)
    CacheRegistry.harness.release()
  }
}
