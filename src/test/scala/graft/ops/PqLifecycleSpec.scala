package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** PQ lifecycle parity (round 12): the compressed index gets the same
  * filter/delete features the IVF path got in round 11 —
  *
  *  - v129: the serve-time predicate runs on the CODE table below the
  *    ADC rank (post-top-k filtering under-fills k), the attribute
  *    carried onto the code rows at encode (no side table, no raw
  *    floats at serve time), and k fills exactly wherever the filtered
  *    corpus holds ≥ k candidates;
  *  - v130: a delete heals the code table with ONE anti-join (code rows
  *    are independent facts), and the healed index is indistinguishable
  *    from a from-scratch encode of the survivors at the same frozen
  *    codebooks.
  */
class PqLifecycleSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def sameSet(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0

  test("v129: exact-k fill, every served neighbor satisfies the predicate") {
    val out = VectorOps.v129FilteredPq(spark, sf).persist()
    CacheRegistry.harness.add(out)
    // exactly k = 3 rows per query (PQ scores the whole filtered corpus,
    // so the candidate pool is every even-label vector — far more than k)
    val perQuery = out.groupBy("query_id").count().collect()
    assert(perQuery.length == 5 && perQuery.forall(_.getLong(1) == 3L),
      perQuery.mkString(","))
    // no odd-label neighbor can be served
    val labels = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").as("neighbor_id"), col("label"))
    assert(out.join(labels, Seq("neighbor_id"))
      .filter(col("label") % 2 =!= 0).count() == 0)
    CacheRegistry.harness.release()
  }

  test("v130: the healed code table IS the survivor-only encode") {
    val subs = CacheRegistry.harness.add(VectorOps.pqSubvectors(
      spark.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))).persist())
    val evenSubs = subs.filter(col("vec_id") % 2 === 0)
    val oddSubs = subs.filter(col("vec_id") % 2 === 1)
    val cb = CacheRegistry.harness.add(
      VectorOps.trainPqCodebooksOn(spark, evenSubs,
        col("vec_id") < 2 * VectorOps.PqK).persist())
    val codes1 = VectorOps.incrementalPqIngest(spark, cb,
      VectorOps.encodePq(spark, subs.filter(lit(false)), cb), evenSubs)
    val codes2 = VectorOps.incrementalPqIngest(spark, cb, codes1, oddSubs)
    val deleted = subs.select("vec_id").distinct()
      .filter(col("vec_id") % 7 === 3)
    val healed = codes2.join(deleted, Seq("vec_id"), "left_anti")
    // table-level identity, not just top-k identity: the healed code
    // table equals encoding ONLY the survivors (delete ≡ never ingested)
    val survivorCodes = VectorOps.encodePq(spark,
      subs.join(deleted, Seq("vec_id"), "left_anti"), cb)
    assert(sameSet(healed, survivorCodes))
    // and no deleted vec_id can be served by the ranked query
    assert(VectorOps.v130TombstonePq(spark, sf)
      .filter(col("neighbor_id") % 7 === 3).count() == 0)
    CacheRegistry.harness.release()
  }
}
