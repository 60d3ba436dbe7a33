package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** Residual IVF+PQ (v133): PQ quantizes v − centroid(list) instead of the
  * raw vector. The spec pins:
  *
  *  - the CLAIM the encoding exists for, executably: at the identical M×K
  *    code budget, residual codes reconstruct strictly better than raw
  *    codes (decode error of residual codewords against residual
  *    subvectors IS the full-vector error of centroid+decode against the
  *    original — the centroid term cancels — so the two MSEs compare
  *    directly);
  *  - output discipline: exact-k fill and probed-list soundness, as for
  *    the raw combined index;
  *  - serving: the SAME clabel-bucketed layout serves residual codes — the
  *    probe equals the in-memory scan, and the serve-time tombstone heal
  *    holds (the LUT side differs from v132, the state side does not).
  */
class ResidualPqSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def sameSet(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0

  private def fixture() = {
    val emb = CacheRegistry.harness.add(
      spark.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id"), col("label"), col("embedding")).persist())
    val cent = CacheRegistry.harness.add(
      VectorOps.ivfCodebookOn(emb).persist())
    val assigned = CacheRegistry.harness.add(
      VectorOps.assignToIvfLists(spark, emb, cent).persist())
    val rsubs = CacheRegistry.harness.add(
      VectorOps.pqSubvectors(VectorOps.residualOf(assigned, cent),
        carry = Seq("clabel")).persist())
    val rcb = CacheRegistry.harness.add(
      VectorOps.trainPqCodebooksOn(spark, rsubs,
        col("vec_id") < VectorOps.PqK).persist())
    val rcodes = CacheRegistry.harness.add(
      VectorOps.encodePq(spark, rsubs, rcb, carry = Seq("clabel")).persist())
    val probes = CacheRegistry.harness.add(VectorOps.ivfQueryProbes(spark,
      emb.filter(col("vec_id") < 5), cent).persist())
    (emb, cent, assigned, rsubs, rcb, rcodes, probes)
  }

  /** Mean per-(vector, subspace) squared decode error of a code table
    * against the subvectors it encodes.
    */
  private def decodeMse(subs: DataFrame, codes: DataFrame,
      cb: DataFrame): Double =
    codes.join(subs, Seq("vec_id", "m"))
      .join(broadcast(cb), Seq("m", "cid"))
      .select(aggregate(zip_with(col("sub"), col("cvec"),
        (a, b) => (a - b) * (a - b)), lit(0.0d), (acc, x) => acc + x)
        .as("sse"))
      .agg(avg("sse")).head.getDouble(0)

  test("residual codes reconstruct strictly better at the same budget") {
    val (_, cent, assigned, rsubs, rcb, rcodes, _) = fixture()
    // raw chain at the identical budget (the v132 encoding)
    val subs = CacheRegistry.harness.add(
      VectorOps.pqSubvectors(assigned, carry = Seq("clabel")).persist())
    val cb = CacheRegistry.harness.add(
      VectorOps.trainPqCodebooksOn(spark, subs,
        col("vec_id") < VectorOps.PqK).persist())
    val codes = VectorOps.encodePq(spark, subs, cb, carry = Seq("clabel"))
    val rawMse = decodeMse(subs.select("vec_id", "m", "sub"), codes, cb)
    val residMse = decodeMse(rsubs.select("vec_id", "m", "sub"), rcodes, rcb)
    assert(residMse < rawMse,
      s"residual MSE $residMse not below raw MSE $rawMse")
    CacheRegistry.harness.release()
  }

  test("v133: exact-k fill and probed-list soundness") {
    val (_, _, assigned, _, _, _, probes) = fixture()
    val out = CacheRegistry.harness.add(
      VectorOps.v133IvfPqResidual(spark, sf).persist())
    val perQuery = out.groupBy("query_id").count().collect()
    assert(perQuery.length == 5 && perQuery.forall(_.getLong(1) == 3L),
      perQuery.mkString(","))
    val member = assigned.select(col("vec_id").as("neighbor_id"),
      col("clabel"))
    val outside = out.join(member, Seq("neighbor_id"))
      .join(probes.select("query_id", "clabel"),
        Seq("query_id", "clabel"), "left_anti")
    assert(outside.count() == 0)
    CacheRegistry.harness.release()
  }

  test("residual codes serve from the bucketed layout with the heal") {
    val wh = graft.betfair.Fixtures.tempDir("rivfpqstate")
    spark.sql("DROP TABLE IF EXISTS g_rivfpq_state")
    val (_, cent, _, _, rcb, rcodes, probes) = fixture()
    val lut = CacheRegistry.harness.add(
      VectorOps.residualLut(spark, probes, cent, rcb).persist())
    VectorOps.writeIvfPqBucketedState(rcodes, "g_rivfpq_state",
      s"$wh/g_rivfpq_state")
    val served = VectorOps.probeIvfPqResidualState(spark, "g_rivfpq_state",
      lut)
    val expected = VectorOps.v133IvfPqResidual(spark, sf)
      .select("query_id", "neighbor_id", "approx_r")
    assert(sameSet(VectorOps.pqTopK(served)
      .select("query_id", "neighbor_id", "approx_r"), expected))
    // serve-time tombstone heal: deleted vec_ids vanish, nothing else
    val dead = rcodes.select("vec_id").distinct()
      .filter(col("vec_id") % 7 === 3)
    val healed = VectorOps.probeIvfPqResidualState(spark, "g_rivfpq_state",
      lut, tombstones = Some(dead))
    assert(healed.join(dead.withColumnRenamed("vec_id", "neighbor_id"),
      Seq("neighbor_id"), "left_semi").count() == 0)
    // Seq-key anti-joins move the key column first — re-select by name
    // before the positional exceptAll compare
    assert(sameSet(healed.select("query_id", "neighbor_id", "sim"),
      served.join(dead.withColumnRenamed("vec_id", "neighbor_id"),
          Seq("neighbor_id"), "left_anti")
        .select("query_id", "neighbor_id", "sim")))
    CacheRegistry.harness.release()
    spark.sql("DROP TABLE IF EXISTS g_rivfpq_state")
  }
}
