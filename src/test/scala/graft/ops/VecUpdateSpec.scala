package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** Vector-family CDC (v144): a re-embedded batch is tombstone heal +
  * O(batch) re-encode at the FROZEN artifacts. Pins the two claims the
  * oracle's one-shot equality cannot see on its own:
  *
  *  - the revision GENUINELY moves vectors between inverted lists (the
  *    test would be vacuous if every reversed embedding re-assigned to
  *    its old list);
  *  - old codes never serve: the healed table holds exactly one encoding
  *    per vec_id, and for every moved vector it is the NEW list's row —
  *    the stale (old-clabel) encoding is unreachable by construction,
  *    not just outranked.
  */
class VecUpdateSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def sameSet(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0

  test("v144: revisions move vectors between lists and old codes never " +
      "serve") {
    val emb = CacheRegistry.harness.add(
      spark.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id"), col("label"), col("embedding")).persist())
    val cent = CacheRegistry.harness.add(
      VectorOps.ivfCodebookOn(emb).persist())
    val original = CacheRegistry.harness.add(
      VectorOps.assignToIvfLists(spark, emb, cent)
        .select(col("vec_id"), col("clabel").as("old_clabel")).persist())
    val revised = emb.filter(col("vec_id") % 5 === 2)
      .select(col("vec_id"), reverse(col("embedding")).as("embedding"))
    val reassigned = CacheRegistry.harness.add(
      VectorOps.assignToIvfLists(spark, revised, cent)
        .select(col("vec_id"), col("clabel").as("new_clabel")).persist())
    val moved = CacheRegistry.harness.add(original.join(reassigned, "vec_id")
      .filter(col("old_clabel") =!= col("new_clabel")).persist())
    assert(moved.count() > 0,
      "corpus regression: no reversed embedding changed its nearest " +
        "list — the CDC test would be vacuous")

    // rebuild v144's healed code table and check it serves ONLY the new
    // encodings: one (vec_id, m) row per subspace, and for moved vectors
    // its clabel is the NEW list
    val subsO = CacheRegistry.harness.add(VectorOps.pqSubvectors(
      emb.select(col("vec_id"), col("embedding"))).persist())
    val cb = CacheRegistry.harness.add(VectorOps.trainPqCodebooksOn(spark,
      subsO, col("vec_id") < VectorOps.PqK).persist())
    val assigned = VectorOps.assignToIvfLists(spark, emb, cent)
    val codes = VectorOps.encodePq(spark,
      VectorOps.pqSubvectors(assigned, carry = Seq("clabel")), cb,
      carry = Seq("clabel"))
    val updatedIds = emb.filter(col("vec_id") % 5 === 2).select("vec_id")
    val newCodes = VectorOps.encodePq(spark,
      VectorOps.pqSubvectors(VectorOps.assignToIvfLists(spark, revised,
        cent), carry = Seq("clabel")), cb, carry = Seq("clabel"))
    val healed = CacheRegistry.harness.add(
      codes.join(updatedIds, Seq("vec_id"), "left_anti")
        .unionByName(newCodes).persist())
    // exactly one encoding per (vec_id, m)
    assert(healed.groupBy("vec_id", "m").count()
      .filter(col("count") =!= 1).count() == 0,
      "a vec_id serves more than one encoding per subspace")
    // moved vectors carry ONLY their new list id — the old list cannot
    // serve them
    val staleServing = healed.join(moved, "vec_id")
      .filter(col("clabel") =!= col("new_clabel"))
    assert(staleServing.count() == 0, "an old-list code row survived the " +
      "update heal")
    CacheRegistry.harness.release()
  }

  test("v144 == one-shot over the updated corpus at the frozen artifacts" +
      " (in-Spark twin)") {
    val emb = CacheRegistry.harness.add(
      spark.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id"), col("label"), col("embedding")).persist())
    val cent = CacheRegistry.harness.add(
      VectorOps.ivfCodebookOn(emb).persist())
    val subsO = CacheRegistry.harness.add(VectorOps.pqSubvectors(
      emb.select(col("vec_id"), col("embedding"))).persist())
    val cb = CacheRegistry.harness.add(VectorOps.trainPqCodebooksOn(spark,
      subsO, col("vec_id") < VectorOps.PqK).persist())
    // the corpus that always held the revisions
    val embU = CacheRegistry.harness.add(emb.select(col("vec_id"),
      when(col("vec_id") % 5 === 2, reverse(col("embedding")))
        .otherwise(col("embedding")).as("embedding")).persist())
    val assignedU = VectorOps.assignToIvfLists(spark, embU, cent)
    val oneShot = VectorOps.encodePq(spark,
      VectorOps.pqSubvectors(assignedU, carry = Seq("clabel")), cb,
      carry = Seq("clabel"))
    val q = embU.filter(col("vec_id") < 5)
    val probes = VectorOps.ivfQueryProbes(spark, q, cent)
    val expected = VectorOps.pqTopK(VectorOps.ivfPqAdcScore(spark, oneShot,
      VectorOps.pqSubvectors(q), cb, probes))
    assert(sameSet(VectorOps.v144VecUpdateReencode(spark, sf), expected))
    CacheRegistry.harness.release()
  }
}
