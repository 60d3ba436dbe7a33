package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec
import graft.ops.VectorOps

/** Streaming lifecycle of the combined residual IVF+PQ index (v133):
  * ingest accumulates (vec_id, clabel, M ids) micro-batch partitions
  * against FROZEN coarse + residual codebooks, the query path serves the
  * one-shot v133 answer with tombstones healed, and compaction lands the
  * clabel-BUCKETED serving layout (replace-not-double) that
  * `probeIvfPqResidualState` then serves identically.
  */
class IvfPqStreamSpec extends SparkSpec {

  test("ivfpq ingest stream accumulates list-carrying code rows; query " +
      "serves the one-shot answer; tombstones heal; compaction lands the " +
      "bucketed layout and replaces on re-run") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = Files.createTempDirectory("ivfpqindex").toString
    val state = s"$dir/codes"
    val centroidPath = s"$dir/centroids"
    val codebookPath = s"$dir/codebook"
    s.sql("DROP TABLE IF EXISTS g_sivfpq_state")
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding")).persist()
    graft.ops.CacheRegistry.harness.add(emb)
    // offline step 1: frozen coarse centroids over the full corpus
    VectorOps.ivfCodebookOn(emb).write.mode("overwrite").parquet(centroidPath)
    val cent = s.read.parquet(centroidPath)
    // offline step 2: frozen RESIDUAL codebooks on the even half
    val evenAssigned = VectorOps.assignToIvfLists(s,
      emb.filter(col("vec_id") % 2 === 0), cent)
    VectorOps.trainPqCodebooksOn(s,
        VectorOps.pqSubvectors(VectorOps.residualOf(evenAssigned, cent)),
        col("vec_id") < 2 * VectorOps.PqK)
      .write.mode("overwrite").parquet(codebookPath)
    val cb = s.read.parquet(codebookPath)
    val vecs = emb.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect()
    val (b1, b2) = vecs.partition(_._1 % 2 == 0)
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = StreamOps.ivfPqIngestStream(s,
      mem.toDF().toDF("vec_id", "embedding"), centroidPath, codebookPath,
      state)
    mem.addData(b1.toSeq: _*)
    q.processAllAvailable()
    mem.addData(b2.toSeq: _*)
    q.processAllAvailable()
    q.stop()
    // M code rows per vector, each carrying its coarse list id
    val raw = s.read.parquet(state)
    assert(raw.count() == vecs.length.toLong * VectorOps.PqM)
    assert(raw.columns.contains("clabel"))
    val queries = emb.filter(col("vec_id") < 5)
    val probes = VectorOps.ivfQueryProbes(s, queries, cent)
    // one-shot at the SAME frozen artifacts == the v133 identity
    def expectedOver(vs: org.apache.spark.sql.DataFrame) = {
      val assigned = VectorOps.assignToIvfLists(s, vs, cent)
      val codes = VectorOps.encodePq(s,
        VectorOps.pqSubvectors(VectorOps.residualOf(assigned, cent),
          carry = Seq("clabel")), cb, carry = Seq("clabel"))
      VectorOps.pqTopK(VectorOps.listLutAdcScore(codes,
        VectorOps.residualLut(s, probes, cent, cb)))
    }
    val served = StreamOps.ivfPqIndexQuery(s, state, centroidPath,
      codebookPath, queries)
    val expected = expectedOver(emb)
    assert(served.exceptAll(expected).count() == 0 &&
      expected.exceptAll(served).count() == 0)
    assert(served.count() > 0)
    // tombstones: the query path heals
    emb.filter(col("vec_id") % 7 === 3).select("vec_id")
      .write.parquet(s"$state.tombstones/batch=0")
    val expectedLive = expectedOver(emb.filter(col("vec_id") % 7 =!= 3))
    val servedLive = StreamOps.ivfPqIndexQuery(s, state, centroidPath,
      codebookPath, queries)
    assert(servedLive.exceptAll(expectedLive).count() == 0 &&
      expectedLive.exceptAll(servedLive).count() == 0)
    // compaction: bucketed layout, deletes physical, re-run replaces
    StreamOps.compactIvfPqCodes(s, state, "g_sivfpq_state",
      s"$dir/g_sivfpq_state")
    assert(s.table("g_sivfpq_state").filter(col("vec_id") % 7 === 3)
      .count() == 0)
    val n1 = s.table("g_sivfpq_state").count()
    StreamOps.compactIvfPqCodes(s, state, "g_sivfpq_state",
      s"$dir/g_sivfpq_state")
    assert(s.table("g_sivfpq_state").count() == n1,
      "re-running the compaction must replace, not double")
    val servedCompact = VectorOps.pqTopK(
      VectorOps.probeIvfPqResidualState(s, "g_sivfpq_state",
        VectorOps.residualLut(s, probes, cent, cb)))
    assert(servedCompact.exceptAll(expectedLive).count() == 0 &&
      expectedLive.exceptAll(servedCompact).count() == 0)
    s.sql("DROP TABLE IF EXISTS g_sivfpq_state")
    graft.ops.CacheRegistry.harness.release()
  }
}
