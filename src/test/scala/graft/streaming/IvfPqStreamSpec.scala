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

  test("streaming vector CDC: a re-delivered (revised) vector supersedes " +
      "— latest-batch-wins is the supersede marker generalized to vec_id," +
      " and old-list codes never serve") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = Files.createTempDirectory("ivfpqcdc").toString
    val state = s"$dir/codes"
    val centroidPath = s"$dir/centroids"
    val codebookPath = s"$dir/codebook"
    s.sql("DROP TABLE IF EXISTS g_cdcivfpq_state")
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding")).persist()
    graft.ops.CacheRegistry.harness.add(emb)
    // frozen artifacts, trained BEFORE any update
    VectorOps.ivfCodebookOn(emb).write.mode("overwrite").parquet(centroidPath)
    val cent = s.read.parquet(centroidPath)
    VectorOps.trainPqCodebooksOn(s,
        VectorOps.pqSubvectors(VectorOps.residualOf(
          VectorOps.assignToIvfLists(s, emb, cent), cent)),
        col("vec_id") < VectorOps.PqK)
      .write.mode("overwrite").parquet(codebookPath)
    val cb = s.read.parquet(codebookPath)
    // the updated corpus: vec_id % 5 == 2 re-embedded (reversed)
    val embU = emb.select(col("vec_id"),
      when(col("vec_id") % 5 === 2, reverse(col("embedding")))
        .otherwise(col("embedding")).as("embedding")).persist()
    graft.ops.CacheRegistry.harness.add(embU)
    val originals = emb.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect()
    val revisions = embU.filter(col("vec_id") % 5 === 2)
      .as[(Long, Seq[Float])].collect()
    // batch 1 = the full original corpus; batch 2 = the revision feed —
    // an update IS a re-delivery through the same ingest sink (the
    // updateDedupStream contract on the vector pillar)
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = StreamOps.ivfPqIngestStream(s,
      mem.toDF().toDF("vec_id", "embedding"), centroidPath, codebookPath,
      state)
    mem.addData(originals.toSeq: _*)
    q.processAllAvailable()
    mem.addData(revisions.toSeq: _*)
    q.processAllAvailable()
    q.stop()
    // raw state holds BOTH encodings of a revised vector (2×M rows) —
    // supersession is a read-side rule, not a rewrite
    val raw = s.read.parquet(state)
    val revisedCount = revisions.length.toLong
    assert(raw.filter(col("vec_id") % 5 === 2).count() ==
      2L * revisedCount * VectorOps.PqM)
    // the query path serves the one-shot answer over the UPDATED corpus
    val queries = embU.filter(col("vec_id") < 5)
    val probes = VectorOps.ivfQueryProbes(s, queries, cent)
    val assignedU = VectorOps.assignToIvfLists(s, embU, cent)
    val oneShot = VectorOps.encodePq(s,
      VectorOps.pqSubvectors(VectorOps.residualOf(assignedU, cent),
        carry = Seq("clabel")), cb, carry = Seq("clabel"))
    val expected = VectorOps.pqTopK(VectorOps.listLutAdcScore(oneShot,
      VectorOps.residualLut(s, probes, cent, cb)))
    val served = StreamOps.ivfPqIndexQuery(s, state, centroidPath,
      codebookPath, queries)
    assert(served.exceptAll(expected).count() == 0 &&
      expected.exceptAll(served).count() == 0)
    // compaction applies the supersession physically: one encoding per
    // (vec_id, m), and every revised vector's rows carry its NEW list id
    StreamOps.compactIvfPqCodes(s, state, "g_cdcivfpq_state",
      s"$dir/g_cdcivfpq_state")
    val compacted = s.table("g_cdcivfpq_state")
    assert(compacted.groupBy("vec_id", "m").count()
      .filter(col("count") =!= 1).count() == 0)
    val newLists = assignedU.filter(col("vec_id") % 5 === 2)
      .select(col("vec_id"), col("clabel").as("new_clabel"))
    assert(compacted.join(newLists, "vec_id")
      .filter(col("clabel") =!= col("new_clabel")).count() == 0,
      "a revised vector still serves from its pre-update list")
    s.sql("DROP TABLE IF EXISTS g_cdcivfpq_state")
    graft.ops.CacheRegistry.harness.release()
  }
}
