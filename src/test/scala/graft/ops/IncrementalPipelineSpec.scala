package graft.ops

import org.apache.spark.sql.functions._
import graft.betfair.{Fixtures, SparkSpec}

/** [[TextOps.d96IncrementalPipeline]] — the composed-pipeline incremental
  * claim: batch-by-batch state merges produce EXACTLY the one-shot t65
  * verdicts, including the case where a later batch revises a prior
  * verdict (a smaller doc_id arriving for an already-kept fingerprint).
  */
class IncrementalPipelineSpec extends SparkSpec {

  test("a later batch demotes a prior exact-dup keeper") {
    val dir = Fixtures.tempDir("graft-incpipe").toString
    val s = spark
    import s.implicits._
    // batch 1 = even ids, batch 2 = odd ids (the d96 split). Doc 2 is the
    // batch-1 keeper of its fingerprint; doc 1 arrives in batch 2 with the
    // SAME canonical text and a smaller id — the keeper must demote.
    Seq(
      (1L, "Alpha,  BETA gamma DELTA!", "en", "src0", 25L),
      (2L, "alpha beta gamma delta", "en", "src0", 22L),
      (4L, "a completely different document body with plenty of words",
        "en", "src1", 58L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.d96IncrementalPipeline(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep_exact"))
      .toMap
    assert(out(1L), "the smaller late-arriving id must become keeper")
    assert(!out(2L), "the prior keeper must demote after the merge")
    assert(out(4L))
    CacheRegistry.harness.release()
  }

  test("d96 keeps null-text docs exactly as t65 does (null-safe fp join)") {
    val dir = Fixtures.tempDir("graft-incpipe-null").toString
    val s = spark
    import s.implicits._
    // doc 1: null text (null fingerprint); doc 3: another null text — t65's
    // window groups all null fps together (keeper = min doc_id = 1), and a
    // plain equi-join would silently DROP both rows
    Seq[(java.lang.Long, String, String, String, java.lang.Long)](
      (1L, null, "en", "src0", null),
      (2L, "some ordinary document text here", "en", "src0", 32L),
      (3L, null, "de", "src1", null))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val incr = TextOps.d96IncrementalPipeline(spark, dir)
    val oneShot = TextOps.t65CleanPipeline(spark, dir)
    assert(incr.count() == 3, "null-text docs must not vanish")
    assert(incr.exceptAll(oneShot).count() == 0)
    assert(oneShot.exceptAll(incr).count() == 0)
    CacheRegistry.harness.release()
  }

  test("two-batch d96 equals the one-shot t65 on the corpus") {
    val sf = "/root/testdata/sf0.001"
    val incr = TextOps.d96IncrementalPipeline(spark, sf)
    val oneShot = TextOps.t65CleanPipeline(spark, sf)
    assert(incr.exceptAll(oneShot).count() == 0)
    assert(oneShot.exceptAll(incr).count() == 0)
    CacheRegistry.harness.release()
  }
}
