package graft.multimodal

import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** d124's real video path: a synthesized RIFF/AVI container demuxes back
  * into exactly its MJPEG frames, every frame's 8×8 block pattern
  * survives the lossy JPEG round trip bit for bit (8-px cells align with
  * JPEG blocks, so quantization can't cross the 1/64 classification
  * margin), and the end-to-end query over real decoded frames equals the
  * analytic-fingerprint reference.
  */
class MjpegAviSpec extends SparkSpec {

  test("no frame pattern in the clip domain is uniform") {
    // a uniform pattern would decode to all-zero under the mean rule and
    // break fp parity with the oracle; the domain is finite — check it
    val maxK = 12 + 24 // max off + max n
    for (cls <- 0 until Multimodal.AviDupClasses; k <- 0 until maxK) {
      val p = Multimodal.aviFramePattern(cls, k)
      assert(p != 0L && p != -1L, s"uniform pattern at cls=$cls k=$k")
    }
  }

  test("AVI demux recovers every frame; decode recovers every pattern") {
    for (docId <- Seq(0L, 7L, 59L, 61L, 123L, 999L)) {
      val (cls, off, n) = Multimodal.aviClipParams(docId)
      val avi = Multimodal.synthAvi(docId)
      // container sanity: RIFF/'AVI ' magic
      assert(new String(avi, 0, 4, "US-ASCII") == "RIFF")
      assert(new String(avi, 8, 4, "US-ASCII") == "AVI ")
      val s = spark
      import s.implicits._
      val hashes = Multimodal.aviFrameHashes(
        Seq((docId, avi)).toDF("doc_id", "payload"))
        .collect().map(_.getString(1))
      assert(hashes.length == n, s"doc $docId: ${hashes.length} of $n frames")
      val expected = (off until off + n)
        .map(k => f"${Multimodal.aviFramePattern(cls, k)}%016x")
      assert(hashes.toSeq == expected,
        s"doc $docId decoded fps diverge from the md5 prefixes")
    }
  }

  test("d124 over real decoded frames equals the analytic reference") {
    val d = "/root/testdata/sf0.001"
    val got = Multimodal.d124MjpegVideoDedup(spark, d)
    // analytic reference: same clip model, fingerprints straight from the
    // generator contract (what the DuckDB oracle does), same machinery
    val cls = col("doc_id") % Multimodal.AviDupClasses
    val off = (expr(s"doc_id div ${Multimodal.AviDupClasses}") % 4) * 4
    val n = lit(16) + (cls % 3) * 4
    val analytic = graft.Tables.documents(spark, d)
      .filter(col("doc_id") < Multimodal.AviDocCap)
      .select(col("doc_id"),
        explode(transform(sequence(off, off + n - 1),
          k => substring(md5(concat(lit("avi:"), cls.cast("string"),
            lit(":"), k.cast("string"))), 1, 16))).as("fp"))
    val expected = Multimodal.videoClipOverlap(analytic)
    assert(got.exceptAll(expected).count() == 0 &&
      expected.exceptAll(got).count() == 0)
    assert(got.count() > 0, "fixture produced no near-dup pairs")
    graft.ops.CacheRegistry.harness.release()
  }
}
