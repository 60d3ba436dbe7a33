package graft.multimodal

import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec
import graft.ops.CacheRegistry

/** [[Multimodal.d98ImageNearDup]] — the perceptual-hash near-dup family
  * member: the REAL-decode aHash must equal the analytic formula, the
  * rotated-prefix bucketing must have exact recall at Hamming ≤ 3, and
  * the synthetic classes must produce both exact and near duplicates.
  */
class ImageNearDupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** The aHash computed straight from the generator contract — no PNG,
    * no ImageIO; the oracle's analytic twin in Scala.
    */
  private def formulaHash(docId: Long): Long = {
    val (base, w, h) = Multimodal.imageGenParams(docId)
    val bw = w / 8
    val bh = h / 8
    val sums = new Array[Long](64)
    var total = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val p = (base ^ (((x * 31 + y) * 2654435761L) & 0xffffff)).toInt & 0xffffff
      val gray = ((p >> 16) & 255) + ((p >> 8) & 255) + (p & 255)
      sums((y / bh) * 8 + x / bw) += gray
      total += gray
    }
    (0 until 64).foldLeft(0L) { (acc, b) =>
      if (sums(b) * 64 > total) acc | (1L << b) else acc
    }
  }

  test("decoded-pixel aHash equals the analytic formula on every doc") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").limit(120)
    val decoded = Multimodal.aHash64(Multimodal.imageDedupPayload(docs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(decoded.size == 120)
    decoded.foreach { case (id, ah) =>
      assert(ah == formulaHash(id), s"doc $id: decode path disagrees")
    }
  }

  test("bucketed pair set equals the brute-force ground truth (exact recall)") {
    val out = Multimodal.d98ImageNearDup(spark, sf).persist()
    CacheRegistry.harness.add(out)
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id")
    val hashes = Multimodal.aHash64(Multimodal.imageDedupPayload(docs))
      .persist()
    CacheRegistry.harness.add(hashes)
    val brute = hashes.as("a").join(hashes.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        bit_count(col("a.ahash").bitwiseXOR(col("b.ahash"))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= 3)
    assert(out.exceptAll(brute).count() == 0 &&
      brute.exceptAll(out).count() == 0)
    // the synthetic classes yield BOTH exact (hamming 0) and genuine
    // near-duplicate (hamming 1..3) pairs, and the scrambled pixel
    // pattern keeps the hash DISCRIMINATIVE: accidental cross-class
    // collisions are a small minority of the pair set
    assert(out.filter(col("hamming") === 0).count() > 0)
    assert(out.filter(col("hamming") > 0).count() > 0)
    val crossClass = out.filter(col("d1") % Multimodal.ImageDupClasses
      =!= col("d2") % Multimodal.ImageDupClasses).count()
    assert(crossClass * 5 < out.count(), s"hash not discriminative: " +
      s"$crossClass cross-class of ${out.count()} pairs")
    CacheRegistry.harness.release()
  }

  /** The audio energy hash computed straight from the PCM generator
    * contract — no WAV, no javax.sound; the d102 oracle's analytic twin.
    */
  private def audioFormulaHash(docId: Long): Long = {
    val (mult, pert, frames) = Multimodal.audioGenParams(docId)
    val wlen = frames / 64
    val sums = new Array[Long](64)
    var total = 0L
    for (i <- 0 until frames) {
      val sRaw = ((i * mult) & 0xffffff) >> 8
      val e = math.abs((sRaw ^ pert) - 32768)
      sums(i / wlen) += e
      total += e
    }
    (0 until 64).foldLeft(0L) { (acc, b) =>
      if (sums(b) * 64 > total) acc | (1L << b) else acc
    }
  }

  test("decoded-PCM energy hash equals the analytic formula on every doc") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").limit(120)
    val decoded = Multimodal.audioHash64(Multimodal.audioDedupPayload(docs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(decoded.size == 120)
    decoded.foreach { case (id, ah) =>
      assert(ah == audioFormulaHash(id), s"doc $id: decode path disagrees")
    }
  }

  test("d102 audio pairs carry exact and near duplicates, discriminatively") {
    val out = Multimodal.d102AudioNearDup(spark, sf).persist()
    CacheRegistry.harness.add(out)
    assert(out.filter(col("hamming") === 0).count() > 0)
    assert(out.filter(col("hamming") > 0).count() > 0)
    val crossClass = out.filter(col("d1") % Multimodal.AudioDupClasses
      =!= col("d2") % Multimodal.AudioDupClasses).count()
    assert(crossClass * 5 < out.count(), s"audio hash not discriminative: " +
      s"$crossClass cross-class of ${out.count()} pairs")
    CacheRegistry.harness.release()
  }

  test("d103 video clip overlap: containment semantics on the clip model") {
    val out = Multimodal.d103VideoOverlap(spark, sf).persist()
    CacheRegistry.harness.add(out)
    // every pair is same-class (cross-class clips share no frames) and
    // inter never exceeds the smaller clip
    assert(out.filter(col("d1") % Multimodal.VideoDupClasses
      =!= col("d2") % Multimodal.VideoDupClasses).count() == 0)
    assert(out.filter(col("inter") > least(col("sz1"), col("sz2")))
      .count() == 0)
    // exact duplicates (same offset+length => containment 10000) and
    // genuine partial overlaps both occur
    assert(out.filter(col("containment_q") === 10000).count() > 0)
    assert(out.filter(col("containment_q") < 10000).count() > 0)
    // the verdict threshold holds: nothing below 4/5 containment
    assert(out.filter(col("inter") * 5 <
      least(col("sz1"), col("sz2")) * 4).count() == 0)
    CacheRegistry.harness.release()
  }

  test("d104 incremental hash state reproduces the one-shot d98 pairs") {
    val oneShot = Multimodal.d98ImageNearDup(spark, sf)
    val incr = Multimodal.d104IncrementalImageDedup(spark, sf)
    assert(incr.exceptAll(oneShot).count() == 0 &&
      oneShot.exceptAll(incr).count() == 0)
    CacheRegistry.harness.release()
  }

  test("d106 composed verdict: conjunction holds and each modality contributes") {
    val out = Multimodal.d106MultimodalDedup(spark, sf).persist()
    CacheRegistry.harness.add(out)
    assert(out.filter(col("kept") =!=
      (col("keep_text") && col("keep_image") && col("keep_url")))
      .count() == 0)
    // every modality actually rejects someone the others would keep
    assert(out.filter(!col("keep_image") && col("keep_url")).count() > 0)
    assert(out.filter(col("keep_image") && !col("keep_url")).count() > 0)
    assert(out.filter(col("kept")).count() > 0)
    // one row per document
    assert(out.count() ==
      spark.read.parquet(s"$sf/documents.parquet").count())
    CacheRegistry.harness.release()
  }

  test("same class + same perturbation is byte-identical; different class diverges") {
    import spark.implicits._
    // doc 7 and doc 7 + 150*8 share class AND perturbation -> same bytes
    val twinA = 7L
    val twinB = 7L + Multimodal.ImageDupClasses * 8L
    val payloads = Multimodal.imageDedupPayload(
      Seq(twinA, twinB, 8L).toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(java.util.Arrays.equals(payloads(twinA), payloads(twinB)))
    assert(!java.util.Arrays.equals(payloads(twinA), payloads(8L)))
  }
}
