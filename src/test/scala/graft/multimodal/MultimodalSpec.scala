package graft.multimodal

import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

class MultimodalSpec extends SparkSpec {

  private def docs = {
    val s = spark
    import s.implicits._
    Seq((0L, "hello world"), (1L, "audio doc"), (2L, "video doc"),
      (3L, "another image")).toDF("doc_id", "text")
  }

  test("payload attach + decode produce typed deterministic metadata") {
    val decoded = Multimodal.decodeMeta(Multimodal.attachPayload(docs))
    val rows = decoded.orderBy("doc_id").collect()
    assert(rows.length == 4)
    assert(rows(0).getAs[String]("mime") == "image/png")
    assert(rows(1).getAs[String]("mime") == "audio/wav")
    assert(rows(2).getAs[String]("mime") == "video/mp4")
    // deterministic: same input -> same decode
    val again = Multimodal.decodeMeta(Multimodal.attachPayload(docs))
      .orderBy("doc_id").collect()
    assert(rows.map(_.getAs[Int]("width")).toSeq ==
      again.map(_.getAs[Int]("width")).toSeq)
    // spatial dims exist exactly where the modality has them
    assert(rows.filter(r => !r.isNullAt(r.fieldIndex("width")))
      .forall(_.getAs[Int]("width") >= 64))
    assert(rows(1).isNullAt(rows(1).fieldIndex("width"))) // audio: no dims
    // image rows have no duration
    assert(rows(0).getAs[Long]("duration_ms") == 0L)
  }

  test("audio metadata is read from the real WAV payload by javax.sound") {
    val rows = Multimodal.decodeMeta(Multimodal.attachPayload(docs))
      .filter(col("mime") === "audio/wav").collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L))
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val frames = Multimodal.synthAudioFrames(id)
      assert(r.getAs[Int]("n_frames") == frames)
      assert(r.getAs[Long]("duration_ms") ==
        frames * 1000L / Multimodal.SynthSampleRate)
      // and the bytes really carry the RIFF/WAVE magic
      val p = r.getAs[Array[Byte]]("payload")
      assert(new String(p.take(4), "US-ASCII") == "RIFF")
      assert(new String(p.slice(8, 12), "US-ASCII") == "WAVE")
    }
  }

  test("video metadata is read from the real MP4 box structure") {
    val rows = Multimodal.decodeMeta(Multimodal.attachPayload(docs))
      .filter(col("mime") === "video/mp4").collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq == Seq(2L))
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (w, h) = Multimodal.synthVideoDims(id)
      val frames = Multimodal.synthVideoFrames(id)
      assert(r.getAs[Int]("width") == w)
      assert(r.getAs[Int]("height") == h)
      assert(r.getAs[Int]("n_frames") == frames)
      assert(r.getAs[Long]("duration_ms") ==
        (frames.toLong * Multimodal.SynthVideoTimescale /
          Multimodal.SynthVideoFps) * 1000L / Multimodal.SynthVideoTimescale)
      // and the payload really is ISO BMFF: box 1 is ftyp/isom
      val p = r.getAs[Array[Byte]]("payload")
      assert(new String(p.slice(4, 8), "US-ASCII") == "ftyp")
      assert(new String(p.slice(8, 12), "US-ASCII") == "isom")
    }
  }

  test("version-1 MP4 boxes parse at their shifted offsets") {
    // v1 mvhd/tkhd carry 64-bit create/modify times (and a 64-bit
    // duration), shifting every later field — common in real muxer output
    // for long files. Build one by hand and check the decoded numbers.
    val s = spark
    import s.implicits._
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    val timescale = 600
    val durUnits = 1200L // 2 seconds
    val mvhd = {
      val bb = java.nio.ByteBuffer.allocate(112)
      bb.putInt(0x01000000)             // version 1
      bb.putLong(0L).putLong(0L)        // 64-bit ctime, mtime
      bb.putInt(timescale)
      bb.putLong(durUnits)              // 64-bit duration
      bb.array()
    }
    val tkhd = {
      val bb = java.nio.ByteBuffer.allocate(96)
      bb.putInt(0x01000000)             // version 1
      bb.putLong(0L).putLong(0L)        // 64-bit ctime, mtime
      bb.putInt(1).putInt(0)            // track_ID, reserved
      bb.putLong(durUnits)              // 64-bit duration
      bb.position(bb.position() + 16)   // reserved/layer/group/volume/pad
      Array(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        .foreach(bb.putInt)
      bb.putInt(320 << 16).putInt(240 << 16)
      bb.array()
    }
    val stsz = {
      val bb = java.nio.ByteBuffer.allocate(12)
      bb.putInt(0).putInt(1024).putInt(48)
      bb.array()
    }
    val stbl = box("stbl", box("stsz", stsz))
    val trak = box("trak", box("tkhd", tkhd) ++
      box("mdia", box("minf", stbl)))
    val payload = box("ftyp",
      "isom".getBytes("US-ASCII") ++ Array[Byte](0, 0, 2, 0)) ++
      box("moov", box("mvhd", mvhd) ++ trak)
    val row = Multimodal.decodeMeta(
      Seq((11L, payload, "video/mp4")).toDF("doc_id", "payload", "mime"))
      .collect().head
    assert(row.getAs[Int]("width") == 320)
    assert(row.getAs[Int]("height") == 240)
    assert(row.getAs[Int]("n_frames") == 48)
    assert(row.getAs[Long]("duration_ms") == 2000L)
  }

  test("undecodable video payload yields null metadata, not fake numbers") {
    val s = spark
    import s.implicits._
    val corrupt = Seq((9L, "not an mp4 at all".getBytes("UTF-8"), "video/mp4"))
      .toDF("doc_id", "payload", "mime")
    val row = Multimodal.decodeMeta(corrupt).collect().head
    assert(row.isNullAt(row.fieldIndex("width")))
    assert(row.isNullAt(row.fieldIndex("n_frames")))
    assert(row.isNullAt(row.fieldIndex("duration_ms")))
  }

  test("undecodable audio payload yields null metadata, not fake numbers") {
    val s = spark
    import s.implicits._
    val corrupt = Seq((9L, Array[Byte](1, 2, 3, 4), "audio/wav"))
      .toDF("doc_id", "payload", "mime")
    val row = Multimodal.decodeMeta(corrupt).collect().head
    assert(row.isNullAt(row.fieldIndex("n_frames")))
    assert(row.isNullAt(row.fieldIndex("duration_ms")))
  }

  test("image metadata is read from the real PNG payload by ImageIO") {
    // the payload is a genuine PNG; decode must return the codec header's
    // dimensions, i.e. exactly what the generator drew
    val rows = Multimodal.decodeMeta(Multimodal.attachPayload(docs))
      .filter(col("mime") === "image/png").orderBy("doc_id").collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq == Seq(0L, 3L))
    rows.foreach { r =>
      val (w, h) = Multimodal.synthImageDims(r.getAs[Long]("doc_id"))
      assert(r.getAs[Int]("width") == w)
      assert(r.getAs[Int]("height") == h)
      assert(r.getAs[Int]("n_frames") == 1)
    }
    // and the bytes really carry the PNG magic
    val payload = rows.head.getAs[Array[Byte]]("payload")
    assert((payload(0) & 0xff) == 0x89 && payload(1) == 'P'.toByte)
  }

  test("image decode also proves the JPEG container path (not just PNG)") {
    // the production swap-point claim is "ImageIO reads whatever container
    // arrives" — prove a second real codec: synthesize a JPEG and assert
    // the decoded dims come from its header
    val s = spark
    import s.implicits._
    val (w, h) = (96, 72)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, (x * 31 + y) & 0xffffff); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    val payload = out.toByteArray
    // the bytes really are JFIF: SOI marker 0xFFD8
    assert((payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8)
    val row = Multimodal.decodeMeta(
      Seq((21L, payload, "image/jpeg")).toDF("doc_id", "payload", "mime"))
      .collect().head
    assert(row.getAs[Int]("width") == w)
    assert(row.getAs[Int]("height") == h)
    assert(row.getAs[Int]("n_frames") == 1)
  }

  test("hostile deeply-nested MP4 boxes yield null metadata, not a crash") {
    // thousands of nested 8-byte container boxes: an unbounded recursive
    // walk would StackOverflowError (an Error — uncatchable by the decode
    // path's Exception handler); the depth bound must route this to the
    // null-metadata contract instead
    val s = spark
    import s.implicits._
    var payload = Array[Byte]()
    (1 to 4000).foreach { _ =>
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put("moov".getBytes("US-ASCII"))
        .put(payload)
      payload = bb.array()
    }
    val row = Multimodal.decodeMeta(
      Seq((31L, payload, "video/mp4")).toDF("doc_id", "payload", "mime"))
      .collect().head
    assert(row.isNullAt(row.fieldIndex("width")))
    assert(row.isNullAt(row.fieldIndex("n_frames")))
  }

  test("undecodable image payload yields null metadata, not fake numbers") {
    val s = spark
    import s.implicits._
    val corrupt = Seq((9L, Array[Byte](1, 2, 3, 4), "image/png"))
      .toDF("doc_id", "payload", "mime")
    val row = Multimodal.decodeMeta(corrupt).collect().head
    assert(row.isNullAt(row.fieldIndex("width")))
    assert(row.isNullAt(row.fieldIndex("height")))
  }

  test("feature extraction yields unit vectors that feed the vector ops") {
    val feats = Multimodal.featureExtract(Multimodal.attachPayload(docs))
    val rows = feats.orderBy("doc_id").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      assert(v.length == 16)
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-5)
    }
    // deterministic: same payload → same embedding
    val again = Multimodal.featureExtract(Multimodal.attachPayload(docs))
      .orderBy("doc_id").collect()
    assert(rows.map(_.getSeq[Float](1)).toSeq ==
      again.map(_.getSeq[Float](1)).toSeq)
    // plugs into the native cosine expression (the VectorOps input shape)
    val sim = feats.as("a").crossJoin(feats.as("b"))
      .select(expr("cosine_sim(a.embedding, b.embedding)").as("cs"))
      .collect()
    assert(sim.forall(r => !r.isNullAt(0)))
  }

  test("resize plan caps the longest dimension") {
    val resized = Multimodal.resizePlan(
      Multimodal.decodeMeta(Multimodal.attachPayload(docs)), maxDim = 128)
    resized.collect().foreach { r =>
      assert(r.getAs[Int]("out_width") <= 128)
      assert(r.getAs[Int]("out_height") <= 128)
    }
  }

  test("frame sampling yields bounded, keyed frames for video rows only") {
    val frames = Multimodal.frameSample(
      Multimodal.decodeMeta(Multimodal.attachPayload(docs)), k = 4)
    val rows = frames.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("frame_key").length == 32))
    val perDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(perDoc.keySet == Set(2L)) // only the video doc
    assert(perDoc(2L).length <= 5)
  }
}
