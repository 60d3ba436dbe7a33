package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages.
  *
  * The Spark-side shape is real and tested — schema, partitioning, batch
  * iteration (`mapPartitions`, the Scala analog of `mapInPandas` batch UDFs).
  * The actual codec step is STUBBED with a deterministic fake (this
  * environment ships no image/audio libraries): `fakeDecode` derives
  * pseudo-metadata from the payload hash. Swap `fakeDecode` for a real
  * decoder (e.g. TwelveMonkeys/JavaCV) without touching the plumbing.
  */
object Multimodal {

  /** Typed media column: payload + declared mime + decode products. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("payload", BinaryType),
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("duration_ms", LongType)))

  /** Attach a binary media payload to each document (payload = UTF-8 bytes
    * here; in production this column comes from the lakehouse as real image
    * bytes — the pipeline shape is identical).
    */
  def attachPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      when(col("doc_id") % 3 === 0, "image/jpeg")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("mime"))

  /** STUB decode: deterministic pseudo-metadata from the payload bytes.
    * A real implementation decodes the codec header here; everything below
    * (batch shape, schema, null handling) is production plumbing.
    */
  private def fakeDecode(payload: Array[Byte], mime: String)
      : (Int, Int, Int, Long) = {
    val h = java.util.Arrays.hashCode(payload)
    val w = 64 + math.abs(h % 1024)
    val ht = 64 + math.abs((h / 1024) % 1024)
    val frames = if (mime.startsWith("video")) 1 + math.abs(h % 240) else 1
    val dur = if (mime.startsWith("image")) 0L else 1000L + math.abs(h % 60000)
    (w, ht, frames, dur)
  }

  /** Decode metadata for every payload — batch-iterating mapPartitions (one
    * decoder instance per partition, like a pandas-batch UDF).
    */
  def decodeMeta(withPayload: DataFrame): DataFrame = {
    val spark = withPayload.sparkSession
    val outSchema = StructType(
      StructField("doc_id", LongType) +: mediaSchema.fields.toSeq)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    withPayload.select("doc_id", "payload", "mime").mapPartitions { rows =>
      // per-partition decoder setup happens here (codec init, model load...)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val mime = r.getAs[String]("mime")
        val (w, h, frames, dur) = fakeDecode(payload, mime)
        Row(r.getAs[Long]("doc_id"), payload, mime, w, h, frames, dur)
      }
    }(enc)
  }

  /** Resize stage: pure column arithmetic over decoded metadata (a real
    * resize would transform payload in the same mapPartitions shape as
    * decodeMeta).
    */
  def resizePlan(decoded: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxDim) / greatest(col("width"), col("height")))
    decoded
      .withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
  }

  /** Feature extraction: a fixed-dim float embedding per payload, produced
    * in the same batched mapPartitions shape as [[decodeMeta]] (per-partition
    * model load, then row-at-a-time inference). The embedding itself is the
    * declared STUB — hash-seeded deterministic values, L2-normalized — but
    * its schema (`Array[Float]`, same as the embeddings table) means the
    * output plugs directly into the VectorOps family (cosine top-k, LSH
    * buckets, IVF ANN) with no adaptation.
    */
  def featureExtract(withPayload: DataFrame, dim: Int = 16): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    withPayload.select("doc_id", "payload").mapPartitions { rows =>
      // per-partition model initialization happens here
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        // 64-bit seed from the payload digest — a 32-bit hash seed would
        // collide near-certainly at corpus scale and hand downstream dedup
        // bit-identical embeddings for unrelated documents
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(payload)
        val seed = java.nio.ByteBuffer.wrap(digest).getLong
        val rng = new java.util.Random(seed)
        val raw = Array.fill(dim)(rng.nextFloat() - 0.5f)
        val norm = math.sqrt(raw.map(x => x.toDouble * x).sum).toFloat
        val unit = if (norm == 0f) raw else raw.map(_ / norm)
        Row(r.getAs[Long]("doc_id"), unit.toSeq)
      }
    }(enc)
  }

  /** Frame sampling: up to `k` evenly-spaced frame indices per video row —
    * explode of a bounded sequence, fully codegen'd, no UDF.
    */
  def frameSample(decoded: DataFrame, k: Int): DataFrame =
    decoded
      .filter(col("mime").startsWith("video"))
      .withColumn("step", greatest(lit(1), (col("n_frames") / k).cast("int")))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, col("step"))))
      .select(col("doc_id"), col("frame_idx"),
        md5(concat(col("doc_id"), lit(":"), col("frame_idx")))
          .as("frame_key"))
}
