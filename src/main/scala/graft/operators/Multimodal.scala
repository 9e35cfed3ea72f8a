package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, and run decode /
  * feature-extract steps as partition-batched transforms.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic STUB (`stubDecode`) — the Spark-side
  * contract (schema, batching, partition mapping, null handling) is the
  * real, tested part; swapping the stub for a JNI/codec call changes no
  * plan shape.
  *
  * Scale notes: `mapPartitions` keeps per-batch codec state (a real
  * decoder would be initialized once per partition, not per row); the
  * payload column stays unprojected until the decode step, so column
  * pruning keeps it off every other operator's scan.
  */
object Multimodal {

  /** Metadata struct carried alongside every binary payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("digest", StringType, nullable = false)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", mediaMetaType, nullable = false)))

  /** Wrap a text corpus as a binary media table (documents stand in for
    * undecodable payloads in this environment): payload = utf-8 bytes,
    * metadata derived in-plan (codegen'd, no UDF).
    */
  def asMediaTable(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("media_type"),
        octet_length(col(textCol)).cast("long").as("n_bytes"),
        md5(col(textCol)).as("digest")).as("meta"))

  /** Extracted per-media features. */
  case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      frames: Int,
      feature: Array[Float])

  /** STUB decode: a real implementation would hand `bytes` to a codec.
    * Here it derives deterministic pseudo-dimensions and an 8-dim
    * byte-histogram feature so the pipeline shape is exercised end to
    * end. Marked clearly as a stand-in.
    */
  def stubDecode(bytes: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    // ??? <- real codec call goes here (image decode / audio PCM /
    //        video frame sampling); stubbed: no codecs in this container.
    if (bytes == null || bytes.isEmpty) (0, 0, 0, Array.fill(8)(0f))
    else {
      val w = 16 + (bytes.length % 64)
      val h = 16 + ((bytes.length / 64) % 64)
      val hist = new Array[Float](8)
      var i = 0
      while (i < bytes.length) {
        hist((bytes(i) & 0xff) >> 5) += 1f
        i += 1
      }
      var b = 0
      while (b < 8) { hist(b) /= bytes.length; b += 1 }
      (w, h, 1, hist)
    }
  }

  /** Partition-batched decode + feature extraction: one decoder context
    * per partition, rows streamed through it.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("payload"), col("meta.media_type"),
        col("meta.n_bytes"))
      .as[(Long, Array[Byte], String, Long)]
      .mapPartitions { rows =>
        // per-partition decoder init would happen here
        rows.map { case (id, payload, mt, nb) =>
          val (w, h, fr, feat) = stubDecode(payload)
          MediaFeatures(id, mt, nb, w, h, fr, feat)
        }
      }
  }

  /** Deterministic "frame sample" over a payload: every strideth byte,
    * standing in for video frame sampling; keeps the batched-binary
    * plumbing honest (offsets, bounds, empty payloads).
    */
  def sampleFrames(media: DataFrame, stride: Int = 1024): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        if (payload == null) Iterator.empty
        else payload.indices.by(stride).map(off =>
          (id, off, payload(off) & 0xff))
      }
      .toDF("doc_id", "frame_offset", "frame_value")
  }
}
