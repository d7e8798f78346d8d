package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, batch feature extraction over
  * partitions.
  *
  * The actual media decode is STUBBED (codec libraries are not in this
  * container): `fakeDecode` derives deterministic pseudo-features from
  * the payload bytes. Everything around the stub — schema, partition
  * batching, output shape, null handling — is the real Spark plumbing a
  * production decode (JNI/FFI codec per executor) would drop into.
  *
  * Scale posture: mapPartitions amortizes per-batch codec setup exactly
  * like a vectorized/pandas UDF would; payloads never hit the driver;
  * the narrow projection keeps scans prunable (metadata-only queries
  * never read the payload column thanks to parquet column pruning).
  */
object Multimodal {

  /** Typed metadata carried next to every binary payload. */
  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image | audio | video
    StructField("byte_len", LongType),
    StructField("checksum", StringType),     // md5 of payload
  ))

  /** Wrap a text table into a multimodal-shaped table: payload bytes +
    * typed metadata. (Testdata has no real media; documents.text bytes
    * stand in as the opaque payload.)
    */
  def asMediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
        octet_length(encode(col("text"), "UTF-8")).cast("bigint").as("byte_len"),
        md5(encode(col("text"), "UTF-8")).as("checksum")).as("meta"))

  /** Metadata-only projection — never touches `payload` (verify with
    * .explain: ReadSchema excludes the binary column when reading a
    * persisted media table).
    */
  def mediaStats(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("meta.media_type"), col("meta.byte_len"))
      .groupBy("media_type")
      .agg(count(lit(1)).as("n"),
        sum("byte_len").as("total_bytes"),
        max("byte_len").as("max_bytes"))
      .orderBy("media_type")

  /** STUB decode: deterministic pseudo-feature vector from payload bytes.
    * A real implementation decodes the media and runs a feature
    * extractor; the signature/batching contract is identical.
    */
  private[ext] def fakeDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L // deterministic FNV-ish roll over bytes
    var i = 0
    while (i < payload.length) { h = h * 31 + (payload(i) & 0xff); i += 1 }
    var j = 0
    while (j < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(j) = ((h >>> 40).toInt % 1000) / 1000.0f
      j += 1
    }
    out
  }

  /** STUB resize: deterministic stand-in for decode→scale→re-encode
    * (truncate the payload to `targetBytes`). The mapPartitions plumbing
    * — per-batch codec init, streamed rows, payload never at the driver
    * — is exactly what a real resize drops into.
    */
  def resize(media: DataFrame, targetBytes: Int = 4096): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("media_type", StringType),
      StructField("orig_bytes", LongType),
      StructField("payload", BinaryType),
      StructField("resized_bytes", LongType),
    ))
    val input = media.select(col("media_id"), col("meta.media_type").as("mt"),
      col("payload"))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    input.mapPartitions { rows =>
      // per-partition codec init would go here
      rows.map { r =>
        val p = r.getAs[Array[Byte]]("payload")
        val resized = if (p == null) null
          else if (p.length <= targetBytes) p
          else java.util.Arrays.copyOfRange(p, 0, targetBytes)
        Row(r.getAs[Long]("media_id"), r.getAs[String]("mt"),
          if (p == null) 0L else p.length.toLong,
          resized,
          if (resized == null) 0L else resized.length.toLong)
      }
    }
  }

  /** Frame sampling: one row per fixed-stride frame of the payload,
    * capped at `maxFrames`; empty payloads yield one zero-length frame.
    * Offsets/lengths are pure arithmetic over the metadata (the scan
    * never needs the payload column unless frame bytes are selected) —
    * a narrow explode, no shuffle.
    */
  def frameSample(
      media: DataFrame,
      frameBytes: Int = 1000,
      maxFrames: Int = 8): DataFrame = {
    val len = col("meta.byte_len")
    val nFrames = greatest(
      least(floor((len + frameBytes - 1) / frameBytes), lit(maxFrames)), lit(1))
    media
      .select(col("media_id"), len.as("byte_len"), col("payload"),
        explode(sequence(lit(0), (nFrames - 1).cast("int"))).as("frame_idx"))
      .select(
        col("media_id"),
        col("frame_idx").cast("bigint").as("frame_idx"),
        (col("frame_idx") * frameBytes + 1).cast("bigint").as("frame_offset"),
        least(lit(frameBytes),
          col("byte_len") - col("frame_idx") * frameBytes).cast("bigint")
          .as("frame_len"),
        expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)")
          .as("frame_payload"))
      .orderBy("media_id", "frame_idx")
  }

  /** Batch feature extraction over partitions: the Scala analogue of a
    * pandas-batch UDF — per-partition (≙ per-batch) setup happens once,
    * rows stream through without materializing the partition.
    */
  def extractFeatures(media: DataFrame, dim: Int = 8): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("media_type", StringType),
      StructField("features", ArrayType(FloatType, containsNull = false)),
    ))
    val input = media.select(col("media_id"), col("meta.media_type").as("mt"),
      col("payload"))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    input.mapPartitions { rows =>
      // per-partition codec init would go here (once per batch, not per row)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val feats =
          if (payload == null) null
          else fakeDecode(payload, dim).toSeq
        Row(r.getAs[Long]("media_id"), r.getAs[String]("mt"), feats)
      }
    }
  }
}
