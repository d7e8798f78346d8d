package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, batch feature extraction over
  * partitions.
  *
  * Container HEADER decode ([[decodeContainers]], [[headerFeatures]])
  * is REAL: payloads are valid BMP/WAV/AVI bytes and the parser reads
  * magic + fixed-offset little-endian fields — no codec library needed.
  * Only pixel/sample decode (which needs a codec/model runtime even in
  * production) is out of scope; a JNI/FFI codec would drop into the
  * same mapPartitions batching.
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

  // --------------------------------------------------------------------
  // Real container decode (BMP / WAV / AVI): self-describing formats
  // carry their dimensions/timing in fixed-offset little-endian header
  // fields, so decoding them needs ONLY byte arithmetic — no codec
  // library. Payloads below are synthesized as VALID containers and the
  // decoder genuinely parses the bytes (magic check + LE field reads);
  // the DuckDB oracle recomputes the fields from the generator formulas,
  // making the query a differential test of the parser. Only pixel/
  // sample decode (which needs a codec/model runtime even in
  // production) remains out of scope.
  // --------------------------------------------------------------------

  /** Deterministic container parameters per media id — shared between
    * the payload generator and the oracle SQL (never let them drift).
    */
  object Gen {
    val WBase = 16; val WMod = 240
    val HBase = 16; val HMod = 180
    val RateBase = 8000; val RateStep = 8000; val RateMod = 5
    val UsecBase = 33333; val UsecStep = 1000; val UsecMod = 7
    val FrBase = 24; val FrMod = 240
    def bmpWidth(id: Long): Int = (WBase + id % WMod).toInt
    def bmpHeight(id: Long): Int = (HBase + id % HMod).toInt
    def wavRate(id: Long): Int = (RateBase + (id % RateMod) * RateStep).toInt
    def wavChannels(id: Long): Int = (1 + id % 2).toInt
    def aviUsecPerFrame(id: Long): Int = (UsecBase + (id % UsecMod) * UsecStep).toInt
    def aviFrames(id: Long): Int = (FrBase + id % FrMod).toInt
    val PngWBase = 8; val PngWMod = 24
    /** PNG scanline width — the one shape parameter the pixel-padding
      * formula (and so the oracle) depends on: decoded pixels = body
      * bytes zero-padded to `w·⌈len/w⌉`.
      */
    def pngWidth(id: Long): Int = (PngWBase + id % PngWMod).toInt
  }

  private def le(n: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(n)
    b.array()
  }
  private def le16(n: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putShort(n.toShort)
    b.array()
  }

  /** BMP: BITMAPFILEHEADER(14) + BITMAPINFOHEADER(40) + body. */
  private[ext] def bmpBytes(id: Long, body: Array[Byte]): Array[Byte] =
    "BM".getBytes ++ le(54 + body.length) ++ le(0) ++ le(54) ++
      le(40) ++ le(Gen.bmpWidth(id)) ++ le(Gen.bmpHeight(id)) ++
      le16(1) ++ le16(24) ++ le(0) ++ le(body.length) ++
      le(2835) ++ le(2835) ++ le(0) ++ le(0) ++ body

  /** WAV: RIFF/WAVE + canonical fmt(16) + data chunk around the body. */
  private[ext] def wavBytes(id: Long, body: Array[Byte]): Array[Byte] = {
    val rate = Gen.wavRate(id); val ch = Gen.wavChannels(id)
    "RIFF".getBytes ++ le(36 + body.length) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le(16) ++ le16(1) ++ le16(ch) ++ le(rate) ++
      le(rate * ch * 2) ++ le16(ch * 2) ++ le16(16) ++
      "data".getBytes ++ le(body.length) ++ body
  }

  /** AVI: RIFF/'AVI ' + LIST hdrl + avih(56) main header. The avih
    * declares 56 bytes and EMITS 56 (10 field DWORDs + 4 reserved zero
    * DWORDs), so a chunk-walking parser sees consistent sizes:
    * LIST = 4 + 8 + 56 = 68, RIFF = 80 + body.
    */
  private[ext] def aviBytes(id: Long, body: Array[Byte]): Array[Byte] =
    "RIFF".getBytes ++ le(80 + body.length) ++ "AVI ".getBytes ++
      "LIST".getBytes ++ le(68) ++ "hdrl".getBytes ++
      "avih".getBytes ++ le(56) ++
      le(Gen.aviUsecPerFrame(id)) ++ le(0) ++ le(0) ++ le(0) ++
      le(Gen.aviFrames(id)) ++ le(0) ++ le(1) ++ le(0) ++
      le(Gen.bmpWidth(id)) ++ le(Gen.bmpHeight(id)) ++
      le(0) ++ le(0) ++ le(0) ++ le(0) ++ body

  /** A REAL compressed PNG around the body bytes as 8-bit greyscale
    * pixels (r16 verdict #6 — the first COMPRESSED format in the media
    * family; BMP/WAV/AVI carry their bodies verbatim): scanline width
    * [[Gen.pngWidth]], height ⌈len/w⌉, last row zero-padded; each
    * row's filter type CYCLES through all five (None/Sub/Up/Average/
    * Paeth — any image ≥5 rows exercises every reversal path in the
    * decoder), rows deflated into one IDAT, every chunk carrying its
    * real CRC32. `Hashing.pngPixels` must genuinely inflate and
    * unfilter to recover the body — the oracle recomputes the expected
    * pixels from (text, id) alone, making the declared key a
    * differential test of the whole decode path.
    */
  private[ext] def pngBytes(id: Long, body: Array[Byte]): Array[Byte] = {
    val w = Gen.pngWidth(id)
    val h = (body.length + w - 1) / w
    val px = java.util.Arrays.copyOf(body, w * h)
    val raw = new Array[Byte](h * (1 + w))
    var y = 0
    while (y < h) {
      val f = y % 5
      raw(y * (1 + w)) = f.toByte
      var x = 0
      while (x < w) {
        val cur = px(y * w + x) & 0xff
        val a = if (x > 0) px(y * w + x - 1) & 0xff else 0
        val b = if (y > 0) px((y - 1) * w + x) & 0xff else 0
        val c = if (x > 0 && y > 0) px((y - 1) * w + x - 1) & 0xff else 0
        val enc = f match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - ((a + b) >> 1)
          case _ =>
            val pp = a + b - c
            val pa = math.abs(pp - a); val pb = math.abs(pp - b)
            val pc = math.abs(pp - c)
            cur - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        raw(y * (1 + w) + 1 + x) = (enc & 0xff).toByte
        x += 1
      }
      y += 1
    }
    // BEST_SPEED: the fixture's encode is test-harness cost, not the
    // operator under test (a real pipeline READS crawled PNGs); any
    // valid zlib stream exercises the decoder identically
    val defl = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
    defl.setInput(raw); defl.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) zout.write(buf, 0, defl.deflate(buf))
    defl.end()
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
      val t = tpe.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      be32(data.length.toLong) ++ t ++ data ++ be32(crc.getValue)
    }
    val ihdr = be32(w.toLong) ++ be32(h.toLong) ++
      Array[Byte](8, 0, 0, 0, 0) // depth 8, grey, deflate, filter0, no interlace
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", zout.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Valid (if minimal) container bytes around an opaque body. */
  private[ext] def buildContainer(id: Long, body: Array[Byte]): Array[Byte] = {
    (id % 3) match {
      case 0 => bmpBytes(id, body)
      case 1 => wavBytes(id, body)
      case _ => aviBytes(id, body)
    }
  }

  /** Documents wrapped as REAL container payloads (text bytes as the
    * opaque body) — the input shape for [[decodeContainers]].
    */
  def asContainerTable(documents: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)))
    // NULL text → NULL body: drop the row here (the oracles' string
    // functions null-propagate the same rows away) instead of handing
    // the builder a null buffer to crash the whole fixture job on
    val input = documents.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("body"))
      .where(col("body").isNotNull)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    input.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, buildContainer(id, r.getAs[Array[Byte]](1)))
      }
    }
  }

  /** Every document wrapped as a REAL BMP payload (text bytes as the
    * pixel buffer) — the images-only corpus fixture for the
    * content-level dedup path ([[phashPairs]]), where the 1-in-3 mixed
    * table would leave the image family too thin to exercise.
    */
  def asImageTable(documents: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)))
    // same NULL-text guard as [[asContainerTable]]
    val input = documents.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("body"))
      .where(col("body").isNotNull)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    input.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, bmpBytes(id, r.getAs[Array[Byte]](1)))
      }
    }
  }

  /** Every document wrapped as a REAL compressed PNG payload (text
    * bytes as the greyscale pixel buffer) — the [[asImageTable]]
    * sibling for the COMPRESSED-format decode path ([[pngBytes]]).
    */
  def asPngTable(documents: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)))
    // same NULL-text guard as [[asContainerTable]]
    val input = documents.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("body"))
      .where(col("body").isNotNull)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    input.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, pngBytes(id, r.getAs[Array[Byte]](1)))
      }
    }
  }

  /** Every document wrapped as a REAL WAV payload (text bytes as the
    * 16-bit PCM sample buffer) — the audio-only corpus fixture for the
    * content-level dedup path ([[audioHashPairs]]), the
    * [[asImageTable]] twin.
    */
  def asAudioTable(documents: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)))
    // same NULL-text guard as [[asContainerTable]]
    val input = documents.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("body"))
      .where(col("body").isNotNull)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    input.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, wavBytes(id, r.getAs[Array[Byte]](1)))
      }
    }
  }

  /** Every document wrapped as a REAL AVI payload (text bytes as the
    * frame data, the generator's declared frame count in the avih
    * header) — the video-only corpus fixture for the content-level
    * dedup path ([[videoHashPairs]]), the [[asImageTable]] /
    * [[asAudioTable]] third sibling.
    */
  def asVideoTable(documents: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)))
    // same NULL-text guard as [[asContainerTable]]
    val input = documents.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("body"))
      .where(col("body").isNotNull)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    input.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, aviBytes(id, r.getAs[Array[Byte]](1)))
      }
    }
  }

  private def leAt(p: Array[Byte], off: Int): Long =
    ((p(off) & 0xffL)) | ((p(off + 1) & 0xffL) << 8) |
      ((p(off + 2) & 0xffL) << 16) | ((p(off + 3) & 0xffL) << 24)
  private def le16At(p: Array[Byte], off: Int): Int =
    (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8)
  private def ascii(p: Array[Byte], off: Int, s: String): Boolean =
    p.length >= off + s.length &&
      s.indices.forall(i => p(off + i) == s.charAt(i).toByte)

  private val DecodedSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("container", StringType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("sample_rate", LongType),
    StructField("channels", LongType),
    StructField("duration_ms", LongType),
    StructField("n_frames", LongType)))

  /** Per-payload header parse — the shared kernel of
    * [[decodeContainers]] and [[headerFeatures]]: branch on magic bytes,
    * read fixed-offset little-endian fields. Unknown/truncated payloads
    * yield `container = "unknown"` with null fields instead of throwing
    * (per-file fault tolerance, like Ingest).
    */
  private[ext] def decodeRow(id: Long, p: Array[Byte]): Row =
    if (p != null && ascii(p, 0, "BM") && p.length >= 54)
      Row(id, "bmp", leAt(p, 18), leAt(p, 22), null, null, null, null)
    else if (p != null && ascii(p, 0, "RIFF") && ascii(p, 8, "WAVE") && p.length >= 44) {
      val ch = le16At(p, 22).toLong
      val rate = leAt(p, 24)
      val bytes = leAt(p, 40)
      val bytesPerSec = rate * ch * (le16At(p, 34) / 8)
      // a well-magic'd header with zeroed rate/channels/bits must
      // degrade like any other malformed payload, never divide by 0
      if (bytesPerSec <= 0)
        Row(id, "unknown", null, null, null, null, null, null)
      else
        Row(id, "wav", null, null, rate, ch, 1000L * bytes / bytesPerSec, null)
    } else if (p != null && ascii(p, 0, "RIFF") && ascii(p, 8, "AVI ") && p.length >= 72) {
      val usec = leAt(p, 32)
      val frames = leAt(p, 48)
      Row(id, "avi", leAt(p, 64), leAt(p, 68), null, null,
        usec * frames / 1000L, frames)
    } else Row(id, "unknown", null, null, null, null, null, null)

  /** REAL header decode: [[decodeRow]] over every payload.
    * mapPartitions ≙ the vectorized-UDF batching a native decoder
    * would use.
    */
  def decodeContainers(media: DataFrame): DataFrame = {
    val input = media.select(col("media_id"), col("payload"))
    implicit val enc = RowEncoder.encoderFor(DecodedSchema)
    input.mapPartitions { rows =>
      // positional: pipelined mapPartitions rows carry no field schema
      rows.map { r =>
        decodeRow(r.getLong(0), if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1))
      }
    }.orderBy("media_id")
  }

  /** Per-payload perceptual hash column: the codegen'd
    * [[graft.functions.Hashing.aHash64]] average-hash over each BMP
    * payload's PIXEL buffer (header parsed for the pixel-data offset —
    * the hash is over decoded image bytes, not the container). Non-BMP
    * and malformed payloads yield null and are dropped: WAV/AVI need a
    * different content hash (chromaprint-style), out of scope like
    * sample decode.
    */
  def aHash(media: DataFrame): DataFrame =
    media
      .select(col("media_id"),
        graft.functions.GraftFunctions.aHash64(col("payload")).as("phash"))
      .filter(col("phash").isNotNull)

  /** Declared-key parameters for [[phashPairs]], shared with the oracle
    * SQL builder (the DormantMinPrice pattern — a tweak here lands on
    * both sides at once). Radius 12 of 64: the synthetic corpus has no
    * byte-identical images (all 500 verify-SF docs are unique), so like
    * `dedup_embedding_pairs`' threshold the radius sits in the
    * distribution's near tail — the banding, cap and Hamming-verify
    * paths all carry real rows in every oracle check. Production image
    * dedup runs radius ~8 at the same plan shape.
    */
  val PhashMaxHamming = 12
  val PhashBands = 16
  val PhashMaxBucket = 256

  /** Content-level media near-dup pairs: images whose perceptual hash
    * is within `maxHamming` bits — the image-dedup step every
    * multimodal corpus pipeline runs after (cheap) checksum dedup,
    * catching re-encoded/slightly-retouched copies that byte checksums
    * miss. The multi-index-hashing pigeonhole plan (same family as
    * [[Dedup.simHashPairs]]): split the 64-bit hash into `bands`
    * equal chunks — any pair within Hamming `bands − 1` agrees on ≥1
    * whole chunk, so with `bands > maxHamming` the (band, chunk-value)
    * equi-join is recall-COMPLETE at the radius; one shuffle, never
    * all-pairs. Degenerate chunks (e.g. flat-color images hashing to 0)
    * capped by the broadcast-anti-join guard; exact Hamming via
    * bit_count(xor) on candidates only. The payload column never
    * reaches the join — only (media_id, 64-bit hash) shuffles.
    */
  def phashPairs(
      media: DataFrame,
      maxHamming: Int = PhashMaxHamming,
      bands: Int = PhashBands,
      maxBucket: Int = PhashMaxBucket): DataFrame =
    // pinned inside hammingPairs: census + both sides of the self-join
    // — the mapPartitions container build + hash must not run thrice
    hammingPairs(aHash(media), "phash", maxHamming, bands, maxBucket)

  /** [[aHash]] over PNG payloads: inflate + unfilter
    * ([[graft.functions.Hashing.pngPixels]]), then the SAME codegen'd
    * cell walk over the DECODED pixels. Non-PNG/malformed → null,
    * dropped.
    */
  def pngAHash(media: DataFrame): DataFrame =
    media
      .select(col("media_id"),
        graft.functions.GraftFunctions.pngAHash64(col("payload")).as("phash"))
      .filter(col("phash").isNotNull)

  /** [[phashPairs]] over COMPRESSED payloads: identical banding plan —
    * the only difference is that the hash input is the decoder's
    * output, so the declared key differential-tests inflate + filter
    * reversal end to end (the oracle recomputes the expected pixels
    * from the generator formula; any decode bug flips hash bits and
    * the pair set).
    */
  def phashPngPairs(
      media: DataFrame,
      maxHamming: Int = PhashMaxHamming,
      bands: Int = PhashBands,
      maxBucket: Int = PhashMaxBucket): DataFrame =
    hammingPairs(pngAHash(media), "phash", maxHamming, bands, maxBucket)

  /** Declared-key parameters for [[audioHashPairs]] (the
    * [[PhashMaxHamming]] pattern). 8×8-bit bands: the energy-delta
    * bits are near-uniform across a corpus (unlike pixel-stat phash
    * bits), so wider band keys keep bucket sizes ~n/256 per band —
    * radius 6 of 64 sits in the synthetic distribution's near tail
    * (hundreds of pairs at verify SF), and 6 < 8 bands keeps the
    * pigeonhole recall-complete.
    */
  val AudioMaxHamming = 6
  val AudioBands = 8
  val AudioMaxBucket = 256

  /** Band-combination arity for [[audioHashPairs]]: radius 6 of 8
    * bands leaves ≥2 clean bands in any qualifying pair, so composite
    * keys over all C(8,2) = 28 band PAIRS stay recall-complete while
    * multiplying key cardinality 256× (16-bit composite keys) — the
    * single-band 8-bit key has 256 values REGARDLESS of corpus size,
    * so by 50k tracks the oversized-bucket cap was deleting 68% of
    * banding rows (measured, SCALE.md round-11). Bucket load scales as
    * n·C(b,a)/slots: ~0.8 at 50k, ~8 at 500k — headroom through sf10.
    */
  val AudioBandArity = 2

  /** Per-payload audio content-hash column: the codegen'd
    * [[graft.functions.Hashing.audioHash64]] sign-of-energy-delta hash
    * over each WAV payload's PCM body (container parsed for the data
    * offset — the hash is over decoded samples, not container bytes).
    * Non-WAV and malformed payloads yield null and are dropped.
    */
  def audioHash(media: DataFrame): DataFrame =
    media
      .select(col("media_id"),
        graft.functions.GraftFunctions.audioHash64(col("payload")).as("ahash"))
      .filter(col("ahash").isNotNull)

  /** Content-level AUDIO near-dup pairs: tracks whose energy-envelope
    * hash is within `maxHamming` bits — the audio face of
    * [[phashPairs]] (re-encoded/level-shifted copies survive the
    * envelope hash; byte checksums miss them). Same
    * multi-index-hashing pigeonhole plan, same cap, same one-shuffle
    * bound — via the SAME [[hammingPairs]] kernel, so a banding or
    * cap fix lands on every modality at once.
    */
  def audioHashPairs(
      media: DataFrame,
      maxHamming: Int = AudioMaxHamming,
      bands: Int = AudioBands,
      maxBucket: Int = AudioMaxBucket,
      arity: Int = AudioBandArity): DataFrame =
    hammingPairs(audioHash(media), "ahash", maxHamming, bands, maxBucket,
      arity)

  /** Declared-key parameters for [[videoHashPairs]] (the
    * [[PhashMaxHamming]] pattern). The frame-sampled brightness bits
    * decorrelate faster across synthetic documents than the audio
    * envelope bits (measured min cross-doc hamming 7 at the verify SF),
    * so the radius sits at 13 — the distribution's near tail, keeping
    * the banding/cap/verify paths loaded with real rows in every
    * oracle check — with 16×4-bit bands for pigeonhole completeness
    * (16 > 13, complete to radius 15), the [[PhashBands]] geometry.
    * Production video dedup at tighter radii keeps the same plan.
    */
  val VideoMaxHamming = 13
  val VideoBands = 16
  val VideoMaxBucket = 256

  /** Band-combination arity for [[videoHashPairs]]: the 4-bit band
    * key has 16 values regardless of corpus size, so single-band
    * buckets saturate the cap fast — measured 64% of banding rows
    * deleted at 5k clips and 99.5% at 50k (recall silently collapsing
    * to zero; SCALE.md round-11). Radius 13 of 16 bands leaves ≥3
    * clean bands, so composite keys over all C(16,2) = 120 band PAIRS
    * (8-bit keys, 30,720 slots — 256× the single-band cardinality)
    * stay recall-complete; bucket load ~1.6 at 50k clips. The same
    * radius supports arity 3 (C(16,3) = 560 combos, 2.3M slots) for
    * the next decade. Image phash CANNOT take this remedy: radius 15
    * of 16 bands leaves exactly 1 clean band — its scale path is a
    * longer hash (256-bit aHash → 32×8-bit bands), not amplification.
    */
  val VideoBandArity = 2

  /** Per-payload video content-hash column: the codegen'd
    * [[graft.functions.Hashing.videoHash64]] temporal-brightness
    * signature over each AVI payload's frame data (container parsed
    * for the declared frame count — the hash is over frame-sampled
    * content, not container bytes). Non-AVI and malformed payloads
    * yield null and are dropped.
    */
  def videoHash(media: DataFrame): DataFrame =
    media
      .select(col("media_id"),
        graft.functions.GraftFunctions.videoHash64(col("payload")).as("vhash"))
      .filter(col("vhash").isNotNull)

  /** Content-level VIDEO near-dup pairs: clips whose temporal
    * brightness signature is within `maxHamming` bits — the video face
    * of [[phashPairs]]/[[audioHashPairs]] (re-graded/re-encoded copies
    * survive the frame-sampled signature; byte checksums miss them).
    * Same multi-index-hashing pigeonhole plan, same cap, same
    * one-shuffle bound — via the SAME [[hammingPairs]] kernel, so a
    * banding or cap fix lands on every modality at once.
    */
  def videoHashPairs(
      media: DataFrame,
      maxHamming: Int = VideoMaxHamming,
      bands: Int = VideoBands,
      maxBucket: Int = VideoMaxBucket,
      arity: Int = VideoBandArity): DataFrame =
    hammingPairs(videoHash(media), "vhash", maxHamming, bands, maxBucket,
      arity)

  /** The shared 64-bit-Hamming pair kernel of [[phashPairs]],
    * [[audioHashPairs]] and [[videoHashPairs]]: split each hash into
    * `bands` equal chunks and key candidates by every combination of
    * `arity` chunks — a pair within Hamming `maxHamming` dirties at
    * most `maxHamming` chunks, leaving ≥ `bands − maxHamming` clean
    * ones, so with `bands − maxHamming ≥ arity` some all-clean
    * combination exists and the (combo, composite-key) equi-join is
    * recall-COMPLETE at the radius; one shuffle, never all-pairs.
    * `arity > 1` is LSH amplification for high radii: composite keys
    * multiply bucket cardinality by `2^((arity−1)·bitsPer)`, which is
    * what keeps the oversized-bucket cap from silently deleting the
    * whole corpus once `n` outgrows `bands · 2^bitsPer` single-band
    * slots (the video key's 4-bit bands saturate at ~4k clips —
    * measured, SCALE.md round-11). Degenerate buckets capped by the
    * broadcast-anti-join guard; exact Hamming via bit_count(xor) on
    * candidates only. The payload column never reaches the join —
    * only (media_id, 64-bit hash) shuffles.
    */
  private[graft] def hammingPairs(
      hashed: DataFrame,
      hashCol: String,
      maxHamming: Int,
      bands: Int,
      maxBucket: Int,
      arity: Int = 1): DataFrame = {
    require(bands >= 1 && 64 % bands == 0, s"bands ($bands) must divide 64")
    require(arity >= 1 && bands - maxHamming >= arity,
      s"pigeonhole completeness needs bands - maxHamming " +
        s"($bands - $maxHamming) >= arity ($arity)")
    val bitsPer = 64 / bands
    def bandVal(i: Int) =
      shiftright(col(hashCol), i * bitsPer)
        .bitwiseAND(lit((1L << bitsPer) - 1))
    val combos = (0 until bands).combinations(arity).toSeq
    val pinned = graft.core.CacheScope.persist(hashed)
    // exact-dup collapse before the LSH join: band and self-join
    // DISTINCT hashes only (2–4× fewer rows on real corpora — the
    // candidate volume, quadratic per bucket, drops by its square);
    // the id multiset re-enters at expansion, where each unordered
    // hash pair maps to a unique id-pair set. Output is IDENTICAL to
    // the row-level formulation: the cap binds on sum(cnt) — the same
    // row count the uncollapsed bucket would hold — and a pair (i, j)
    // survives iff some uncapped bucket holds both hashes, the same
    // condition row-level banding tests.
    val groups = graft.core.CacheScope.persist(
      pinned.groupBy(col(hashCol)).agg(count(lit(1)).as("cnt")))
    val banded = groups.select(col(hashCol), col("cnt"),
      explode(array(combos.zipWithIndex.map { case (combo, ci) =>
        struct(lit(ci).as("band"),
          combo.map(bandVal).reduceLeft((acc, v) =>
            shiftleft(acc, bitsPer).bitwiseOR(v)).as("bkey"))
      }: _*)).as("b"))
      .select(col(hashCol), col("cnt"), col("b.band"), col("b.bkey"))
    val oversized = banded.groupBy("band", "bkey")
      .agg(sum("cnt").as("bucket_rows"))
      .filter(col("bucket_rows") > maxBucket)
      .select("band", "bkey")
    val capped = banded.join(broadcast(oversized), Seq("band", "bkey"), "left_anti")
    val a = capped.select(col("band"), col("bkey"), col(hashCol).as("ph_a"))
    val b = capped.select(col("band"), col("bkey"), col(hashCol).as("ph_b"))
    // radius filter BEFORE the dedup shuffle: bit_count(xor) is
    // codegen'd and runs map-side on the join output, so only true
    // hash pairs (× their combo multiplicity) reach dropDuplicates —
    // at high arity the candidate stream is orders of magnitude larger
    // than the pair set, and shuffling it was the kernel's cost
    // ceiling (measured 461 s → 130 s for the filter reorder, → 22 s
    // with the dup collapse, on the 50k-clip probe; SCALE.md round-11)
    val hashPairs = a.join(b, Seq("band", "bkey"))
      .filter(col("ph_a") <= col("ph_b"))
      .withColumn("hamming", bit_count(col("ph_a").bitwiseXOR(col("ph_b"))))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("ph_a", "ph_b")
      .select("ph_a", "ph_b", "hamming")
    // expansion: ph_a = ph_b (hamming 0 within an exact-dup group)
    // yields the group's id pairs; ph_a < ph_b yields the id cross
    // product, canonicalized to media_id_a < media_id_b
    hashPairs
      .join(pinned.select(col(hashCol).as("ph_a"),
        col("media_id").as("id_l")), Seq("ph_a"))
      .join(pinned.select(col(hashCol).as("ph_b"),
        col("media_id").as("id_r")), Seq("ph_b"))
      .filter(col("ph_a") < col("ph_b") || col("id_l") < col("id_r"))
      .select(least(col("id_l"), col("id_r")).as("media_id_a"),
        greatest(col("id_l"), col("id_r")).as("media_id_b"),
        col("hamming"))
      .orderBy("media_id_a", "media_id_b")
  }

  /** REAL feature extraction over decoded container headers: a fixed
    * 8-feature row of normalized header statistics (dimensions, rate,
    * channels, duration, frame count, payload size, container kind),
    * each a genuinely parsed byte-field scaled into a comparable range
    * and rounded at 4 dp. Null fields (a BMP has no sample rate)
    * contribute 0 — the usual dense-vector encoding of optional
    * modality features.
    *
    * This replaces the former byte-hash stub: every feature now derives
    * from the real decode, so the declared query is DuckDB-oracle-
    * checkable (the oracle recomputes the fields from the generator
    * formulas). The decode itself batches via mapPartitions exactly as
    * a codec/model runtime would; the feature arithmetic is a narrow
    * codegen'd projection on top.
    */
  def headerFeatures(media: DataFrame): DataFrame = {
    val outSchema = DecodedSchema.add(StructField("byte_len", LongType))
    val input = media.select(col("media_id"), col("payload"))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    val decoded = input.mapPartitions { rows =>
      rows.map { r =>
        val p = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        Row.fromSeq(decodeRow(r.getLong(0), p).toSeq :+
          (if (p == null) 0L else p.length.toLong))
      }
    }
    def f(c: Column, scale: Double): Column =
      round(coalesce(c.cast("double"), lit(0.0)) / lit(scale), 4)
    decoded.select(
      col("media_id"), col("container"),
      f(col("width"), 1000.0).as("f_width"),
      f(col("height"), 1000.0).as("f_height"),
      f(col("sample_rate"), 48000.0).as("f_rate"),
      f(col("channels"), 1.0).as("f_channels"),
      f(col("duration_ms"), 1000.0).as("f_duration"),
      f(col("n_frames"), 100.0).as("f_frames"),
      f(col("byte_len"), 4096.0).as("f_bytes"),
      when(col("container") === "bmp", 0.0)
        .when(col("container") === "wav", 1.0)
        .when(col("container") === "avi", 2.0)
        .otherwise(-1.0).as("f_kind"))
      .orderBy("media_id")
  }
}
