package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.types._

class MultimodalSpec extends SparkSpec {

  private def docsDF(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'src' AS source",
        "length(text) AS n_chars")
  }

  private val media = Multimodal.asMediaTable(docsDF(Seq(
    (0L, "image payload"), (1L, "audio payload"), (2L, "video payload"),
    (3L, "another image"))))

  test("media table shape: binary payload + typed metadata struct") {
    assert(media.schema("payload").dataType == BinaryType)
    val meta = media.schema("meta").dataType.asInstanceOf[StructType]
    assert(meta.fieldNames.toSeq == Seq("media_type", "byte_len", "checksum"))
    val rows = media.orderBy("media_id").collect()
    assert(rows(0).getStruct(2).getString(0) == "image") // doc_id%3==0
    assert(rows(1).getStruct(2).getString(0) == "audio")
    assert(rows(2).getStruct(2).getString(0) == "video")
    assert(rows(3).getStruct(2).getString(0) == "image")
    // ascii text: byte_len == char count
    assert(rows(0).getStruct(2).getLong(1) == "image payload".length.toLong)
  }

  test("headerFeatures: real decoded fields, nulls as 0, container kind code") {
    val docs = docsDF(Seq(
      (0L, "bmp body"), (1L, "wav body bytes"), (2L, "avi body")))
    val out = Multimodal.headerFeatures(Multimodal.asContainerTable(docs))
      .collect().map(r => r.getLong(0) -> r).toMap
    // bmp: dimensions scaled, audio/video features zero, kind 0
    val bmp = out(0L)
    assert(bmp.getString(1) == "bmp")
    assert(bmp.getDouble(2) == Multimodal.Gen.bmpWidth(0) / 1000.0)
    assert(bmp.getDouble(4) == 0.0 && bmp.getDouble(5) == 0.0) // no rate/ch
    assert(bmp.getDouble(9) == 0.0)
    // wav: rate/channels/duration populated, dims zero, kind 1
    val wav = out(1L)
    assert(wav.getString(1) == "wav")
    assert(wav.getDouble(4) ==
      math.rint(Multimodal.Gen.wavRate(1) / 48000.0 * 10000) / 10000)
    assert(wav.getDouble(5) == Multimodal.Gen.wavChannels(1).toDouble)
    assert(wav.getDouble(2) == 0.0 && wav.getDouble(9) == 1.0)
    // avi: frames + payload length real, kind 2
    val avi = out(2L)
    assert(avi.getString(1) == "avi")
    assert(avi.getDouble(7) == Multimodal.Gen.aviFrames(2) / 100.0)
    assert(avi.getDouble(8) ==
      math.rint((88.0 + "avi body".length) / 4096.0 * 10000) / 10000)
    assert(avi.getDouble(9) == 2.0)
    // deterministic across runs
    val again = Multimodal.headerFeatures(Multimodal.asContainerTable(docs))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).toSeq == again(1L).toSeq)
  }

  test("headerFeatures: unknown/null payloads yield the zero vector with kind -1") {
    import spark.implicits._
    val bad = Seq(
      (1L, "not a container".getBytes),
      (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "payload")
    val out = Multimodal.headerFeatures(bad).collect()
    assert(out.length == 2)
    assert(out.forall(_.getString(1) == "unknown"))
    assert(out.forall(_.getDouble(9) == -1.0))
    assert(out.forall(r => (2 to 7).forall(r.getDouble(_) == 0.0)))
  }

  test("resize truncates to target, keeps short payloads, exact metadata") {
    val out = Multimodal.resize(media, targetBytes = 6).orderBy("media_id").collect()
    out.foreach { r =>
      assert(r.getAs[Long]("resized_bytes") == math.min(r.getAs[Long]("orig_bytes"), 6L))
      assert(r.getAs[Array[Byte]]("payload").length == r.getAs[Long]("resized_bytes"))
    }
    // truncation is a prefix, not a rehash
    assert(new String(out.head.getAs[Array[Byte]]("payload")) == "image ")
  }

  test("frameSample: stride offsets, capped count, tail frame short, bytes align") {
    val longDoc = docsDF(Seq((0L, "x" * 2500), (1L, "")))
    val m = Multimodal.asMediaTable(longDoc)
    val frames = Multimodal.frameSample(m, frameBytes = 1000, maxFrames = 8).collect()
    val d0 = frames.filter(_.getLong(0) == 0L)
    assert(d0.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L))
    assert(d0.map(_.getLong(2)).toSeq == Seq(1L, 1001L, 2001L)) // offsets
    assert(d0.map(_.getLong(3)).toSeq == Seq(1000L, 1000L, 500L)) // tail short
    assert(d0.forall(r => r.getAs[Array[Byte]]("frame_payload").length == r.getLong(3)))
    // empty payload: exactly one zero-length frame
    val d1 = frames.filter(_.getLong(0) == 1L)
    assert(d1.length == 1 && d1.head.getLong(3) == 0L)
    // cap: 20_000-byte payload yields maxFrames rows
    val big = Multimodal.asMediaTable(docsDF(Seq((0L, "y" * 20000))))
    assert(Multimodal.frameSample(big, 1000, 8).count() == 8L)
  }

  test("container decode: parser recovers exactly the generator's fields") {
    val docs = docsDF(Seq(
      (0L, "bmp body"), (1L, "wav body bytes"), (2L, "avi body"),
      (33L, "bmp again"), (7L, "another wav")))
    val out = Multimodal.decodeContainers(Multimodal.asContainerTable(docs))
      .collect().map(r => r.getLong(0) -> r).toMap
    // bmp: width/height from the LE header fields
    assert(out(0L).getString(1) == "bmp")
    assert(out(0L).getLong(2) == Multimodal.Gen.bmpWidth(0))
    assert(out(0L).getLong(3) == Multimodal.Gen.bmpHeight(0))
    assert(out(0L).isNullAt(4) && out(0L).isNullAt(7))
    assert(out(33L).getLong(2) == Multimodal.Gen.bmpWidth(33))
    // wav: rate/channels parsed; duration = 1000·bytes/(rate·ch·2)
    assert(out(1L).getString(1) == "wav")
    assert(out(1L).getLong(4) == Multimodal.Gen.wavRate(1))
    assert(out(1L).getLong(5) == Multimodal.Gen.wavChannels(1))
    assert(out(1L).getLong(6) ==
      1000L * "wav body bytes".length /
        (Multimodal.Gen.wavRate(1) * Multimodal.Gen.wavChannels(1) * 2))
    assert(out(7L).getLong(4) == Multimodal.Gen.wavRate(7))
    // avi: frames + usec-per-frame → duration; width/height carried
    assert(out(2L).getString(1) == "avi")
    assert(out(2L).getLong(7) == Multimodal.Gen.aviFrames(2))
    assert(out(2L).getLong(6) ==
      Multimodal.Gen.aviUsecPerFrame(2).toLong * Multimodal.Gen.aviFrames(2) / 1000L)
    assert(out(2L).getLong(2) == Multimodal.Gen.bmpWidth(2))
  }

  test("container decode: truncated/garbage payloads degrade to unknown, never throw") {
    import spark.implicits._
    // well-magic'd WAV whose rate/channels/bits are all zero: the
    // duration divisor is 0 — must degrade, not throw
    val zeroWav = "RIFF".getBytes ++ Array.fill[Byte](4)(0) ++ "WAVE".getBytes ++
      Array.fill[Byte](44)(0)
    val bad = Seq(
      (1L, "BM".getBytes),                       // truncated bmp
      (2L, "RIFFxxxxWAVE".getBytes),             // truncated wav
      (3L, "not a container at all".getBytes),
      (4L, null.asInstanceOf[Array[Byte]]),
      (5L, zeroWav))
      .toDF("media_id", "payload")
    val out = Multimodal.decodeContainers(bad).collect()
    assert(out.length == 5)
    assert(out.forall(_.getString(1) == "unknown"))
    assert(out.forall(r => r.isNullAt(2) && r.isNullAt(6)))
  }

  test("mediaStats aggregates by media_type with exact byte sums") {
    val stats = Multimodal.mediaStats(media).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(stats("image")._1 == 2L)
    assert(stats("image")._2 == "image payload".length + "another image".length)
    assert(stats("audio")._1 == 1L)
    assert(stats("video")._1 == 1L)
  }

  test("aHash64 kernel: known pixel buffer, null on non-BMP/empty, cross-multiply exact") {
    import graft.functions.Hashing
    // 128-byte body: first half 0s, second half 200s -> cells 0..31 mean
    // 0 (below global mean 100), cells 32..63 mean 200 (above) -> the
    // hash is exactly the upper 32 bits set
    val body = Array.fill[Byte](64)(0) ++ Array.fill[Byte](64)(200.toByte)
    val bmp = Multimodal.bmpBytes(0L, body)
    assert(Hashing.aHash64(bmp) == 0xFFFFFFFF00000000L)
    // identical body -> identical hash (hamming 0)
    assert(Hashing.aHash64(Multimodal.bmpBytes(7L, body)) == 0xFFFFFFFF00000000L)
    // one flipped byte moves few cells
    val near = body.clone(); near(5) = 250.toByte
    val h2 = Hashing.aHash64(Multimodal.bmpBytes(0L, near))
    assert(java.lang.Long.bitCount(0xFFFFFFFF00000000L ^ h2) <= 3)
    // non-BMP, truncated, empty-pixel payloads -> null
    assert(Hashing.aHash64("RIFFxxxxWAVE".getBytes ++ new Array[Byte](60)) == null)
    assert(Hashing.aHash64("BM".getBytes) == null)
    assert(Hashing.aHash64(Multimodal.bmpBytes(0L, Array.emptyByteArray)) == null)
    assert(Hashing.aHash64(null) == null)
  }

  test("audioHash64 kernel: known PCM envelope, null on non-WAV/empty, scale-invariant") {
    import graft.functions.Hashing
    // 65 samples of strictly increasing amplitude -> one sample per
    // window, every delta positive -> all 64 bits set
    def pcm(f: Int => Int): Array[Byte] =
      (0 until 65).flatMap { k =>
        val s = f(k); Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)
      }.toArray
    val up = Multimodal.wavBytes(1L, pcm(k => k + 1))
    assert(Hashing.audioHash64(up) == -1L) // 0xFFFF...F
    // strictly decreasing -> no delta positive -> 0
    assert(Hashing.audioHash64(Multimodal.wavBytes(1L, pcm(k => 65 - k))) == 0L)
    // a scaled copy (re-encode at double gain) keeps the SIGN pattern:
    // identical hash — the content-dedup property byte checksums lack
    assert(Hashing.audioHash64(Multimodal.wavBytes(4L, pcm(k => 2 * (k + 1)))) == -1L)
    // negative samples count by |amplitude|
    assert(Hashing.audioHash64(Multimodal.wavBytes(1L, pcm(k => -(k + 1)))) == -1L)
    // non-WAV, truncated, empty-body payloads -> null
    assert(Hashing.audioHash64(Multimodal.bmpBytes(0L, pcm(_ + 1))) == null)
    assert(Hashing.audioHash64("RIFF".getBytes) == null)
    assert(Hashing.audioHash64(Multimodal.wavBytes(1L, Array.emptyByteArray)) == null)
    assert(Hashing.audioHash64(Multimodal.wavBytes(1L, Array[Byte](7))) == null) // <1 sample
    assert(Hashing.audioHash64(null) == null)
  }

  test("videoHash64 kernel: known brightness pattern, header-driven, null on non-AVI") {
    import graft.functions.Hashing
    // id 41 -> frames = 24 + 41 % 240 = 65: a 65-byte body is one byte
    // per frame and slot t samples frame t exactly — hand-computable
    def body(f: Int => Int): Array[Byte] =
      (0 until 65).map(k => f(k).toByte).toArray
    val up = Multimodal.aviBytes(41L, body(k => k + 1))
    assert(Hashing.videoHash64(up) == -1L) // strictly brighter -> all set
    assert(Hashing.videoHash64(Multimodal.aviBytes(41L, body(k => 65 - k))) == 0L)
    // a uniformly re-graded copy (+5 brightness per byte) keeps every
    // delta sign: identical hash — the content-dedup property
    val wave = body(k => 10 + (k % 7) * 9)
    val shifted = wave.map(b => (b + 5).toByte)
    val hw = Hashing.videoHash64(Multimodal.aviBytes(41L, wave))
    assert(hw != null &&
      hw == Hashing.videoHash64(Multimodal.aviBytes(41L, shifted)))
    // the PARSED header drives the slicing: same 130-byte body under a
    // different declared frame count fingerprints differently
    val longBody = (0 until 130).map(k => ((k * 37 + 11) % 120).toByte).toArray
    val h41 = Hashing.videoHash64(Multimodal.aviBytes(41L, longBody))  // 65 frames
    val h42 = Hashing.videoHash64(Multimodal.aviBytes(42L, longBody))  // 66 frames
    assert(h41 != null && h42 != null && h41 != h42,
      s"frame count must enter the hash: $h41 vs $h42")
    // non-AVI, truncated, fewer bytes than declared frames -> null
    assert(Hashing.videoHash64(Multimodal.wavBytes(1L, body(_ + 1))) == null)
    assert(Hashing.videoHash64("RIFF".getBytes) == null)
    assert(Hashing.videoHash64(Multimodal.aviBytes(41L, Array.emptyByteArray)) == null)
    assert(Hashing.videoHash64(Multimodal.aviBytes(42L, body(_ + 1))) == null) // 65 < 66 frames
    assert(Hashing.videoHash64(null) == null)
  }

  test("videoHashPairs: same content+frame-count pairs, unrelated does not") {
    // ids congruent mod 240 declare the SAME frame count, so identical
    // footage re-published under another id hashes identically; id 3's
    // unrelated text lands ~32 bits away
    val near1 = "the quick brown fox jumps over the lazy dog again and again and again"
    val near2 = "the quick brown fox jumps over the lazy dog again and aGain and again"
    val docs = docsDF(Seq(
      (1L, near1), (241L, near1), (481L, near2),
      (3L, "completely different content about database query optimizers")))
    val media = Multimodal.asVideoTable(docs)
    val pairs = Multimodal.videoHashPairs(media)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    graft.core.CacheScope.releaseAll()
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    assert(pairSet.contains((1L, 241L)), s"identical clips must pair: ${pairs.toSeq}")
    assert(pairs.find(p => (p._1, p._2) == ((1L, 241L))).get._3 == 0)
    assert(pairSet.contains((1L, 481L)) && pairSet.contains((241L, 481L)),
      s"near-identical clips (same frame count) must pair: ${pairs.toSeq}")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated clip (hamming ~32) must not pair at radius 13: ${pairs.toSeq}")
  }

  test("hammingPairs amplification: arity 2 equals arity 1 when no cap " +
      "binds, restores pairs the saturated single-band cap deletes") {
    import spark.implicits._
    // synthetic 64-bit hashes — direct control of every band. The
    // near-pair (ids 9001/9002, hamming 2, dirty bands {1, 8}); the
    // crowd is ADVERSARIAL to single-band keys: for every band b, 22
    // rows share the pair's value in band b but differ from it (and
    // from each other's groups) by ≥1 in every other band — so each
    // crowd row sits ≥15 bits from the pair (never a true near-dup)
    // yet every single-band bucket the pair occupies holds 24 > cap
    // rows, while every band-PAIR composite bucket of the near-pair
    // holds exactly 2.
    val a = 0x7A7A5C5C3E3E1F1FL
    def bandVal(h: Long, b: Int): Long = (h >>> (4 * b)) & 15L
    val crowd = for {
      b <- 0 until 16
      j <- 0 until 22
    } yield {
      val h = (0 until 16).foldLeft(0L) { (acc, k) =>
        val v = if (k == b) bandVal(a, k)
        else (bandVal(a, k) + 1 + (j % 14)) & 15L
        acc | (v << (4 * k))
      }
      (10000L + b * 100 + j, h)
    }
    val rows = crowd ++ Seq((9001L, a), (9002L, a ^ (1L << 7) ^ (1L << 33)))
    val hashed = rows.toDF("media_id", "vhash")
    def pairs(arity: Int, cap: Int) =
      Multimodal.hammingPairs(hashed, "vhash", 13, 16, cap, arity)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // no cap binding (cap > corpus): both arities are recall-complete
    // at the radius, so outputs are IDENTICAL sets
    val uncapped1 = pairs(1, 100000)
    assert(uncapped1 == pairs(2, 100000),
      "arity must not change the uncapped output — both are complete")
    assert(uncapped1.contains((9001L, 9002L)))
    // cap 20 binding: every single-band bucket the pair occupies holds
    // 24 rows and is deleted — the recall collapse the probe measured
    // at corpus scale; composite keys keep the pair's buckets at 2
    assert(!pairs(1, 20).contains((9001L, 9002L)),
      "fixture must demonstrate the single-band recall collapse")
    assert(pairs(2, 20).contains((9001L, 9002L)),
      "arity-2 composite keys must restore the capped-away pair")
    graft.core.CacheScope.releaseAll()
  }

  test("hammingPairs amplification: worst-case spread at the radius " +
      "stays recall-complete; arity beyond bands - maxHamming rejected") {
    import spark.implicits._
    // adversarial placement: 13 flipped bits in 13 DIFFERENT bands
    // (bits 0,4,8,...,48) leaves exactly 3 clean bands {13,14,15} —
    // the pigeonhole minimum. C(3,2) = 3 clean band pairs remain, so
    // arity 2 must still emit the pair.
    val base = 0x5D5D2B2B4E4E1717L
    val dirty = (0 until 13).foldLeft(base)((h, i) => h ^ (1L << (i * 4)))
    val hashed = Seq((1L, base), (2L, dirty)).toDF("media_id", "vhash")
    val got = Multimodal.hammingPairs(hashed, "vhash", 13, 16, 256, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == Seq((1L, 2L, 13)),
      s"worst-case 13-band spread must survive arity-2 banding: ${got.toSeq}")
    // one more dirty band (14 of 16) leaves only 2 clean bands — the
    // completeness precondition fails and the kernel must refuse the
    // configuration rather than silently lose recall
    intercept[IllegalArgumentException] {
      Multimodal.hammingPairs(hashed, "vhash", 14, 16, 256, 3)
    }
    graft.core.CacheScope.releaseAll()
  }

  test("asVideoTable payloads decode as AVI with the generator's fields") {
    val docs = docsDF(Seq((5L, "frame data bytes here payloadish " * 3), (8L, "y" * 80)))
    val decoded = Multimodal.decodeContainers(Multimodal.asVideoTable(docs))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(7)))
    assert(decoded.forall(_._2 == "avi"), s"every payload is an AVI: ${decoded.toSeq}")
    // frame count follows the generator formula (24 + id % 240)
    assert(decoded.map(d => d._1 -> d._3).toMap.apply(5L) == 29L)
  }

  test("media content hashes callable from SQL, agree with the JVM kernels") {
    import graft.functions.{GraftFunctions, Hashing}
    import spark.implicits._
    GraftFunctions.register(spark)
    val body = (0 until 130).map(k => ((k * 37 + 11) % 120).toByte).toArray
    val rows = Seq(
      (1L, Multimodal.bmpBytes(0L, body)),
      (2L, Multimodal.wavBytes(1L, body)),
      (3L, Multimodal.aviBytes(41L, body))).toDF("id", "payload")
    val got = rows.selectExpr("id",
        "graft_ahash64(payload) AS ah",
        "graft_audiohash64(payload) AS au",
        "graft_videohash64(payload) AS vh")
      .collect().map(r => r.getLong(0) -> (r.get(1), r.get(2), r.get(3))).toMap
    // each SQL hash agrees with the kernel on its modality and is null
    // on the other two (the per-payload fault-tolerance contract)
    assert(got(1L) == ((Hashing.aHash64(Multimodal.bmpBytes(0L, body)), null, null)))
    assert(got(2L) == ((null, Hashing.audioHash64(Multimodal.wavBytes(1L, body)), null)))
    assert(got(3L) == ((null, null, Hashing.videoHash64(Multimodal.aviBytes(41L, body)))))
    assert(got(3L)._3 != null)
  }

  test("audioHashPairs: same/near envelopes pair, unrelated do not") {
    val near1 = "the quick brown fox jumps over the lazy dog again and again and again"
    val near2 = "the quick brown fox jumps over the lazy dog again and again and agaiN"
    val docs = docsDF(Seq(
      (1L, near1), (2L, near2),
      (3L, "completely different content about database query optimizers"),
      (4L, near1)))
    val media = Multimodal.asAudioTable(docs)
    val pairs = Multimodal.audioHashPairs(media)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    graft.core.CacheScope.releaseAll()
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    assert(pairSet.contains((1L, 4L)), s"identical audio must pair: ${pairs.toSeq}")
    assert(pairs.find(p => (p._1, p._2) == ((1L, 4L))).get._3 == 0)
    assert(pairSet.contains((1L, 2L)) && pairSet.contains((2L, 4L)),
      s"near-identical audio must pair: ${pairs.toSeq}")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated audio (hamming ~30) must not pair at radius 6: ${pairs.toSeq}")
  }

  test("asAudioTable payloads decode as WAV with the generator's fields") {
    val docs = docsDF(Seq((5L, "some text as pcm body here"), (8L, "x" * 80)))
    val decoded = Multimodal.decodeContainers(Multimodal.asAudioTable(docs))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(4)))
    assert(decoded.forall(_._2 == "wav"), s"every payload is a WAV: ${decoded.toSeq}")
    // sample rate follows the generator formula (8000 + (id % 5) * 8000)
    assert(decoded.map(d => d._1 -> d._3).toMap.apply(5L) == 8000L)
  }

  test("phashPairs: near-identical images pair at low hamming, unrelated do not") {
    val near1 = "the quick brown fox jumps over the lazy dog again and again and again"
    val near2 = "the quick brown fox jumps over the lazy dog again and again and agaiN"
    val docs = docsDF(Seq(
      (1L, near1), (2L, near2),
      (3L, "completely different content about database query optimizers"),
      (4L, near1)))
    val media = Multimodal.asImageTable(docs)
    val pairs = Multimodal.phashPairs(media, maxHamming = 3, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    graft.core.CacheScope.releaseAll()
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    assert(pairSet.contains((1L, 4L)), s"identical images must pair: ${pairs.toSeq}")
    assert(pairs.find(p => (p._1, p._2) == ((1L, 4L))).get._3 == 0)
    assert(pairSet.contains((1L, 2L)) && pairSet.contains((2L, 4L)),
      s"near-identical images must pair: ${pairs.toSeq}")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated image must not pair at radius 3: ${pairs.toSeq}")
  }

  test("fixture builders drop NULL-text docs instead of crashing the job") {
    val docs = docsDF(Seq((1L, "real content here"), (3L, "more content")))
      .unionByName(spark.sql("SELECT 2L AS doc_id, CAST(NULL AS STRING) AS text, " +
        "'en' AS lang, 'src' AS source, 0L AS n_chars"))
    assert(Multimodal.asImageTable(docs).collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 3L))
    assert(Multimodal.asContainerTable(docs).collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 3L))
  }

  test("phashPairs: payload column stays out of the pair join's shuffles") {
    // the banded self-join must move only (media_id, phash) — a plan
    // that shuffles payload bytes would be quadratic in IO at scale
    val docs = docsDF((1L to 40L).map(i => (i, s"document number $i with some text body")))
    val plan = Multimodal.phashPairs(Multimodal.asImageTable(docs))
      .queryExecution.optimizedPlan
    graft.core.CacheScope.releaseAll()
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.nonEmpty)
    joins.foreach { j =>
      val cols = j.output.map(_.name)
      assert(!cols.contains("payload"), s"payload reaches a join: $cols")
    }
  }

  test("pngPixels: inflate + all five filter reversals recover the padded body; ImageIO agrees (r17)") {
    import graft.functions.Hashing
    // ≥5 rows so the generator's cycling filter types exercise every
    // reversal branch (None/Sub/Up/Average/Paeth)
    val id = 7L // w = 8 + 7 % 24 = 15
    val body = ("The quick brown fox jumps over the lazy dog. " * 4).getBytes("UTF-8")
    val png = Multimodal.pngBytes(id, body)
    val w = Multimodal.Gen.pngWidth(id)
    val h = (body.length + w - 1) / w
    assert(h >= 5, s"fixture too short to cycle all filters: $h rows")
    val expect = java.util.Arrays.copyOf(body, w * h)
    val got = Hashing.pngPixels(png)
    assert(got != null && got.sameElements(expect),
      "decoded pixels != zero-padded body")
    // independent decoder: the JDK's own ImageIO reads the same bytes
    // — a real-codec differential, not a round trip through our code
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null, "ImageIO refused the generated PNG")
    assert(img.getWidth == w && img.getHeight == h)
    val raster = img.getRaster
    for (y <- 0 until h; x <- 0 until w)
      assert(raster.getSample(x, y, 0) == (expect(y * w + x) & 0xff),
        s"ImageIO pixel ($x,$y) disagrees with pngPixels")
    // and the hash kernel equals the BMP cell walk over the same buffer
    val viaBmp = Hashing.aHash64(Multimodal.bmpBytes(0L, expect))
    assert(Hashing.pngAHash64(png) == viaBmp,
      "pngAHash64 != aHash64 over the identical pixel buffer")
  }

  test("pngPixels: malformed payloads (bad magic, CRC corruption, truncation, unsupported shape) yield null, never throw (r17)") {
    import graft.functions.Hashing
    val body = "some pixel content for the decoder".getBytes("UTF-8")
    val png = Multimodal.pngBytes(3L, body)
    assert(Hashing.pngPixels(null) == null)
    assert(Hashing.pngPixels("not a png at all".getBytes) == null)
    // flip one IDAT byte: the chunk CRC must refuse it
    val corrupt = png.clone()
    corrupt(8 + 25 + 12 + 10) = (corrupt(8 + 25 + 12 + 10) ^ 0x40).toByte
    assert(Hashing.pngPixels(corrupt) == null, "CRC corruption not refused")
    // truncation mid-chunk
    assert(Hashing.pngPixels(java.util.Arrays.copyOf(png, png.length - 9)) == null)
    // unsupported shape: 16-bit depth in a CRC-correct IHDR
    def be32(v: Long): Array[Byte] = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
      val t = tpe.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32(); crc.update(t); crc.update(data)
      be32(data.length.toLong) ++ t ++ data ++ be32(crc.getValue)
    }
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val deep = sig ++ chunk("IHDR",
      be32(4) ++ be32(4) ++ Array[Byte](16, 0, 0, 0, 0)) ++
      chunk("IDAT", Array[Byte](1, 2, 3)) ++ chunk("IEND", Array.emptyByteArray)
    assert(Hashing.pngPixels(deep) == null, "16-bit depth not refused")
    // inflate-length mismatch: a valid zlib stream shorter than the
    // declared scanlines must be refused, not zero-filled
    val shortRaw = new java.util.zip.Deflater()
    shortRaw.setInput(Array[Byte](0, 1, 2)); shortRaw.finish()
    val zb = new Array[Byte](64)
    val zn = shortRaw.deflate(zb); shortRaw.end()
    val tooShort = sig ++ chunk("IHDR",
      be32(4) ++ be32(4) ++ Array[Byte](8, 0, 0, 0, 0)) ++
      chunk("IDAT", java.util.Arrays.copyOf(zb, zn)) ++
      chunk("IEND", Array.emptyByteArray)
    assert(Hashing.pngPixels(tooShort) == null, "truncated stream not refused")
  }

  test("pngAHash: near-identical pixel buffers pair within the radius through the PNG round trip (r17)") {
    import org.apache.spark.sql.functions._
    val base = "A long enough shared payload for meaningful cells. " * 6
    val pngs = Multimodal.asPngTable(docsDF(Seq(
      (0L, base), (24L, base + "x"), // same width (24 % 24 = 0): near-dup
      (7L, "completely different content here, nothing alike at all " * 5))))
    val pairs = Multimodal.phashPngPairs(pngs).collect()
    assert(pairs.exists(r => r.getLong(0) == 0L && r.getLong(1) == 24L),
      s"near-identical PNGs did not pair: ${pairs.mkString(", ")}")
    assert(!pairs.exists(r => r.getLong(1) == 7L || r.getLong(0) == 7L),
      "unrelated PNG paired")
  }
}
