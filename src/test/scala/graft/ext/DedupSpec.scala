package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class DedupSpec extends SparkSpec {

  private def docsDF(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'src' AS source",
        "length(text) AS n_chars")
  }

  test("dupSizeHistogram: multiplicities partition the corpus exactly") {
    val df = docsDF(Seq(
      (1L, "aaa"), (2L, "AAA"), (3L, "aaa "),      // one group of 3
      (4L, "bbb"), (5L, "bbb"),                    // one group of 2
      (6L, "ccc"), (7L, "ddd")))                   // two singletons
    val out = Dedup.dupSizeHistogram(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(1L -> ((2L, 2L)), 2L -> ((1L, 2L)), 3L -> ((1L, 3L))))
    assert(out.values.map(_._2).sum == 7L, "doc mass must partition the corpus")
  }

  test("exact dedup keeps lowest doc_id per normalized text") {
    val df = docsDF(Seq(
      (1L, "Hello  World"), (2L, "hello world"), (3L, "HELLO\tWORLD"),
      (4L, "different doc"), (5L, "another one")))
    val out = Dedup.exact(df).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 4L, 5L))
  }

  test("incrementalExact: drops within-batch re-fetches and corpus-known content") {
    val corpus = docsDF(Seq(
      (10L, "already ingested page"), (12L, "another known page")))
    val batch = docsDF(Seq(
      (20L, "ALREADY   ingested page"),  // known to the corpus (normalized)
      (21L, "fresh page one"),
      (22L, "Fresh  Page One"),          // within-batch dup of 21 → loses
      (23L, "fresh page two")))
    val out = Dedup.incrementalExact(batch, corpus).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(21L, 23L))
    // columns pass through unchanged (fingerprint never leaks)
    assert(out.head.schema.fieldNames.toSeq ==
      Seq("doc_id", "text", "lang", "source", "n_chars"))
  }

  test("incrementalExact: empty corpus reduces to plain within-batch exact dedup") {
    val batch = docsDF(Seq(
      (1L, "a doc"), (2L, "A  DOC"), (3L, "b doc")))
    val out = Dedup.incrementalExact(batch, docsDF(Nil)).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L))
  }

  test("exactKeepLongest keeps the longest copy, ties to lowest doc_id") {
    import spark.implicits._
    // same normalized text, different raw lengths (trailing whitespace)
    val df = Seq(
      (1L, "hello world"), (2L, "hello   world  "), (3L, "hello world "),
      (4L, "another doc"))
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source",
        "length(text) AS n_chars")
    val out = Dedup.exactKeepLongest(df).collect().map(_.getLong(0)).toSet
    assert(out == Set(2L, 4L)) // doc 2 is the longest of the dup group
  }

  test("minhash: exact duplicates always pair with est_jaccard 1.0") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val df = docsDF(Seq(
      (1L, base), (2L, base),
      (3L, "completely unrelated words about spark catalyst optimizer rules"),
      (4L, "yet another separate document mentioning parquet columnar scans")))
    val pairs = Dedup.minHashPairs(df, threshold = 0.9).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L
      && r.getDouble(2) == 1.0))
    // unrelated docs must not pair at a high threshold
    assert(!pairs.exists(r => r.getLong(0) == 3L || r.getLong(1) == 3L))
  }

  test("minhash threshold monotonicity: higher threshold ⊆ lower threshold") {
    val df = docsDF((1L to 30L).map { i =>
      val words = (0 until 20).map(j => s"w${(i * 7 + j * 3) % 25}").mkString(" ")
      (i, words)
    })
    val lo = Dedup.minHashPairs(df, threshold = 0.2)
      .select("doc_id_a", "doc_id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hi = Dedup.minHashPairs(df, threshold = 0.6)
      .select("doc_id_a", "doc_id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hi.subsetOf(lo))
  }

  test("minhash K/bands are config: K=128/b=32 keeps the exact-dup guarantee") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val df = docsDF(Seq(
      (1L, base), (2L, base),
      (3L, "completely unrelated words about spark catalyst optimizer rules")))
    for ((k, b) <- Seq((16, 4), (128, 32))) {
      val pairs = Dedup.minHashPairs(df, threshold = 0.9, k = k, bands = b).collect()
      assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L
        && r.getDouble(2) == 1.0), s"K=$k b=$b")
      assert(!pairs.exists(r => r.getLong(0) == 3L || r.getLong(1) == 3L))
    }
    // growing K is backward-stable: first 16 signature slots unchanged
    val s16 = graft.functions.Hashing.minhashSig(base, 16).toSeq
    val s128 = graft.functions.Hashing.minhashSig(base, 128).toSeq
    assert(s128.take(16) == s16)
  }

  test("minHashDedup removes near-dup copies, keeps distinct docs") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = docsDF(Seq(
      (1L, base), (2L, base), (3L, base + " lambda"), // 3 is a near-dup of 1
      (4L, "some totally different text with other vocabulary entirely here")))
    val out = Dedup.minHashDedup(df, threshold = 0.5).collect()
    val ids = out.map(_.getLong(0)).toSet
    assert(ids.contains(1L) && ids.contains(4L))
    assert(!ids.contains(2L)) // exact copy dropped
  }

  test("incrementalMinHash: corpus-wins drop policy, batch-internal lower-id wins") {
    // corpus holds 10/20; the batch re-crawls a near-copy of 10 (id 31,
    // must drop: corpus wins), two near-copies of each other (32 < 33:
    // 33 drops, 32 survives), and novel content (34 survives)
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val other = "one two three four five six seven eight nine ten eleven"
    val corpus = docsDF(Seq((10L, base), (20L, "unrelated corpus doc vocab")))
    val batch = docsDF(Seq(
      (31L, base + " lambda"),
      (32L, other), (33L, other + " twelve"),
      (34L, "completely novel snapshot content with fresh words here")))
    val got = Dedup.incrementalMinHash(batch, corpus, threshold = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(32L, 34L), s"survivors: $got")
    // and the policy replays from the union pair set: for every pair,
    // a batch member loses to a corpus partner or a lower-id batch one
    val all = corpus.unionByName(batch)
    val pairs = Dedup.minHashPairs(all, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def isBatch(x: Long) = x >= 31L
    val losers = pairs.flatMap { case (a, b) =>
      if (isBatch(a) && isBatch(b)) Some(b)
      else if (isBatch(a)) Some(a)
      else if (isBatch(b)) Some(b)
      else None
    }.toSet
    assert(got == Set(31L, 32L, 33L, 34L) -- losers,
      s"engine survivors must replay from the union pair set: $losers")
  }

  test("incrementalMinHash: requireDisjointIds turns silent id-collision miss loud") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = docsDF(Seq((10L, base)))
    // batch doc 10 shares its id with its corpus near-dup partner: the
    // self-pair guard silently discards the genuine cross-set pair, so
    // the opt-in check must refuse the call outright
    val colliding = docsDF(Seq((10L, base + " lambda")))
    val e = intercept[IllegalArgumentException] {
      Dedup.incrementalMinHash(colliding, corpus, threshold = 0.5,
        requireDisjointIds = true)
    }
    assert(e.getMessage.contains("doc_ids overlap"))
    // disjoint ids pass the check and produce the unchecked result
    val batch = docsDF(Seq((31L, base + " lambda"), (34L, "novel words here entirely")))
    val checked = Dedup.incrementalMinHash(batch, corpus, threshold = 0.5,
      requireDisjointIds = true).collect().map(_.getLong(0)).toSet
    assert(checked == Set(34L), s"survivors: $checked")
  }

  test("simhash: identical texts have hamming 0; disjoint vocab far apart") {
    val df = docsDF(Seq(
      (1L, "spark shuffle partition broadcast join codegen whole stage"),
      (2L, "spark shuffle partition broadcast join codegen whole stage"),
      (3L, "zx qv wq jk pl mn bv cx df gh")))
    val pairs = Dedup.simHashPairs(df, maxHamming = 3).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L
      && r.getInt(2) == 0))
    assert(!pairs.exists(r => r.getLong(1) == 3L))
  }

  test("ngram Jaccard verify: exact value on constructed overlap") {
    // doc1: 12 words → 10 3-grams; doc2 appends one word → 11 grams
    // sharing all 10 → exact J = 10/11. High J ⇒ the LSH candidate
    // stage (bands of 4) finds the pair with near-certainty.
    val base = (1 to 12).map(i => s"w$i").mkString(" ")
    val df = docsDF(Seq(
      (1L, base), (2L, base + " w13"),
      (3L, "totally different unrelated vocabulary set right here friend")))
    val pairs = Dedup.ngramJaccardPairs(df,
      candidateThreshold = 0.3, threshold = 0.3).collect()
    val p12 = pairs.find(r => r.getLong(1) == 1L && r.getLong(0) == 2L ||
      r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(p12.isDefined, s"expected 1-2 pair in ${pairs.mkString(",")}")
    assert(math.abs(p12.get.getAs[Double]("exact_jaccard") - 10.0 / 11.0) < 1e-5)
    assert(!pairs.exists(r => r.getLong(0) == 3L || r.getLong(1) == 3L))
  }

  test("ngram exact pairs (inverted index): exact J, no sketch, cap respected") {
    val base = (1 to 12).map(i => s"w$i").mkString(" ")
    val df = docsDF(Seq(
      (1L, base), (2L, base + " w13"),
      (3L, "totally different unrelated vocabulary set right here friend")))
    val pairs = Dedup.ngramJaccardPairsExact(df, threshold = 0.3).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)
    assert(math.abs(pairs.head.getAs[Double]("exact_jaccard") - 10.0 / 11.0) < 1e-5)
    // a gram shared by every doc is dropped by the frequency cap: with
    // cap=1 nothing can pair (every shared gram exceeds the cap)
    val capped = Dedup.ngramJaccardPairsExact(df, threshold = 0.1, maxGramDocs = 1)
    assert(capped.count() == 0)
  }

  test("prefix-filtered pairs (PPJoin): recall-complete vs brute force") {
    // mixed corpus: near-identical pairs, a chain, shared stop-grams,
    // and distinct docs — prefix filtering must find EXACTLY the pairs
    // brute force finds at J >= 0.6 (the prefix principle is complete)
    val base = (1 to 20).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base + " w21"),                       // J = 18/19 with 1
      (3L, base + " w21 w22"),                   // chains to 2
      (4L, (1 to 20).map(i => s"v$i").mkString(" ")),
      (5L, (1 to 20).map(i => s"v$i").mkString(" ") + " v21"),
      (6L, "the a of and " * 5 + "unique tail here"), // stop-gram heavy
      (7L, "the a of and " * 5 + "other ending there"),
      (8L, "completely standalone vocabulary nothing shared at all ever"))
    val df = docsDF(docs)
    val got = Dedup.ngramJaccardPairsPrefix(df, threshold = 0.6).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("exact_jaccard")).toMap
    // driver-side brute force on the same gram sets
    val sets = docs.map { case (id, t) =>
      id -> graft.functions.Hashing.ngramHashes(t, 3).toSet }
    val want = (for {
      (ia, ga) <- sets; (ib, gb) <- sets
      if ia < ib
      inter = (ga intersect gb).size
      j = inter.toDouble / (ga.size + gb.size - inter)
      if j >= 0.6
    } yield (ia, ib) -> j).toMap
    assert(got.keySet == want.keySet,
      s"got ${got.keySet}, want ${want.keySet}")
    want.foreach { case (k, j) => assert(math.abs(got(k) - j) < 1e-5, s"$k") }
  }

  test("prefix index is strictly smaller than the full inverted index") {
    import org.apache.spark.sql.functions._
    val df = docsDF((1 to 30).map(i =>
      (i.toLong, (1 to 25).map(w => s"w${(w + i) % 40}").mkString(" "))))
    val sets = df.select(col("doc_id"),
      graft.functions.GraftFunctions.ngramHashes(col("text"), 3).as("grams"))
    val full = sets.select(explode(col("grams"))).count()
    // at t=0.6 each doc posts at most ⌈0.4|g|⌉+1 prefix grams
    val sizes = sets.select(size(col("grams"))).collect().map(_.getInt(0))
    val prefixBound = sizes.map(s => math.ceil(0.4 * s) + 1).sum
    assert(prefixBound < full, s"prefix bound $prefixBound !< full $full")
  }

  test("embedding near-dup: identical vectors pair at cosine 1.0") {
    import spark.implicits._
    val v1 = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val v2 = Array.tabulate(64)(i => math.cos(i * 2 + 1).toFloat)
    val df = Seq((1L, v1.toSeq, 0), (2L, v1.toSeq, 0), (3L, v2.toSeq, 1))
      .toDF("vec_id", "embedding", "label")
    val pairs = Dedup.embeddingPairs(df, threshold = 0.99).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)
    assert(math.abs(pairs.head.getDouble(2) - 1.0) < 1e-9)
  }

  test("embedding near-dup: oversized-bucket guard bounds degenerate inputs") {
    import spark.implicits._
    // 5 000 constant vectors all sketch identically → every band
    // collapses into ONE bucket; unguarded, the self-join is n²/2 pairs
    val n = 5000
    val degen = (0 until n).map(i => (i.toLong, Seq.fill(64)(1.0f), 0))
      .toDF("vec_id", "embedding", "label")
    assert(Dedup.embeddingPairs(degen, threshold = 0.0).count() == 0,
      "saturated buckets must be capped out, not self-joined")
    // the unguarded path on a SMALL degenerate input shows the blowup
    // the guard prevents: exactly n·(n−1)/2 pairs
    val m = 200
    val small = (0 until m).map(i => (i.toLong, Seq.fill(64)(1.0f), 0))
      .toDF("vec_id", "embedding", "label")
    assert(Dedup.embeddingPairs(small, threshold = 0.0, maxBucket = 0).count()
      == m.toLong * (m - 1) / 2)
    // the guard is surgical: pairs among well-spread vectors survive a
    // co-resident degenerate block (never gain pairs, never pair INTO it)
    val rnd = new scala.util.Random(7)
    val spread = (0 until 50).map(i =>
      (1000000L + i, Seq.fill(64)(rnd.nextFloat() - 0.5f), 1))
    val mixed = (spread ++ (0 until 300).map(i => (i.toLong, Seq.fill(64)(1.0f), 0)))
      .toDF("vec_id", "embedding", "label")
    val base = Dedup.embeddingPairs(spread.toDF("vec_id", "embedding", "label"),
      threshold = 0.3, maxBucket = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val out = Dedup.embeddingPairs(mixed, threshold = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.forall { case (a, b) => a >= 1000000L && b >= 1000000L },
      "no pair may involve the capped degenerate block")
    assert(out.toSet.subsetOf(base), "guard must never invent pairs")
  }

  test("winnowPairs finds shared-passage pairs whole-doc sketches miss") {
    val header = "this license header is reproduced verbatim in every derived work of the project"
    val rnd = new scala.util.Random(17)
    def noise(n: Int) = (1 to n).map(_ => rnd.alphanumeric.take(6).mkString).mkString(" ")
    // docs 1 and 2: the pasted header inside long UNRELATED bodies —
    // whole-doc Jaccard is tiny, but the passage overlap is local
    val df = docsDF(Seq(
      (1L, noise(60) + " " + header + " " + noise(60)),
      (2L, noise(60) + " " + header + " " + noise(60)),
      (3L, noise(120))))
    val pairs = Dedup.winnowPairs(df, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L)),
      s"expected exactly the header-sharing pair, got ${pairs.toSeq}")
    // ~80 chars of shared text at density 2/(w+1) ≈ 0.22 → well past 2
    assert(pairs.head._3 >= 5, s"shared-fingerprint mass too low: ${pairs.head._3}")
    // the same corpus under whole-doc MinHash: no pair (the point of
    // LOCAL fingerprinting)
    assert(Dedup.minHashPairs(df, threshold = 0.5).count() == 0)
  }

  test("winnowPairs MaxBucket cap drops corpus-wide boilerplate fingerprints") {
    val boiler = "standard cookie consent banner text appears on every single page here"
    val rnd = new scala.util.Random(19)
    def noise(n: Int) = (1 to n).map(_ => rnd.alphanumeric.take(6).mkString).mkString(" ")
    // 8 docs all carry the boilerplate; cap at 4 → its fingerprints are
    // degenerate and must not produce any pair
    val df = docsDF((1L to 8L).map(i => (i, noise(40) + " " + boiler + " " + noise(40))))
    assert(Dedup.winnowPairs(df, minShared = 2, maxBucket = 4).count() == 0,
      "boilerplate shared by more than maxBucket docs must be capped out")
    // and with the cap off, all 28 pairs appear — the guard is the only
    // thing standing between boilerplate and a quadratic join
    assert(Dedup.winnowPairs(df, minShared = 2, maxBucket = Int.MaxValue).count() == 28)
  }

  test("minHashQuality: perfect on exact dups, recall loss visible on mid-similarity pairs") {
    // exact duplicates: sketch catches everything → P = R = F1 = 1
    val easy = docsDF(Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "one two three four five six seven eight")))
    val e = Dedup.minHashQuality(easy, threshold = 0.5).collect()(0)
    assert(e.getAs[Long]("n_true") == 1L && e.getAs[Long]("n_hit") == 1L)
    assert(e.getAs[Double]("precision") == 1.0 && e.getAs[Double]("recall") == 1.0)
    // mid-similarity pairs: 6 shared + 10 unique words → 14 trigrams
    // per doc, 4 shared → J = 4/24 ≈ 0.167; K=16/b=4 banding candidates
    // such a pair with probability 1−(1−J⁴)⁴ ≈ 0.3% — the report must
    // SHOW the recall loss, not hide it (this is the number that
    // justifies the K=128 operating point)
    def words(seed: Int, n: Int): String =
      (0 until n).map(j => s"w${seed}_$j").mkString(" ")
    val mid = docsDF((0L until 30L).flatMap { i =>
      val shared = words(1000 + i.toInt, 6)   // 6 shared words
      Seq((i * 2, shared + " " + words(i.toInt * 7, 10)),        // +10 unique
        (i * 2 + 1, shared + " " + words(i.toInt * 7 + 3, 10)))
    })
    val m = Dedup.minHashQuality(mid, threshold = 0.15).collect()(0)
    assert(m.getAs[Long]("n_true") >= 25L,
      s"expected ≥25 true mid-similarity pairs, got ${m.getAs[Long]("n_true")}")
    assert(m.getAs[Double]("recall") < 0.5,
      s"K=16 banding should visibly miss mid-similarity pairs, recall=${m.getAs[Double]("recall")}")
  }

  test("substringDedup cuts exactly the duplicated span, keeps the first occurrence") {
    // a shared passage well over SubstrK=40 normalized chars, pasted
    // into two otherwise-unrelated documents
    val passage = "this exact license header paragraph is repeated verbatim across documents"
    val uniqueA = "alpha document opens with its own words here"
    val uniqueB = "omega closing remarks specific to the second file only"
    val df = docsDF(Seq(
      (1L, s"$uniqueA $passage"),
      (2L, s"$passage $uniqueB"),
      (3L, "a fully unique third document with no shared spans at all")))
    val out = Dedup.substringDedup(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // doc 1 holds the FIRST occurrence: untouched
    assert(out(1L)._3 == s"$uniqueA $passage".toLowerCase)
    assert(out(1L)._1 == out(1L)._2)
    // doc 2 loses the span — NOT the whole document: its unique tail
    // survives, and the duplicated passage is gone
    assert(out(2L)._3.contains("omega closing remarks"),
      s"unique text must survive the cut: '${out(2L)._3}'")
    assert(!out(2L)._3.contains("license header"),
      s"duplicated span must be cut: '${out(2L)._3}'")
    assert(out(2L)._2 < out(2L)._1, "doc 2 must shrink")
    // untouched unique doc
    assert(out(3L)._3 == out(3L)._3.toLowerCase && out(3L)._1 == out(3L)._2)
  }

  test("substringDedup: overlapping and adjacent cut windows merge; short docs pass through") {
    // doc 2 repeats its own first half -> WITHIN-doc dedup: the second
    // copy (and the k-gram windows bridging the seam) is cut, the first
    // copy survives because it is the global first occurrence; doc 3 is
    // shorter than SubstrK (no k-gram, passes through verbatim)
    val base = "zero one two three four five six seven eight nine ten eleven twelve"
    val df = docsDF(Seq(
      (1L, "an unrelated first document sharing nothing with the repeats"),
      (2L, s"$base $base"),
      (3L, "tiny doc")))
    val out = Dedup.substringDedup(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L)._1 == out(1L)._2, "unique doc untouched")
    // the repeat collapses to (at most) a sub-k residue of the seam:
    // every position from the seam onward starts a duplicated k-gram
    assert(out(2L)._3.startsWith(base))
    assert(out(2L)._2 < out(2L)._1 && out(2L)._2 >= base.length,
      s"second copy cut, first kept: ${out(2L)._2} of ${out(2L)._1}")
    assert(out(2L)._2 < base.length + Dedup.SubstrK,
      "residue past the first copy must stay under one gram width")
    assert(out(3L)._3 == "tiny doc" && out(3L)._1 == out(3L)._2)
  }

  test("substringDedup pre-flight: an oversized scratch estimate refuses in seconds, naming the numbers (r15 verdict #5)") {
    val docs = graft.io.Sources.table(spark, "/root/testdata/sf0.001", "documents")
    try {
      // a parquet-backed frame has input files, so the estimate is
      // real; a 1 kB limit makes any corpus oversized
      spark.conf.set(Dedup.SubstrScratchLimitConf, "1000")
      val e = intercept[IllegalArgumentException] {
        Dedup.substringDedup(docs)
      }
      assert(e.getMessage.contains("pre-flight") &&
        e.getMessage.contains(Dedup.SubstrScratchLimitConf), e.getMessage)
      // the refusal names BOTH numbers: the estimate (input bytes ×
      // the per-byte constant) and the configured limit
      val f = new java.io.File("/root/testdata/sf0.001/documents.parquet")
      val fileBytes =
        if (f.isDirectory)
          f.listFiles.filter(c => c.isFile && c.getName.endsWith(".parquet"))
            .map(_.length).sum
        else f.length
      val expectedEst = fileBytes * Dedup.SubstrScratchPerInputByte
      assert(e.getMessage.contains(s"$expectedEst bytes") &&
        e.getMessage.contains("1000 bytes"),
        s"must name estimate and limit: ${e.getMessage}")
      // -1 disables the guard (the cluster posture)
      spark.conf.set(Dedup.SubstrScratchLimitConf, "-1")
      assert(Dedup.substringDedup(docs).limit(1).count() >= 0)
      graft.core.CacheScope.releaseAll()
    } finally spark.conf.unset(Dedup.SubstrScratchLimitConf)
  }

  test("substringDedupPasses: hash-range execution is bit-identical to the single sort; the pre-flight auto-routes under a tight budget (r16 verdict #5)") {
    val docs = graft.io.Sources.table(spark, "/root/testdata/sf0.001", "documents")
    val single = Dedup.substringDedupPasses(docs, passes = 1)
      .collect().map(_.toSeq).toSeq
    // 3 ranges: grouping key h never crosses ranges, so the union of
    // per-range non-first duplicated positions IS the global set
    val ranged = Dedup.substringDedupPasses(docs, passes = 3)
      .collect().map(_.toSeq).toSeq
    assert(ranged == single, "ranged execution diverged from the single sort")
    // auto-route: a budget at ~half the estimate used to REFUSE (r15
    // fence); now it shards into ⌈est/limit⌉ = 2 passes and completes
    // with the same rows — the remedy, not the fence
    val (est, _) = Dedup.substrScratch(docs)
    try {
      spark.conf.set(Dedup.SubstrScratchLimitConf, (est / 2 + 1).toString)
      assert(Dedup.substringDedup(docs).collect().map(_.toSeq).toSeq == single,
        "auto-routed ranged run diverged")
      // an explicit pass override wins over the estimate
      spark.conf.set(Dedup.SubstrPassesConf, "5")
      assert(Dedup.substringDedup(docs).collect().map(_.toSeq).toSeq == single,
        "forced-passes run diverged")
    } finally {
      spark.conf.unset(Dedup.SubstrScratchLimitConf)
      spark.conf.unset(Dedup.SubstrPassesConf)
    }
    graft.core.CacheScope.releaseAll()
  }
}
