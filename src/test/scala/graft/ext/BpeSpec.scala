package graft.ext

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docsDF(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'src' AS source",
        "length(text) AS n_chars")

  test("bpeVocab: hand-computed merge sequence on a tiny corpus") {
    // corpus: "low" x5, "lower" x2, "newest" x6, "widest" x3 — the
    // Sennrich paper's classic example family.
    // Initial symbols: l o w </w> | l o w e r </w> | n e w e s t </w> |
    // w i d e s t </w>. Pair counts (weighted):
    //   (e,s) 6+3=9, (s,t) 9, (t,</w>) 9, (w,e) 2+6=8, (l,o) 7, (o,w) 7,
    //   (w,</w>) 5, (e,r) 2, (r,</w>) 2, (n,e) 6, (e,w) 6, (w,i) 3,
    //   (i,d) 3, (d,e) 3
    // merge1: count 9 tie (e,s)/(s,t)/(t,</w>) -> lexicographic: (e,s)
    // merge2: (es,t) 9 vs (t,</w>) 9 -> "es" < "t" -> (es,t)
    // merge3: (est,</w>) 9 -> est</w>
    // merge4: after merge3, newest = n e w est</w> — its (w,e) is GONE
    //   (the e fused into est), so (w,e) counts only lower's 2;
    //   (l,o) = 5+2 = 7 ties (o,w) = 7 -> lexicographic: (l,o)
    val docs = docsDF(Seq(
      (1L, ("low " * 5).trim),
      (2L, ("lower " * 2).trim),
      (3L, ("newest " * 6).trim),
      (4L, ("widest " * 3).trim)))
    val got = Bpe.bpeVocab(docs, merges = 4).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, "e", "s", "es", 9L),
      (2L, "es", "t", "est", 9L),
      (3L, "est", "</w>", "est</w>", 9L),
      (4L, "l", "o", "lo", 7L)))
  }

  test("bpeVocab: greedy left-to-right application is non-overlapping") {
    // "aaaa": symbols a a a a </w>; (a,a) counts overlapping: 3 per
    // word x 4 words = 12 -> merge1 (a,a). Application is greedy LTR:
    // a a a a -> aa aa (NOT aa a a). merge2 candidates: (aa,aa) 4,
    // (aa,</w>) 4, tie -> "aa","aa" < "aa","</w>"? left equal, right:
    // "</w>" < "aa" (ASCII '<' 60 < 'a' 97) -> (aa,</w>) wins
    val docs = docsDF(Seq((1L, ("aaaa " * 4).trim)))
    val got = Bpe.bpeVocab(docs, merges = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, "a", "a", 12L),
      (2L, "aa", "</w>", 4L)))
  }

  test("bpeVocab: stops early when the vocabulary exhausts its pairs") {
    // single word type "ab": a b </w> -> 2 pairs, then 1, then 0 left
    val docs = docsDF(Seq((1L, "ab")))
    val got = Bpe.bpeVocab(docs, merges = 8).collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq(("a", "b"), ("ab", "</w>"))) // then no pairs left
  }

  test("bpeEncode: hand-computed tokenizer-true counts on the Sennrich corpus") {
    // 4 merges learned: (e,s),(es,t),(est,</w>),(l,o) — see the vocab
    // spec. Applied: low -> [lo w </w>] 3; lower -> [lo w e r </w>] 5;
    // newest -> [n e w est</w>] 4; widest -> [w i d est</w>] 4.
    val docs = docsDF(Seq(
      (1L, ("low " * 5).trim),
      (2L, ("lower " * 2).trim),
      (3L, ("newest " * 6).trim),
      (4L, ("widest " * 3).trim)))
    val got = Bpe.bpeEncode(docs, merges = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, 5L, 15L), (2L, 2L, 10L), (3L, 6L, 24L), (4L, 3L, 12L)))
  }

  test("bpeEncode: BPE counts diverge from whitespace counts on a crafted doc") {
    // "lowest" never appears in training but encodes under the learned
    // merges: l o w e s t </w> -(e,s)(es,t)(est,</w>)(l,o)-> [lo w est</w>]
    // = 3 symbols per occurrence — a token budget on ws counts (2) vs
    // BPE counts (6) disagrees 3x on this doc.
    val docs = docsDF(Seq(
      (1L, ("low " * 5).trim),
      (2L, ("lower " * 2).trim),
      (3L, ("newest " * 6).trim),
      (4L, ("widest " * 3).trim),
      (5L, "lowest lowest")))
    val got = Bpe.bpeEncode(docs, merges = 4)
      .filter("doc_id = 5").collect().head
    val (nWords, bpeToks) = (got.getLong(1), got.getLong(2))
    assert(nWords == 2L && bpeToks == 6L)
    assert(bpeToks != nWords, "BPE budget must not collapse to the ws count")
  }

  test("bpeTokens: hand-computed token stream on the Sennrich corpus") {
    // the exported sequence itself (4 merges — see the vocab spec):
    // low -> [lo, w, </w>], newest -> [n, e, w, est</w>], in word order
    // with a 0-based global position per doc
    val docs = docsDF(Seq(
      (1L, ("low " * 5).trim),
      (2L, ("lower " * 2).trim),
      (3L, ("newest " * 6).trim),
      (4L, ("widest " * 3).trim),
      (5L, "low newest")))
    val got = Bpe.bpeTokens(docs, merges = 4)
      .filter("doc_id = 5").collect()
      .map(r => (r.getLong(1), r.getString(2))).toSeq
    assert(got == Seq(
      0L -> "lo", 1L -> "w", 2L -> "</w>",
      3L -> "n", 4L -> "e", 5L -> "w", 6L -> "est</w>"))
  }

  test("bpeTokens: per-doc stream length equals bpeEncode's token count") {
    // stream and counts share ONE BpeApply.encode body — the invariant
    // that makes the exported sequences trustworthy as budget inputs
    val docs = docsDF(Seq(
      (1L, ("low " * 5).trim),
      (2L, ("lower " * 2).trim),
      (3L, ("newest " * 6).trim),
      (4L, ("widest " * 3).trim),
      (5L, "lowest lowest"),
      (6L, "???"))) // no letter-run words: counts 0, stream empty
    val counts = Bpe.bpeEncode(docs, merges = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val streamLens = Bpe.bpeTokens(docs, merges = 4).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length.toLong).toMap
    docs.collect().map(_.getLong(0)).foreach { id =>
      assert(streamLens.getOrElse(id, 0L) == counts(id),
        s"doc $id: stream ${streamLens.getOrElse(id, 0L)} vs count ${counts(id)}")
    }
    assert(streamLens.getOrElse(6L, 0L) == 0L)
  }

  test("bpeEncode: greedy application is non-overlapping on odd runs") {
    // merges=1 learns (a,a); "aaaaa" applies greedily LTR:
    // a a a a a </w> -> [aa aa a </w>] = 4 symbols (never [aa a aa ...])
    val docs = docsDF(Seq((1L, "aaaaa")))
    val got = Bpe.bpeEncode(docs, merges = 1).collect().head
    assert(got.getLong(1) == 1L && got.getLong(2) == 4L)
  }

  test("maxWordTypes bounds training but never encode coverage") {
    // top-1 type is "aaaa" (2 occurrences); "b" is OUTSIDE the training
    // bound yet still encodes (to [b </w>] = 2 symbols — no merge
    // applies). Merges trained on {aaaa:2} alone: (a,a) then
    // (aa,</w>) (tie (aa,aa)/(aa,</w>) resolves right-lexicographic:
    // '<' < 'a').
    val docs = docsDF(Seq((1L, "aaaa aaaa b")))
    val vocab = Bpe.bpeVocab(docs, merges = 2, maxWordTypes = 1).collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(vocab.toSeq == Seq(("a", "a"), ("aa", "</w>")))
    val got = Bpe.bpeEncode(docs, merges = 2, maxWordTypes = 1).collect().head
    // aaaa -> [aa aa</w>]? No: (a,a) greedy -> [aa aa </w>], then
    // (aa,</w>) fuses the tail -> [aa aa</w>] = 2 symbols; b -> 2.
    assert(got.getLong(1) == 3L && got.getLong(2) == 6L)
  }

  test("a non-binding maxWordTypes leaves the merge table bit-stable") {
    val docs = docsDF(Seq(
      (1L, ("low " * 5).trim), (2L, ("newest " * 6).trim)))
    val a = Bpe.bpeVocab(docs, merges = 3).collect().map(_.toSeq)
    val b = Bpe.bpeVocab(docs, merges = 3, maxWordTypes = 1000000)
      .collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("tokenizerFertility: per-lang sums equal bpeEncode's, ratios hand-checked") {
    import spark.implicits._
    // Sennrich corpus split across two languages: en trains the merges
    // jointly with xx, and the per-word symbol counts are known (see
    // the bpeEncode spec): low=3, lower=5, newest=4, widest=4
    val docs = Seq(
      (1L, ("low " * 5).trim, "en"),
      (2L, ("lower " * 2).trim, "en"),
      (3L, ("newest " * 6).trim, "xx"),
      (4L, ("widest " * 3).trim, "xx"))
      .toDF("doc_id", "text", "lang")
      .selectExpr("doc_id", "text", "lang", "'src' AS source",
        "length(text) AS n_chars")
    val got = Bpe.tokenizerFertility(docs, merges = 4).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    // en: 7 words, 5·3+2·5=25 BPE tokens, chars = 19+11 = 30? no:
    // "low "x5 trimmed = 19 chars; "lower "x2 trimmed = 11 chars
    val enChars = ("low " * 5).trim.length + ("lower " * 2).trim.length
    val xxChars = ("newest " * 6).trim.length + ("widest " * 3).trim.length
    assert(got("en") == ((2L, 7L, 25L, enChars.toLong,
      math.rint(25.0 / 7 * 1e4) / 1e4, math.rint(enChars / 25.0 * 1e4) / 1e4)))
    // xx: 9 words, 6·4+3·4=36 BPE tokens
    assert(got("xx") == ((2L, 9L, 36L, xxChars.toLong,
      4.0, math.rint(xxChars / 36.0 * 1e4) / 1e4)))
    // the audit's reason to exist: fertilities genuinely differ by lang
    assert(got("en")._5 != got("xx")._5)
  }
}
