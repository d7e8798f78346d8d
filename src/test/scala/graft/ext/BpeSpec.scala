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
}
