package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, lit, sum}

class TextStatsSpec extends SparkSpec {

  private def docsDF(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang")
      .selectExpr("doc_id", "text", "lang", "'src' AS source",
        "length(text) AS n_chars")
  }

  test("wsTokenCount: empty→0, blanks collapse, leading/trailing trimmed") {
    val df = docsDF(Seq(
      (1L, "", "en"), (2L, "   ", "en"), (3L, "one", "en"),
      (4L, "  a   b\t c  ", "en")))
    val got = df.select(col("doc_id"), TextStats.wsTokenCount(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 3L))
  }

  test("bigramFreq: adjacent pairs counted across docs, short docs drop out") {
    val df = docsDF(Seq(
      (1L, "the cat sat", "en"),        // "the cat", "cat sat"
      (2L, "the cat ran", "en"),        // "the cat", "cat ran"
      (3L, "word", "en"),               // 1 token → no bigrams
      (4L, "", "en"),                   // empty → no bigrams
      (5L, "The  CAT sat", "en")))      // case/space-normalized: same as doc 1
    val got = TextStats.bigramFreq(df, topN = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(got.head == ("the cat", 3L))
    assert(got.toMap == Map(
      "the cat" -> 3L, "cat sat" -> 2L, "cat ran" -> 1L))
    // ties order lexicographically after count
    assert(got.map(_._2).sameElements(got.map(_._2).sorted(Ordering[Long].reverse)))
  }

  test("sharedNgrams: per-doc-distinct trigrams ranked by document frequency") {
    val df = docsDF(Seq(
      (1L, "click here to accept cookies now", "en"),
      (2L, "click here to accept cookies please", "en"),
      (3L, "click here to accept cookies", "en"),
      // doc repeating its own gram counts ONCE (per-doc distinct)
      (4L, "click here to x click here to", "en"),
      (5L, "short doc", "en"),           // < n words → whole text is the gram
      (6L, "unrelated text entirely here", "en")))
    val got = TextStats.sharedNgrams(df, minDocs = 2, topN = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(got.head == ("click here to", 4L)) // doc 4 contributes 1, not 2
    assert(got.toMap == Map(
      "click here to" -> 4L,
      "here to accept" -> 3L,
      "to accept cookies" -> 3L))
    // doc_freq desc, gram asc — the rank order is total
    assert(got.map(_._1).toSeq ==
      Seq("click here to", "here to accept", "to accept cookies"))
  }

  test("sourceDupStats: per-source dup rate from normalized fingerprints") {
    import spark.implicits._
    val df = Seq(
      (1L, "same text", "en", "dirty", 9L),
      (2L, "Same   TEXT", "en", "dirty", 11L),   // normalizes equal to doc 1
      (3L, "other", "en", "dirty", 5L),
      (4L, "a", "en", "clean", 1L),
      (5L, "b", "en", "clean", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextStats.sourceDupStats(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    assert(got("dirty") == ((3L, 2L, 25L, 0.3333)))
    assert(got("clean") == ((2L, 2L, 2L, 0.0)))
  }

  test("langConfusion: matrix cells partition the corpus and match langId") {
    val docs = graft.io.Sources.table(spark, "/root/testdata/sf0.001", "documents")
    val matrix = TextStats.langConfusion(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(matrix.values.sum == docs.count(), "cells must partition the corpus")
    val perDoc = TextStats.langId(docs).collect()
      .groupBy(r => (r.getString(1), r.getString(2))).view.mapValues(_.length.toLong)
    assert(matrix == perDoc.toMap)
    // declared langs all present as rows
    assert(matrix.keySet.map(_._1).size > 1)
  }

  test("lengthHistogram: fixed-width buckets with overflow tail") {
    val doc = (n: Int) => (1 to n).map(_ => "w").mkString(" ")
    val df = docsDF(Seq(
      (1L, "", "en"),            // 0 tokens → bucket 0
      (2L, doc(3), "en"),        // 3 tokens → bucket 0
      (3L, doc(4), "en"),        // 4 tokens → bucket 1 (width 4)
      (4L, doc(9), "en"),        // 9 tokens → capped at maxBucket 2
      (5L, doc(40), "en")))      // 40 tokens → capped at 2
    val out = TextStats.lengthHistogram(df, bucketWidth = 4, maxBucket = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(
      0L -> (2L, 3L),    // docs {1,2}: 0+3 tokens
      1L -> (1L, 4L),
      2L -> (2L, 49L)))  // overflow tail: 9+40
    // bucket masses partition the corpus
    assert(out.values.map(_._1).sum == 5L)
  }

  test("bpe token count: words, digits, punctuation split") {
    val df = docsDF(Seq((1L, "hello world42, ok!", "en")))
    val got = df.select(TextStats.bpeTokenCount(col("text"))).collect().head.getLong(0)
    // hello | world | 4 | 2 | , | ok | !  → 7
    assert(got == 7L)
  }

  test("langId votes stopword markers; und when none; earliest lang wins ties") {
    val df = docsDF(Seq(
      (1L, "this is the house and the tree of life", "en"),
      (2L, "der hund und die katze ist hier", "de"),
      (3L, "xyzzy plugh qwerty", "zz")))
    val got = TextStats.langId(df).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got(1L) == "en")
    assert(got(2L) == "de")
    assert(got(3L) == "und")
  }

  test("quality score components: clean prose scores higher than junk") {
    val df = docsDF(Seq(
      (1L, "the cat sat on the mat and the dog ran in the park", "en"),
      (2L, "!!!???;;;...,,,:::!!!", "en")))
    val got = TextStats.qualityScore(df).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("quality_score")).toMap
    assert(got(1L) > got(2L))
    assert(got(1L) >= 0.7)
    assert(got(2L) <= 0.31)
  }

  test("fingerprint invariant under case + whitespace differences") {
    val df = docsDF(Seq(
      (1L, "Hello   World", "en"), (2L, "hello world", "en"),
      (3L, "hello worlds", "en")))
    val fps = TextStats.fingerprint(df).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("lengthQuantiles: exact discrete order statistics per lang") {
    import spark.implicits._
    // en: n_chars 10,20,30,40 (n=4): k(.25)=1→10, k(.5)=2→20,
    //   k(.75)=3→30, k(.95)=⌈3.8⌉=4→40
    // fr: 5,5,7 (n=3): k(.25)=⌈0.75⌉=1→5, k(.5)=⌈1.5⌉=2→5,
    //   k(.75)=⌈2.25⌉=3→7, k(.95)=⌈2.85⌉=3→7 (duplicate values fold
    //   into one histogram row — the cumulative count must still rank them)
    val df = Seq(
      (1L, "en", 10L), (2L, "en", 20L), (3L, "en", 30L), (4L, "en", 40L),
      (5L, "fr", 5L), (6L, "fr", 5L), (7L, "fr", 7L)
    ).toDF("doc_id", "lang", "n_chars").withColumn("text", lit("x"))
      .withColumn("source", lit("s"))
    val out = TextStats.lengthQuantiles(df)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(out == Seq(
      ("en", 4L, 10L, 20L, 30L, 40L),
      ("fr", 3L, 5L, 5L, 7L, 7L)))
    // the plan must contain no window over raw rows: the only window
    // runs over the (lang, n_chars) histogram — assert the window's
    // child is an aggregate, not the scan (stratum-funnel regression)
    val plan = TextStats.lengthQuantiles(df).queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(windows.nonEmpty)
    assert(windows.forall(_.collectFirst {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.nonEmpty), "quantile window must rank the histogram, not raw rows")
    intercept[IllegalArgumentException] {
      TextStats.lengthQuantiles(df, probs = Seq(0.5, 1.5))
    }
    intercept[IllegalArgumentException] { // 0.051 and 0.053 both name p5
      TextStats.lengthQuantiles(df, probs = Seq(0.051, 0.053))
    }
  }

  test("textStats aggregates exact sums per lang") {
    val df = docsDF(Seq(
      (1L, "a b", "en"), (2L, "c d e", "en"), (3L, "x", "fr")))
    val got = TextStats.textStats(df).collect()
    val en = got.find(_.getString(0) == "en").get
    assert(en.getAs[Long]("n_docs") == 2L)
    assert(en.getAs[Long]("sum_tokens") == 5L)
    assert(en.getAs[Long]("sum_chars") == 8L) // "a b"=3 + "c d e"=5
    assert(en.getAs[Double]("avg_tokens") == 2.5)
  }

  test("qualitySweep: monotone retention curve matching a driver-side reference") {
    val docs = graft.io.Sources.table(spark, "/root/testdata/sf0.001", "documents")
    val rows = TextStats.qualitySweep(docs).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._1).toSeq == (0 to 9).map(_ / 10.0),
      "every grid threshold must retain at least one doc on this corpus")
    // retention is monotone non-increasing in the threshold
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 >= b._2 && a._3 >= b._3)
    }
    // threshold 0 keeps everything
    assert(rows.head._2 == docs.count() && rows.head._4 == 1.0)
    // driver-side reference at one interior threshold
    val scored = TextStats.qualityScore(docs)
      .join(docs.select(docs("doc_id"),
        TextStats.wsTokenCount(docs("text")).as("t")), "doc_id")
      .select("quality_score", "t").collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
    val kept = scored.filter(_._1 >= 0.7)
    val at7 = rows.find(_._1 == 0.7).get
    assert(at7._2 == kept.length && at7._3 == kept.map(_._2).sum)
  }

  test("sourceDrift: overlap, churn, vanished/newborn sources, quality drift") {
    import spark.implicits._
    def mk(rows: Seq[(Long, String, String)]) =
      rows.toDF("doc_id", "source", "text")
        .selectExpr("doc_id", "text", "'en' AS lang", "source",
          "length(text) AS n_chars")
    val old = mk(Seq(
      (1L, "a", "the quick brown fox jumps over it"),  // carried to new
      (2L, "a", "an entirely different first crawl page"),
      (3L, "b", "vanished source content here today")))
    val nw = mk(Seq(
      (10L, "a", "the  QUICK brown fox jumps over it"), // same normalized fp
      (11L, "a", "fresh content replacing the old page"),
      (12L, "c", "a newborn source appears with text")))
    val out = TextStats.sourceDrift(old, nw).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n_docs_old") == 2L && a.getAs[Long]("n_docs_new") == 2L)
    assert(a.getAs[Long]("n_shared_unique") == 1L) // normalized fp carried
    assert(a.getAs[Double]("content_churn") == 0.5) // 1 of 2 new fps is fresh
    val b = out("b") // vanished: new side all zero, churn 0 (no new content)
    assert(b.getAs[Long]("n_docs_new") == 0L && b.getAs[Double]("content_churn") == 0.0)
    assert(b.getAs[Double]("avg_quality_new") == 0.0)
    assert(b.getAs[Double]("avg_quality_old") > 0.0)
    val c = out("c") // newborn: old side zero, churn total
    assert(c.getAs[Long]("n_docs_old") == 0L && c.getAs[Double]("content_churn") == 1.0)
    // quality averages are per-side means of the 4-dp score
    val qOld = TextStats.qualityScore(old.filter($"source" === "a"))
      .collect().map(_.getAs[Double]("quality_score"))
    assert(a.getAs[Double]("avg_quality_old") ==
      math.rint(qOld.sum / qOld.length * 1e4) / 1e4)
  }

  test("corpusSummaryApprox: KMV sketch report error-bounded against the exact key") {
    val docs = graft.io.Sources.table(spark, "/root/testdata/sf0.001", "documents")
    val exact = TextStats.corpusSummary(docs).collect()(0)
    val approx = TextStats.corpusSummaryApprox(docs).collect()(0)
    // pass-through exact aggregates are identical
    assert(approx.getAs[Long]("n_docs") == exact.getAs[Long]("n_docs"))
    assert(approx.getAs[Long]("sum_chars") == exact.getAs[Long]("sum_chars"))
    // low-cardinality fields: fewer than k distinct hashes → the KMV
    // sketch holds ALL of them → exact counts, not estimates
    assert(approx.getAs[Long]("n_sources_approx") == exact.getAs[Long]("n_sources"))
    assert(approx.getAs[Long]("n_langs_approx") == exact.getAs[Long]("n_langs"))
    // distinct fingerprints: either exact (< k distinct) or the KMV
    // estimator ⌊(k−1)/u_k⌋ whose relative stddev is ~1/√(k−2) ≈ 6.3%
    // at k=256 — deterministic given the fixed hash, bounded at ~2σ
    val e = exact.getAs[Long]("n_unique_texts").toDouble
    val a = approx.getAs[Long]("n_unique_texts_approx").toDouble
    assert(math.abs(a - e) / e <= 0.13,
      s"KMV distinct-fingerprint estimate $a vs exact $e exceeds 13% relative error")
    // quantiles are EXACT rank-off-histogram order statistics:
    // p = min n_chars whose cumulative count reaches ⌈p·n⌉
    val sortedChars = docs.select("n_chars").collect().map(_.getLong(0)).sorted
    def rankQ(p: Double): Long =
      sortedChars(math.ceil(p * sortedChars.length).toInt - 1).toLong
    assert(approx.getAs[Long]("p50_chars") == rankQ(0.5))
    assert(approx.getAs[Long]("p95_chars") == rankQ(0.95))
  }

  test("gopherRules: each rule's failure branch fires on its crafted doc") {
    val longGood = ("the deal was that all of them would have come along with " +
      "us to see the long river valley and the old stone bridge " +
      "before the market opened for the busy trading day under clear skies " +
      "while every friendly trader set out wares of copper and " +
      "woven cloth beside the gate where children played until dusk settled")
    val df = docsDF(Seq(
      (1L, longGood, "en"),                                // passes all five
      (2L, "the of and that " * 5, "en"),                  // < 50 words
      (3L, ("a " * 60).trim, "en"),                        // mean word len < 3
      (4L, (("extraordinarily " * 60).trim + " the a"), "en"), // mean len > 10
      (5L, (("# " * 30).trim + " " + ("the a of and " * 10).trim), "en"), // symbol soup
      (6L, (("42 " * 45).trim + " " + ("the a of and with " * 3).trim), "en"), // digits: alpha frac < 0.8
      (7L, ("word " * 60).trim, "en")))                    // no stopword pair
    val got = TextStats.gopherRules(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("pass_word_count"), r.getAs[Long]("pass_word_len"),
         r.getAs[Long]("pass_symbol"), r.getAs[Long]("pass_alpha"),
         r.getAs[Long]("pass_stopwords"), r.getAs[Long]("keep"))).toMap
    assert(got(1L) == ((1L, 1L, 1L, 1L, 1L, 1L)), s"doc1: ${got(1L)}")
    assert(got(2L)._1 == 0L && got(2L)._6 == 0L)
    assert(got(3L)._2 == 0L, s"doc3: ${got(3L)}")
    assert(got(4L)._2 == 0L, s"doc4: ${got(4L)}")
    assert(got(5L)._3 == 0L, s"doc5: ${got(5L)}")
    assert(got(6L)._4 == 0L, s"doc6: ${got(6L)}")
    assert(got(7L)._5 == 0L && got(7L)._1 == 1L, s"doc7: ${got(7L)}")
  }

  test("gopherRules: signals are exact ratios, empty text is all-zero") {
    val df = docsDF(Seq((1L, "", "en"), (2L, "to be or not to be", "en")))
    val r = TextStats.gopherRules(df).collect().map(x =>
      x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Long]("n_words") == 0L)
    assert(r(1L).getAs[Double]("mean_word_len") == 0.0)
    assert(r(1L).getAs[Long]("keep") == 0L)
    // "to be or not to be": 6 words, 13 non-ws chars
    assert(r(2L).getAs[Long]("n_words") == 6L)
    assert(r(2L).getAs[Double]("mean_word_len") == math.rint(13.0 / 6 * 1e4) / 1e4)
    assert(r(2L).getAs[Long]("n_stop_hits") == 2L) // "be", "to"
  }

  test("sourceOverlap: containment replayed driver-side; absence means independence") {
    import spark.implicits._
    // src A: 2 docs of 20 words (4 distinct segments after dedup);
    // src B: one doc copying A's first 10-word segment + its own tail;
    // src C: disjoint content — must not appear in any pair
    val segA1 = (1 to 10).map(i => s"a$i").mkString(" ")
    val segA2 = (11 to 20).map(i => s"a$i").mkString(" ")
    val segA3 = (21 to 30).map(i => s"a$i").mkString(" ")
    val segB = (1 to 10).map(i => s"b$i").mkString(" ")
    val segC = (1 to 10).map(i => s"c$i").mkString(" ")
    val df = Seq(
      (1L, s"$segA1 $segA2", "A"),
      (2L, s"$segA2 $segA3", "A"),
      (3L, s"$segA1 $segB", "B"),
      (4L, segC, "C"))
      .toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "'en' AS lang", "source",
        "length(text) AS n_chars")
    val got = TextStats.sourceOverlap(df).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    graft.core.CacheScope.releaseAll()
    // A has 3 distinct segments, B has 2; they share exactly segA1
    assert(got(("A", "B")) == ((1L, 3L, math.rint(1.0 / 3 * 1e4) / 1e4)))
    assert(got(("B", "A")) == ((1L, 2L, 0.5)))
    // zero-overlap pairs are ABSENT, not zero rows
    assert(got.keySet == Set(("A", "B"), ("B", "A")), s"got ${got.keySet}")
  }

  test("sourceOverlap: empty/NULL text is not shared content") {
    import spark.implicits._
    // whitespace-only docs in D and E, a NULL-text doc in F: none of
    // these may manufacture a pair (the '' segment is excluded), and
    // the real D/E overlap through a genuine shared segment still shows
    val shared10 = (1 to 10).map(i => s"s$i").mkString(" ")
    val df = Seq(
      (1L, "   ", "D"), (2L, shared10, "D"),
      (3L, "\t ", "E"), (4L, shared10, "E"),
      (5L, null.asInstanceOf[String], "F"))
      .toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "'en' AS lang", "source",
        "coalesce(length(text), 0) AS n_chars")
    val got = TextStats.sourceOverlap(df).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    graft.core.CacheScope.releaseAll()
    // F never pairs; D/E pair ONLY on the real segment, and the ''
    // segment is excluded from the n_unique denominators too
    assert(got.keySet == Set(("D", "E"), ("E", "D")), s"got ${got.keySet}")
    assert(got(("D", "E")) == ((1L, 1L)) && got(("E", "D")) == ((1L, 1L)),
      s"phantom segments leaked into the counts: $got")
  }

  test("sourceOverlap on testdata: symmetric counts, bounded containment") {
    val d = graft.io.Sources.table(spark, "/root/testdata/sf0.001", "documents")
    val got = TextStats.sourceOverlap(d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    graft.core.CacheScope.releaseAll()
    assert(got.nonEmpty, "fixtures must carry cross-source segment mass")
    got.foreach { case ((a, b), (shared, uniq, cont)) =>
      assert(a != b)
      assert(shared >= 1 && shared <= uniq, s"($a,$b): $shared of $uniq")
      assert(cont > 0.0 && cont <= 1.0)
      // n_shared is symmetric (distinct segments shared by both)
      assert(got((b, a))._1 == shared, s"asymmetric shared count ($a,$b)")
    }
  }
}
