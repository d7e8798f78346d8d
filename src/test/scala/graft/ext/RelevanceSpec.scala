package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RelevanceSpec extends SparkSpec {
  import spark.implicits._

  // 4 docs, 2 langs; token counts chosen hand-checkable
  private def docs = Seq(
    (1L, "alpha alpha beta", "en", "s1", 16L),
    (2L, "alpha gamma", "en", "s1", 11L),
    (3L, "beta beta beta delta", "fr", "s2", 20L),
    (4L, "gamma gamma", "fr", "s2", 11L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("tfidf: corpus-wide df, per-lang tf, exact ranking") {
    val out = Relevance.tfidfTopTerms(docs, topPerLang = 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    // df: alpha 2 docs, beta 2, gamma 2, delta 1; N=4 → ln(2)=0.6931, ln(4)=1.3863
    // en: alpha tf=3 → 3·ln(2)=2.0794 ; gamma tf=1 → 0.6931 ; beta tf=1 → 0.6931
    //   rank1 alpha, rank2 beta (tie 0.6931, 'beta' < 'gamma')
    // fr: beta tf=3 → 2.0794 ; delta tf=1 → ln(4)=1.3863 ; gamma tf=2 → 1.3863
    //   rank1 beta, rank2 delta ('delta' < 'gamma')
    assert(out.toSeq == Seq(
      ("en", 1, "alpha", 3L, 2L, 2.0794),
      ("en", 2, "beta", 1L, 2L, 0.6931),
      ("fr", 1, "beta", 3L, 2L, 2.0794),
      ("fr", 2, "delta", 1L, 1L, 1.3863)))
  }

  test("bm25: exact score for a single-term query, ranking sane") {
    // query = beta: df=2, N=4 → idf = ln(1 + 2.5/2.5) = ln 2
    // dl: 3,2,4,2 → avgdl = 11/4 = 2.75
    // doc3: tf=3 → ln2 · 3·2.2/(3 + 1.2·(0.25 + 0.75·4/2.75))
    val out = Relevance.bm25Search(docs, Seq("beta"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val idf = math.log(2.0)
    def norm(tf: Double, dl: Double) =
      tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 2.75))
    def exp(tf: Double, dl: Double) =
      BigDecimal(idf * norm(tf, dl)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq == Seq((3L, exp(3, 4)), (1L, exp(1, 3))))
    assert(out(0)._2 > out(1)._2)
  }

  test("bm25: dynamic-terms variant agrees with the literal variant exactly") {
    val terms = Seq("alpha", "beta", "gamma")
    val lit_ = Relevance.bm25Search(docs, terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val dyn = Relevance.bm25SearchTerms(docs, terms.toDF("term"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(lit_ == dyn)
    assert(lit_.nonEmpty)
    // query-log hygiene: case-folded, deduped, out-of-domain dropped —
    // dirty dynamic input scores like the cleaned literal query
    val dirty = Relevance.bm25SearchTerms(docs,
      Seq("Alpha", "beta", "beta", "c++", "").toDF("term"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val cleaned = Relevance.bm25Search(docs, Seq("alpha", "beta"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(dirty == cleaned)
  }

  test("bm25: multi-term scores sum per doc; absent terms contribute 0") {
    val out = Relevance.bm25Search(docs, Seq("alpha", "delta"), k = 10)
      .collect().map(_.getLong(0))
    // docs 1,2 (alpha) and 3 (delta) retrieved; doc 4 matches nothing
    assert(out.toSet == Set(1L, 2L, 3L))
  }

  test("tokenFreq: global counts, deterministic tie order") {
    val out = TextStats.tokenFreq(docs, topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(
      ("beta", 4L), ("alpha", 3L), ("gamma", 3L), ("delta", 1L)))
  }

  test("repetitionScore: exact trigram duplicate fraction; short docs score 0") {
    val d = Seq(
      (1L, "the cat sat on the cat sat on the mat", "en", "s", 1L),
      (2L, "a b", "en", "s", 1L),
      (3L, "x y z", "en", "s", 1L),
      (4L, "", "en", "s", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextStats.repetitionScore(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    // doc1: 10 words, 8 trigrams, 5 distinct ("the cat sat"/"cat sat on"/
    // "sat on the" repeat) → 1 - 5/8 = 0.375
    assert(out(1L) == ((10L, 8L, 5L, 0.375)))
    assert(out(2L) == ((2L, 0L, 0L, 0.0)))  // too short for a trigram
    assert(out(3L) == ((3L, 1L, 1L, 0.0)))  // one gram, no repeats
    assert(out(4L) == ((0L, 0L, 0L, 0.0)))  // empty text
  }

  test("unigramLogProb: exact counts, OOV floor, hand-checked means") {
    // counts: beta 4, alpha 3, gamma 3, delta 1; total 11
    // vocabSize=3 → vocab {beta, alpha, gamma} (cnt desc, term asc);
    // delta is OOV → floor p = 1/11
    val out = Relevance.unigramLogProb(docs, vocabSize = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    def r4(x: Double) = math.round(x * 1e4) / 1e4
    val d1 = r4((2 * math.log(3.0 / 11) + math.log(4.0 / 11)) / 3)
    val d2 = r4((math.log(3.0 / 11) + math.log(3.0 / 11)) / 2)
    val d3 = r4((3 * math.log(4.0 / 11) + math.log(1.0 / 11)) / 4)
    val d4 = r4(math.log(3.0 / 11))
    assert(out == Seq((1L, 3L, 0L, d1), (2L, 2L, 0L, d2),
      (3L, 4L, 1L, d3), (4L, 2L, 0L, d4)))
    // full-vocab run: nothing OOV
    val full = Relevance.unigramLogProb(docs, vocabSize = 100)
    assert(full.agg(sum("n_oov")).collect()(0).getLong(0) == 0L)
    intercept[IllegalArgumentException] {
      Relevance.unigramLogProb(docs, vocabSize = 0)
    }
  }

  test("corpusSummary: exact distincts and dup rate") {
    val withDup = docs.unionByName(
      Seq((5L, "alpha  ALPHA beta", "en", "s3", 16L)) // normalizes to doc 1
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val r = TextStats.corpusSummary(withDup).collect()(0)
    assert(r.getLong(0) == 5L)      // n_docs
    assert(r.getLong(1) == 3L)      // sources
    assert(r.getLong(2) == 2L)      // langs
    assert(r.getLong(4) == 4L)      // unique texts (doc5 dups doc1)
    assert(r.getDouble(5) == 0.2)   // dup_rate
  }

  test("bigramLogProb: exact count-ratio scores when every bigram is in vocabulary") {
    // counts: x:2 y:3 z:1 (total 6); bigrams: (x,y):2 (y,x):1 (y,z):1
    val df = Seq(
      (1L, "x y x y", "en", "s1", 7L),
      (2L, "y z", "en", "s1", 3L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Relevance.bigramLogProb(df, vocabSize = 8, bigramVocab = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    graft.core.CacheScope.releaseAll()
    // d1: ln(2/2) + ln(1/3) + ln(2/2) over 3 pairs = -0.3662
    assert(out(1L) == ((4L, 3L, 0L, -0.3662)))
    // d2: ln(c(y,z)/c(y)) = ln(1/3) = -1.0986
    assert(out(2L) == ((2L, 1L, 0L, -1.0986)))
  }

  test("bigramLogProb: stupid backoff to the unigram model outside the bigram table") {
    val df = Seq(
      (1L, "x y x y", "en", "s1", 7L),
      (2L, "y z", "en", "s1", 3L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    // bigramVocab=1 keeps only (x,y) (top count); (y,x) and (y,z) back
    // off to alpha * P_uni(w2): ln(0.4*2/6) = -2.0149, ln(0.4*1/6) = -2.7081
    val out = Relevance.bigramLogProb(df, vocabSize = 8, bigramVocab = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    graft.core.CacheScope.releaseAll()
    assert(out(1L)._1 == 3L && out(1L)._2 == 1L)
    assert(out(1L)._3 == math.rint((0.0 + math.log(0.4 * 2 / 6.0) + 0.0) / 3 * 1e4) / 1e4)
    assert(out(2L) == ((1L, 1L, -2.7081)))
  }

  test("bigramLogProb: sub-2-token docs score 0 with zero bigrams") {
    val df = Seq(
      (1L, "solo", "en", "s1", 4L),
      (2L, "", "en", "s1", 0L),
      (3L, "a b", "en", "s1", 3L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Relevance.bigramLogProb(df, vocabSize = 8, bigramVocab = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    graft.core.CacheScope.releaseAll()
    assert(out(1L) == ((1L, 0L, 0L, 0.0)))
    assert(out(2L) == ((0L, 0L, 0L, 0.0)))
    assert(out(3L)._2 == 1L)
  }

  test("bigramApply with a self-trained model equals bigramLogProb row-for-row") {
    // THE drift guard for the parallel API: scoring the training
    // corpus under its own frozen model must reproduce the declared
    // self-scoring key bit-for-bit (same tokens, same backoff
    // branches, same pair-order accumulation, same 4-dp round)
    val d = graft.io.Sources.table(spark, "/root/testdata/sf0.001", "documents")
    val batch = Relevance.bigramLogProb(d, vocabSize = 24, bigramVocab = 512)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    graft.core.CacheScope.releaseAll()
    val model = Relevance.bigramModel(d, vocabSize = 24, bigramVocab = 512)
    val applied = Relevance.bigramApply(d, model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(applied == batch, "frozen-model apply diverged from the declared key")
  }

  test("bigramApply: frozen model scores held-out text, OOV hits the backoff floor") {
    // model trained on docs 1-2 only: "alpha beta" is in-table
    // (lp = ln(2/2) = 0 backed by alpha-count 2... hand-derived below);
    // doc 3 pairs: (alpha, beta) in-table; (beta, zzz) backs off to the
    // OOV floor ln(alpha·1/total) — zzz is unseen by the model
    val train = Seq(
      (1L, "alpha beta", "en", "s1", 10L),
      (2L, "alpha beta", "en", "s1", 10L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val model = Relevance.bigramModel(train, vocabSize = 8, bigramVocab = 8)
    assert(model.total == 4L) // alpha x2, beta x2
    val held = Seq((3L, "alpha beta zzz", "en", "s1", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Relevance.bigramApply(held, model).collect()
    assert(out.length == 1)
    val r = out(0)
    // pairs: (alpha,beta) lp = ln(2/2) = 0; (beta,zzz) OOV floor
    // ln(0.4 * 1 / 4) = ln(0.1); mean = ln(0.1)/2, 4 dp
    val expected = BigDecimal(math.log(Relevance.BackoffAlpha * 1.0 / 4.0) / 2.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((3L, 2L, 1L)),
      s"counts: $r")
    assert(r.getDouble(4) == expected, s"logprob ${r.getDouble(4)} vs $expected")
  }

  test("bigramApply plans ZERO shuffles before the final sort") {
    // the serving posture IS the point of the frozen model: scoring
    // must be one narrow projection — the only exchange in the whole
    // plan is the final orderBy's range partition (no aggregate, no
    // join, no broadcast — the model is a codegen reference object)
    val d = graft.io.Sources.table(spark, "/root/testdata/sf0.001", "documents")
    val model = Relevance.bigramModel(d, vocabSize = 24, bigramVocab = 512)
    val plan = Relevance.bigramApply(d, model).queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected ONLY the final sort's exchange:\n$plan")
    assert(!plan.contains("BroadcastExchange"), s"model must not join:\n$plan")
  }

  test("perplexityBuckets: per-language terciles equal a driver-side rank replay") {
    // 6 en docs of graded fluency + 5 fr docs: expected buckets come
    // from an EXACT driver-side replay of the rank rule (logprob desc,
    // doc_id; k = n/3) over the engine's own bigramLogProb scores —
    // the histogram classification must reproduce it row for row
    val df = Seq(
      (1L, "alpha beta alpha beta alpha beta", "en", "s1", 32L),
      (2L, "alpha beta alpha beta", "en", "s1", 21L),
      (3L, "alpha beta gamma delta", "en", "s1", 22L),
      (4L, "delta gamma beta alpha", "en", "s1", 22L),
      (5L, "epsilon zeta eta theta", "en", "s1", 22L),
      (6L, "theta eta zeta epsilon", "en", "s1", 22L),
      (7L, "un deux un deux un deux", "fr", "s2", 23L),
      (8L, "un deux trois quatre", "fr", "s2", 20L),
      (9L, "quatre trois deux un", "fr", "s2", 20L),
      (10L, "cinq six sept huit", "fr", "s2", 18L),
      (11L, "huit sept six cinq", "fr", "s2", 18L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val scores = Relevance.bigramLogProb(df, vocabSize = 64, bigramVocab = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    val langs = Map(1L -> "en", 2L -> "en", 3L -> "en", 4L -> "en",
      5L -> "en", 6L -> "en", 7L -> "fr", 8L -> "fr", 9L -> "fr",
      10L -> "fr", 11L -> "fr")
    val expected = langs.groupBy(_._2).flatMap { case (_, docs) =>
      val ranked = docs.keys.toSeq.sortBy(id => (-scores(id), id))
      val n = ranked.length; val k = n / 3
      ranked.zipWithIndex.map { case (id, i) =>
        id -> (if (i < k) "head" else if (i < n - k) "middle" else "tail")
      }
    }
    val out = Relevance.perplexityBuckets(df, vocabSize = 64, bigramVocab = 64)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    graft.core.CacheScope.releaseAll()
    assert(out == expected, s"engine $out vs replay $expected")
    assert(out.count { case (id, b) => langs(id) == "en" && b == "head" } == 2)
    assert(out.count { case (id, b) => langs(id) == "fr" && b == "tail" } == 1)
  }

  test("perplexityBuckets: tied scores split by doc_id through the boundary path") {
    // 6 identical docs = ONE score stratum straddling both cuts: the
    // boundary rank (doc_id asc) must hand 2 to head, 2 to middle,
    // 2 to tail — deterministically, lowest ids first
    val df = (1L to 6L).map(i =>
      (i, "alpha beta alpha", "en", "s1", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Relevance.perplexityBuckets(df, vocabSize = 8, bigramVocab = 8)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    graft.core.CacheScope.releaseAll()
    assert(out == Map(1L -> "head", 2L -> "head", 3L -> "middle",
      4L -> "middle", 5L -> "tail", 6L -> "tail"), out.toString)
  }

  test("perplexityBuckets: NULL-lang docs rank under the sentinel language, never dropped") {
    // the null-rejecting-join silent-row-loss class, guarded: unlabeled
    // docs coalesce to lang "" and rank among themselves
    val df = Seq(
      (1L, "alpha beta alpha beta", null.asInstanceOf[String], "s1", 20L),
      (2L, "alpha beta", null.asInstanceOf[String], "s1", 10L),
      (3L, "alpha beta gamma", "en", "s1", 16L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Relevance.perplexityBuckets(df, vocabSize = 8, bigramVocab = 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(3)))
    graft.core.CacheScope.releaseAll()
    assert(out.length == 3, s"no doc may vanish: ${out.toSeq}")
    assert(out.filter(_._2 == "").map(_._1).toSet == Set(1L, 2L),
      s"unlabeled docs carry the sentinel language: ${out.toSeq}")
    // the 2-doc sentinel language degenerates to all-middle (k = 0)
    assert(out.filter(_._2 == "").forall(_._3 == "middle"), out.toSeq.toString)
  }

  test("perplexityBuckets: languages under 3 docs degenerate to all-middle") {
    // k = floor(n/3) = 0: no head, no tail — never an error on the
    // long tail of tiny languages a multilingual crawl always has
    val df = Seq(
      (1L, "alpha beta gamma", "xx", "s1", 16L),
      (2L, "beta alpha", "xx", "s1", 10L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Relevance.perplexityBuckets(df, vocabSize = 8, bigramVocab = 8)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    graft.core.CacheScope.releaseAll()
    assert(out == Map(1L -> "middle", 2L -> "middle"), out.toString)
  }

  test("dsirSelect: target-vocabulary docs outrank junk, exact top-k count") {
    // 6 high-quality docs (stopword-rich -> quality 1.0, vocabulary A)
    // form the target side; 6 junk docs (punctuation soup, vocabulary B,
    // disjoint) form the raw-only mass. A-bucket features are thus
    // target-heavy, B-bucket features target-empty: every A doc must
    // outweigh every B doc, and exactly floor(12*25/100)=3 are selected,
    // all from A, lowest doc_ids first on the tied stratum.
    val good = "the quick brown fox jumps over the lazy dog and runs home"
    val junk = "zxqv!!! wkjh??? qqpz,,, vvnm;;; zxqv!!! wkjh???"
    val rows = (1L to 6L).map(i => (i, good + " tail" + i, "en", "s", 60L)) ++
      (7L to 12L).map(i => (i, junk + " zz" + i, "en", "s", 46L))
    val df = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Relevance.dsirSelect(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out.map(_._1).toSeq == (1L to 12L).toSeq)
    val (a, b) = out.partition(_._1 <= 6L)
    assert(a.map(_._3).min > b.map(_._3).max,
      s"every target-vocab doc must outweigh every junk doc: $out")
    assert(out.count(_._4 == 1L) == 3, s"selected count: $out")
    assert(out.filter(_._4 == 1L).forall(_._1 <= 6L))
    // n_feats = unigrams + bigrams = 2*words - 1; the [a-z]+ tokenizer
    // splits "tail1" at the digit, so 13 letter-run words per good doc
    assert(out.head._2 == 2L * 13 - 1)
  }

  test("quality classifier: separable vocabularies train sign-separated weights") {
    val good = "the quick brown fox jumps over the lazy dog and runs home"
    val junk = "zxqv!!! wkjh??? qqpz,,, vvnm;;; zxqv!!! wkjh???"
    val rows = (1L to 6L).map(i => (i, good + " tail" + i, "en", "s", 60L)) ++
      (7L to 12L).map(i => (i, junk + " zz" + i, "en", "s", 46L))
    val df = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    val w = Relevance.trainQualityClassifier(df).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    graft.core.CacheScope.releaseAll()
    // fixed cardinality: bias at -1 plus every bucket, ordered
    assert(w.map(_._1).toSeq == (-1L +: (0L until 1024L)).toSeq)
    // vocab-A buckets (shared by all good docs) must train positive,
    // vocab-B buckets negative: check via the buckets of two marker
    // features present in every good / every junk doc
    def bucketOf(feat: String): Long = {
      val h = graft.functions.Hashing.hash64(feat)
      ((h % 1024) + 1024) % 1024
    }
    val wMap = w.toMap
    assert(wMap(bucketOf("quick")) > 0, s"target-vocab weight: ${wMap(bucketOf("quick"))}")
    assert(wMap(bucketOf("zxqv")) < 0, s"junk-vocab weight: ${wMap(bucketOf("zxqv"))}")
  }

  test("classifierSelect: target docs outscore junk, exact top-k count") {
    val good = "the quick brown fox jumps over the lazy dog and runs home"
    val junk = "zxqv!!! wkjh??? qqpz,,, vvnm;;; zxqv!!! wkjh???"
    val rows = (1L to 6L).map(i => (i, good + " tail" + i, "en", "s", 60L)) ++
      (7L to 12L).map(i => (i, junk + " zz" + i, "en", "s", 46L))
    val df = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Relevance.classifierSelect(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    graft.core.CacheScope.releaseAll()
    assert(out.map(_._1).toSeq == (1L to 12L).toSeq)
    val (a, b) = out.partition(_._1 <= 6L)
    assert(a.map(_._3).min > b.map(_._3).max,
      s"every target doc must outscore every junk doc: ${out.toSeq}")
    assert(out.count(_._4 == 1L) == 3, s"selected count: ${out.toSeq}")
    assert(out.filter(_._4 == 1L).forall(_._1 <= 6L))
  }

  test("classifierApply: frozen model scores held-out docs exactly (driver replay)") {
    // train on evens via the DECLARED trainer (its exported model is
    // the artifact), then recompute every odd doc's score driver-side
    // from that model and the same hashed 6-dp features: micros-exact
    // margin parts, 6-dp sigmoid — must agree to the last bit
    val good = "the quick brown fox jumps over the lazy dog and runs home"
    val junk = "zxqv!!! wkjh??? qqpz,,, vvnm;;; zxqv!!! wkjh???"
    val rows = (1L to 6L).map(i => (i, good + " tail" + i, "en", "s", 60L)) ++
      (7L to 12L).map(i => (i, junk + " zz" + i, "en", "s", 46L)) :+
      ((13L, "???", "en", "s", 3L)) // odd doc, no letter-run features
    val df = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    val model = Relevance.trainQualityClassifier(df.filter("doc_id % 2 = 0"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    graft.core.CacheScope.releaseAll()
    val bias = model(-1L)
    val applied = Relevance.classifierApply(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    graft.core.CacheScope.releaseAll()
    assert(applied.keySet == rows.map(_._1).filter(_ % 2 == 1).toSet,
      "apply must cover exactly the held-out docs")
    def featBuckets(text: String): Map[Long, Double] = {
      val ws = text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
      val feats = ws ++ ws.sliding(2).filter(_.length == 2).map(_.mkString(" "))
      val bks = feats.map { f =>
        val h = graft.functions.Hashing.hash64(f)
        ((h % 1024) + 1024) % 1024
      }
      val total = bks.length.toDouble
      bks.groupBy(identity).view
        .mapValues(g => graft.functions.VectorOps.round6(g.length / total))
        .toMap
    }
    rows.filter(_._1 % 2 == 1).foreach { case (id, text, _, _, _) =>
      val x = featBuckets(text)
      // margin: 6-dp parts summed exactly in micro-units (the
      // DECIMAL(16,6) contract); the exported model pads untouched
      // buckets with exact 0.0 weights, whose parts round to 0 micros
      // — so replaying over the padded model matches the engine's
      // touched-buckets-only join bit for bit on the score
      val micros = x.keys.toSeq.map { b =>
        math.round(graft.functions.VectorOps.round6(x(b) * model(b)) * 1e6)
      }.sum
      val z = (if (x.isEmpty) 0.0 else micros / 1e6) + bias
      val want = graft.functions.VectorOps.round6(1.0 / (1.0 + math.exp(-z)))
      val (gotNb, gotScore) = applied(id)
      assert(gotScore == want, s"doc $id: $gotScore vs $want")
      if (id == 13L) assert(gotNb == 0L)
    }
    // and the separable fixture still separates on the held-out side
    val (a, b) = applied.toSeq.partition(_._1 <= 6L)
    assert(a.map(_._2._2).min > b.filter(_._1 <= 12L).map(_._2._2).max)
  }

  test("quality classifier: engine weights equal a driver-side gradient replay") {
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs home", "en", "s", 57L),
      (2L, "zxqv!!! wkjh??? qqpz,,, vvnm;;;", "en", "s", 31L),
      (3L, "the lazy dog naps and the quick fox watches him closely", "en", "s", 55L),
      (4L, "", "en", "s", 0L))
    val df = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    // rebuild the engine's inputs through the same public pieces
    val wsE = filter(split(lower(col("text")), "[^a-z]+"), w => length(w) > 0)
    val bigsE = when(size(col("ws")) >= 2,
      transform(sequence(lit(1), size(col("ws")) - 1), i =>
        concat(element_at(col("ws"), i), lit(" "), element_at(col("ws"), i + 1))))
      .otherwise(array().cast("array<string>"))
    val feats = df.select(col("doc_id"), wsE.as("ws"))
      .select(col("doc_id"), explode(concat(col("ws"), bigsE)).as("feat"))
      .select(col("doc_id"),
        pmod(graft.functions.GraftFunctions.hash64(col("feat")), lit(1024L)).as("bucket"))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val x = {
      val tot = feats.groupBy(_._1).map { case (d, fs) => d -> fs.map(_._3).sum }
      feats.map { case (d, b, c) =>
        (d, b, graft.functions.VectorOps.round6(c.toDouble / tot(d)))
      }
    }
    val y = df.select(col("doc_id"),
        (graft.ext.TextStats.qualityScoreColumn(col("text")) >= 0.9).cast("long").as("y"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // sequential full-batch replay under the same portable contract
    val n = rows.size
    var w = Map.empty[Long, Double]
    var bias = 0.0
    for (_ <- 0 until Relevance.ClfIterations) {
      val zMicros = x.groupBy(_._1).map { case (d, fs) =>
        d -> fs.map { case (_, b, xv) =>
          math.round(graft.functions.VectorOps.round6(xv * w.getOrElse(b, 0.0)) * 1e6)
        }.sum
      }
      val e = y.map { case (d, yd) =>
        val z = zMicros.getOrElse(d, 0L).toDouble / 1e6 + bias
        d -> (graft.functions.VectorOps.round6(1.0 / (1.0 + math.exp(-z))) - yd)
      }
      val g = x.groupBy(_._2).map { case (b, fs) =>
        b -> fs.map { case (d, _, xv) =>
          BigDecimal(e(d) * xv).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }.sum.toDouble
      }
      val gBias = e.values
        .map(v => BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      w = (w.keySet ++ g.keySet).iterator.map { b =>
        b -> graft.functions.VectorOps.round6(
          w.getOrElse(b, 0.0) - Relevance.ClfLearningRate * (g.getOrElse(b, 0.0) / n))
      }.toMap
      bias = graft.functions.VectorOps.round6(
        bias - Relevance.ClfLearningRate * (gBias / n))
    }
    val got = Relevance.trainQualityClassifier(df).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    graft.core.CacheScope.releaseAll()
    assert(got(-1L) == bias, s"bias: got ${got(-1L)}, replay $bias")
    (0L until 1024L).foreach { b =>
      assert(got(b) == w.getOrElse(b, 0.0),
        s"bucket $b: got ${got(b)}, replay ${w.getOrElse(b, 0.0)}")
    }
  }

  test("dsirSelect: zero-feature docs get weight 0 and never displace scored docs") {
    val rows = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs far", "en", "s", 50L),
      (2L, "", "en", "s", 0L),
      (3L, "123 456 789", "en", "s", 11L), // no [a-z] tokens
      (4L, "the quick brown fox jumps over the lazy dog and runs far", "en", "s", 50L))
    val out = Relevance.dsirSelect(rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val byId = out.map(x => x._1 -> x).toMap
    assert(byId(2L)._2 == 0L && byId(2L)._3 == 0.0)
    assert(byId(3L)._2 == 0L && byId(3L)._3 == 0.0)
    // k = floor(4*25/100) = 1: the single slot goes to a scored doc
    assert(out.count(_._4 == 1L) == 1 && out.filter(_._4 == 1L).head._1 == 1L)
  }
}
