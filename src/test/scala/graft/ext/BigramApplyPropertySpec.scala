package graft.ext

import graft.SparkSpec

/** Property checks for the frozen-LM scorer over fixed-seed random
  * corpora (the BpePropertySpec sampling idiom), with the text
  * generator deliberately ADVERSARIAL to the tokenizer: mixed-case
  * ASCII, digits, punctuation runs, non-ASCII letters (é, ß, İ —
  * case-folding edge cases), whitespace variants, and empty/sub-2-token
  * docs. The invariant under test is the strongest one available:
  * `bigramApply` under a self-trained model must equal the declared
  * `bigramLogProb` ROW FOR ROW — same token counts (the JVM letter-run
  * scan vs Spark's `split(lower, "[^a-z]+")`), same backoff branch per
  * pair, same pair-order accumulation, same 4-dp round — on EVERY
  * sampled corpus, not just the curated fixtures.
  */
class BigramApplyPropertySpec extends SparkSpec {
  import spark.implicits._

  private def randomCorpora: Seq[Seq[String]] = {
    val rnd = new scala.util.Random(11)
    val frags = Vector(
      "alpha", "Beta", "GAMMA", "déjà", "straße", "İstanbul", "x9y",
      "a", "zz", "", "42", "!!!", "—", "ß", "ŉ", "ǅungla", "ﬁne",
      "\ttab", "new\nline", "mixedCASE", "ACGT", "ácido")
    val seps = Vector(" ", "  ", ", ", ". ", "-", "_", "\n", "\t", "/", "0")
    def doc = (0 until (0 + rnd.nextInt(12)))
      .map(_ => frags(rnd.nextInt(frags.length)))
      .mkString(seps(rnd.nextInt(seps.length)))
    (0 until 10).map(_ => (0 until (2 + rnd.nextInt(8))).map(_ => doc))
  }

  test("apply-under-self-trained-model equals bigramLogProb on adversarial text") {
    randomCorpora.zipWithIndex.foreach { case (texts, ci) =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val batch = Relevance.bigramLogProb(docs, vocabSize = 6, bigramVocab = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSeq
      graft.core.CacheScope.releaseAll()
      // tiny vocab caps make BOTH backoff branches (in-vocab and OOV
      // floor) fire on most corpora — the branches where a tokenizer
      // mismatch would surface as a count or score drift
      val model = Relevance.bigramModel(docs, vocabSize = 6, bigramVocab = 4)
      val applied = Relevance.bigramApply(docs, model)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSeq
      assert(applied == batch,
        s"corpus $ci diverged:\n  batch   $batch\n  applied $applied")
    }
  }
}
