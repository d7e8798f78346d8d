package graft.streaming

import graft.SparkSpec
import graft.ext.Relevance
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

case class PerpDoc(doc_id: Long, lang: String, source: String, text: String)

class StreamPerplexitySpec extends SparkSpec {
  import spark.implicits._

  // graded fluency per language: repeated high-frequency bigrams score
  // high, rare-vocabulary docs score low — enough spread that the
  // tercile cuts land between distinct 4-dp scores
  private def corpus: Seq[PerpDoc] = Seq(
    PerpDoc(1L, "en", "s1", "alpha beta alpha beta alpha beta"),
    PerpDoc(2L, "en", "s1", "alpha beta alpha beta"),
    PerpDoc(3L, "en", "s1", "alpha beta gamma delta"),
    PerpDoc(4L, "en", "s1", "delta gamma beta alpha"),
    PerpDoc(5L, "en", "s1", "epsilon zeta eta theta"),
    PerpDoc(6L, "en", "s1", "theta eta zeta epsilon"),
    PerpDoc(7L, "fr", "s2", "un deux un deux un deux"),
    PerpDoc(8L, "fr", "s2", "un deux trois quatre"),
    PerpDoc(9L, "fr", "s2", "quatre trois deux un"),
    PerpDoc(10L, "fr", "s2", "cinq six sept huit"),
    PerpDoc(11L, "fr", "s2", "huit sept six cinq"))

  private def corpusDf = corpus
    .map(d => (d.doc_id, d.text, d.lang, d.source, d.text.length.toLong))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  private def runStream(
      batches: Seq[Seq[PerpDoc]],
      model: Relevance.BigramModelLocal,
      cutoffs: Map[String, (Double, Double)],
      default: (Double, Double),
      name: String): Seq[(Long, String, Double, String)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PerpDoc]
    val q = StreamPerplexity.classifyStream(input.toDF(), model, cutoffs, default)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table(name).orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
          r.getString(3))).toSeq
    } finally q.stop()
  }

  test("stream classification agrees with the batch buckets off the boundary ties") {
    // model + cutoffs trained on the reference corpus; the same corpus
    // streamed through must reproduce the batch assignment for every
    // doc whose score doesn't TIE a cutoff (rank-split in batch,
    // threshold-binned online — the documented contract), and the
    // score itself must equal the batch logprob exactly
    val df = corpusDf
    val batch = Relevance.perplexityBuckets(df, vocabSize = 64, bigramVocab = 64)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(2), r.getString(3)))).toMap
    val cutoffs = Relevance.perplexityCutoffs(
      Relevance.perplexityBuckets(df, vocabSize = 64, bigramVocab = 64))
    graft.core.CacheScope.releaseAll()
    val model = Relevance.bigramModel(df, vocabSize = 64, bigramVocab = 64)
    val got = runStream(
      Seq(corpus.take(5), corpus.drop(5)), model, cutoffs,
      default = (0.0, 0.0), name = "perp_agree")
    assert(got.size == corpus.size, "stateless face must tag every doc")
    got.foreach { case (id, lang, lp, bucket) =>
      val (blp, bbucket) = batch(id)
      assert(lp == blp, s"doc $id: stream score $lp != batch $blp")
      val (h, t) = cutoffs(lang)
      if (lp != h && lp != t)
        assert(bucket == bbucket,
          s"doc $id (lp=$lp, cuts=($h,$t)): stream $bucket != batch $bbucket")
      else
        assert(bucket == "middle",
          s"doc $id ties a cutoff: threshold semantics bin it middle")
    }
  }

  test("micro-batch split never changes the tags (stateless replay equivalence)") {
    val df = corpusDf
    val cutoffs = Relevance.perplexityCutoffs(
      Relevance.perplexityBuckets(df, vocabSize = 64, bigramVocab = 64))
    graft.core.CacheScope.releaseAll()
    val model = Relevance.bigramModel(df, vocabSize = 64, bigramVocab = 64)
    val one = runStream(Seq(corpus), model, cutoffs, (0.0, 0.0), "perp_one")
    val many = runStream(corpus.grouped(2).toSeq, model, cutoffs,
      (0.0, 0.0), "perp_many")
    assert(one == many)
  }

  test("unseen language falls back to the default cutoffs") {
    val df = corpusDf
    val cutoffs = Relevance.perplexityCutoffs(
      Relevance.perplexityBuckets(df, vocabSize = 64, bigramVocab = 64))
    graft.core.CacheScope.releaseAll()
    val model = Relevance.bigramModel(df, vocabSize = 64, bigramVocab = 64)
    // default (-100, -200): any real score clears the head cut
    val headDefault = runStream(
      Seq(Seq(PerpDoc(99L, "zz", "s9", "alpha beta alpha beta"))),
      model, cutoffs, default = (-100.0, -200.0), name = "perp_dflt_h")
    assert(headDefault.map(_._4) == Seq("head"), headDefault.toString)
    // default (100, 50): any real score sits under the tail cut
    val tailDefault = runStream(
      Seq(Seq(PerpDoc(99L, "zz", "s9", "alpha beta alpha beta"))),
      model, cutoffs, default = (100.0, 50.0), name = "perp_dflt_t")
    assert(tailDefault.map(_._4) == Seq("tail"), tailDefault.toString)
  }
}
