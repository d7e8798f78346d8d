package graft.streaming

import graft.SparkSpec
import graft.ext.Corpus
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

case class DecontDoc(doc_id: Long, text: String, lang: String,
    source: String, n_chars: Long)

class StreamDecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val shared = (1 to 8).map(i => s"s$i").mkString(" ")

  private def corpus: Seq[DecontDoc] = Seq(
    DecontDoc(1L, s"prefix words here $shared trailing bits", "en", "a", 0L),
    DecontDoc(2L, "completely clean document with its own eight word run here",
      "en", "a", 0L),
    DecontDoc(3L, shared, "en", "b", 0L),
    DecontDoc(4L, "short doc", "en", "b", 0L),
    DecontDoc(5L, "another spotless page of fresh prose nine words long now",
      "en", "c", 0L))

  private def benchDf = Seq(
    (100L, s"unrelated lead in $shared and more", "en", "z", 0L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  private def runStream(
      batches: Seq[Seq[DecontDoc]], name: String): Seq[(Long, Boolean, Boolean)] = {
    implicit val sqlCtx = spark.sqlContext
    val art = Corpus.bloomArtifact(benchDf)
    val set = StreamDecontaminate.benchGramSet(benchDf)
    val input = MemoryStream[DecontDoc]
    val q = StreamDecontaminate.filterStream(input.toDF(), art, set)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table(name).orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2))).toSeq
    } finally q.stop()
  }

  test("stream verdicts agree with the batch drop set; bloom never misses") {
    val corpDf = corpus
      .map(d => (d.doc_id, d.text, d.lang, d.source, d.n_chars))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val kept = Corpus.decontaminate(corpDf, benchDf)
      .collect().map(_.getLong(0)).toSet
    val got = runStream(Seq(corpus), "decont_agree")
    assert(got.size == corpus.size, "stateless face must tag every doc")
    got.foreach { case (id, susp, cont) =>
      assert(cont == !kept(id),
        s"doc $id: stream contaminated=$cont but batch kept=${kept(id)}")
      if (cont) assert(susp, s"doc $id: contaminated without bloom flag")
    }
    assert(got.exists(_._3) && got.exists(!_._3),
      "fixture must exercise both verdicts")
  }

  test("micro-batch split invariance (stateless face)") {
    val whole = runStream(Seq(corpus), "decont_whole")
    val split = runStream(
      Seq(corpus.take(2), corpus.slice(2, 4), corpus.drop(4)), "decont_split")
    assert(whole == split)
  }

  test("frozen-set guard: an over-budget benchmark fails loudly") {
    intercept[IllegalArgumentException] {
      StreamDecontaminate.benchGramSet(benchDf, maxGrams = 1)
    }
  }

  test("bitmap/mBits mismatch fails at ARTIFACT construction, not per-row") {
    // the bundle is the guard: a bitmap that does not match its declared
    // mBits cannot even be wrapped, so no probe site can ever hold one
    intercept[IllegalArgumentException] {
      Corpus.BloomArtifact(new Array[Long](8), 1 << 20, 2, 8)
    }
  }
}
