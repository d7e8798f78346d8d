package graft.streaming

import graft.SparkSpec
import graft.ext.{Corpus, TextStats}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

case class CurateDoc(doc_id: Long, text: String, lang: String)

class StreamCurateSpec extends SparkSpec {

  private val good =
    "the quick brown fox jumps over the lazy dog and runs far away home"
  private val junk = "!!! ??? ,,, ;;; ::: !!!"
  private val leaked =
    "this exact benchmark sentence must never appear in training data at all"

  private def benchmark = {
    import spark.implicits._
    Seq((100L, leaked)).toDF("doc_id", "text")
  }

  test("streaming curate equals the batch composition on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = Seq(
      CurateDoc(1L, good, "en"),
      CurateDoc(2L, junk, "en"),                    // quality-filtered
      CurateDoc(3L, leaked + " with prefix", "en"), // contaminated
      CurateDoc(4L, good + " contact me x@y.com 1234567", "fr"))
    val input = MemoryStream[CurateDoc]
    val q = StreamCurate.curateStream(input.toDF(), benchmark, minQuality = 0.5)
      .writeStream.format("memory").queryName("stream_curate")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows.take(2): _*)
      q.processAllAvailable()
      input.addData(rows.drop(2): _*) // later micro-batch: same behavior
      q.processAllAvailable()
      val got = spark.table("stream_curate")
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3)))
      // batch reference: redact → quality ≥ 0.5 → decontaminate, built
      // from the SAME shared column expressions
      val batch = Seq(rows: _*).toDF("doc_id", "text", "lang")
      val expected = Corpus.decontaminate(batch, benchmark)
        .select(col("doc_id"), col("lang"),
          Corpus.redactPiiColumn(col("text")).as("clean_text"),
          TextStats.qualityScoreColumn(col("text")).as("quality_score"))
        .filter(col("quality_score") >= 0.5)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3)))
      assert(got.toSeq == expected.toSeq)
      // and the semantics are what they claim: junk + leaked dropped,
      // PII redacted
      assert(got.map(_._1).toSeq == Seq(1L, 4L))
      val doc4 = got.find(_._1 == 4L).get._3
      assert(doc4.contains("<EMAIL>") && doc4.contains("<NUM>"))
    } finally q.stop()
  }

  test("stream stays stateless: no state store operators in the plan") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[CurateDoc]
    val q = StreamCurate.curateStream(input.toDF(), benchmark)
      .writeStream.format("memory").queryName("stream_curate_plan")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(CurateDoc(1L, good, "en"))
      q.processAllAvailable()
      val plan = q.lastProgress.sources.length // progress exists
      assert(plan == 1)
      assert(q.lastProgress.stateOperators.isEmpty,
        "curation must not create a state store (stateless narrow ops only)")
    } finally q.stop()
  }
}
