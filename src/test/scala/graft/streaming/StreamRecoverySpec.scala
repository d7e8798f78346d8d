package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Checkpoint crash-recovery for the stateful faces — the failure mode
  * a production stream actually has: the query dies mid-stream, new
  * data keeps arriving, and a restart from the checkpoint dir must
  * resume the STATE (not just the offsets) so the combined output
  * equals an uninterrupted run. One test per state class: the
  * banded-bucket store (StreamNearDup) and the single-key admission
  * fold (StreamSelectBudget). Sinks are foreachBatch (the recoverable
  * sink shape — the memory sink refuses checkpoint recovery).
  */
class StreamRecoverySpec extends SparkSpec {

  private val base = "the quick brown fox jumps over the lazy dog again and again"
  private val other = "completely unrelated words about spark catalyst optimizer rules"

  test("near-dup bucket state survives a kill + checkpoint restart (banded-bucket class)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt-nd").toString
    val input = MemoryStream[StreamDoc]
    val got = new scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    def start() = StreamNearDup.nearDupTags(input.toDS(), threshold = 0.5)
      .writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (out: org.apache.spark.sql.Dataset[NearDupTag], _: Long) =>
        val rows = out.collect().map(t => (t.doc_id, t.dup_of))
        got.synchronized { got ++= rows }
        ()
      }
      .start()
    // run 1: the originals land, bucket state is built, then the query dies
    val q1 = start()
    input.addData(StreamDoc(1L, 0L, base), StreamDoc(2L, 1L, other))
    q1.processAllAvailable()
    q1.stop()
    assert(got.isEmpty, "originals must pass untagged")
    // data arrives WHILE the query is down — recovery must replay it
    input.addData(StreamDoc(3L, 2L, base + " lambda"))
    // run 2: restart from the checkpoint; the near-dup of doc 1 can only
    // be tagged if the bucket state (doc 1's signature) was restored
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(got.nonEmpty,
      "restart lost the bucket state: near-dup of a pre-kill doc untagged")
    assert(got.forall { case (d, of) => d == 3L && of == 1L }, got.toSeq.toString)
    // uninterrupted reference: same batches, one query lifetime
    val refInput = MemoryStream[StreamDoc]
    val ref = new scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val qr = StreamNearDup.nearDupTags(refInput.toDS(), threshold = 0.5)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (out: org.apache.spark.sql.Dataset[NearDupTag], _: Long) =>
        val rows = out.collect().map(t => (t.doc_id, t.dup_of))
        ref.synchronized { ref ++= rows }
        ()
      }
      .start()
    refInput.addData(StreamDoc(1L, 0L, base), StreamDoc(2L, 1L, other))
    qr.processAllAvailable()
    refInput.addData(StreamDoc(3L, 2L, base + " lambda"))
    qr.processAllAvailable()
    qr.stop()
    assert(got.sorted == ref.sorted,
      s"resumed output diverged from the uninterrupted run: $got vs $ref")
  }

  private def rich(i: Int): String =
    s"the quick brown fox jumps over the lazy dog near door $i"

  test("select-budget spent state survives a kill + checkpoint restart (single-key admission class)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt-sb").toString
    val budget = 40L
    def mkDocs(ids: Range) = ids.map(i => BudgetDoc(i.toLong, "en", s"s${i % 2}", rich(i)))
    val got = new scala.collection.mutable.ArrayBuffer[Long]()
    val input = MemoryStream[BudgetDoc]
    def start() = StreamSelectBudget.selectStream(input.toDF(), budget)
      .writeStream.outputMode(OutputMode.Append())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (out: org.apache.spark.sql.Dataset[SelectedDoc], _: Long) =>
        val rows = out.collect().map(_.doc_id)
        got.synchronized { got ++= rows }
        ()
      }
      .start()
    // run 1 spends the whole budget, then dies
    val q1 = start()
    input.addData(mkDocs(1 to 10): _*)
    q1.processAllAvailable()
    q1.stop()
    val admitted1 = got.toSet
    assert(admitted1.nonEmpty && admitted1.size < 10,
      s"fixture must exhaust the budget mid-corpus: $admitted1")
    // docs arriving while down would ALL be admitted if the restart
    // forgot the spent counter (fresh state ⇒ fresh budget)
    input.addData(mkDocs(11 to 14): _*)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(got.toSet == admitted1,
      s"restart reset the spent counter: post-kill admissions ${got.toSet -- admitted1}")
  }
}
