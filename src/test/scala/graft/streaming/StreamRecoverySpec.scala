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

  test("drift running totals survive a kill + checkpoint restart (aggregation-state class, r15 verdict #6)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val embs = graft.io.Sources.table(spark, "/root/testdata/sf0.001", "embeddings")
    val indexed = embs.filter("vec_id % 4 <> 0")
    val batch = embs.filter("vec_id % 4 = 0")
    val index = graft.ext.Similarity.buildIvfIndex(indexed, nCentroids = 16,
      iterations = 3, portable = true)
    val base = StreamDriftMonitor.baseline(indexed, index)
    val arriving = batch.collect()
      .map(r => DriftVec(r.getLong(0), r.getSeq[Float](1), r.getInt(2))).toSeq
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt-drift").toString
    val got = new scala.collection.mutable.ArrayBuffer[(Long, Long, Double, Double)]()
    val input = MemoryStream[DriftVec]
    def start() = StreamDriftMonitor.driftStream(input.toDF(), index, base)
      .writeStream.outputMode(OutputMode.Update())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (out: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = out.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        got.synchronized { got ++= rows }
        ()
      }
      .start()
    // run 1 accumulates running (count, sum) state per cell, then dies
    val q1 = start()
    input.addData(arriving.take(60): _*)
    q1.processAllAvailable()
    q1.stop()
    // the tail arrives while the query is down
    input.addData(arriving.drop(60): _*)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    // the last row per cell is the running total over EVERYTHING
    // arrived; equality with the batch report holds only if the
    // aggregation state (per-cell count + micro-sum) was RESTORED —
    // fresh state would restart each cell's n_new at the tail's counts
    val fin = got.groupBy(_._1).map { case (cid, rs) => cid -> rs.maxBy(_._2) }
    val want = graft.ext.Similarity.ivfDrift(indexed, batch).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getDouble(5))))
      .filter(_._2._1 > 0).toMap
    assert(fin.keySet == want.keySet,
      s"touched-cell sets differ: ${fin.keySet} vs ${want.keySet}")
    want.foreach { case (cid, (wn, wDrift)) =>
      val (_, n, _, drift) = fin(cid)
      assert(n == wn, s"cell $cid running count lost state: $n vs $wn")
      assert(drift == wDrift, s"cell $cid drift: $drift vs $wDrift")
    }
  }

  test("graph+vector layout pair survives a kill + restart, incl. a half-applied batch (two-artifact class, r15 verdict #6)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, max}
    import graft.ext.Similarity
    val embs = graft.io.Sources.table(spark, "/root/testdata/sf0.001", "embeddings")
    // the family's tail split: every seed vertex stays in base, so the
    // frozen quantizer equals the union's and append == rebuild
    val cents = Similarity.seedCentroids(embs, 16)
    val seedCut = cents.map(_._1).max
    val cut = embs.agg(max("vec_id")).collect()(0).getLong(0) * 9 / 10
    val arriving = col("vec_id") > seedCut && col("vec_id") >= cut
    val base = embs.filter(!arriving)
    val batchDf = embs.filter(arriving)
    val ids = batchDf.select("vec_id").collect().map(_.getLong(0)).sorted
    val mid = ids(ids.length / 2)
    val index = Similarity.IvfIndex(cents)
    val root = java.nio.file.Files.createTempDirectory("graft-ckpt-gm")
    val vPath = root.resolve("vectors").toString
    val gPath = root.resolve("graph").toString
    val ckpt = root.resolve("ckpt").toString
    val baseAssigned = Similarity.ivfAssignPortableTo(base, cents)
    Similarity.writeClustered(baseAssigned, vPath)
    Similarity.writeGraphClustered(
      Similarity.knnGraph(base, k = 4), baseAssigned, gPath)
    def vecsOf(df: org.apache.spark.sql.DataFrame): Seq[GmVec] = df.collect()
      .map(r => GmVec(r.getLong(0), r.getSeq[Float](1), r.getInt(2))).toSeq
    val input = MemoryStream[GmVec]
    def start() = StreamGraphMaintain.maintain(input.toDF(), index,
        vPath, gPath,
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      .option("checkpointLocation", ckpt)
      .start()
    // run 1 folds b1 into BOTH artifacts, then the query dies
    val q1 = start()
    input.addData(vecsOf(batchDf.filter(col("vec_id") < mid)): _*)
    q1.processAllAvailable()
    q1.stop()
    // while down: b2 arrives, AND its graph append lands WITHOUT the
    // vector append or an offset commit — the harshest crash point
    // (maintainBatch's documented ordering: graph first)
    val b2 = batchDf.filter(col("vec_id") >= mid)
    input.addData(vecsOf(b2): _*)
    Similarity.appendToGraphClustered(spark, gPath,
      spark.read.parquet(vPath).select("vec_id", "embedding", "label"),
      b2, cents, k = 4)
    // restart: the checkpoint replays b2 through the face — the graph
    // half must no-op on its vertex anti-join, the vector half must
    // complete, and the pair must converge to the offline rebuild
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val edges = spark.read.parquet(gPath)
      .select("probe_id", "vec_id", "label", "cosine")
      .orderBy(col("probe_id"), col("cosine").desc, col("vec_id"))
      .collect().map(_.toSeq).toSeq
    assert(edges == Similarity.knnGraph(embs, k = 4)
        .collect().map(_.toSeq).toSeq,
      "recovered pair diverged from the offline rebuild")
    val pairs = edges.map(r => (r(0), r(1)))
    assert(pairs.distinct.size == pairs.size,
      "half-applied batch replay left duplicate edges")
    assert(spark.read.parquet(vPath).count() == embs.count(),
      "vector layout must hold every vertex exactly once after recovery")
  }
}
