package graft.streaming

import graft.SparkSpec
import graft.ext.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

case class DriftVec(vec_id: Long, embedding: Seq[Float], label: Int)

class StreamDriftMonitorSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embs =
    graft.io.Sources.table(spark, "/root/testdata/sf0.001", "embeddings")

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[DriftVec] =
    df.collect().map(r =>
      DriftVec(r.getLong(0), r.getSeq[Float](1), r.getInt(2))).toSeq

  private def runStream(
      batches: Seq[Seq[DriftVec]],
      index: Similarity.IvfIndex,
      base: Map[Long, (Long, Long)],
      name: String): Map[Long, (Long, Double, Double)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DriftVec]
    val q = StreamDriftMonitor.driftStream(input.toDF(), index, base)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update()).start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      // Update mode appends one row per touched cell per batch to the
      // memory sink; the LAST row per cell is the running total
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .groupBy(_._1).map { case (cid, rs) =>
          val last = rs.maxBy(_._2) // n_new strictly grows per cell
          cid -> ((last._2, last._3, last._4))
        }
    } finally q.stop()
  }

  test("final running rows equal the batch ivfDrift report, cell for cell") {
    val indexed = embs.filter("vec_id % 4 <> 0")
    val batch = embs.filter("vec_id % 4 = 0")
    val index = Similarity.buildIvfIndex(indexed, nCentroids = 16,
      iterations = 3, portable = true)
    val base = StreamDriftMonitor.baseline(indexed, index)
    assert(base.nonEmpty && base.size <= 16)
    val arriving = rows(batch)
    val got = runStream(
      Seq(arriving.take(40), arriving.slice(40, 80), arriving.drop(80)),
      index, base, "drift_agree")
    val want = Similarity.ivfDrift(indexed, batch).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getDouble(5))))
      .filter(_._2._1 > 0).toMap // the stream only reports touched cells
    assert(got.keySet == want.keySet,
      s"touched-cell sets differ: ${got.keySet} vs ${want.keySet}")
    got.foreach { case (cid, (n, _, drift)) =>
      val (wn, wDrift) = want(cid)
      assert(n == wn, s"cell $cid count: $n vs $wn")
      assert(drift == wDrift, s"cell $cid drift: $drift vs $wDrift")
    }
  }

  test("micro-batch split invariance of the final running rows") {
    val indexed = embs.filter("vec_id % 4 <> 0")
    val index = Similarity.buildIvfIndex(indexed, nCentroids = 16,
      iterations = 3, portable = true)
    val base = StreamDriftMonitor.baseline(indexed, index)
    val arriving = rows(embs.filter("vec_id % 4 = 0"))
    val whole = runStream(Seq(arriving), index, base, "drift_whole")
    val split = runStream(arriving.grouped(17).toSeq, index, base, "drift_split")
    assert(whole == split)
  }

  test("arrivals in a baseline-empty cell score against mean 0") {
    // index trained on two tight clusters; the arriving vector sits in
    // a cell whose baseline is absent only if no indexed vector chose
    // it — force that by streaming a vector identical to a centroid of
    // an EMPTY cell: with 2 seeds over 2 occupied clusters every cell
    // is occupied, so instead drop the baseline entry manually and pin
    // the contract: missing baseline ⇒ drift = mean_new - 0
    val df = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (1L, Seq(0.0f, 1.0f, 0.0f, 0.0f), 0),
      (2L, Seq(0.9f, 0.1f, 0.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val index = Similarity.buildIvfIndex(df, nCentroids = 2, iterations = 1,
      portable = true)
    val base = StreamDriftMonitor.baseline(df, index)
    val oneCell = base.keySet.head
    val pruned = base - oneCell
    val arriving = rows(df)
    val got = runStream(Seq(arriving), index, pruned, "drift_nobase")
    // the contract, pinned without re-deriving the rounding pipeline: a
    // MISSING baseline entry behaves exactly like an explicit zero-mass
    // entry (n = 0 ⇒ baseline mean 0) — same rows, bit for bit
    val zeroed = runStream(Seq(arriving), index,
      pruned + (oneCell -> ((0L, 0L))), "drift_zerobase")
    assert(got == zeroed, s"missing baseline must score against 0:\n$got\nvs\n$zeroed")
    // and the pruned cell genuinely drifts relative to the full baseline
    val full = runStream(Seq(arriving), index, base, "drift_fullbase")
    assert(got(oneCell)._3 != full(oneCell)._3 || base(oneCell)._2 == 0L,
      "pruning a non-trivial baseline entry must change the drift")
  }
}
