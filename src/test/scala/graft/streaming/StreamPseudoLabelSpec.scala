package graft.streaming

import graft.SparkSpec
import graft.ext.Similarity
import graft.io.Sources
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class PlProbe(probe_id: Long, embedding: Seq[Float])

/** Streaming face 14: pseudo-labeling arriving vectors against the
  * frozen index + labeled corpus — the serving half of the
  * label-propagation family.
  */
class StreamPseudoLabelSpec extends SparkSpec {

  private lazy val embs = Sources.table(spark, "/root/testdata/sf0.001", "embeddings")

  private def assignedPortable(cents: Seq[(Long, Seq[Float])]) =
    embs.withColumn("centroid_id", Similarity.nearestCentroidPortable(cents))
      .select("vec_id", "embedding", "label", "centroid_id")

  test("labelBatch equals a hand-rolled weighted-majority over the retrieval kernel's neighbors") {
    val cents = Similarity.seedCentroids(embs, 16)
    val assigned = assignedPortable(cents)
    val probes = embs.filter(col("vec_id").isin(3L, 11L, 29L, 57L))
      .select(col("vec_id").as("probe_id"), col("embedding"))
    val k = 4
    val got = StreamPseudoLabel.labelBatch(probes, assigned, cents, k = k)
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getDouble(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == Seq(3L, 11L, 29L, 57L))
    // replay: the retrieval kernel's k neighbors, decimal-exact vote
    // sums, max vote with ties to the smallest label
    val knn = Similarity.knnJoinAssigned(probes, assigned, cents, k = k)
      .collect().map(r => (r.getLong(0), r.getInt(2).toLong,
        BigDecimal(r.getDouble(3)).setScale(6, BigDecimal.RoundingMode.HALF_UP)))
    val want = knn.groupBy(_._1).map { case (pid, rows) =>
      val byLabel = rows.groupBy(_._2).view
        .mapValues(v => (v.map(_._3).sum, v.length.toLong)).toMap
      val maxW = byLabel.values.map(_._1).max
      val lbl = byLabel.filter(_._2._1 == maxW).keys.min
      pid -> ((lbl, byLabel(lbl)._1.toDouble, byLabel(lbl)._2))
    }
    got.foreach { case (pid, lbl, w, n) =>
      assert(want(pid) == ((lbl, w, n)), s"probe $pid diverged: got ($lbl,$w,$n)")
    }
  }

  test("a probe whose probed cells hold no candidates still yields a row: null label, 0 votes (r14 advice)") {
    import spark.implicits._
    val cents = Seq((0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f)))
    val corpus = Seq(
      (1L, Seq(0.9f, 0.1f, 0f, 0f), 7),
      (2L, Seq(0.8f, 0.2f, 0f, 0f), 7),
      (3L, Seq(1.0f, 0.0f, 0f, 0f), 5))
      .toDF("vec_id", "embedding", "label")
    val assigned = corpus.withColumn("centroid_id",
      Similarity.nearestCentroidPortable(cents))
    val probes = Seq(
      (100L, Seq(0f, 1f, 0f, 0f)),   // probes cell 1 — no corpus vectors there
      (101L, Seq(0.85f, 0.15f, 0f, 0f)) // probes cell 0 — two label-7 neighbors
    ).toDF("probe_id", "embedding")
    val got = StreamPseudoLabel.labelBatch(probes, assigned, cents, k = 2, nProbe = 1)
      .collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(100L, 101L),
      "the empty-cell probe must not be dropped from the output")
    val abstain = got(0)
    assert(abstain.isNullAt(1) && abstain.isNullAt(2) && abstain.getLong(3) == 0L,
      s"empty-cell probe should abstain loudly, got $abstain")
    assert(got(1).getInt(1) == 7 && got(1).getLong(3) == 2L)
  }

  test("streamed micro-batches equal one batch call; serves from the loaded index artifact") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val trained = Similarity.buildIvfIndex(embs, nCentroids = 16, iterations = 3,
      portable = true)
    val ixPath = java.nio.file.Files.createTempDirectory("graft-pl-ix")
      .resolve("index").toString
    Similarity.saveIndex(spark, trained, ixPath)
    val index = Similarity.loadIndex(spark, ixPath)
    val assigned = assignedPortable(index.centroids)
    val probeVecs = embs.filter(col("vec_id").isin(2L, 6L, 10L, 14L))
      .select("vec_id", "embedding").collect()
      .map(r => PlProbe(r.getLong(0), r.getSeq[Float](1)))
    val buf = new scala.collection.mutable.ArrayBuffer[(Long, Long, Double, Long)]()
    val input = MemoryStream[PlProbe]
    val q = StreamPseudoLabel.labelSink(
      input.toDF(), assigned, index.centroids) { (out, _) =>
      buf.synchronized {
        buf ++= out.collect()
          .map(r => (r.getLong(0), r.getInt(1).toLong, r.getDouble(2), r.getLong(3)))
      }
      ()
    }.start()
    try {
      input.addData(probeVecs(0), probeVecs(1))
      q.processAllAvailable()
      input.addData(probeVecs(2), probeVecs(3))
      q.processAllAvailable()
    } finally q.stop()
    val allProbes = embs.filter(col("vec_id").isin(2L, 6L, 10L, 14L))
      .select(col("vec_id").as("probe_id"), col("embedding"))
    val oneShot = StreamPseudoLabel.labelBatch(allProbes, assigned, index.centroids)
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getDouble(2), r.getLong(3)))
    assert(buf.sortBy(_._1).toSeq == oneShot.sortBy(_._1).toSeq,
      "streamed pseudo-labels diverged from the one-shot batch call")
    assert(buf.nonEmpty)
  }
}
