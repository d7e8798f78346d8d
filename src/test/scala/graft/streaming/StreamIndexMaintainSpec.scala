package graft.streaming

import graft.SparkSpec
import graft.ext.Similarity
import graft.io.Sources
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class MaintainVec(vec_id: Long, embedding: Seq[Float], label: Int)

/** Streaming face 13: continuous IVF maintenance — micro-batches fold
  * into the clustered layout through the idempotent incremental append,
  * so an at-least-once foreachBatch sink yields an exactly-once index.
  */
class StreamIndexMaintainSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embs = Sources.table(spark, "/root/testdata/sf0.001", "embeddings")

  private def fileInventory(layout: String): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(layout)
    java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => java.nio.file.Files.isRegularFile(p) &&
        !p.getFileName.toString.startsWith("_") &&
        !p.getFileName.toString.startsWith("."))
      .map(p => root.relativize(p).toString -> java.nio.file.Files.size(p))
      .toMap
  }

  test("streamed maintenance serves like a rebuild; a replayed stream is a no-op (face 13)") {
    val index = Similarity.buildIvfIndex(embs, nCentroids = 16, iterations = 3,
      portable = true)
    val work = java.nio.file.Files.createTempDirectory("graft-sim").toString
    val layout = s"$work/clustered"
    Similarity.writeClustered(
      Similarity.ivfAssignTo(embs.filter(col("vec_id") < 400L), index.centroids),
      layout)
    val arriving = embs.filter(col("vec_id") >= 400L)
      .select("vec_id", "embedding", "label").as[MaintainVec].collect().toSeq
    def runStream(checkpoint: String): Unit = {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[MaintainVec]
      // two micro-batches, AvailableNow: data enqueued before start
      input.addData(arriving.take(50): _*)
      input.addData(arriving.drop(50): _*)
      StreamIndexMaintain.maintainOnce(spark, input.toDF(), index, layout,
        checkpointDir = checkpoint)
      ()
    }
    runStream(s"$work/cp1")
    // the maintained layout serves exactly like a from-scratch rebuild
    val rebuilt = s"$work/rebuilt"
    Similarity.writeClustered(Similarity.ivfAssignTo(embs, index.centroids), rebuilt)
    val probe = Similarity.defaultProbe(embs)
    val probeIds = Similarity.probeCentroidIds(index.toDF(spark), probe, nProbe = 4)
    def serve(p: String) =
      Similarity.ivfTopKClustered(spark.read.parquet(p), probeIds, probe)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(serve(layout) == serve(rebuilt),
      "streamed maintenance diverged from a full rebuild")
    // exactly-once effect: REPLAY the whole stream (fresh checkpoint —
    // the worst-case re-delivery) → the layout is file-identical
    val before = fileInventory(layout)
    runStream(s"$work/cp2")
    assert(fileInventory(layout) == before,
      "replayed stream must not change the index layout")
  }
}
