package graft.ext

import graft.SparkSpec
import graft.io.Sources
import graft.streaming.StreamSimilarity
import org.apache.spark.sql.functions._

/** The persisted-index contract: a trained [[Similarity.IvfIndex]]
  * saved with [[Similarity.saveIndex]] and loaded back serves
  * BIT-IDENTICAL results to the in-memory index — the artifact a
  * 100 TB deployment trains once offline and every serving query
  * (batch and streaming) consumes instead of re-running Lloyd.
  */
class IvfPersistSpec extends SparkSpec {

  private lazy val embs = Sources.table(spark, "/root/testdata/sf0.001", "embeddings")

  private def tmpPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-ivf-$tag")
      .resolve("index").toString

  test("save -> load round-trips the centroid matrix bit-exactly") {
    val trained = Similarity.buildIvfIndex(embs, nCentroids = 16, iterations = 3,
      portable = true)
    val path = tmpPath("rt")
    Similarity.saveIndex(spark, trained, path)
    val loaded = Similarity.loadIndex(spark, path)
    // loadIndex canonicalizes by centroid_id; compare as maps so the
    // claim is about CONTENT (ids and every float bit), not ordering
    assert(loaded.centroids.toMap == trained.centroids.toMap,
      "loaded centroids differ from trained")
    assert(loaded.centroids.map(_._1) == loaded.centroids.map(_._1).sorted,
      "loaded index is not canonically ordered")
  }

  test("serving through the loaded index equals the in-memory index") {
    val trained = Similarity.buildIvfIndex(embs, nCentroids = 16, iterations = 3,
      portable = true)
    val path = tmpPath("serve")
    Similarity.saveIndex(spark, trained, path)
    val loaded = Similarity.loadIndex(spark, path)
    // assignment: every vector lands in the same cell
    val aMem = Similarity.ivfAssignPortableTo(embs, trained.centroids)
      .select("vec_id", "centroid_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val aLoad = Similarity.ivfAssignPortableTo(embs, loaded.centroids)
      .select("vec_id", "centroid_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(aMem == aLoad, "assignment diverged through the loaded index")
    // retrieval: per-probe top-k bit-equal through the loaded index
    val probe = Similarity.defaultProbe(embs)
    def serve(ix: Similarity.IvfIndex) = {
      val ids = Similarity.probeCentroidIds(ix.toDF(spark), probe, nProbe = 4,
        portable = true)
      val assigned = Similarity.ivfAssignPortableTo(embs, ix.centroids)
      Similarity.ivfTopK(assigned, ix.toDF(spark), probe)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq -> ids
    }
    assert(serve(trained) == serve(loaded), "retrieval diverged")
  }

  test("streaming similarity face serves from the loaded artifact") {
    val trained = Similarity.buildIvfIndex(embs, nCentroids = 16, iterations = 3,
      portable = true)
    val path = tmpPath("stream")
    Similarity.saveIndex(spark, trained, path)
    val loaded = Similarity.loadIndex(spark, path)
    val assigned = Similarity.ivfAssignPortableTo(embs, loaded.centroids)
      .select("vec_id", "embedding", "label", "centroid_id")
    val probes = embs.filter(col("vec_id").isin(0L, 7L, 42L))
      .select(col("vec_id").as("probe_id"), col("embedding"))
    def run(cents: Seq[(Long, Seq[Float])]) =
      StreamSimilarity.topKBatch(probes, assigned, cents)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq
        .sorted
    assert(run(loaded.centroids) == run(trained.centroids),
      "streaming face diverged between loaded and in-memory index")
    assert(run(loaded.centroids).nonEmpty)
  }
}
