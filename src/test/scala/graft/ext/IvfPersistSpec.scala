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

  test("appendToClustered: untouched partitions stay byte-identical; serving equals a full rebuild (r13 verdict #4)") {
    val trained = Similarity.buildIvfIndex(embs, nCentroids = 16, iterations = 3,
      portable = true)
    val ixPath = tmpPath("inc")
    Similarity.saveIndex(spark, trained, ixPath)
    val index = Similarity.loadIndex(spark, ixPath)
    // initial layout from the first 400 vectors; batch = the rest
    val base = embs.filter(col("vec_id") < 400L)
    val batch = embs.filter(col("vec_id") >= 400L)
    val layout = tmpPath("layout").stripSuffix("/index") + "/clustered"
    Similarity.writeClustered(Similarity.ivfAssignTo(base, index.centroids), layout)
    def inventory(): Map[String, Seq[(String, Long, Long)]] = {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(layout)
      java.nio.file.Files.walk(root).iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p) &&
          !p.getFileName.toString.startsWith("_") &&
          !p.getFileName.toString.startsWith("."))
        .toSeq
        .map { p =>
          val rel = root.relativize(p).toString
          val part = rel.split('/').head
          (part, (rel, java.nio.file.Files.size(p),
            java.nio.file.Files.getLastModifiedTime(p).toMillis))
        }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sortBy(_._1) }
    }
    val before = inventory()
    val touched = Similarity.appendToClustered(spark, layout, batch, index,
      maxFilesPerPartition = 64) // high threshold: pure append this round
    assert(touched.nonEmpty)
    val after = inventory()
    // every partition the batch did NOT touch is byte-identical (same
    // files, same sizes, same mtimes — append never rewrites)
    val touchedDirs = touched.map(c => s"centroid_id=$c").toSet
    for ((part, files) <- before if !touchedDirs.contains(part))
      assert(after(part) == files, s"untouched partition $part changed")
    // serving equivalence: appended layout == rebuilt-from-union layout
    val rebuilt = tmpPath("rebuild").stripSuffix("/index") + "/rebuilt"
    Similarity.writeClustered(Similarity.ivfAssignTo(embs, index.centroids), rebuilt)
    val probe = Similarity.defaultProbe(embs)
    val probeIds = Similarity.probeCentroidIds(index.toDF(spark), probe, nProbe = 4)
    def serve(p: String) =
      Similarity.ivfTopKClustered(spark.read.parquet(p), probeIds, probe)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(serve(layout) == serve(rebuilt),
      "appended layout serves differently from a full rebuild")
    // idempotency: re-delivering the same batch appends nothing
    val filesBefore = inventory()
    Similarity.appendToClustered(spark, layout, batch, index,
      maxFilesPerPartition = 64)
    assert(inventory().view.mapValues(_.map(t => (t._1, t._2))).toMap ==
      filesBefore.view.mapValues(_.map(t => (t._1, t._2))).toMap,
      "re-delivered batch must be a no-op")
    // compaction: drive file counts over a tight threshold, then verify
    // the rewrite bounds files per partition and preserves rows + serving
    val rowsBefore = spark.read.parquet(layout).count()
    val n = Similarity.compactClustered(spark, layout, touched,
      maxFilesPerPartition = 1)
    assert(n >= 1, "expected at least one overfull partition to compact")
    assert(spark.read.parquet(layout).count() == rowsBefore)
    assert(serve(layout) == serve(rebuilt), "compaction changed serving")
  }

  test("compactClustered counts DATA files only: checksum sidecars never trigger a rewrite (r14 review)") {
    import scala.jdk.CollectionConverters._
    val trained = Similarity.buildIvfIndex(embs, nCentroids = 8, iterations = 2,
      portable = true)
    val layout = tmpPath("sidecar").stripSuffix("/index") + "/clustered"
    Similarity.writeClustered(Similarity.ivfAssignTo(embs, trained.centroids), layout)
    val root = java.nio.file.Paths.get(layout)
    // pick a partition dir; on the local (checksummed) filesystem every
    // data file has a '.…crc' sidecar — the exact double-count shape
    val partDir = java.nio.file.Files.list(root).iterator().asScala
      .filter(p => java.nio.file.Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("centroid_id="))
      .toSeq.minBy(_.getFileName.toString)
    def names() = java.nio.file.Files.list(partDir).iterator().asScala
      .map(_.getFileName.toString).toSeq.sorted
    val dataFiles = names().count(n => !n.startsWith("_") && !n.startsWith("."))
    assert(dataFiles >= 1)
    assert(names().exists(_.endsWith(".crc")),
      "fixture sanity: this layout must carry checksum sidecars")
    val cid = partDir.getFileName.toString.stripPrefix("centroid_id=").toLong
    val before = names()
    // at-threshold (not over): with sidecars wrongly counted this
    // partition would cross 2× and be rewritten on every call
    val n = Similarity.compactClustered(spark, layout, Seq(cid),
      maxFilesPerPartition = dataFiles)
    assert(n == 0, "an at-threshold partition must not be rewritten")
    assert(names() == before, "compaction must not touch the partition's files")
  }
}
