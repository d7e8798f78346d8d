package graft.streaming

import graft.SparkSpec
import graft.ext.Similarity
import graft.io.Sources
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Probe(probe_id: Long, embedding: Seq[Float])

class StreamSimilaritySpec extends SparkSpec {

  private lazy val embs = Sources.table(spark, "/root/testdata/sf0.001", "embeddings")

  /** Portably-assigned corpus (the 6-dp argmin the oracle-checked IVF
    * family uses) — what a production layout build would persist.
    */
  private def assignedPortable(cents: Seq[(Long, Seq[Float])]) =
    embs.withColumn("centroid_id", Similarity.nearestCentroidPortable(cents))
      .select("vec_id", "embedding", "label", "centroid_id")

  test("topKBatch per probe equals the oracle-green seed-IVF query") {
    val cents = Similarity.seedCentroids(embs, 16)
    val assigned = assignedPortable(cents)
    val probeRows = embs.filter(col("vec_id").isin(0L, 7L, 42L))
      .select(col("vec_id").as("probe_id"), col("embedding"))
    val got = StreamSimilarity.topKBatch(probeRows, assigned, cents)
      .collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(r => (r.getLong(1), r.getDouble(3))).toSeq).toMap
    for (pid <- Seq(0L, 7L, 42L)) {
      val probe = embs.filter(col("vec_id") === pid)
        .select("embedding").collect()(0).getSeq[Float](0)
      val want = Similarity.ivfSeedTopK(embs, probe, k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
      assert(got(pid) == want, s"probe $pid diverged:\n${got(pid)}\nvs\n$want")
      // the probe's own vector leads its result (cosine 1.0)
      assert(got(pid).head._1 == pid && got(pid).head._2 == 1.0)
    }
  }

  test("streaming replay: micro-batched probes equal one batch call") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val cents = Similarity.seedCentroids(embs, 16)
    val assigned = assignedPortable(cents)
    val probeVecs = embs.filter(col("vec_id").isin(1L, 5L, 9L, 13L))
      .select("vec_id", "embedding").collect()
      .map(r => Probe(r.getLong(0), r.getSeq[Float](1)))
    val buf = new scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
    val input = MemoryStream[Probe]
    val q = StreamSimilarity.topKSink(
      input.toDF(), assigned, cents) { (out, _) =>
      buf.synchronized {
        buf ++= out.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
      }
      ()
    }.start()
    try {
      input.addData(probeVecs(0), probeVecs(1))
      q.processAllAvailable()
      input.addData(probeVecs(2), probeVecs(3))
      q.processAllAvailable()
    } finally q.stop()
    val allAtOnce = StreamSimilarity.topKBatch(
      probeVecs.toSeq.toDF("probe_id", "embedding"), assigned, cents)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    assert(buf.toSet == allAtOnce,
      s"streamed results diverged from the batch call (${buf.size} vs ${allAtOnce.size})")
    assert(buf.map(_._1).distinct.size == 4) // every probe answered
  }

  test("over a clustered layout, a probe batch prunes files via PartitionFilters") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def flatten(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => p.children
      }
      p +: kids.flatMap(flatten)
    }
    val cents = Similarity.seedCentroids(embs, 16)
    val dir = java.nio.file.Files.createTempDirectory("stream_sim_prune")
    try {
      Similarity.writeClustered(assignedPortable(cents), dir.toString)
      val clustered = spark.read.parquet(dir.toString)
      val probeRows = embs.filter(col("vec_id") === 0L)
        .select(col("vec_id").as("probe_id"), col("embedding"))
      val out = StreamSimilarity.topKBatch(probeRows, clustered, cents)
      val scan = flatten(out.queryExecution.executedPlan)
        .collectFirst { case f: FileSourceScanExec => f }
        .getOrElse(fail("no parquet scan over the clustered layout"))
      // the plan carries the literal cell list AND a dynamic-pruning
      // subquery from the broadcast join; list with the static
      // literals only (the DPP one is unevaluable before execution)
      val staticFilters = scan.partitionFilters.filterNot(e =>
        e.exists(_.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.DynamicPruning]))
      assert(staticFilters.nonEmpty,
        "probed cells did not become PartitionFilters")
      val selected = scan.relation.location
        .listFiles(staticFilters, scan.dataFilters).size
      val total = scan.relation.location.listFiles(Nil, Nil).size
      assert(selected <= 4 && selected * 2 <= total,
        s"micro-batch read $selected of $total cells (expected <= 4)")
      assert(out.count() == 10)
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(dir)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.delete)
      finally walk.close()
    }
  }
}
