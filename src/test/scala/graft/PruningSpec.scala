package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Enforces SCALE.md's scan-pruning claims as invariants: a projection
  * that only needs 3 columns must reach the parquet scan as a 3-column
  * `ReadSchema`, and metadata-only media queries must never read the
  * binary payload. A refactor that silently widens a scan fails here at
  * sf0.001 instead of multiplying IO by the table width at 100 TB.
  */
class PruningSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case _ => p.children
    }
    p +: kids.flatMap(flatten)
  }

  /** Column names read by each parquet scan, keyed by a path fragment. */
  private def scans(df: DataFrame): Seq[(String, Seq[String])] =
    flatten(df.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec =>
        (f.relation.location.rootPaths.mkString(","),
          f.requiredSchema.fieldNames.toSeq)
    }

  test("flagship: lineitem scan reads only the 3 referenced columns of 11") {
    val s = scans(SparkEntry.entry(spark))
      .filter(_._1.contains("lineitem"))
    graft.core.CacheScope.releaseAll()
    assert(s.nonEmpty)
    assert(s.forall(_._2.toSet == Set("l_orderkey", "l_extendedprice", "l_discount")),
      s"lineitem scan widened: $s")
  }

  test("media_stats on a persisted media table never reads the binary payload") {
    import graft.ext.Multimodal
    val dir = java.nio.file.Files.createTempDirectory("media_prune")
    try {
      val path = dir.toString
      Multimodal.asMediaTable(graft.io.Sources.table(spark, sfDir, "documents"))
        .write.mode("overwrite").parquet(path)
      val stats = Multimodal.mediaStats(spark.read.parquet(path))
      val s = scans(stats)
      assert(s.nonEmpty)
      assert(s.forall(!_._2.contains("payload")),
        s"metadata-only query reads the payload column: $s")
      assert(stats.count() == 3) // and it still computes
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(dir)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.delete)
      finally walk.close()
    }
  }

  test("sessionize: events scan skips the unused value/props columns") {
    val s = scans(SparkEntry.queries("sessionize_events")(spark, sfDir))
    graft.core.CacheScope.releaseAll()
    val ev = s.filter(_._1.contains("events"))
    assert(ev.nonEmpty)
    assert(ev.forall(c => !c._2.contains("props") && !c._2.contains("value")),
      s"sessionize reads unused wide columns: $ev")
  }

  test("revenue forecast: all three predicates reach the scan as PushedFilters") {
    val df = SparkEntry.queries("analytics_revenue_forecast")(spark, sfDir)
    val pushed = flatten(df.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.mkString(",").contains("lineitem") =>
        f.metadata.getOrElse("PushedFilters", "")
    }
    graft.core.CacheScope.releaseAll()
    assert(pushed.nonEmpty, "no lineitem scan found")
    val p = pushed.mkString
    Seq("l_shipdate", "l_discount", "l_quantity").foreach(c =>
      assert(p.contains(c), s"predicate on $c not pushed to the scan: $p"))
  }

  test("IVF clustered layout: nProbe=4 probe prunes FILES, not just compute") {
    import graft.ext.Similarity
    val e = graft.io.Sources.table(spark, sfDir, "embeddings")
    val index = Similarity.buildIvfIndex(e, nCentroids = 16, iterations = 1)
    val assigned = Similarity.ivfAssignTo(e, index.centroids)
    val dir = java.nio.file.Files.createTempDirectory("ivf_prune")
    try {
      Similarity.writeClustered(assigned, dir.toString)
      val probe = Similarity.defaultProbe(e)
      val ids = Similarity.probeCentroidIds(index.toDF(spark), probe, nProbe = 4)
      val q = Similarity.ivfTopKClustered(spark.read.parquet(dir.toString), ids, probe)
      val scan = flatten(q.queryExecution.executedPlan)
        .collectFirst { case f: FileSourceScanExec => f }
        .getOrElse(fail("no parquet scan in the clustered plan"))
      // the probe-id literals must reach the scan as PartitionFilters —
      // that is what bounds file listing/IO at nProbe/nCentroids
      assert(scan.partitionFilters.nonEmpty,
        "probe ids did not become PartitionFilters")
      val selected = scan.relation.location
        .listFiles(scan.partitionFilters, scan.dataFilters)
      val all = scan.relation.location.listFiles(Nil, Nil)
      assert(all.size >= 12, s"degenerate layout: ${all.size} partitions")
      assert(selected.size <= 4,
        s"probe lists ${selected.size} partitions, expected <= 4")
      val selFiles = selected.map(_.files.size).sum
      val allFiles = all.map(_.files.size).sum
      assert(selFiles * 2 <= allFiles,
        s"file pruning ineffective: $selFiles of $allFiles files read")
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(dir)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.delete)
      finally walk.close()
    }
  }

  test("clustered graph serving: probed cells prune edge-table FILES (r15 verdict #1)") {
    import graft.ext.Similarity
    import org.apache.spark.sql.functions.col
    val e = graft.io.Sources.table(spark, sfDir, "embeddings")
    val cents = Similarity.seedCentroids(e, 16)
    val dir = java.nio.file.Files.createTempDirectory("graph_prune")
    try {
      val path = dir.resolve("graph").toString
      Similarity.writeGraphClustered(Similarity.knnGraph(e, k = 4),
        Similarity.ivfAssignPortableTo(e, cents), path)
      // a bounded probe batch (2 probes × nProbe 4 ≤ 8 cells): the
      // exact edge frame graphSearchClustered's hop joins consume —
      // the walk materializes eagerly, so the scan shape is pinned on
      // the restricted frame itself
      val probes = e.filter(col("vec_id").isin(0L, 1L))
        .select(col("vec_id").as("probe_id"), col("embedding"))
      val cells = Similarity.probeCellIds(probes, cents, nProbe = 4)
      assert(cells.nonEmpty && cells.size <= 8)
      val q = spark.read.parquet(path)
        .filter(col("g_cell").isin(cells: _*)).drop("g_cell")
      val scan = flatten(q.queryExecution.executedPlan)
        .collectFirst { case f: FileSourceScanExec => f }
        .getOrElse(fail("no parquet scan in the clustered edge plan"))
      assert(scan.partitionFilters.nonEmpty,
        "probed cells did not become PartitionFilters on the edge scan")
      val selected = scan.relation.location
        .listFiles(scan.partitionFilters, scan.dataFilters)
      val all = scan.relation.location.listFiles(Nil, Nil)
      assert(all.size >= 12, s"degenerate graph layout: ${all.size} partitions")
      assert(selected.size <= cells.size,
        s"probe lists ${selected.size} partitions, expected <= ${cells.size}")
      assert(selected.size * 2 <= all.size,
        s"cell pruning ineffective: ${selected.size} of ${all.size} partitions read")
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(dir)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.delete)
      finally walk.close()
    }
  }

  test("ANN sketch layout: the hamming neighborhood prunes FILES") {
    import graft.ext.Similarity
    val e = graft.io.Sources.table(spark, sfDir, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("ann_prune")
    try {
      Similarity.writeSketchBuckets(e, dir.toString)
      val probe = Similarity.defaultProbe(e)
      val ids = Similarity.probeSketchIds(spark, probe)
      val q = Similarity.annTopKBucketed(spark.read.parquet(dir.toString), ids, probe)
      val scan = flatten(q.queryExecution.executedPlan)
        .collectFirst { case f: FileSourceScanExec => f }
        .getOrElse(fail("no parquet scan in the bucketed ANN plan"))
      assert(scan.partitionFilters.nonEmpty,
        "sketch neighborhood did not become PartitionFilters")
      val selected = scan.relation.location
        .listFiles(scan.partitionFilters, scan.dataFilters)
      val all = scan.relation.location.listFiles(Nil, Nil)
      // the h≤3 neighborhood intersected with the buckets that exist
      // must be a strict minority of the layout's partitions
      assert(all.size >= 20, s"degenerate layout: ${all.size} buckets")
      assert(selected.size * 2 < all.size,
        s"file pruning ineffective: ${selected.size} of ${all.size} buckets read")
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(dir)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.delete)
      finally walk.close()
    }
  }

  /** Measure the bucketed-ANN probe on a synthetic corpus: populated
    * bucket count, per-radius listing selectivity, recall@10 vs brute
    * force. All seeded → deterministic → pinnable.
    */
  private def annAtScale(
      rows: Seq[(Long, String, Seq[Float])],
      hs: Range): Seq[(Int, Int, Int, Int, Double)] = {
    import graft.ext.Similarity
    import spark.implicits._
    val e = rows.toDF("vec_id", "label", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ann_scale")
    try {
      Similarity.writeSketchBuckets(e, dir.toString)
      val probe = rows.head._3
      val brute = Similarity.topK(e, probe).select("vec_id")
        .collect().map(_.getLong(0)).toSet
      hs.map { h =>
        val hIds = Similarity.probeSketchIds(spark, probe, maxHamming = h)
        val q = Similarity.annTopKBucketed(spark.read.parquet(dir.toString), hIds, probe)
        val scan = flatten(q.queryExecution.executedPlan)
          .collectFirst { case f: FileSourceScanExec => f }
          .getOrElse(fail("no parquet scan in the bucketed ANN plan"))
        assert(scan.partitionFilters.nonEmpty)
        val all = scan.relation.location.listFiles(Nil, Nil)
        val selected = scan.relation.location
          .listFiles(scan.partitionFilters, scan.dataFilters)
        assert(selected.size <= hIds.size,
          s"listing exceeded the h<=$h neighborhood: ${selected.size} > ${hIds.size}")
        val ann = q.select("vec_id").collect().map(_.getLong(0)).toSet
        val recall = (ann intersect brute).size / 10.0
        info(s"h<=$h: ids=${hIds.size} selected=${selected.size}/${all.size} recall@10=$recall")
        (h, hIds.size, selected.size, all.size, recall)
      }
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(dir)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.delete)
      finally walk.close()
    }
  }

  test("ANN sketch layout at >=4k populated buckets (clustered corpus): h<=3 probe is listing-cheap AND accurate") {
    // The realistic regime: embedding corpora are CLUSTERED (that is
    // why vector search works at all). 6000 vectors around 600 seeded
    // centers — member sketches differ from their center's by noise-
    // flipped bits, so the layout still populates >=4k of the 2^16
    // buckets, while a probe's true neighbors stay within a small
    // hamming radius. The three scale claims, pinned with numbers:
    //  1. the h<=3 probe enumerates exactly 697 ids regardless of how
    //     many buckets exist — listing is neighborhood-bounded;
    //  2. selected partitions = |neighborhood ∩ populated| — a small
    //     minority of the layout, never proportional to it;
    //  3. recall@10 vs brute force is a pinned, geometry-dependent
    //     number: 0.9 at sibling-cosine ≈0.92 (σ=0.3, 4.1k buckets),
    //     0.8 at ≈0.86 (σ=0.4, declared here), collapsing on isotropic
    //     data (next test) — the full curve lives in SCALE.md §ANN.
    val rnd = new scala.util.Random(0xC1)
    val centers = Array.fill(600)(Array.fill(64)(rnd.nextGaussian()))
    val rows = (0 until 6000).map { i =>
      val c = centers(i % 600)
      (i.toLong, s"l${i % 7}",
        c.map(v => (v + 0.4 * rnd.nextGaussian()).toFloat).toSeq)
    }
    val curve = annAtScale(rows, 3 to 3)
    val (_, idsN, sel, all, recall) = curve.head
    assert(idsN == 697, s"h<=3 neighborhood of 16 planes must be 697, got $idsN")
    assert(all >= 4096, s"expected >=4k populated buckets, got $all")
    assert(sel * 8 <= all, s"probe reads $sel of $all buckets — not a minority")
    assert(recall >= 0.8,
      s"clustered-corpus recall@10 $recall below the measured 0.8 floor " +
        s"(selected $sel/$all buckets)")
  }

  test("ANN sketch layout, isotropic corpus: the adversarial recall curve is pinned") {
    // The worst case: iid gaussian vectors have NO cluster structure —
    // a query's true top-10 are barely closer than random points, and
    // hyperplane-LSH recall collapses (measured: 0.1/0.2/0.4 at
    // h<=3/4/5 over ~5.5k populated buckets, scanning 1%/3.5%/10% of
    // them). Pinned HERE so the number is a recorded property of the
    // operating point, not a surprise at 100 TB; SCALE.md documents the
    // remedies (geometry-adaptive IVF, more planes + banding).
    val rnd = new scala.util.Random(0xA5EED)
    val rows = (0 until 6000).map { i =>
      (i.toLong, s"l${i % 7}", Array.fill(64)(rnd.nextGaussian().toFloat).toSeq)
    }
    val curve = annAtScale(rows, 3 to 5)
    curve.foreach { case (h, _, sel, all, _) =>
      assert(all >= 4096, s"expected >=4k populated buckets, got $all")
      assert(sel * 8 <= all, s"h<=$h probe reads $sel of $all buckets — not a minority")
    }
    assert(curve.map(_._5) == curve.map(_._5).sorted,
      s"recall must be monotone in the probe radius: $curve")
    // seeded → exact floors at the measured operating points
    val byH = curve.map(c => c._1 -> c._5).toMap
    assert(byH(3) >= 0.1 && byH(4) >= 0.2 && byH(5) >= 0.4,
      s"isotropic recall curve regressed below the measured floor: $byH")
  }

  test("token_count: documents scan reads only doc_id and text") {
    val s = scans(SparkEntry.queries("token_count_documents")(spark, sfDir))
    graft.core.CacheScope.releaseAll()
    val d = s.filter(_._1.contains("documents"))
    assert(d.nonEmpty)
    assert(d.forall(_._2.toSet == Set("doc_id", "text")),
      s"token_count scan widened: $d")
  }
}
