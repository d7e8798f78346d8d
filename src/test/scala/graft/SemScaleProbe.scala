package graft

import org.apache.spark.sql.SparkSession

import graft.ext.Similarity

/** Scale probe (Test/runMain graft.SemScaleProbe <sfDir> <nCentroids...>):
  * times SemDeDup pair generation at a given cluster count — the
  * evidence behind SCALE.md's "nCentroids must scale with the corpus"
  * entry (fixed k at 10× data grows per-cluster pair work ~100×; k
  * scaled ∝ corpus holds per-cluster size, and so the quadratic term,
  * constant).
  */
object SemScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/testdata/sf1")
    val ncs = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(160)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.io.Sources.table(spark, sfDir, "embeddings")
    e.count()
    for (nc <- ncs; run <- 1 to 3) {
      val t0 = System.nanoTime()
      val idx = Similarity.buildIvfIndex(e, nCentroids = nc, iterations = 3,
        portable = true)
      val t1 = System.nanoTime()
      val n = Similarity.semanticPairs(e, idx).count()
      val t2 = System.nanoTime()
      println(f"SEMSCALE nc=$nc run$run train ${(t1 - t0) / 1e9}%.3f s " +
        f"pairs ${(t2 - t1) / 1e9}%.3f s pairs=$n")
      graft.core.CacheScope.releaseAll()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
