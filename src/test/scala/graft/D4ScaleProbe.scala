package graft

import org.apache.spark.sql.SparkSession

import graft.ext.Similarity

/** Scale probe (Test/runMain graft.D4ScaleProbe <sfDir> <nc...>):
  * times the composed D4 selection (SemDeDup → re-cluster survivors →
  * prototype-prune) at a given cluster count — the evidence behind
  * SCALE.md's round-12 entry. The declared key pins nCentroids = 16
  * for oracle-checkability, which makes its pair phase quadratic per
  * decade BY FIXTURE (per-cluster size grows 10× → pair work 100×);
  * the production rule is the SemDeDup law both phases inherit:
  * nCentroids ∝ corpus holds per-cluster size, and so the quadratic
  * term, constant. This probe measures exactly that: the same
  * composed operator at fixture k and at k ∝ n, one decade apart.
  */
object D4ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/testdata/sf1")
    val ncs = if (args.length > 1) args.drop(1).toSeq.map(_.toInt) else Seq(16)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.io.Sources.table(spark, sfDir, "embeddings")
    e.count()
    for (nc <- ncs; run <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = Similarity.d4Select(e, nCentroids = nc).count()
      println(f"D4PROBE sf=$sfDir nc=$nc run$run ${(System.nanoTime() - t0) / 1e9}%.3f s ($n verdicts)")
      graft.core.CacheScope.releaseAll()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
