package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage decomposition for the kNN-graph build (r13 tuning aid;
  * not part of the declared surface): times assignment, probe-list
  * expansion, the candidate join, and the full graph independently.
  */
object KgProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/testdata/sf1")
    val nc = if (args.length > 1) args(1).toInt else 160
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.io.Sources.table(spark, sfDir, "embeddings")
    e.count()
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"KGPROF $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val cents = Similarity.seedCentroids(e, nc)
    val assigned = Similarity.ivfAssignPortableTo(e, cents)
      .select(col("centroid_id"), col("vec_id"), col("embedding"), col("label"))
    t("assign") { assigned.write.mode("overwrite").format("noop").save() }
    // probe-cell expansion (probeCellsOf's expression, inlined)
    val scored = array(cents.map { case (cid, v) =>
      struct(round(-Similarity.cosine(col("embedding"), array(v.map(lit): _*)), 6).as("d"),
        lit(cid).as("cid"))
    }.toIndexedSeq: _*)
    val probeCells = e.select(
      col("vec_id").as("probe_id"), col("embedding").as("_pe"),
      explode(transform(slice(array_sort(scored), 1, 4),
        x => x.getField("cid"))).as("centroid_id"))
    t("probeCells") { probeCells.write.mode("overwrite").format("noop").save() }
    val joined = assigned.join(probeCells, Seq("centroid_id"))
      .filter(col("probe_id") =!= col("vec_id"))
    t("candidates-count") { println("  n=" + joined.count()) }
    val scoredCand = joined.select(col("probe_id"), col("vec_id"), col("label"),
      round(Similarity.cosine(col("_pe"), col("embedding")), 6).as("cosine"))
    t("candidates-scored") {
      scoredCand.write.mode("overwrite").format("noop").save()
    }
    t("full-graph") {
      Similarity.knnGraph(e, k = 4, nCentroids = nc)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
