package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Loader.zorder]]: the rewrite must keep the data identical, hit the
  * requested file count, and — the point of the operation — tighten
  * every file's bounding box in the z-column space so min/max stats
  * prune scans on EITHER column, which a single-column sort cannot do.
  */
class ZorderSpec extends SparkSpec {

  private val GridN = 32

  /** Per-file bounding boxes over (a, b). */
  private def boxes(table: String): Seq[(Int, Int, Int, Int)] =
    spark.table(table)
      .groupBy(input_file_name().as("f"))
      .agg(min("a").as("a0"), max("a").as("a1"),
        min("b").as("b0"), max("b").as("b1"))
      .collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toSeq

  private def boxArea(bs: Seq[(Int, Int, Int, Int)]): Long =
    bs.map { case (a0, a1, b0, b1) =>
      (a1 - a0 + 1).toLong * (b1 - b0 + 1).toLong
    }.sum

  test("zorder: identical rows, requested files, boxes tighten on BOTH columns") {
    import spark.implicits._
    val rows = for { a <- 0 until GridN; b <- 0 until GridN }
      yield (a, b, a * GridN + b)
    dropWithLocation("zorder_t")
    // hash layout: every one of the 8 files spans ~the full (a, b)
    // range — the worst case for min/max pruning
    rows.toDF("a", "b", "payload")
      .repartition(8, col("payload"))
      .write.mode("overwrite").saveAsTable("zorder_t")
    val before = boxes("zorder_t")
    val beforeArea = boxArea(before)
    val wantRows = rows.sorted

    val nFiles = Loader.zorder(spark, "zorder_t", Seq("a", "b"), nFiles = 8)

    val gotRows = spark.table("zorder_t").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq.sorted
    assert(gotRows == wantRows, "rewrite must not change the data")
    assert(nFiles == 8, s"requested 8 files, wrote $nFiles")
    val after = boxes("zorder_t")
    assert(after.size == 8)
    val afterArea = boxArea(after)
    assert(afterArea * 2 <= beforeArea,
      s"boxes must tighten at least 2x: $beforeArea -> $afterArea")
    // point-predicate pruning on EACH column: a file whose box misses
    // the point never needs its rows read — both columns must prune,
    // the property a single-column sort cannot deliver
    val hitA = after.count { case (a0, a1, _, _) => a0 <= 5 && 5 <= a1 }
    val hitB = after.count { case (_, _, b0, b1) => b0 <= 5 && 5 <= b1 }
    assert(hitA < 8 && hitB < 8,
      s"z-order must prune on both columns: a-files $hitA/8, b-files $hitB/8")
    dropWithLocation("zorder_t")
  }

  test("zorder: skewed column still buckets evenly (quantile, not width)") {
    import spark.implicits._
    // a is exponentially skewed; uniform-width buckets would put ~all
    // rows in bucket 0 and the z key would degrade to a sort on b
    val rows = (0 until 1024).map { i =>
      val a = (math.pow(1.02, i) - 1).toInt // heavy mass near 0
      (a, i % GridN, i)
    }
    dropWithLocation("zorder_sk")
    rows.toDF("a", "b", "payload")
      .repartition(8, col("payload"))
      .write.mode("overwrite").saveAsTable("zorder_sk")
    Loader.zorder(spark, "zorder_sk", Seq("a", "b"), nFiles = 8)
    val after = boxes("zorder_sk")
    // the low-a mass must still split across files rather than land in
    // one catch-all box: at least half the files see a (quantile
    // boundaries cut inside the dense region)
    val lowA = after.count { case (a0, _, _, _) => a0 < 5 }
    assert(lowA >= 2, s"dense region must split across files: $after")
    val hitB = after.count { case (_, _, b0, b1) => b0 <= 3 && 3 <= b1 }
    assert(hitB < 8, s"b must still prune under a-skew: $hitB/8")
    dropWithLocation("zorder_sk")
  }

  test("zorder: bucketed table rejected loudly (re-bucketing would shred z-ranges)") {
    import spark.implicits._
    dropWithLocation("zorder_bk")
    (0 until 64).map(i => (i, i % 8, i)).toDF("a", "b", "payload")
      .write.mode("overwrite").bucketBy(4, "a").saveAsTable("zorder_bk")
    // writeTableLike re-applies bucketBy, splitting every z-range
    // partition into per-bucket files — the rewrite must refuse instead
    // of reporting success while destroying the clustering
    val e = intercept[IllegalArgumentException] {
      Loader.zorder(spark, "zorder_bk", Seq("a", "b"), nFiles = 4)
    }
    assert(e.getMessage.contains("does not support bucketed tables"))
    dropWithLocation("zorder_bk")
  }
}
