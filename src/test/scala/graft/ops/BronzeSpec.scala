package graft.ops

import graft.SparkSpec
import graft.io.Sources

/** Bronze CTAS ×8 (models/yelp/bronze_*.sql, dbt_project.yml:28). */
class BronzeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("buildAll materializes all 8 bronze tables concurrently and exactly") {
    // a previous JVM's managed-table dirs would trip Spark 4's
    // location-exists validation on CREATE: start from a clean slate
    spark.sql("DROP DATABASE IF EXISTS bronze_spec CASCADE")
    val wh = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      "bronze_spec.db")
    if (java.nio.file.Files.exists(wh)) {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(wh)
      try s.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.delete)
      finally s.close()
    }
    Bronze.buildAll(spark, sfDir, targetDb = "bronze_spec")
    Bronze.tables.foreach { case (t, _) =>
      val expected = Sources.table(spark, sfDir, t).count()
      val got = spark.table(s"`bronze_spec`.`$t`").count()
      assert(got == expected, s"bronze_spec.$t row count")
    }
    // re-run is idempotent (overwrite mode), like dbt full-refresh
    Bronze.buildAll(spark, sfDir, targetDb = "bronze_spec")
    assert(spark.table("`bronze_spec`.`region`").count() ==
      Sources.table(spark, sfDir, "region").count())
  }
}
