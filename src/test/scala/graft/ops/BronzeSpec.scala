package graft.ops

import graft.SparkSpec
import graft.io.Sources

/** Bronze CTAS ×8 (models/yelp/bronze_*.sql, dbt_project.yml:28). */
class BronzeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("buildAll materializes all 8 bronze tables concurrently and exactly") {
    dropWithLocation("bronze_spec", isDatabase = true)
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
