package graft.ops

import graft.io.Sources
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Bronze-layer full-copy models (models/yelp/bronze_*.sql:5-7 ×8 and
  * dbt_project.yml:28): each model is `CREATE TABLE bronze.t AS SELECT *
  * FROM staging.t` — a scan + full projection + materialize. The DAG is
  * flat (no ref()s), so the 8 copies are independent jobs.
  *
  * Over the repo testdata the staging sources are the parquet tables
  * (TESTDATA.md); a deterministic total ORDER BY on the primary key fixes
  * row order for the DuckDB oracle compare (SURVEY.md §5 t2).
  */
object Bronze {

  /** table → primary-key sort columns (FIXTURES.md §A). */
  val tables: Seq[(String, Seq[String])] = Seq(
    "region"   -> Seq("r_regionkey"),
    "nation"   -> Seq("n_nationkey"),
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part"     -> Seq("p_partkey"),
    "orders"   -> Seq("o_orderkey"),
    "lineitem" -> Seq("l_orderkey", "l_linenumber"),
    "events"   -> Seq("event_id"),
  )

  /** One bronze copy: SELECT * FROM t ORDER BY pk. */
  def copy(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    val pk = tables.toMap.apply(table)
    Sources.table(spark, sfDir, table).orderBy(pk.map(col): _*)
  }

  /** Materialize all 8 bronze tables into the catalog (≡ `dbt run` over
    * the flat 8-model DAG, SURVEY.md §3 E3). The DAG is flat, so the 8
    * jobs are submitted CONCURRENTLY — the reference's own posture
    * (`threads: 4`, profile.yml:9). Spark's scheduler interleaves the
    * independent jobs; wall-clock ≈ the largest copy, not the sum.
    */
  def buildAll(
      spark: SparkSession,
      sfDir: String,
      targetDb: String = graft.core.Secrets.fetch("bronze_database").getOrElse("bronze"),
      threads: Int = 4): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$targetDb`")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val jobs = tables.map { case (t, _) =>
        Future {
          Sources.table(spark, sfDir, t)
            .write.mode("overwrite").saveAsTable(s"`$targetDb`.`$t`")
        }
      }
      // wait for ALL jobs (no Future.sequence: its continuations would
      // need the pool after a fail-fast shutdown), then surface the
      // first failure
      jobs.foreach(Await.ready(_, Duration.Inf))
      jobs.foreach(_.value.get.get)
    } finally pool.shutdown()
  }
}
