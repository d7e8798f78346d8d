package graft.ops

import graft.core.Names
import graft.io.Sources
import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** The reference's ingestion pipeline (`python main.py`, SURVEY.md §3 E1)
  * re-mapped Spark-first: discover local JSON/CSV files → sanitize (as a
  * schema transform, not a file rewrite) → register each as an external
  * table in the session catalog.
  *
  * The reference's upload fan-out machinery (semaphore(6), retries,
  * GCS blobs — main.py:94-188) disappears: Spark's scheduler owns
  * parallelism and the storage connector owns retries. What remains is
  * the observable contract: one queryable table per discovered file,
  * with sanitized identifiers (main.py:352-427).
  */
object Ingest {

  final case class IngestedTable(table: String, path: String, format: String)
  final case class FailedFile(path: String, error: String)

  /** Outcome of an ingest batch: what registered, what didn't. The
    * reference counts per-file failures and keeps going rather than
    * aborting the batch (`error_count`, main.py:182-186), then gives
    * failures one more sequential chance (main.py:400-427).
    */
  final case class IngestResult(
      tables: Seq[IngestedTable],
      failures: Seq[FailedFile]) {
    def errorCount: Int = failures.size
  }

  /** Recursive *.json / *.csv discovery (main.py:58-73). */
  def findFiles(baseFolder: String, suffix: String): Seq[String] = {
    val base = Paths.get(baseFolder)
    if (!Files.exists(base)) Seq.empty
    else {
      val s = Files.walk(base)
      try s.iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(suffix))
        .map(_.toString).toSeq.sorted
      finally s.close()
    }
  }

  /** Ingest every JSON and CSV file under `baseFolder`: per file, one
    * external table named after the sanitized filename stem
    * (main.py:384-387), registered idempotently (exists_ok,
    * main.py:343). Returns the registrations performed.
    */
  /** Target database, overridable via the O14 config/secret shim
    * (the reference bootstraps its dataset names from Secret Manager,
    * gcp_function.py:33-38 + main.py:39-55).
    */
  def defaultDatabase: String =
    graft.core.Secrets.fetch("staging_database").getOrElse("staging")

  /** `schemas` maps a sanitized table stem (what
    * [[Names.tableNameForFile]] yields) to an explicit schema, which
    * disables autodetect for that table (main.py:333-335). One bad file
    * never aborts the batch: each failure is recorded, retried once
    * sequentially (main.py:400-427), and reported in the result.
    */
  def run(
      spark: SparkSession,
      baseFolder: String,
      database: String = defaultDatabase,
      schemas: Map[String, org.apache.spark.sql.types.StructType] = Map.empty)
      : IngestResult = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$database`") // main.py:39-55
    val json = findFiles(baseFolder, ".json").map((_, "json"))
    val csv = findFiles(baseFolder, ".csv").map((_, "csv"))
    val all = json ++ csv
    def attempt(path: String, fmt: String): Either[FailedFile, IngestedTable] = {
      val stem = Names.tableNameForFile(path)
      val table = s"$database.$stem"
      // sanitized *view* of the raw file: rename-only projection over an
      // external scan; table registration stays pointed at the raw file
      try {
        Sources.registerExternal(spark, table, path, fmt, schemas.get(stem))
        Right(IngestedTable(table, path, fmt))
      } catch {
        case e: Throwable =>
          Left(FailedFile(path, Option(e.getMessage).getOrElse(e.toString)))
      }
    }
    val first = all.map { case (path, fmt) => (path, fmt, attempt(path, fmt)) }
    val settled = first.map {
      case (path, fmt, Left(_)) => attempt(path, fmt) // one sequential retry
      case (_, _, ok)           => ok
    }
    IngestResult(
      settled.collect { case Right(t) => t },
      settled.collect { case Left(f) => f })
  }

  /** Sanitized readers for ingested tables: the identifier cleanup the
    * reference performs by rewriting files (main.py:191-311) happens
    * here as a projection at read time.
    */
  def readTable(spark: SparkSession, table: String) =
    graft.core.SchemaRules.sanitizeColumns(spark.table(table))
}
