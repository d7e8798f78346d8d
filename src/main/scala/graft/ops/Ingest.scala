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

  def run(
      spark: SparkSession,
      baseFolder: String,
      database: String = defaultDatabase): Seq[IngestedTable] = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$database`") // main.py:39-55
    val json = findFiles(baseFolder, ".json").map((_, "json"))
    val csv = findFiles(baseFolder, ".csv").map((_, "csv"))
    (json ++ csv).map { case (path, fmt) =>
      val table = s"$database.${Names.tableNameForFile(path)}"
      // sanitized *view* of the raw file: rename-only projection over an
      // external scan; table registration stays pointed at the raw file
      Sources.registerExternal(spark, table, path, fmt)
      IngestedTable(table, path, fmt)
    }
  }

  /** Sanitized readers for ingested tables: the identifier cleanup the
    * reference performs by rewriting files (main.py:191-311) happens
    * here as a projection at read time.
    */
  def readTable(spark: SparkSession, table: String) =
    graft.core.SchemaRules.sanitizeColumns(spark.table(table))
}
