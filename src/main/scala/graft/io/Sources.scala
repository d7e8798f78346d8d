package graft.io

import graft.core.SchemaRules
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType, TimestampType}

/** Source readers with the reference's ingest option parity.
  *
  * Reference behavior being re-expressed:
  *  - recursive file discovery (main.py:58-73) → `recursiveFileLookup`
  *  - NDJSON external tables, schema autodetect (main.py:318-320)
  *  - whole-file JSON arrays normalized to rows (main.py:246-255) →
  *    Spark's `multiLine` reader already yields one row per element
  *  - CSV: header skip, quoted newlines, jagged rows tolerated
  *    (main.py:321-326) → header/multiLine/PERMISSIVE
  *  - identifier sanitization applied at read, as a schema transform
  *    instead of file rewriting (main.py:191-311)
  *  - explicit schema overrides autodetect (main.py:333-335)
  *
  * Scale note: sanitization is a projection over the scan — at 100 TB no
  * data is rewritten and column pruning/pushdown still reach the source.
  */
object Sources {

  /** NDJSON (one object per line) or, with `multiLine=true`, whole-file
    * JSON values incl. top-level arrays (main.py:196-212's format sniff
    * becomes an explicit caller flag).
    */
  def readJson(
      spark: SparkSession,
      path: String,
      multiLine: Boolean = false,
      schema: Option[StructType] = None,
      recursive: Boolean = true,
      sanitize: Boolean = true): DataFrame = {
    var r = spark.read
      .option("multiLine", multiLine.toString)
      .option("recursiveFileLookup", recursive.toString)
      .option("mode", "PERMISSIVE")
    schema.foreach(s => r = r.schema(s))
    val df = r.json(path)
    if (sanitize) SchemaRules.sanitizeColumns(df) else df
  }

  /** CSV with the reference's external-table options (main.py:321-326):
    * skip_leading_rows=1 → header, allow_quoted_newlines → multiLine,
    * allow_jagged_rows → PERMISSIVE (short rows padded with nulls).
    */
  def readCsv(
      spark: SparkSession,
      path: String,
      schema: Option[StructType] = None,
      inferSchema: Boolean = true,
      recursive: Boolean = true,
      sanitize: Boolean = true): DataFrame = {
    var r = spark.read
      .option("header", "true")
      .option("multiLine", "true")
      .option("mode", "PERMISSIVE")
      .option("recursiveFileLookup", recursive.toString)
    schema match {
      case Some(s) => r = r.schema(s)
      case None    => r = r.option("inferSchema", inferSchema.toString)
    }
    val df = r.csv(path)
    if (sanitize) SchemaRules.sanitizeColumns(df) else df
  }

  /** Parquet reader for the repo testdata (TESTDATA.md). */
  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Testdata table loader: `table(spark, sfDir, "lineitem")`.
    *
    * `events.ts` normalizes to µs-since-epoch BIGINT — the common
    * denominator across engines (DuckDB `epoch_us(ts)` is stable for
    * every physical layout) and across testdata generations, which have
    * shipped BOTH layouts: parquet TIMESTAMP(NANOS) (unrepresentable in
    * Spark's µs TimestampType — read as ns BIGINT via the nanosAsLong
    * conf, truncated to µs) and parquet TIMESTAMP(MICROS) (read as
    * TIMESTAMP_NTZ / TIMESTAMP — `unix_micros` under the pinned UTC
    * session). Branching on the OBSERVED read type rather than assuming
    * one layout is what keeps a regenerated dataset from silently
    * failing the whole events family (round-8 post-mortem).
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df0 =
      if (name == "events") {
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val df = readParquet(spark, s"$sfDir/$name.parquet")
        import org.apache.spark.sql.functions.{col, expr, unix_micros}
        df.schema("ts").dataType match {
          case LongType => // TIMESTAMP(NANOS) via nanosAsLong: ns → µs
            df.withColumn("ts", expr("ts div 1000"))
          case TimestampNTZType =>
            // naive micros: interpret the wall-clock value as UTC — exactly
            // DuckDB's epoch_us on the same naive value. The NTZ→LTZ cast
            // goes through the session zone, so it must be pinned to UTC
            // (all entry points do; fail loudly rather than skew by an
            // offset if one ever doesn't).
            val tz = spark.conf.get("spark.sql.session.timeZone")
            require(tz == "UTC",
              s"events.ts is TIMESTAMP_NTZ; reading it needs spark.sql.session.timeZone=UTC, got $tz")
            df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)))
          case TimestampType =>
            df.withColumn("ts", unix_micros(col("ts")))
          case other => throw new IllegalArgumentException(
            s"events.ts: unsupported parquet read type $other")
        }
      } else readParquet(spark, s"$sfDir/$name.parquet")
    checkContract(name, df0)
    df0
  }

  /** Engine-facing column contract per testdata table (AFTER the loader's
    * normalization — events.ts is declared integral µs here): exact
    * column names in order, plus a type FAMILY per column. Families
    * rather than exact types so a benign regeneration (int32→int64) does
    * not trip the guard, while a semantic drift (a timestamp where code
    * expects epoch integers — the round-8 events break) fails AT LOAD
    * with a named per-column diff instead of 14 queries deep.
    */
  private val TableContracts: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "integral", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "integral", "n_name" -> "string",
      "n_regionkey" -> "integral"),
    "customer" -> Seq("c_custkey" -> "integral", "c_name" -> "string",
      "c_nationkey" -> "integral", "c_acctbal" -> "fractional",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "integral", "s_name" -> "string",
      "s_nationkey" -> "integral", "s_acctbal" -> "fractional"),
    "part" -> Seq("p_partkey" -> "integral", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "integral",
      "p_retailprice" -> "fractional"),
    "orders" -> Seq("o_orderkey" -> "integral", "o_custkey" -> "integral",
      "o_orderstatus" -> "string", "o_totalprice" -> "fractional",
      "o_orderdate" -> "timestamp", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "integral", "l_partkey" -> "integral",
      "l_suppkey" -> "integral", "l_linenumber" -> "integral",
      "l_quantity" -> "fractional", "l_extendedprice" -> "fractional",
      "l_discount" -> "fractional", "l_tax" -> "fractional",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp"),
    "documents" -> Seq("doc_id" -> "integral", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "integral"),
    "embeddings" -> Seq("vec_id" -> "integral",
      "embedding" -> "array<fractional>", "label" -> "integral"),
    "events" -> Seq("event_id" -> "integral", "ts" -> "integral",
      "user_id" -> "integral", "event_type" -> "string",
      "value" -> "fractional", "props" -> "string"))

  private def typeFamily(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType => "integral"
      case FloatType | DoubleType => "fractional"
      case _: DecimalType => "fractional"
      case StringType => "string"
      case TimestampType | TimestampNTZType | DateType => "timestamp"
      case ArrayType(et, _) => s"array<${typeFamily(et)}>"
      case other => other.simpleString
    }
  }

  /** Layout-drift guard (round-8 post-mortem generalized): tables the
    * engine knows get their post-normalization schema checked against
    * [[TableContracts]]; any drift throws ONE load-time error naming
    * every offending column. Unknown table names pass through (ad-hoc
    * reads are not the loader's contract).
    */
  private def checkContract(name: String, df: DataFrame): Unit =
    TableContracts.get(name).foreach { want =>
      val got = df.schema.map(f => f.name -> typeFamily(f.dataType))
      if (got != want) {
        val gotMap = got.toMap
        val diffs =
          want.collect {
            case (c, k) if !gotMap.contains(c) => s"$c: missing (want $k)"
            case (c, k) if gotMap(c) != k => s"$c: want $k, got ${gotMap(c)}"
          } ++
            got.collect { case (c, k) if !want.exists(_._1 == c) =>
              s"$c: unexpected ($k)" } ++
            (if (got.map(_._1) == want.map(_._1)) Nil
             else if (got.map(_._1).sorted == want.map(_._1).sorted.toSeq)
               Seq(s"column order drifted: ${got.map(_._1).mkString(", ")}")
             else Nil)
        throw new IllegalStateException(
          s"testdata layout drift in '$name' (regenerated dataset? update " +
            s"Sources.TableContracts/normalization): ${diffs.mkString("; ")}")
      }
    }

  /** Register a path as an unmanaged (external) table in the session
    * catalog — the reference's create_external_table (main.py:314-349),
    * idempotent like its exists_ok=True (main.py:343).
    */
  /** An explicit `schema` disables autodetect (the reference's
    * `schema=` on its external-table config, main.py:333-335): the
    * column list is declared in the DDL and Spark skips inference —
    * which also means a file Spark cannot infer from (empty, corrupt)
    * still registers and reads under the declared shape.
    */
  def registerExternal(
      spark: SparkSession,
      tableName: String,
      path: String,
      format: String,
      schema: Option[StructType] = None): Unit = {
    val fmt = format.toLowerCase match {
      case "json" | "newline_delimited_json" => "json"
      case "csv"                             => "csv"
      case "parquet"                         => "parquet"
      case other => throw new IllegalArgumentException(s"Unsupported format: $other")
    }
    val opts = fmt match {
      case "csv" => ", header 'true', multiLine 'true', mode 'PERMISSIVE'"
      case _     => ""
    }
    val qualified = tableName.split('.')
      .map(p => "`" + p.replace("`", "``") + "`").mkString(".")
    val cols = schema.map(s => s" (${s.toDDL})").getOrElse("")
    val existed = spark.catalog.tableExists(qualified.replace("`", ""))
    spark.sql(
      s"CREATE TABLE IF NOT EXISTS $qualified$cols USING $fmt OPTIONS (path '$path'$opts)")
    // registration-time validation, mirroring the reference's external-
    // table creation (a BQ table with zero autodetected columns is a
    // creation error, not a deferred query error): Spark 4 lazily infers
    // JSON/CSV schemas, so an uninferable file (empty, corrupt) would
    // otherwise register fine and break every later reader.
    if (schema.isEmpty && spark.table(qualified).schema.isEmpty) {
      if (!existed) spark.sql(s"DROP TABLE IF EXISTS $qualified")
      throw new IllegalArgumentException(
        s"schema autodetect produced no columns for $path — pass an explicit schema")
    }
  }

  /** Write `df` date-partitioned by the given µs-epoch timestamp column
    * (`<path>/p_date=YYYY-MM-DD/...`). At 100 TB this is the layout that
    * makes time-ranged queries touch only their days: a `p_date` filter
    * prunes at the FILE LISTING level (shows up as PartitionFilters in
    * `.explain`, zero I/O for other days), before any row is read.
    */
  def writePartitionedByDay(
      df: org.apache.spark.sql.DataFrame,
      path: String,
      tsCol: String = "ts"): Unit =
    df.withColumn("p_date",
      org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.col(tsCol))))
      .write.mode("overwrite").partitionBy("p_date").parquet(path)
}
