package graft.io

import graft.SparkSpec

import java.nio.file.Files

/** Ingest option parity with the reference (FIXTURES.md §B1/§B2). */
class SourcesSpec extends SparkSpec {

  test("dirty NDJSON: nested keys sanitized on read (main.py:215-230,319)") {
    val dir = Files.createTempDirectory("ndjson")
    val f = dir.resolve("yelp business.json")
    Files.writeString(f,
      """{"business id":"b1","stars":4.5,"attributes":{"Wi-Fi":"free","BusinessParking":{"street":true,"2valet":false}},"hours":[{"day":"Mon","open@":"8:00"}]}
        |{"business id":"b2","stars":3.0,"attributes":{"Wi-Fi":"no","BusinessParking":{"street":false,"2valet":true}},"hours":[]}
        |""".stripMargin)
    val df = Sources.readJson(spark, dir.toString)
    val names = df.schema.fieldNames.toSet
    assert(names.contains("business_id"))
    val attrs = df.schema("attributes").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(attrs.fieldNames.toSet == Set("Wi_Fi", "BusinessParking"))
    val parking = attrs("BusinessParking").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(parking.fieldNames.toSet == Set("street", "_2valet"))
    assert(df.count() == 2)
    val b1 = df.filter(df("business_id") === "b1").collect().head
    assert(b1.getAs[Double]("stars") == 4.5)
  }

  test("whole-file JSON array yields one row per element (main.py:246-255)") {
    val dir = Files.createTempDirectory("jsonarr")
    Files.writeString(dir.resolve("arr.json"),
      """[{"a key":1},{"a key":2},{"a key":3}]""")
    val df = Sources.readJson(spark, dir.toString, multiLine = true)
    assert(df.count() == 3)
    assert(df.schema.fieldNames.toSeq == Seq("a_key"))
  }

  test("dirty CSV: header sanitize + quoted newlines + jagged rows (main.py:283-293,321-326)") {
    val dir = Files.createTempDirectory("csv")
    Files.writeString(dir.resolve("temperature_degreef.csv"),
      "Date,Max TemperatureF,Min TemperatureF,2ndReading,Precip (in)\n" +
        "2012-01-01,62,31,55,\"0.00\nT\"\n" +
        "2012-01-02,64,34\n")
    val df = Sources.readCsv(spark, dir.toString, inferSchema = false)
    assert(df.schema.fieldNames.toSeq ==
      Seq("Date", "Max_TemperatureF", "Min_TemperatureF", "_2ndReading", "Precip__in_"))
    val rows = df.orderBy("Date").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("Precip__in_") == "0.00\nT") // quoted newline
    assert(rows(1).isNullAt(3) && rows(1).isNullAt(4))        // jagged → nulls
  }

  test("explicit schema overrides inference (main.py:333-335)") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("csv2")
    Files.writeString(dir.resolve("x.csv"), "a,b\n1,2\n")
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType)))
    val df = Sources.readCsv(spark, dir.toString, schema = Some(schema))
    assert(df.schema("a").dataType == LongType)
    assert(df.schema("b").dataType == StringType)
  }

  test("writePartitionedByDay: day filter prunes partitions at the scan") {
    import spark.implicits._
    val day = 86400L * 1000000
    val df = Seq(
      (1L, 0L, "a"), (2L, day / 2, "b"),        // day 1970-01-01
      (3L, day + 1, "c"), (4L, 2 * day + 5, "d")) // later days
      .toDF("event_id", "ts", "payload")
    val dir = Files.createTempDirectory("pdate").toString
    Sources.writePartitionedByDay(df, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 4)
    val oneDay = back.filter(org.apache.spark.sql.functions.col("p_date") === "1970-01-01")
    assert(oneDay.collect().map(_.getAs[Long]("event_id")).toSet == Set(1L, 2L))
    // the filter must reach the file listing, not the row scan
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("p_date"), s"expected partition pruning, plan:\n$plan")
  }

  test("registerExternal creates an idempotent catalog table (main.py:314-349)") {
    val dir = Files.createTempDirectory("ext")
    Files.writeString(dir.resolve("t.json"), """{"x":1}""" + "\n" + """{"x":2}""" + "\n")
    Sources.registerExternal(spark, "ext_t", dir.toString, "NEWLINE_DELIMITED_JSON")
    Sources.registerExternal(spark, "ext_t", dir.toString, "json") // exists_ok
    assert(spark.table("ext_t").count() == 2)
    spark.sql("DROP TABLE ext_t")
  }

  test("table(): every testdata table satisfies its layout contract") {
    // the guard itself runs inside table(); a contract violation throws
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings", "events")) {
      val df = Sources.table(spark, "/root/testdata/sf0.001", t)
      assert(df.columns.nonEmpty, t)
    }
    // events.ts normalizes to epoch-µs BIGINT whatever the parquet layout
    val ev = Sources.table(spark, "/root/testdata/sf0.001", "events")
    assert(ev.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType)
  }

  test("table(): layout drift fails AT LOAD with a named per-column diff") {
    // doctored 'documents': n_chars re-typed to string, source dropped,
    // an unexpected column added — the round-8 events break, generalized
    val dir = Files.createTempDirectory("drift").toString
    Sources.table(spark, "/root/testdata/sf0.001", "documents")
      .selectExpr("doc_id", "text", "lang", "cast(n_chars AS string) AS n_chars",
        "1 AS extra_col")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalStateException] {
      Sources.table(spark, dir, "documents")
    }
    assert(e.getMessage.contains("layout drift in 'documents'"))
    assert(e.getMessage.contains("n_chars: want integral, got string"))
    assert(e.getMessage.contains("source: missing"))
    assert(e.getMessage.contains("extra_col: unexpected"))
    // unknown table names are NOT the loader's contract — pass through
    spark.read.parquet(s"$dir/documents.parquet")
      .write.mode("overwrite").parquet(s"$dir/oddtable.parquet")
    assert(Sources.table(spark, dir, "oddtable").columns.contains("extra_col"))
  }
}
