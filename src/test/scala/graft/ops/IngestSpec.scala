package graft.ops

import graft.SparkSpec
import graft.core.SchemaRegistry
import org.apache.spark.sql.types._

import java.nio.file.Files

class IngestSpec extends SparkSpec {

  test("E1 pipeline: discover → register → query with sanitized names") {
    val dir = Files.createTempDirectory("ingest")
    Files.createDirectories(dir.resolve("sub"))
    Files.writeString(dir.resolve("yelp business.json"),
      """{"business id":"b1","stars":4.5}""" + "\n" +
        """{"business id":"b2","stars":3.0}""" + "\n")
    Files.writeString(dir.resolve("sub/2readings.csv"),
      "Date,Max TemperatureF\n2012-01-01,62\n")
    val db = "stg_spec"
    val out = Ingest.run(spark, dir.toString, db)
    assert(out.failures.isEmpty)
    assert(out.tables.map(_.table).sorted ==
      Seq(s"$db.t_2readings", s"$db.yelp_business"))
    val biz = Ingest.readTable(spark, s"$db.yelp_business")
    assert(biz.schema.fieldNames.contains("business_id"))
    assert(biz.count() == 2)
    val csv = Ingest.readTable(spark, s"$db.t_2readings")
    assert(csv.schema.fieldNames.toSeq == Seq("Date", "Max_TemperatureF"))
    // idempotent re-run (exists_ok, main.py:343)
    Ingest.run(spark, dir.toString, db)
    spark.sql(s"DROP DATABASE $db CASCADE")
  }

  test("one bad file never aborts the batch (main.py:182-186,400-427)") {
    val dir = Files.createTempDirectory("ingest_ft")
    Files.writeString(dir.resolve("good one.json"),
      """{"a":1}""" + "\n" + """{"a":2}""" + "\n")
    Files.writeString(dir.resolve("empty.json"), "") // uninferable → fails
    Files.writeString(dir.resolve("also good.csv"), "x,y\n1,2\n")
    val db = "stg_ft"
    val out = Ingest.run(spark, dir.toString, db)
    assert(out.tables.map(_.table).sorted ==
      Seq(s"$db.also_good", s"$db.good_one"))
    assert(out.errorCount == 1)
    assert(out.failures.head.path.endsWith("empty.json"))
    assert(out.failures.head.error.nonEmpty)
    assert(Ingest.readTable(spark, s"$db.good_one").count() == 2)
    spark.sql(s"DROP DATABASE $db CASCADE")
  }

  test("explicit schema disables autodetect and rescues uninferable files (main.py:333-335)") {
    val dir = Files.createTempDirectory("ingest_sch")
    Files.writeString(dir.resolve("empty feed.json"), "") // no rows to infer from
    Files.writeString(dir.resolve("nums.csv"), "id,amount\n1,2.5\n")
    val db = "stg_sch"
    val declared = StructType(Seq(
      StructField("k", LongType), StructField("label", StringType)))
    val csvSchema = StructType(Seq(
      StructField("id", StringType), StructField("amount", StringType)))
    val out = Ingest.run(spark, dir.toString, db,
      schemas = Map("empty_feed" -> declared, "nums" -> csvSchema))
    assert(out.failures.isEmpty) // the empty file registers under its declared shape
    val ef = spark.table(s"$db.empty_feed")
    assert(ef.schema == declared)
    assert(ef.count() == 0)
    // CSV: declared STRING schema wins over what inference would type
    val nums = spark.table(s"$db.nums")
    assert(nums.schema == csvSchema)
    assert(nums.collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("1", "2.5")))
    spark.sql(s"DROP DATABASE $db CASCADE")
  }

  test("O19 dispatcher: Create then Update merge via registry keys") {
    import spark.implicits._
    val reg = new SchemaRegistry(
      Files.createTempDirectory("reg").resolve("schema.json").toString)
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    reg.save("disp_target", schema, Seq("k"))
    val warehouse = spark
    Loader.load(spark, Loader.Create,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "disp_target", reg)
    assert(spark.table("disp_target").count() == 2)
    Loader.load(spark, Loader.Update,
      Seq((2L, "b2"), (3L, "c")).toDF("k", "v"), "disp_target", reg)
    val rows = spark.table("disp_target").orderBy("k").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b2"), (3L, "c")))
    // staging table cleaned up (gcp_function.py:112)
    assert(!spark.catalog.tableExists("disp_target_temp"))
    // empty update is a no-op (gcp_function.py:156)
    Loader.load(spark, Loader.Update,
      Seq.empty[(Long, String)].toDF("k", "v"), "disp_target", reg)
    assert(spark.table("disp_target").count() == 3)
    spark.sql("DROP TABLE disp_target")
  }
}
