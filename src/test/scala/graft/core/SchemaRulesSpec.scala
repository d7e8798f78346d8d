package graft.core

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class SchemaRulesSpec extends SparkSpec {

  private val dirty = StructType(Seq(
    StructField("business id", StringType),
    StructField("attributes", StructType(Seq(
      StructField("Wi-Fi", StringType),
      StructField("BusinessParking", StructType(Seq(
        StructField("street", BooleanType),
        StructField("2valet", BooleanType)))),
    ))),
    StructField("hours", ArrayType(StructType(Seq(
      StructField("day", StringType),
      StructField("open@", StringType))))),
    StructField("categories", ArrayType(StringType)),
  ))

  test("sanitizeSchema renames at every depth (main.py:215-230)") {
    val s = SchemaRules.sanitizeSchema(dirty)
    assert(s.fieldNames.toSeq == Seq("business_id", "attributes", "hours", "categories"))
    val attrs = s("attributes").dataType.asInstanceOf[StructType]
    assert(attrs.fieldNames.toSeq == Seq("Wi_Fi", "BusinessParking"))
    val parking = attrs("BusinessParking").dataType.asInstanceOf[StructType]
    assert(parking.fieldNames.toSeq == Seq("street", "_2valet"))
    val hours = s("hours").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    assert(hours.fieldNames.toSeq == Seq("day", "open_"))
  }

  test("collision last-wins like Python dict insert (main.py:225)") {
    val coll = StructType(Seq(
      StructField("a b", IntegerType),
      StructField("a_b", StringType)))
    val s = SchemaRules.sanitizeSchema(coll)
    assert(s.fields.length == 1)
    assert(s.fields.head.name == "a_b")
    assert(s.fields.head.dataType == StringType) // later field's type wins
  }

  test("needsSanitization detects nested dirt only when present") {
    assert(SchemaRules.needsSanitization(dirty))
    assert(!SchemaRules.needsSanitization(SchemaRules.sanitizeSchema(dirty)))
  }

  test("sanitizeColumns rewrites a DataFrame's nested data intact") {
    val rows = Seq(Row("b1", Row("free", Row(true, false)),
      Seq(Row("Mon", "8:00")), Seq("Food", "Coffee")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), dirty)
    val out = SchemaRules.sanitizeColumns(df)
    assert(out.schema == SchemaRules.sanitizeSchema(dirty))
    val r = out.collect().head
    assert(r.getString(0) == "b1")
    assert(r.getStruct(1).getStruct(1).getBoolean(0))
    assert(r.getSeq[Row](2).head.getString(1) == "8:00")
  }

  test("type allowlist rejects Map/Decimal/Date/Binary (gcp_function.py:205,220)") {
    assert(SchemaRules.unsupportedType(MapType(StringType, StringType)).isDefined)
    assert(SchemaRules.unsupportedType(DecimalType(10, 2)).isDefined)
    assert(SchemaRules.unsupportedType(DateType).isDefined)
    assert(SchemaRules.unsupportedType(BinaryType).isDefined)
    assert(SchemaRules.unsupportedType(
      ArrayType(MapType(StringType, IntegerType))).isDefined)
    assert(SchemaRules.unsupportedType(StringType).isEmpty)
    assert(SchemaRules.unsupportedType(dirty).isEmpty)
    intercept[IllegalArgumentException] {
      SchemaRules.requireSupported(StructType(Seq(
        StructField("m", MapType(StringType, StringType)))))
    }
  }
}
