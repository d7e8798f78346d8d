package graft.core

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class SchemaRegistrySpec extends AnyFunSuite {

  private val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_totalprice", DoubleType),
    StructField("tags", ArrayType(StringType)),
    StructField("meta", StructType(Seq(StructField("src", StringType)))),
  ))

  test("save/load round-trip (gcp_function.py:47-64, 225-272)") {
    val f = Files.createTempDirectory("reg").resolve("schema.json").toString
    val reg = new SchemaRegistry(f)
    reg.save("orders_fixture", ordersSchema, Seq("o_orderkey"))
    val e = reg.load("orders_fixture").get
    assert(e.schema == ordersSchema)
    assert(e.keyColumns == Seq("o_orderkey"))
    assert(e.columnNames == Seq("o_orderkey", "o_totalprice", "tags", "meta"))
  }

  test("save merges with existing entries, replacing same table (gcp_function.py:255-264)") {
    val f = Files.createTempDirectory("reg").resolve("schema.json").toString
    val reg = new SchemaRegistry(f)
    reg.save("a", ordersSchema, Seq("o_orderkey"))
    reg.save("b", StructType(Seq(StructField("x", IntegerType))), Seq("x"))
    reg.save("a", StructType(Seq(StructField("y", StringType))), Seq("y"))
    val all = reg.loadAll()
    assert(all.keySet == Set("a", "b"))
    assert(all("a").schema.fieldNames.toSeq == Seq("y"))
    assert(all("a").keyColumns == Seq("y"))
  }

  test("missing file/table behave gracefully") {
    val f = Files.createTempDirectory("reg").resolve("absent.json").toString
    val reg = new SchemaRegistry(f)
    assert(reg.loadAll().isEmpty)
    assert(reg.load("nope").isEmpty)
  }

  test("unsupported types rejected at save (gcp_function.py:205,220)") {
    val f = Files.createTempDirectory("reg").resolve("schema.json").toString
    val reg = new SchemaRegistry(f)
    intercept[IllegalArgumentException] {
      reg.save("bad", StructType(Seq(
        StructField("m", MapType(StringType, StringType)))), Seq("m"))
    }
  }
}
