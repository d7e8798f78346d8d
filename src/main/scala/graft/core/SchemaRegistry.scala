package graft.core

import org.apache.spark.sql.types._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Per-table schema + merge-key registry.
  *
  * Re-expression of the reference's `schema.json` registry
  * (gcp_function.py:47-64 load, gcp_function.py:225-272 append/update):
  * each table maps to `{schema, on_condition_columns}`. The reference
  * serializes BigQuery `SchemaField` API-repr JSON; we serialize Spark's
  * native `StructType.json` (DataType.fromJson round-trip) — same
  * information, no BQ vocabulary needed. Update semantics mirror
  * append_bq_schema_to_json: merge with the existing file, replacing the
  * entry for the same table (gcp_function.py:255-264).
  */
final case class TableSchemaEntry(schema: StructType, keyColumns: Seq[String]) {
  def columnNames: Seq[String] = schema.fields.map(_.name).toSeq // gcp_function.py:63
}

final class SchemaRegistry(path: String) {

  /** Load one table's entry (gcp_function.py:47-64). */
  def load(tableName: String): Option[TableSchemaEntry] = loadAll().get(tableName)

  /** Load the whole registry file; empty map if absent. */
  def loadAll(): Map[String, TableSchemaEntry] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) Map.empty
    else parse(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
  }

  /** Append-or-replace a table entry, merging with the existing file
    * (gcp_function.py:255-264). Validates the type allowlist first, like
    * convert_schema's ValueError (gcp_function.py:205,220).
    */
  def save(tableName: String, schema: StructType, keyColumns: Seq[String]): Unit = {
    SchemaRules.requireSupported(schema)
    val all = loadAll() + (tableName -> TableSchemaEntry(schema, keyColumns))
    val json = all.toSeq.sortBy(_._1).map { case (name, e) =>
      val keys = e.keyColumns.map(k => "\"" + jsonEscape(k) + "\"").mkString("[", ",", "]")
      "\"" + jsonEscape(name) + "\":{\"schema\":" + e.schema.json +
        ",\"on_condition_columns\":" + keys + "}"
    }.mkString("{", ",", "}")
    // atomic write: temp file + move, so a crashed writer never corrupts
    // the registry other readers depend on
    val p = Paths.get(path)
    val tmp = Paths.get(path + ".tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  // -- minimal JSON handling (no external deps; registry files are ours) --

  private def jsonEscape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def parse(text: String): Map[String, TableSchemaEntry] = {
    // The registry is machine-written by `save`; parse with Spark's JSON
    // mapper (jackson ships with Spark) for robustness.
    import com.fasterxml.jackson.databind.ObjectMapper
    import scala.jdk.CollectionConverters._
    val mapper = new ObjectMapper()
    val root = mapper.readTree(text)
    root.properties().asScala.map { e =>
      val name = e.getKey
      val node = e.getValue
      val schema = DataType.fromJson(node.get("schema").toString).asInstanceOf[StructType]
      val keys = node.get("on_condition_columns").elements().asScala
        .map(_.asText()).toSeq
      name -> TableSchemaEntry(schema, keys)
    }.toMap
  }
}
