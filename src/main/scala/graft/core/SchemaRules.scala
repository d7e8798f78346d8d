package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Schema-level re-expression of the reference's ingest-time transforms.
  *
  * The reference sanitizes identifiers by rewriting whole data files
  * (main.py:191-262 JSON, main.py:265-311 CSV) — O(data). Spark-side the
  * same observable result is a pure schema transform plus a projection —
  * O(schema) — which also survives 100 TB inputs (nothing is rewritten,
  * the rename happens in the scan projection).
  *
  * Type allowlist mirrors convert_schema (gcp_function.py:169-222):
  * primitives String/Int/Long/Double/Boolean/Timestamp + arbitrarily nested
  * structs + arrays thereof; Map/Decimal/Date/Binary/etc rejected
  * (gcp_function.py:205,220). We use TimestampType uniformly (the
  * reference's DATETIME-vs-TIMESTAMP array inconsistency at
  * gcp_function.py:203/218 is a latent defect we do not reproduce —
  * SURVEY.md §2.1 defect 3).
  */
object SchemaRules {

  /** Recursively sanitize every field name. Last-wins on collisions,
    * matching Python dict-insert semantics (main.py:225).
    */
  def sanitizeSchema(schema: StructType): StructType =
    sanitizeType(schema).asInstanceOf[StructType]

  private def sanitizeType(dt: DataType): DataType = dt match {
    case st: StructType =>
      // last-wins: later field with a colliding sanitized name replaces
      // the earlier one, preserving the position of the *first* occurrence
      // is NOT what Python dicts do — re-assigning an existing key keeps
      // the original position but the new value. Mirror that exactly.
      val out = scala.collection.mutable.LinkedHashMap.empty[String, StructField]
      st.fields.foreach { f =>
        val name = Names.sanitizeName(f.name)
        out.put(name, StructField(name, sanitizeType(f.dataType), nullable = true))
      }
      StructType(out.values.toArray)
    case ArrayType(elem, _) => ArrayType(sanitizeType(elem), containsNull = true)
    case other              => other
  }

  /** True iff the schema needs any renaming at any depth. */
  def needsSanitization(schema: StructType): Boolean = {
    def chk(dt: DataType): Boolean = dt match {
      case st: StructType =>
        st.fields.exists(f => Names.sanitizeName(f.name) != f.name || chk(f.dataType))
      case ArrayType(e, _) => chk(e)
      case _               => false
    }
    chk(schema)
  }

  /** Apply [[sanitizeSchema]] to a DataFrame: top-level columns renamed,
    * nested structs/arrays rebuilt via cast (a zero-copy projection —
    * Catalyst folds the cast into the scan when names already align).
    */
  def sanitizeColumns(df: DataFrame): DataFrame = {
    val target = sanitizeSchema(df.schema)
    if (target == df.schema) df
    else {
      // Collisions drop columns (last-wins), so select by sanitized target:
      // for each surviving target field pick the LAST source field that
      // sanitizes to its name, cast to the sanitized nested type.
      val bySan = df.schema.fields.zipWithIndex
        .groupBy { case (f, _) => Names.sanitizeName(f.name) }
        .map { case (k, v) => k -> v.maxBy(_._2)._1 }
      val cols: Array[Column] = target.fields.map { tf =>
        val src = bySan(tf.name)
        val c = col("`" + src.name.replace("`", "``") + "`")
        val casted = if (src.dataType == tf.dataType) c else c.cast(tf.dataType)
        casted.as(tf.name)
      }
      df.select(cols.toIndexedSeq: _*)
    }
  }

  /** Type allowlist check (gcp_function.py:169-222). Returns the offending
    * type description, or None if supported.
    */
  def unsupportedType(dt: DataType): Option[String] = dt match {
    case _: StringType | _: IntegerType | _: LongType | _: DoubleType |
        _: BooleanType | _: TimestampType => None
    case st: StructType =>
      st.fields.view.flatMap(f => unsupportedType(f.dataType)).headOption
    case ArrayType(e, _) => unsupportedType(e)
    case other           => Some(other.simpleString)
  }

  /** Validate a full schema, throwing like convert_schema's ValueError
    * (gcp_function.py:205,220) on unsupported types.
    */
  def requireSupported(schema: StructType): Unit =
    unsupportedType(schema).foreach { t =>
      throw new IllegalArgumentException(s"Unsupported data type: $t")
    }
}
