package graft.core

/** Identifier sanitization rules of the reference ingest layer.
  *
  * Semantics (reference: main.py:215-230 for JSON keys, main.py:283-293 for
  * CSV headers, main.py:384-387 / 419-421 for table names):
  *   - every char outside `[a-zA-Z0-9_]` becomes `_`
  *   - if the first char is not a letter or `_`, prefix `_` (columns) or
  *     `t_` (tables)
  *
  * Pure functions over *names*, O(schema) not O(data) — Spark-side we never
  * rewrite files, we rename columns / rebuild the schema (see
  * [[SchemaRules.sanitizeSchema]]).
  */
object Names {
  private val Invalid = "[^a-zA-Z0-9_]".r

  private def clean(s: String): String = Invalid.replaceAllIn(s, "_")

  /** Column/field name sanitizer (main.py:220-223). Idempotent. */
  def sanitizeName(name: String): String = {
    val c = clean(name)
    if (c.isEmpty) "_"
    else if (isAsciiLetter(c.head) || c.head == '_') c
    else "_" + c
  }

  /** Table name sanitizer (main.py:384-387): `t_` prefix rule. Idempotent. */
  def sanitizeTableName(name: String): String = {
    val c = clean(name)
    if (c.isEmpty) "t_"
    else if (isAsciiLetter(c.head) || c.head == '_') c
    else "t_" + c
  }

  private def isAsciiLetter(ch: Char): Boolean =
    (ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z')

  /** Filename stem → table name (gcp_function.py:14-26 + main.py:384-387). */
  def tableNameForFile(path: String): String = {
    val base = path.split('/').last
    val stem = base.lastIndexOf('.') match {
      case -1 => base
      case i  => base.substring(0, i)
    }
    sanitizeTableName(stem)
  }
}
