package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data profiling — the health check an ingest pipeline
  * runs before trusting a landed table (null rates, cardinalities,
  * value ranges), kin to the reference's schema-validation posture at
  * registration time (main.py:333-344: autodetect must produce
  * columns) but over the DATA, not just the schema.
  *
  * Scale shape: ONE scan. All per-column aggregates (row count, null
  * counts, distinct counts, min/max) compute in a single aggregate
  * node; the multi-column distincts plan as one Expand (×|cols| rows)
  * feeding a two-stage hash aggregate — map-side partials bound the
  * exchange at O(partitions · Σ distinct), and nothing is collected.
  * The one-row wide result is then unpivoted to the (col_name, …) long
  * form with a literal stack — driver-free, output |cols| rows.
  *
  * Determinism: counts are exact integers; min/max are exact value
  * picks rendered as strings (binary UTF8 ordering on both engines for
  * ASCII data). Profile numeric DOUBLE columns with care — their
  * string rendering differs across engines (not used by the declared
  * key, which profiles integer/string columns only).
  */
object Profile {

  /** One row per profiled column: n_rows, n_nulls, n_distinct,
    * min/max (as strings), ordered by column name.
    */
  def profileTable(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    val aggs =
      count(lit(1)).as("_n") +:
        cols.flatMap { c =>
          Seq(
            sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_null_$c"),
            countDistinct(col(c)).as(s"_dist_$c"),
            min(col(c)).cast("string").as(s"_min_$c"),
            max(col(c)).cast("string").as(s"_max_$c"))
        }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = cols.sorted.map { c =>
      s"'$c', _null_$c, _dist_$c, _min_$c, _max_$c"
    }.mkString(s"stack(${cols.size}, ", ", ", ")")
    wide.select(col("_n").as("n_rows"),
        expr(s"$stackExpr AS (col_name, n_nulls, n_distinct, min_value, max_value)"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
      .orderBy("col_name")
  }
}
