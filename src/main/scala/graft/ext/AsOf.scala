package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark has no built-in for.
  *
  * Each left row is enriched with the right row having the greatest
  * `rightTs` ≤ its `leftTs` within the same key group (LEFT semantics:
  * nulls when no prior right row). The classic uses: enrich events with
  * the dimension state that was current when the event happened, join
  * trades to the latest quote, attach a user's last purchase.
  *
  * Plan: tag both inputs, UNION them, and take a running
  * `last(payload, ignoreNulls)` over a window partitioned by key and
  * ordered by (ts, side) — right rows sort before left rows at equal
  * timestamps, which gives the inclusive (`rightTs` ≤ `leftTs`) match.
  * ONE shuffle on the key columns, no range cross-product, no
  * per-key driver loop: the same plan shape at 100 TB as at sf0.01.
  * (A naive range join is a cross-product per key; a broadcast-interval
  * approach caps the right side. The union-window form is the standard
  * scalable rewrite.)
  */
object AsOf {

  /** @param rightValueCols right columns to carry onto left rows (must
    *   not collide with left column names — rename on the way in);
    *   `keys` and timestamps are matched by the given column names.
    */
  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      rightValueCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one key column")
    val reserved = (left.columns ++ right.columns).filter(_.startsWith("_asof_"))
    require(reserved.isEmpty,
      s"column names starting with _asof_ are reserved by joinAsOf: ${reserved.mkString(",")}")
    val payload = struct(rightValueCols.map(col): _*)
    // side 0 = right, 1 = left: right first at equal ts → inclusive match
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTsCol).as("_asof_ts"),
        payload.as("_asof_payload"),
        lit(0).as("_asof_side")): _*)
    val l = left
      .withColumn("_asof_ts", col(leftTsCol))
      .withColumn("_asof_side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // the trailing payload sort key makes the order TOTAL when several
    // right rows share (keys, ts): last() then deterministically picks
    // the greatest payload struct instead of an arbitrary tied row
    // (requires orderable right value types — arrays/doubles/strings ok)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_asof_ts"), col("_asof_side"), col("_asof_payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val enriched = unioned
      .withColumn("_asof_match", last(col("_asof_payload"), ignoreNulls = true).over(w))
      .filter(col("_asof_side") === 1)
    val out = left.columns.map(col) ++
      rightValueCols.map(c => col("_asof_match").getField(c).as(c))
    enriched.select(out.toIndexedSeq: _*)
  }
}
