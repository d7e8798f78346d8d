package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is too hot for AQE's
  * skew-join splitting (which only helps sort-merge joins and only when
  * partition-size stats expose the skew).
  *
  * Salting rewrites `big ⋈ small ON keys` as
  * `big+salt ⋈ (small × salts) ON keys+salt`: the hot key's rows spread
  * over `buckets` reducers at the cost of replicating the small side
  * ×buckets — the classic trade when one key holds a large fraction of
  * the rows (null-heavy foreign keys, celebrity users, default values).
  */
object Skew {

  /** Equi-join with a salted key. The salt on the big side derives
    * deterministically from the whole row (xxhash64 of all columns), so
    * re-runs produce identical partitioning — no rand() nondeterminism
    * under task retries.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      buckets: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(buckets)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    saltedBig.join(saltedSmall, keys :+ "__salt", joinType).drop("__salt")
  }
}
