package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract: a typo'd oracle key or a missing ORDER
  * BY silently zeroes a round's correctness signal, so the contract is
  * spec-enforced.
  */
class QueryContractSpec extends AnyFunSuite {

  test("every oracle key has a matching query key") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every oracle ends in a total ORDER BY (driver hashes row order)") {
    val missing = SparkEntry.oracleSql.collect {
      case (k, sql) if !sql.toUpperCase.contains("ORDER BY") => k
    }
    assert(missing.isEmpty, s"oracles missing ORDER BY: $missing")
  }

  test("declared surface matches the documented round-8 inventory") {
    // r8: similarity_ivf_trained_embeddings gained a DuckDB oracle
    // (portable Lloyd unrolled in SQL) and corpus_summary_approx joined
    // as the one declared no-oracle key (HLL/quantile sketches are not
    // bit-compatible across engines; golden-pinned + error-bound spec)
    assert(SparkEntry.queries.size == 107,
      s"query count drifted: ${SparkEntry.queries.size} (update SURVEY §2.11 if intentional)")
    assert(SparkEntry.oracleSql.size == 106,
      s"oracle count drifted: ${SparkEntry.oracleSql.size} (update SURVEY §2.11 if intentional)")
  }

  test("no query key collides across catalog sections") {
    // bronze + merge + ext maps are ++-merged; a duplicate key would
    // silently shadow an earlier query
    val bronze = QueryCatalog.queries.keySet.filter(_.startsWith("bronze_"))
    val ext = ExtQueries.queries.keySet
    assert((bronze intersect ext).isEmpty)
  }
}
