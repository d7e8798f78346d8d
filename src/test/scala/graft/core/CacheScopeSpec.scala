package graft.core

import graft.SparkSpec

/** Lifecycle of operator-pinned caches: after a query's action completes
  * and the consumer calls releaseAll(), storage memory must return to
  * baseline — no cached blocks accumulate across queries (VERDICT r2 #1).
  */
class CacheScopeSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def cachedRddCount: Int =
    spark.sparkContext.getPersistentRDDs.size

  test("persist registers and releaseAll unpersists everything") {
    CacheScope.releaseAll() // clean slate (other specs share the session)
    val base = cachedRddCount
    import spark.implicits._
    val df = (1 to 100).toDF("n").transform(CacheScope.persist)
    val df2 = df.select(col("n") * 2 as "m").transform(CacheScope.persist)
    df.count(); df2.count() // materialize both
    assert(CacheScope.trackedCount == 2)
    assert(cachedRddCount >= base + 2)
    CacheScope.releaseAll()
    assert(CacheScope.trackedCount == 0)
    assert(cachedRddCount == base)
  }

  test("releaseAll is idempotent and safe on never-materialized plans") {
    import spark.implicits._
    (1 to 10).toDF("n").transform(CacheScope.persist) // never actioned
    CacheScope.releaseAll()
    CacheScope.releaseAll()
    assert(CacheScope.trackedCount == 0)
  }

  test("a full LSH query leaves no cached blocks after release") {
    CacheScope.releaseAll()
    spark.catalog.clearCache()
    val base = cachedRddCount
    import spark.implicits._
    val docs = (1 to 50).map(i => (i.toLong, s"some text body $i repeated " * 3))
      .toDF("doc_id", "text")
    val pairs = graft.ext.Dedup.minHashPairs(docs)
    pairs.count() // action — banded table materializes via CacheScope
    assert(CacheScope.trackedCount >= 1)
    CacheScope.releaseAll()
    assert(cachedRddCount == base,
      s"cached RDDs leaked: base=$base now=$cachedRddCount")
  }

  test("scoped releases on exit even when body throws") {
    import spark.implicits._
    intercept[RuntimeException] {
      CacheScope.scoped {
        val df = (1 to 10).toDF("n").transform(CacheScope.persist)
        df.count()
        throw new RuntimeException("boom")
      }
    }
    assert(CacheScope.trackedCount == 0)
  }
}
