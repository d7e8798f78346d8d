package graft.ext

import graft.SparkSpec

class DedupClustersSpec extends SparkSpec {

  private def docsDF(ids: Seq[Long]) = {
    import spark.implicits._
    ids.map(i => (i, s"text $i")).toDF("doc_id", "text")
  }

  private def pairsDF(ps: Seq[(Long, Long)]) = {
    import spark.implicits._
    ps.toDF("doc_id_a", "doc_id_b")
  }

  test("chains collapse transitively: a~b, b~c → one cluster") {
    val docs = docsDF(Seq(1L, 2L, 3L, 4L, 5L))
    val pairs = pairsDF(Seq((1L, 2L), (2L, 3L)))
    val got = DedupClusters.clusters(docs, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == got(2L) && got(2L) == got(3L))
    assert(got(1L) == 1L)           // min id labels the component
    assert(got(4L) == 4L && got(5L) == 5L) // singletons keep own id
  }

  test("dedupByClusters keeps exactly one representative per component") {
    val docs = docsDF(Seq(1L, 2L, 3L, 4L, 5L, 6L))
    val pairs = pairsDF(Seq((1L, 2L), (2L, 3L), (5L, 6L)))
    val kept = DedupClusters.dedupByClusters(docs, pairs).collect()
      .map(_.getLong(0)).toSeq
    assert(kept == Seq(1L, 4L, 5L))
  }

  test("clustersDF (hash-to-min) equals GraphX CC on random graphs") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 3) {
      val n = 60
      val docs = docsDF((1L to n))
      val edges = (1 to 50).map { _ =>
        val a = rnd.nextInt(n) + 1L
        val b = rnd.nextInt(n) + 1L
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      val pairs = pairsDF(edges)
      val viaGraphX = DedupClusters.clusters(docs, pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toSeq
      val viaDF = DedupClusters.clustersDF(docs, pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toSeq
      assert(viaDF == viaGraphX, s"trial $trial")
      graft.core.CacheScope.releaseAll()
    }
  }

  test("clustersDF converges on a long chain (diameter-bound iterations)") {
    // a 40-vertex path: worst diameter shape; hash-to-min still labels
    // the whole chain with the minimum id
    val n = 40L
    val docs = docsDF(1L to n)
    val pairs = pairsDF((1L until n).map(i => (i, i + 1)))
    val got = DedupClusters.clustersDF(docs, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(1L), s"chain not fully labeled: $got")
    graft.core.CacheScope.releaseAll()
  }

  test("minhash clustering groups exact copies end-to-end") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base), (2L, base), (3L, base),
      (4L, "совершенно other unrelated text with different vocabulary set"))
      .toDF("doc_id", "text")
    val got = DedupClusters.minHashClusters(docs, threshold = 0.9).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
    assert(got(4L) == 4L)
  }

  test("keep-quality dedup: best member wins, min-id ties, singletons pass") {
    import spark.implicits._
    // quality tiers as in the budget specs: stopword-rich text scores
    // high, punctuation soup scores low
    def rich(i: Int) = s"the quick brown fox jumps over the lazy dog near door $i"
    def poor(i: Int) = s"!!! ??? ,,, ;;; $i :::"
    val docs = Seq(
      (1L, poor(1)), (2L, rich(2)), (3L, poor(3)), // cluster {1,2,3}: 2 wins
      (4L, rich(4)), (5L, rich(4)),                // tie cluster: min id 4 wins
      (6L, poor(6)))                               // singleton
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'src' AS source")
    val pairs = pairsDF(Seq((1L, 2L), (2L, 3L), (4L, 5L)))
    val got = DedupClusters.dedupByClustersKeepQuality(docs, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toSeq
    assert(got.map(_._1) == Seq(2L, 4L, 6L),
      s"representatives must be best-quality, min-id on ties: $got")
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(2L)._2 == 1L && byId(2L)._3 == 3L, "cluster id/members of {1,2,3}")
    assert(byId(4L)._3 == 2L && byId(6L)._3 == 1L)
    // the kept quality IS the cluster max: doc 2 outscores its cluster
    assert(byId(2L)._4 > byId(6L)._4, "rich representative must outscore poor")
    graft.core.CacheScope.releaseAll()
  }
}
