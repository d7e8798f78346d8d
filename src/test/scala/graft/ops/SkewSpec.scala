package graft.ops

import graft.SparkSpec

class SkewSpec extends SparkSpec {

  test("salted join returns exactly the plain-join result on skewed keys") {
    import spark.implicits._
    // 90% of the big side hits key 1 (the hot key)
    val big = ((1 to 900).map(i => (1L, s"row$i")) ++
      (1 to 100).map(i => (1L + i % 7, s"tail$i"))).toDF("k", "payload")
    val small = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).orderBy("k", "payload")
      .collect().map(_.toSeq).toSeq
    val salted = Skew.saltedJoin(big, small, Seq("k"), buckets = 8)
      .orderBy("k", "payload").collect().map(_.toSeq).toSeq
    assert(salted == plain)
  }

  test("left joins preserve unmatched rows through salting") {
    import spark.implicits._
    val big = Seq((1L, "a"), (9L, "unmatched")).toDF("k", "payload")
    val small = Seq((1L, "one")).toDF("k", "name")
    val out = Skew.saltedJoin(big, small, Seq("k"), buckets = 4, joinType = "left")
      .orderBy("k").collect()
    assert(out.length == 2)
    assert(out(1).getString(1) == "unmatched" && out(1).isNullAt(2))
  }
}
