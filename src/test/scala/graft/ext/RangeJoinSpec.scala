package graft.ext

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {

  test("selfOverlapPairs finds exactly the overlapping pairs, any bin width") {
    import spark.implicits._
    val iv = Seq(
      (1L, 0L, 100L),     // overlaps 2 (partial), 3 (touch at 100)
      (2L, 50L, 80L),     // inside 1
      (3L, 100L, 200L),   // touches 1 at a point
      (4L, 300L, 400L))   // disjoint
      .toDF("id", "start_ts", "end_ts")
    for (bin <- Seq(10L, 64L, 1000L)) { // result must not depend on the bin
      val out = RangeJoin.selfOverlapPairs(iv, binMicros = bin).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(out.keySet == Set((1L, 2L), (1L, 3L)), s"bin=$bin")
      assert(out((1L, 2L)) == 30L) // 80 - 50
      assert(out((1L, 3L)) == 0L)  // point touch
    }
  }

  test("pairs that meet in several bins are emitted once") {
    import spark.implicits._
    val iv = Seq((1L, 0L, 1000L), (2L, 0L, 1000L)).toDF("id", "start_ts", "end_ts")
    val out = RangeJoin.selfOverlapPairs(iv, binMicros = 10L).collect()
    assert(out.length == 1) // 101 shared bins, one pair
    assert(out.head.getLong(2) == 1000L)
  }

  test("sessionOverlaps: cross-user concurrency, no same-user pairs") {
    import spark.implicits._
    val min = 60L * 1000000
    // user 1 session [0, 10min]; user 2 session [5min, 15min] overlap 5min;
    // user 1's SECOND session (2h later) never pairs with its first
    val events = Seq(
      (1L, 0L, 1L, "c", 1.0, "{}"), (2L, 10 * min, 1L, "c", 1.0, "{}"),
      (3L, 5 * min, 2L, "c", 1.0, "{}"), (4L, 15 * min, 2L, "c", 1.0, "{}"),
      (5L, 120 * min, 1L, "c", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = RangeJoin.sessionOverlaps(events).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 1000001L && out.head.getLong(1) == 2000001L)
    assert(out.head.getLong(2) == 5 * min)
  }
}
