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

  test("degenerate hot bin: 10k-pair flash crowd, result exact under salting") {
    import spark.implicits._
    // 150 concurrent intervals packed into ONE bin (a flash event): a
    // plain bin-join would put all 150·149/2 pairs in one task; the
    // salted block path must split the work AND keep the result exact.
    val iv = (1 to 150).map(i => (i.toLong, 10L + i, 500L + i))
      .toDF("id", "start_ts", "end_ts")
    val out = RangeJoin.selfOverlapPairs(iv, binMicros = 1000L,
      hotBinThreshold = 50, hotBinSplits = 4).collect()
    assert(out.length == 150 * 149 / 2)
    // spot-check an overlap value: ids i<j overlap [10+j, 500+i]
    val m = out.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m((3L, 7L)) == (500L + 3) - (10L + 7))
  }

  test("mixed hot/cold/long guards agree with brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // 80 short intervals in a hot region, 40 spread wide (cold bins),
    // 3 long intervals spanning > maxBinsPerInterval bins
    val rows =
      (1 to 80).map(i => (i.toLong, 1000L + rnd.nextInt(50), 1100L + rnd.nextInt(50))) ++
      (81 to 120).map(i => (i.toLong, i * 5000L, i * 5000L + 30)) ++
      Seq((121L, 0L, 900000L), (122L, 500L, 800000L), (123L, 700000L, 900001L))
    val expected = (for {
      x <- rows; y <- rows
      if x._1 < y._1 && x._2 <= y._3 && y._2 <= x._3
    } yield (x._1, y._1) -> (math.min(x._3, y._3) - math.max(x._2, y._2))).toMap
    val out = RangeJoin.selfOverlapPairs(
      rows.toDF("id", "start_ts", "end_ts"), binMicros = 100L,
      maxBinsPerInterval = 16, hotBinThreshold = 30, hotBinSplits = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == expected, s"got ${out.size} pairs, want ${expected.size}")
  }

  test("guard thresholds never change the result") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val iv = (1 to 60).map(i => (i.toLong, rnd.nextInt(500).toLong,
      500L + rnd.nextInt(500))).toDF("id", "start_ts", "end_ts")
    val base = RangeJoin.selfOverlapPairs(iv, binMicros = 50L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    for ((mb, hb, hs) <- Seq((2, 5, 2), (4, 10, 7), (1000, 100000, 1))) {
      val got = RangeJoin.selfOverlapPairs(iv, binMicros = 50L,
        maxBinsPerInterval = mb, hotBinThreshold = hb, hotBinSplits = hs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == base, s"guards ($mb,$hb,$hs) changed the result")
    }
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
