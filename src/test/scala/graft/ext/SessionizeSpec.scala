package graft.ext

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {

  test("30-min gap rule splits sessions per user; exact session numbering") {
    import spark.implicits._
    val min = 60L * 1000000 // µs per minute
    val events = Seq(
      // user 1: events at t=0, +10min, +50min (gap>30 → new session), +55min
      (101L, 0L * min, 1L), (102L, 10L * min, 1L),
      (103L, 60L * min, 1L), (104L, 65L * min, 1L),
      // user 2: single session, exactly-30min gap does NOT split (> rule)
      (201L, 0L * min, 2L), (202L, 30L * min, 2L),
      // user 3: single event
      (301L, 5L * min, 3L),
    ).toDF("event_id", "ts", "user_id")
      .selectExpr("event_id", "ts", "user_id", "'click' AS event_type",
        "1.0 AS value", "'{}' AS props")
    val got = Sessionize.sessionize(events).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(
      101L -> 1L, 102L -> 1L, 103L -> 2L, 104L -> 2L,
      201L -> 1L, 202L -> 1L,
      301L -> 1L))
  }

  test("sessionStats: one-row rollup recomputes from the sessionize output") {
    val events = graft.io.Sources.table(spark, "/root/testdata/sf0.001", "events")
    val out = Sessionize.sessionStats(events).collect().head
    val sess = Sessionize.sessionize(events).collect()
      .map(r => ((r.getLong(1), r.getLong(3)), r.getLong(2)))
    val groups = sess.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(out.getLong(0) == groups.size)
    assert(out.getLong(1) == groups.keySet.map(_._1).size)
    assert(out.getLong(2) == sess.length)
    val durations = groups.values.map(ts => ts.max - ts.min)
    assert(out.getLong(4) == durations.sum)
    assert(out.getLong(5) == durations.max)
    val wantAvg = math.rint(sess.length.toDouble / groups.size * 1e4) / 1e4
    assert(math.abs(out.getDouble(3) - wantAvg) < 1e-9)
  }

  test("sessionization covers every input row exactly once") {
    val events = graft.io.Sources.table(spark, "/root/testdata/sf0.001", "events")
    val out = Sessionize.sessionize(events)
    assert(out.count() == events.count())
    assert(out.select("event_id").distinct().count() == events.count())
  }
}
