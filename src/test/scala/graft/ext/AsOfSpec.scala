package graft.ext

import graft.SparkSpec

class AsOfSpec extends SparkSpec {

  test("as-of join picks the latest right row at-or-before each left ts") {
    import spark.implicits._
    val left = Seq(
      (1L, 1L, 100L), (2L, 1L, 250L), (3L, 1L, 300L), // user 1
      (4L, 2L, 150L),                                 // user 2: no prior right
      (5L, 3L, 500L))                                 // user 3: right at same ts
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, 100L, "a"), (1L, 200L, "b"), (1L, 400L, "c"), // user 1 states
      (2L, 160L, "x"),                                   // user 2: only AFTER
      (3L, 500L, "y"))                                   // user 3: equal ts
      .toDF("user_id", "ts", "state")
    val out = AsOf.joinAsOf(left, right, Seq("user_id"), "ts", "ts", Seq("state"))
      .orderBy("event_id").collect()
      .map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(out == Map(
      1L -> Some("a"),   // exact match at 100
      2L -> Some("b"),   // 200 ≤ 250 < 400
      3L -> Some("b"),   // 300: still b
      4L -> None,        // right row is later than the event
      5L -> Some("y")))  // equal ts matches (inclusive)
  }

  test("tied right timestamps resolve deterministically to the greatest payload") {
    import spark.implicits._
    val left = Seq((1L, 1L, 100L)).toDF("event_id", "user_id", "ts")
    // three right rows share (user_id, ts): the orderBy's payload tie-
    // break must pick the same one every run (greatest struct = "c")
    val right = Seq((1L, 50L, "b"), (1L, 50L, "c"), (1L, 50L, "a"))
      .toDF("user_id", "ts", "state")
    (1 to 3).foreach { i =>
      val out = AsOf.joinAsOf(
        left.repartition(i), right.repartition(4 - i),
        Seq("user_id"), "ts", "ts", Seq("state")).collect()
      assert(out.length == 1 && out(0).getString(3) == "c", s"run $i")
    }
  }

  test("_asof_ column names are reserved and rejected up front") {
    import spark.implicits._
    val left = Seq((1L, 1L, 100L)).toDF("_asof_x", "user_id", "ts")
    val right = Seq((1L, 50L, "a")).toDF("user_id", "ts", "state")
    val e = intercept[IllegalArgumentException] {
      AsOf.joinAsOf(left, right, Seq("user_id"), "ts", "ts", Seq("state"))
    }
    assert(e.getMessage.contains("_asof_"))
  }

  test("multi-key as-of join and column carry-through") {
    import spark.implicits._
    val left = Seq((1L, "A", 1L, 10L), (2L, "B", 1L, 10L))
      .toDF("event_id", "region", "user_id", "ts")
    val right = Seq(("A", 1L, 5L, 1.5), ("B", 1L, 20L, 9.9))
      .toDF("region", "user_id", "ts", "score")
    val out = AsOf.joinAsOf(left, right, Seq("region", "user_id"), "ts", "ts",
      Seq("score")).orderBy("event_id").collect()
    assert(out(0).getDouble(4) == 1.5)  // (A,1): right at 5 ≤ 10
    assert(out(1).isNullAt(4))          // (B,1): right only at 20 > 10
  }
}
