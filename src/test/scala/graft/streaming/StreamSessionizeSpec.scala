package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamSessionizeSpec extends SparkSpec {
  import StreamSessionize.{sessionize, windowedCounts}

  private val min = 60L * 1000000

  test("streaming sessionize matches the batch gap rule across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = sessionize(input.toDS())
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: user 1 two events 10min apart → one session
      input.addData(
        Event(101L, 0L, 1L, "c", 1.0, "{}"),
        Event(102L, 10 * min, 1L, "c", 1.0, "{}"))
      q.processAllAvailable()
      // batch 2: user 1 again 50min after last → NEW session (state
      // carried across batches); user 2 first event → session 1
      input.addData(
        Event(103L, 60 * min, 1L, "c", 1.0, "{}"),
        Event(201L, 0L, 2L, "c", 1.0, "{}"))
      q.processAllAvailable()
      val got = spark.table("sess_out").collect()
        .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("session_seq")).toMap
      assert(got == Map(101L -> 1L, 102L -> 1L, 103L -> 2L, 201L -> 1L))
    } finally q.stop()
  }

  test("streaming sessionize orders events inside a micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = sessionize(input.toDS())
      .writeStream.format("memory").queryName("sess_out2")
      .outputMode(OutputMode.Append()).start()
    try {
      // out-of-order arrival within the batch: 50min event before 0min
      input.addData(
        Event(302L, 50 * min, 3L, "c", 1.0, "{}"),
        Event(301L, 0L, 3L, "c", 1.0, "{}"))
      q.processAllAvailable()
      val got = spark.table("sess_out2").collect()
        .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("session_seq")).toMap
      assert(got == Map(301L -> 1L, 302L -> 2L)) // sorted by ts first
    } finally q.stop()
  }

  test("streaming dedup drops within-watermark duplicates across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import StreamSessionize.dedupStream
    val input = MemoryStream[Event]
    val q = dedupStream(input.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1L, 0L, 1L, "c", 1.0, "{}"),
        Event(1L, 0L, 1L, "c", 1.0, "{}"), // in-batch dup
        Event(2L, 1 * min, 1L, "c", 1.0, "{}"))
      q.processAllAvailable()
      input.addData(Event(1L, 2 * min, 1L, "c", 1.0, "{}")) // cross-batch dup
      q.processAllAvailable()
      val ids = spark.table("dedup_out").collect().map(_.getAs[Long]("event_id"))
      assert(ids.sorted.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("watermarked windowed counts aggregate per window and type") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = windowedCounts(input.toDF())
      .writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1L, 1 * min, 1L, "click", 1.0, "{}"),
        Event(2L, 2 * min, 2L, "click", 2.0, "{}"),
        Event(3L, 6 * min, 1L, "view", 3.0, "{}"))
      q.processAllAvailable()
      // advance watermark far enough to close the first windows
      input.addData(Event(9L, 120 * min, 9L, "click", 0.0, "{}"))
      q.processAllAvailable()
      val rows = spark.table("win_out").collect()
      val clicks = rows.filter(_.getAs[String]("event_type") == "click")
        .filter(_.getAs[Long]("n") == 2L)
      assert(clicks.nonEmpty) // first 5-min window closed with both clicks
      assert(clicks.head.getAs[Double]("sum_value") == 3.0)
    } finally q.stop()
  }
}
