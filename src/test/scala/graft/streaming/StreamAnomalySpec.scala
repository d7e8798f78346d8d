package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

case class AnomalyEvent(ts: Long, event_type: String)

class StreamAnomalySpec extends SparkSpec {

  private val day = 86400000000L

  test("streamed scores equal the batch operator's for identical counts") {
    val dir = "/root/testdata/sf0.001"
    val events = graft.io.Sources.table(spark, dir, "events")
    val stats = StreamAnomaly.referenceStats(events)
    // batch-mode scoreStream over the full history must reproduce
    // Analytics.dailyAnomaly exactly (same sums, same expression order)
    val viaFace = StreamAnomaly.scoreStream(events, stats)
      .orderBy("day_idx", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val viaBatch = graft.ext.Analytics.dailyAnomaly(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(viaFace.toSeq == viaBatch.toSeq)
  }

  test("micro-batched stream scores each window against the fixed reference") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // reference history: type 'a' averages 2/day over days 0-2
    val hist = Seq(
      AnomalyEvent(0L, "a"), AnomalyEvent(1L, "a"),
      AnomalyEvent(day, "a"), AnomalyEvent(day + 1, "a"), AnomalyEvent(day + 2, "a"),
      AnomalyEvent(2 * day, "a"))
      .toDF()
    val stats = StreamAnomaly.referenceStats(hist)
    val input = MemoryStream[AnomalyEvent]
    val q = StreamAnomaly.scoreStream(input.toDF(), stats)
      .writeStream.format("memory").queryName("stream_anomaly")
      .outputMode(OutputMode.Complete()).start()
    try {
      // a day with 5 'a' events: volume spike vs the 2/day reference
      input.addData((1 to 5).map(i => AnomalyEvent(10 * day + i, "a")): _*)
      q.processAllAvailable()
      val got = spark.table("stream_anomaly").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(got.length == 1)
      val (d, t, n, z) = got.head
      assert(d == 10L && t == "a" && n == 5L)
      // history: counts 2,3,1 → mean 2, var 2/3; z = (5-2)/sqrt(2/3)
      val want = math.rint((5.0 - 2.0) / math.sqrt(2.0 / 3.0) * 1e4) / 1e4
      assert(math.abs(z - want) < 1e-9, s"z=$z want=$want")
      // an unknown type scores nothing (no reference row → inner join)
      input.addData(AnomalyEvent(11 * day, "zz"))
      q.processAllAvailable()
      assert(spark.table("stream_anomaly")
        .filter($"event_type" === "zz").count() == 0)
    } finally q.stop()
  }
}
