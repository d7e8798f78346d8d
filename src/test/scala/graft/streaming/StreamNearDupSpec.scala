package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamNearDupSpec extends SparkSpec {

  private val base = "the quick brown fox jumps over the lazy dog again and again"
  private val other = "completely unrelated words about spark catalyst optimizer rules"

  test("near-dup arriving in a later micro-batch (within horizon) is tagged") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[StreamDoc]
    val q = StreamNearDup.nearDupTags(input.toDS(), threshold = 0.5)
      .writeStream.format("memory").queryName("neardup_tags")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(StreamDoc(1L, 0L, base), StreamDoc(2L, 1L, other))
      q.processAllAvailable()
      assert(spark.table("neardup_tags").count() == 0) // originals pass
      // a near-dup of doc 1 arrives a batch later: bucket state carried
      input.addData(StreamDoc(3L, 2L, base + " lambda"))
      q.processAllAvailable()
      val tags = spark.table("neardup_tags").collect()
      assert(tags.nonEmpty)
      assert(tags.forall(r => r.getAs[Long]("doc_id") == 3L
        && r.getAs[Long]("dup_of") == 1L))
      assert(tags.forall(_.getAs[Double]("est_jaccard") >= 0.5))
    } finally q.stop()
  }

  test("event-time horizon: near-dup within horizon tagged, after eviction admitted") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val hour = 3600L * 1000000 // µs
    val B = 1000 * hour        // a base well above the initial watermark (epoch)
    val input = MemoryStream[StreamDoc]
    val q = StreamNearDup.nearDupTags(input.toDS(), threshold = 0.5,
      eventTimeHorizon = Some("1 hour"))
      .writeStream.format("memory").queryName("neardup_evict")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(StreamDoc(1L, B, base))
      q.processAllAvailable()
      // within the horizon: a near-dup 30 min later is tagged
      input.addData(StreamDoc(2L, B + hour / 2, base + " lambda"))
      q.processAllAvailable()
      assert(spark.table("neardup_evict").collect()
        .map(_.getAs[Long]("doc_id")).toSet == Set(2L))
      // advance the watermark to B+2h (past doc 1/2's eviction timestamp
      // B+30min+1h), then confirm in-horizon detection still works
      input.addData(StreamDoc(3L, B + 3 * hour, other))
      q.processAllAvailable()
      input.addData(StreamDoc(4L, B + 3 * hour + 1, other + " okay"))
      q.processAllAvailable()
      assert(spark.table("neardup_evict").collect()
        .exists(r => r.getAs[Long]("doc_id") == 4L && r.getAs[Long]("dup_of") == 3L))
      // doc 5: above the watermark (B+2.5h > B+2h, so NOT late-filtered)
      // but the base docs' bucket state is evicted → admitted, not tagged
      input.addData(StreamDoc(5L, B + 5 * hour / 2, base))
      q.processAllAvailable()
      val tagged = spark.table("neardup_evict").collect()
        .map(_.getAs[Long]("doc_id")).toSet
      assert(!tagged.contains(5L), s"doc 5 should be admitted, got $tagged")
    } finally q.stop()
  }

  test("bucket overflow goes silent: no tagging against a truncated bucket") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[StreamDoc]
    val q = StreamNearDup.nearDupTags(input.toDS(), threshold = 0.5, maxBucket = 2)
      .writeStream.format("memory").queryName("neardup_overflow")
      .outputMode(OutputMode.Append()).start()
    try {
      // docs 1,2 fill the bucket (doc 2 tagged pre-overflow); 3 and 4
      // overflow it — batch would exclude the whole bucket, and append
      // mode can at least stop tagging from the overflow point on
      input.addData(StreamDoc(1L, 0L, base), StreamDoc(2L, 1L, base))
      q.processAllAvailable()
      input.addData(StreamDoc(3L, 2L, base), StreamDoc(4L, 3L, base))
      q.processAllAvailable()
      val tagged = spark.table("neardup_overflow").collect()
        .map(_.getAs[Long]("doc_id")).toSet
      assert(tagged == Set(2L),
        s"docs past the overflow must not be tagged, got $tagged")
    } finally q.stop()
  }

  test("an overflowed bucket re-arms after event-time eviction") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val hour = 3600L * 1000000 // µs
    val B = 1000 * hour
    val input = MemoryStream[StreamDoc]
    val q = StreamNearDup.nearDupTags(input.toDS(), threshold = 0.5,
      maxBucket = 2, eventTimeHorizon = Some("1 hour"))
      .writeStream.format("memory").queryName("neardup_rearm")
      .outputMode(OutputMode.Append()).start()
    try {
      // fill + overflow the base-text buckets → silent
      input.addData(StreamDoc(1L, B, base), StreamDoc(2L, B + 1, base))
      q.processAllAvailable()
      input.addData(StreamDoc(3L, B + 2, base), StreamDoc(4L, B + 3, base))
      q.processAllAvailable()
      // an unrelated-bucket arrival advances the watermark past the
      // overflowed buckets' eviction timestamps...
      input.addData(StreamDoc(10L, B + 4 * hour, other))
      q.processAllAvailable()
      // ...and the NEXT batch (no data for those buckets) fires their
      // timeout — the overflowed state is REMOVED, not kept silent
      input.addData(StreamDoc(11L, B + 4 * hour + 1, other + " okay"))
      q.processAllAvailable()
      // a fresh base-text pair lands in a fresh, ARMED bucket: tagged
      input.addData(StreamDoc(20L, B + 4 * hour + 2, base),
        StreamDoc(21L, B + 4 * hour + 3, base + " lambda"))
      q.processAllAvailable()
      val tags = spark.table("neardup_rearm").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dup_of"))).toSet
      assert(!tags.exists(t => t._1 == 3L || t._1 == 4L),
        s"overflow period must stay silent: $tags")
      assert(!tags.exists(_._1 == 20L), "first post-eviction doc is admitted")
      assert(tags.contains((21L, 20L)),
        s"dedup must re-arm after the quiet period: $tags")
    } finally q.stop()
  }

  test("replayed table: streaming survivors equal batch minHashDedup") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // corpus with exact dups, near dups, and distinct docs
    val docs = Seq(
      StreamDoc(1L, 0L, base),
      StreamDoc(2L, 1L, other),
      StreamDoc(3L, 2L, base),              // exact dup of 1
      StreamDoc(4L, 3L, base + " lambda"),  // near dup of 1
      StreamDoc(5L, 4L, "yet another separate document mentioning parquet columnar scans"),
      StreamDoc(6L, 5L, other + " okay"),   // near dup of 2
      StreamDoc(7L, 6L, "final distinct text with its very own vocabulary entirely"))
    val input = MemoryStream[StreamDoc]
    val q = StreamNearDup.nearDupTags(input.toDS(), threshold = 0.5)
      .writeStream.format("memory").queryName("neardup_replay")
      .outputMode(OutputMode.Append()).start()
    try {
      docs.grouped(3).foreach { batch =>  // replay across 3 micro-batches
        input.addData(batch: _*)
        q.processAllAvailable()
      }
      val tagged = spark.table("neardup_replay").collect()
        .map(_.getAs[Long]("doc_id")).toSet
      val streamSurvivors = docs.map(_.doc_id).filterNot(tagged).toSet
      val batchDF = docs.map(d => (d.doc_id, d.text)).toDF("doc_id", "text")
        .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source",
          "length(text) AS n_chars")
      val batchSurvivors = graft.ext.Dedup.minHashDedup(batchDF, threshold = 0.5)
        .collect().map(_.getLong(0)).toSet
      assert(streamSurvivors == batchSurvivors)
      // batch-side combine helper gives the same set
      val surv = StreamNearDup.survivors(
        batchDF, spark.table("neardup_replay")).collect().map(_.getLong(0)).toSet
      assert(surv == batchSurvivors)
    } finally q.stop()
  }
}
