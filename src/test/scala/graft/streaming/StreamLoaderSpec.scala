package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.nio.file.Files

case class Change(k: Long, name: String, v: Double, seq: Long)

class StreamLoaderSpec extends SparkSpec {

  test("changelog stream upserts into the target across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    dropWithLocation("stream_merge_target")
    // initial full load
    Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "name", "v")
      .write.saveAsTable("stream_merge_target")
    val ckpt = Files.createTempDirectory("sl_ckpt").toString
    val input = MemoryStream[Change]
    val q = StreamLoader.startMerge(
      input.toDF(), "stream_merge_target", Seq("k"), "seq", ckpt)
    try {
      // batch 1: update k=2, insert k=3
      input.addData(Change(2L, "b2", 2.2, 10L), Change(3L, "c", 3.0, 11L))
      q.processAllAvailable()
      // the sink rewrites the table from the stream's cloned session;
      // this session must refresh before reading (normal cross-session
      // table-rewrite visibility in Spark)
      spark.catalog.refreshTable("stream_merge_target")
      val after1 = spark.table("stream_merge_target").orderBy("k").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      assert(after1 == Seq((1L, "a", 1.0), (2L, "b2", 2.2), (3L, "c", 3.0)))
      // batch 2: two changes to the SAME key — the later seq wins
      input.addData(Change(3L, "c-old", 3.1, 20L), Change(3L, "c-new", 3.9, 21L),
        Change(4L, "d", 4.0, 22L))
      q.processAllAvailable()
      spark.catalog.refreshTable("stream_merge_target")
      val after2 = spark.table("stream_merge_target").orderBy("k").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      assert(after2 == Seq((1L, "a", 1.0), (2L, "b2", 2.2),
        (3L, "c-new", 3.9), (4L, "d", 4.0)))
    } finally q.stop()
    spark.sql("DROP TABLE IF EXISTS stream_merge_target")
  }

  test("compactLatest keeps one row per key, greatest seq wins") {
    import spark.implicits._
    val batch = Seq(
      Change(1L, "x1", 1.0, 5L), Change(1L, "x2", 1.5, 9L),
      Change(2L, "y", 2.0, 1L)).toDF()
    val out = StreamLoader.compactLatest(batch, Seq("k"), "seq")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "x2"), (2L, "y")))
  }
}
