package graft.streaming

import graft.SparkSpec
import graft.ext.{Bpe, Corpus}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamPackSequencesSpec extends SparkSpec {

  private def docsDF(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'src' AS source",
        "length(text) AS n_chars")
  }

  private val fixture: Seq[(Long, String)] = Seq(
    (1L, "alpha beta gamma delta " * 3),
    (2L, "epsilon zeta " * 40),
    (3L, "123 456 !!"), // zero letter-run tokens: no rows, no cursor move
    (4L, "eta theta iota kappa lambda " * 7),
    (5L, "mu nu xi"),
    (6L, "alpha beta " * 11))

  private val L = 32

  private def runStream(
      batches: Seq[Seq[(Long, String)]], shards: Int, name: String) = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mergeTable = Bpe.bpeVocab(docsDF(fixture))
    val input = MemoryStream[(Long, String)]
    val q = StreamPackSequences.packStream(
      input.toDF().toDF("doc_id", "text"), mergeTable, L, shards)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      (spark.table(name).orderBy("doc_id", "shard", "block_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSeq,
        q.lastProgress.stateOperators.map(_.numRowsTotal).sum)
    } finally q.stop()
  }

  private def batchRef: Seq[(Long, Int, Long, Long, Long)] =
    Corpus.packSequences(docsDF(fixture), blockTokens = L).collect()
      .map(r => (r.getLong(0), 0, r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("one micro-batch, one shard: equals the batch pack map row for row") {
    val (got, stateRows) = runStream(Seq(fixture), shards = 1, "ps_whole")
    assert(got == batchRef)
    assert(stateRows == 1L, "cursor state must be one row per shard")
  }

  test("doc_id-ordered micro-batch split: blocks straddle the boundary unchanged") {
    // split mid-corpus: doc 4's tokens continue the block doc 2 left
    // part-filled — the carried cursor must keep global offsets exact
    val (got, _) = runStream(
      Seq(fixture.take(3), fixture.drop(3)), shards = 1, "ps_split")
    assert(got == batchRef)
  }

  test("sharded: each shard replays its own sequential fold; shards=2 state") {
    val shards = 2
    val (got, stateRows) = runStream(Seq(fixture), shards, "ps_shard")
    assert(stateRows == shards.toLong)
    // driver replay per shard: same frozen merge table, same fold
    val perDoc = Bpe.bpeEncode(docsDF(fixture)).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    val shardOf = fixture.map { case (id, _) =>
      val h = graft.functions.Hashing.hash64(id.toString)
      (id, (((h % shards) + shards) % shards).toInt)
    }.toMap
    val want = (0 until shards).flatMap { sh =>
      var off = 0L
      fixture.map(_._1).sorted.filter(shardOf(_) == sh).flatMap { id =>
        val c = perDoc(id)
        if (c == 0) Nil
        else {
          val rows = ((off / L) to ((off + c - 1) / L)).map { b =>
            val s = math.max(off, b * L); val e = math.min(off + c, (b + 1) * L)
            (id, sh, b, s - b * L, e - s)
          }
          off += c
          rows
        }
      }
    }.sortBy(r => (r._1, r._2, r._3))
    assert(got == want, s"sharded fold diverges from replay:\n$got\n$want")
    // both shards genuinely used (the fixture hashes across them)
    assert(got.map(_._2).distinct.size == shards)
  }

  test("per-doc segment totals equal the frozen-tokenizer doc prices") {
    val (got, _) = runStream(Seq(fixture), shards = 1, "ps_totals")
    val perDoc = Bpe.bpeEncode(docsDF(fixture)).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    got.groupBy(_._1).foreach { case (id, segs) =>
      assert(segs.map(_._5).sum == perDoc(id), s"doc $id token total")
    }
    assert(!got.exists(_._1 == 3L), "zero-token doc must emit no rows")
  }
}
