package graft.streaming

import graft.SparkSpec
import graft.ext.Corpus
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamSelectBudgetSpec extends SparkSpec {

  // two quality tiers with deterministic relative order: `rich` carries
  // stopwords + sane word lengths (high score); `poor` is punctuation
  // soup (low score). Token counts vary by suffix length.
  private def rich(i: Int): String =
    s"the quick brown fox jumps over the lazy dog near door $i"
  private def poor(i: Int): String = s"!!! ??? ,,, ;;; $i :::"

  private def docs(ids: Range, mk: Int => String): Seq[BudgetDoc] =
    ids.map(i => BudgetDoc(i.toLong, "en", s"s${i % 2}", mk(i)))

  private def runStream(
      batches: Seq[Seq[BudgetDoc]], budget: Long, name: String) = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[BudgetDoc]
    val q = StreamSelectBudget.selectStream(input.toDF(), budget)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      (spark.table(name).orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getDouble(3), r.getLong(4))).toSeq,
        q.lastProgress.stateOperators.map(_.numRowsTotal).sum)
    } finally q.stop()
  }

  private def batchRef(rows: Seq[BudgetDoc], budget: Long) = {
    import spark.implicits._
    Corpus.selectBudget(
      rows.toDF("doc_id", "lang", "source", "text"), budget)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getDouble(3), r.getLong(4))).toSeq
  }

  test("one micro-batch with the whole corpus equals batch selectBudget") {
    val rows = docs(1 to 6, rich) ++ docs(7 to 10, poor)
    // budget cuts INSIDE the high-quality stratum: the boundary partial
    // take (cum-before < budget admits the overflowing doc) must agree
    val budget = 30L
    val (got, stateRows) = runStream(Seq(rows), budget, "sb_whole")
    val expected = batchRef(rows, budget)
    assert(expected.nonEmpty && expected.size < rows.size,
      s"fixture must land a real boundary: took ${expected.size}/${rows.size}")
    assert(got == expected)
    assert(stateRows == 1L, "budget state must be a single row")
  }

  test("spent tokens persist across micro-batches") {
    // batch 1 spends the budget; batch 2's high-quality docs arrive too
    // late and must ALL be rejected (spent >= budget before each)
    val first = docs(1 to 10, rich)
    val second = docs(11 to 14, rich)
    val budget = 40L
    val (got, _) = runStream(Seq(first, second), budget, "sb_persist")
    assert(got.nonEmpty)
    assert(got.map(_._1).forall(_ <= 10L),
      s"batch-2 docs admitted after the budget was spent: ${got.map(_._1)}")
    // and batch 1 alone agrees with the batch operator on the same rows
    assert(got == batchRef(first, budget))
  }

  test("in-order replay across micro-batches reproduces the batch output") {
    // global greedy order = all high-quality docs before all low-quality
    // ones; split at the tier edge, so the stream's per-batch sort plus
    // carried state walks the exact batch spend order
    val hi = docs(1 to 5, rich)
    val lo = docs(6 to 12, poor)
    val budget = 70L // spends through the hi tier into the lo tier
    val (got, _) = runStream(Seq(hi, lo), budget, "sb_replay")
    val expected = batchRef(hi ++ lo, budget)
    val hiCount = got.count(_._1 <= 5L)
    assert(hiCount == 5 && got.size > hiCount,
      s"budget must span both tiers: got ${got.map(_._1)}")
    assert(got == expected)
  }

  test("zero budget admits nothing but keeps the query healthy") {
    val (got, stateRows) = runStream(
      Seq(docs(1 to 3, rich), docs(4 to 5, rich)), 0L, "sb_zero")
    assert(got.isEmpty)
    assert(stateRows == 1L)
  }

  private def runSharded(
      batches: Seq[Seq[BudgetDoc]], budget: Long, shards: Int, name: String) = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[BudgetDoc]
    val q = StreamSelectBudget.selectStreamSharded(input.toDF(), budget, shards)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      (spark.table(name).orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getDouble(3), r.getLong(4), r.getInt(5))).toSeq,
        q.lastProgress.stateOperators.map(_.numRowsTotal).sum)
    } finally q.stop()
  }

  private def shardOf(docId: Long, shards: Int): Int = {
    val h = graft.functions.Hashing.hash64(docId.toString)
    (((h % shards) + shards) % shards).toInt
  }

  test("sharded with one shard IS the global face, row for row") {
    val rows = docs(1 to 6, rich) ++ docs(7 to 10, poor)
    val budget = 30L
    val (global, _) = runStream(Seq(rows), budget, "sbs_g")
    val (sharded, stateRows) = runSharded(Seq(rows), budget, 1, "sbs_1")
    assert(sharded.map(t => (t._1, t._2, t._3, t._4, t._5)) == global)
    assert(sharded.forall(_._6 == 0))
    assert(stateRows == 1L)
  }

  test("sharded: each stratum replays the batch operator under its sub-budget") {
    // whole corpus in one micro-batch: every shard's block must equal
    // batch selectBudget over THAT shard's docs with THAT shard's
    // sub-budget — the parallel fold is N independent copies of the
    // declared greedy rule, nothing else
    val rows = docs(1 to 24, rich) ++ docs(25 to 40, poor)
    val budget = 101L // not divisible by 4: remainder spread is exercised
    val shards = 4
    val (got, stateRows) = runSharded(Seq(rows), budget, shards, "sbs_4")
    assert(stateRows == shards.toLong, "one state row per stratum")
    val base = budget / shards
    val rem = (budget % shards).toInt
    (0 until shards).foreach { sh =>
      val myBudget = base + (if (sh < rem) 1L else 0L)
      val mine = rows.filter(d => shardOf(d.doc_id, shards) == sh)
      assert(mine.nonEmpty, s"fixture must populate shard $sh")
      val want = batchRef(mine, myBudget)
      val block = got.filter(_._6 == sh)
        .map(t => (t._1, t._2, t._3, t._4, t._5))
      assert(block == want, s"shard $sh diverged from its batch replay")
    }
    // shard assignment is content-addressed: recomputable from doc_id
    got.foreach(t => assert(t._6 == shardOf(t._1, shards)))
  }

  test("sharded: sub-budgets persist independently across micro-batches") {
    // batch 1 exhausts every shard's sub-budget; batch 2's docs must
    // all be rejected shard-locally (no cross-shard borrowing)
    val first = docs(1 to 20, rich)
    val second = docs(21 to 28, rich)
    val budget = 48L
    val shards = 2
    val (got, _) = runSharded(Seq(first, second), budget, shards, "sbs_p")
    assert(got.nonEmpty)
    assert(got.map(_._1).forall(_ <= 20L),
      s"batch-2 docs admitted after sub-budgets were spent: ${got.map(_._1)}")
    (0 until shards).foreach { sh =>
      val myBudget = budget / shards + (if (sh < (budget % shards).toInt) 1L else 0L)
      val mine = first.filter(d => shardOf(d.doc_id, shards) == sh)
      val block = got.filter(_._6 == sh).map(t => (t._1, t._2, t._3, t._4, t._5))
      assert(block == batchRef(mine, myBudget), s"shard $sh diverged")
    }
  }
}
