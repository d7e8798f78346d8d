package graft.ext

import graft.SparkSpec
import graft.io.Sources
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Production-vocab BPE rung (r12 verdict #4): the declared keys train
  * at m=8 merges (oracle-unrolled); real tokenizers run ~30k. This
  * spec proves the driver merge loop and the codegen'd apply
  * expression hold at merges ≥ 1024 with a BINDING maxWordTypes — the
  * fixture corpus has only 31 word types, so the production-scale type
  * table is derived from the SAME documents as word TRIGRAMS
  * (concatenated adjacent letter-runs: ~16k distinct types at sf0.001,
  * realistic shared prefixes/suffixes for merges to exploit). The
  * declared m=8 keys are untouched; BpeScaleProbe measures the decade
  * for SCALE.md.
  */
class BpeProductionVocabSpec extends SparkSpec {

  /** Word-trigram type table over the sf0.001 documents: one row per
    * distinct concatenation of three adjacent letter-run words, with
    * its corpus count.
    */
  private lazy val trigramTypes: DataFrame = {
    val docs = Sources.table(spark, "/root/testdata/sf0.001", "documents")
    val w = docs
      .select(col("doc_id"),
        posexplode(split(lower(col("text")), "[^a-z]+")).as(Seq("i", "w")))
      .filter(length(col("w")) > 0)
    val win = Window.partitionBy("doc_id").orderBy("i")
    w.withColumn("w2", lead("w", 1).over(win))
      .withColumn("w3", lead("w", 2).over(win))
      .filter(col("w2").isNotNull && col("w3").isNotNull)
      .select(concat(col("w"), col("w2"), col("w3")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
  }

  private val MaxTypes = 4096 // the BINDING bound: |collected| == bound
  private val Merges = 1024

  private lazy val types: Array[(String, Long)] = trigramTypes
    .orderBy(col("cnt").desc, col("w"))
    .limit(MaxTypes)
    .collect().map(r => (r.getString(0), r.getLong(1)))

  private lazy val ms: Seq[Bpe.Merge] = Bpe.mergeLoop(types, Merges)

  test("indexed trainer is bit-identical to the reference scan loop (r15)") {
    // the pair-postings trainer (the r15 fix for the >29-min m=32k
    // rung) must select the SAME merge at every rank — same pairs,
    // same tie-breaks, same recorded counts — as the
    // direct-from-the-definition scan loop, on the production-shaped
    // trigram table AND through exhaustion on a tiny table
    assert(Bpe.mergeLoopIndexed(types, Merges) == Bpe.mergeLoopScan(types, Merges),
      "indexed trainer diverged from the reference scan loop")
    val tiny = Array(("abab", 5L), ("abc", 3L), ("bc", 3L), ("aab", 2L))
    // m far past exhaustion: both must stop at the same dense rank list
    assert(Bpe.mergeLoopIndexed(tiny, 64) == Bpe.mergeLoopScan(tiny, 64),
      "indexed trainer diverged at/after exhaustion")
  }

  test("driver merge loop learns 1024 merges over a binding 4096-type table") {
    assert(types.length == MaxTypes,
      s"the type bound must BIND (got ${types.length}) or the rung proves nothing")
    assert(ms.length == Merges,
      s"vocabulary exhausted early: ${ms.length} merges — widen the fixture")
    assert(ms.map(_.rank) == (1 to Merges), "ranks must be dense and ordered")
    // pair counts are non-increasing in rank ONLY per unchanged pool —
    // but the selected count can never exceed rank 1's
    assert(ms.forall(_.cnt >= 1) && ms.forall(_.cnt <= ms.head.cnt))
  }

  test("codegen'd apply at 1024 merges: count == |syms|, bounded, and strictly compresses vs m=8") {
    import spark.implicits._
    val eow = Bpe.EndOfWord
    val ms8 = ms.take(8)
    val typesDf = types.map(_._1).toSeq.toDF("w")
    val out = typesDf
      .withColumn("n1024", graft.functions.GraftFunctions.bpeCount(
        col("w"), eow, ms.map(_.l).toArray, ms.map(_.r).toArray))
      .withColumn("syms1024", graft.functions.GraftFunctions.bpeSyms(
        col("w"), eow, ms.map(_.l).toArray, ms.map(_.r).toArray))
      .withColumn("n8", graft.functions.GraftFunctions.bpeCount(
        col("w"), eow, ms8.map(_.l).toArray, ms8.map(_.r).toArray))
      .select(col("w"), col("n1024"), size(col("syms1024")).cast("long").as("ns"),
        col("n8"), (length(col("w")) + 1).cast("long").as("maxn"))
      .collect()
    assert(out.length == MaxTypes)
    // the two kernel faces share one body: count == sequence length
    assert(out.forall(r => r.getLong(1) == r.getLong(2)),
      "count and syms faces disagree")
    // every encode is sane: 1 <= n <= chars+eow, and 1024 merges never
    // yield MORE symbols than 8 (a superset of merges only compresses)
    assert(out.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= r.getLong(4)))
    assert(out.forall(r => r.getLong(1) <= r.getLong(3)),
      "more merges produced a longer encode")
    // and the big table actually DID something beyond the first 8
    val total1024 = out.map(_.getLong(1)).sum
    val total8 = out.map(_.getLong(3)).sum
    assert(total1024 < total8,
      s"1024 merges compressed nothing beyond 8: $total1024 vs $total8")
  }
}
