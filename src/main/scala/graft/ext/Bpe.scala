package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge-table training (Sennrich et al. 2016,
  * arXiv:1508.07909) — the tokenizer artifact a training-data pipeline
  * actually produces, one step past the seed statistics the surface
  * already carries (`token_freq` unigrams, `bigram_freq` = the first
  * merge's candidates).
  *
  * Shape: ONE corpus pass (the lowercase letter-run tokenizer shared
  * with [[Relevance]]) aggregates to word-type counts — vocabulary-
  * bounded, Zipf-small relative to the corpus — and the m-round merge
  * loop then runs DRIVER-SIDE over word types only, exactly how
  * production BPE trainers work (the corpus is never re-scanned per
  * merge; each round is O(|types| · avg word length)). The collect is
  * bounded by the vocabulary, not the corpus — the same justification
  * class as the engine's other audited bounded collects.
  *
  * Determinism contract (mirrored exactly by the DuckDB oracle's
  * unrolled per-stage CTEs): pair counts include every adjacent
  * occurrence (overlapping — `zip(s, s.tail)`, the reference
  * algorithm's get_stats); the winning pair maximizes (count, then
  * lexicographically smallest left, then right — ASCII order, which
  * Java String and DuckDB's binary collation share); merges apply
  * greedily left-to-right, non-overlapping (a symbol formed this round
  * never immediately re-merges: `l + r == l` would need an empty `r`).
  */
object Bpe {

  val DefaultMerges = 8
  val EndOfWord = "</w>"

  /** The learned merge table: `merge_rank, left, right, merged,
    * pair_count` for the first `merges` BPE merges over the corpus
    * (fewer rows iff the vocabulary exhausts its pairs first).
    */
  def bpeVocab(documents: DataFrame, merges: Int = DefaultMerges): DataFrame = {
    require(merges >= 1, s"need at least one merge: $merges")
    val spark = documents.sparkSession
    import spark.implicits._
    val wordCounts: Array[(String, Long)] = documents
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var vocab: Array[(Array[String], Long)] = wordCounts.map { case (w, c) =>
      (w.map(_.toString).toArray :+ EndOfWord, c)
    }
    val out = Seq.newBuilder[(Long, String, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= merges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- vocab; i <- 0 until syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val ((l, r), c) = pairCounts.minBy { case ((pl, pr), pc) => (-pc, pl, pr) }
        val merged = l + r
        out += ((rank.toLong, l, r, merged, c))
        vocab = vocab.map { case (syms, cnt) =>
          val b = Array.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              b += merged; i += 2
            } else { b += syms(i); i += 1 }
          }
          (b.result(), cnt)
        }
        rank += 1
      }
    }
    out.result()
      .toDF("merge_rank", "left", "right", "merged", "pair_count")
      .orderBy("merge_rank")
  }
}
