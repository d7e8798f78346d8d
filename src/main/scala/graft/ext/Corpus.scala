package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators for training-data pipelines: the steps
  * between "deduplicated documents" and "token batches" — deterministic
  * splits, PII scrubbing, chunking, sequence packing.
  *
  * All four are pure narrow/window plans (no joins, no driver loops) and
  * every one is DuckDB-oracle-checkable: the SQL twin is generated from
  * the same constants in [[graft.ExtQueries]].
  */
object Corpus {

  /** Deterministic hash split: keep documents whose md5(text) is
    * lexicographically below `hexThreshold` ("40" ≈ 25%, "1a" ≈ 10%).
    * Content-addressed (stable under re-runs, re-partitioning, and
    * appends — the property train/val splits need; row-number sampling
    * has none of these). One narrow filter, fully pushdown-friendly.
    */
  def sampleByHash(documents: DataFrame, hexThreshold: String = "40"): DataFrame =
    documents
      .filter(md5(encode(col("text"), "UTF-8")) < lit(hexThreshold))
      .orderBy("doc_id")

  /** PII scrub patterns — dialect-portable regexes (no lookaround: Java
    * regex on the Spark side, RE2 in DuckDB).
    */
  val EmailRegex = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val LongNumberRegex = "[0-9]{6,}"

  /** Redact emails and long digit runs; keeps everything else intact.
    * One narrow projection.
    */
  def redactPii(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"),
        regexp_replace(
          regexp_replace(col("text"), EmailRegex, "<EMAIL>"),
          LongNumberRegex, "<NUM>").as("clean_text"))
      .orderBy("doc_id")

  /** Fixed-size word-window chunking with overlap: one output row per
    * chunk, `chunk_idx` derived arithmetically from the start offset
    * (no ordinality dependence). Short/empty docs yield one chunk.
    * Narrow: explode of a per-row computed array, no shuffle.
    */
  def chunkDocuments(
      documents: DataFrame,
      chunkWords: Int = 50,
      overlapWords: Int = 10): DataFrame = {
    require(overlapWords < chunkWords, "overlap must be smaller than the chunk")
    val step = chunkWords - overlapWords
    val words = split(TextStats.normText(col("text")), " ")
    val starts = sequence(lit(1), greatest(size(words), lit(1)), lit(step))
    documents
      .select(col("doc_id"), explode(starts).as("start"), words.as("w"))
      .select(
        col("doc_id"),
        (((col("start") - 1) / step) + 1).cast("bigint").as("chunk_idx"),
        concat_ws(" ", slice(col("w"), col("start"), lit(chunkWords))).as("chunk_text"),
        least(size(col("w")) - col("start") + 1, lit(chunkWords))
          .cast("bigint").as("n_words"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Sequence packing: assign documents to fixed-token-budget packs by
    * cumulative whitespace-token count in doc_id order WITHIN each lang
    * shard. This is the standard distributed approximation of greedy
    * packing — contiguous fill per shard, one window shuffle, no
    * sequential driver loop. `pack_id = lang#bin`.
    *
    * Scale note: the window partitions by the shard key (lang here), so
    * the plan never funnels the corpus through one task; production
    * pipelines shard by (source, date) the same way.
    */
  def packGreedy(documents: DataFrame, budgetTokens: Int = 512): DataFrame = {
    val toks = TextStats.wsTokenCount(col("text"))
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents
      .select(col("doc_id"), col("lang"), toks.cast("bigint").as("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(w))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        concat(col("lang"), lit("#"),
          floor((col("cum") - col("n_tokens")) / budgetTokens).cast("string"))
          .as("pack_id"))
      .orderBy("doc_id")
  }
}
