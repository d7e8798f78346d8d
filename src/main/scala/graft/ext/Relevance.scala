package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Term-relevance operators over the documents table: TF-IDF corpus
  * keyword extraction and BM25 ranked retrieval (Robertson & Spärck
  * Jones' probabilistic relevance framework; BM25 as in Robertson et
  * al., TREC-3 1994 — public literature, no reference counterpart:
  * north-star extension per SURVEY.md §2.4).
  *
  * Shared tokenizer: lowercase letter runs (`[a-z]+`), identical on the
  * DuckDB oracle side via `string_split_regex`. All scores are single
  * final expressions rounded to 4 dp — every intermediate (tf, df, dl)
  * is an exact integer, so cross-engine floats agree.
  *
  * Scale shape: explode → map-side-combinable hash aggregations keyed
  * by term or doc (vocabulary- and corpus-sized, never pairs), plus
  * one-row corpus constants (N, avgdl) joined in via a broadcast — the
  * single-row build side makes the nested-loop join a constant-time
  * stream pass, PlanShapeSpec-allowlisted.
  */
object Relevance {

  /** One row per (doc_id, lang, term): explode-then-filter keeps the
    * tokenization inside whole-stage codegen (a higher-order array
    * `filter` would drop to interpreted eval).
    */
  private def exploded(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), col("lang"),
      explode(split(lower(col("text")), "[^a-z]+")).as("term"))
      .filter(length(col("term")) > 0)

  /** Top `topPerLang` terms per language by corpus TF-IDF:
    * `tf(lang, term) · ln(N / df(term))` with N = total docs, df =
    * docs containing the term. Two aggregation shuffles (term-keyed)
    * plus a window over the per-language survivors.
    */
  def tfidfTopTerms(documents: DataFrame, topPerLang: Int = 5): DataFrame = {
    val toks = exploded(documents)
    val tf = toks.groupBy("lang", "term").agg(count(lit(1)).as("tf"))
    val df = toks.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val n = documents.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang")
      .orderBy(col("score").desc, col("term"))
    tf.join(df, "term")
      .crossJoin(broadcast(n)) // one corpus-constant row
      .withColumn("score",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topPerLang)
      .select("lang", "rank", "term", "tf", "df", "score")
      .orderBy("lang", "rank")
  }

  /** BM25 constants (the standard Okapi operating point). */
  val K1 = 1.2
  val B = 0.75

  /** Top-`k` documents for literal `queryTerms` under BM25 with the
    * `+1` idf form (always positive):
    * `Σ_t ln(1 + (N - df + 0.5)/(df + 0.5)) · tf(k1+1)/(tf + k1(1-b+b·dl/avgdl))`.
    *
    * The per-(doc, term) tf aggregation sees ONLY the query terms
    * (filter directly above the explode), so its cost is bounded by
    * matching postings, not the corpus token count; dl/avgdl ride the
    * corpus-wide doc-length aggregation that token stats need anyway.
    */
  def bm25Search(documents: DataFrame, queryTerms: Seq[String], k: Int = 10): DataFrame = {
    require(queryTerms.nonEmpty, "BM25 needs at least one query term")
    val toks = exploded(documents)
    val hits = toks.filter(col("term").isin(queryTerms: _*))
    val tf = hits.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = hits.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    // avgdl as one exact-integer sum over one exact count — a running
    // double `avg` would be partition-order-sensitive cross-engine
    val consts = documents.agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(dl.agg(
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val norm = col("tf") * lit(K1 + 1.0) /
      (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl")))
    tf.join(df, "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(consts)) // one corpus-constant row
      .groupBy("doc_id")
      .agg(round(sum(idf * norm), 4).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }
}
