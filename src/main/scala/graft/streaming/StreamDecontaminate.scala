package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming face of benchmark decontamination
  * (`Corpus.decontaminateBloom`'s serving shape): each arriving
  * document is checked ONLINE against a FROZEN contamination artifact
  * exported from the benchmark corpus — the deployment posture of a
  * live ingest pipe, where eval sets are fixed and pages arrive one
  * crawl at a time.
  *
  * The artifact is two frozen driver objects (the bounded-model class,
  * like the bigram-LM tables): the `mBits`-bit Bloom bitmap
  * ([[graft.ext.Corpus.bloomBitmap]] — fixed size by configuration)
  * and the benchmark's exact 64-bit gram-hash set
  * ([[benchGramSet]] — bounded by the BENCHMARK, which is tiny by
  * definition next to the stream). Membership on the hashes is
  * bit-equivalent to the batch confirm JOIN, which equi-joins the same
  * hashes — so `contaminated` here agrees row-for-row with
  * `Corpus.decontaminate`'s drop set (spec-pinned).
  *
  * Shape: completely STATELESS — one narrow codegen'd projection per
  * row (gram hashes → bloom probe → exact confirm only when the bloom
  * fires), no shuffle, no state store, no stream-static join; clean
  * docs pay the bloom probe alone. If a deployment's contamination set
  * ever outgrows executor memory as a hash set, the documented
  * fallback is the batch confirm join per micro-batch (foreachBatch
  * over [[graft.ext.Corpus.decontaminateBloom]]) — the bitmap stays
  * fixed-size either way.
  */
object StreamDecontaminate {

  /** The benchmark's distinct gram-hash set as a frozen driver
    * artifact. Driver-side size is the benchmark's distinct gram
    * count × 8 B — eval suites measure in MBs, not TBs; `maxGrams`
    * guards the contract loudly instead of OOMing quietly.
    */
  def benchGramSet(
      benchmark: DataFrame,
      n: Int = 8,
      maxGrams: Int = 1 << 24): java.util.HashSet[java.lang.Long] = {
    // the limit bounds the COLLECT itself (maxGrams + 1 rows at most),
    // so an over-budget benchmark fails the require below instead of
    // OOMing the driver on the way to it
    val rows = benchmark
      .select(explode(
        graft.functions.GraftFunctions.ngramHashes(col("text"), n)).as("gram"))
      .distinct()
      .limit(maxGrams + 1)
      .collect()
    require(rows.length <= maxGrams,
      s"benchmark gram set exceeds maxGrams=$maxGrams — " +
        "use foreachBatch over Corpus.decontaminateBloom instead")
    val set = new java.util.HashSet[java.lang.Long](rows.length * 2)
    rows.foreach(r => set.add(r.getLong(0)))
    set
  }

  /** Verdict stream: `(doc_id, suspicious, contaminated)` per input
    * doc — append-mode-safe (stateless projection). `suspicious` is
    * the bloom verdict (the cheap gate; ⊇ contaminated by the
    * no-false-negatives property), `contaminated` the exact one; the
    * exact probe runs ONLY on bloom-flagged rows.
    */
  def filterStream(
      stream: DataFrame,
      artifact: graft.ext.Corpus.BloomArtifact,
      gramSet: java.util.HashSet[java.lang.Long]): DataFrame = {
    // the probe parameters (gram width, hash count, bitmap size) ride
    // the bundled artifact, so they CANNOT drift from the build's — a
    // probe built with different values silently loses the
    // no-false-negative guarantee, which is why loose parameters are
    // not accepted here (ADVICE r12 #1)
    import graft.functions.GraftFunctions.{bloomAny, longSetAny, ngramHashes}
    stream
      .select(col("doc_id"),
        ngramHashes(col("text"), artifact.n).as("_g"))
      .select(col("doc_id"),
        coalesce(
          bloomAny(col("_g"), artifact.bits, artifact.nHashes, artifact.mBits),
          lit(false))
          .as("suspicious"), col("_g"))
      .select(col("doc_id"), col("suspicious"),
        when(col("suspicious"),
          coalesce(longSetAny(col("_g"), gramSet), lit(false)))
          .otherwise(lit(false)).as("contaminated"))
  }
}
