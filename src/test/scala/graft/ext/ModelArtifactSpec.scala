package graft.ext

import graft.SparkSpec
import graft.io.Sources
import org.apache.spark.sql.functions._

/** Frozen-artifact persistence for the train-once-apply-many family
  * (the IvfPersistSpec contract extended family-wide): the BPE merge
  * table, the bigram LM, and the classifier weights each save to a
  * parquet artifact and load back to serve BIT-IDENTICAL scores —
  * what a 100 TB deployment trains offline once and every scoring
  * pass consumes.
  */
class ModelArtifactSpec extends SparkSpec {

  private lazy val docs = Sources.table(spark, "/root/testdata/sf0.001", "documents")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-art-$tag")
      .resolve("artifact").toString

  test("BPE merges: save -> load round-trips; frozen encode equals trained encode") {
    val trained = Bpe.trainMerges(docs)
    val path = tmp("bpe")
    Bpe.saveMerges(spark, trained, path)
    val loaded = Bpe.loadMerges(spark, path)
    assert(loaded == trained, "merge table changed through the artifact")
    val direct = Bpe.bpeEncode(docs).collect().map(_.toSeq).toSeq
    graft.core.CacheScope.releaseAll()
    val frozen = Bpe.bpeEncodeFrozen(docs, loaded).collect().map(_.toSeq).toSeq
    graft.core.CacheScope.releaseAll()
    assert(frozen == direct, "frozen encode diverged from in-query training")
  }

  test("bigram LM: save -> load round-trips; loaded model scores bit-identically") {
    val model = Relevance.bigramModel(docs.filter(col("doc_id") % 2 === 0))
    val path = tmp("lm")
    Relevance.saveBigramModel(spark, model, path)
    val loaded = Relevance.loadBigramModel(spark, path)
    assert(loaded.alpha == model.alpha && loaded.total == model.total)
    assert(loaded.bigramLp == model.bigramLp, "bigram table drifted")
    assert(loaded.vocabCnt == model.vocabCnt, "vocab table drifted")
    val held = docs.filter(col("doc_id") % 2 === 1)
    val a = Relevance.bigramApply(held, model).collect().map(_.toSeq).toSeq
    val b = Relevance.bigramApply(held, loaded).collect().map(_.toSeq).toSeq
    assert(a == b, "loaded model scored differently")
  }

  test("classifier: sparse weights artifact round-trips; frozen scoring equals classifierApply") {
    val train = docs.filter(col("doc_id") % 2 === 0)
    // the artifact carries the trained model's exact SUPPORT (sparse
    // touched buckets) — persisting the dense report table instead
    // would force a zero-drop on load that can mislabel a touched
    // bucket trained to exactly 0.0 (r13 review finding)
    val (wT, biasT) = Relevance.trainClassifierModel(train)
    val path = tmp("clf")
    Relevance.saveClassifier(spark, wT, biasT, path)
    val (w, bias) = Relevance.loadClassifier(spark, path)
    assert(w == wT && bias == biasT, "model pair changed through the artifact")
    val held = docs.filter(col("doc_id") % 2 === 1)
    val frozen = Relevance.classifierScoreFrozen(held, w, bias)
      .collect().map(_.toSeq).toSeq
    val direct = Relevance.classifierApply(docs).collect().map(_.toSeq).toSeq
    assert(frozen == direct, "frozen scoring diverged from classifierApply")
  }
}
