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

  test("classifier: weights table round-trips; frozen scoring equals classifierApply") {
    val train = docs.filter(col("doc_id") % 2 === 0)
    val weights = Relevance.trainQualityClassifier(train)
    val path = tmp("clf")
    weights.coalesce(1).write.mode("overwrite").parquet(path)
    val (w, bias) = Relevance.loadClassifier(spark, path)
    // the loaded artifact carries every bucket (zeros included) + bias
    assert(w.values.exists(_ != 0.0) && bias != 0.0)
    val held = docs.filter(col("doc_id") % 2 === 1)
    val frozen = Relevance.classifierScoreFrozen(held, w, bias)
      .collect().map(_.toSeq).toSeq
    val direct = Relevance.classifierApply(docs).collect().map(_.toSeq).toSeq
    assert(frozen == direct, "frozen scoring diverged from classifierApply")
    // saveClassifier's map face round-trips to the same artifact
    val path2 = tmp("clf2")
    Relevance.saveClassifier(spark, w, bias, path2)
    val (w2, bias2) = Relevance.loadClassifier(spark, path2)
    assert(w2 == w && bias2 == bias)
  }
}
