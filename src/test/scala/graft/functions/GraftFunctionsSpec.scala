package graft.functions

import graft.SparkSpec

/** SQL surface of the codegen kernels (register / GraftExtensions). */
class GraftFunctionsSpec extends SparkSpec {

  test("all kernels callable from SQL and agree with the Column API") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        |  graft_simhash64('hello world') AS sh,
        |  graft_minhash_sig('hello world there friend') AS sig16,
        |  graft_minhash_sig('hello world there friend', 128) AS sig128,
        |  graft_ngram_hashes('a b c d', 3) AS grams,
        |  graft_jaccard_sorted(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j,
        |  graft_cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS cos,
        |  graft_hyperplane_sketch(array(0.5F, -0.5F), 2, 8) AS sk
        |""".stripMargin).collect()(0)
    def seqOf(name: String): Seq[Long] =
      r.getAs[scala.collection.Seq[Long]](name).toSeq
    assert(r.getAs[Long]("sh") == Hashing.simhash64("hello world"))
    assert(seqOf("sig16") == Hashing.minhashSig("hello world there friend", 16).toSeq)
    assert(seqOf("sig128").length == 128)
    assert(seqOf("sig128").take(16) == seqOf("sig16"))
    assert(seqOf("grams") == Hashing.ngramHashes("a b c d", 3).toSeq)
    assert(math.abs(r.getAs[Double]("j") - 0.5) < 1e-12) // |{2,3}|/|{1,2,3,4}|
    assert(math.abs(r.getAs[Double]("cos") - 1.0) < 1e-12)
    assert(r.getAs[Long]("sk") == VectorOps.sketch(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(0.5f, -0.5f)), 2, 8))
  }

  test("non-literal K is rejected with a clear error") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_ngram_hashes('a b c', 1 + 2)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal")
      || e.getCause != null && e.getCause.getMessage.toLowerCase.contains("literal"))
  }
}
