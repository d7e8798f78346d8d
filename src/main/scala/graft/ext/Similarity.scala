package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a single narrow projection +
  * TakeOrderedAndProject (per-partition top-k, then driver merge of k
  * rows per partition: no full sort, no shuffle of the data).
  *
  * Scale path: IVF — vectors pre-assigned to their nearest centroid
  * (one narrow pass given broadcast centroids); a probe scans only the
  * `nProbe` closest partitions, i.e. nProbe/C of the data. The bucketed
  * layout is exactly what you'd persist bucketed-by-cluster at 100 TB so
  * queries prune partitions at the parquet level.
  */
object Similarity {

  /** Dot product of two float-array columns, accumulated in double.
    * (Built-in array expressions; kept for composability — the hot
    * paths below use the codegen'd kernels instead.)
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity (0 when either norm is 0) — codegen'd custom
    * expression (graft.functions.CosineSimExpr): one fused JVM loop per
    * pair vs three interpreted array-aggregates.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.cosineSim(a, b)

  /** Brute-force cosine top-k against a constant probe vector.
    * The probe is a literal array — broadcast implicitly in the plan.
    */
  def topK(embeddings: DataFrame, probe: Seq[Float], k: Int = 10): DataFrame = {
    val probeCol = array(probe.map(lit): _*)
    embeddings
      .select(col("vec_id"), col("label"),
        round(cosine(col("embedding"), probeCol), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** Deterministic probe: the embedding of the row with the smallest
    * vec_id (collected — a single tiny row, not a data collect).
    */
  def defaultProbe(embeddings: DataFrame): Seq[Float] =
    embeddings.orderBy("vec_id").select("embedding").limit(1)
      .collect()(0).getSeq[Float](0)

  // ------------------------------------------------------ hyperplane LSH

  /** Sign-bit sketch of seeded hyperplanes packed into a BIGINT —
    * codegen'd custom expression; reused by Dedup.embeddingPairs.
    */
  def hyperplaneSketch(emb: Column, dim: Int, planes: Int): Column =
    graft.functions.GraftFunctions.hyperplaneSketch(emb, dim, planes)

  /** LSH-bucketed ANN top-k: scan only buckets whose sketch is within
    * `maxHamming` of the probe sketch (sketch comparison is a bigint
    * xor/bit_count on a tiny aggregated bucket list — the scan of the
    * full table is pruned by a broadcast semi-join on the sketch value).
    */
  def annTopK(
      embeddings: DataFrame,
      probe: Seq[Float],
      k: Int = 10,
      dim: Int = 64,
      planes: Int = 16,
      maxHamming: Int = 3): DataFrame = {
    val probeCol = array(probe.map(lit): _*)
    val sketched = embeddings.withColumn("sk",
      hyperplaneSketch(col("embedding"), dim, planes))
    val probeSketch = sketched.sparkSession.range(1)
      .select(hyperplaneSketch(array(probe.map(lit): _*), dim, planes).as("psk"))
    val nearBuckets = sketched.select(col("sk")).distinct()
      .crossJoin(broadcast(probeSketch))
      .filter(bit_count(col("sk").bitwiseXOR(col("psk"))) <= maxHamming)
      .select("sk")
    sketched
      .join(broadcast(nearBuckets), Seq("sk"), "left_semi")
      .select(col("vec_id"), col("label"),
        round(cosine(col("embedding"), probeCol), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  // ------------------------------------------------------------------ IVF

  /** IVF index: deterministic centroids (the first `nCentroids` vectors
    * by vec_id — a stand-in for k-means, which would converge on real
    * data); every vector assigned to its nearest centroid in one pass
    * with the centroid set broadcast.
    */
  def ivfAssign(embeddings: DataFrame, nCentroids: Int = 16): DataFrame = {
    // The centroid set is tiny and plan-time-constant: collect it (like
    // the 1-row probe fetch) and fold it into literal expressions, so the
    // assignment is ONE narrow projection — nCentroids codegen'd cosine
    // kernels per row, zero exchanges. The crossJoin+window alternative
    // shuffles nCentroids× the data just to pick an argmin.
    val centroidRows = embeddings.orderBy("vec_id").limit(nCentroids)
      .select(col("vec_id"), col("embedding")).collect()
    val scored = array(centroidRows.map { r =>
      val cvec = array(r.getSeq[Float](1).map(lit): _*)
      struct((-cosine(col("embedding"), cvec)).as("d"),
        lit(r.getLong(0)).as("cid"))
    }.toIndexedSeq: _*)
    // array_min over struct(dist, centroid_id) = argmin with the same
    // (dist asc, centroid_id asc) tie-break as an ORDER BY would give
    embeddings
      .withColumn("centroid_id", array_min(scored).getField("cid"))
      .select("vec_id", "embedding", "label", "centroid_id")
  }

  /** IVF probe: search only the `nProbe` centroids closest to the probe
    * vector — scans nProbe/nCentroids of the data.
    */
  def ivfTopK(
      assigned: DataFrame,
      centroidsOf: DataFrame,
      probe: Seq[Float],
      k: Int = 10,
      nProbe: Int = 4): DataFrame = {
    val probeCol = array(probe.map(lit): _*)
    val near = centroidsOf
      .withColumn("sim", cosine(col("cvec"), probeCol))
      .orderBy(col("sim").desc, col("centroid_id"))
      .limit(nProbe)
      .select("centroid_id")
    assigned
      .join(broadcast(near), Seq("centroid_id"), "left_semi")
      .select(col("vec_id"), col("label"),
        round(cosine(col("embedding"), probeCol), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }
}
