package graft.ext

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate *clustering*: close the transitive gap of pairwise
  * LSH output. Pair-drop dedup (keep lowest id of each pair) under-
  * deletes chains (a~b, b~c but a≁c): connected components assigns every
  * chained group one cluster id.
  *
  * GraphX connectedComponents is the scalable implementation (Pregel,
  * O(diameter) join rounds, checkpointed partitions) — near-dup graphs
  * are overwhelmingly tiny components, so convergence is fast at any
  * corpus size.
  */
object DedupClusters {

  /** pairs(doc_id_a, doc_id_b) → (doc_id, cluster_id) where cluster_id
    * is the minimum doc_id of the component. Docs without any pair keep
    * themselves as singleton clusters (cluster_id = doc_id).
    */
  def clusters(documents: DataFrame, pairs: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val edges = pairs
      .select(col("doc_id_a").cast("long"), col("doc_id_b").cast("long"))
      .as[(Long, Long)].rdd
      .map { case (a, b) => Edge(a, b, ()) }
    val vertices = documents.select(col("doc_id").cast("long")).as[Long].rdd
      .map(id => (id, ()))
    val graph = Graph(vertices, edges)
    // GraphX CC labels each vertex with the min vertex id in its component
    val cc = graph.connectedComponents().vertices
    val ccDf = cc.toDF("doc_id", "cluster_id")
    documents.select("doc_id").join(ccDf, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      .orderBy("doc_id")
  }

  /** Cluster-aware dedup: keep exactly one representative (lowest
    * doc_id) per connected component of the near-dup graph.
    */
  def dedupByClusters(documents: DataFrame, pairs: DataFrame): DataFrame = {
    val reps = clusters(documents, pairs)
      .groupBy("cluster_id").agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    documents.join(reps, Seq("doc_id"), "left_semi").orderBy("doc_id")
  }

  /** End-to-end minhash near-dup clustering over a documents table. */
  def minHashClusters(documents: DataFrame, threshold: Double = 0.8): DataFrame =
    clusters(documents, Dedup.minHashPairs(documents, threshold))
}
