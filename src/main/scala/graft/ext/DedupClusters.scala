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

  /** DataFrame-native connected components: hash-to-min label
    * propagation (min over the neighborhood's labels) fused with a
    * pointer-jumping round (label(v) ← label(label(v))), converging in
    * O(log diameter) iterations — near-dup graphs (tiny, dense
    * components) finish in 2–3. Same labels as GraphX CC (min vertex id
    * per component, spec-verified on random graphs), but the whole loop
    * stays in Tungsten/AQE: no RDD conversion, no Pregel machinery,
    * each round a join + map-side-combinable min + a self-join jump.
    * Public algorithm family: Rastogi et al., "Finding Connected
    * Components in Map-Reduce in Logarithmic Rounds" (ICDE 2013).
    *
    * The driver-side convergence check is one Long per iteration (a
    * changed-label count), never data.
    */
  def clustersDF(
      documents: DataFrame,
      pairs: DataFrame,
      maxIterations: Int = 25): DataFrame = {
    val edges = pairs
      .select(col("doc_id_a").cast("long").as("src"),
        col("doc_id_b").cast("long").as("dst"))
    // symmetric closure once (self-labels enter via the left join below)
    val sym = edges.unionByName(
      edges.select(col("dst").as("src"), col("src").as("dst")))
      .transform(graft.core.CacheScope.persist)
    // iterate ONLY over edge-touched vertices: a vertex with no pair can
    // never change its label, and the near-dup graph is a sliver of the
    // corpus — looping over all documents would pay O(|corpus|) joins
    // per round for rows the final coalesce-to-self covers anyway
    // (r13: this halved the two declared CC keys; labels unchanged)
    var labels = sym.select(col("src").as("v")).distinct()
      .select(col("v"), col("v").as("cluster_id"))
    // previous round's checkpoint: released once the NEXT round has
    // materialized (its blocks are unrecoverable after release — the
    // lineage was truncated), so peak pinned storage is 2 rounds, not
    // O(iterations)
    var prevRound: DataFrame = null
    var converged = false
    var i = 0
    while (!converged && i < maxIterations) {
      // (1) min over the open neighborhood's labels
      val viaNeighbors = sym
        .join(labels.withColumnRenamed("v", "src"), Seq("src"))
        .groupBy(col("dst").as("v"))
        .agg(min("cluster_id").as("nbr_min"))
      val afterNbr = labels.join(viaNeighbors, Seq("v"), "left")
        .select(col("v"), col("cluster_id").as("prev"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id")))
            .as("cid"))
      // (2) pointer jumping: label(v) ← label(label(v)). Labels are
      // always vertex ids of the same component, so the jump stays in
      // the component while contracting path distances — a chain of
      // length d converges in O(log d) rounds, not O(d)
      val parent = afterNbr.select(col("v").as("p_v"), col("cid").as("p_cid"))
      val next = afterNbr
        .join(parent, col("cid") === col("p_v"), "left")
        .select(col("v"),
          least(col("cid"), coalesce(col("p_cid"), col("cid"))).as("cluster_id"),
          (least(col("cid"), coalesce(col("p_cid"), col("cid"))) < col("prev"))
            .as("changed"))
        // eager materialization + lineage truncation: without it each
        // round's plan nests the previous round's joins, and analysis
        // time alone grows superlinearly (a cluster job would use a
        // reliable checkpoint; local block storage is the local analogue)
        .localCheckpoint(true)
      val changed = next.filter(col("changed") === true).count()
      if (prevRound != null)
        org.apache.spark.sql.GraftBridge.unpersistLocalCheckpoint(prevRound)
      prevRound = next
      labels = next.select("v", "cluster_id")
      converged = changed == 0
      i += 1
    }
    if (!converged) {
      // release the final round's checkpoint blocks before failing —
      // repeated failures in a long-lived session must not pin storage
      if (prevRound != null)
        org.apache.spark.sql.GraftBridge.unpersistLocalCheckpoint(prevRound)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIterations rounds " +
          "(component diameter > 2^rounds — raise maxIterations); refusing " +
          "to return partially-propagated cluster labels")
    }
    // the FINAL round's checkpoint backs the returned plan: register it
    // for scope-level release after the caller's action
    if (prevRound != null) graft.core.CacheScope.track(prevRound)
    documents.select(col("doc_id"))
      .join(labels.withColumnRenamed("v", "doc_id"), Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      .orderBy("doc_id")
  }

  /** Cluster-aware dedup with the PRODUCTION keep policy: per near-dup
    * cluster, keep the highest-QUALITY member (ties to the smallest
    * doc_id), not the smallest id — the representative choice real
    * curation pipelines make (a near-dup cluster usually holds one
    * clean copy and n boilerplate-wrapped ones; lowest-id keeps
    * whichever crawled first). Returns one row per kept representative:
    * `doc_id, lang, source, cluster_id, n_members, quality_score`.
    *
    * Argmax shape, deterministic and oracle-portable: per-cluster max
    * quality (one map-side-combinable aggregate over cluster ids), then
    * min doc_id among the rows AT that max — no float negation tricks,
    * no window over the corpus; both aggregates are cluster-bounded.
    * Quality is the 4-dp [[TextStats.qualityScoreColumn]] (discrete, so
    * the max-equality join is exact cross-engine). Clustering is the
    * Tungsten-resident [[clustersDF]] over whatever pair set the caller
    * trusts.
    */
  def dedupByClustersKeepQuality(
      documents: DataFrame, pairs: DataFrame): DataFrame = {
    val q = documents.select(col("doc_id"), col("lang"), col("source"),
      TextStats.qualityScoreColumn(col("text")).as("quality_score"))
    // joined member table feeds the stats aggregate, the argmax, and
    // the final carry — pinned so clustering runs once
    val members = graft.core.CacheScope.persist(
      clustersDF(documents, pairs).join(q, Seq("doc_id")))
    val stats = members.groupBy("cluster_id").agg(
      count(lit(1)).as("n_members"),
      max("quality_score").as("quality_score"))
    val reps = members.join(stats.select("cluster_id", "quality_score"),
        Seq("cluster_id", "quality_score"))
      .groupBy("cluster_id").agg(min("doc_id").as("doc_id"))
    members.select("doc_id", "lang", "source", "cluster_id")
      .join(reps, Seq("cluster_id", "doc_id"), "left_semi")
      .join(stats, Seq("cluster_id"))
      .select("doc_id", "lang", "source", "cluster_id",
        "n_members", "quality_score")
      .orderBy("doc_id")
  }
}
