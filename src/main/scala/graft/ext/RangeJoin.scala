package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap (range) self-join — Spark's optimizer turns a plain
  * inequality join into a BroadcastNestedLoopJoin (a cross product),
  * which is the canonical 100 TB anti-pattern.
  *
  * Scalable shape: explode each interval to the fixed-width time bins
  * it covers, equi-join on the bin (ONE hash shuffle), verify the exact
  * overlap predicate, dedupe pairs that met in several bins. Cost is
  * ∝ Σ bins-per-interval + true-result size, never |L|×|R|. Pick
  * `binMicros` near the typical interval length: too small explodes
  * long intervals into many bins, too large packs unrelated intervals
  * into the same bin (both only cost, never correctness).
  *
  * Two skew guards keep the shape safe at 100× (the operator is EXACT,
  * so unlike the LSH paths nothing may be dropped — degenerate inputs
  * are re-routed, not discarded):
  *
  *  - '''long intervals''' (spanning > `maxBinsPerInterval` bins — a
  *    scraper session that never ends) would replicate ∝ their length.
  *    They are pulled out and joined via a broadcast with the direct
  *    overlap predicate: replication for everyone else stays bounded by
  *    construction, and the broadcast side is only the rare outliers.
  *  - '''hot bins''' (> `hotBinThreshold` rows — a flash event packing
  *    thousands of concurrent intervals into one 5-min bin) are
  *    inherently quadratic in TRUE pairs, but a plain bin-join puts the
  *    whole bin in ONE task (straggler + OOM). A census finds oversized
  *    bins (broadcast the oversized list + anti-join, never the
  *    corpus-∝ survivors — same inverted pattern as
  *    [[Dedup.minHashPairs]]); hot rows then pair via a salted
  *    `s × s` block self-join so each task holds ~1/s² of the bin.
  */
object RangeJoin {

  /** Pairs (id_a < id_b) of overlapping `[start_ts, end_ts]` intervals
    * (inclusive bounds, µs), with the overlap length. Input schema:
    * `id BIGINT (unique), start_ts BIGINT, end_ts BIGINT`. Output is
    * identical for any guard setting — thresholds tune cost, never
    * correctness.
    */
  def selfOverlapPairs(
      intervals: DataFrame,
      binMicros: Long = 3600L * 1000000,
      maxBinsPerInterval: Int = 64,
      hotBinThreshold: Int = 4096,
      hotBinSplits: Int = 8): DataFrame = {
    require(hotBinSplits >= 1, "hotBinSplits must be >= 1")
    val overlapUs =
      (least(col("e_a"), col("e_b")) - greatest(col("s_a"), col("s_b")))
        .as("overlap_us")
    val overlaps = col("s_a") <= col("e_b") && col("s_b") <= col("e_a")

    val spans = intervals
      .select(col("id"), col("start_ts"), col("end_ts"),
        (expr(s"end_ts div $binMicros") - expr(s"start_ts div $binMicros") + 1)
          .as("nbins"))
      .transform(graft.core.CacheScope.persist) // feeds long + short paths
    val longs = spans.filter(col("nbins") > maxBinsPerInterval)
    val shorts = spans.filter(col("nbins") <= maxBinsPerInterval)

    // --- long-interval path: every pair touching a long interval, via a
    // broadcast of the (rare by construction) long side. least/greatest
    // orders the pair; long×long pairs arrive twice and dedupe below.
    val longPairs = spans
      .select(col("id").as("id_a"), col("start_ts").as("s_a"),
        col("end_ts").as("e_a"))
      .join(broadcast(longs.select(col("id").as("id_b"),
        col("start_ts").as("s_b"), col("end_ts").as("e_b"))),
        col("id_a") =!= col("id_b") && overlaps)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"), overlapUs)

    // --- short-interval path: bin-bucketed self-join.
    val binned = shorts
      .select(col("id"), col("start_ts"), col("end_ts"),
        explode(sequence(
          expr(s"start_ts div $binMicros"),
          expr(s"end_ts div $binMicros"))).as("bin"))
      .transform(graft.core.CacheScope.persist) // census + both join sides
    val oversized = binned.groupBy("bin").count()
      .filter(col("count") > hotBinThreshold)
      .select("bin")
    val cold = binned.join(broadcast(oversized), Seq("bin"), "left_anti")
    val a = cold.select(col("bin"), col("id").as("id_a"),
      col("start_ts").as("s_a"), col("end_ts").as("e_a"))
    val b = cold.select(col("bin"), col("id").as("id_b"),
      col("start_ts").as("s_b"), col("end_ts").as("e_b"))
    val coldPairs = a.join(b, Seq("bin"))
      .filter(col("id_a") < col("id_b") && overlaps)
      .select(col("id_a"), col("id_b"), overlapUs)

    // --- hot-bin path: salted block self-join. Row with salt g serves
    // as the LEFT of blocks (g, j≥g) and the RIGHT of blocks (i≤g, g):
    // every unordered pair meets in exactly block (min(g), max(g)), and
    // each of the s(s+1)/2 blocks holds ~1/s of the bin per side.
    val s = hotBinSplits
    val hot = binned.join(broadcast(oversized), Seq("bin"), "left_semi")
      .withColumn("g", pmod(hash(col("id")), lit(s)))
    val hotA = hot.select(col("bin"), col("id").as("id_a"),
        col("start_ts").as("s_a"), col("end_ts").as("e_a"),
        col("g").as("blk_i"), explode(sequence(col("g"), lit(s - 1))).as("blk_j"))
    val hotB = hot.select(col("bin"), col("id").as("id_b"),
        col("start_ts").as("s_b"), col("end_ts").as("e_b"),
        explode(sequence(lit(0), col("g"))).as("blk_i"), col("g").as("blk_j"))
    val hotPairs = hotA.join(hotB, Seq("bin", "blk_i", "blk_j"))
      .filter(col("id_a") =!= col("id_b") && overlaps)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"), overlapUs)

    // a pair can meet in several bins, in a hot AND a cold bin, or in a
    // guard path twice — one global dedupe settles all of it (overlap_us
    // is a pure function of the pair, identical from every path)
    coldPairs.unionByName(hotPairs).unionByName(longPairs)
      .dropDuplicates("id_a", "id_b")
      .orderBy("id_a", "id_b")
  }

  /** Session time-overlap pairs across the events table: sessionize,
    * collapse each (user, session) to its `[first, last]` event span,
    * and find all concurrent session pairs. `id = user_id·10⁶ + seq`.
    * Default bin = 5 min: sessions are mostly sub-gap-length (many are
    * single events), and candidate volume is Σ(per-bin count)² — on the
    * testdata 1-hour bins make 13M candidates for 151k true pairs,
    * 5-minute bins ~1M. (Result is bin-invariant; width is only cost.)
    */
  def sessionOverlaps(events: DataFrame, binMicros: Long = 300L * 1000000): DataFrame = {
    val sessions = Sessionize.sessionize(events)
      .groupBy("user_id", "session_seq")
      .agg(min("ts").as("start_ts"), max("ts").as("end_ts"))
      .select((col("user_id") * 1000000 + col("session_seq")).as("id"),
        col("start_ts"), col("end_ts"))
    selfOverlapPairs(sessions, binMicros)
  }
}
