package graft.core

import org.apache.spark.sql.DataFrame

import java.util.concurrent.ConcurrentLinkedQueue

/** Lifecycle registry for DataFrames the engine pins with `persist()`.
  *
  * Several operators (LSH banded tables, inverted gram indexes, binned
  * intervals) materialize an intermediate that feeds 2–3 consumers of
  * the SAME query plan; without `persist` the expensive signature
  * expressions re-evaluate per consumer. But the query builders return
  * lazy plans — the builder cannot unpersist before the caller's action
  * has run, so a bare `persist()` pins the table for the session
  * lifetime (an unbounded leak in a long-lived session running many
  * queries).
  *
  * Contract: builders call [[persist]] instead of `df.persist()`; the
  * consumer runs its action, then calls [[releaseAll]] (as `graft.Bench`
  * and `graft.Verify` do between queries). At cluster scale the
  * equivalent move is checkpointing the intermediate to storage once
  * and reading it back — same lifecycle, durable medium.
  */
object CacheScope {

  private val tracked = new ConcurrentLinkedQueue[DataFrame]()

  /** MEMORY_AND_DISK-persist `df` and register it for later release. */
  def persist(df: DataFrame): DataFrame = {
    val p = df.persist()
    tracked.add(p)
    p
  }

  /** Register an ALREADY-persisted DataFrame for later release (for
    * iterative operators that manage materialization themselves but
    * want scope-level cleanup of their final state).
    */
  def track(df: DataFrame): DataFrame = {
    tracked.add(df)
    df
  }

  /** Number of currently tracked (not yet released) handles. */
  def trackedCount: Int = tracked.size()

  /** Unpersist every tracked DataFrame (idempotent; safe if a handle
    * was never materialized or was already dropped by `clearCache`).
    */
  def releaseAll(): Unit = {
    var d = tracked.poll()
    while (d != null) {
      try {
        d.unpersist(blocking = false)
        // localCheckpoint'd handles pin at RDD level, invisible to
        // Dataset.unpersist — release those blocks too
        org.apache.spark.sql.GraftBridge.unpersistLocalCheckpoint(d)
      } catch { case _: Throwable => () }
      d = tracked.poll()
    }
  }

  /** Run `body` (which should END IN AN ACTION — the scope cannot help
    * a lazy plan that escapes it), then release everything persisted
    * during it. For library callers who want try/finally hygiene.
    */
  def scoped[T](body: => T): T =
    try body finally releaseAll()
}
