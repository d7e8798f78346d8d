package graft.ops

/** SPI for OBJECT-STORE conditional writes — the portable subset of
  * the public preconditioned-mutation APIs the two big object stores
  * expose (S3: `If-None-Match`/`If-Match` conditional PUT and DELETE;
  * GCS: `ifGenerationMatch` / `x-goog-if-generation-match`
  * preconditions on insert, rewrite, and delete). Rename on these
  * stores is copy+delete, so the Hadoop rename-based lease protocol
  * CANNOT be atomic there and [[Loader.leaseProtocolFor]] refuses the
  * scheme loudly — but a store implementing these four conditional
  * operations gives the single-writer lease a protocol that is
  * STRICTLY STRONGER than the rename one: every acquire, heartbeat
  * refresh, TTL reap, and release is a single server-side
  * compare-and-set, with none of the claim-aside/restore races the
  * rename protocol has to fence (no `.reaped.` forensics files, no
  * DOUBLE-ADMIT in-flight states).
  *
  * Register an implementation per URI scheme with
  * [[Loader.registerLeaseStore]] — production wires a thin shim over
  * the vendor SDK (each method is one HTTP call); specs and local
  * runs wire [[InMemoryLeaseStore]], whose ConcurrentHashMap CAS
  * semantics are exactly the strong-consistency contract both stores
  * publish.
  *
  * `generation` is the store's object version token (GCS generation
  * number; for S3 a shim can use the ETag, mapped to a long, or
  * x-amz-version-id on versioned buckets): every successful write
  * returns a fresh one and every conditional op compares server-side,
  * atomically. Implementations must be thread-safe.
  */
trait ConditionalLeaseStore {

  /** Create iff absent (S3 `If-None-Match: *` PUT / GCS
    * `ifGenerationMatch=0`): `Some(generation)` on success, `None` if
    * the object already exists.
    */
  def putIfAbsent(key: String, content: String): Option[Long]

  /** Read content + generation; `None` if absent. */
  def get(key: String): Option[(String, Long)]

  /** Replace iff the live generation equals `expect` (S3 `If-Match`
    * PUT / GCS `ifGenerationMatch=g`): `Some(newGeneration)`, or
    * `None` on precondition failure or absence.
    */
  def replaceIf(key: String, content: String, expect: Long): Option[Long]

  /** Delete iff the live generation equals `expect` (conditional
    * DELETE); `false` on precondition failure or absence.
    */
  def deleteIf(key: String, expect: Long): Boolean
}

/** Reference [[ConditionalLeaseStore]]: a JVM-local map with the exact
  * atomicity contract the object-store preconditions give — every
  * mutation is one CAS on the (content, generation) pair. Used by the
  * lease specs as the object-store stand-in (the role
  * RawLocalFileSystem plays for the HDFS rename protocol) and usable
  * as a single-driver fallback; it is NOT a cross-driver guard (state
  * is per-JVM — production must wire the real store's API).
  */
final class InMemoryLeaseStore extends ConditionalLeaseStore {
  private val objs =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]()
  private val nextGen = new java.util.concurrent.atomic.AtomicLong(0L)

  def putIfAbsent(key: String, content: String): Option[Long] = {
    val g = nextGen.incrementAndGet()
    if (objs.putIfAbsent(key, (content, g)) == null) Some(g) else None
  }

  def get(key: String): Option[(String, Long)] = Option(objs.get(key))

  def replaceIf(key: String, content: String, expect: Long): Option[Long] = {
    val cur = objs.get(key)
    if (cur == null || cur._2 != expect) None
    else {
      val g = nextGen.incrementAndGet()
      if (objs.replace(key, cur, (content, g))) Some(g) else None
    }
  }

  def deleteIf(key: String, expect: Long): Boolean = {
    val cur = objs.get(key)
    cur != null && cur._2 == expect && objs.remove(key, cur)
  }
}
