package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Object-store conditional-write lease backend (r14 verdict #1): the
  * protocol that makes the single-writer guard REAL on `s3a`/`gs`
  * warehouses — every acquire/heartbeat/reap/release is one
  * server-side compare-and-set over the store's public precondition
  * API. [[InMemoryLeaseStore]] is the spec stand-in, playing the role
  * RawLocalFileSystem plays for the HDFS rename protocol: same
  * atomicity contract, no cloud account.
  */
class CondLeaseSpec extends SparkSpec {

  private def freshStore = new InMemoryLeaseStore

  test("protocol routing: a registered conditional store upgrades an object-store scheme from refusal to atomic") {
    // unregistered: the loud refusal (the r14 posture), now naming the
    // conditional-store escape hatch before the last-resort opt-in
    val e = intercept[IllegalStateException] { Loader.leaseProtocolFor("s3a") }
    assert(e.getMessage.contains("no atomic") &&
      e.getMessage.contains("registerLeaseStore"), e.getMessage)
    Loader.registerLeaseStore("s3a", freshStore)
    try assert(Loader.leaseProtocolFor("s3a") == "conditional")
    finally Loader.unregisterLeaseStore("s3a")
    intercept[IllegalStateException] { Loader.leaseProtocolFor("s3a") }
    // file/hdfs keep their native protocols even when a store is
    // registered for an object-store scheme
    assert(Loader.leaseProtocolFor("file") == "link")
    assert(Loader.leaseProtocolFor("hdfs") == "rename")
  }

  test("acquire/refuse/reap/release round-trip: each transition is one CAS") {
    val store = freshStore
    val h = Loader.acquireCondLease(spark, "cond_t1", store)
    val key = Loader.leasePath(spark, "cond_t1").toString
    assert(store.get(key).exists(_._2 == h.gen), "acquire must install our lease")
    // fresh lease: a second acquirer is refused loudly, naming the owner
    val e = intercept[IllegalStateException] {
      Loader.acquireCondLease(spark, "cond_t1", store)
    }
    assert(e.getMessage.contains("being written"), e.getMessage)
    // release: conditional delete on our generation
    Loader.shutdownCondLease(h)
    assert(store.get(key).isEmpty, "release must delete the lease")
    // stale lease (dead writer): reaped by one replaceIf CAS
    store.putIfAbsent(key,
      s"app-dead-writer ${System.currentTimeMillis() - Loader.leaseTtlMs(spark) - 1000}")
    val h2 = Loader.acquireCondLease(spark, "cond_t1", store)
    assert(store.get(key).exists { case (c, g) =>
      g == h2.gen && c.startsWith(spark.sparkContext.applicationId + " ")
    }, "reap must atomically install our lease")
    Loader.shutdownCondLease(h2)
    // corrupt lease content fails safe as FRESH: refuse, never reap
    store.putIfAbsent(key, "garbage-no-timestamp")
    intercept[IllegalStateException] {
      Loader.acquireCondLease(spark, "cond_t1", store)
    }
    assert(store.get(key).exists(_._1 == "garbage-no-timestamp"))
    store.get(key).foreach { case (_, g) => store.deleteIf(key, g) }
  }

  test("concurrent reap of one stale lease: the CAS admits exactly one winner") {
    val store = freshStore
    val key = Loader.leasePath(spark, "cond_race").toString
    store.putIfAbsent(key,
      s"app-dead-writer ${System.currentTimeMillis() - Loader.leaseTtlMs(spark) - 1000}")
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[String, Loader.CondLeaseHandle]]()
    val start = new java.util.concurrent.CountDownLatch(1)
    val threads = (1 to 8).map { _ =>
      val t = new Thread(() => {
        start.await()
        try results.add(Right(Loader.acquireCondLease(spark, "cond_race", store)))
        catch { case e: IllegalStateException => results.add(Left(e.getMessage)) }
      })
      t.start(); t
    }
    start.countDown()
    threads.foreach(_.join(20000))
    val (losers, winners) = {
      import scala.jdk.CollectionConverters._
      results.asScala.toSeq.partitionMap(identity)
    }
    assert(winners.size == 1, s"exactly one reaper may win, got ${winners.size}")
    assert(losers.size == 7 && losers.forall(_.contains("being written")))
    assert(store.get(key).exists(_._2 == winners.head.gen),
      "the winner's lease is the live object")
    Loader.shutdownCondLease(winners.head)
  }

  test("heartbeat: a slow writer's lease stays fresh via generation CAS; shutdown releases") {
    val prevTtl = spark.conf.getOption("spark.graft.lease.ttlMs")
    spark.conf.set("spark.graft.lease.ttlMs", "1200") // beat period 300 ms
    try {
      val store = freshStore
      val key = Loader.leasePath(spark, "cond_hb").toString
      val h = Loader.acquireCondLease(spark, "cond_hb", store)
      val g0 = h.gen
      Loader.startCondHeartbeat(spark, "cond_hb", h)
      Thread.sleep(3000) // 2.5× TTL: an unrefreshed lease would be stale
      // still refused: the beats kept the timestamp fresh
      val e = intercept[IllegalStateException] {
        Loader.acquireCondLease(spark, "cond_hb", store)
      }
      assert(e.getMessage.contains("being written"), e.getMessage)
      assert(h.gen > g0, "beats must advance the generation")
      Loader.shutdownCondLease(h)
      assert(store.get(key).isEmpty, "shutdown must release")
    } finally {
      prevTtl match {
        case Some(v) => spark.conf.set("spark.graft.lease.ttlMs", v)
        case None    => spark.conf.unset("spark.graft.lease.ttlMs")
      }
    }
  }

  test("acquire content is byte-unique per acquisition (r15 advice: same-app same-millisecond leases)") {
    val store = freshStore
    // same app, immediate release + re-acquire: even if both land in
    // one millisecond, the acquire nonce keeps the contents distinct —
    // a stale handle's byte-exact ownership check (owns/ownsContent,
    // releaseCond's content-resync deleteIf) can never match, and so
    // never delete, the successor's live lease
    val h1 = Loader.acquireCondLease(spark, "cond_nonce", store)
    val c1 = h1.content
    Loader.shutdownCondLease(h1)
    val h2 = Loader.acquireCondLease(spark, "cond_nonce", store)
    try {
      assert(h2.content != c1,
        s"re-acquired lease content must be byte-distinct: $c1 vs ${h2.content}")
      assert(h2.content.split(' ').lift(2).exists(_.startsWith("acq")),
        s"acquire content must carry the nonce token: ${h2.content}")
    } finally Loader.shutdownCondLease(h2)
  }

  test("heartbeat beats at the ACQUIRE-time TTL, not the session TTL (r15 advice)") {
    // session TTL left at its (large) default: a heartbeat deriving its
    // period from session config would beat far too slowly for this
    // short custom-TTL lease and a reaper would steal it between beats
    val store = freshStore
    val h = Loader.acquireCondLease(spark, "cond_custom_ttl", store,
      ttlMs = 1200) // beat period must become 300 ms
    val g0 = h.gen
    Loader.startCondHeartbeat(spark, "cond_custom_ttl", h)
    try {
      Thread.sleep(3000) // 2.5× the custom TTL
      // a second acquirer honoring the same custom TTL is still
      // refused: the beats kept the timestamp fresher than 1200 ms
      val e = intercept[IllegalStateException] {
        Loader.acquireCondLease(spark, "cond_custom_ttl", store, ttlMs = 1200)
      }
      assert(e.getMessage.contains("being written"), e.getMessage)
      assert(h.gen > g0,
        "beats must have advanced the generation within the custom TTL")
    } finally Loader.shutdownCondLease(h)
  }

  test("heartbeat landed-but-unacked CAS: the next beat resyncs by content and keeps the lease") {
    val prevTtl = spark.conf.getOption("spark.graft.lease.ttlMs")
    spark.conf.set("spark.graft.lease.ttlMs", "1200")
    try {
      val inner = freshStore
      // a store whose FIRST replaceIf applies server-side but loses the
      // ack (throws after the mutation) — the classic SDK timeout shape
      val failures = new java.util.concurrent.atomic.AtomicInteger(1)
      val store = new ConditionalLeaseStore {
        def putIfAbsent(k: String, c: String) = inner.putIfAbsent(k, c)
        def get(k: String) = inner.get(k)
        def deleteIf(k: String, e: Long) = inner.deleteIf(k, e)
        def replaceIf(k: String, c: String, e: Long) = {
          val r = inner.replaceIf(k, c, e)
          if (r.isDefined && failures.getAndDecrement() > 0)
            throw new RuntimeException("simulated lost ack after server applied")
          r
        }
      }
      val key = Loader.leasePath(spark, "cond_unacked").toString
      val h = Loader.acquireCondLease(spark, "cond_unacked", store)
      Loader.startCondHeartbeat(spark, "cond_unacked", h)
      Thread.sleep(3000)
      // the lease must still be ours and fresh: the resync adopted the
      // landed write instead of reading it as a successor's lease
      intercept[IllegalStateException] {
        Loader.acquireCondLease(spark, "cond_unacked", store)
      }
      Loader.shutdownCondLease(h)
      assert(inner.get(key).isEmpty, "release must still work after a resync")
    } finally {
      prevTtl match {
        case Some(v) => spark.conf.set("spark.graft.lease.ttlMs", v)
        case None    => spark.conf.unset("spark.graft.lease.ttlMs")
      }
    }
  }

  test("stillOwned survives a beat landing mid-check: the pre-read snapshot is accepted (r15 review)") {
    val inner = freshStore
    var handleRef: Loader.CondLeaseHandle = null
    @volatile var armed = false
    // a store whose read races a beat: the caller sees the PRE-beat
    // state while the handle's bookkeeping has already moved on — the
    // exact window that spuriously aborted healthy rewrites on the
    // rename path before its r14 snapshot fix
    val racy = new ConditionalLeaseStore {
      def putIfAbsent(k: String, c: String) = inner.putIfAbsent(k, c)
      def replaceIf(k: String, c: String, e: Long) = inner.replaceIf(k, c, e)
      def deleteIf(k: String, e: Long) = inner.deleteIf(k, e)
      def get(k: String) = {
        val before = inner.get(k)
        if (armed && before.isDefined) {
          armed = false
          val (c0, g0) = before.get
          val next = c0 + " hbX"
          val g1 = inner.replaceIf(k, next, g0).get
          handleRef.gen = g1
          handleRef.content = next
        }
        before
      }
    }
    handleRef = Loader.acquireCondLease(spark, "cond_midcheck", racy)
    val guard = new Loader.CondLeaseGuard(handleRef)
    armed = true
    assert(guard.stillOwned(),
      "a beat landing between the store read and the compare must not " +
        "read as a lost lease")
    Loader.shutdownCondLease(handleRef)
  }

  test("withLease end-to-end on the conditional protocol: merge guarded, released; mid-rewrite reap refuses the destructive swap") {
    import spark.implicits._
    val store = freshStore
    val key = Loader.leasePath(spark, "cond_merge_t").toString
    spark.sql("DROP TABLE IF EXISTS cond_merge_t")
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "name", "v")
      .write.mode("overwrite").saveAsTable("cond_merge_t")
    Loader.condStoreOverride = Some(store)
    try {
      // happy path: the rewrite runs under a conditional lease and releases
      Loader.mergeInto(spark, "cond_merge_t",
        Seq((2L, "b2", 22.0)).toDF("k", "name", "v"), Seq("k"))
      assert(spark.table("cond_merge_t").filter(col("k") === 2L)
        .collect()(0).getString(1) == "b2")
      assert(store.get(key).isEmpty, "lease must release after the merge")
      // a foreign fresh lease in the store refuses the next writer
      val (_, gForeign) = {
        store.putIfAbsent(key, s"other-driver ${System.currentTimeMillis()}")
        store.get(key).get
      }
      val e = intercept[IllegalStateException] {
        Loader.mergeInto(spark, "cond_merge_t",
          Seq((1L, "x", 0.0)).toDF("k", "name", "v"), Seq("k"))
      }
      assert(e.getMessage.contains("being written"), e.getMessage)
      assert(store.deleteIf(key, gForeign))
      // mid-rewrite reap: the last-gate ownership check must refuse the
      // destructive swap — the successor's lease survives, the target
      // table survives
      val err = intercept[IllegalStateException] {
        Loader.withLease(spark, "cond_merge_t") {
          val (_, gMine) = store.get(key).get
          // a reaper replaces our lease mid-rewrite (we "starved")
          assert(store.replaceIf(key,
            s"successor-driver ${System.currentTimeMillis()}", gMine).isDefined)
          // unpartitioned target → swap path → assertStillOwned gate
          Loader.mergeInto(spark, "cond_merge_t",
            Seq((1L, "y", 1.0)).toDF("k", "name", "v"), Seq("k"))
        }
      }
      assert(err.getMessage.contains("lost mid-rewrite"), err.getMessage)
      assert(spark.catalog.tableExists("cond_merge_t"),
        "the refused swap must not have dropped the target")
      assert(spark.table("cond_merge_t").filter(col("k") === 1L)
        .collect()(0).getString(1) == "a", "the refused merge must not land")
      assert(store.get(key).exists(_._1.startsWith("successor-driver")),
        "the successor's lease must survive our shutdown untouched")
    } finally {
      Loader.condStoreOverride = None
      spark.sql("DROP TABLE IF EXISTS cond_merge_t")
      spark.sql(s"DROP TABLE IF EXISTS ${Loader.swapName("cond_merge_t")}")
    }
  }
}
