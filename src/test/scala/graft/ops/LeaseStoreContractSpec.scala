package graft.ops

import graft.SparkSpec

/** CERTIFICATION suite for [[ConditionalLeaseStore]] implementations
  * (r15 verdict #4): the store-level CAS semantics the conditional
  * lease protocol assumes, plus the full protocol matrix run THROUGH
  * [[Loader]] (acquire/refuse/reap/release, heartbeat keep-alive at a
  * custom TTL, landed-but-unacked resync, N-way acquire race). A
  * production shim — an S3 `If-Match`/`If-None-Match` or GCS
  * `ifGenerationMatch` SDK adapter ([[ObjectStoreLeaseStores]]) — is
  * certified by subclassing with its own `newStore()` against a real
  * bucket; [[InMemoryLeaseStore]] is the reference instance
  * ([[InMemoryLeaseStoreContractSpec]]), playing the role
  * RawLocalFileSystem plays for the HDFS rename protocol.
  *
  * Every test draws fresh keys/tables from `storeName`, so one store
  * instance may back all tests (object stores have no cheap "fresh
  * bucket" — the in-memory reference still hands out fresh instances).
  */
abstract class ConditionalLeaseStoreContract extends SparkSpec {

  /** Short unique name, used in test titles and key prefixes. */
  def storeName: String

  /** A store to certify. Called once per test; implementations backed
    * by one shared remote bucket may return the same instance.
    */
  def newStore(): ConditionalLeaseStore

  private def k(name: String) = s"contract/$storeName/$name"
  private def t(name: String) = s"contract_${storeName}_$name"

  test(s"[$storeName] putIfAbsent: creates exactly once, second writer refused, content intact") {
    val s = newStore()
    val g = s.putIfAbsent(k("put"), "alpha")
    assert(g.isDefined, "create on an absent key must succeed")
    assert(s.get(k("put")).contains(("alpha", g.get)),
      "get must return the created content at the returned generation")
    assert(s.putIfAbsent(k("put"), "beta").isEmpty,
      "create on a present key must fail")
    assert(s.get(k("put")).contains(("alpha", g.get)),
      "a failed create must not disturb the live object")
  }

  test(s"[$storeName] replaceIf: generation-gated; failure leaves the object untouched") {
    val s = newStore()
    val g0 = s.putIfAbsent(k("rep"), "v0").get
    assert(s.replaceIf(k("rep"), "vX", g0 + 999).isEmpty,
      "stale-generation replace must fail")
    assert(s.get(k("rep")).contains(("v0", g0)),
      "a failed replace must not disturb the live object")
    val g1 = s.replaceIf(k("rep"), "v1", g0)
    assert(g1.isDefined, "matching-generation replace must succeed")
    assert(g1.get != g0, "a successful replace must mint a fresh generation")
    assert(s.get(k("rep")).contains(("v1", g1.get)))
    assert(s.replaceIf(k("rep"), "vY", g0).isEmpty,
      "the superseded generation must no longer authorize writes")
    assert(s.replaceIf(k("rep-absent"), "v", 1L).isEmpty,
      "replace on an absent key must fail")
  }

  test(s"[$storeName] deleteIf: generation-gated; failure leaves the object untouched") {
    val s = newStore()
    val g0 = s.putIfAbsent(k("del"), "v0").get
    assert(!s.deleteIf(k("del"), g0 + 999),
      "stale-generation delete must fail")
    assert(s.get(k("del")).contains(("v0", g0)),
      "a failed delete must not disturb the live object")
    assert(s.deleteIf(k("del"), g0), "matching-generation delete must succeed")
    assert(s.get(k("del")).isEmpty)
    assert(!s.deleteIf(k("del"), g0), "delete on an absent key must fail")
  }

  test(s"[$storeName] generations are never reused across a key's lifecycle") {
    val s = newStore()
    var seen = Set.empty[Long]
    var g = s.putIfAbsent(k("gen"), "c0").get
    seen += g
    for (i <- 1 to 5) {
      g = s.replaceIf(k("gen"), s"c$i", g).get
      assert(!seen(g), s"generation $g reused — a stale handle holding it " +
        "would pass a CAS it must fail")
      seen += g
    }
    assert(s.deleteIf(k("gen"), g))
    // recreate: the fresh object's generation must not equal any prior
    // one, or a pre-delete handle could mutate the successor
    val g2 = s.putIfAbsent(k("gen"), "reborn").get
    assert(!seen(g2), s"post-recreate generation $g2 reused")
  }

  test(s"[$storeName] each CAS admits exactly one winner under an N-way race") {
    val s = newStore()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    def race[T](body: => T): Seq[T] = {
      val fs = (1 to 16).map(_ => scala.concurrent.Future(body))
      fs.map(f => scala.concurrent.Await.result(
        f, scala.concurrent.duration.Duration(30, "s")))
    }
    try {
      val puts = race(s.putIfAbsent(k("race"), "mine"))
      assert(puts.count(_.isDefined) == 1,
        s"putIfAbsent admitted ${puts.count(_.isDefined)} winners")
      val g0 = puts.flatten.head
      val reps = race(s.replaceIf(k("race"), "theirs", g0))
      assert(reps.count(_.isDefined) == 1,
        s"replaceIf admitted ${reps.count(_.isDefined)} winners on one generation")
      val g1 = reps.flatten.head
      val dels = race(s.deleteIf(k("race"), g1))
      assert(dels.count(identity) == 1,
        s"deleteIf admitted ${dels.count(identity)} winners on one generation")
    } finally pool.shutdownNow()
  }

  test(s"[$storeName] protocol: acquire/refuse/reap/release round-trip through Loader") {
    val s = newStore()
    val h = Loader.acquireCondLease(spark, t("rt"), s)
    val key = Loader.leasePath(spark, t("rt")).toString
    assert(s.get(key).exists(_._2 == h.gen))
    val e = intercept[IllegalStateException] {
      Loader.acquireCondLease(spark, t("rt"), s)
    }
    assert(e.getMessage.contains("being written"), e.getMessage)
    Loader.shutdownCondLease(h)
    assert(s.get(key).isEmpty, "release must delete the lease")
    // stale lease (dead writer): reaped by one CAS
    s.putIfAbsent(key,
      s"app-dead ${System.currentTimeMillis() - Loader.leaseTtlMs(spark) - 1000}")
    val h2 = Loader.acquireCondLease(spark, t("rt"), s)
    assert(s.get(key).exists(_._2 == h2.gen), "reap must install our lease")
    Loader.shutdownCondLease(h2)
  }

  test(s"[$storeName] protocol: heartbeat keeps a short custom-TTL lease alive; shutdown releases") {
    val s = newStore()
    val h = Loader.acquireCondLease(spark, t("hb"), s, ttlMs = 1200)
    val g0 = h.gen
    Loader.startCondHeartbeat(spark, t("hb"), h)
    try {
      Thread.sleep(3000) // 2.5× the custom TTL
      intercept[IllegalStateException] {
        Loader.acquireCondLease(spark, t("hb"), s, ttlMs = 1200)
      }
      assert(h.gen > g0, "beats must advance the generation")
    } finally Loader.shutdownCondLease(h)
    assert(s.get(Loader.leasePath(spark, t("hb")).toString).isEmpty,
      "shutdown must release")
  }

  test(s"[$storeName] protocol: a landed-but-unacked beat resyncs instead of reading as a successor") {
    val prevTtl = spark.conf.getOption("spark.graft.lease.ttlMs")
    spark.conf.set("spark.graft.lease.ttlMs", "1200")
    try {
      val inner = newStore()
      val failures = new java.util.concurrent.atomic.AtomicInteger(1)
      // the classic SDK-timeout shape: the server applies the CAS, the
      // client throws — certification requires the protocol to survive
      // it over THIS store's semantics
      val s = new ConditionalLeaseStore {
        def putIfAbsent(key: String, c: String) = inner.putIfAbsent(key, c)
        def get(key: String) = inner.get(key)
        def deleteIf(key: String, e: Long) = inner.deleteIf(key, e)
        def replaceIf(key: String, c: String, e: Long) = {
          val r = inner.replaceIf(key, c, e)
          if (r.isDefined && failures.getAndDecrement() > 0)
            throw new RuntimeException("simulated lost ack after server applied")
          r
        }
      }
      val h = Loader.acquireCondLease(spark, t("unacked"), s)
      Loader.startCondHeartbeat(spark, t("unacked"), h)
      Thread.sleep(3000)
      intercept[IllegalStateException] {
        Loader.acquireCondLease(spark, t("unacked"), s)
      }
      Loader.shutdownCondLease(h)
      assert(inner.get(Loader.leasePath(spark, t("unacked")).toString).isEmpty,
        "release must still work after a resync")
    } finally {
      prevTtl match {
        case Some(v) => spark.conf.set("spark.graft.lease.ttlMs", v)
        case None    => spark.conf.unset("spark.graft.lease.ttlMs")
      }
    }
  }
}

/** The reference certification: [[InMemoryLeaseStore]] must pass the
  * exact suite a production S3/GCS shim is held to.
  */
class InMemoryLeaseStoreContractSpec extends ConditionalLeaseStoreContract {
  def storeName: String = "inmem"
  def newStore(): ConditionalLeaseStore = new InMemoryLeaseStore
}

/** The EMULATED-BACKEND certification (r16 verdict #3): the pure-JDK
  * HTTP adapter over an in-process object-store emulator — the whole
  * contract (CAS semantics, 16-way races, the Loader protocol matrix,
  * the lost-ack resync) runs over REAL loopback sockets: status-code
  * mapping, generation-header parsing, and server-side preconditions
  * exercised for real, the role fake-gcs-server plays in a networked
  * CI. One emulator backs every test (the shared-bucket posture the
  * contract documents).
  */
class HttpLeaseStoreContractSpec extends ConditionalLeaseStoreContract {
  private lazy val emulator = new ObjectStoreEmulator
  def storeName: String = "http"
  def newStore(): ConditionalLeaseStore =
    new HttpConditionalLeaseStore(emulator.endpoint)
  override def afterAll(): Unit = {
    try emulator.stop() finally super.afterAll()
  }
}

/** OPT-IN external-endpoint certification: point
  * `GRAFT_LEASE_HTTP_ENDPOINT` at any deployed server speaking the
  * generation-preconditioned protocol ([[HttpConditionalLeaseStore]]'s
  * doc table) and the full contract runs against it; without the env
  * the suite cancels (the r16-advice opt-in profile shape).
  */
class ExternalLeaseStoreContractSpec extends ConditionalLeaseStoreContract {
  private val endpoint = sys.env.get("GRAFT_LEASE_HTTP_ENDPOINT")
  def storeName: String = "ext"
  def newStore(): ConditionalLeaseStore = {
    assume(endpoint.nonEmpty,
      "GRAFT_LEASE_HTTP_ENDPOINT not set - external certification skipped")
    new HttpConditionalLeaseStore(endpoint.get)
  }
}

/** The vendor shims are reflective: without the SDK on the classpath
  * they must fail AT CONSTRUCTION, naming the missing artifact and the
  * certification suite — never limp along to a runtime
  * NoClassDefFoundError mid-lease.
  */
class ObjectStoreLeaseStoresSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("GCS shim without the SDK: loud construction failure naming artifact + certification") {
    val e = intercept[IllegalStateException] {
      new GcsConditionalLeaseStore(new Object, "bucket")
    }
    assert(e.getMessage.contains("google-cloud-storage") &&
      e.getMessage.contains("ConditionalLeaseStoreContract"), e.getMessage)
  }

  test("S3 shim without the SDK: loud construction failure naming artifact + certification") {
    val e = intercept[IllegalStateException] {
      new S3ConditionalLeaseStore(new Object, "bucket")
    }
    assert(e.getMessage.contains("software.amazon.awssdk") &&
      e.getMessage.contains("ConditionalLeaseStoreContract"), e.getMessage)
  }

  test("S3 ETag→generation digest: deterministic, quote/dash-insensitive") {
    import ObjectStoreLeaseStores.s3GenOf
    assert(s3GenOf("\"0123456789abcdef0000\"") == s3GenOf("0123-456789ABcdef"),
      "quotes, dashes, case, and the post-16 tail must not change the token")
    assert(s3GenOf("0123456789abcdef") ==
      java.lang.Long.parseUnsignedLong("0123456789abcdef", 16))
    assert(s3GenOf("\"d41d8cd98f00b204e9800998ecf8427e\"") !=
      s3GenOf("\"a51d8cd98f00b204e9800998ecf8427e\""),
      "distinct leading digits must map to distinct tokens")
    assert(s3GenOf("") == 0L && s3GenOf("\"\"") == 0L)
  }
}
