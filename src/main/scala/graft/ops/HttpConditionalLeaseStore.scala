package graft.ops

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** [[ConditionalLeaseStore]] over a GENERATION-PRECONDITIONED object
  * HTTP protocol — the portable core both big stores expose (GCS:
  * `x-goog-if-generation-match` on the XML API / `ifGenerationMatch`
  * on the JSON API; S3: `If-Match`/`If-None-Match`), reduced to the
  * four SPI calls, each exactly ONE round trip:
  *
  *   | SPI            | request                                            | success | refusal |
  *   |----------------|----------------------------------------------------|---------|---------|
  *   | putIfAbsent    | `PUT /object?name=k`, `x-goog-if-generation-match: 0` | 200 + `x-goog-generation` | 412 |
  *   | get            | `GET /object?name=k`                               | 200 + body + generation header | 404 |
  *   | replaceIf      | `PUT /object?name=k`, `x-goog-if-generation-match: g` | 200 + new generation | 412 (404 ≡ absent) |
  *   | deleteIf       | `DELETE /object?name=k`, same header               | 2xx | 412 / 404 |
  *
  * Unlike the reflective SDK shims ([[ObjectStoreLeaseStores]], which
  * cannot even construct without the vendor jars), this adapter is
  * pure JDK (`java.net.http`) and therefore CERTIFIABLE in-tree: the
  * `HttpLeaseStoreContractSpec` runs the full
  * `ConditionalLeaseStoreContract` (CAS semantics, 16-way races, the
  * Loader protocol matrix) against an in-process emulator over REAL
  * loopback sockets — response-code mapping, header parsing, and
  * concurrency exercised for real, not modeled by a HashMap. The
  * `ExternalLeaseStoreContractSpec` profile re-runs the same suite
  * against any deployed endpoint speaking this protocol (set
  * `GRAFT_LEASE_HTTP_ENDPOINT`; skipped otherwise) — the r16 advice's
  * emulator-certification slot.
  *
  * The object name travels as a QUERY PARAMETER (`?name=`), not a
  * path segment: lease keys are full store paths (slashes, colons) and
  * query encoding round-trips them without path-normalization hazards.
  *
  * Any non-(2xx/404/412) status is thrown, never mapped to a refusal:
  * a 5xx mapped to `None` would read as "lease held by someone else"
  * and silently stall a writer that should retry or crash loudly.
  */
final class HttpConditionalLeaseStore(endpoint: String) extends ConditionalLeaseStore {

  private val client = HttpClient.newHttpClient()
  private val base = endpoint.stripSuffix("/")

  private def uri(key: String): URI =
    URI.create(base + "/object?name=" +
      java.net.URLEncoder.encode(key, "UTF-8"))

  private def genOf(resp: HttpResponse[_]): Long =
    resp.headers.firstValue("x-goog-generation").map[Long](_.toLong)
      .orElseThrow(() => new IllegalStateException(
        s"store response ${resp.statusCode} carried no x-goog-generation header"))

  private def put(key: String, content: String, expect: Long): Option[Long] = {
    val req = HttpRequest.newBuilder(uri(key))
      .header("x-goog-if-generation-match", expect.toString)
      .PUT(HttpRequest.BodyPublishers.ofString(content, java.nio.charset.StandardCharsets.UTF_8))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.discarding())
    resp.statusCode() match {
      case ok if ok / 100 == 2 => Some(genOf(resp))
      case 412 | 404           => None
      case other => throw new IllegalStateException(
        s"conditional PUT $key returned HTTP $other")
    }
  }

  def putIfAbsent(key: String, content: String): Option[Long] =
    put(key, content, 0L)

  def replaceIf(key: String, content: String, expect: Long): Option[Long] =
    // expect==0 means create-if-absent in this protocol; a replace
    // holds a live generation by contract, which is never 0
    if (expect == 0L) None else put(key, content, expect)

  def get(key: String): Option[(String, Long)] = {
    val req = HttpRequest.newBuilder(uri(key)).GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString(
      java.nio.charset.StandardCharsets.UTF_8))
    resp.statusCode() match {
      case ok if ok / 100 == 2 => Some((resp.body(), genOf(resp)))
      case 404                 => None
      case other => throw new IllegalStateException(
        s"GET $key returned HTTP $other")
    }
  }

  def deleteIf(key: String, expect: Long): Boolean = {
    val req = HttpRequest.newBuilder(uri(key))
      .header("x-goog-if-generation-match", expect.toString)
      .DELETE().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.discarding())
    resp.statusCode() match {
      case ok if ok / 100 == 2 => true
      case 412 | 404           => false
      case other => throw new IllegalStateException(
        s"conditional DELETE $key returned HTTP $other")
    }
  }
}
