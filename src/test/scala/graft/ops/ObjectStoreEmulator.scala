package graft.ops

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress

/** In-process OBJECT-STORE EMULATOR for lease certification (r16
  * verdict #3 / advice): a real HTTP server (JDK `httpserver`) on an
  * ephemeral loopback port implementing the generation-preconditioned
  * protocol [[HttpConditionalLeaseStore]] speaks — the role
  * fake-gcs-server / MinIO play in a networked CI, runnable in a
  * zero-egress sandbox. Mutations are applied atomically under one
  * lock with a process-monotonic generation counter (the
  * strong-consistency contract both big stores publish); every
  * precondition failure is a server-side 412, absent objects 404.
  *
  * The emulator is deliberately the SERVER half of the protocol the
  * client encodes, written against the protocol table in
  * [[HttpConditionalLeaseStore]]'s doc, NOT against the client code —
  * a drift on either side fails the contract suite over the wire.
  */
final class ObjectStoreEmulator {

  private final case class Obj(content: Array[Byte], generation: Long)
  private val objects = scala.collection.mutable.HashMap[String, Obj]()
  private val nextGen = new java.util.concurrent.atomic.AtomicLong(0L)
  private val lock = new Object

  private val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    // a real thread pool: the contract's 16-way races must actually
    // overlap on the server, not serialize in an accept queue
    s.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    s.createContext("/object", handle _)
    s.start()
    s
  }

  def endpoint: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  def stop(): Unit = server.stop(0)

  private def nameOf(ex: HttpExchange): Option[String] = {
    val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    q.split('&').collectFirst {
      case p if p.startsWith("name=") =>
        java.net.URLDecoder.decode(p.drop(5), "UTF-8")
    }
  }

  private def precondition(ex: HttpExchange): Option[Long] =
    Option(ex.getRequestHeaders.getFirst("x-goog-if-generation-match"))
      .map(_.toLong)

  private def respond(ex: HttpExchange, status: Int,
      generation: Option[Long] = None, body: Array[Byte] = Array.emptyByteArray): Unit = {
    generation.foreach(g =>
      ex.getResponseHeaders.set("x-goog-generation", g.toString))
    if (body.isEmpty) {
      // httpserver convention: -1 = no body (204-style), 0 = chunked
      ex.sendResponseHeaders(status, -1)
    } else {
      ex.sendResponseHeaders(status, body.length.toLong)
      ex.getResponseBody.write(body)
    }
    ex.close()
  }

  private def handle(ex: HttpExchange): Unit =
    try {
      nameOf(ex) match {
        case None => respond(ex, 400)
        case Some(key) => ex.getRequestMethod match {
          case "GET" =>
            // reads are atomic snapshots of the (content, generation)
            // pair — the torn-read shape the r16 GCS advice named
            // cannot exist here by construction
            lock.synchronized(objects.get(key)) match {
              case Some(o) => respond(ex, 200, Some(o.generation), o.content)
              case None    => respond(ex, 404)
            }
          case "PUT" =>
            val body = ex.getRequestBody.readAllBytes()
            precondition(ex) match {
              case None => // unconditional PUT: always installs fresh
                val g = nextGen.incrementAndGet()
                lock.synchronized(objects.put(key, Obj(body, g)))
                respond(ex, 200, Some(g))
              case Some(expect) =>
                lock.synchronized {
                  val live = objects.get(key).map(_.generation).getOrElse(0L)
                  if (live != expect) None
                  else {
                    val g = nextGen.incrementAndGet()
                    objects.put(key, Obj(body, g))
                    Some(g)
                  }
                } match {
                  case Some(g) => respond(ex, 200, Some(g))
                  case None    => respond(ex, 412)
                }
            }
          case "DELETE" =>
            precondition(ex) match {
              case None =>
                val had = lock.synchronized(objects.remove(key)).isDefined
                respond(ex, if (had) 204 else 404)
              case Some(expect) =>
                lock.synchronized {
                  objects.get(key) match {
                    case None => 404
                    case Some(o) if o.generation != expect => 412
                    case Some(_) => objects.remove(key); 204
                  }
                } match { case code => respond(ex, code) }
            }
          case _ => respond(ex, 405)
        }
      }
    } catch {
      case _: Throwable => try respond(ex, 500) catch { case _: Throwable => () }
    }
}
