package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Local HTTP stub for the zero-egress build — the httpmock analog the
  * reference's integration tests use (SURVEY §5). */
object TestHttp {

  final class Recorded {
    @volatile var headers: Map[String, String] = Map.empty
    @volatile var method: String = ""
    @volatile var body: String = ""
    @volatile var uri: String = ""
    @volatile var calls: Int = 0
  }

  def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  /** Start a server with the given routes, run `body(baseUrl)`, stop. */
  def withServer(routes: (String, HttpExchange => Unit)*)(body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, h) =>
      server.createContext(path, (ex: HttpExchange) => h(ex))
    }
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  /** Route that records the request and replies with `responseBody`. */
  def recording(rec: Recorded, responseBody: String)(ex: HttpExchange): Unit = {
    rec.synchronized {
      rec.calls += 1
      rec.method = ex.getRequestMethod
      rec.uri = ex.getRequestURI.toString
      rec.body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val hs = ex.getRequestHeaders
      rec.headers = hs.keySet().toArray(Array.empty[String])
        .map(k => k -> hs.getFirst(k)).toMap
    }
    respond(ex, 200, responseBody)
  }
}
