package graft

import java.net.InetSocketAddress
import java.time.Duration
import com.sun.net.httpserver.HttpServer
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{FeedConfig, FeedSource, HttpFeedSource}

/** Loopback coverage of the REAL HTTP client path (VERDICT_r08 next
  * #5): until now `HttpFeedSource` was only exercised through the
  * file-backed fake. A JDK-built-in HttpServer bound to 127.0.0.1
  * (zero network egress) drives the actual client through its
  * contract — 200 body passthrough, Bearer-token and custom-header
  * injection, ≥ 400 as an exception (which fetchWithRetry converts to
  * an error FetchResult), and the request timeout. */
class HttpFeedSourceSpec extends AnyFunSuite {

  /** One server per test: handlers record what the client actually
    * sent; port 0 = kernel-assigned, never a fixed-port collision. */
  private def withServer(routes: (String, com.sun.net.httpserver.HttpExchange => Unit)*)(
      body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, h) =>
      server.createContext(path, exchange => try h(exchange) finally exchange.close())
    }
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def respond(ex: com.sun.net.httpserver.HttpExchange,
      status: Int, payload: Array[Byte]): Unit = {
    ex.sendResponseHeaders(status, if (payload.isEmpty) -1 else payload.length)
    if (payload.nonEmpty) ex.getResponseBody.write(payload)
  }

  test("200: body bytes pass through; Bearer token and custom headers reach the wire") {
    val seen = new java.util.concurrent.atomic.AtomicReference[(String, String)]()
    val payload = Array.tabulate(300)(_.toByte)
    withServer("/feed" -> { ex =>
      seen.set((ex.getRequestHeaders.getFirst("Authorization"),
        ex.getRequestHeaders.getFirst("X-Graft")))
      respond(ex, 200, payload)
    }) { base =>
      val got = new HttpFeedSource().fetch(FeedConfig("f1", s"$base/feed",
        apiToken = Some("sekrit"), headers = Map("X-Graft" -> "on")))
      assert(got.toSeq == payload.toSeq)
      assert(seen.get() == (("Bearer sekrit", "on")))
    }
  }

  test("no token: no Authorization header is sent") {
    val auth = new java.util.concurrent.atomic.AtomicReference[String]("unset")
    withServer("/feed" -> { ex =>
      auth.set(ex.getRequestHeaders.getFirst("Authorization"))
      respond(ex, 200, Array[Byte](1))
    }) { base =>
      new HttpFeedSource().fetch(FeedConfig("f1", s"$base/feed"))
      assert(auth.get() == null)
    }
  }

  test("non-200 statuses throw with the code; fetchWithRetry converts to an error result") {
    withServer(
      "/gone"  -> (respond(_, 404, Array.emptyByteArray)),
      "/boom"  -> (respond(_, 500, Array.emptyByteArray))) { base =>
      val src = new HttpFeedSource()
      val e1 = intercept[RuntimeException](src.fetch(FeedConfig("f4", s"$base/gone")))
      assert(e1.getMessage.contains("404") && e1.getMessage.contains("f4"))
      val e2 = intercept[RuntimeException](src.fetch(FeedConfig("f5", s"$base/boom")))
      assert(e2.getMessage.contains("500"))
      // the pipeline's failure-isolation wrapper: error becomes data
      val r = FeedSource.fetchWithRetry(src, FeedConfig("f5", s"$base/boom"),
        retries = 1, delayMs = 1)
      assert(r.payload.isEmpty && r.error.exists(_.contains("500")))
    }
  }

  test("a stalled response hits the request timeout, not a hang") {
    val release = new java.util.concurrent.CountDownLatch(1)
    withServer("/slow" -> { ex =>
      release.await(10, java.util.concurrent.TimeUnit.SECONDS) // never sends
      respond(ex, 200, Array[Byte](1))
    }) { base =>
      val src = new HttpFeedSource(Duration.ofMillis(250))
      val t0 = System.nanoTime()
      intercept[java.net.http.HttpTimeoutException](
        src.fetch(FeedConfig("f6", s"$base/slow")))
      release.countDown()
      assert((System.nanoTime() - t0) / 1e9 < 5, "timed out promptly")
    }
  }
}
