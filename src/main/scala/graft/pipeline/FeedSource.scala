package graft.pipeline

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}
import java.time.Duration

/** Feed registry entry (ref: feeds_config.yaml:2-7, api_utils.py:38-55). */
final case class FeedConfig(
    id: String,
    url: String,
    apiToken: Option[String] = None,
    headers: Map[String, String] = Map.empty)

/** One fetch outcome — failures are data, not exceptions, so one bad
  * feed never kills the batch (T3, gtfs_rt_assets.py:86-94). */
final case class FetchResult(
    feedId: String, payload: Option[Array[Byte]], error: Option[String])

/** Source of raw GTFS-RT protobuf bytes (S3). Pluggable so tests run
  * file-backed with zero network (SURVEY.md §7.2.7). */
trait FeedSource {
  def fetch(feed: FeedConfig): Array[Byte]
}

/** Production HTTP source: 30 s timeout + status check + Bearer token
  * injection, mirroring api_utils.py:57-74,18-19. The timeout is
  * parameterized (default = the reference's 30 s) solely so the
  * loopback test can exercise the timeout path without a 30 s wait —
  * production callers use the default. */
final class HttpFeedSource(timeout: Duration = Duration.ofSeconds(30))
    extends FeedSource {
  private lazy val client = HttpClient.newBuilder()
    .connectTimeout(timeout).build()
  def fetch(feed: FeedConfig): Array[Byte] = {
    val b = HttpRequest.newBuilder(URI.create(feed.url))
      .timeout(timeout)
    feed.headers.foreach { case (k, v) => b.header(k, v) }
    feed.apiToken.foreach(t => b.header("Authorization", s"Bearer $t"))
    val resp = client.send(b.GET().build(), HttpResponse.BodyHandlers.ofByteArray())
    if (resp.statusCode() >= 400)
      throw new RuntimeException(s"HTTP ${resp.statusCode()} for feed ${feed.id}")
    resp.body()
  }
}

/** File-backed fake: url is a local path; a missing file or a path
  * ending in "!boom" simulates a failing feed. */
final class FileFeedSource extends FeedSource {
  def fetch(feed: FeedConfig): Array[Byte] = {
    if (feed.url.endsWith("!boom"))
      throw new RuntimeException(s"simulated fetch failure for ${feed.id}")
    Files.readAllBytes(Paths.get(feed.url))
  }
}

object FeedSource {
  /** Retry wrapper (T2): max `retries` attempts, fixed `delayMs` —
    * mirrors RetryPolicy(max_retries=3, delay=1) on the reference's
    * assets (gtfs_rt_assets.py:52,70,106). */
  def fetchWithRetry(src: FeedSource, feed: FeedConfig,
      retries: Int = 3, delayMs: Long = 1000): FetchResult = {
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= retries) {
      try return FetchResult(feed.id, Some(src.fetch(feed)), None)
      catch {
        case e: Throwable =>
          lastErr = e
          attempt += 1
          if (attempt <= retries) Thread.sleep(delayMs)
      }
    }
    FetchResult(feed.id, None, Some(lastErr.getMessage))
  }
}
