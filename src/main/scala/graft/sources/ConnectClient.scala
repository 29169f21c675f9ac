package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** S5: Debezium Connect REST control — pause/resume the connector around
  * DDL application (client/debezium.go:23-43; API struct :10-20).
  *
  * `resumeWithRetry` reproduces the reference's recursive 1 s retry until
  * HTTP 202 (main.go:426-433), with the backoff injectable for tests.
  */
final class ConnectClient(baseUrl: String, connector: String,
    client: HttpClient = ConnectClient.defaultClient) {

  private def put(action: String): Int = {
    val req = HttpRequest.newBuilder()
      .uri(URI.create(s"$baseUrl/connectors/$connector/$action"))
      .timeout(Duration.ofSeconds(10))
      .PUT(HttpRequest.BodyPublishers.noBody())
      .build()
    client.send(req, HttpResponse.BodyHandlers.discarding()).statusCode()
  }

  /** Pause; the reference errors unless the Connect API answers 202. */
  def pause(): Boolean = put("pause") == 202

  /** Resume with unbounded retry at `backoffMillis` until 202. */
  def resumeWithRetry(backoffMillis: Long = 1000L, maxAttempts: Int = Int.MaxValue): Boolean = {
    var attempts = 0
    while (attempts < maxAttempts) {
      attempts += 1
      try { if (put("resume") == 202) return true }
      catch { case _: java.io.IOException => () }
      Thread.sleep(backoffMillis)
    }
    false
  }
}

object ConnectClient {
  lazy val defaultClient: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(5)).build()
}
