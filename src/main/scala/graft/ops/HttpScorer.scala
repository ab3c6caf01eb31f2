package graft.ops

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import graft.ops.ExternalScorer.{Scored, Touch}
import graft.ops.WireJson._

/** S6 — the real HTTP transport for the external-scorer boundary
  * (ExternalScorer.ScoreFn). The reference POSTs journey chunks to an
  * IHC API and reads scores back from the response body
  * (api_client.py:32–65); this is that request/response cycle on the JDK
  * HTTP client, shaped to run INSIDE `mapPartitions`:
  *
  *  - one instance is serialized into the task closure; the underlying
  *    `HttpClient` is `@transient lazy`, so each executor JVM builds its
  *    own client on first use (a client is not serializable and must not
  *    cross the driver/executor boundary);
  *  - a thrown error (non-2xx, timeout, connect refused) propagates to
  *    ExternalScorer's retry loop — backoff, bounded attempts, and the
  *    partial-failure channel live THERE, not here, so every transport
  *    shares one failure contract;
  *  - ids ride through BigDecimal-backed JSON (WireJson), so 64-bit keys
  *    survive the wire exactly.
  *
  * Wire contract (one request per batch):
  * {{{
  *   POST url
  *     {"customer_journeys": [[{"conversion_id":1,"session_id":2,"timestamp":3,
  *       "holder_engagement":0,"closer_engagement":1,"impression_interaction":0}, ...], ...]}
  *   200 OK
  *     {"values": [{"conversion_id":1,"session_id":2,"ihc":0.25}, ...]}
  * }}}
  */
final class HttpScoreFn(
    url: String,
    connectTimeout: Duration = Duration.ofSeconds(5),
    requestTimeout: Duration = Duration.ofSeconds(30))
  extends (Seq[Seq[Touch]] => Seq[Scored])
  with Serializable {

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(connectTimeout).build()

  override def apply(batch: Seq[Seq[Touch]]): Seq[Scored] = {
    val journeysJson = arr(batch.map { journey =>
      arr(journey.map { t =>
        obj(
          "conversion_id" -> num(t.conversion_id),
          "session_id" -> num(t.session_id),
          "timestamp" -> num(t.ts),
          "holder_engagement" -> num(t.holder_engagement),
          "closer_engagement" -> num(t.closer_engagement),
          "impression_interaction" -> num(t.impression_interaction))
      })
    })
    val body = render(obj("customer_journeys" -> journeysJson))
    val request = HttpRequest.newBuilder(URI.create(url))
      .timeout(requestTimeout)
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .build()
    val response = client.send(request, HttpResponse.BodyHandlers.ofString())
    if (response.statusCode() / 100 != 2) {
      // the body tail is part of the error so the retry-exhausted message
      // in the partial-failure channel says WHY the API refused
      throw new RuntimeException(
        s"scorer API returned HTTP ${response.statusCode()}: ${response.body().take(200)}")
    }
    parse(response.body())("values").arr.map { v =>
      Scored(
        v("conversion_id").num.toLongExact,
        v("session_id").num.toLongExact,
        v("ihc").num.toDouble)
    }
  }
}
