package graft.ops

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import com.fasterxml.jackson.databind.ObjectMapper
import graft.ops.ExternalScorer.{Scored, Touch}

import scala.jdk.CollectionConverters._

/** S6 — the real HTTP transport for the external-scorer boundary
  * (ExternalScorer.ScoreFn). The reference POSTs journey chunks to an
  * IHC API and reads scores back from the response body
  * (api_client.py:32–65); this is that request/response cycle on the JDK
  * HTTP client, shaped to run INSIDE `mapPartitions`:
  *
  *  - one instance is serialized into the task closure; the underlying
  *    `HttpClient` and Jackson mapper are `@transient lazy`, so each
  *    executor JVM builds its own on first use (neither is serializable
  *    and neither may cross the driver/executor boundary);
  *  - a thrown error (non-2xx, timeout, connect refused, malformed
  *    body) propagates to ExternalScorer's retry loop — backoff, bounded
  *    attempts, and the partial-failure channel live THERE, not here, so
  *    every transport shares one failure contract;
  *  - JSON rides on Jackson (Spark's own classpath dependency — present
  *    on every executor at the same version); integer ids parse as
  *    LongNode, so 64-bit keys survive the wire exactly.
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
  @transient private lazy val mapper = new ObjectMapper()

  override def apply(batch: Seq[Seq[Touch]]): Seq[Scored] = {
    val root = mapper.createObjectNode()
    val journeys = root.putArray("customer_journeys")
    batch.foreach { journey =>
      val jArr = journeys.addArray()
      journey.foreach { t =>
        val o = jArr.addObject()
        o.put("conversion_id", t.conversion_id)
        o.put("session_id", t.session_id)
        o.put("timestamp", t.ts)
        o.put("holder_engagement", t.holder_engagement)
        o.put("closer_engagement", t.closer_engagement)
        o.put("impression_interaction", t.impression_interaction): Unit
      }
    }
    val request = HttpRequest.newBuilder(URI.create(url))
      .timeout(requestTimeout)
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(root)))
      .build()
    val response = client.send(request, HttpResponse.BodyHandlers.ofString())
    if (response.statusCode() / 100 != 2) {
      // the body tail is part of the error so the retry-exhausted message
      // in the partial-failure channel says WHY the API refused
      throw new RuntimeException(
        s"scorer API returned HTTP ${response.statusCode()}: ${response.body().take(200)}")
    }
    val values = mapper.readTree(response.body()).path("values")
    require(values.isArray, s"scorer response has no 'values' array: ${response.body().take(200)}")
    values.elements().asScala.map { v =>
      Scored(
        v.path("conversion_id").asLong(),
        v.path("session_id").asLong(),
        v.path("ihc").asDouble())
    }.toSeq
  }
}
