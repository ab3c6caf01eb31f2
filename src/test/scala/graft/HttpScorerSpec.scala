package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.ops.{ExternalScorer, HttpScoreFn}
import graft.ops.ExternalScorer.Touch
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** End-to-end check of the HTTP transport: a live in-process scorer API
  * (JDK HttpServer) implementing the wire contract with the IHC formula,
  * driven through the full ExternalScorer.mapPartitions path on real
  * fixture journeys. Proves the one seam the DuckDB gate cannot see —
  * that the serialized-closure + per-executor-client + retry plumbing
  * works against an actual socket, not just the in-JVM stub. */
class HttpScorerSpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  /** Scorer API: parse the posted journeys, apply ExternalScorer.localIhc
    * (the reference formula), respond with the contract's values array.
    * `failFirst` many requests get a 503 before the server behaves —
    * exercises the executor-side retry. */
  private def withServer(failFirst: Int = 0)(test: String => Unit): Unit = {
    val failures = new AtomicInteger(failFirst)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/score", (x: HttpExchange) => {
      val out =
        try {
          if (failures.getAndDecrement() > 0) ("""{"error":"warming up"}""", 503)
          else {
            val body = new String(x.getRequestBody.readAllBytes(), "UTF-8")
            val journeys = mapper.readTree(body).path("customer_journeys")
              .elements().asScala.map(_.elements().asScala.map(j => Touch(
                j.path("conversion_id").asLong(),
                j.path("session_id").asLong(),
                j.path("timestamp").asLong(),
                j.path("holder_engagement").asLong(),
                j.path("closer_engagement").asLong(),
                j.path("impression_interaction").asLong())).toSeq).toSeq
            val root = mapper.createObjectNode()
            val values = root.putArray("values")
            ExternalScorer.localIhc(journeys).foreach { s =>
              val o = values.addObject()
              o.put("conversion_id", s.conversion_id)
              o.put("session_id", s.session_id)
              o.put("ihc", s.ihc): Unit
            }
            (mapper.writeValueAsString(root), 200)
          }
        } catch {
          case e: Throwable => (s"""{"error":"${e.getMessage}"}""", 400)
        }
      val bytes = out._1.getBytes("UTF-8")
      x.getResponseHeaders.set("Content-Type", "application/json")
      x.sendResponseHeaders(out._2, bytes.length)
      x.getResponseBody.write(bytes)
      x.close()
    })
    server.start()
    try test(s"http://127.0.0.1:${server.getAddress.getPort}/score")
    finally server.stop(0)
  }

  private def journeys =
    graft.ops.JourneyBuilder.journeys(
      Tables.conversions(spark, sf("sf0.001")),
      Tables.sessions(spark, sf("sf0.001")))

  test("HTTP transport scores identically to the local stub over a live server") {
    withServer() { url =>
      val viaHttp = ExternalScorer
        .score(journeys, new HttpScoreFn(url), maxJourneysPerRequest = 50)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val viaLocal = ExternalScorer.score(journeys)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(viaHttp.nonEmpty)
      assert(viaHttp === viaLocal)
    }
  }

  test("transient 503s are retried inside the executor, not task-fatal") {
    withServer(failFirst = 2) { url =>
      val out = ExternalScorer.scoreWithFailures(
        journeys, new HttpScoreFn(url), maxRetries = 3, backoffMs = 10L)
      assert(out.filter(col("error").isNotNull).count() === 0)
      assert(out.count() === journeys.count())
    }
  }

  test("an unreachable API surfaces the partial-failure channel, not an exception") {
    // nothing listens on this port; connect fails every attempt
    val out = ExternalScorer.scoreWithFailures(
      journeys.limit(10),
      new HttpScoreFn("http://127.0.0.1:1/score"),
      maxRetries = 1, backoffMs = 1L)
    assert(out.filter(col("ihc").isNotNull).count() === 0)
    assert(out.filter(col("error").isNotNull).count() === 10)
  }

  test("64-bit ids survive the wire exactly (Jackson LongNode, not double)") {
    val big = Long.MaxValue - 7
    val node = mapper.readTree(s"""{"conversion_id": $big}""")
    assert(node.path("conversion_id").asLong() === big)
    // the double path would corrupt it: 2^63-ish is not representable
    assert(node.path("conversion_id").asDouble().toLong !== big)
  }
}
