package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** S6 — the pluggable external-scorer boundary, re-expressed the way it
  * must work on a cluster. The reference collects journeys on the driver,
  * chunks them by `max_journeys_per_request` / `max_sessions_per_request`,
  * and POSTs each chunk to the IHC API with a 1 s pause
  * (api_client.py:153–252). Driver-side looping dies at scale; here the
  * boundary is `mapPartitions`:
  *
  *  - `repartition(conversion_id)` guarantees every journey is whole
  *    inside one partition (a conversion must be scored from its complete
  *    journey);
  *  - `sortWithinPartitions` makes journeys contiguous so the executor can
  *    group them with one linear pass — no per-partition hash map of the
  *    whole data;
  *  - each executor batches up to `maxJourneysPerRequest` conversions /
  *    `maxSessionsPerRequest` sessions per call, exactly the reference's
  *    chunking contract (C1/C2), and calls the transport once per batch.
  *
  * The transport (`ScoreFn`) is pluggable: production would wrap an HTTP
  * client opened once per partition; this container has no egress, so the
  * default transport computes the same IHC formula as IhcScorer locally —
  * which also turns the whole path into something the DuckDB oracle can
  * verify (`s6_external_scorer` must equal `ihc_score`).
  */
object ExternalScorer {

  final case class Touch(
      conversion_id: Long,
      session_id: Long,
      ts: Long,
      holder_engagement: Long,
      closer_engagement: Long,
      impression_interaction: Long)

  final case class Scored(conversion_id: Long, session_id: Long, ihc: Double)

  /** Full-channel result row: `ihc` is NULL and `error` carries the
    * transport's message for conversions whose batch exhausted its
    * retries (the reference's partialFailureErrors channel,
    * api_client.py:50–65 — a failed request is logged and surfaced, never
    * task-fatal). */
  final case class ScoredResult(
      conversion_id: Long,
      session_id: Long,
      ihc: Option[Double],
      error: Option[String])

  /** One request: a batch of complete journeys → scores. Production: HTTP
    * POST (client per partition, retries, backoff). */
  type ScoreFn = Seq[Seq[Touch]] => Seq[Scored]

  /** Reference-parity local transport: the IhcScorer formula (SURVEY.md
    * §7.3) computed per journey — deterministic, network-free. */
  val localIhc: ScoreFn = batch =>
    batch.flatMap { journey =>
      val ordered = journey.sortBy(t => (t.ts, t.session_id))
      val n = ordered.length
      val raws = ordered.zipWithIndex.map { case (t, i) =>
        4L + (if (i == 0) 6L else 0L) + (if (i == n - 1) 8L else 0L) +
          2L * t.holder_engagement + t.impression_interaction +
          (if (i == n - 1) 3L * t.closer_engagement else 0L)
      }
      val total = raws.sum.toDouble
      ordered.zip(raws).map { case (t, r) =>
        Scored(t.conversion_id, t.session_id, r.toDouble / total)
      }
    }

  /** Score journeys through the pluggable boundary. Returns the
    * attribution shape (conversion_id, session_id, ihc). Failure
    * semantics follow the reference (api_client.py:50–65): a batch that
    * exhausts its retries is dropped from this result, not task-fatal —
    * use [[scoreWithFailures]] when the caller needs the per-conversion
    * error channel instead of the reference's log-and-continue. */
  def score(
      journeys: DataFrame,
      fn: ScoreFn = localIhc,
      maxJourneysPerRequest: Int = 100,
      maxSessionsPerRequest: Int = 2000,
      maxRetries: Int = 3,
      backoffMs: Long = 100L,
      minRequestIntervalMs: Long = 0L): DataFrame =
    scoreWithFailures(
      journeys, fn, maxJourneysPerRequest, maxSessionsPerRequest, maxRetries, backoffMs,
      minRequestIntervalMs)
      .filter(col("error").isNull)
      .select(col("conversion_id"), col("session_id"), col("ihc").cast("double"))

  /** [[score]] with the partial-failure channel surfaced: every input
    * conversion appears in the output — scored rows carry `ihc`, rows
    * from a batch that failed all `maxRetries + 1` attempts carry a NULL
    * `ihc` and the final attempt's message in `error`. Transient
    * transport faults are retried inside the executor with exponential
    * backoff (backoffMs · 2^attempt), so a flaky request never re-runs
    * the whole Spark task, and a poisoned batch costs its own
    * conversions only.
    *
    * `minRequestIntervalMs` (0 = off) paces transport calls — the
    * reference's inter-request rate-limit pause (api_client.py:219,
    * 244), generalized from its hard-coded 1 s. Pacing is per PARTITION
    * (each executor thread spaces its own calls), so the aggregate rate
    * against the service is parallelism × (1000/interval) req/s — size
    * the interval for the service's budget divided by
    * `spark.sql.shuffle.partitions`, or cap parallelism with a
    * `coalesce` before scoring. A genuinely global limiter needs a
    * shared token service, which is outside a shared-nothing engine's
    * truthful contract (the reference gets "global" for free only by
    * being single-threaded). */
  def scoreWithFailures(
      journeys: DataFrame,
      fn: ScoreFn = localIhc,
      maxJourneysPerRequest: Int = 100,
      maxSessionsPerRequest: Int = 2000,
      maxRetries: Int = 3,
      backoffMs: Long = 100L,
      minRequestIntervalMs: Long = 0L): DataFrame = {
    val spark = journeys.sparkSession
    import spark.implicits._
    val touches: Dataset[Touch] = journeys
      .select(
        col("conversion_id").cast("long"),
        col("session_id").cast("long"),
        col("ts").cast("long"),
        col("holder_engagement").cast("long"),
        col("closer_engagement").cast("long"),
        col("impression_interaction").cast("long"))
      .as[Touch]
    touches
      .repartition(col("conversion_id"))
      .sortWithinPartitions("conversion_id", "ts", "session_id")
      .mapPartitions { it =>
        // linear pass: journeys are contiguous after the partition sort
        val journeyIt = new Iterator[Seq[Touch]] {
          private val buf = it.buffered
          def hasNext: Boolean = buf.hasNext
          def next(): Seq[Touch] = {
            val head = buf.head.conversion_id
            val j = scala.collection.mutable.ArrayBuffer.empty[Touch]
            while (buf.hasNext && buf.head.conversion_id == head) j += buf.next()
            j.toSeq
          }
        }
        // batch journeys up to the request limits (C1/C2): the session
        // cap is checked BEFORE adding (peek), so a batch never exceeds
        // it — except an oversize single journey, which goes alone
        // rather than being skipped (the reference skips them,
        // api_client.py:197-199 — divergence documented: silently
        // dropping conversions loses revenue).
        val jbuf = journeyIt.buffered
        val batched = new Iterator[Seq[Seq[Touch]]] {
          def hasNext: Boolean = jbuf.hasNext
          def next(): Seq[Seq[Touch]] = {
            val b = scala.collection.mutable.ArrayBuffer.empty[Seq[Touch]]
            var sessions = 0
            while (jbuf.hasNext && b.size < maxJourneysPerRequest &&
              (b.isEmpty || sessions + jbuf.head.size <= maxSessionsPerRequest)) {
              val j = jbuf.next()
              b += j
              sessions += j.size
            }
            b.toSeq
          }
        }
        // C3 pacing state — one clock per partition iterator, so each
        // executor thread spaces its own requests
        var lastRequestAt = Long.MinValue
        def paced(): Unit = {
          if (minRequestIntervalMs > 0L && lastRequestAt != Long.MinValue) {
            val wait = lastRequestAt + minRequestIntervalMs - System.currentTimeMillis()
            if (wait > 0) Thread.sleep(wait)
          }
          lastRequestAt = System.currentTimeMillis()
        }
        def attempt(batch: Seq[Seq[Touch]]): Seq[ScoredResult] = {
          var tryNum = 0
          var out: Seq[ScoredResult] = null
          while (out == null) {
            try {
              paced()
              out = fn(batch).map(s =>
                ScoredResult(s.conversion_id, s.session_id, Some(s.ihc), None))
            } catch {
              case scala.util.control.NonFatal(e) if tryNum < maxRetries =>
                Thread.sleep(backoffMs << tryNum)
                tryNum += 1
              case scala.util.control.NonFatal(e) =>
                // the reference logs every failed request before moving
                // on (api_client.py:50–65) — keep that visible in the
                // executor log even on the score() path, which drops
                // these rows from its result
                System.err.println(
                  s"[graft-scorer] batch of ${batch.size} journeys failed after " +
                    s"${maxRetries + 1} attempts: ${e.getClass.getSimpleName}: ${e.getMessage}")
                out = batch.flatMap(_.map(t =>
                  ScoredResult(t.conversion_id, t.session_id, None,
                    Some(s"${e.getClass.getSimpleName}: ${e.getMessage}"))))
            }
          }
          out
        }
        batched.flatMap(attempt)
      }
      .toDF()
  }
}
