package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXT1-streaming — duplicate suppression and static enrichment on the
  * incremental ingest path. A training-data pipeline re-lands files
  * (retries, backfills, at-least-once upstreams), so the SAME event can
  * arrive in different micro-batches; batch `dropDuplicates` only sees
  * one batch at a time, while the streaming form keeps a keyed state
  * store across batches. State is BOUNDED by the watermark:
  * `dropDuplicatesWithinWatermark` evicts keys once the event-time
  * watermark passes them, so a long-running deployment holds state
  * proportional to (arrival rate × watermark delay), never the history.
  * The trade is explicit: a duplicate arriving LATER than the watermark
  * delay after its first copy is not caught — size the delay to the
  * upstream's redelivery window.
  */
object StreamingDedup {

  /** Exactly-once events from an at-least-once landing stream: one row
    * per event_id among arrivals within `watermarkDelay` of each other.
    * Works on the StreamingIngest.readEvents schema (ns-long ts). */
  def dedupedEvents(events: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withColumn("event_ts", graft.Tables.tsMicros("ts"))
      .withWatermark("event_ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")
      // schema-stable: the watermark helper column is an implementation
      // detail; callers get exactly the input schema back
      .drop("event_ts")

  /** Stream-static enrichment: attach dimension attributes to the event
    * stream. The static side is re-read per micro-batch (picking up dim
    * updates); no forced broadcast hint — Spark's size threshold
    * decides, so a small dim broadcasts and an oversized one degrades
    * to a shuffle instead of OOMing the ingest path. No stateful join
    * machinery, no watermark requirement; this is THE pattern for
    * decorating a stream with reference data (channel groups, language
    * families, media codecs). */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(dim, Seq(key), "left")
}
