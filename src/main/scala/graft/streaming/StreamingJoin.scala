package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the streaming twin of the batch J8 range
  * join: conversions arriving on one stream matched to the same user's
  * sessions arriving on another, session time within [conv − window, conv].
  *
  * Spark buffers BOTH sides in the state store until a match is possible;
  * without bounds that state grows forever. Two things bound it here:
  *
  *  - a watermark on each side (event time, `delay` lateness budget), and
  *  - the time-RANGE predicate tying the two event-time columns together,
  *    which lets Spark derive a state eviction horizon per side (a buffered
  *    session older than `watermark − window` can never match a future
  *    conversion and is dropped; same for buffered conversions once the
  *    session watermark passes their window).
  *
  * Without the range predicate the same join would be APPEND-impossible /
  * state-unbounded and Spark rejects it — the predicate is load-bearing,
  * not an optimization. Inner join ⇒ results emit as soon as both sides
  * arrive; outer flavors would additionally wait for the watermark before
  * emitting unmatched rows.
  */
object StreamingJoin {

  /** `conv ⋈ sess`: same `user_id`, session event-time within
    * [conv_time − windowSeconds, conv_time]. Inputs use the
    * StreamingIngest.readEvents schema (ns-long `ts`); both may be fed
    * from the SAME landing stream, filtered two ways.
    *
    * Resolution contract: the interval is evaluated at MICROSECOND
    * precision (Spark event-time/TimestampType is µs — watermarks
    * cannot run on raw ns longs), so a pair within 1 µs of a boundary
    * classifies by its µs-truncated times. A batch twin must compare
    * `ts div 1000` values, not raw ns, to match exactly. */
  /** `joinType`: "inner" emits on match; "left_outer" additionally emits
    * conversions with NO in-window session as (conv_id, session_id =
    * NULL) — but only once the SESSION-side watermark proves no match
    * can still arrive, i.e. after it passes conv_time. A query that
    * stops (AvailableNow) before the watermark clears a conversion's
    * window never emits that conversion's null row — the outer rows
    * near the stream's tail stay pending for the next incremental run
    * (state lives in the checkpoint). That is watermark semantics, not
    * data loss; the spec pins exactly this. */
  def convSessionInterval(
      conv: DataFrame,
      sess: DataFrame,
      windowSeconds: Long = 3600L,
      delay: String = "1 hour",
      joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left_outer").contains(joinType), s"unsupported: $joinType")
    val c = conv.select(
      col("event_id").as("conv_id"),
      col("user_id").as("conv_user"),
      graft.Tables.tsMicros("ts").as("conv_time"))
      .withWatermark("conv_time", delay)
    val s = sess.select(
      col("event_id").as("session_id"),
      col("user_id").as("sess_user"),
      graft.Tables.tsMicros("ts").as("sess_time"))
      .withWatermark("sess_time", delay)
    c.join(
        s,
        col("conv_user") === col("sess_user") &&
          col("sess_time") >= col("conv_time") - expr(s"INTERVAL $windowSeconds SECONDS") &&
          col("sess_time") <= col("conv_time"),
        joinType)
      .select(col("conv_id"), col("session_id"), col("conv_user").as("user_id"))
  }
}
