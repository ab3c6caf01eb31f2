package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXT6 — gap-based sessionization of the raw `events` stream: a new
  * session starts when a user is idle longer than `gap`. The reference
  * pipeline *assumes* sessionization already happened (README.md:54); this
  * operator produces its `session_sources`-shaped input from raw events.
  *
  * Classic two-window formulation (lag → gap flag → running sum), both
  * windows share the one shuffle on `user_id`; ts stays epoch-nanos
  * integer arithmetic throughout (exact, oracle-portable).
  */
object Sessionize {

  /** All event columns + session_num — the window carries the full row,
    * so consumers needing event payload (sessionSources) pay no second
    * scan or join. */
  private def tagged(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapNs = gapMinutes.toLong * 60L * 1000000000L
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull || col("ts") - col("prev_ts") > gapNs, 1L).otherwise(0L))
      .withColumn("session_num", sum("new_session").over(byUser))
      .drop("prev_ts", "new_session")
  }

  def sessions(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    tagged(events, gapMinutes).select(col("event_id"), col("user_id"), col("session_num"))

  /** Session-level rollup bridging EXT6 into the attribution flow: one row
    * per (user, session) with start/end, the entry channel (first
    * event_type by ts — min-struct aggregate, map-side combinable), event
    * count and value sum. Built on the tagged frame directly — one events
    * scan, one window shuffle, one aggregation shuffle. This is the
    * `session_sources`-shaped table the reference *assumes* already
    * exists (README.md:54) — here derived from raw events inside the
    * engine. */
  def sessionSources(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    tagged(events, gapMinutes)
      .groupBy(col("user_id"), col("session_num"))
      .agg(
        min(col("ts")).as("start_ts"),
        max(col("ts")).as("end_ts"),
        min(struct(col("ts"), col("event_id"), col("event_type")))
          .getField("event_type").as("entry_channel"),
        count(lit(1)).as("n_events"),
        graft.Num.rnd(sum(col("value")), 2).as("total_value"))
}
