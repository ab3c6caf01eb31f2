package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** EXT6's streaming twin — gap-based sessionization with custom state via
  * `flatMapGroupsWithState` (the Structured Streaming primitive for
  * arbitrary per-key state). The batch operator (ops/Sessionize.scala) uses
  * lag/sum windows; a continuous deployment can't, because the gap decision
  * needs the previous event's timestamp across micro-batches — that is
  * exactly what GroupState carries.
  *
  * State per user = (last event ts, current session number): one small
  * record per user ever seen, kept for the stream's lifetime — the
  * counter must survive idle periods or session numbers would restart at
  * 1 and collide with earlier sessions of the same user. (A deployment
  * that must expire state would switch the session identity to
  * (user_id, session-start ts), which needs no counter; the per-user
  * numbering here matches the batch operator.) Emits one row per event,
  * assigning the same session numbers the batch operator produces when
  * events arrive in order (verified in StreamingMultimodalSpec).
  */
object StreamingSessionize {

  final case class Event(event_id: Long, user_id: Long, ts: Long)
  final case class SessionedEvent(event_id: Long, user_id: Long, session_num: Long)
  final case class UserState(lastTs: Long, sessionNum: Long)

  def assign(gapNs: Long)(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[UserState]): Iterator[SessionedEvent] = {
    var st = state.getOption.getOrElse(UserState(Long.MinValue, 0L))
    val out = events.toSeq.sortBy(e => (e.ts, e.event_id)).map { e =>
      val isNew = st.lastTs == Long.MinValue || e.ts - st.lastTs > gapNs
      st = UserState(e.ts, if (isNew) st.sessionNum + 1 else st.sessionNum)
      SessionedEvent(e.event_id, userId, st.sessionNum)
    }
    state.update(st)
    out.iterator
  }

  /** Wire the stateful sessionizer over a streaming event source and run it
    * AvailableNow into a memory sink. */
  def runAvailableNow(
      spark: SparkSession,
      dir: String,
      checkpoint: String,
      name: String,
      gapMinutes: Int = 30): StreamingQuery = {
    import spark.implicits._
    val gapNs = gapMinutes.toLong * 60L * 1000000000L
    val events: Dataset[Event] =
      StreamingIngest.readEvents(spark, dir).selectExpr("event_id", "user_id", "ts").as[Event]
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        assign(gapNs))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
