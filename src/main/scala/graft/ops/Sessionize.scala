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

  def sessions(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapNs = gapMinutes.toLong * 60L * 1000000000L
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull || col("ts") - col("prev_ts") > gapNs, 1L).otherwise(0L))
      .withColumn("session_num", sum("new_session").over(byUser))
      .select(col("event_id"), col("user_id"), col("session_num"))
  }
}
