package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J1 — the journey-build join (SURVEY.md §2.3), the reference pipeline's
  * core operator. For each conversion, every session of the same user at or
  * before the conversion timestamp (reference cj_builder.py:77–109, where it
  * is an O(C×S) single-threaded Python loop; here it is one distributed
  * equi-join on `user_id` with the temporal bound as a join-time range
  * predicate — the entire scalability win, SURVEY.md ⚠B6).
  *
  * Scale notes (100 TB): Catalyst plans a shuffled join keyed on `user_id`
  * with `ts <= conv_ts` evaluated post-match; AQE's skew-join splitting
  * handles power users. Preserved reference semantics: conversions with no
  * prior session disappear (inner join, ⚠B3); a session exactly at the
  * conversion timestamp is included (`<=`, ⚠B4); the `conversion` flag is
  * constant 0 (⚠B4, cj_builder.py:94).
  */
object JourneyBuilder {

  /** Full journey frame: the reference's 8 output columns (ts still as
    * epoch-nanos long) plus `user_id`, `conv_ts`, `revenue` carried for
    * downstream scoring/reporting. */
  def journeys(conversions: DataFrame, sessions: DataFrame): DataFrame = {
    val c = conversions.alias("c")
    val s = sessions.alias("s")
    s.join(c, col("s.user_id") === col("c.user_id") && col("s.ts") <= col("c.conv_ts"), "inner")
      .select(
        col("c.conv_id").as("conversion_id"),
        col("s.session_id"),
        col("s.ts"),
        col("s.channel_name").as("channel_label"),
        col("s.holder_engagement"),
        col("s.closer_engagement"),
        lit(0L).as("conversion"),
        col("s.impression_interaction"),
        col("s.user_id"),
        col("c.conv_ts"),
        col("c.revenue"))
  }

  /** The reference's customer_journeys CSV projection — fixed column order,
    * timestamp rendered `yyyy-MM-dd HH:mm:ss` (cj_builder.py:103–116). */
  def journeyOutput(journeys: DataFrame): DataFrame =
    journeys.select(
      col("conversion_id"),
      col("session_id"),
      date_format(graft.Tables.tsMicros("ts"), "yyyy-MM-dd HH:mm:ss").as("timestamp"),
      col("channel_label"),
      col("holder_engagement"),
      col("closer_engagement"),
      col("conversion"),
      col("impression_interaction"))
}
