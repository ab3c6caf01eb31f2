package graft

import graft.sources.Bucketing
import org.apache.spark.sql.functions._

/** Bucketed co-located joins must plan without a shuffle: both sides
  * pre-bucketed on the join key ⇒ no Exchange in the physical plan. */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans with zero Exchange") {
    val sessions = Tables.sessions(spark, sf("sf0.001"))
    val costs = Tables.sessionCosts(spark, sf("sf0.001"))
    Bucketing.writeBucketed(sessions, "bkt_sessions", "session_id", buckets = 8)
    Bucketing.writeBucketed(costs, "bkt_costs", "session_id", buckets = 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable auto-broadcast so the planner takes the SortMergeJoin path
      // (at real scale both sides are too big to broadcast — that is the
      // case bucketing exists for)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.coLocatedJoin(spark, "bkt_sessions", "bkt_costs", "session_id", "left")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"), plan)

      // and the result matches the shuffled join on the raw frames
      val expected = sessions.join(costs, Seq("session_id"), "left")
        .select(col("session_id"), coalesce(col("cost"), lit(-1.0)))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted
      val got = joined
        .select(col("session_id"), coalesce(col("cost"), lit(-1.0)))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted
      assert(got.sameElements(expected))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_sessions")
      spark.sql("DROP TABLE IF EXISTS bkt_costs")
    }
  }
}
