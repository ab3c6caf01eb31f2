package graft

import graft.ops.TemporalJoin
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TemporalJoin operator semantics, checked against the naive
  * join-then-reduce formulations on the sf0.001 fixture, plus the plan
  * properties that make them the scale-right shapes (no join node in the
  * as-of plan; the oracle gate covers row-level parity at sf0.01). */
class TemporalJoinSpec extends SparkSpec {

  private def conv = Tables.conversions(spark, sf("sf0.001"))
  private def sess = Tables.sessions(spark, sf("sf0.001"))

  private def asOf = TemporalJoin.asOfLatest(
    conv, sess,
    key = "user_id", leftTs = "conv_ts", rightTs = "ts", tieCol = "session_id",
    payload = Seq(
      "last_session_id" -> "session_id",
      "last_session_ts" -> "ts",
      "last_channel" -> "channel_name"))

  test("asOfLatest matches the naive join + argmax formulation") {
    val naive = conv
      .join(sess, Seq("user_id"), "left")
      .filter(col("ts") <= col("conv_ts") || col("ts").isNull)
      .withColumn("rk", row_number().over(
        Window.partitionBy("conv_id")
          .orderBy(col("ts").desc_nulls_last, col("session_id").desc_nulls_last)))
      .filter(col("rk") === 1)
      .select(col("conv_id"), col("session_id").as("last_session_id"))
    // the left join drops conversions whose user has only LATER sessions
    // (every session row fails ts <= conv_ts); re-add them as null matches
    val naiveIds = naive.collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val got = asOf.select("conv_id", "last_session_id").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got.size === conv.count()) // every conversion appears exactly once
    naiveIds.foreach { case (id, want) => assert(got(id) === want, s"conv $id") }
  }

  test("asOfLatest keeps unmatched conversions with null payload") {
    // earliest event per user: if a user's first event is the purchase,
    // that conversion has no prior session — must surface with nulls
    val n = asOf.filter(col("last_session_id").isNull).count()
    val expect = conv.join(sess, Seq("user_id"), "left")
      .groupBy("conv_id", "conv_ts")
      .agg(max(when(col("ts") <= col("conv_ts"), col("ts"))).as("m"))
      .filter(col("m").isNull).count()
    assert(n === expect)
  }

  test("asOfLatest plans no join operator — union + single window shuffle") {
    val plan = asOf.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("j7 scans prune to the joined columns (no value/props pages read)") {
    val plan = SparkEntry.queries("j7_asof")(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("value:double"), plan)
    assert(!plan.contains("props:string"), plan)
  }

  test("asOfLatest NULL keys follow equi-join semantics: no match, row kept") {
    import spark.implicits._
    val left = Seq((1L, Some(10L), 100L), (2L, None, 100L))
      .toDF("id", "k", "lts")
    val right = Seq((Some(10L), 50L, 7L), (None, 50L, 8L), (None, 99L, 9L))
      .toDF("k", "rts", "rid")
    val out = TemporalJoin.asOfLatest(left, right, "k", "lts", "rts", "rid",
      Seq("m" -> "rid"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(out === Map(1L -> Some(7L), 2L -> None)) // null key matches NOTHING
  }

  test("empty inputs: as-of keeps left rows with null payload; range join yields no rows") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L)).toDF("id", "k", "lts")
    val emptyRight = Seq.empty[(Long, Long, Long)].toDF("k", "rts", "rid")
    val asOfOut = TemporalJoin.asOfLatest(left, emptyRight, "k", "lts", "rts", "rid",
      Seq("m" -> "rid")).collect()
    assert(asOfOut.length === 1 && asOfOut.head.isNullAt(3))
    val rangeOut = TemporalJoin.aggInWindow(
      left, emptyRight, "id", "lts", "rts", 1000L, Seq(count(lit(1)).as("n"))).collect()
    assert(rangeOut.isEmpty) // inner semantics: empty window -> no row
    val emptyLeft = Seq.empty[(Long, Long, Long)].toDF("id", "k", "lts")
    assert(TemporalJoin.asOfLatest(emptyLeft, emptyRight, "k", "lts", "rts", "rid",
      Seq("m" -> "rid")).collect().isEmpty)
  }

  test("aggInWindow matches the naive inequality join") {
    val wUs = 3600L * 1000000L
    val got = TemporalJoin.aggInWindow(
      conv.withColumn("conv_us", expr("conv_ts div 1000")),
      sess.select("session_id", "ts", "channel_name")
        .withColumn("ts_us", expr("ts div 1000")),
      leftId = "conv_id", leftTs = "conv_us", rightTs = "ts_us",
      widthMicros = wUs,
      aggs = Seq(count(lit(1)).as("n_sessions")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naive = conv.withColumn("conv_us", expr("conv_ts div 1000"))
      .crossJoin(sess.select(expr("ts div 1000").as("ts_us")))
      .filter(col("ts_us") >= col("conv_us") - lit(wUs) &&
        col("ts_us") <= col("conv_us") + lit(wUs))
      .groupBy("conv_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === naive)
    assert(got.nonEmpty)
  }

  test("aggInWindow boundary: a row exactly width away is included, 1µs past is not") {
    import spark.implicits._
    val hour = 3600L * 1000000L
    val t0 = 12L * hour
    val left = Seq((1L, t0)).toDF("id", "lts")
    val right = Seq(
      (10L, t0 - hour), // exactly -1h
      (11L, t0 + hour), // exactly +1h
      (12L, t0 + hour + 1L)) // 1µs past
      .toDF("rid", "rts")
    val out = TemporalJoin.aggInWindow(
      left, right, "id", "lts", "rts", hour,
      Seq(count(lit(1)).as("n"))).collect()
    assert(out.length === 1 && out.head.getLong(1) === 2L)
  }
}
