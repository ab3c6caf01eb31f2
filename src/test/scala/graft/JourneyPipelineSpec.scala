package graft

import graft.ops.{ChannelReport, JourneyBuilder}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Journey-build semantics (reference cj_builder.py:77–120) and the 3-step
  * pipeline end-to-end with its file contracts, honoring the reference's
  * sharp edges ⚠B3/⚠B4/⚠B5 and the ⚠B1 truncate-once intent. */
class JourneyPipelineSpec extends SparkSpec {

  import spark.implicits._

  // Fixture: 2 users; u1 converts twice, u2's conversion has no prior
  // sessions (⚠B3); one of u1's sessions is exactly at the conversion ts
  // (⚠B4 boundary) and one is after it (excluded).
  private val ns = 1000000000L // 1 s in ns
  private def conv: DataFrame = Seq(
    (100L, 1L, 50L * ns, 200.0),  // u1 early conversion
    (101L, 1L, 100L * ns, 100.0), // u1 late conversion
    (102L, 2L, 10L * ns, 999.0)   // u2: no sessions at or before → dropped
  ).toDF("conv_id", "user_id", "conv_ts", "revenue")

  private def sess: DataFrame = Seq(
    (10L, 1L, 20L * ns, "ads", 1L, 0L, 0L),
    (11L, 1L, 50L * ns, "email", 0L, 1L, 0L),  // exactly at conv 100 ts → included (⚠B4)
    (12L, 1L, 80L * ns, "social", 0L, 0L, 1L), // after conv 100, before conv 101
    (13L, 2L, 999L * ns, "ads", 0L, 0L, 0L)    // after u2's conversion → never joins
  ).toDF("session_id", "user_id", "ts", "channel_name",
    "holder_engagement", "closer_engagement", "impression_interaction")

  private def costs: DataFrame =
    Seq((10L, 5.0), (12L, 2.5)).toDF("session_id", "cost") // 11,13 missing → COALESCE 0

  test("J1 join: per-conversion prior sessions; <= boundary; ⚠B3 drop; flag constant 0") {
    val j = JourneyBuilder.journeys(conv, sess)
    val got = j.select("conversion_id", "session_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set(
      (100L, 10L), (100L, 11L),                 // ⚠B4: session 11 at == ts included
      (101L, 10L), (101L, 11L), (101L, 12L)))   // conv 102 absent (⚠B3)
    assert(j.filter(col("conversion") =!= 0L).isEmpty) // ⚠B4: flag always 0
  }

  test("journey CSV output has the reference's 8 columns in golden order") {
    val out = JourneyBuilder.journeyOutput(JourneyBuilder.journeys(conv, sess))
    assert(out.columns.sameElements(Array(
      "conversion_id", "session_id", "timestamp", "channel_label",
      "holder_engagement", "closer_engagement", "conversion", "impression_interaction")))
    val ts = out.filter(col("session_id") === 10L).select("timestamp").head().getString(0)
    assert(ts == "1970-01-01 00:00:20") // formatted, UTC
  }

  test("date-range bounds filter the conversion date inclusively (P4)") {
    val j = AttributionPipeline.buildJourneys(conv, sess,
      startDate = Some("1970-01-01"), endDate = Some("1970-01-01"))
    assert(j.select("conversion_id").distinct().count() == 2)
    val none = AttributionPipeline.buildJourneys(conv, sess, startDate = Some("1970-01-02"))
    assert(none.isEmpty)
  }

  test("report: cost coalesced to 0, date is the session date (⚠B5), KPIs zero-safe") {
    val attribution = AttributionPipeline.score(JourneyBuilder.journeys(conv, sess))
    val rep = AttributionPipeline.report(sess, costs, attribution, conv)
    val byChannel = rep.collect().map(r => r.getString(0) -> r).toMap
    // email session (11) has no cost row → cost 0 → ROAS 0 by F8 and CPO > 0 impossible → CPO = cost/ihc = 0
    assert(byChannel("email").getDouble(2) == 0.0)
    assert(byChannel("email").getAs[Double]("ROAS") == 0.0)
    // all dates are session dates — 1970-01-01 here
    assert(rep.select("date").distinct().collect().map(_.getString(0)).sameElements(Array("1970-01-01")))
    // total attributed revenue = revenue of the 2 surviving conversions
    val totalRev = rep.agg(sum("ihc_revenue")).head().getDouble(0)
    assert(math.abs(totalRev - 300.0) < 1e-9)
  }

  test("pipeline end-to-end with file contracts; attribution overwrite is truncate-once (⚠B1 intent)") {
    val dir = Files.createTempDirectory("graft-pipe").toString
    val rep = AttributionPipeline.runAll(conv, sess, costs, dir)
    assert(rep.count() > 0)

    // S2: reload journeys from the CSV contract with the explicit schema
    val reloaded = AttributionPipeline.readJourneysCsv(spark, s"$dir/customer_journeys")
    assert(reloaded.count() == 5)
    assert(reloaded.schema == AttributionPipeline.journeyCsvSchema)

    // step 2 standalone from the reloaded CSV gives the same attribution
    val attrFromCsv = AttributionPipeline.score(reloaded)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val attrDirect = AttributionPipeline.score(JourneyBuilder.journeys(conv, sess))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(attrFromCsv == attrDirect)

    // ⚠B1 intent: a second write replaces (not duplicates) the table
    val attribution = AttributionPipeline.score(JourneyBuilder.journeys(conv, sess))
    AttributionPipeline.writeAttribution(attribution, s"$dir/attribution_customer_journey")
    assert(spark.read.parquet(s"$dir/attribution_customer_journey").count() == 5)

    // S4 append sink appends
    AttributionPipeline.appendTable(attribution, s"$dir/append_tbl")
    AttributionPipeline.appendTable(attribution, s"$dir/append_tbl")
    assert(spark.read.parquet(s"$dir/append_tbl").count() == 10)

    // Σ ihc = 1 per conversion in the persisted table
    val sums = spark.read.parquet(s"$dir/attribution_customer_journey")
      .groupBy("conversion_id").agg(sum("ihc").as("s")).collect()
    sums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-4))
  }

  test("J1 stays correct under a pathological power user (skew path)") {
    // one user owns 95% of all sessions — the SURVEY §7.6 skew risk.
    // Correctness must not depend on AQE's skew splitting; this pins the
    // row-count algebra: Σ over conversions of |prior sessions|.
    val skewSess = (1 to 2000).map(i => (1000L + i, 99L, i.toLong * ns, "ads", 0L, 0L, 0L)) ++
      (1 to 50).map(i => (5000L + i, 7L, i.toLong * ns, "email", 0L, 0L, 0L))
    val skewConv = Seq(
      (900L, 99L, 1500L * ns, 10.0), // 1500 prior sessions
      (901L, 99L, 2000L * ns, 10.0), // 2000 prior sessions
      (902L, 7L, 25L * ns, 10.0))    // 25 prior sessions
    val j = JourneyBuilder.journeys(
      skewConv.toDF("conv_id", "user_id", "conv_ts", "revenue"),
      skewSess.toDF("session_id", "user_id", "ts", "channel_name",
        "holder_engagement", "closer_engagement", "impression_interaction"))
    val counts = j.groupBy("conversion_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(900L -> 1500L, 901L -> 2000L, 902L -> 25L))
    // and the scorer's invariant holds on the giant journeys too
    val rep = graft.ops.IhcScorer.invariantReport(graft.ops.IhcScorer.score(j)).head()
    assert(rep.getLong(0) == 3L && rep.getLong(1) == 3L)
  }

  test("report summary prints the reference's totals and conditional means") {
    val attribution = AttributionPipeline.score(JourneyBuilder.journeys(conv, sess))
    val rep = AttributionPipeline.report(sess, costs, attribution, conv)
    val lines = ChannelReport.summaryLines(rep)
    assert(lines.head == s"Generated channel reporting for ${rep.count()} channel-date combinations")
    // totals: Σcost = 12.5 — session 10 (5.0) joins BOTH conversions'
    // journeys and the reference counts cost once per attribution row
    // (channel_reporter.py:62–91); session 12 adds 2.5; 11/13 coalesce
    // to 0. Σihc_revenue = 300.
    assert(lines(1) == "Total marketing cost: 12.50 Euro")
    assert(lines(2) == "Total IHC revenue: 300.00 Euro")
    // conditional means exclude the zero-CPO/ROAS email row
    val m = rep.collect().map(r =>
      r.getString(0) -> (r.getAs[Double]("CPO"), r.getAs[Double]("ROAS"))).toMap
    val cpos = m.values.map(_._1).filter(_ > 0)
    assert(lines(3) == f"Average CPO: ${cpos.sum / cpos.size}%.2f Euro")
    // empty report → the reference's "No valid ... found" branches
    val empty = ChannelReport.summaryLines(rep.filter(col("cost") < 0))
    assert(empty(0) == "Generated channel reporting for 0 channel-date combinations")
    assert(empty(1) == "Total marketing cost: 0.00 Euro")
    assert(empty(3) == "No valid CPO values found")
    assert(empty(4) == "No valid ROAS values found")
  }

  test("score with the session gate skips oversize conversions (C2 semantics)") {
    val j = JourneyBuilder.journeys(conv, sess)
    // conv 100 has 2 sessions, conv 101 has 3 → cap at 2 keeps only 100
    val gated = AttributionPipeline.score(j, maxSessions = Some(2))
    val convs = gated.select("conversion_id").distinct().as[Long].collect().toSet
    assert(convs == Set(100L))
    assert(math.abs(gated.agg(sum("ihc")).head().getDouble(0) - 1.0) < 1e-9)
  }

  test("report column order matches the reference channel_reporting.csv") {
    val attribution = AttributionPipeline.score(JourneyBuilder.journeys(conv, sess))
    val rep = AttributionPipeline.report(sess, costs, attribution, conv)
    assert(rep.columns.sameElements(Array(
      "channel_name", "date", "cost", "ihc", "ihc_revenue", "CPO", "ROAS")))
  }
}
