package graft.queries

import graft.{QueryDef, Sql, Tables}
import graft.ops.{ChannelReport, IhcScorer, JourneyBuilder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The attribution pipeline's operators as oracle-checked queries:
  * J1 journey build, native IHC scoring, W1 normalization, the invariant
  * check, and the full channel report (SURVEY.md §7.2 flagship slice). */
object AttributionQueries {

  private def journeys(spark: SparkSession, dir: String): DataFrame =
    JourneyBuilder.journeys(Tables.conversions(spark, dir), Tables.sessions(spark, dir))

  /** Flagship: attributed revenue per channel per day with CPO/ROAS. */
  def flagship(spark: SparkSession, dir: String): DataFrame = {
    val conv = Tables.conversions(spark, dir)
    val sess = Tables.sessions(spark, dir)
    val attr = IhcScorer.normalize(IhcScorer.score(journeys(spark, dir)))
    val sd = ChannelReport.sessionData(sess, Tables.sessionCosts(spark, dir))
    ChannelReport.withKpis(ChannelReport.report(sd, attr, conv, roundForOracle = true))
  }

  val flagshipSql: String = Sql.CTES +
    s"""SELECT channel_name, date, cost, ihc, ihc_revenue,
       |       COALESCE(cost / NULLIF(ihc, CAST(0 AS DOUBLE)), CAST(0 AS DOUBLE)) AS CPO,
       |       COALESCE(ihc_revenue / NULLIF(cost, CAST(0 AS DOUBLE)), CAST(0 AS DOUBLE)) AS ROAS
       |FROM (
       |  SELECT sd.channel_name, sd.date,
       |         ${Sql.rnd("SUM(sd.cost)", 2)} AS cost,
       |         ${Sql.rnd("SUM(a.ihc)", 4)} AS ihc,
       |         ${Sql.rnd("SUM(a.ihc * cv.revenue)", 2)} AS ihc_revenue
       |  FROM session_data sd
       |  JOIN scored a ON sd.session_id = a.session_id
       |  JOIN conversions cv ON a.conversion_id = cv.conv_id
       |  GROUP BY 1, 2
       |) r""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("flagship_report", flagship, Some(flagshipSql), bench = true),

    // J1 — journey build join, reference output projection (cj_builder.py:103-116).
    QueryDef(
      "j1_journeys",
      (s, d) => JourneyBuilder.journeyOutput(journeys(s, d)),
      Some(Sql.CTES +
        """SELECT conversion_id, session_id,
          |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS "timestamp",
          |       channel_label, holder_engagement, closer_engagement,
          |       conversion, impression_interaction
          |FROM journeys""".stripMargin),
      bench = true),

    // Native IHC scorer (SURVEY.md §7.3).
    QueryDef(
      "ihc_score",
      (s, d) => IhcScorer.score(journeys(s, d)),
      Some(Sql.CTES + "SELECT conversion_id, session_id, ihc FROM scored"),
      bench = true),

    // S6 — the pluggable external-scorer boundary (mapPartitions +
    // conversion co-location + request batching; transport stubbed with
    // the local IHC formula) must produce exactly the native scorer's
    // result — same oracle as ihc_score.
    QueryDef(
      "s6_external_scorer",
      (s, d) => graft.ops.ExternalScorer.score(journeys(s, d)),
      Some(Sql.CTES + "SELECT conversion_id, session_id, ihc FROM scored")),

    // W1 — Σ=1 normalization, fed deliberately denormalized integer scores
    // so the rescale branch fires; result must equal the scorer output.
    QueryDef(
      "w1_normalize",
      (s, d) =>
        IhcScorer.normalize(
          IhcScorer
            .scoreFull(journeys(s, d))
            .select(col("conversion_id"), col("session_id"), col("raw").cast("double").as("ihc"))),
      Some(Sql.CTES + "SELECT conversion_id, session_id, ihc FROM scored")),

    // A2/A9/P11 — the reference's post-write invariant readback
    // (api_client.py:254-268).
    QueryDef(
      "a2_ihc_invariant",
      (s, d) => IhcScorer.invariantReport(IhcScorer.score(journeys(s, d))),
      Some(Sql.CTES +
        """SELECT COUNT(*) AS n_conversions,
          |       CAST(SUM(CASE WHEN ABS(ihc_sum - 1.0) < 0.0001 THEN 1 ELSE 0 END) AS BIGINT) AS n_ok
          |FROM (SELECT conversion_id, SUM(ihc) AS ihc_sum FROM scored GROUP BY 1) g""".stripMargin)),

    // S3 + S2 — the CSV sink/source contract as an oracle row: write the
    // journey artifact through the real sink, read it back through the
    // real source (explicit schema), and hash-compare the round-trip
    // against the same oracle as j1_journeys. A lossy sink (dtype drift,
    // quoting, header, ordering) breaks the hash.
    QueryDef(
      "s3_csv_roundtrip",
      (s, d) => {
        // fixed path + overwrite mode: repeated verify/bench invocations
        // REPLACE the artifact instead of accumulating temp dirs
        val out = s"${System.getProperty("java.io.tmpdir")}/graft-s3-roundtrip"
        graft.AttributionPipeline.writeCsv(
          JourneyBuilder.journeyOutput(journeys(s, d)), s"$out/customer_journeys")
        graft.AttributionPipeline.readJourneysCsv(s, s"$out/customer_journeys")
      },
      Some(Sql.CTES +
        """SELECT conversion_id, session_id,
          |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS "timestamp",
          |       channel_label, holder_engagement, closer_engagement,
          |       conversion, impression_interaction
          |FROM journeys""".stripMargin)),

    // S5 — truncate-once overwrite as an oracle row: write the
    // attribution table TWICE with mode=overwrite and read it back; the
    // ihc_score oracle only hash-matches if the second write replaced
    // (not appended to / partially truncated) the first — the ⚠B1-intent
    // contract (reference api_client.py:139 re-truncates per chunk and
    // loses all but the last chunk; ours truncates once per write).
    QueryDef(
      "s5_overwrite_readback",
      (s, d) => {
        // fixed path + overwrite mode — see s3_csv_roundtrip
        val out = s"${System.getProperty("java.io.tmpdir")}/graft-s5-roundtrip"
        val attr = IhcScorer.score(journeys(s, d))
        graft.AttributionPipeline.writeAttribution(attr, s"$out/attribution")
        graft.AttributionPipeline.writeAttribution(attr, s"$out/attribution")
        s.read.parquet(s"$out/attribution")
      },
      Some(Sql.CTES + "SELECT conversion_id, session_id, ihc FROM scored")),

    // S5b — the incremental keyed upsert as an oracle row: load the base
    // events into a date-partitioned store, upsert a batch that bumps
    // value for event_id % 7 == 0, read the store back. Hash-matches
    // only if batch rows replaced stored rows, untouched rows survived,
    // and the dynamic partition overwrite replaced exactly the touched
    // partitions. The store starts EMPTY every invocation (deleted
    // below) and the path is per-data-dir: upsert survivor semantics
    // keep stored keys absent from the current batch, so leftover state
    // from another scale factor (whose event_ids and dates overlap)
    // would otherwise leak extra rows into the readback.
    QueryDef(
      "s8_upsert_readback",
      (s, d) => {
        val out = s"${System.getProperty("java.io.tmpdir")}/graft-s8-upsert-" +
          java.lang.Integer.toHexString(d.hashCode)
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(): Unit
        }
        rm(new java.io.File(out))
        val events = Tables.events(s, d)
        graft.sources.PartitionedStore.upsertByDate(
          s, events.select("event_id", "ts", "value"),
          tsCol = "ts", keyCol = "event_id", path = out)
        graft.sources.PartitionedStore.upsertByDate(
          s,
          events.filter(col("event_id") % 7 === 0)
            .select(col("event_id"), col("ts"), (col("value") + 1.0).as("value")),
          tsCol = "ts", keyCol = "event_id", path = out)
        s.read.parquet(out)
          .select(col("event_id"), col("value"), col("date").cast("string").as("date"))
      },
      Some("""SELECT event_id,
             |       CASE WHEN event_id % 7 = 0 THEN value + 1.0 ELSE value END AS value,
             |       strftime(ts, '%Y-%m-%d') AS date
             |FROM events""".stripMargin)),

    // J2 + F4 — sessions ⟕ costs with COALESCE (channel_reporter.py:36-45).
    QueryDef(
      "j2_session_costs",
      (s, d) =>
        ChannelReport
          .sessionData(Tables.sessions(s, d), Tables.sessionCosts(s, d))
          .select("session_id", "channel_name", "date", "cost"),
      Some(Sql.CTES + "SELECT session_id, channel_name, date, cost FROM session_data")),

    // A1 — the channel/date rollup alone (channel_reporter.py:79-91).
    QueryDef(
      "a1_channel_daily",
      (s, d) => {
        val attr = IhcScorer.score(journeys(s, d))
        val sd = ChannelReport.sessionData(Tables.sessions(s, d), Tables.sessionCosts(s, d))
        ChannelReport.report(sd, attr, Tables.conversions(s, d), roundForOracle = true)
      },
      Some(Sql.CTES +
        s"""SELECT sd.channel_name, sd.date,
           |       ${Sql.rnd("SUM(sd.cost)", 2)} AS cost,
           |       ${Sql.rnd("SUM(a.ihc)", 4)} AS ihc,
           |       ${Sql.rnd("SUM(a.ihc * cv.revenue)", 2)} AS ihc_revenue
           |FROM session_data sd
           |JOIN scored a ON sd.session_id = a.session_id
           |JOIN conversions cv ON a.conversion_id = cv.conv_id
           |GROUP BY 1, 2""".stripMargin))
  )
}
