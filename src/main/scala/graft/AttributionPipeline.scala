package graft

import graft.ops.{ChannelReport, IhcScorer, JourneyBuilder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's 3-step pipeline with its per-step file contract
  * (reference run_pipeline.py:31–106, §3.2): each step is independently
  * runnable, consuming/producing the inter-step artifacts, so any
  * orchestrator (cron, Airflow, one spark-submit per step) can drive it.
  *
  * Step 1 build_journeys  → customer_journeys CSV (reference cj_builder.py:122–130)
  * Step 2 score           → attribution Parquet, truncate-once overwrite
  *                          (the *intent* of reference api_client.py:139 —
  *                          the reference re-truncates per chunk, ⚠B1, which
  *                          loses all but the last chunk; documented divergence)
  * Step 3 report          → channel_reporting CSV with CPO/ROAS
  *                          (reference channel_reporter.py:99–130)
  *
  * Deliberately preserved reference semantics: conversions with no prior
  * session vanish (⚠B3); sessions at exactly the conversion timestamp are
  * included and the `conversion` flag is constant 0 (⚠B4); the report's
  * date filter applies to the session date, not the conversion date (⚠B5).
  */
object AttributionPipeline {

  /** The customer_journeys CSV schema — a public interface of the system
    * (reference cj_builder.py:103–106; column order is the golden order). */
  val journeyCsvSchema: StructType = StructType(Seq(
    StructField("conversion_id", LongType),
    StructField("session_id", LongType),
    StructField("timestamp", StringType),
    StructField("channel_label", StringType),
    StructField("holder_engagement", LongType),
    StructField("closer_engagement", LongType),
    StructField("conversion", LongType),
    StructField("impression_interaction", LongType)))

  /** Inclusive optional date bounds on a yyyy-MM-dd-comparable column —
    * the ONE definition of the Option matrix used by journey build
    * (conversion date), the report (session date, ⚠B5), and
    * sources.PartitionedStore (partition column). */
  private[graft] def dateBounded(
      df: DataFrame,
      dateCol: org.apache.spark.sql.Column,
      startDate: Option[String],
      endDate: Option[String]): DataFrame =
    Seq(startDate.map(dateCol >= _), endDate.map(dateCol <= _)).flatten
      .foldLeft(df)(_ filter _)

  /** Step 1 — J1 join with optional inclusive conv-date bounds (P4;
    * reference cj_builder.py:45–53 filters the *conversion* date). */
  def buildJourneys(
      conversions: DataFrame,
      sessions: DataFrame,
      startDate: Option[String] = None,
      endDate: Option[String] = None): DataFrame = {
    val convDate = date_format(Tables.tsMicros("conv_ts"), "yyyy-MM-dd")
    JourneyBuilder.journeys(dateBounded(conversions, convDate, startDate, endDate), sessions)
  }

  /** S3 — CSV sink with header; coalesced to one part for the reference's
    * single-file hand-off contract (artifact-sized data; the big tables
    * stay parquet). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.option("header", "true").mode("overwrite").csv(path)

  /** S2 — CSV source with the explicit journey schema (no inference —
    * fixes the reference's inferred-dtype fragility, SURVEY.md §1.4). */
  def readJourneysCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").schema(journeyCsvSchema).csv(path)

  /** Step 2 — native IHC score + Σ=1 normalization on a journey frame
    * (either fresh from step 1, or reloaded from the CSV contract — then
    * `ts` is the formatted string, ordered lexicographically). NB the CSV
    * contract truncates timestamps to seconds (the reference does the
    * same before sending to the API, cj_builder.py:116), so sub-second
    * orderings resolve by the session_id tie-break on this path; the
    * in-memory path keeps nanosecond order. Same trade-off as the
    * reference's own per-step mode. */
  def score(journeys: DataFrame, maxSessions: Option[Int] = None): DataFrame = {
    val withTs =
      if (journeys.columns.contains("ts")) journeys
      else journeys.withColumn("ts", col("timestamp")) // ISO string sorts = time sorts
    IhcScorer.normalize(IhcScorer.score(withTs, maxSessions))
  }

  /** S5 — truncate-once overwrite of the attribution table (⚠B1 intent). */
  def writeAttribution(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** S4 — append sink (reference db_operations.py:59–69 `if_exists=append`). */
  def appendTable(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** Step 3 — the channel/date report with KPIs; optional inclusive bounds
    * on the *session* event date (⚠B5; reference channel_reporter.py:47–56). */
  def report(
      sessions: DataFrame,
      sessionCosts: DataFrame,
      attribution: DataFrame,
      conversions: DataFrame,
      startDate: Option[String] = None,
      endDate: Option[String] = None): DataFrame = {
    val sd = dateBounded(
      ChannelReport.sessionData(sessions, sessionCosts), col("date"), startDate, endDate)
    ChannelReport.withKpis(ChannelReport.report(sd, attribution, conversions))
      .select("channel_name", "date", "cost", "ihc", "ihc_revenue", "CPO", "ROAS")
  }

  /** P10 — the reference's empty-input guard (pipeline.py:91–100). */
  def nonEmpty(df: DataFrame): Boolean = !df.isEmpty

  /** All three steps in-memory (the `--step all` path skips the disk
    * round-trip; per-step mains keep the file contract). Returns the
    * report; writes both CSV artifacts + the attribution table.
    *
    * The journey and attribution frames are persisted across their
    * multiple consumers (guard, artifact write, downstream step) —
    * without it each action re-runs the J1 join and scorer lineage from
    * the scans, which at the target scale is hours of duplicated shuffle.
    * Date bounds follow the reference's asymmetry: `startDate`/`endDate`
    * filter the conversion date during journey build and the session
    * date in the report (⚠B5). */
  def runAll(
      conversions: DataFrame,
      sessions: DataFrame,
      sessionCosts: DataFrame,
      outDir: String,
      startDate: Option[String] = None,
      endDate: Option[String] = None,
      maxSessions: Option[Int] = None): DataFrame = {
    val journeys = buildJourneys(conversions, sessions, startDate, endDate).persist()
    try {
      require(nonEmpty(journeys), "no customer journeys built")
      writeCsv(JourneyBuilder.journeyOutput(journeys), s"$outDir/customer_journeys")
      val attribution = score(journeys, maxSessions).persist()
      try {
        require(nonEmpty(attribution), "no attribution records")
        writeAttribution(attribution, s"$outDir/attribution_customer_journey")
        val rep = report(sessions, sessionCosts, attribution, conversions, startDate, endDate)
        writeCsv(rep, s"$outDir/channel_reporting")
        rep
      } finally attribution.unpersist()
    } finally journeys.unpersist()
  }
}
