package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Step-3 channel reporting (reference channel_reporter.py:21–151):
  * J2 sessions ⟕ costs with COALESCE(cost,0), J3 join to the attribution
  * table on session_id, J4 join to conversions for revenue (dimension-sized
  * at test SF — left to AQE/Catalyst to broadcast; at 100 TB conversions are
  * fact-sized and the shuffled join is correct), A1 group-by
  * (channel_name, date) with the three sums, then CPO/ROAS with
  * zero-denominator → 0 (F6/F8; the reference's pandas inf/NaN cleanup at
  * channel_reporter.py:111–118).
  *
  * Preserved reference semantics: a session appearing in several journeys
  * contributes its cost once per attribution row (the reference joins before
  * summing, channel_reporter.py:62–91); the report's date is the session
  * date, not the conversion date (⚠B5).
  */
object ChannelReport {

  /** J2 + F4: sessions left-joined to costs, null cost → 0, plus the
    * report's `date` string column (session event date). */
  def sessionData(sessions: DataFrame, sessionCosts: DataFrame): DataFrame =
    sessions
      .join(sessionCosts, Seq("session_id"), "left")
      .withColumn("cost", coalesce(col("cost"), lit(0.0)))
      .withColumn("date", date_format(graft.Tables.tsMicros("ts"), "yyyy-MM-dd"))

  /** J3 + J4 + A1: the channel/date rollup. `roundForOracle` quantizes the
    * order-dependent double sums (money 2dp, ihc 4dp) so distributed
    * summation order can't flip the hash compare; the domain pipeline runs
    * unrounded like the reference. */
  def report(
      sessionData: DataFrame,
      attribution: DataFrame,
      conversions: DataFrame,
      roundForOracle: Boolean = false): DataFrame = {
    val rev = conversions.select(col("conv_id").as("conversion_id"), col("revenue"))
    val joined = sessionData
      .join(attribution, Seq("session_id"), "inner")
      .join(rev, Seq("conversion_id"), "inner")
      .withColumn("ihc_revenue", col("ihc") * col("revenue"))
    val agg = joined
      .groupBy("channel_name", "date")
      .agg(
        sum("cost").as("cost"),
        sum("ihc").as("ihc"),
        sum("ihc_revenue").as("ihc_revenue"))
    if (roundForOracle)
      agg.select(
        col("channel_name"),
        col("date"),
        graft.Num.rnd(col("cost"), 2).as("cost"),
        graft.Num.rnd(col("ihc"), 4).as("ihc"),
        graft.Num.rnd(col("ihc_revenue"), 2).as("ihc_revenue"))
    else agg
  }

  /** F6 + F8: CPO = cost/ihc, ROAS = ihc_revenue/cost, 0 when the
    * denominator is 0. */
  def withKpis(report: DataFrame): DataFrame =
    report
      .withColumn("CPO", when(col("ihc") === 0.0, 0.0).otherwise(col("cost") / col("ihc")))
      .withColumn("ROAS", when(col("cost") === 0.0, 0.0).otherwise(col("ihc_revenue") / col("cost")))

  /** The post-save summary the reference prints after every report run
    * (channel_reporter.py:133–151): row count, cost/revenue totals, and
    * the conditional means over positive CPO/ROAS rows only (the A7/A8
    * computations as one scalar aggregate — the report frame is already
    * channel×date-sized, so this is a single cheap pass). `avg_cpo` /
    * `avg_roas` are NULL when no row qualifies (the reference's "No
    * valid ... found" branch). */
  def summary(reportWithKpis: DataFrame): DataFrame =
    reportWithKpis.agg(
      count(lit(1)).as("n_rows"),
      coalesce(sum("cost"), lit(0.0)).as("total_cost"),
      coalesce(sum("ihc_revenue"), lit(0.0)).as("total_ihc_revenue"),
      avg(when(col("CPO") > 0.0, col("CPO"))).as("avg_cpo"),
      avg(when(col("ROAS") > 0.0, col("ROAS"))).as("avg_roas"))

  /** [[summary]] formatted as the reference's printed lines
    * (channel_reporter.py:133–151). One collect of one row. */
  def summaryLines(reportWithKpis: DataFrame): Seq[String] = {
    val r = summary(reportWithKpis).collect().head
    // Locale.ROOT: the artifact must print "12.50" on a comma-decimal
    // default locale too
    def f2(d: Double): String = String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))
    Seq(
      s"Generated channel reporting for ${r.getLong(0)} channel-date combinations",
      s"Total marketing cost: ${f2(r.getDouble(1))} Euro",
      s"Total IHC revenue: ${f2(r.getDouble(2))} Euro",
      if (r.isNullAt(3)) "No valid CPO values found"
      else s"Average CPO: ${f2(r.getDouble(3))} Euro",
      if (r.isNullAt(4)) "No valid ROAS values found"
      else s"Average ROAS: ${f2(r.getDouble(4))}")
  }
}
