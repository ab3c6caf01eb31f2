package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver testdata plus the attribution-domain mapping
  * (SURVEY.md §7.4, FIXTURES.md §1).
  *
  * The reference engine's domain tables (SURVEY.md §1.2 — reconstructed from
  * reference cj_builder.py:36–72, channel_reporter.py:33–93,
  * api_client.py:139–149) map onto the `events` fixture: purchase events are
  * conversions, every other event is a session touchpoint. Engagement flags
  * and the cost table are derived with plain integer arithmetic on
  * `event_id` so the DuckDB oracle reproduces them exactly (no
  * engine-specific hash functions).
  */
object Tables {

  def read(spark: SparkSession, dir: String, table: String): DataFrame =
    spark.read.parquet(s"$dir/$table.parquet")

  /** Normalize a timestamp column to the engine's canonical interchange
    * type, epoch-nanos LongType, whatever physical type the fixture
    * generation chose. The driver has shipped `events.ts` as both Parquet
    * TIMESTAMP(NANOS) (read as LongType under
    * `spark.sql.legacy.parquet.nanosAsLong`) and plain `timestamp[us]`
    * (read natively as TIMESTAMP_NTZ); a reader hard-wired to either
    * breaks when the fixture regenerates. All conversion is integer
    * arithmetic (`unix_micros × 1000`), lossless in both directions for
    * µs-resolution data; the NTZ→LTZ cast is wall-clock-preserving under
    * the UTC session timezone GraftSession pins. */
  def normalizeTs(df: DataFrame, cols: String*): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      d.schema(c).dataType match {
        case org.apache.spark.sql.types.LongType => d
        case org.apache.spark.sql.types.TimestampNTZType =>
          d.withColumn(c, unix_micros(col(c).cast(org.apache.spark.sql.types.TimestampType)) * lit(1000L))
        case org.apache.spark.sql.types.TimestampType =>
          d.withColumn(c, unix_micros(col(c)) * lit(1000L))
        case other =>
          throw new IllegalArgumentException(s"column $c: cannot normalize $other to epoch-nanos long")
      }
    }

  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(read(spark, dir, "events"), "ts")
  def orders(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "orders")
  def part(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "part")
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def nation(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "region")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** Register every fixture table AND the derived attribution-domain
    * views as temp views — the SQL entry point's catalog (`--step sql`).
    * The reference's native user interface is SQL text over these very
    * tables (cj_builder.py:36–42, channel_reporter.py:33–93); this is
    * what lets its audience run ad-hoc SQL through the engine without
    * writing a line of Scala. Timestamps follow the engine's canonical
    * interchange: epoch-nanos BIGINT (`ts div 1000` → µs,
    * `timestamp_micros` → native). */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem",
      "documents", "embeddings")
      .foreach(t => read(spark, dir, t).createOrReplaceTempView(t))
    events(spark, dir).createOrReplaceTempView("events")
    conversions(spark, dir).createOrReplaceTempView("conversions")
    sessions(spark, dir).createOrReplaceTempView("sessions")
    sessionCosts(spark, dir).createOrReplaceTempView("session_costs")
  }

  /** epoch-nanos LongType → TimestampType(µs). Integer division only —
    * double division loses µs precision above 2^53 ns (≈ 1970+104 days). */
  def tsMicros(c: String): Column = timestamp_micros(expr(s"$c div 1000"))

  /** Conversions ≈ purchase events: conv_id, user_id, conv_ts (ns long), revenue. */
  def conversions(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id").as("conv_id"),
        col("user_id"),
        col("ts").as("conv_ts"),
        col("value").as("revenue"))

  /** Sessions ≈ non-purchase events, with deterministically derived
    * engagement flags (reference session_sources, cj_builder.py:62–72). */
  def sessions(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .filter(col("event_type") =!= "purchase")
      .select(
        col("event_id").as("session_id"),
        col("user_id"),
        col("ts"),
        col("event_type").as("channel_name"),
        (col("event_id") % 2).as("holder_engagement"),
        when(col("event_id") % 3 === 0, 1L).otherwise(0L).as("closer_engagement"),
        when(col("event_id") % 5 === 0, 1L).otherwise(0L).as("impression_interaction"))

  /** Session costs ≈ event value for 3 of 4 sessions; the missing quarter
    * exercises the left-join + COALESCE(cost, 0) path (reference
    * channel_reporter.py:40–44). */
  def sessionCosts(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .filter(col("event_type") =!= "purchase" && col("event_id") % 4 =!= 0)
      .select(col("event_id").as("session_id"), col("value").as("cost"))
}

/** Spark-side mirror of [[Sql.rnd]]: half-away-from-zero rounding as pure
  * IEEE arithmetic, bit-identical to the DuckDB oracle (see Sql.rnd
  * scaladoc). The sign split matters: bare `floor(x·p + 0.5)` rounds
  * negative ties toward −∞ (−0.05 → 0.0 at 1dp), which is not any
  * conventional rounding mode once values can be negative (refunds,
  * credits, negative cosines). `floor` yields LongType, so the product
  * must stay within ±2⁶³ — fine for money/ihc magnitudes at any realistic
  * scale (≤ ~9e14 at n=4). */
object Num {
  import org.apache.spark.sql.functions.{abs, floor, lit, signum}
  def rnd(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    signum(c) * (floor(abs(c) * lit(p) + lit(0.5)) / lit(p))
  }
}

/** DuckDB-dialect oracle CTEs mirroring [[Tables]] and the attribution ops.
  * Every oracle query is `CTES + "SELECT …"`; DuckDB binds CTEs lazily so
  * unused ones cost nothing. Numeric discipline for hash parity:
  * integer raw scores (exact window sums → bit-identical ihc ratios),
  * BIGINT flags on both sides, and rounding only on order-dependent
  * double aggregates (money sums to 2dp, ihc sums to 4dp).
  */
object Sql {

  /** Half-away-from-zero rounding via pure IEEE arithmetic —
    * `SIGN(x)·FLOOR(|x|·10ⁿ + 0.5)/10ⁿ`. Spark's `round` (BigDecimal
    * HALF_UP over the double's shortest decimal representation) and
    * DuckDB's `ROUND` (float multiply) disagree on ~0.05% of arbitrary
    * doubles (decimal-boundary values like 2.06125); sign/abs/multiply/
    * add/floor/divide is bit-identical in both engines, and the sign
    * split keeps ties rounding AWAY from zero for negative inputs too
    * (bare floor(x+0.5) pulls them toward −∞). Mirror of [[Num.rnd]]. */
  def rnd(e: String, n: Int): String =
    s"SIGN(($e)) * (FLOOR(ABS(($e)) * 1e$n + 0.5) / 1e$n)"

  val CTES: String =
    """WITH conversions AS (
      |  SELECT event_id AS conv_id, user_id, ts AS conv_ts, value AS revenue
      |  FROM events WHERE event_type = 'purchase'
      |), sessions AS (
      |  SELECT event_id AS session_id, user_id, ts, event_type AS channel_name,
      |         event_id % 2 AS holder_engagement,
      |         CAST(CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT) AS closer_engagement,
      |         CAST(CASE WHEN event_id % 5 = 0 THEN 1 ELSE 0 END AS BIGINT) AS impression_interaction
      |  FROM events WHERE event_type <> 'purchase'
      |), session_costs AS (
      |  SELECT event_id AS session_id, value AS cost
      |  FROM events WHERE event_type <> 'purchase' AND event_id % 4 <> 0
      |), journeys AS (
      |  SELECT c.conv_id AS conversion_id, s.session_id, s.ts,
      |         s.channel_name AS channel_label,
      |         s.holder_engagement, s.closer_engagement,
      |         CAST(0 AS BIGINT) AS conversion, s.impression_interaction,
      |         c.conv_ts, c.revenue
      |  FROM conversions c JOIN sessions s
      |    ON c.user_id = s.user_id AND s.ts <= c.conv_ts
      |), journey_raw AS (
      |  SELECT *, 4 + (CASE WHEN rn = 1 THEN 6 ELSE 0 END)
      |              + (CASE WHEN rn = n THEN 8 ELSE 0 END)
      |              + 2 * holder_engagement
      |              + impression_interaction
      |              + (CASE WHEN rn = n THEN 3 ELSE 0 END) * closer_engagement AS raw
      |  FROM (
      |    SELECT *,
      |           ROW_NUMBER() OVER (PARTITION BY conversion_id ORDER BY ts, session_id) AS rn,
      |           COUNT(*) OVER (PARTITION BY conversion_id) AS n
      |    FROM journeys) jp
      |), scored AS (
      |  SELECT conversion_id, session_id,
      |         CAST(raw AS DOUBLE) / CAST(SUM(raw) OVER (PARTITION BY conversion_id) AS DOUBLE) AS ihc
      |  FROM journey_raw
      |), session_data AS (
      |  SELECT s.session_id, s.user_id, s.ts, s.channel_name,
      |         strftime(s.ts, '%Y-%m-%d') AS date,
      |         COALESCE(c.cost, CAST(0 AS DOUBLE)) AS cost
      |  FROM sessions s LEFT JOIN session_costs c ON s.session_id = c.session_id
      |)
      |""".stripMargin
}
