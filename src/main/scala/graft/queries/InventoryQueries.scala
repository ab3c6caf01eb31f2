package graft.queries

import graft.{QueryDef, Sql, Tables}
import graft.ops.{ChannelReport, IhcScorer, JourneyBuilder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The SURVEY.md §2 operator inventory as individually oracle-checked
  * queries — one entry per §2 row that is SQL-expressible (VERDICT r1 #2).
  * Rows already covered by the attribution slice (J1, J2, A1–A3, W1, F4,
  * IHC) live in [[AttributionQueries]]; S2–S5/S7 (file-format sinks and the
  * streaming trigger) are exercised in ScalaTest, not here, because their
  * observable behavior is IO, not a result set.
  *
  * Numeric discipline matches AttributionQueries: BIGINT for every derived
  * integer (Spark window ranks are IntegerType — cast, or the driver's
  * schema compare fails), ROUND on order-dependent double aggregates, and
  * timestamps rendered as strings at the output boundary only.
  */
object InventoryQueries {

  private def journeys(spark: SparkSession, dir: String): DataFrame =
    JourneyBuilder.journeys(Tables.conversions(spark, dir), Tables.sessions(spark, dir))

  private def scored(spark: SparkSession, dir: String): DataFrame =
    IhcScorer.score(journeys(spark, dir))

  /** 2024-01-15 00:00:00 UTC as epoch-nanos (events.ts is ns LongType). */
  private val Jan15Ns: Long = 1705276800L * 1000000000L

  val all: Seq[QueryDef] = Seq(

    // ── S1 — parquet scan with projection + filter pushed into the scan.
    //    `.explain` shows PushedFilters: [IsNotNull(o_totalprice),
    //    GreaterThan(o_totalprice,50000.0)] and a 2-column ReadSchema.
    QueryDef(
      "s1_scan_prune",
      (s, d) =>
        Tables.orders(s, d)
          .filter(col("o_totalprice") > 50000.0)
          .select(col("o_orderkey"), graft.Num.rnd(col("o_totalprice"), 2).as("o_totalprice")),
      Some(s"""SELECT o_orderkey, ${Sql.rnd("o_totalprice", 2)} AS o_totalprice
              |FROM orders WHERE o_totalprice > 50000.0""".stripMargin)),

    // ── P1 — column projection + reorder (cj_builder.py:103-106).
    QueryDef(
      "p1_project",
      (s, d) => Tables.sessions(s, d).select("session_id", "channel_name", "user_id"),
      Some(Sql.CTES + "SELECT session_id, channel_name, user_id FROM sessions")),

    // ── P2 — rename channel_name → channel_label (cj_builder.py:100).
    QueryDef(
      "p2_rename",
      (s, d) =>
        Tables.sessions(s, d)
          .withColumnRenamed("channel_name", "channel_label")
          .select("session_id", "channel_label"),
      Some(Sql.CTES + "SELECT session_id, channel_name AS channel_label FROM sessions")),

    // ── P3 — literal column add: constant conversion flag (cj_builder.py:93-97).
    QueryDef(
      "p3_literal",
      (s, d) =>
        Tables.conversions(s, d).select(col("conv_id"), lit(0L).as("conversion")),
      Some(Sql.CTES + "SELECT conv_id, CAST(0 AS BIGINT) AS conversion FROM conversions")),

    // ── P4 — inclusive date-range predicate on the conversion date string
    //    (cj_builder.py:45-53; ISO strings compare lexicographically).
    QueryDef(
      "p4_date_range",
      (s, d) =>
        Tables.conversions(s, d)
          .withColumn("conv_date", date_format(Tables.tsMicros("conv_ts"), "yyyy-MM-dd"))
          .filter(col("conv_date") >= "2024-01-10" && col("conv_date") <= "2024-01-20")
          .select("conv_id", "conv_date"),
      Some(Sql.CTES +
        """SELECT conv_id, strftime(conv_ts, '%Y-%m-%d') AS conv_date FROM conversions
          |WHERE strftime(conv_ts, '%Y-%m-%d') >= '2024-01-10'
          |  AND strftime(conv_ts, '%Y-%m-%d') <= '2024-01-20'""".stripMargin)),

    // ── P5 — equality predicate on key: sessions of one user (cj_builder.py:87).
    QueryDef(
      "p5_user_eq",
      (s, d) =>
        Tables.sessions(s, d).filter(col("user_id") === 7L).select("session_id", "user_id"),
      Some(Sql.CTES + "SELECT session_id, user_id FROM sessions WHERE user_id = 7")),

    // ── P6 — temporal inequality predicate (cj_builder.py:90).
    QueryDef(
      "p6_ts_le",
      (s, d) =>
        Tables.sessions(s, d).filter(col("ts") <= Jan15Ns).select("session_id"),
      Some(Sql.CTES +
        "SELECT session_id FROM sessions WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'")),

    // ── P7 — isin membership filter (api_client.py:187).
    QueryDef(
      "p7_isin",
      (s, d) =>
        Tables.sessions(s, d)
          .filter(col("channel_name").isin("click", "view"))
          .select("session_id", "channel_name"),
      Some(Sql.CTES +
        "SELECT session_id, channel_name FROM sessions WHERE channel_name IN ('click','view')")),

    // ── P8 — single-value equality filter on a conversion id
    //    (api_client.py:194). The id is resolved at runtime (max conv_id, the
    //    latest purchase — guaranteed prior sessions, unlike the min, whose
    //    journey is empty via ⚠B3) so the query is valid at every scale factor.
    QueryDef(
      "p8_conv_eq",
      (s, d) => {
        val target = Tables.conversions(s, d).agg(max("conv_id").as("conversion_id"))
        journeys(s, d).join(target, Seq("conversion_id"), "inner")
          .select("conversion_id", "session_id")
      },
      Some(Sql.CTES +
        """SELECT conversion_id, session_id FROM journeys
          |WHERE conversion_id = (SELECT MAX(conv_id) FROM conversions)""".stripMargin)),

    // ── P9 — positive-value filter on derived KPIs (channel_reporter.py:138-139).
    QueryDef(
      "p9_positive",
      (s, d) => {
        val rep = ChannelReport.withKpis(
          ChannelReport.report(
            ChannelReport.sessionData(Tables.sessions(s, d), Tables.sessionCosts(s, d)),
            IhcScorer.score(journeys(s, d)),
            Tables.conversions(s, d),
            roundForOracle = true))
        rep.filter(col("CPO") > 0.0)
          .select(col("channel_name"), col("date"), graft.Num.rnd(col("CPO"), 2).as("CPO"))
      },
      Some(Sql.CTES +
        s"""SELECT channel_name, date, ${Sql.rnd("CPO", 2)} AS CPO FROM (
           |  SELECT channel_name, date,
           |         COALESCE(${Sql.rnd("SUM(sd.cost)", 2)} / NULLIF(${Sql.rnd("SUM(a.ihc)", 4)}, CAST(0 AS DOUBLE)), CAST(0 AS DOUBLE)) AS CPO
           |  FROM session_data sd
           |  JOIN scored a ON sd.session_id = a.session_id
           |  GROUP BY 1, 2
           |) r WHERE CPO > 0""".stripMargin)),

    // ── P10 — non-empty guard (pipeline.py:91-100) as a 1-row result.
    QueryDef(
      "p10_nonempty",
      (s, d) => journeys(s, d).agg((count(lit(1)) > 0L).as("nonempty")),
      Some(Sql.CTES + "SELECT COUNT(*) > 0 AS nonempty FROM journeys")),

    // ── P11 — tolerance predicate |Σihc − 1| (api_client.py:95, 262-266):
    //    conversions passing the invariant.
    QueryDef(
      "p11_tolerance",
      (s, d) =>
        scored(s, d)
          .groupBy("conversion_id")
          .agg(sum("ihc").as("ihc_sum"))
          .filter(abs(col("ihc_sum") - 1.0) < 0.0001)
          .select("conversion_id"),
      Some(Sql.CTES +
        """SELECT conversion_id FROM (
          |  SELECT conversion_id, SUM(ihc) AS ihc_sum FROM scored GROUP BY 1
          |) g WHERE ABS(ihc_sum - 1.0) < 0.0001""".stripMargin)),

    // ── J3 — inner equi join sessions ⋈ attribution on session_id
    //    (channel_reporter.py:62-75).
    QueryDef(
      "j3_attr_join",
      (s, d) =>
        Tables.sessions(s, d)
          .join(scored(s, d), Seq("session_id"), "inner")
          .select(col("session_id"), col("conversion_id"), col("channel_name"),
            graft.Num.rnd(col("ihc"), 6).as("ihc")),
      Some(Sql.CTES +
        s"""SELECT s.session_id, a.conversion_id, s.channel_name, ${Sql.rnd("a.ihc", 6)} AS ihc
           |FROM sessions s JOIN scored a ON s.session_id = a.session_id""".stripMargin)),

    // ── J4 — inner equi join to conversions for revenue; dim-sized side is
    //    broadcast by AQE at test SF (channel_reporter.py:76-77).
    QueryDef(
      "j4_revenue_join",
      (s, d) =>
        scored(s, d)
          .join(
            Tables.conversions(s, d).select(col("conv_id").as("conversion_id"), col("revenue")),
            Seq("conversion_id"), "inner")
          .select(col("conversion_id"), col("session_id"),
            graft.Num.rnd(col("ihc") * col("revenue"), 4).as("ihc_revenue")),
      Some(Sql.CTES +
        s"""SELECT a.conversion_id, a.session_id, ${Sql.rnd("a.ihc * c.revenue", 4)} AS ihc_revenue
           |FROM scored a JOIN conversions c ON a.conversion_id = c.conv_id""".stripMargin)),

    // ── J5 — semi-join chunk restriction (api_client.py:182-187).
    QueryDef(
      "j5_semi",
      (s, d) => {
        val chunk = Tables.conversions(s, d)
          .filter(col("conv_id") % 10 === 0)
          .select(col("conv_id").as("conversion_id"))
        journeys(s, d).join(chunk, Seq("conversion_id"), "left_semi")
          .select("conversion_id", "session_id")
      },
      Some(Sql.CTES +
        """SELECT conversion_id, session_id FROM journeys
          |WHERE conversion_id IN (SELECT conv_id FROM conversions WHERE conv_id % 10 = 0)""".stripMargin)),

    // ── A4 — distinct count (cj_builder.py:132).
    QueryDef(
      "a4_distinct_count",
      (s, d) => journeys(s, d).agg(countDistinct("conversion_id").as("n_conversions")),
      Some(Sql.CTES + "SELECT COUNT(DISTINCT conversion_id) AS n_conversions FROM journeys")),

    // ── A5 — distinct values driving the chunker (api_client.py:169).
    QueryDef(
      "a5_distinct_ids",
      (s, d) => journeys(s, d).select("conversion_id").distinct(),
      Some(Sql.CTES + "SELECT DISTINCT conversion_id FROM journeys")),

    // ── A6 — plain count (cj_builder.py:133).
    QueryDef(
      "a6_count",
      (s, d) => journeys(s, d).agg(count(lit(1)).as("n_journeys")),
      Some(Sql.CTES + "SELECT COUNT(*) AS n_journeys FROM journeys")),

    // ── A7 — global sums for the summary (channel_reporter.py:134-135).
    QueryDef(
      "a7_global_sums",
      (s, d) => {
        val sd = ChannelReport.sessionData(Tables.sessions(s, d), Tables.sessionCosts(s, d))
        val rep = ChannelReport.report(sd, scored(s, d), Tables.conversions(s, d))
        rep.agg(
          graft.Num.rnd(sum("cost"), 2).as("total_cost"),
          graft.Num.rnd(sum("ihc_revenue"), 2).as("total_ihc_revenue"))
      },
      Some(Sql.CTES +
        s"""SELECT ${Sql.rnd("SUM(sd.cost)", 2)} AS total_cost,
           |       ${Sql.rnd("SUM(a.ihc * c.revenue)", 2)} AS total_ihc_revenue
           |FROM session_data sd
           |JOIN scored a ON sd.session_id = a.session_id
           |JOIN conversions c ON a.conversion_id = c.conv_id""".stripMargin)),

    // ── A8 — conditional mean over positive KPIs (channel_reporter.py:138-147).
    QueryDef(
      "a8_conditional_mean",
      (s, d) => {
        val rep = ChannelReport.withKpis(
          ChannelReport.report(
            ChannelReport.sessionData(Tables.sessions(s, d), Tables.sessionCosts(s, d)),
            scored(s, d),
            Tables.conversions(s, d),
            roundForOracle = true))
        rep.agg(
          graft.Num.rnd(avg(when(col("CPO") > 0.0, col("CPO"))), 4).as("avg_cpo"),
          graft.Num.rnd(avg(when(col("ROAS") > 0.0, col("ROAS"))), 4).as("avg_roas"))
      },
      Some(Sql.CTES +
        s"""SELECT ${Sql.rnd("AVG(CASE WHEN CPO > 0 THEN CPO END)", 4)} AS avg_cpo,
           |       ${Sql.rnd("AVG(CASE WHEN ROAS > 0 THEN ROAS END)", 4)} AS avg_roas
           |FROM (
           |  SELECT COALESCE(cost / NULLIF(ihc, CAST(0 AS DOUBLE)), CAST(0 AS DOUBLE)) AS CPO,
           |         COALESCE(ihc_revenue / NULLIF(cost, CAST(0 AS DOUBLE)), CAST(0 AS DOUBLE)) AS ROAS
           |  FROM (
           |    SELECT sd.channel_name, sd.date,
           |           ${Sql.rnd("SUM(sd.cost)", 2)} AS cost,
           |           ${Sql.rnd("SUM(a.ihc)", 4)} AS ihc,
           |           ${Sql.rnd("SUM(a.ihc * cv.revenue)", 2)} AS ihc_revenue
           |    FROM session_data sd
           |    JOIN scored a ON sd.session_id = a.session_id
           |    JOIN conversions cv ON a.conversion_id = cv.conv_id
           |    GROUP BY 1, 2
           |  ) base
           |) kpi""".stripMargin)),

    // ── A9 — grouped conditional count (api_client.py:262), standalone.
    QueryDef(
      "a9_within_tolerance",
      (s, d) =>
        scored(s, d)
          .groupBy("conversion_id")
          .agg(sum("ihc").as("ihc_sum"))
          .agg(sum(when(abs(col("ihc_sum") - 1.0) < 0.0001, 1L).otherwise(0L)).as("n_ok")),
      Some(Sql.CTES +
        """SELECT CAST(SUM(CASE WHEN ABS(ihc_sum - 1.0) < 0.0001 THEN 1 ELSE 0 END) AS BIGINT) AS n_ok
          |FROM (SELECT conversion_id, SUM(ihc) AS ihc_sum FROM scored GROUP BY 1) g""".stripMargin)),

    // ── W2 — per-group size gate: journeys of conversions with ≤ 30 sessions
    //    (api_client.py:193-199). Count window, no sort needed.
    QueryDef(
      "w2_session_gate",
      (s, d) =>
        journeys(s, d)
          .withColumn("n", count(lit(1)).over(Window.partitionBy("conversion_id")))
          .filter(col("n") <= 30L)
          .select("conversion_id", "session_id"),
      Some(Sql.CTES +
        """SELECT conversion_id, session_id FROM (
          |  SELECT conversion_id, session_id,
          |         COUNT(*) OVER (PARTITION BY conversion_id) AS n
          |  FROM journeys) j WHERE n <= 30""".stripMargin)),

    // ── C2 — the complement: conversions the reference would skip as
    //    oversize (api_client.py:197-199).
    QueryDef(
      "c2_oversize_skipped",
      (s, d) =>
        journeys(s, d)
          .groupBy("conversion_id")
          .agg(count(lit(1)).as("n_sessions"))
          .filter(col("n_sessions") > 30L),
      Some(Sql.CTES +
        """SELECT conversion_id, COUNT(*) AS n_sessions FROM journeys
          |GROUP BY 1 HAVING COUNT(*) > 30""".stripMargin)),

    // ── C1 — chunk assignment over distinct conversion ids
    //    (api_client.py:179-187): windows of 50 ids in id order. The
    //    reference's chunk numbering is inherently a global sequence, but
    //    the PLAN no longer is: Chunking.globalRank range-partitions the
    //    id set and composes per-partition ranks with metadata-scale
    //    offsets — identical numbering, no Exchange SinglePartition
    //    anywhere (PlanAuditSpec pins that registry-wide).
    QueryDef(
      "c1_chunks",
      (s, d) =>
        graft.ops.Chunking.globalRank(
            Tables.conversions(s, d)
              .select(col("conv_id").as("conversion_id")).distinct(),
            key = "conversion_id")
          .select(col("conversion_id"), ((col("rn") - 1L) / 50L).cast("long").as("chunk_id")),
      Some(Sql.CTES +
        """SELECT conv_id AS conversion_id,
          |       CAST((ROW_NUMBER() OVER (ORDER BY conv_id) - 1) // 50 AS BIGINT) AS chunk_id
          |FROM conversions""".stripMargin)),

    // ── C1b — the zero-sequence variant: when batches only need to be
    //    deterministic and size-bounded (any id may go to any request),
    //    `id mod ceil(n/50)` assigns chunks in a single narrow projection
    //    — no shuffle, no ordering, no second pass. This is the shape
    //    you'd actually run at 100 TB when the reference's exact
    //    numbering doesn't matter, only the ≤-size contract does.
    QueryDef(
      "c1_chunks_scaled",
      (s, d) =>
        graft.ops.Chunking.arithmeticChunks(
          Tables.conversions(s, d)
            .select(col("conv_id").as("conversion_id")).distinct(),
          key = "conversion_id", chunkSize = 50L),
      Some(Sql.CTES +
        """SELECT conv_id AS conversion_id,
          |       CAST(conv_id % GREATEST(1, CAST(CEIL(
          |         (SELECT COUNT(DISTINCT conv_id) FROM conversions) / 50.0) AS BIGINT))
          |         AS BIGINT) AS chunk_id
          |FROM conversions""".stripMargin)),

    // ── U1 — union-all of the two touchpoint streams (§2.6,
    //    cj_builder.py:111-113 set-based).
    QueryDef(
      "u1_union",
      (s, d) => {
        val a = Tables.sessions(s, d)
          .select(col("user_id"), col("ts"), lit("session").as("kind"))
        val b = Tables.conversions(s, d)
          .select(col("user_id"), col("conv_ts").as("ts"), lit("conversion").as("kind"))
        a.unionByName(b)
          .select(col("user_id"),
            date_format(Tables.tsMicros("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"), col("kind"))
      },
      Some(Sql.CTES +
        """SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, 'session' AS kind FROM sessions
          |UNION ALL
          |SELECT user_id, strftime(conv_ts, '%Y-%m-%d %H:%M:%S') AS ts_s, 'conversion' AS kind FROM conversions""".stripMargin)),

    // ── F1 — concat_ws of date + time strings (cj_builder.py:40, 66).
    QueryDef(
      "f1_concat_ws",
      (s, d) =>
        Tables.conversions(s, d).select(
          col("conv_id"),
          concat_ws(" ",
            date_format(Tables.tsMicros("conv_ts"), "yyyy-MM-dd"),
            date_format(Tables.tsMicros("conv_ts"), "HH:mm:ss")).as("conv_dt")),
      Some(Sql.CTES +
        """SELECT conv_id,
          |       strftime(conv_ts, '%Y-%m-%d') || ' ' || strftime(conv_ts, '%H:%M:%S') AS conv_dt
          |FROM conversions""".stripMargin)),

    // ── F2 — timestamp parse of the concatenated string (cj_builder.py:59, 75),
    //    surfaced as epoch seconds (BIGINT in both engines).
    QueryDef(
      "f2_to_timestamp",
      (s, d) =>
        Tables.conversions(s, d).select(
          col("conv_id"),
          to_timestamp(
            concat_ws(" ",
              date_format(Tables.tsMicros("conv_ts"), "yyyy-MM-dd"),
              date_format(Tables.tsMicros("conv_ts"), "HH:mm:ss")),
            "yyyy-MM-dd HH:mm:ss").cast("long").as("epoch_s")),
      Some(Sql.CTES +
        """SELECT conv_id,
          |       CAST(epoch(strptime(strftime(conv_ts, '%Y-%m-%d') || ' ' || strftime(conv_ts, '%H:%M:%S'),
          |                           '%Y-%m-%d %H:%M:%S')) AS BIGINT) AS epoch_s
          |FROM conversions""".stripMargin)),

    // ── F3 — timestamp format (cj_builder.py:116).
    QueryDef(
      "f3_date_format",
      (s, d) =>
        Tables.sessions(s, d).select(
          col("session_id"),
          date_format(Tables.tsMicros("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
          date_format(Tables.tsMicros("ts"), "yyyy-MM-dd").as("date"),
          date_format(Tables.tsMicros("ts"), "HH").as("hour")),
      Some(Sql.CTES +
        """SELECT session_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
          |       strftime(ts, '%Y-%m-%d') AS date, strftime(ts, '%H') AS hour
          |FROM sessions""".stripMargin)),

    // ── F5 — ihc × revenue (channel_reporter.py:71), on the journey frame's
    //    carried revenue (no extra join).
    QueryDef(
      "f5_ihc_revenue",
      (s, d) =>
        IhcScorer.scoreFull(journeys(s, d))
          .select(col("conversion_id"), col("session_id"),
            graft.Num.rnd(col("ihc") * col("revenue"), 4).as("ihc_revenue")),
      Some(Sql.CTES +
        s"""SELECT jr.conversion_id, jr.session_id, ${Sql.rnd("sc.ihc * jr.revenue", 4)} AS ihc_revenue
           |FROM journey_raw jr
           |JOIN scored sc ON jr.conversion_id = sc.conversion_id AND jr.session_id = sc.session_id""".stripMargin)),

    // ── F6 — the KPI divisions with rounded inputs (channel_reporter.py:111-112).
    QueryDef(
      "f6_kpis",
      (s, d) => {
        val rep = ChannelReport.withKpis(
          ChannelReport.report(
            ChannelReport.sessionData(Tables.sessions(s, d), Tables.sessionCosts(s, d)),
            scored(s, d),
            Tables.conversions(s, d),
            roundForOracle = true))
        rep.select(col("channel_name"), col("date"),
          graft.Num.rnd(col("CPO"), 2).as("CPO"), graft.Num.rnd(col("ROAS"), 2).as("ROAS"))
      },
      Some(Sql.CTES +
        s"""SELECT channel_name, date,
           |       ${Sql.rnd("COALESCE(cost / NULLIF(ihc, CAST(0 AS DOUBLE)), CAST(0 AS DOUBLE))", 2)} AS CPO,
           |       ${Sql.rnd("COALESCE(ihc_revenue / NULLIF(cost, CAST(0 AS DOUBLE)), CAST(0 AS DOUBLE))", 2)} AS ROAS
           |FROM (
           |  SELECT sd.channel_name, sd.date,
           |         ${Sql.rnd("SUM(sd.cost)", 2)} AS cost,
           |         ${Sql.rnd("SUM(a.ihc)", 4)} AS ihc,
           |         ${Sql.rnd("SUM(a.ihc * cv.revenue)", 2)} AS ihc_revenue
           |  FROM session_data sd
           |  JOIN scored a ON sd.session_id = a.session_id
           |  JOIN conversions cv ON a.conversion_id = cv.conv_id
           |  GROUP BY 1, 2
           |) r""".stripMargin)),

    // ── F9 — row → JSON record (api_client.py:204, 229): the wire shape a
    //    pluggable external-scorer boundary (S6) would POST. The payload
    //    carries only strings and BIGINTs, where Spark's to_json and
    //    DuckDB's render byte-identically ({"k":v, no spaces, struct
    //    field order, no float formatting in sight}) — so the wire TEXT
    //    itself sits under the hash gate; the from_json(to_json(x)) == x
    //    roundtrip stays unit-tested.
    QueryDef(
      "f9_row_json",
      (s, d) =>
        JourneyBuilder.journeyOutput(journeys(s, d))
          .select(col("conversion_id"), col("session_id"),
            to_json(struct(col("timestamp"), col("channel_label"),
              col("holder_engagement"), col("closer_engagement"),
              col("conversion"), col("impression_interaction"))).as("payload")),
      Some(Sql.CTES +
        """SELECT conversion_id, session_id,
          |       to_json(struct_pack(
          |         "timestamp" := strftime(ts, '%Y-%m-%d %H:%M:%S'),
          |         channel_label := channel_label,
          |         holder_engagement := holder_engagement,
          |         closer_engagement := closer_engagement,
          |         conversion := conversion,
          |         impression_interaction := impression_interaction)) AS payload
          |FROM journeys""".stripMargin)),

    // ── F7 — abs + tolerance as a surfaced boolean (api_client.py:95).
    QueryDef(
      "f7_abs_tolerance",
      (s, d) =>
        scored(s, d)
          .groupBy("conversion_id")
          .agg(sum("ihc").as("ihc_sum"))
          .select(col("conversion_id"), (abs(col("ihc_sum") - 1.0) < 0.0001).as("ok")),
      Some(Sql.CTES +
        """SELECT conversion_id, ABS(ihc_sum - 1.0) < 0.0001 AS ok
          |FROM (SELECT conversion_id, SUM(ihc) AS ihc_sum FROM scored GROUP BY 1) g""".stripMargin)),

    // ── F8 — zero-denominator division → 0 (channel_reporter.py:114-118).
    //    session_id % 3 manufactures a guaranteed-zero denominator on every
    //    third row; Spark non-ANSI x/0 → NULL → coalesce 0 matches DuckDB.
    QueryDef(
      "f8_zero_div",
      (s, d) =>
        ChannelReport.sessionData(Tables.sessions(s, d), Tables.sessionCosts(s, d))
          .select(col("session_id"),
            graft.Num.rnd(
              coalesce(col("cost") / (col("session_id") % 3L).cast("double"), lit(0.0)),
              4).as("cost_ratio")),
      Some(Sql.CTES +
        s"""SELECT session_id,
           |       ${Sql.rnd("COALESCE(cost / NULLIF(CAST(session_id % 3 AS DOUBLE), CAST(0 AS DOUBLE)), CAST(0 AS DOUBLE))", 4)} AS cost_ratio
           |FROM session_data""".stripMargin)),

    // ── F11 — core string functions over the documents corpus (the text
    //    lane uses these internally; this puts the primitives themselves
    //    under the hash gate: 1-based substring, codepoint length, case
    //    mapping, concatenation).
    QueryDef(
      "f11_strings",
      (s, d) =>
        Tables.documents(s, d).select(
          col("doc_id"),
          lower(substring(col("text"), 1, 24)).as("head"),
          length(col("text")).as("len"),
          upper(col("lang")).as("lang_uc"),
          concat(col("source"), lit(":"), col("lang")).as("src_lang")),
      Some("""SELECT doc_id, lower(substring(text, 1, 24)) AS head,
             |       length(text) AS len, upper(lang) AS lang_uc,
             |       source || ':' || lang AS src_lang
             |FROM documents""".stripMargin)),

    // ── F12 — regex extraction/counting. Patterns stay in the
    //    class-and-quantifier subset where Java regex (Spark) and RE2
    //    (DuckDB) agree; fancier constructs (backrefs, lookarounds) are
    //    NOT portable across the engines and have no oracle-able form.
    QueryDef(
      "f12_regex",
      (s, d) =>
        Tables.documents(s, d).select(
          col("doc_id"),
          regexp_extract(col("text"), "([A-Za-z]+)", 1).as("first_word"),
          size(expr("regexp_extract_all(text, '[0-9]+', 0)")).cast("long").as("n_numbers")),
      Some("""SELECT doc_id, regexp_extract(text, '([A-Za-z]+)', 1) AS first_word,
             |       len(regexp_extract_all(text, '[0-9]+', 0)) AS n_numbers
             |FROM documents""".stripMargin)),

    // ── F13 — calendar field extraction + date arithmetic (the
    //    incremental-processing primitives behind P4's date-range
    //    contract): year/month/day/hour fields, +30-day date shift,
    //    day-count since a fixed epoch date. All fields cast BIGINT on
    //    both engines; the shifted date travels as a formatted string so
    //    no engine DATE-type rendering enters the hash. UTC session
    //    timezone keeps field extraction identical (GraftSession).
    QueryDef(
      "f13_datetime",
      (s, d) => {
        val tsm = Tables.tsMicros("ts")
        Tables.events(s, d).select(
          col("event_id"),
          year(tsm).cast("long").as("y"),
          month(tsm).cast("long").as("m"),
          dayofmonth(tsm).cast("long").as("dom"),
          hour(tsm).cast("long").as("h"),
          date_format(date_add(to_date(tsm), 30), "yyyy-MM-dd").as("d30"),
          datediff(to_date(tsm), to_date(lit("2024-01-01"))).cast("long").as("days_since"))
      },
      Some("""SELECT event_id,
             |       CAST(year(ts) AS BIGINT) AS y,
             |       CAST(month(ts) AS BIGINT) AS m,
             |       CAST(day(ts) AS BIGINT) AS dom,
             |       CAST(hour(ts) AS BIGINT) AS h,
             |       strftime(CAST(ts AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS d30,
             |       CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS days_since
             |FROM events""".stripMargin))
  )
}
