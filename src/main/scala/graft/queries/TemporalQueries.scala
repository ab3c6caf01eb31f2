package graft.queries

import graft.{QueryDef, Sql, Tables}
import graft.ops.TemporalJoin
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal-join and window-analytics extensions. SURVEY.md §2.3 and §2.5
  * name the shapes the reference lacks — anti joins, as-of-latest joins,
  * interval joins, ranking, lag/lead, grouping sets beyond ROLLUP,
  * pivot, and time-bucketed aggregation. Each gets a registered query
  * with a DuckDB oracle so the driver's hash gate covers it.
  *
  * Determinism discipline: every ranking/as-of pick carries a unique
  * tie-break key; ranks are cast to BIGINT on the Spark side (Spark's
  * row_number yields INT, DuckDB's BIGINT — a schema-gate mismatch
  * otherwise); µs epoch arithmetic uses unix_micros/epoch_us (exact
  * BIGINT on both engines).
  */
object TemporalQueries {

  val all: Seq[QueryDef] = Seq(

    // J6 — anti join: sessions that have NO cost row (the uncosted
    // quarter). an7 proves EXCEPT on bare ids; this keeps the full row
    // through a left_anti join, the shape Spark plans as a hash anti.
    QueryDef(
      "j6_anti",
      (s, d) =>
        Tables.sessions(s, d).join(
          Tables.sessionCosts(s, d),
          Seq("session_id"),
          "left_anti")
          // fixture ts is ns-long in Spark, µs TIMESTAMP in DuckDB —
          // convert for schema parity (same truncation as DuckDB's read)
          .withColumn("ts", Tables.tsMicros("ts")),
      Some(Sql.CTES +
        """SELECT s.* FROM sessions s
          |WHERE NOT EXISTS (SELECT 1 FROM session_costs c
          |                  WHERE c.session_id = s.session_id)""".stripMargin)),

    // J7 — as-of-latest join: each conversion's most recent session at or
    // before the conversion time (point-in-time lookup). Union +
    // cumulative window — one shuffle, |C|+|S| rows; see TemporalJoin.
    QueryDef(
      "j7_asof",
      (s, d) =>
        TemporalJoin.asOfLatest(
          // prune BEFORE the op: asOfLatest carries every left column
          // through the union struct, and nested-schema pruning does not
          // reach through the window — an unpruned call would drag
          // revenue/engagement columns (and their parquet pages) along.
          // Compare in epoch-µs (div 1000), NOT raw ns: the oracle sees
          // the parquet µs-truncated, and fixture ns have real sub-µs
          // components, so a same-µs-larger-ns session would be <=-
          // excluded here but included by the oracle (same trap j8's
          // bucket arithmetic avoids; latent until same-user same-µs
          // rows exist, but the discipline is all-arithmetic-in-µs)
          Tables.conversions(s, d).select(
            col("conv_id"), col("user_id"), expr("conv_ts div 1000").as("conv_us")),
          Tables.sessions(s, d).select(
            col("user_id"), expr("ts div 1000").as("ts_us"),
            col("session_id"), col("channel_name")),
          key = "user_id",
          leftTs = "conv_us",
          rightTs = "ts_us",
          tieCol = "session_id",
          payload = Seq(
            "last_session_id" -> "session_id",
            // BIGINT epoch-µs, not TIMESTAMP: a NULLABLE timestamp next
            // to a ns/µs unit mismatch defeats downstream comparison
            "last_ts_us" -> "ts_us",
            "last_channel" -> "channel_name"))
          .select("conv_id", "user_id", "last_session_id", "last_ts_us", "last_channel"),
      Some(Sql.CTES +
        """SELECT c.conv_id, c.user_id, s.session_id AS last_session_id,
          |       epoch_us(s.ts) AS last_ts_us, s.channel_name AS last_channel
          |FROM conversions c LEFT JOIN sessions s
          |  ON c.user_id = s.user_id AND s.ts <= c.conv_ts
          |QUALIFY ROW_NUMBER() OVER (PARTITION BY c.conv_id
          |  ORDER BY s.ts DESC NULLS LAST, s.session_id DESC NULLS LAST) = 1""".stripMargin),
      bench = true),

    // J8 — bounded-range (interval) join: session context around each
    // conversion — how many sessions, distinct channels, any user's —
    // within ±1 hour. Binned equi-join on hour buckets (TemporalJoin);
    // the oracle states the same semantics as a bare inequality join.
    QueryDef(
      "j8_range",
      (s, d) =>
        TemporalJoin.aggInWindow(
          // all range arithmetic in epoch-µs longs — ns div 1000 is the
          // same truncation DuckDB applies reading the nanos parquet
          Tables.conversions(s, d).withColumn("conv_us", expr("conv_ts div 1000")),
          Tables.sessions(s, d).select("session_id", "ts", "channel_name")
            .withColumn("ts_us", expr("ts div 1000")),
          leftId = "conv_id",
          leftTs = "conv_us",
          rightTs = "ts_us",
          widthMicros = 3600L * 1000000L,
          aggs = Seq(
            count(lit(1)).as("n_sessions"),
            countDistinct(col("channel_name")).as("n_channels"))),
      Some(Sql.CTES +
        """SELECT c.conv_id, COUNT(*) AS n_sessions,
          |       COUNT(DISTINCT s.channel_name) AS n_channels
          |FROM conversions c JOIN sessions s
          |  ON s.ts >= c.conv_ts - INTERVAL 1 HOUR
          | AND s.ts <= c.conv_ts + INTERVAL 1 HOUR
          |GROUP BY 1""".stripMargin),
      bench = true),

    // J9 — KEYED bounded-range join: the per-entity context window
    // ("this user's sessions within ±1 h of each of their
    // conversions") — the join key is (bucket, user_id), so groups
    // shrink from global bucket density to per-user bucket density.
    QueryDef(
      "j9_keyed_range",
      (s, d) =>
        TemporalJoin.aggInWindow(
          Tables.conversions(s, d).select(
            col("conv_id"), col("user_id"), expr("conv_ts div 1000").as("conv_us")),
          Tables.sessions(s, d).select(
            col("user_id"), col("session_id"), expr("ts div 1000").as("ts_us")),
          leftId = "conv_id",
          leftTs = "conv_us",
          rightTs = "ts_us",
          widthMicros = 3600L * 1000000L,
          aggs = Seq(count(lit(1)).as("n_own_sessions")),
          keyCols = Seq("user_id")),
      Some(Sql.CTES +
        """SELECT c.conv_id, COUNT(*) AS n_own_sessions
          |FROM conversions c JOIN sessions s
          |  ON s.user_id = c.user_id
          | AND s.ts >= c.conv_ts - INTERVAL 1 HOUR
          | AND s.ts <= c.conv_ts + INTERVAL 1 HOUR
          |GROUP BY 1""".stripMargin)),

    // an8 — top-N per group via ranking window. Spark rewrites the
    // rank-filter into WindowGroupLimit (per-partition top-k before the
    // shuffle) — the scale-right plan for "top N per key".
    QueryDef(
      "an8_topn_per_group",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, d)
          .select("o_custkey", "o_orderkey", "o_totalprice")
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 2)
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
             |       ROW_NUMBER() OVER (PARTITION BY o_custkey
             |         ORDER BY o_totalprice DESC, o_orderkey) AS rk
             |FROM orders
             |QUALIFY rk <= 2""".stripMargin)),

    // an9 — lag/lead: µs gap since the user's previous event. Exact
    // BIGINT epoch arithmetic on both engines (unix_micros ≡ epoch_us).
    QueryDef(
      "an9_lag_delta",
      (s, d) =>
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), expr("ts div 1000").as("us"))
          .withColumn("gap_us", col("us") - lag(col("us"), 1).over(
            Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))))
          .select("user_id", "event_id", "gap_us"),
      Some("""SELECT user_id, event_id,
             |       epoch_us(ts) - LAG(epoch_us(ts)) OVER (
             |         PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
             |FROM events""".stripMargin)),

    // an15 — ordered-frame window suite: running totals, quartile
    // assignment, relative rank. The running money sum accumulates
    // BIGINT cents, not doubles: a running double sum is
    // order-dependent in the engine's internal tree (DuckDB windows
    // aggregate via segment tree, Spark incrementally — different fp
    // addition orders), while integer addition is associative and
    // hash-exact. percent_rank is (rank-1)/(n-1) on identical int
    // operands — exact on both engines.
    QueryDef(
      "an15_window_suite",
      (s, d) => {
        // order by µs-truncated time like the oracle (epoch_us), not raw
        // ns — a same-user same-µs pair would otherwise sort by sub-µs
        // ns here but by event_id there (the j7 discipline)
        val byUser = Window.partitionBy("user_id")
          .orderBy(expr("ts div 1000"), col("event_id"))
        Tables.events(s, d)
          // explicit floor: DuckDB's double->BIGINT cast ROUNDS while
          // Spark's truncates — floor() agrees everywhere
          .withColumn("cents", floor(col("value") * 100.0).cast("long"))
          .withColumn("running_cents",
            sum("cents").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("running_n",
            count(lit(1)).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("quartile", ntile(4).over(byUser).cast("long"))
          .withColumn("pct_rank", percent_rank().over(byUser))
          .select("user_id", "event_id", "running_cents", "running_n", "quartile", "pct_rank")
      },
      // The window SUM must be cast back to BIGINT: DuckDB's SUM(BIGINT)
      // yields HUGEINT, which lands in the driver's pandas compare as
      // float64 while Spark's stays int64 — same values, different typed
      // hashes (the one hash_match failure of round 4).
      Some("""SELECT user_id, event_id,
             |       CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) OVER w_run AS BIGINT) AS running_cents,
             |       COUNT(*) OVER w_run AS running_n,
             |       NTILE(4) OVER w AS quartile,
             |       PERCENT_RANK() OVER w AS pct_rank
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id),
             |       w_run AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin)),

    // an16 — FULL OUTER join: both-sides-preserved merge of the session
    // and cost tables (every other join type is covered elsewhere:
    // inner J3/J4, left J2, semi J5, anti J6, as-of J7, interval J8/J9).
    // Full outer cannot broadcast — it must plan a shuffle join with
    // both sides streamed; null indicators mark the unmatched sides.
    QueryDef(
      "an16_full_outer",
      (s, d) =>
        Tables.sessions(s, d).select("session_id", "channel_name")
          .join(
            Tables.sessionCosts(s, d)
              // double the cost ids to manufacture right-only rows
              // (every cost id otherwise has a session): ids past the
              // event range match nothing, and un-costed sessions
              // supply the left-only side
              .select((col("session_id") * 2L).as("session_id"), col("cost")),
            Seq("session_id"), "full_outer")
          .select(
            col("session_id"),
            col("channel_name"),
            graft.Num.rnd(col("cost"), 2).as("cost"),
            col("channel_name").isNull.as("right_only"),
            col("cost").isNull.as("left_only")),
      Some(Sql.CTES +
        s"""SELECT COALESCE(s.session_id, c.session_id) AS session_id,
           |       s.channel_name,
           |       ${Sql.rnd("c.cost", 2)} AS cost,
           |       s.channel_name IS NULL AS right_only,
           |       c.cost IS NULL AS left_only
           |FROM sessions s FULL JOIN
           |     (SELECT session_id * 2 AS session_id, cost FROM session_costs) c
           |  ON s.session_id = c.session_id""".stripMargin)),

    // an10 — CUBE grouping sets over the raw event stream (an4 covers
    // ROLLUP through the SQL front door; this exercises the DataFrame
    // cube API — no join lineage, so DetectAmbiguousSelfJoin is moot).
    QueryDef(
      "an10_cube",
      (s, d) =>
        Tables.events(s, d)
          .withColumn("date", date_format(Tables.tsMicros("ts"), "yyyy-MM-dd"))
          .cube("event_type", "date")
          .agg(graft.Num.rnd(sum("value"), 2).as("total_value"), count(lit(1)).as("n")),
      Some(s"""SELECT event_type, strftime(ts, '%Y-%m-%d') AS date,
              |       ${Sql.rnd("SUM(value)", 2)} AS total_value, COUNT(*) AS n
              |FROM events GROUP BY CUBE (1, 2)""".stripMargin)),

    // an11 — pivot: per-date cost by channel as columns. Fixed value
    // list (the four non-purchase event types) so the output schema is
    // static — the only pivot form that scales (a dynamic pivot needs a
    // driver-side distinct pass first).
    QueryDef(
      "an11_pivot",
      (s, d) => {
        val channels = Seq("click", "view", "signup", "error")
        graft.ops.ChannelReport.sessionData(Tables.sessions(s, d), Tables.sessionCosts(s, d))
          .groupBy("date")
          .pivot("channel_name", channels)
          .agg(sum("cost"))
          .select(col("date") +: channels.map(c => graft.Num.rnd(col(c), 2).as(c)): _*)
      },
      Some(Sql.CTES +
        s"""SELECT date,
           |       ${Sql.rnd("SUM(CASE WHEN channel_name = 'click' THEN cost END)", 2)} AS "click",
           |       ${Sql.rnd("SUM(CASE WHEN channel_name = 'view' THEN cost END)", 2)} AS "view",
           |       ${Sql.rnd("SUM(CASE WHEN channel_name = 'signup' THEN cost END)", 2)} AS "signup",
           |       ${Sql.rnd("SUM(CASE WHEN channel_name = 'error' THEN cost END)", 2)} AS "error"
           |FROM session_data GROUP BY 1""".stripMargin)),

    // an12 — tumbling-window aggregation via Spark's window() function.
    // Both engines bucket on the same grid: Spark windows start at epoch
    // 0 + k·width; DuckDB time_bucket's origin (2000-01-01) is itself a
    // multiple of 6h from epoch 0, so the grids coincide (UTC session).
    QueryDef(
      "an12_tumbling",
      (s, d) =>
        Tables.events(s, d)
          .groupBy(window(Tables.tsMicros("ts"), "6 hours"), col("event_type"))
          .agg(count(lit(1)).as("n"), graft.Num.rnd(sum("value"), 2).as("total_value"))
          .select(col("window.start").as("win_start"), col("event_type"),
            col("n"), col("total_value")),
      Some(s"""SELECT time_bucket(INTERVAL '6 hours', ts) AS win_start, event_type,
              |       COUNT(*) AS n, ${Sql.rnd("SUM(value)", 2)} AS total_value
              |FROM events GROUP BY 1, 2""".stripMargin)),

    // ── AN17 — RANGE-framed rolling window (trailing 7 days BY VALUE,
    //    not by row count): the frame must handle CALENDAR GAPS — a
    //    (type, day) series with missing days still sums exactly the
    //    trailing week, which a ROWS BETWEEN 6 PRECEDING frame gets
    //    wrong the moment one day has no events. Spark needs a numeric
    //    order column for rangeBetween → epoch days; DuckDB mirrors with
    //    integer date subtraction. Cents accumulate as BIGINT: a rolling
    //    DOUBLE sum would be engine-internal-order-dependent (same
    //    discipline as an15).
    QueryDef(
      "an17_rolling_range",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.events(s, d)
          .groupBy(
            date_format(Tables.tsMicros("ts"), "yyyy-MM-dd").as("date"),
            col("event_type"))
          .agg(sum(floor(col("value") * 100.0).cast("long")).as("cents"))
          .withColumn("epoch_day", datediff(col("date"), lit("1970-01-01")))
        val w = Window.partitionBy("event_type").orderBy("epoch_day").rangeBetween(-6, 0)
        daily
          .withColumn("rolling_7d_cents", sum("cents").over(w))
          .select("date", "event_type", "cents", "rolling_7d_cents")
      },
      Some("""WITH daily AS (
             |  SELECT strftime(ts, '%Y-%m-%d') AS date, event_type,
             |         CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) AS BIGINT) AS cents,
             |         CAST(ts AS DATE) - DATE '1970-01-01' AS epoch_day
             |  FROM events GROUP BY 1, 2, 4
             |)
             |SELECT date, event_type, cents,
             |       CAST(SUM(cents) OVER (PARTITION BY event_type ORDER BY epoch_day
             |                             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
             |            AS BIGINT) AS rolling_7d_cents
             |FROM daily""".stripMargin)),

    // ── AN19 — COHORT RETENTION: users cohorted by the ISO week of
    //    their first event; each later week counts the cohort's still-
    //    active distinct users and the retention fraction. The product-
    //    analytics staple that needs no window at all: first-touch is a
    //    keyed min aggregate, activity a fact⋈(user → cohort) keyed
    //    join, the matrix a (cohort, offset) count-distinct, cohort
    //    sizes a broadcast enrich. Week offsets are exact integer
    //    arithmetic on Monday-truncated dates (both engines truncate
    //    ISO weeks), retention rounds once at 4 dp.
    QueryDef(
      "an19_cohort_retention",
      (s, d) => {
        val ev = Tables.events(s, d)
        val firsts = ev.groupBy("user_id")
          .agg(min(col("ts")).as("__ts0"))
          .select(col("user_id"),
            date_trunc("week", Tables.tsMicros("__ts0")).cast("date").as("cw"))
        val sizes = firsts.groupBy("cw").agg(count(lit(1)).as("cohort_size"))
        ev.select(col("user_id"),
            date_trunc("week", Tables.tsMicros("ts")).cast("date").as("w"))
          .join(firsts, "user_id")
          .groupBy("cw", "w")
          .agg(count_distinct(col("user_id")).as("n_users"))
          .join(sizes, "cw")
          .select(
            date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
            (datediff(col("w"), col("cw")) / 7).cast("long").as("week_offset"),
            col("n_users"), col("cohort_size"),
            graft.Num.rnd(
              col("n_users").cast("double") / col("cohort_size").cast("double"), 4)
              .as("retention"))
      },
      Some(s"""WITH f AS (
              |  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cw
              |  FROM events GROUP BY 1
              |), sizes AS (
              |  SELECT cw, COUNT(*) AS cohort_size FROM f GROUP BY 1
              |), act AS (
              |  SELECT f.cw, CAST(date_trunc('week', e.ts) AS DATE) AS w,
              |         COUNT(DISTINCT e.user_id) AS n_users
              |  FROM events e JOIN f USING (user_id)
              |  GROUP BY 1, 2
              |)
              |SELECT strftime(a.cw, '%Y-%m-%d') AS cohort_week,
              |       CAST((a.w - a.cw) // 7 AS BIGINT) AS week_offset,
              |       CAST(n_users AS BIGINT) AS n_users,
              |       CAST(cohort_size AS BIGINT) AS cohort_size,
              |       ${Sql.rnd("CAST(n_users AS DOUBLE) / cohort_size", 4)} AS retention
              |FROM act a JOIN sizes s ON a.cw = s.cw""".stripMargin)),

    // ── AN18 — per-entity event-sequence extraction (the behavioral-
    //    path primitive: attribution path analysis, session n-grams,
    //    user-journey features for training data). One keyed hash
    //    aggregate on user_id; the in-group order is imposed AFTER
    //    collection (array_sort on (ts, event_id, type) structs — the
    //    event_id tie-break makes same-timestamp paths deterministic,
    //    which the hash gate requires), never by a pre-sort the
    //    aggregation would destroy. Path length is bounded by per-user
    //    activity — a whale entity concentrates its own key only (no
    //    cross-key skew); cap upstream with a per-user limit if a
    //    domain has unbounded actors.
    QueryDef(
      "an18_user_paths",
      (s, d) =>
        Tables.events(s, d)
          .groupBy("user_id")
          .agg(
            count(lit(1)).as("n_events"),
            array_join(
              transform(
                array_sort(
                  collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
                e => e.getField("event_type")),
              "->").as("path")),
      Some("""SELECT user_id, COUNT(*) AS n_events,
             |       string_agg(event_type, '->' ORDER BY ts, event_id) AS path
             |FROM events GROUP BY 1""".stripMargin))
  )
}
