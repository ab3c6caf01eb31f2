package graft.queries

import graft.{QueryDef, Sql, Tables}
import org.apache.spark.sql.functions._

/** General analytical rollups over the TPC-H-ish star schema. The
  * reference has no ORDER BY / LIMIT / multiway dimension joins anywhere
  * (SURVEY.md §2.6) — these queries prove the engine supplies them as
  * ordinary Spark primitives: global sort + limit (TakeOrderedAndProject
  * in the plan — a per-partition top-k, not a full global sort), broadcast
  * dimension join chains, and wide multi-aggregate group-bys.
  *
  * Determinism discipline: every ORDER BY carries a unique tie-break key
  * and every double aggregate is rounded via the portable FLOOR form.
  */
object AnalyticsQueries {

  val all: Seq[QueryDef] = Seq(

    // Pricing-summary rollup (TPC-H Q1 shape): wide multi-aggregate
    // group-by with arithmetic between columns.
    QueryDef(
      "an1_pricing_summary",
      (s, d) =>
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") <= "1998-09-02")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            graft.Num.rnd(sum("l_quantity"), 2).as("sum_qty"),
            graft.Num.rnd(sum("l_extendedprice"), 2).as("sum_base_price"),
            graft.Num.rnd(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
              .as("sum_disc_price"),
            graft.Num.rnd(avg("l_quantity"), 4).as("avg_qty"),
            graft.Num.rnd(avg("l_discount"), 4).as("avg_disc"),
            count(lit(1)).as("count_order")),
      Some(s"""SELECT l_returnflag, l_linestatus,
              |       ${Sql.rnd("SUM(l_quantity)", 2)} AS sum_qty,
              |       ${Sql.rnd("SUM(l_extendedprice)", 2)} AS sum_base_price,
              |       ${Sql.rnd("SUM(l_extendedprice * (1.0 - l_discount))", 2)} AS sum_disc_price,
              |       ${Sql.rnd("AVG(l_quantity)", 4)} AS avg_qty,
              |       ${Sql.rnd("AVG(l_discount)", 4)} AS avg_disc,
              |       COUNT(*) AS count_order
              |FROM lineitem
              |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
              |GROUP BY 1, 2""".stripMargin),
      bench = true),

    // Top-revenue orders (TPC-H Q3 shape): fact⋈fact join + global
    // sort/limit — Spark plans TakeOrderedAndProject (partial top-k per
    // partition, only k rows reach the driver-side merge).
    QueryDef(
      "an2_top_orders",
      (s, d) => {
        val rev = Tables.lineitem(s, d)
          .groupBy("l_orderkey")
          .agg(graft.Num.rnd(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"))
        Tables.orders(s, d)
          .join(rev, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_orderkey"), col("revenue"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      },
      Some(s"""SELECT o_orderkey, revenue, strftime(o_orderdate, '%Y-%m-%d') AS o_date
              |FROM orders
              |JOIN (SELECT l_orderkey,
              |             ${Sql.rnd("SUM(l_extendedprice * (1.0 - l_discount))", 2)} AS revenue
              |      FROM lineitem GROUP BY 1) r
              |  ON o_orderkey = l_orderkey
              |ORDER BY revenue DESC, o_orderkey
              |LIMIT 10""".stripMargin)),

    // Revenue by nation (TPC-H Q5 shape): a chain of broadcast dimension
    // joins (region → nation → customer) onto the fact tables.
    QueryDef(
      "an3_nation_revenue",
      (s, d) => {
        val c = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
        val n = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        val r = Tables.region(s, d).select(col("r_regionkey"), col("r_name"))
        val rev = Tables.lineitem(s, d)
          .select(col("l_orderkey"),
            (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
        Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
          .join(rev, col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(graft.Num.rnd(sum("rev"), 2).as("revenue"), count(lit(1)).as("n_items"))
      },
      Some(s"""SELECT r_name, n_name,
              |       ${Sql.rnd("SUM(l_extendedprice * (1.0 - l_discount))", 2)} AS revenue,
              |       COUNT(*) AS n_items
              |FROM lineitem
              |JOIN orders   ON o_orderkey = l_orderkey
              |JOIN customer ON c_custkey = o_custkey
              |JOIN nation   ON n_nationkey = c_nationkey
              |JOIN region   ON r_regionkey = n_regionkey
              |GROUP BY 1, 2""".stripMargin),
      bench = true),

    // ROLLUP over the channel report dimensions (grouping sets — absent
    // from the reference, SURVEY §2.4; subtotal rows get NULL dimensions).
    // Expressed through spark.sql: the DataFrame `rollup` trips
    // DetectAmbiguousSelfJoin on the session⟕cost join lineage even with
    // a deduplicating projection in between (re-verified on Spark 4.1.2
    // this round: "Column channel_name#N are ambiguous"), while the SQL
    // path resolves cleanly — and exercises the engine's SQL front door.
    QueryDef(
      "an4_rollup",
      (s, d) => {
        // unique per-call view name (no catalog pollution / cross-call
        // races on a shared session), dropped once the plan is resolved
        val view = s"an4_sd_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        graft.ops.ChannelReport.sessionData(Tables.sessions(s, d), Tables.sessionCosts(s, d))
          .select("channel_name", "cost")
          .createOrReplaceTempView(view)
        val out = s.sql(
          s"""SELECT channel_name, ${Sql.rnd("SUM(cost)", 2)} AS cost, COUNT(*) AS n
             |FROM $view GROUP BY ROLLUP (channel_name)""".stripMargin)
        s.catalog.dropTempView(view) // plan already resolved; safe to drop
        out
      },
      Some(Sql.CTES +
        s"""SELECT channel_name, ${Sql.rnd("SUM(cost)", 2)} AS cost, COUNT(*) AS n
           |FROM session_data GROUP BY ROLLUP (channel_name)""".stripMargin)),

    // Exact percentiles (§2.4 lists median as absent from the reference).
    // Both engines use linear interpolation for continuous quantiles on
    // DOUBLE; values here are exact integer ratios of small ints.
    QueryDef(
      "an5_percentiles",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            graft.Num.rnd(expr("percentile(l_quantity, 0.5)"), 4).as("median_qty"),
            graft.Num.rnd(expr("percentile(l_quantity, 0.9)"), 4).as("p90_qty")),
      Some(s"""SELECT l_returnflag,
              |       ${Sql.rnd("quantile_cont(l_quantity, 0.5)", 4)} AS median_qty,
              |       ${Sql.rnd("quantile_cont(l_quantity, 0.9)", 4)} AS p90_qty
              |FROM lineitem GROUP BY 1""".stripMargin)),

    // INTERSECT / EXCEPT set ops (§2.6: absent from the reference).
    QueryDef(
      "an6_intersect",
      (s, d) => {
        val purchasers = Tables.events(s, d)
          .filter(col("event_type") === "purchase").select("user_id")
        val clickers = Tables.events(s, d)
          .filter(col("event_type") === "click").select("user_id")
        purchasers.intersect(clickers)
      },
      Some("""SELECT user_id FROM events WHERE event_type = 'purchase'
             |INTERSECT
             |SELECT user_id FROM events WHERE event_type = 'click'""".stripMargin)),

    QueryDef(
      "an7_except",
      (s, d) => {
        val allSessions = Tables.sessions(s, d).select("session_id")
        val costed = Tables.sessionCosts(s, d).select("session_id")
        allSessions.except(costed) // the uncosted quarter (event_id % 4 == 0)
      },
      Some(Sql.CTES +
        """SELECT session_id FROM sessions
          |EXCEPT
          |SELECT session_id FROM session_costs""".stripMargin)),

    // an14 — fixed-width histogram: bucket = floor(price / width). One
    // hash aggregate; the bucketing projection is exact IEEE divide +
    // floor on both engines.
    QueryDef(
      "an14_histogram",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(floor(col("l_extendedprice") / 1000.0).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n"),
            graft.Num.rnd(sum("l_extendedprice"), 2).as("total")),
      Some(s"""SELECT CAST(FLOOR(l_extendedprice / 1000.0) AS BIGINT) AS bucket,
              |       COUNT(*) AS n, ${Sql.rnd("SUM(l_extendedprice)", 2)} AS total
              |FROM lineitem GROUP BY 1""".stripMargin)),

    // an13 — sketch aggregates: the 100 TB substitutes for exact
    // distinct/percentile (SURVEY §2.4 lists A4's scale path as
    // approx_count_distinct). HLL sketches are MERGEABLE — the property
    // that lets a pre-aggregated per-partition sketch table answer
    // global distinct questions without re-touching the facts
    // (AggregateSketchSpec pins estimate accuracy and mergeability).
    // Estimates are engine-specific (DataSketches HLL / GK quantiles) —
    // no DuckDB oracle by design, rows-only + ScalaTest; since round 9
    // this is the registry's ONLY rows-only lane (simhash graduated to
    // a full MD5-nibble oracle).
    QueryDef(
      "an13_sketches",
      (s, d) =>
        Tables.events(s, d)
          .groupBy("event_type")
          .agg(
            approx_count_distinct(col("user_id")).as("n_users_hllpp"),
            hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("n_users_sketch"),
            graft.Num.rnd(expr("approx_percentile(value, 0.5, 10000)"), 2).as("p50_value"),
            count(lit(1)).as("n")),
      None)
  )
}
