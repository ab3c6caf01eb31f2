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
    // Raw estimates are engine-specific (DataSketches HLL / GK
    // quantiles) and can never hash-match a DuckDB oracle — so the lane
    // emits a SCORECARD (the ext50 pattern): the EXACT values both
    // engines agree on, plus booleans pinning each estimate inside its
    // documented error envelope (HLL++ rsd 5% → 3σ bound 15%;
    // DataSketches lgK=12 rsd ~1.6% → 5%; approx_percentile verified
    // by EXACT RANK: a second hash-aggregated pass counts values ≤ the
    // estimate, and that count must rank the estimate inside the
    // [40%, 60%] band — a 400× slack on the sketch's guaranteed 0.01%
    // rank error that a wrong median (e.g. an off-by-a-quartile
    // estimate) CANNOT satisfy. No per-group sort anywhere: exact
    // percentile() cost 10× the lane (r14 sweep regression), and the
    // first replacement bounded the estimate by quantiles of the SAME
    // sketch — monotone by construction, vacuously true (ADVICE r14).
    // The oracle computes the same exact values and literal trues — the
    // hash passes iff every estimate is inside its bound.
    QueryDef(
      "an13_sketches",
      (s, d) => {
        val ev = Tables.events(s, d)
        // the exact-distinct ANCHOR runs as its own two-step aggregate
        // (distinct → count): mixing count_distinct into the sketch
        // aggregation forced Expand + SortAggregate around the object
        // aggregates — 10× the lane (r14 sweep regression); split, both
        // legs stay hash-aggregated and meet in a 5-row join. NULLs are
        // excluded BEFORE distinct to preserve count_distinct (and the
        // oracle's COUNT(DISTINCT …)) semantics, which never count NULL
        // (ADVICE r14).
        val exact = ev.select("event_type", "user_id")
          .filter(col("user_id").isNotNull).distinct()
          .groupBy("event_type").agg(count(lit(1)).as("n_users_exact"))
        val sketches = ev
          .groupBy("event_type")
          .agg(
            approx_count_distinct(col("user_id")).as("hllpp"),
            hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("sketch"),
            expr("approx_percentile(value, 0.5, 10000)").as("p50_est"),
            count(lit(1)).as("n"),
            // the rank band's denominator: approx_percentile and the
            // rank count both IGNORE NULL values, so the band must too
            // (n counts all rows and would bias the band if value ever
            // carried NULLs — same fixture-semantics class as the
            // user_id fix above)
            count(col("value")).as("n_vals"))
        // exact-rank verification of the median estimate: one more
        // hash-aggregated pass over events joined to the 5-row estimate
        // frame (broadcast), counting values at-or-under the estimate —
        // independent of the sketch, so the boolean CAN fail
        // TIE-ROBUST two-sided band (ADVICE r15): with heavy ties at the
        // median, count(value <= est) legitimately exceeds 60% — so the
        // upper band tests the STRICT rank (values < est must not pass
        // 60%) and the lower band the inclusive rank (values <= est must
        // reach 40%). A correct median satisfies both under any tie
        // distribution; an off-by-a-quartile estimate still fails one.
        val ranks = ev.select("event_type", "value")
          .join(broadcast(sketches.select("event_type", "p50_est")), Seq("event_type"))
          .groupBy("event_type")
          .agg(
            sum(when(col("value") <= col("p50_est"), 1L).otherwise(0L)).as("rank_le"),
            sum(when(col("value") < col("p50_est"), 1L).otherwise(0L)).as("rank_lt"))
        sketches.join(exact, Seq("event_type"))
          .join(broadcast(ranks), Seq("event_type"))
          .select(
            col("event_type"),
            col("n_users_exact"),
            (abs(col("hllpp") - col("n_users_exact"))
              <= col("n_users_exact") * 0.15).as("hllpp_ok"),
            (abs(col("sketch") - col("n_users_exact"))
              <= col("n_users_exact") * 0.05).as("sketch_ok"),
            (col("rank_le") >= col("n_vals") * 0.40 &&
              col("rank_lt") <= col("n_vals") * 0.60).as("p50_ok"),
            col("n"))
      },
      Some("""SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_exact,
             |       true AS hllpp_ok, true AS sketch_ok, true AS p50_ok,
             |       CAST(COUNT(*) AS BIGINT) AS n
             |FROM events GROUP BY 1""".stripMargin)),

    // ── AN20 — PAGERANK (power iteration, k=3, d=0.85) over the
    //    symmetrized customer↔supplier trade graph (edge = the pair
    //    traded at least once, via lineitem⋈orders). The canonical
    //    joins-as-message-passing workload: per iteration exactly one
    //    keyed join (ranks⋈edges, both hash-partitioned on src) + one
    //    map-side-combinable groupBy(dst); edges persist ONCE with
    //    out-degree pre-attached; localCheckpoint truncates the
    //    iterated lineage (GraphOps.pageRank). Symmetrization makes
    //    every node a source, so no dangling-mass term. The oracle
    //    unrolls the same three iterations as CTEs; ranks round once
    //    at 8 dp (sum-order ulp noise ~1e-15 « granularity; the
    //    teleport constant is written (1.0 - 0.85) in BOTH engines so
    //    the IEEE value matches bit-for-bit).
    QueryDef(
      "an20_pagerank",
      (s, d) => {
        // Internal node ids are LONGS (cust → 2k, supp → 2k+1 — the
        // an26 encoding), decoded to the 'c<k>'/'s<k>' output labels
        // only AFTER the iteration (r17, guide §2.3 narrower types):
        // every distinct / join / groupBy key in the edge build and in
        // all k iterations was hashing and comparing 'c12345'-style
        // strings where an 8-byte integer carries the same identity.
        // The graph — and therefore every rank — is unchanged; only
        // per-key CPU and shuffle bytes shrink. Output is bit-identical
        // modulo sum-order ulp noise, which the lane's 8-dp rounding
        // already absorbs (the oracle has always summed in its own
        // order).
        val e0 = Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .select(
            (col("o_custkey") * 2).as("src"),
            (col("l_suppkey") * 2 + 1).as("dst"))
          .distinct()
        val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
        graft.ops.GraphOps.pageRank(edges, iterations = 3, damping = 0.85)
          .select(
            when(col("node") % 2 === 0, concat(lit("c"), expr("node div 2").cast("string")))
              .otherwise(concat(lit("s"), expr("node div 2").cast("string")))
              .as("node"),
            graft.Num.rnd(col("rank"), 8).as("rank"))
      },
      Some(s"""WITH e0 AS (
              |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
              |                  's' || CAST(l_suppkey AS VARCHAR) AS dst
              |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |), edges AS (
              |  SELECT src, dst FROM e0
              |  UNION ALL SELECT dst AS src, src AS dst FROM e0
              |), deg AS (
              |  SELECT src, COUNT(*) AS d FROM edges GROUP BY 1
              |), nodes AS (
              |  SELECT DISTINCT src AS node FROM edges
              |), nn AS (SELECT COUNT(*) AS n FROM nodes),
              |r0 AS (
              |  SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes
              |), r1 AS (
              |  SELECT nd.node,
              |         (1.0 - 0.85) / (SELECT n FROM nn) + 0.85 * COALESCE(m.s, 0.0) AS rank
              |  FROM nodes nd LEFT JOIN (
              |    SELECT e.dst AS node, SUM(r.rank / dg.d) AS s
              |    FROM edges e JOIN r0 r ON e.src = r.node JOIN deg dg ON e.src = dg.src
              |    GROUP BY 1) m ON nd.node = m.node
              |), r2 AS (
              |  SELECT nd.node,
              |         (1.0 - 0.85) / (SELECT n FROM nn) + 0.85 * COALESCE(m.s, 0.0) AS rank
              |  FROM nodes nd LEFT JOIN (
              |    SELECT e.dst AS node, SUM(r.rank / dg.d) AS s
              |    FROM edges e JOIN r1 r ON e.src = r.node JOIN deg dg ON e.src = dg.src
              |    GROUP BY 1) m ON nd.node = m.node
              |), r3 AS (
              |  SELECT nd.node,
              |         (1.0 - 0.85) / (SELECT n FROM nn) + 0.85 * COALESCE(m.s, 0.0) AS rank
              |  FROM nodes nd LEFT JOIN (
              |    SELECT e.dst AS node, SUM(r.rank / dg.d) AS s
              |    FROM edges e JOIN r2 r ON e.src = r.node JOIN deg dg ON e.src = dg.src
              |    GROUP BY 1) m ON nd.node = m.node
              |)
              |SELECT node, ${Sql.rnd("rank", 8)} AS rank FROM r3""".stripMargin),
      bench = true),

    // ── AN21 — EVENT FUNNEL (view → click → purchase, strictly
    //    ordered): the product-analytics conversion funnel as a chain
    //    of conditional-min aggregates — step k's entry time is the
    //    user's earliest qualifying event AFTER their step-(k−1) time.
    //    Windowless by construction: each step is a filter + keyed
    //    join + map-side-combinable MIN; the per-step headcount is a
    //    metadata-scale scalar. Timestamps stay epoch-nanos longs
    //    end-to-end in Spark while the oracle compares native
    //    timestamps — only ORDER is consulted, so representation
    //    parity is free.
    QueryDef(
      "an21_event_funnel",
      (s, d) => {
        val ev = Tables.events(s, d)
        val st1 = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("ts")).as("t1"))
        val st2 = ev.filter(col("event_type") === "click")
          .join(st1, "user_id").filter(col("ts") > col("t1"))
          .groupBy("user_id").agg(min(col("ts")).as("t2"))
        val st3 = ev.filter(col("event_type") === "purchase")
          .join(st2, "user_id").filter(col("ts") > col("t2"))
          .groupBy("user_id").agg(min(col("ts")).as("t3"))
        st1.agg(count(lit(1)).as("n_users"))
          .select(lit(1L).as("step_idx"), lit("view").as("step"), col("n_users"))
          .union(st2.agg(count(lit(1)).as("n_users"))
            .select(lit(2L).as("step_idx"), lit("click").as("step"), col("n_users")))
          .union(st3.agg(count(lit(1)).as("n_users"))
            .select(lit(3L).as("step_idx"), lit("purchase").as("step"), col("n_users")))
      },
      Some("""WITH s1 AS (
             |  SELECT user_id, MIN(ts) AS t1 FROM events
             |  WHERE event_type = 'view' GROUP BY 1
             |), s2 AS (
             |  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
             |  JOIN s1 ON e.user_id = s1.user_id
             |  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1
             |), s3 AS (
             |  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
             |  JOIN s2 ON e.user_id = s2.user_id
             |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1
             |)
             |SELECT CAST(1 AS BIGINT) AS step_idx, 'view' AS step, COUNT(*) AS n_users FROM s1
             |UNION ALL
             |SELECT CAST(2 AS BIGINT), 'click', COUNT(*) FROM s2
             |UNION ALL
             |SELECT CAST(3 AS BIGINT), 'purchase', COUNT(*) FROM s3""".stripMargin),
      bench = true),

    // ── AN22 — CO-PURCHASE FREQUENT PAIRS (association mining, the
    //    market-basket k=2 staple): part pairs ordered together in ≥ 2
    //    distinct orders. The inverted-index self-join shape the dedup
    //    family uses everywhere — candidates are Σ_order C(items, 2),
    //    bounded by basket size (TPC-H ≤ 7 items/order), never |parts|²;
    //    the support count is a map-side-combinable keyed agg and the
    //    min-support gate drops the long singleton tail before any
    //    output materializes. All-integer output — hash-exact.
    QueryDef(
      "an22_copurchase",
      (s, d) => {
        // shared ok-keyed exchange for dedup + self-join — see an24 (r18)
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .repartition(col("ok"))
          .distinct()
        li.as("a").join(li.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
          .groupBy(col("a.pk").as("p1"), col("b.pk").as("p2"))
          .agg(count(lit(1)).as("support"))
          .filter(col("support") >= 2L)
      },
      Some("""WITH li AS (
             |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
             |)
             |SELECT a.pk AS p1, b.pk AS p2, COUNT(*) AS support
             |FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
             |GROUP BY 1, 2 HAVING COUNT(*) >= 2""".stripMargin),
      bench = true),

    // ── AN23 — MARKOV-CHAIN ATTRIBUTION (removal effects): credit each
    //    channel by how much the absorbing chain's start→conv
    //    probability drops when transitions into it redirect to null —
    //    the data-driven multi-touch model beside the reference's IHC
    //    scorer. Path/transition extraction is the data-scale pass
    //    (per-user windows, (ts, event_id) tie-breaks, paths truncate
    //    after the first conversion, non-converters absorb into null);
    //    the matrix math is state-scale driver arithmetic mirrored by
    //    the oracle's unrolled 6-iteration CTE blocks (one per removed
    //    channel — the fixture's four non-purchase event types, pinned
    //    here; the op derives channels from data). Doubles round once
    //    at 6 dp; the only cross-engine drift is sum-order ulps in
    //    ≤ 7-term dot products.
    QueryDef(
      "an23_markov_attribution",
      (s, d) => {
        val eff = graft.ops.Markov.removalEffects(
          graft.ops.Markov.transitions(Tables.events(s, d)))
        eff.select(col("channel"),
          graft.Num.rnd(col("p_base"), 6).as("p_base"),
          graft.Num.rnd(col("p_removed"), 6).as("p_removed"),
          graft.Num.rnd(col("removal_effect"), 6).as("removal_effect"),
          graft.Num.rnd(col("share"), 6).as("share"))
      },
      Some(MarkovOracle),
      bench = true),

    // ── AN24 — TRIANGLE LISTING (degree-ordered orientation) over the
    //    co-purchase part graph (edge = two parts share an order). The
    //    graph-structure complement of an22's pair support: triangles
    //    are the unit of clustering coefficients and community density.
    //    GraphOps.triangles orients every edge low→high under the
    //    (degree, node) total order, so wedge volume is Σ C(outdeg, 2)
    //    = O(m^1.5) — the hub's C(d, 2) blowup ("the curse of the last
    //    reducer") structurally cannot happen, where the naive
    //    neighbor-pair join dies on the first power-law key. Each
    //    triangle is listed exactly ONCE (the orientation is acyclic —
    //    no post-dedup); output is the sorted all-integer triple,
    //    hash-exact. The oracle lists each triangle from its SMALLEST
    //    node (two incident edges + the closing edge) — an independent
    //    formulation of counted-exactly-once.
    QueryDef(
      "an24_triangles",
      (s, d) => {
        // repartition(ok) BEFORE the distinct (r18, guide §2.4): the
        // hash layout on ok satisfies BOTH the (ok, pk) dedup (same-pair
        // rows colocate under the coarser key) and the self-join's
        // distribution, so the exchange is shared — the non-broadcast
        // scale path previously paid Exchange(ok, pk) + Exchange(ok);
        // locally (AQE broadcasts one side) the shape is neutral.
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .repartition(col("ok"))
          .distinct()
        val edges = li.as("a").join(li.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
          .select(col("a.pk").as("a"), col("b.pk").as("b"))
        graft.ops.GraphOps.triangles(edges)
      },
      Some("""WITH li AS (
             |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
             |), e AS (
             |  SELECT DISTINCT a.pk AS u, b.pk AS v
             |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
             |)
             |SELECT e1.u AS n1, e1.v AS n2, e2.v AS n3
             |FROM e e1
             |JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
             |JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v""".stripMargin),
      // registry-only (not headline): the exact lane is the sampled
      // lane's sf0.1 ground truth, but its sf10 century is a documented
      // disk DNF (wedge volume inherent to the dense fixture graph) and
      // its 14 s min-of-5 was the heaviest headline cost for a lane
      // that can't demonstrate the scale gate — an24_triangles_sampled
      // is the recorded scale path (VERDICT r12 task 5).
      bench = false),

    // ── AN24b — SAMPLED TRIANGLE LISTING (the DOULION scale path:
    //    Tsourakakis et al. 2009, "DOULION: counting triangles in
    //    massive graphs with a coin"). The exact an24 lane is the
    //    ground truth; its wedge volume is inherent to the PROBLEM
    //    (Σ C(outdeg, 2) on a dense uniform-random co-purchase graph —
    //    avg degree ~120 at sf0.1), and the sf10 century DNF'd on
    //    local disk (shuffle bytes > the box; see BASELINE). DOULION
    //    keeps each edge with probability p BEFORE any wedge forms —
    //    wedge volume drops ~p², triangle count scales by p³ (unbiased
    //    estimator: count / p³). The coin is a DETERMINISTIC portable
    //    hash on the canonical edge (BIGINT arithmetic both engines
    //    evaluate identically — never engine-specific rand/xxhash), so
    //    the sampled listing itself is hash-exact cross-engine: the
    //    oracle is the same filter in SQL, not a tolerance band.
    QueryDef(
      "an24_triangles_sampled",
      (s, d) => {
        // shared ok-keyed exchange for dedup + self-join — see an24
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .repartition(col("ok"))
          .distinct()
        val edges = li.as("a").join(li.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
          .select(col("a.pk").as("a"), col("b.pk").as("b"))
          .filter(((col("a") % 1000003L) * 31L + col("b") % 1000003L) % 10L === 0L)
        graft.ops.GraphOps.triangles(edges)
      },
      Some("""WITH li AS (
             |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
             |), e AS (
             |  SELECT DISTINCT a.pk AS u, b.pk AS v
             |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
             |  WHERE ((a.pk % 1000003) * 31 + b.pk % 1000003) % 10 = 0
             |)
             |SELECT e1.u AS n1, e1.v AS n2, e2.v AS n3
             |FROM e e1
             |JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
             |JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v""".stripMargin),
      bench = true),

    // ── AN27 — LOCAL CLUSTERING COEFFICIENT per node: c(v) =
    //    2·t(v) / (d(v)·(d(v)−1)) — how close each part's co-purchase
    //    neighborhood is to a clique, THE standard per-node graph
    //    statistic triangles exist to feed (Watts & Strogatz 1998).
    //    Composes the engine's own primitives on the DOULION-sampled
    //    graph (an24b's deterministic coin, so the whole lane stays
    //    hash-exact and disk-safe at scale): one degree agg + the
    //    oriented triangle listing + one explode-and-count over the
    //    listed triples (each triangle credits its three corners).
    //    Float discipline: c(v) is ONE division of exact BIGINTs —
    //    IEEE-identical cross-engine — rounded 6 dp; d < 2 nodes have
    //    no defined coefficient and surface NULL, not 0 (a 0 claims
    //    "open neighborhood", NULL says "no neighborhood to close").
    QueryDef(
      "an27_clustering_coeff",
      (s, d) => {
        // shared ok-keyed exchange for dedup + self-join — see an24
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .repartition(col("ok"))
          .distinct()
        val e = li.as("a").join(li.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
          .select(col("a.pk").as("u"), col("b.pk").as("v"))
          .filter(((col("u") % 1000003L) * 31L + col("v") % 1000003L) % 10L === 0L)
        val cc = graft.ops.GraphOps.clusteringCoefficient(e)
        cc.select(col("node"), col("degree"), col("n_tri"),
          graft.Num.rnd(col("coeff"), 6).as("coeff"))
      },
      Some(s"""WITH li AS (
              |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
              |), e AS (
              |  SELECT DISTINCT a.pk AS u, b.pk AS v
              |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
              |  WHERE ((a.pk % 1000003) * 31 + b.pk % 1000003) % 10 = 0
              |), deg AS (
              |  SELECT n AS node, COUNT(*) AS degree FROM (
              |    SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e) GROUP BY 1
              |), tri AS (
              |  SELECT e1.u AS n1, e1.v AS n2, e2.v AS n3
              |  FROM e e1
              |  JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
              |  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
              |), tn AS (
              |  SELECT n AS node, COUNT(*) AS n_tri FROM (
              |    SELECT n1 AS n FROM tri UNION ALL SELECT n2 FROM tri
              |    UNION ALL SELECT n3 FROM tri) GROUP BY 1
              |)
              |SELECT deg.node, deg.degree, COALESCE(tn.n_tri, 0) AS n_tri,
              |       CASE WHEN deg.degree >= 2
              |            THEN ${Sql.rnd("2.0 * COALESCE(tn.n_tri, 0) / (deg.degree * (deg.degree - 1))", 6)}
              |            ELSE NULL END AS coeff
              |FROM deg LEFT JOIN tn ON deg.node = tn.node""".stripMargin),
      bench = true),

    // ── AN25 — ROLLING Z-SCORE ANOMALY DETECTION over daily event
    //    volumes: each (event_type, day) scores against its own
    //    TRAILING week (RANGE frame, 7..1 PRECEDING — value-based, so
    //    calendar gaps never widen the window; the an17 lesson). The
    //    float-determinism discipline: the window carries only exact
    //    BIGINT moments (n, Σcnt, Σcnt²) — every double (mean,
    //    variance, z) is then a fixed expression tree over identical
    //    integers, bit-equal in both engines (+, ×, ÷, sqrt are all
    //    IEEE-exact ops). z is NULL under 3 prior days or zero
    //    variance; the flag compares the UNROUNDED z so rounding can
    //    never flip it differently across engines. One daily pre-agg
    //    (map-side combined) + one keyed window — the volume entering
    //    the window is days × types, never raw events.
    QueryDef(
      "an25_anomaly",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"),
            expr("(ts div 1000) div 86400000000").as("day"))
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy("event_type").orderBy("day").rangeBetween(-7, -1)
        val st = daily
          .withColumn("n_prior", count(col("cnt")).over(w))
          .withColumn("s1", sum(col("cnt")).over(w))
          .withColumn("s2", sum(col("cnt") * col("cnt")).over(w))
        val variance =
          (col("s2").cast("double") - col("s1").cast("double") * col("s1") / col("n_prior")) /
            (col("n_prior") - 1)
        val zraw = when(col("n_prior") >= 3 && variance > 0.0,
          (col("cnt") - col("s1").cast("double") / col("n_prior")) / sqrt(variance))
        st.select(col("event_type"), col("day"), col("cnt"), col("n_prior"),
          graft.Num.rnd(zraw, 4).as("z"),
          (zraw.isNotNull && abs(zraw) > 2.0).cast("bigint").as("is_anomaly"))
      },
      Some(s"""WITH daily AS (
              |  SELECT event_type, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS cnt
              |  FROM events GROUP BY 1, 2
              |), st AS (
              |  SELECT event_type, day, cnt,
              |         COUNT(cnt) OVER w AS n_prior,
              |         SUM(cnt) OVER w AS s1,
              |         SUM(cnt * cnt) OVER w AS s2
              |  FROM daily
              |  WINDOW w AS (PARTITION BY event_type ORDER BY day
              |               RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)
              |), z AS (
              |  SELECT event_type, day, cnt, n_prior,
              |         CASE WHEN n_prior >= 3 AND
              |                   (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_prior)
              |                     / (n_prior - 1) > 0.0
              |              THEN (cnt - CAST(s1 AS DOUBLE) / n_prior)
              |                   / SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_prior)
              |                          / (n_prior - 1))
              |              ELSE NULL END AS zraw
              |  FROM st
              |)
              |SELECT event_type, day, cnt, n_prior, ${Sql.rnd("zraw", 4)} AS z,
              |       CAST(zraw IS NOT NULL AND ABS(zraw) > 2.0 AS BIGINT) AS is_anomaly
              |FROM z""".stripMargin),
      bench = true),

    // ── AN26 — LABEL PROPAGATION (synchronized, k=3, smallest-label
    //    tie-break) over the an20 customer↔supplier trade graph, ids
    //    integer-encoded (cust → 2k, supp → 2k+1) so the modal-label
    //    argmax is a single combinable max(struct(count, −label)) — no
    //    window, no driver traffic (GraphOps.labelPropagation). The
    //    community complement of an20's centrality and the engine's
    //    connectedComponents reachability: one bridge edge merges two
    //    dense clusters into one COMPONENT but not one COMMUNITY
    //    (GraphSpec pins that law). Deterministic by construction —
    //    synchronized updates + total-order tie-break — which is what
    //    makes a cross-engine oracle possible at all; the oracle
    //    unrolls the same three rounds as CTEs with ROW_NUMBER() OVER
    //    (ORDER BY c DESC, lbl ASC) as the argmax twin. All-integer
    //    output: hash-exact, no float discipline needed.
    QueryDef(
      "an26_label_prop",
      (s, d) => {
        val e0 = Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
          .distinct()
        val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
        graft.ops.GraphOps.labelPropagation(edges, iterations = 3)
      },
      Some {
        def round(i: Int) =
          s"""c$i AS (
             |  SELECT e.dst AS node, l.lbl, COUNT(*) AS c
             |  FROM edges e JOIN l${i - 1} l ON e.src = l.node GROUP BY 1, 2
             |), l$i AS (
             |  SELECT node, lbl FROM (
             |    SELECT node, lbl,
             |           ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, lbl ASC) AS rn
             |    FROM c$i) WHERE rn = 1
             |)""".stripMargin
        s"""WITH e0 AS (
           |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |), edges AS (
           |  SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0
           |), l0 AS (
           |  SELECT DISTINCT src AS node, src AS lbl FROM edges
           |), ${(1 to 3).map(round).mkString(", ")}
           |SELECT node, lbl FROM l3""".stripMargin
      },
      bench = true)
  )

  /** Channels removed one at a time in the an23 oracle — the fixture's
    * non-purchase event types (the OP derives these from data; the
    * static SQL must pin them). */
  /** (A `def`, not a `val`: `all` initializes first in the object body —
    * the Ext35 rule.) */
  private def MarkovChannels = Seq("click", "error", "signup", "view")

  /** One absorption iteration over transition table `tp` (suffix keeps
    * the per-removal blocks apart). */
  private def markovIter(sfx: String, tp: String, i: Int): String =
    s"""p${i}_$sfx AS (
       |  SELECT st.s,
       |         CASE WHEN st.s = 'conv' THEN 1.0
       |              WHEN st.s = 'null' THEN 0.0
       |              ELSE COALESCE((SELECT SUM(t.p * pp.p)
       |                             FROM $tp t JOIN p${i - 1}_$sfx pp ON t.dst = pp.s
       |                             WHERE t.src = st.s), 0.0) END AS p
       |  FROM states st
       |)""".stripMargin

  private def markovAbsorbBlock(sfx: String, tp: String): String =
    (s"""p0_$sfx AS (
        |  SELECT s, CASE WHEN s = 'conv' THEN 1.0 ELSE 0.0 END AS p FROM states
        |)""".stripMargin +: (1 to 6).map(markovIter(sfx, tp, _))).mkString(", ")

  private def MarkovOracle: String = {
    val removalBlocks = MarkovChannels.map { c =>
      s"""tpr_$c AS (
         |  SELECT src, CASE WHEN dst = '$c' THEN 'null' ELSE dst END AS dst,
         |         SUM(p) AS p
         |  FROM tp WHERE src <> '$c' GROUP BY 1, 2
         |), ${markovAbsorbBlock(c, s"tpr_$c")}""".stripMargin
    }.mkString(", ")
    val effRows = MarkovChannels.map { c =>
      s"""SELECT '$c' AS channel,
         |       (SELECT p FROM p6_base WHERE s = 'start') AS p_base,
         |       (SELECT p FROM p6_$c WHERE s = 'start') AS p_removed""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH st0 AS (
       |  SELECT user_id, ts, event_id,
       |         CASE WHEN event_type = 'purchase' THEN 'conv' ELSE event_type END AS state
       |  FROM events
       |), stt AS (
       |  SELECT user_id, ts, event_id, state FROM (
       |    SELECT user_id, ts, event_id, state,
       |           COUNT(*) FILTER (WHERE state = 'conv')
       |             OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pc
       |    FROM st0)
       |  WHERE COALESCE(pc, 0) = 0
       |), tr AS (
       |  SELECT COALESCE(LAG(state) OVER (PARTITION BY user_id ORDER BY ts, event_id),
       |                  'start') AS src,
       |         state AS dst
       |  FROM stt
       |  UNION ALL
       |  SELECT state AS src, 'null' AS dst FROM (
       |    SELECT state,
       |           ROW_NUMBER() OVER (PARTITION BY user_id
       |                              ORDER BY ts DESC, event_id DESC) AS rn
       |    FROM stt)
       |  WHERE rn = 1 AND state <> 'conv'
       |), tc AS (
       |  SELECT src, dst, COUNT(*) AS n FROM tr GROUP BY 1, 2
       |), tp AS (
       |  SELECT src, dst, CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY src) AS p
       |  FROM tc
       |), states AS (
       |  SELECT DISTINCT src AS s FROM tc UNION SELECT DISTINCT dst FROM tc
       |), ${markovAbsorbBlock("base", "tp")}, $removalBlocks,
       |eff AS (
       |$effRows
       |), eff2 AS (
       |  SELECT channel, p_base, p_removed,
       |         1.0 - p_removed / p_base AS removal_effect
       |  FROM eff
       |)
       |SELECT channel, ${Sql.rnd("p_base", 6)} AS p_base,
       |       ${Sql.rnd("p_removed", 6)} AS p_removed,
       |       ${Sql.rnd("removal_effect", 6)} AS removal_effect,
       |       ${Sql.rnd("removal_effect / (SELECT SUM(removal_effect) FROM eff2)", 6)} AS share
       |FROM eff2""".stripMargin
  }
}
