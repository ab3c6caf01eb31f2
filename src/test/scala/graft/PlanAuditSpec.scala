package graft

import org.apache.spark.sql.functions.col

/** Automated physical-plan guard over the ENTIRE query registry: no
  * registered query may plan a cartesian product or an unintended
  * broadcast-nested-loop join, and the key scale-bearing plan features
  * must be present. Catches plan regressions the row-level oracle can't
  * see (a cartesian that happens to produce correct rows is still a
  * 100 TB outage). */
class PlanAuditSpec extends SparkSpec {

  // Brute-force similarity IS a deliberate broadcast scan of corpus ×
  // query set (PLANS.md), and tf-idf cross-joins a SINGLE-ROW broadcast
  // scalar (the corpus doc count); everything else must equi-join.
  // ext3_topk_ivf emits a recall scorecard whose ground-truth side is
  // that same deliberate brute-force scan (the IVF side itself
  // equi-joins on the cell id).
  private val intendedBnlj = Set("ext3_topk_cosine", "ext3_topk_ivf", "ext4_tfidf")

  test("no cartesians, unintended nested-loop joins, or global windows anywhere") {
    SparkEntry.registry.foreach { q =>
      // through SparkEntry.queries so the sweep exercises the same tuned
      // path every production consumer gets
      val qe = SparkEntry.queries(q.name)(spark, sf("sf0.001")).queryExecution
      val plan = qe.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"${q.name} plans a cartesian:\n$plan")
      if (!intendedBnlj(q.name)) {
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"${q.name} plans an unintended BNLJ:\n$plan")
      }
      // No window may run unpartitioned: an empty partitionSpec is an
      // Exchange SinglePartition — the whole input through one task.
      // (c1_chunks was the one exception until round 7; Chunking.globalRank
      // removed it, so the guard is now unconditional.)
      val globalWindows = qe.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
      }
      assert(globalWindows.isEmpty,
        s"${q.name} plans a global single-partition window:\n${qe.sparkPlan}")
    }
  }

  test("top-k sort/limit plans as TakeOrderedAndProject, not a global sort") {
    val plan = SparkEntry.queries("an2_top_orders")(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("dimension-chain joins broadcast the dimensions") {
    val plan = SparkEntry.queries("an3_nation_revenue")(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("hot attribution queries stay inside whole-stage codegen") {
    // a CodegenFallback expression in the hot path silently de-optimizes
    // the whole stage (HOFs are the classic trap) — require codegen
    // spans in the plans that carry the data volume
    Seq("j1_journeys", "ihc_score", "an1_pricing_summary", "ext4_term_freq").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf("sf0.001"))
      df.collect() // finalize this Dataset's cached AQE plan (a write would build its own)
      val plan = df.queryExecution.executedPlan.toString
      // codegen stages render as "*(n) Operator" in the final plan string
      assert(plan.contains("*("), s"$q lost codegen:\n$plan")
    }
  }

  test("shuffle counts hold the audited bounds (exchange creep guard)") {
    // Every groupBy/join/window that loses its exchange-sharing or gains
    // a stage shows up here before it shows up in the bench. Bounds are
    // the measured AQE-final counts at sf0.001 — a regression ADDS a
    // shuffle and fails; an improvement passes and the bound should then
    // be ratcheted down.
    val bounds = Map(
      "flagship_report" -> 7, // journey join + 4 shared-exchange windows + report agg chain
      "j1_journeys" -> 0,     // broadcast at this SF; SMJ (2 exchanges) at scale
      "ihc_score" -> 2,
      "an1_pricing_summary" -> 2,
      "ext6_sessionize" -> 2, // lag + running-sum share one user_id exchange
      "j7_asof" -> 2,         // union + ONE cumulative window (no join node)
      "j8_range" -> 4,
      "ext4_term_freq" -> 2,
      "an3_nation_revenue" -> 2, // dims broadcast — only fact⋈fact + agg shuffle
      "j10_salted_join" -> 2)    // salted dim broadcasts; agg partial+final
    bounds.foreach { case (name, maxShuffles) =>
      val df = SparkEntry.queries(name)(spark, sf("sf0.001"))
      df.collect() // finalize the AQE plan
      val plan = df.queryExecution.executedPlan.toString
      val shuffles = "(?<![a-zA-Z])Exchange (hash|range|Single)".r.findAllIn(plan).size
      assert(shuffles <= maxShuffles,
        s"$name now plans $shuffles shuffles (audited bound $maxShuffles):\n$plan")
    }
  }

  test("filters and projection reach the parquet scan") {
    val plan = SparkEntry.queries("s1_scan_prune")(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,50000.0)]"), plan)
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"), plan)
  }

  test("journey scan prunes to the joined columns only") {
    val plan = graft.ops.JourneyBuilder.journeys(
      Tables.conversions(spark, sf("sf0.001")), Tables.sessions(spark, sf("sf0.001")))
      .select(col("conversion_id"), col("session_id"))
      .queryExecution.executedPlan.toString
    // Tables.conversions selects `value` (as revenue), but a key-only
    // projection must prune it out of the parquet scan entirely: no
    // events scan may read the double column.
    assert(!plan.contains("value:double"), plan)
    assert(plan.contains("ReadSchema"), plan)
  }
}
