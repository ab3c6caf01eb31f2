package graft

import org.apache.spark.sql.functions._

/** Accuracy and mergeability bounds for the sketch aggregates behind
  * `an13_sketches` (no DuckDB oracle — estimates are engine-specific).
  * Mergeability is the property that makes sketches the 100 TB design:
  * a per-shard sketch table unions to the global answer without
  * re-scanning facts. */
class AggregateSketchSpec extends SparkSpec {

  private def events = Tables.events(spark, sf("sf0.01"))

  test("HLL sketch estimates per-group distincts within 5%") {
    val rows = events.groupBy("event_type")
      .agg(
        hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"),
        countDistinct(col("user_id")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (est, exact) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(est - exact) / exact <= 0.05, s"${r.getString(0)}: est=$est exact=$exact")
    }
  }

  test("per-group sketches MERGE to the global distinct (pre-agg table pattern)") {
    val sketches = events.groupBy("event_type")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val merged = sketches
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0).toDouble
    val exact = events.select(countDistinct(col("user_id"))).head().getLong(0).toDouble
    // groups overlap heavily in users, so a broken union would overcount ~5x
    assert(math.abs(merged - exact) / exact <= 0.05, s"merged=$merged exact=$exact")
  }

  test("sketches survive a parquet round-trip and still merge (sketch TABLE pattern)") {
    // the real 100 TB flow: per-shard sketches land in a table, later
    // queries aggregate the stored binaries without touching the facts
    val dir = java.nio.file.Files.createTempDirectory("graft-sketch").toString
    events.groupBy("event_type")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .write.mode("overwrite").parquet(s"$dir/sketches")
    val merged = spark.read.parquet(s"$dir/sketches")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0).toDouble
    val exact = events.select(countDistinct(col("user_id"))).head().getLong(0).toDouble
    assert(math.abs(merged - exact) / exact <= 0.05, s"merged=$merged exact=$exact")
  }

  test("approx_percentile tracks the exact percentile within 2%") {
    val r = events.agg(
      expr("approx_percentile(value, 0.5, 10000)").as("approx"),
      expr("percentile(value, 0.5)").as("exact")).head()
    val (approx, exact) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(approx - exact) / exact <= 0.02, s"approx=$approx exact=$exact")
  }

  test("an13's exact-rank median law is falsifiable: a wrong estimate fails the band") {
    // the lane verifies the p50 estimate by EXACT RANK — count(value <=
    // est) must land in [40%, 60%] of n (ADVICE r14 replaced a law that
    // compared three quantiles of the SAME sketch, monotone by
    // construction). Show the band has teeth on the real fixture: the
    // true median ranks inside it, a deliberately wrong estimate (the
    // exact 10th percentile) ranks far outside.
    val (p50, p10) = {
      val r = events.agg(
        expr("approx_percentile(value, 0.5, 10000)").as("p50"),
        expr("percentile(value, 0.10)").as("p10")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    def rankFrac(est: Double): Double = {
      val r = events.agg(
        sum(when(col("value") <= est, 1L).otherwise(0L)).as("cnt"),
        count(lit(1)).as("n")).head()
      r.getLong(0).toDouble / r.getLong(1)
    }
    val fTrue = rankFrac(p50)
    assert(fTrue >= 0.40 && fTrue <= 0.60, s"true median ranks at $fTrue")
    val fWrong = rankFrac(p10)
    assert(fWrong < 0.40, s"a 10th-percentile 'median' must fail the band, ranked $fWrong")
  }

  test("approx_count_distinct (HyperLogLog++) within 5% of exact") {
    val r = events.agg(
      approx_count_distinct(col("user_id")).as("est"),
      countDistinct(col("user_id")).as("exact")).head()
    val (est, exact) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(est - exact) / exact <= 0.05, s"est=$est exact=$exact")
  }
}
