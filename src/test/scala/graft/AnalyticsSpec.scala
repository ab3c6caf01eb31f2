package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Laws for the an25 rolling z-score anomaly lane (the oracle pins
  * cross-engine parity; these pin the SEMANTICS on planted series). */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  /** The an25 window shape over a literal (type, day, cnt) frame. */
  private def score(rows: Seq[(String, Long, Long)]) = {
    val w = Window.partitionBy("t").orderBy("day").rangeBetween(-7, -1)
    val st = rows.toDF("t", "day", "cnt")
      .withColumn("n_prior", count(col("cnt")).over(w))
      .withColumn("s1", sum(col("cnt")).over(w))
      .withColumn("s2", sum(col("cnt") * col("cnt")).over(w))
    val variance =
      (col("s2").cast("double") - col("s1").cast("double") * col("s1") / col("n_prior")) /
        (col("n_prior") - 1)
    val zraw = when(col("n_prior") >= 3 && variance > 0.0,
      (col("cnt") - col("s1").cast("double") / col("n_prior")) / sqrt(variance))
    st.select(col("t"), col("day"), zraw.as("z"))
      .as[(String, Long, Option[Double])].collect()
      .map { case (t, d, z) => (t, d) -> z }.toMap
  }

  test("planted spike scores against its trailing week; hand-checked z") {
    // baseline 10,11,12,10,11,12,10 then a 100-count spike on day 8
    val base = Seq[Long](10, 11, 12, 10, 11, 12, 10)
    val rows = base.zipWithIndex.map { case (c, i) => ("a", (i + 1).toLong, c) } :+
      (("a", 8L, 100L))
    val z = score(rows)
    val n = base.size.toDouble
    val mean = base.sum / n
    val variance = (base.map(c => c * c).sum - base.sum.toDouble * base.sum / n) / (n - 1)
    val want = (100L - mean) / math.sqrt(variance)
    assert(math.abs(z(("a", 8L)).get - want) < 1e-12)
    assert(want > 2.0, "the planted spike must actually flag")
  }

  test("constant history (zero variance) and short history yield no score") {
    val rows = Seq[(String, Long, Long)](
      ("c", 1L, 5L), ("c", 2L, 5L), ("c", 3L, 5L), ("c", 4L, 5L), ("c", 5L, 9L),
      ("s", 1L, 3L), ("s", 2L, 4L), ("s", 3L, 7L)) // s has only 2 prior at day 3
    val z = score(rows)
    assert(z(("c", 5L)).isEmpty, "zero-variance baseline must not divide")
    assert(z(("s", 3L)).isEmpty, "n_prior < 3 must not score")
  }

  test("the RANGE frame is calendar-true: a gap shrinks the baseline, rows do not slide in") {
    // days 1,2,3 then a jump to day 20: nothing within [13,19] → unscored,
    // where a ROWS frame would wrongly score against the stale week
    val rows = Seq[(String, Long, Long)](
      ("g", 1L, 10L), ("g", 2L, 11L), ("g", 3L, 12L), ("g", 20L, 50L))
    val z = score(rows)
    assert(z(("g", 20L)).isEmpty)
  }
}
