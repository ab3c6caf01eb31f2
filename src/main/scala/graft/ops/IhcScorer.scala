package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Native IHC (Initializer–Holder–Closer) attribution scorer — SURVEY.md
  * §2.9/§7.3. The reference outsources this to an HTTPS API (reference
  * api_client.py:26–65); the only contract it enforces is fractional,
  * non-negative credit per (conversion, session) with Σ ihc = 1 ± 1e-4 per
  * conversion (api_client.py:92–107, 132–136, 254–268). This operator is a
  * deterministic, documented IHC-style heuristic satisfying that contract,
  * built from window expressions only (stays in whole-stage codegen; one
  * shuffle on `conversion_id`).
  *
  * Spec — touchpoints ordered by (ts, session_id) within each conversion
  * (`session_id` tie-break for determinism):
  *
  *   raw = 4                                   base credit (holder phase)
  *       + 6·[rn = 1]                          initializer bonus
  *       + 8·[rn = n]                          closer-position bonus
  *       + 2·holder_engagement
  *       + 1·impression_interaction
  *       + 3·closer_engagement·[rn = n]
  *   ihc = raw / Σ raw over the conversion
  *
  * `raw` is a small positive BIGINT, so the window sum is exact in any
  * execution order and `ihc` is a ratio of exact integers — bit-identical
  * across engines (DuckDB oracle parity) and under shuffle nondeterminism.
  * Degenerate journeys collapse naturally: n = 1 → ihc = 1 exactly.
  */
object IhcScorer {

  /** Skew gate for the scorer windows. AQE splits skewed JOIN partitions
    * but never skewed WINDOW partitions — a million-session conversion
    * serializes in a single window task. With `maxSessions` set,
    * conversions above the cap are excluded BEFORE the window (the
    * reference's own behavior at its request cap: oversize conversions
    * are skipped, api_client.py:197–199 / C2). The count is a map-side-
    * combinable aggregate (the hot key costs one long per mapper, not a
    * sorted window buffer) and the keep-set joins back as a semi-join
    * AQE can broadcast. */
  def sessionGate(journeys: DataFrame, maxSessions: Int): DataFrame = {
    val keep = journeys
      .groupBy("conversion_id").agg(count(lit(1)).as("n"))
      .filter(col("n") <= maxSessions)
      .select("conversion_id")
    journeys.join(keep, Seq("conversion_id"), "left_semi")
  }

  /** journeys → journeys + (rn, n, raw, ihc). Input needs columns
    * conversion_id, session_id, ts, holder_engagement, closer_engagement,
    * impression_interaction. `maxSessions` applies [[sessionGate]] first
    * (recommended at scale — see its note on window skew). */
  def scoreFull(journeys: DataFrame, maxSessions: Option[Int] = None): DataFrame = {
    val byConv = Window.partitionBy("conversion_id")
    val ordered = byConv.orderBy(col("ts"), col("session_id"))
    val gated = maxSessions.fold(journeys)(sessionGate(journeys, _))
    gated
      .withColumn("rn", row_number().over(ordered))
      .withColumn("n", count(lit(1)).over(byConv))
      .withColumn(
        "raw",
        lit(4L)
          + when(col("rn") === 1, 6L).otherwise(0L)
          + when(col("rn") === col("n"), 8L).otherwise(0L)
          + col("holder_engagement") * 2L
          + col("impression_interaction")
          + col("closer_engagement") * when(col("rn") === col("n"), 3L).otherwise(0L))
      .withColumn("ihc", col("raw").cast("double") / sum("raw").over(byConv).cast("double"))
  }

  /** The attribution table shape the reference persists:
    * (conversion_id, session_id, ihc) — api_client.py:139–149. */
  def score(journeys: DataFrame, maxSessions: Option[Int] = None): DataFrame =
    scoreFull(journeys, maxSessions).select("conversion_id", "session_id", "ihc")

  /** W1 — grouped Σ=1 normalization (reference api_client.py:90–107):
    * rescale ihc within each conversion only when the group sum drifts more
    * than 1e-4 from 1; values inside tolerance pass through untouched. */
  def normalize(attribution: DataFrame, tolerance: Double = 1e-4): DataFrame = {
    val w = Window.partitionBy("conversion_id")
    attribution
      .withColumn("ihc_sum", sum("ihc").over(w))
      .withColumn(
        "ihc",
        when(abs(col("ihc_sum") - 1.0) > tolerance, col("ihc") / col("ihc_sum"))
          .otherwise(col("ihc")))
      .drop("ihc_sum")
  }

  /** A2/A9/P11 — the invariant check the reference runs post-write
    * (api_client.py:254–268): per-conversion ihc sums and how many are
    * within tolerance of 1. */
  def invariantReport(attribution: DataFrame, tolerance: Double = 1e-4): DataFrame =
    attribution
      .groupBy("conversion_id")
      .agg(sum("ihc").as("ihc_sum"))
      .agg(
        count(lit(1)).as("n_conversions"),
        sum(when(abs(col("ihc_sum") - 1.0) < tolerance, 1L).otherwise(0L)).as("n_ok"))
}
