package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) the DuckDB oracle the driver
  * hash-compares against. `sql = None` falls back to the driver's weaker
  * rows-only check — reserved for ops whose result depends on genuinely
  * engine-internal state. Every lane currently carries an oracle: where
  * raw values can't replay cross-engine (sketch estimates, trained
  * centroids), the lane emits a SCORECARD instead — the exact values
  * both engines agree on plus booleans pinning each engine-specific
  * value inside its documented law (an13_sketches,
  * ext40_cluster_balance_trained). */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    sql: Option[String],
    /** Included in the Bench headline set. */
    bench: Boolean = false)
