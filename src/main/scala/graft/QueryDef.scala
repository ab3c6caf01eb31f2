package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) the DuckDB oracle the driver
  * hash-compares against. `sql = None` falls back to the driver's weaker
  * rows-only check (reserved for ops whose result depends on genuinely
  * engine-internal state, e.g. sketch binaries — an13_sketches). */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    sql: Option[String],
    /** Included in the Bench headline set. */
    bench: Boolean = false)
