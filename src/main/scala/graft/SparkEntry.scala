package graft

import graft.queries.{AnalyticsQueries, AttributionQueries, ExtQueries, InventoryQueries, StorageQueries, TemporalQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every registered query (Spark fn + optional DuckDB oracle). */
  def registry: Seq[QueryDef] =
    AttributionQueries.all ++ InventoryQueries.all ++ ExtQueries.all ++
      AnalyticsQueries.all ++ TemporalQueries.all ++ StorageQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.tune(spark)
    AttributionQueries.flagship(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> tuned(q.fn)).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.sql.map(q.name -> _)).toMap

  /** Headline subset Bench times at sf0.1. */
  def benchQueries: Seq[String] = registry.filter(_.bench).map(_.name)

  /** The driver may hand us a session it built itself; make sure the
    * GraftSession semantics (ANSI off, nanosAsLong, UTC) are in force. */
  private def tuned(
      fn: (SparkSession, String) => DataFrame): (SparkSession, String) => DataFrame =
    (spark, dir) => fn(GraftSession.tune(spark), dir)
}
