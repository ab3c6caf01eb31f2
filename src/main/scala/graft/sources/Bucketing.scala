package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed managed tables — the shuffle-elimination tool for joins that
  * recur on the same key (SURVEY.md §1.5). Writing both sides of a
  * frequent join bucketed by the join key lets every subsequent join plan
  * skip its Exchange entirely: each bucket pairs 1:1 across tables, so
  * SortMergeJoin reads co-located buckets directly. At 100 TB this is the
  * difference between re-shuffling the fact table on every pipeline run
  * and shuffling once at ingest.
  *
  * Spark bucketing lives in the session catalog (`saveAsTable`), not on
  * bare parquet paths — callers own the warehouse location via the usual
  * `spark.sql.warehouse.dir`.
  */
object Bucketing {

  /** Write `df` as a managed table bucketed by `key` (sorted within
    * buckets, so merge joins skip the sort too). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int = 32): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Join two tables previously bucketed on the same key with the same
    * bucket count — plans with zero Exchange operators on either side. */
  def coLocatedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      key: String,
      joinType: String = "inner"): DataFrame =
    read(spark, leftTable).join(read(spark, rightTable), Seq(key), joinType)
}
