package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned parquet layout — the engine's incremental-processing
  * story at scale. The reference's only incremental mechanism is splicing
  * date literals into SQL text (cj_builder.py:45–53; SURVEY.md §4
  * "partition pruning: manual"); here the tables are written
  * `partitionBy(date)`, so a date-bounded read prunes whole partitions at
  * planning time (`PartitionFilters` in the scan, verified in
  * PartitionedStoreSpec) and a daily pipeline run touches one partition,
  * not the full history.
  */
object PartitionedStore {

  /** Write `df` partitioned by the UTC date of its epoch-nanos `tsCol`.
    * `maxRecordsPerFile` guards against giant single files inside a hot
    * partition. */
  def writeByDate(
      df: DataFrame,
      tsCol: String,
      path: String,
      maxRecordsPerFile: Long = 5000000L): Unit =
    df.withColumn("date", date_format(graft.Tables.tsMicros(tsCol), "yyyy-MM-dd"))
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("date")
      .parquet(path)

  /** Read back with optional inclusive date bounds — the filter lands in
    * `PartitionFilters` (pruned before IO), not as a row-level scan
    * predicate. The partition column comes back as DateType (partition
    * type inference); the bounds are applied on it first — pruning needs
    * the raw partition column — and it is then cast to the engine's
    * `yyyy-MM-dd` string contract. */
  def read(
      spark: SparkSession,
      path: String,
      startDate: Option[String] = None,
      endDate: Option[String] = None): DataFrame = {
    val bounded = graft.AttributionPipeline.dateBounded(
      spark.read.parquet(path), col("date"), startDate, endDate)
    bounded.withColumn("date", col("date").cast("string"))
  }
}
