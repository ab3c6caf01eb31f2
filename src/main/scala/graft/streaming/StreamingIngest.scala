package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** S7 — file-arrival–triggered incremental batch. The reference polls a
  * readiness flag with an Airflow FileSensor every 300 s and then runs a
  * full batch (reference dags/attribution_pipeline_dag.py:35–42); the
  * Spark-native equivalent is Structured Streaming over the landing
  * directory with `Trigger.AvailableNow` — each invocation processes
  * exactly the files that arrived since the last checkpoint, then stops.
  * Same operational contract (run on schedule, pick up what landed),
  * without the poll loop, and exactly-once via the checkpoint.
  */
object StreamingIngest {

  /** events.parquet schema; ts surfaces as epoch-nanos LongType under
    * `spark.sql.legacy.parquet.nanosAsLong` (GraftSession). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming scan of an events landing path (a directory that receives
    * only event files, or a glob — NOT a mixed-table directory: the file
    * source applies the schema to every parquet it finds). */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(eventsSchema)
      .option("maxFilesPerTrigger", "32")
      .parquet(dir)

  /** Windowed channel/day counts+sums with a watermark — the streaming
    * twin of the batch A1 rollup. Run in `update` output mode: the
    * watermark then actually evicts finalized windows from state (in
    * `complete` mode Spark must retain every group forever), so a
    * long-running deployment stays bounded; the sink receives upserts
    * per (day, channel). */
  def channelDaily(events: DataFrame): DataFrame = {
    val withTs = events.withColumn("event_ts", graft.Tables.tsMicros("ts"))
    withTs
      .withWatermark("event_ts", "1 day")
      .groupBy(window(col("event_ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd").as("date"),
        col("event_type"),
        col("n_events"),
        col("total_value"))
  }

  /** Run the rollup over whatever is in `dir` right now, AvailableNow,
    * into an in-memory table `name`; returns the query (await it, then
    * read `spark.table(name)`). */
  def runAvailableNow(
      spark: SparkSession,
      dir: String,
      checkpoint: String,
      name: String): StreamingQuery =
    channelDaily(readEvents(spark, dir))
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
