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
  def readEvents(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 32): DataFrame =
    spark.readStream
      .schema(eventsSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
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
    * read `spark.table(name)` — one row per (date, event_type)).
    *
    * The sink is a `foreachBatch` keyed UPSERT, not `format("memory")`:
    * the memory sink in update mode APPENDS each micro-batch's updated
    * rows, so any run spanning more than one micro-batch (>
    * maxFilesPerTrigger landing files, or one day's events split across
    * triggers) would leave stale duplicates per key and double-count on
    * read. Each batch's rows land in a driver-resident map keyed by
    * (date, event_type) — last write wins — re-registered as `name` on
    * the CALLER's session after every batch (foreachBatch runs under a
    * cloned session whose temp views the caller can't see). Driver
    * residency matches what format("memory") does anyway and is sized to
    * the rollup (days × event types), never the event stream; a
    * production deployment would upsert into a keyed store (Delta MERGE,
    * JDBC upsert) through this same foreachBatch seam. Verified by the
    * multi-micro-batch spec. */
  def runAvailableNow(
      spark: SparkSession,
      dir: String,
      checkpoint: String,
      name: String,
      maxFilesPerTrigger: Int = 32): StreamingQuery = {
    val state = scala.collection.mutable.LinkedHashMap.empty[(String, String), (Long, Double)]
    // Register the (empty) table up front: a zero-micro-batch run (empty
    // landing dir, or a checkpoint with nothing new) never fires
    // foreachBatch, and the documented `spark.table(name)` read-back must
    // still resolve — format("memory") registered at start() too.
    import spark.implicits._
    Seq.empty[(String, String, Long, Double)]
      .toDF("date", "event_type", "n_events", "total_value")
      .createOrReplaceTempView(name)
    channelDaily(readEvents(spark, dir, maxFilesPerTrigger))
      .writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // foreachBatch invocations are sequential per query — no lock
        batch.collect().foreach { r =>
          state.put((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))
        }
        import spark.implicits._
        state.toSeq.map { case ((d, et), (n, v)) => (d, et, n, v) }
          .toDF("date", "event_type", "n_events", "total_value")
          .createOrReplaceTempView(name)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
