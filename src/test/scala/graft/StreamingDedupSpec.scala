package graft

import graft.streaming.{StreamingDedup, StreamingIngest}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.{Files, Paths}

/** Streaming dedup + enrichment: the at-least-once landing path must
  * converge to exactly-once facts, across micro-batch boundaries —
  * the case batch dropDuplicates cannot cover incrementally. */
class StreamingDedupSpec extends SparkSpec {

  import spark.implicits._

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
    val ckpt = Files.createTempDirectory("graft-dedup-ckpt").toString
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream timed out")
  }

  test("cross-micro-batch duplicates are suppressed with bounded state") {
    val dir = sf("sf0.001")
    val landing = Files.createTempDirectory("graft-dedup-landing")
    // the SAME file lands twice (retry/backfill): every event is a
    // duplicate, and maxFilesPerTrigger=1 forces the copies into
    // DIFFERENT micro-batches — only keyed state can catch them
    Files.copy(Paths.get(s"$dir/events.parquet"), landing.resolve("a.parquet"))
    Files.copy(Paths.get(s"$dir/events.parquet"), landing.resolve("b.parquet"))
    runToMemory(
      StreamingDedup.dedupedEvents(
        StreamingIngest.readEvents(spark, landing.toString, maxFilesPerTrigger = 1)),
      "dedup_stream")
    val streamed = spark.table("dedup_stream").select("event_id")
      .as[Long].collect().sorted
    val batch = Tables.events(spark, dir).select("event_id")
      .as[Long].collect().sorted
    assert(streamed.length === batch.length, "duplicates survived the stream")
    assert(streamed.sameElements(batch))
  }

  test("stream-static enrichment equals the batch join") {
    val dir = sf("sf0.001")
    val landing = Files.createTempDirectory("graft-enrich-landing")
    Files.copy(Paths.get(s"$dir/events.parquet"), landing.resolve("events.parquet"))
    val dim = Seq(
      ("click", "engagement"), ("view", "engagement"),
      ("signup", "conversion_funnel"), ("purchase", "conversion_funnel"),
      ("error", "ops")).toDF("event_type", "event_group")
    runToMemory(
      StreamingDedup.enrich(
        StreamingIngest.readEvents(spark, landing.toString), dim, "event_type")
        .select("event_id", "event_group"),
      "enrich_stream")
    val streamed = spark.table("enrich_stream")
      .as[(Long, String)].collect().toSet
    val batch = Tables.events(spark, dir).join(dim, Seq("event_type"), "left")
      .select("event_id", "event_group").as[(Long, String)].collect().toSet
    assert(streamed === batch)
    assert(streamed.map(_._2).contains("conversion_funnel"))
  }
}
