package graft

import graft.ops.Multimodal
import graft.streaming.StreamingIngest
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** S7 streaming (AvailableNow == the reference's FileSensor-then-batch
  * contract) and the multimodal plumbing. */
class StreamingMultimodalSpec extends SparkSpec {

  import spark.implicits._

  test("AvailableNow streaming rollup equals the batch rollup") {
    val dir = sf("sf0.001")
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val q = StreamingIngest.runAvailableNow(spark, dir, ckpt, "stream_rollup")
    q.awaitTermination(120000)
    val streamed = spark.table("stream_rollup")
      .select("date", "event_type", "n_events")
      .as[(String, String, Long)].collect().toSet

    val batch = Tables.events(spark, dir)
      .groupBy(
        date_format(Tables.tsMicros("ts"), "yyyy-MM-dd").as("date"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .as[(String, String, Long)].collect().toSet

    assert(streamed == batch)
  }

  test("fake decoder features are deterministic and length-derived") {
    val media = Multimodal.mediaFromDocuments(spark, Tables.documents(spark, sf("sf0.001")))
    val feats = Multimodal.decodeFeatures(media)
    val byId = feats.collect().map(f => f.media_id -> f).toMap
    val lens = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), length(col("text")).cast("long")).as[(Long, Long)].collect().toMap
    assert(byId.size == lens.size)
    lens.foreach { case (id, n) =>
      val f = byId(id)
      assert(f.n_bytes == n && f.width == n % 640 + 1 && f.height == n % 480 + 1)
      assert(f.checksum >= 0 && f.checksum < 1000000007L)
    }
    // decoding twice gives identical checksums (stub is deterministic)
    val again = Multimodal.decodeFeatures(media).collect().map(f => f.media_id -> f.checksum).toMap
    assert(byId.forall { case (id, f) => again(id) == f.checksum })
  }

  test("frame sampling slices the payload on stride boundaries") {
    val frames = Multimodal.sampleFrames(spark, Tables.documents(spark, sf("sf0.001")),
      frameBytes = 64, stride = 4)
    val one = frames.filter(col("media_id") === 0L).collect()
    assert(one.nonEmpty)
    assert(one.forall(r => r.getLong(1) % 4 == 0))
    val text0 = Tables.documents(spark, sf("sf0.001"))
      .filter(col("doc_id") === 0L).select("text").head().getString(0)
    val frame0 = new String(one.find(_.getLong(1) == 0L).get.getAs[Array[Byte]]("frame"), "UTF-8")
    assert(text0.startsWith(frame0.take(8)))
  }
}
