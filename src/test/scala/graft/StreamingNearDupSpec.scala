package graft

import graft.ops.Dedup
import graft.streaming.StreamingNearDup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import java.nio.file.Files

/** Streaming MinHash-LSH near-dup: the stateful band index must find the
  * same pairs the batch lane finds, including pairs whose two documents
  * arrive in DIFFERENT micro-batches — the case per-batch LSH can never
  * pair up. */
class StreamingNearDupSpec extends SparkSpec {

  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  test("streamed verified pairs equal the batch LSH pairs across micro-batches") {
    val dir = sf("sf0.001")
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    // land the corpus as 3 files; maxFilesPerTrigger=1 forces 3 batches,
    // so planted pairs straddling a range boundary cross micro-batches
    val landing = Files.createTempDirectory("graft-neardup-landing").toString + "/docs"
    docs.repartitionByRange(3, col("doc_id")).write.parquet(landing)
    val streamDocs = spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(landing)
    val out = Files.createTempDirectory("graft-neardup-out").toString + "/pairs"
    val ckpt = Files.createTempDirectory("graft-neardup-ckpt").toString
    val q = StreamingNearDup.verifiedAvailableNow(
      spark, streamDocs, docs, out, ckpt)
    assert(q.awaitTermination(180000), "stream timed out")
    val streamed = spark.read.parquet(out)
      .as[(Long, Long, Double)].collect().toSet
    val batch = Dedup.minhashLshPairs(Tables.documents(spark, dir))
      .as[(Long, Long, Double)].collect().toSet
    assert(batch.nonEmpty, "fixture lost its planted near-dups")
    assert(streamed === batch)
  }

  test("signature estimate tracks the exact Jaccard on the planted pairs") {
    val docs = Tables.documents(spark, sf("sf0.001")).select("doc_id", "text")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    ms.addData(docs.as[(Long, String)].collect().toIndexedSeq)
    val ckpt = Files.createTempDirectory("graft-est-ckpt").toString
    val sq = StreamingNearDup
      .candidatePairs(ms.toDF().toDF("doc_id", "text"))
      .toDF()
      .writeStream.format("memory").queryName("est_stream")
      .outputMode("append").option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(sq.awaitTermination(180000), "stream timed out")
    val est = spark.table("est_stream")
      .groupBy("doc_a", "doc_b").agg(max("est_sim").as("est_sim"))
    val joined = Dedup.jaccardPairs(docs).join(est, Seq("doc_a", "doc_b"), "inner")
      .select(col("jaccard"), col("est_sim")).as[(Double, Double)].collect()
    assert(joined.nonEmpty, "no candidate covers the exact pairs")
    // k=64 MinHash estimate: σ ≈ √(j(1−j)/64) ≤ 0.0625 — 0.25 is 4σ
    joined.foreach { case (j, e) =>
      assert(math.abs(j - e) <= 0.25, s"estimate $e strays from exact $j")
    }
  }

  test("a full bucket stops admitting docs (hot-boilerplate guard)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val boiler = (1L to 10L).map(i => (i, "the same boilerplate text repeated verbatim " * 3))
    val ms = MemoryStream[(Long, String)]
    ms.addData(boiler)
    val ckpt = Files.createTempDirectory("graft-cap-ckpt").toString
    val sq = StreamingNearDup
      .candidatePairs(ms.toDF().toDF("doc_id", "text"), maxBucket = 3)
      .toDF()
      .writeStream.format("memory").queryName("cap_stream")
      .outputMode("append").option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(sq.awaitTermination(120000), "stream timed out")
    val pairs = spark.table("cap_stream")
      .select("doc_a", "doc_b").distinct().as[(Long, Long)].collect().toSet
    // 3 admitted docs per bucket (identical docs share every bucket):
    // C(3,2) = 3 distinct pairs, est 1.0; the other 7 docs are rejected
    assert(pairs === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }
}
