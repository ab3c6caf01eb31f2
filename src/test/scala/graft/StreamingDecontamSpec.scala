package graft

import graft.ops.Dedup
import graft.sources.TxStore
import graft.streaming.StreamingDecontam
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming decontamination (EXT20's ingest path): documents land in
  * waves, each micro-batch is screened against a STATIC eval corpus
  * (containment ≥ 0.5), and clean survivors append exactly-once into a
  * TxStore table. Pins streaming-equals-batch (the gate is per-document
  * against a static reference, so batch boundaries cannot change a
  * verdict), cross-wave accumulation, and replay idempotence. */
class StreamingDecontamSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf("sf0.001"))
  // the eval corpus: the %5 slice, same split as the ext20 batch lane —
  // non-vacuous (fixture docs DO leak across the split at 3-shingle
  // containment ≥ 0.5, pinned below)
  private lazy val evalDocs = docs.filter($"doc_id" % 5 === 0)
  private lazy val trainDocs = docs.filter($"doc_id" % 5 =!= 0)

  test("two-wave streaming decontamination equals the one-shot batch screen") {
    val ckpt = Files.createTempDirectory("graft-decontam-ckpt").toString
    val landing = Files.createTempDirectory("graft-decontam-land").toString
    val table = Files.createTempDirectory("graft-decontam-table").toString

    trainDocs.filter($"doc_id" % 2 === 0).write.parquet(s"$landing/w1")
    StreamingDecontam.runDecontam(spark, s"$landing/*/", evalDocs, ckpt, table)
      .awaitTermination(120000)
    val afterW1 = TxStore.read(spark, table).count()
    assert(afterW1 > 0, "wave 1 must land clean docs")

    trainDocs.filter($"doc_id" % 2 =!= 0).write.parquet(s"$landing/w2")
    StreamingDecontam.runDecontam(spark, s"$landing/*/", evalDocs, ckpt, table)
      .awaitTermination(120000)

    val streamed = TxStore.read(spark, table)
      .select("doc_id").as[Long].collect().toSet
    val contaminated = Dedup.decontamPairs(trainDocs, evalDocs)
      .select("train_doc").as[Long].collect().toSet
    val batch = trainDocs.select("doc_id").as[Long].collect().toSet -- contaminated
    assert(streamed === batch, "streamed survivors equal the batch screen")
    assert(streamed.size > afterW1.toInt, "wave 2 added survivors")
    assert(contaminated.nonEmpty, "the screen rejected something, or the test is vacuous")
  }

  test("replaying a drained decontamination stream is a no-op") {
    val ckpt = Files.createTempDirectory("graft-decontam-ckpt2").toString
    val landing = Files.createTempDirectory("graft-decontam-land2").toString
    val table = Files.createTempDirectory("graft-decontam-table2").toString
    trainDocs.limit(100).write.parquet(s"$landing/w1")
    StreamingDecontam.runDecontam(spark, s"$landing/*/", evalDocs, ckpt, table)
      .awaitTermination(120000)
    val v1 = TxStore.snapshot(spark, table).version
    val n1 = TxStore.read(spark, table).count()
    StreamingDecontam.runDecontam(spark, s"$landing/*/", evalDocs, ckpt, table)
      .awaitTermination(120000)
    assert(TxStore.snapshot(spark, table).version === v1)
    assert(TxStore.read(spark, table).count() === n1)
  }
}
