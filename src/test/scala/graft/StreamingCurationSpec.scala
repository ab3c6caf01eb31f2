package graft

import graft.ops.{QualityFunnel, TextOps}
import graft.sources.TxStore
import graft.streaming.StreamingCuration
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming curation (EXT36's ingest path): documents land in waves,
  * each micro-batch is gated under a STATIC reference unigram model and
  * survivors append exactly-once into a TxStore table. Pins
  * streaming-equals-batch (batch boundaries cannot change a verdict),
  * cross-wave accumulation, and replay idempotence. */
class StreamingCurationSpec extends SparkSpec {

  import spark.implicits._

  private lazy val refDocs = Tables.documents(spark, sf("sf0.001"))

  test("two-wave streaming curation equals the one-shot batch gate") {
    val (tf, total) = TextOps.unigramModel(refDocs)
    val ckpt = Files.createTempDirectory("graft-curate-ckpt").toString
    val landing = Files.createTempDirectory("graft-curate-land").toString
    val table = Files.createTempDirectory("graft-curate-table").toString

    // wave 1: half the fixture docs land
    refDocs.filter($"doc_id" % 2 === 0).write.parquet(s"$landing/w1")
    StreamingCuration.runCurate(spark, s"$landing/*/", tf, total, ckpt, table)
      .awaitTermination(120000)
    val afterW1 = TxStore.read(spark, table).count()
    assert(afterW1 > 0, "wave 1 must land survivors")

    // wave 2: the other half arrives later
    refDocs.filter($"doc_id" % 2 =!= 0).write.parquet(s"$landing/w2")
    StreamingCuration.runCurate(spark, s"$landing/*/", tf, total, ckpt, table)
      .awaitTermination(120000)

    val streamed = TxStore.read(spark, table)
      .select("doc_id").as[Long].collect().toSet
    val batch = QualityFunnel.filterFlagsUnder(refDocs, tf, total)
      .filter($"pass_all" === 1L)
      .select("doc_id").as[Long].collect().toSet
    assert(streamed === batch, "streamed survivors equal the batch gate")
    assert(streamed.size > afterW1, "wave 2 added survivors")
    // gates actually rejected something, or the test is vacuous
    assert(streamed.size < refDocs.count(), "some documents were rejected")
  }

  test("replaying a drained stream is a no-op (stamped appendOnce)") {
    val (tf, total) = TextOps.unigramModel(refDocs)
    val ckpt = Files.createTempDirectory("graft-curate-ckpt2").toString
    val landing = Files.createTempDirectory("graft-curate-land2").toString
    val table = Files.createTempDirectory("graft-curate-table2").toString
    refDocs.limit(100).write.parquet(s"$landing/w1")
    StreamingCuration.runCurate(spark, s"$landing/*/", tf, total, ckpt, table)
      .awaitTermination(120000)
    val v1 = TxStore.snapshot(spark, table).version
    val n1 = TxStore.read(spark, table).count()
    // nothing new landed: the restarted stream must not re-append
    StreamingCuration.runCurate(spark, s"$landing/*/", tf, total, ckpt, table)
      .awaitTermination(120000)
    assert(TxStore.snapshot(spark, table).version === v1)
    assert(TxStore.read(spark, table).count() === n1)
  }

  test("two-wave classifier gate equals the batch classifier; replay no-ops") {
    val w = TextOps.DemoClassifierWeights
    val ckpt = Files.createTempDirectory("graft-cls-ckpt").toString
    val landing = Files.createTempDirectory("graft-cls-land").toString
    val table = Files.createTempDirectory("graft-cls-table").toString
    refDocs.filter($"doc_id" % 2 === 0).write.parquet(s"$landing/w1")
    StreamingCuration.runClassifierGate(spark, s"$landing/*/", w, ckpt, table)
      .awaitTermination(120000)
    refDocs.filter($"doc_id" % 2 =!= 0).write.parquet(s"$landing/w2")
    StreamingCuration.runClassifierGate(spark, s"$landing/*/", w, ckpt, table)
      .awaitTermination(120000)
    val streamed = TxStore.read(spark, table).select("doc_id").as[Long].collect().toSet
    val batch = TextOps.hashedClassifierScore(refDocs, w)
      .filter($"keep").select("doc_id").as[Long].collect().toSet
    assert(streamed === batch, "streamed survivors equal the batch classifier")
    assert(streamed.nonEmpty && streamed.size < refDocs.count(),
      "the gate must keep some and reject some or the test is vacuous")
    // replay with nothing new landed: stamped appendOnce no-ops
    val v = TxStore.snapshot(spark, table).version
    StreamingCuration.runClassifierGate(spark, s"$landing/*/", w, ckpt, table)
      .awaitTermination(120000)
    assert(TxStore.snapshot(spark, table).version === v)
  }

  test("model scoring: OOV tokens take the add-one floor, not a dropped row") {
    val (tf, total) = TextOps.unigramModel(refDocs)
    // a doc of pure out-of-vocabulary tokens still gets scored — at the
    // rarest possible level (ln(1/total))
    val oov = Seq((999999L, "zzqx1 zzqx2 zzqx3 zzqx4")).toDF("doc_id", "text")
    val scored = TextOps.scoreUnderModel(oov, tf, total)
      .as[(Long, Long, Double)].collect()
    assert(scored.length === 1)
    val (_, n, lp) = scored.head
    assert(n === 4L)
    def rnd4(x: Double) = math.floor(x.abs * 1e4 + 0.5) / 1e4 * math.signum(x)
    assert(lp === rnd4(-math.log(total)))
  }
}
