package graft

import graft.sources.TxStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** The native streaming source (`readStream.format("graft")`): ports
  * StreamingCdfSpec's contract — stream ≡ batch CDC, incremental
  * resume from the engine's own checkpoint, replay idempotence,
  * startingVersion skipping, truncation refusal — without the
  * file-stream + foreachBatch assembly. */
class GraftCdfSourceSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-cdfsrc-$name").toString + "/t"

  private def ev = Tables.events(spark, sf("sf0.001"))

  private def sameRows(a: DataFrame, b: DataFrame): Boolean =
    a.count() == b.count() && a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  /** Drain all available changes into a parquet sink, AvailableNow. */
  private def drain(src: String, out: String, ckpt: String,
      options: Map[String, String] = Map.empty): Unit = {
    val reader = spark.readStream.format("graft").options(options)
    val q = reader.load(src)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000), "drain timed out")
  }

  test("stream equals batch CDC; resume moves only the new versions") {
    val (src, out, ckpt) = (tmp("src"), tmp("out"), tmp("ckpt"))
    TxStore.append(ev.filter(col("event_id") % 2 === 0), src) // v1
    TxStore.delete(spark, src, col("event_id") % 4 === 0) // v2 (copy-on-write)
    drain(src, out, ckpt)
    val afterFirst = spark.read.parquet(out)
    assert(afterFirst.columns.takeRight(2).toSeq === Seq("_change_type", "_commit_version"))
    assert(sameRows(afterFirst, TxStore.readChangesSince(spark, src, 0L)._2))
    assert(afterFirst.select("_commit_version").distinct()
      .as[Long].collect().sorted.toSeq === Seq(1L, 2L))

    // nothing new → the resumed drain lands nothing
    drain(src, out, ckpt)
    assert(sameRows(spark.read.parquet(out), afterFirst))

    // two more commits; the next drain moves ONLY v3+v4 rows
    TxStore.update(spark, src, col("event_type") === "click",
      Map("value" -> (col("value") + 1))) // v3
    TxStore.append(ev.filter(col("event_id") % 2 =!= 0).limit(10), src) // v4
    drain(src, out, ckpt)
    val afterSecond = spark.read.parquet(out)
    assert(sameRows(afterSecond, TxStore.readChangesSince(spark, src, 0L)._2))
    assert(afterSecond.exceptAll(afterFirst).select("_commit_version").distinct()
      .as[Long].collect().sorted.toSeq === Seq(3L, 4L))
  }

  test("startingVersion skips history") {
    val (src, out, ckpt) = (tmp("src2"), tmp("out2"), tmp("ckpt2"))
    TxStore.append(ev.filter(col("event_id") <= 100), src) // v1
    TxStore.append(ev.filter(col("event_id") > 100 && col("event_id") <= 200), src) // v2
    TxStore.append(ev.filter(col("event_id") > 200 && col("event_id") <= 300), src) // v3
    drain(src, out, ckpt, Map("startingVersion" -> "2"))
    val got = spark.read.parquet(out)
    assert(got.select("_commit_version").distinct().as[Long].collect().toSeq === Seq(3L))
    assert(sameRows(got, TxStore.readChangesBetween(spark, src, 2L, 3L)))
  }

  test("a source checkpoint that truncated history past the consumer refuses loudly") {
    val (src, out, ckpt) = (tmp("src3"), tmp("out3"), tmp("ckpt3"))
    TxStore.append(ev.limit(50), src) // v1
    drain(src, out, ckpt) // consumer is at v1
    TxStore.append(ev.limit(10), src) // v2
    TxStore.append(ev.limit(10), src) // v3
    TxStore.checkpoint(spark, src) // v4 — truncates replay before v4
    val ex = intercept[Exception] {
      val q = spark.readStream.format("graft").load(src)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(180000)
      q.exception.foreach(throw _)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("checkpoint truncated history")),
      s"must refuse with the re-sync message, got: ${messages(ex).mkString(" | ")}")
  }

  test("the stream schema is the table schema plus the CDF tag columns") {
    val src = tmp("src4")
    TxStore.append(ev.limit(5), src)
    val df = spark.readStream.format("graft").load(src)
    assert(df.schema.fieldNames.takeRight(2).toSeq ===
      Seq("_change_type", "_commit_version"))
    assert(df.schema.fieldNames.dropRight(2).toSeq ===
      TxStore.read(spark, src).columns.toSeq)
    assert(df.isStreaming)
  }

  test("AvailableNow pins the latest version at run start; later commits wait") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val src = tmp("src5")
    TxStore.append(ev.limit(5), src) // v1
    val source = new graft.streaming.GraftCdfSource(spark, src, 0L)
    source.prepareForTriggerAvailableNow()
    TxStore.append(ev.limit(3), src) // v2 lands AFTER the pin
    assert(source.latestOffset(null, ReadLimit.allAvailable()) === LongOffset(1L),
      "the pinned run must never answer past the version at prepare time")
    // without a pin the admission-control path tracks the live table
    val live = new graft.streaming.GraftCdfSource(spark, src, 0L)
    assert(live.latestOffset(null, ReadLimit.allAvailable()) === LongOffset(2L))
    // a startingVersion at-or-past the latest answers no offset at all
    val drained = new graft.streaming.GraftCdfSource(spark, src, 2L)
    assert(drained.latestOffset(null, ReadLimit.allAvailable()) === null)
  }
}
