package graft

import graft.sources.TxStore
import graft.streaming.StreamingUpsert
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import java.nio.file.Files

/** Streaming CDC apply: change rows (op/seq) land in waves and fold
  * into a latest-state TxStore table. Pins stream-equals-batch-fold,
  * last-write-wins within a batch, the monotone out-of-order shield,
  * and replay idempotence. */
class StreamingUpsertSpec extends SparkSpec {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("payload", StringType),
    StructField("op", StringType),
    StructField("seq", LongType)))

  private def chg(rows: (Long, String, String, Long)*) =
    rows.toDF("id", "payload", "op", "seq")

  /** In-test reference: fold changes in seq order into a map. */
  private def refFold(rows: Seq[(Long, String, String, Long)]): Map[Long, (String, Long)] =
    rows.sortBy(_._4).foldLeft(Map.empty[Long, (String, Long)]) {
      case (m, (id, payload, op, seq)) =>
        if (op == "D") m - id else m + (id -> ((payload, seq)))
    }

  test("two-wave CDC apply equals the global seq-order fold; replay no-ops") {
    val ckpt = Files.createTempDirectory("graft-ups-ckpt").toString
    val landing = Files.createTempDirectory("graft-ups-land").toString
    val table = Files.createTempDirectory("graft-ups-table").toString

    val w1 = Seq(
      (1L, "a1", "U", 1L), (2L, "b1", "U", 2L),
      (1L, "a2", "U", 3L), // same key twice in one batch: last wins
      (3L, "c1", "U", 4L))
    val w2 = Seq(
      (2L, "", "D", 5L),   // delete b
      (3L, "c2", "U", 6L), // update c
      (4L, "", "D", 7L),   // delete of an absent key: inserts nothing
      (5L, "e1", "U", 8L))

    chg(w1: _*).write.parquet(s"$landing/w1")
    StreamingUpsert.runUpsert(spark, s"$landing/*/", schema, Seq("id"), ckpt, table)
      .awaitTermination(120000)
    val afterW1 = TxStore.read(spark, table)
      .select("id", "payload").as[(Long, String)].collect().toMap
    assert(afterW1 === Map(1L -> "a2", 2L -> "b1", 3L -> "c1"))

    chg(w2: _*).write.parquet(s"$landing/w2")
    StreamingUpsert.runUpsert(spark, s"$landing/*/", schema, Seq("id"), ckpt, table)
      .awaitTermination(120000)
    val got = TxStore.read(spark, table)
      .select("id", "payload", "seq").as[(Long, String, Long)].collect()
      .map { case (id, p, s) => id -> ((p, s)) }.toMap
    assert(got === refFold(w1 ++ w2))

    // replay with nothing new landed: version and content unchanged
    val v = TxStore.snapshot(spark, table).version
    StreamingUpsert.runUpsert(spark, s"$landing/*/", schema, Seq("id"), ckpt, table)
      .awaitTermination(120000)
    assert(TxStore.snapshot(spark, table).version === v)
  }

  test("stale changes (lower seq than the table) never regress state") {
    val ckpt = Files.createTempDirectory("graft-ups-ckpt2").toString
    val landing = Files.createTempDirectory("graft-ups-land2").toString
    val table = Files.createTempDirectory("graft-ups-table2").toString

    chg((1L, "fresh", "U", 100L), (2L, "keep", "U", 100L)).write.parquet(s"$landing/w1")
    StreamingUpsert.runUpsert(spark, s"$landing/*/", schema, Seq("id"), ckpt, table)
      .awaitTermination(120000)
    // a late wave replays OLD changes: an update and a delete, both stale
    chg((1L, "stale", "U", 5L), (2L, "", "D", 6L)).write.parquet(s"$landing/w2")
    StreamingUpsert.runUpsert(spark, s"$landing/*/", schema, Seq("id"), ckpt, table)
      .awaitTermination(120000)
    val got = TxStore.read(spark, table)
      .select("id", "payload").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "fresh", 2L -> "keep"))
  }

  test("latestPerKey reduces with a combinable aggregate, not a window") {
    val batch = chg(
      (7L, "x1", "U", 1L), (7L, "x2", "U", 9L), (7L, "x3", "U", 4L),
      (8L, "y1", "D", 2L))
    val w = StreamingUpsert.latestPerKey(batch, Seq("id"), "seq")
    assert(w.columns.toSeq === Seq("id", "payload", "op", "seq"))
    val got = w.as[(Long, String, String, Long)].collect().toSet
    assert(got === Set((7L, "x2", "U", 9L), (8L, "y1", "D", 2L)))
    val plan = w.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }
}
