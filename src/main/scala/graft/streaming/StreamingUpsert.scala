package graft.streaming

import graft.sources.TxStore
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** The streaming CDC-APPLY path: keyed change rows (op = upsert/delete,
  * seq = the source's monotone change number — an LSN/offset) land as
  * files, and each micro-batch folds into a TxStore table that
  * materializes the LATEST state per key. This is the "ingest a
  * database's change feed into the lake" staple.
  *
  * Three laws make it safe to run forever:
  *  - LAST-WRITE-WINS WITHIN A BATCH: a batch may carry many changes
  *    per key; the winner is the max-`seq` row via a map-side-combinable
  *    max-struct aggregate (no window, no shuffle beyond the one keyed
  *    groupBy).
  *  - MONOTONE ACROSS BATCHES: the merge guards every matched clause
  *    with `s.seq > t.seq`, so a late-replayed stale change (lower seq
  *    than the table's) no-ops instead of regressing state — the
  *    standard CDC out-of-order shield.
  *  - EXACTLY-ONCE: each micro-batch applies through
  *    [[TxStore.mergeConditionalOnce]] under a (writerId, batchId)
  *    stamp; a crash/restart replay of a committed batch no-ops in the
  *    table's own log, not in engine-external state.
  *
  * The table's schema IS the change schema (keys + payload + op + seq):
  * keeping `seq` materialized is what makes the monotone guard a plain
  * column comparison, and `op` rides along as provenance. Deletes
  * remove the row (matchedDelete); a delete for an absent key inserts
  * nothing (notMatchedInsert filters op = 'D').
  */
object StreamingUpsert {

  /** File-arrival change stream over a landing directory. */
  def readChanges(
      spark: SparkSession,
      dir: String,
      schema: StructType,
      maxFilesPerTrigger: Int = 32): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Reduce a change batch to its per-key winner: the row with the
    * highest `seqCol` (remaining columns break exact-seq ties
    * deterministically via the struct's lexicographic order). One
    * map-side-combinable aggregate — never a window. */
  def latestPerKey(batch: DataFrame, keys: Seq[String], seqCol: String): DataFrame = {
    val others = batch.columns.filterNot(keys.contains).toSeq
    require(others.contains(seqCol), s"change rows must carry the sequence column $seqCol")
    val packed = struct((seqCol +: others.filterNot(_ == seqCol)).map(col): _*)
    batch
      .groupBy(keys.map(col): _*)
      .agg(max(packed).as("__w"))
      .select(batch.columns.toSeq.map {
        case k if keys.contains(k) => col(k)
        case o => col(s"__w.$o").as(o)
      }: _*)
  }

  /** The monotone matched-clause guard. */
  private def newer(seqCol: String): Column = col(s"s.$seqCol") > col(s"t.$seqCol")

  /** Drain everything currently landed into the state table and stop
    * (Trigger.AvailableNow — same cadence story as the other streaming
    * entry points; a long-lived deployment uses a processing trigger,
    * identical plan). */
  def runUpsert(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      keys: Seq[String],
      checkpoint: String,
      tablePath: String,
      seqCol: String = "seq",
      opCol: String = "op",
      writerId: Option[String] = None,
      maxFilesPerTrigger: Int = 32): StreamingQuery = {
    val writer = writerId
      .getOrElse(StreamingIngest.writerIdFor(spark, checkpoint, "graft-upsert-"))
    val q = readChanges(spark, landingDir, schema, maxFilesPerTrigger)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val winners = latestPerKey(batch, keys, seqCol)
        if (!winners.isEmpty)
          TxStore.mergeConditionalOnce(
            spark, tablePath, winners, keys, writer, batchId,
            matchedUpdate = Some(col(s"s.$opCol") =!= "D" && newer(seqCol)),
            matchedDelete = Some(col(s"s.$opCol") === "D" && newer(seqCol)),
            notMatchedInsert = Some(col(s"s.$opCol") =!= "D")): Unit
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q
  }
}
