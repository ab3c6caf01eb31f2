package graft.streaming

import graft.sources.TxStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.graft.DsvBridge

/** `writeStream.format("graft").start(path)` — every micro-batch lands
  * as ONE idempotent commit via [[TxStore.appendOnce]], stamped
  * (writerId, batchId). The EXACTLY-ONCE contract rides the stamp: a
  * crash between the table commit and the checkpoint advance redelivers
  * the batch, appendOnce finds the stamp in the log and no-ops with the
  * original version — the same txn mechanism Delta's sink uses. The
  * writerId is the streaming QUERY id (stable across restarts — it
  * lives in the checkpoint; the run id changes per restart and would
  * break replay detection), overridable with option("txnAppId") when
  * two queries legitimately feed one table.
  *
  * The first batch may CREATE the table; `partitionBy(...)` on the
  * stream writer establishes hive layout then (later batches inherit
  * it — TxStore.append's partitioning rule). */
final class GraftSink(
    path: String,
    txnAppId: Option[String],
    partitionBy: Seq[String]) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // re-wrap the streaming micro-batch plan as a batch frame — the
    // staged write underneath runs DataFrameWriter, which refuses
    // streaming plans (the RDD is captured lazily; execution stays
    // fully distributed)
    val batch = DsvBridge.batchFrame(data)
    val writerId = txnAppId.orElse(
      // MicroBatchExecution sets the query id as a thread-local spark
      // property around addBatch — the public StreamExecution.QUERY_ID_KEY
      Option(data.sparkSession.sparkContext.getLocalProperty("sql.streaming.queryId")))
      .getOrElse(throw new IllegalStateException(
        "graft sink: no streaming query id on this thread — pass option(\"txnAppId\", …)"))
    TxStore.appendOnce(batch, path, writerId, batchId, partitionBy = partitionBy): Unit
  }

  override def toString: String = s"GraftSink[$path]"
}
