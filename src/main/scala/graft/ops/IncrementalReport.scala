package graft.ops

import graft.sources.TxStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EXT28 — incremental maintenance of the channel/date report from the
  * attribution table's append CDC (the materialized-view pattern the
  * reference approximates by re-running step 3 nightly,
  * channel_reporter.py:21–120).
  *
  * The rollup's aggregates are all SUMs, so it is self-maintainable:
  * aggregate ONLY the newly appended attribution rows, then add the
  * delta into the stored rollup per (channel_name, date). At 100 TB the
  * difference is the whole game — a day's re-run scans every historical
  * attribution row to rebuild a channel×date table, while the
  * incremental step scans one day's appends plus a channel×date-sized
  * state table:
  *
  *  - the delta rollup is [[ChannelReport.report]] over the CDC frame —
  *    the identical plan (and identical join semantics ⚠B5) as the full
  *    recompute, just over fewer rows;
  *  - the combine touches only the (channel_name, date) keys present in
  *    the delta (left-semi against the delta's key set), and the keyed
  *    merge rewrites only the files holding those keys — the state
  *    table is never globally rewritten.
  *
  * Exactly-once across crash/restart: because the step ADDS into running
  * sums, replaying it would double-count — so the consumer position is
  * not a side file the caller could lose, it rides IN the report store's
  * own commit, via [[TxStore.mergeOnce]]'s (writerId, batchId) txn stamp
  * with batchId = the attribution version consumed through. [[advance]]
  * recovers its position by reading the latest stamp back from the
  * report log, so position and data commit atomically and a crashed step
  * replays as a no-op (the stamp is found) or re-runs cleanly (it was
  * never committed). This is the transactional-sink protocol streaming
  * `foreachBatch` consumers need, provided by the table format itself.
  *
  * Caveat inherited from file-level CDC: a rewrite commit
  * (delete/merge/compact) on the ATTRIBUTION store in the consumed range
  * makes the delta non-derivable — [[TxStore.readAppendsSince]] fails
  * loudly and the caller must rebuild the rollup from the full snapshot
  * (exactly the reference's re-run, as the recovery path instead of the
  * steady state). */
object IncrementalReport {

  private val Keys = Seq("channel_name", "date")
  private val Sums = Seq("cost", "ihc", "ihc_revenue")

  /** Stamp prefix in the report store's log (no colons — TxStore's
    * writerId charset). */
  val WriterId: String = "graft-incr-report"

  /** Additive merge of rollup frames sharing the (keys ++ sums) schema:
    * union + re-aggregate — sums are associative, so combining partial
    * rollups equals rolling up the union of their inputs. */
  def combine(rollups: DataFrame*): DataFrame =
    rollups
      .map(_.select((Keys ++ Sums).map(col): _*))
      .reduce(_ unionByName _)
      .groupBy(Keys.map(col): _*)
      .agg(sum(Sums.head).as(Sums.head),
        Sums.tail.map(c => sum(c).as(c)): _*)

  /** The attribution version this report store has consumed through —
    * the largest batchId among [[WriterId]] stamps in its log. 0 before
    * the first maintenance commit. */
  def consumedThrough(spark: SparkSession, reportStore: String): Long =
    TxStore.history(spark, reportStore)
      .flatMap(_.txn)
      .collect { case s if s.startsWith(WriterId + ":") =>
        s.substring(WriterId.length + 1).toLong }
      .maxOption
      .getOrElse(0L)

  /** One maintenance step: consume attribution appends past the stored
    * position, fold them into the report store, return the new position.
    * A caught-up poll (no new appends) is a no-op that still returns the
    * current attribution version. `sessionData` / `conversions` are the
    * dimension sides of the rollup join ([[ChannelReport.report]]'s
    * contract). Safe to re-run after any crash: the position is read
    * from, and committed with, the report store itself (see object doc). */
  def advance(
      spark: SparkSession,
      attrStore: String,
      reportStore: String,
      sessionData: DataFrame,
      conversions: DataFrame): Long = {
    val since = consumedThrough(spark, reportStore)
    val (version, delta) = TxStore.readAppendsSince(spark, attrStore, since)
    if (version == since) return version
    // The delta rollup feeds the step more than once (its key set drives
    // the semi-join, its rows the combine; mergeOnce then runs its own
    // validation/probe/stage actions) — persist it so the journey-join +
    // scoring plan behind it executes once per step, not per action.
    val deltaRollup = ChannelReport.report(sessionData, delta, conversions).persist()
    try {
      val updates =
        if (TxStore.history(spark, reportStore).isEmpty) deltaRollup
        else {
          val current = TxStore.read(spark, reportStore)
          val touched = deltaRollup.select(Keys.map(col): _*)
          combine(current.join(touched, Keys, "left_semi"), deltaRollup)
        }
      // collectStats = false: the report table is ~|channels × days| rows
      // across a handful of files — footer harvesting per fold would cost
      // more than pruning could ever save on it
      TxStore.mergeOnce(spark, reportStore, updates, Keys, WriterId, batchId = version,
        collectStats = false)
    } finally deltaRollup.unpersist(): Unit
    version
  }

  private val CountKeys = Seq("user_id", "event_type")

  /** Stamp prefix for [[advanceCounts]] rollup stores. */
  val CountsWriterId: String = "graft-incr-counts"

  /** The source version an [[advanceCounts]] rollup has consumed
    * through. */
  def countsConsumedThrough(spark: SparkSession, rollupStore: String): Long =
    TxStore.history(spark, rollupStore)
      .flatMap(_.txn)
      .collect { case s if s.startsWith(CountsWriterId + ":") =>
        s.substring(CountsWriterId.length + 1).toLong }
      .maxOption
      .getOrElse(0L)

  /** One maintenance step of a per-(user_id, event_type) COUNT rollup
    * driven by ROW-level CDC — [[advance]]'s generalization to sources
    * that DELETE: [[TxStore.readChangesSince]] emits every logical row
    * change, and a count rollup is self-maintainable under both
    * directions (an insert folds as +1, a delete as −1 — the classic
    * incremental view-maintenance rule for distributive aggregates;
    * all-integer state, so the fold is exact, never a float
    * cancellation). Keys deleted down to zero stay as zero-count rows
    * in the store (a keyed merge cannot drop rows; consumers filter
    * `n_events != 0` — compacting them away is a separate maintenance
    * choice). Exactly-once via the same stamp-in-the-rollup-log
    * protocol as [[advance]]: position and fold commit atomically, a
    * replayed step no-ops on the found stamp. */
  def advanceCounts(spark: SparkSession, srcStore: String, rollupStore: String): Long = {
    val since = countsConsumedThrough(spark, rollupStore)
    val (version, changes) = TxStore.readChangesSince(spark, srcStore, since)
    if (version == since) return version
    val delta = changes
      .groupBy(CountKeys.map(col): _*)
      .agg(sum(when(col("_change_type") === "insert", 1L).otherwise(-1L)).as("n_events"))
      .persist()
    try {
      val updates =
        if (TxStore.history(spark, rollupStore).isEmpty) delta
        else {
          val current = TxStore.read(spark, rollupStore)
          val touched = delta.select(CountKeys.map(col): _*)
          current.join(touched, CountKeys, "left_semi")
            .unionByName(delta)
            .groupBy(CountKeys.map(col): _*)
            .agg(sum("n_events").as("n_events"))
        }
      TxStore.mergeOnce(spark, rollupStore, updates, CountKeys, CountsWriterId,
        batchId = version, collectStats = false)
    } finally delta.unpersist(): Unit
    version
  }
}
