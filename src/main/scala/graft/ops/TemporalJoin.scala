package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Temporal join operators Spark has no native strategy for — as-of-latest
  * and bounded-range (interval) joins. SURVEY.md §2.3 lists both as absent
  * from the reference (its only temporal predicate is the cumulative
  * `session.ts <= conv.ts` of cj_builder.py:90, J1); these supply the
  * as-of-LATEST and interval-window variants a training-data pipeline
  * needs (point-in-time feature lookup, event-context windows).
  *
  * Scale design — neither operator is implemented as join-then-filter:
  *
  *  - [[asOfLatest]] is the union + cumulative-window formulation: tag
  *    both inputs, union them, and carry the latest right-side payload
  *    forward with `last(ignoreNulls)` over a (key, ts)-ordered running
  *    frame. ONE shuffle on the key, touching |L|+|R| rows total. The
  *    naive equi-join + per-left-row argmax first materializes every
  *    qualifying (left, right) pair — the J1 cardinality, ~25× the input
  *    on this fixture — then shuffles again to reduce it back down.
  *  - [[aggInWindow]] is a binned range join: both sides get a bucket key
  *    derived with exact integer arithmetic (`unix_micros div width`),
  *    intervals explode to the ≤3 buckets they overlap, and the join is
  *    a plain equi-join on the bucket with the exact interval predicate
  *    applied post-join. Catalyst, given only inequality predicates,
  *    would plan a BroadcastNestedLoop — a per-row scan of the whole
  *    right table. The bucket key bounds each join group by data density
  *    per bucket, not table size (PlanAuditSpec's registry sweep asserts
  *    no BNLJ is planned).
  */
object TemporalJoin {

  /** As-of-latest join: for each left row, the single latest right row
    * with the same `key` and `right.rightTs <= left.leftTs` (inclusive).
    * Ties on the right timestamp resolve to the largest `tieCol` —
    * deterministic, mirrored by the oracle's ORDER BY ts DESC, tie DESC.
    * Unmatched left rows keep NULL payload (left-join semantics).
    * `payload` maps output name -> right-side column.
    *
    * `tieCol` must be unique within (key, rightTs) groups on the right —
    * satisfied by construction when it is the right side's primary key.
    *
    * NULL keys follow equi-join semantics (SQL NULL matches nothing):
    * null-key right rows are filtered out, so a null-key left row
    * surfaces with NULL payload — without the filter, the window would
    * group all null keys into ONE partition and hand left rows a match
    * a join would never produce. */
  def asOfLatest(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      tieCol: String,
      payload: Seq[(String, String)]): DataFrame = {
    val pType = StructType(payload.map { case (out, in) =>
      right.schema(in).copy(name = out, nullable = true)
    })
    val lType = StructType(left.schema.map(_.copy(nullable = true)))
    val l = left.select(
      col(key).as("__key"),
      col(leftTs).as("__ts"),
      lit(1).as("__side"),
      lit(0L).as("__tie"), // only orders right rows; left ties are payload-null
      lit(null).cast(pType).as("__p"),
      struct(left.columns.toSeq.map(col): _*).as("__left"))
    val r = right.filter(col(key).isNotNull).select(
      col(key).as("__key"),
      col(rightTs).as("__ts"),
      lit(0).as("__side"),
      col(tieCol).cast("long").as("__tie"),
      struct(payload.map { case (out, in) => col(in).as(out) }: _*).as("__p"),
      lit(null).cast(lType).as("__left"))
    // Right rows sort BEFORE left rows at the same timestamp (__side 0 < 1)
    // so an exactly-equal timestamp matches — the <= boundary.
    val w = Window
      .partitionBy("__key")
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        left.columns.toSeq.map(c => col(s"__left.$c").as(c)) ++
          payload.map { case (out, _) => col(s"__m.$out").as(out) }: _*)
  }

  /** Bounded-range (interval) join, aggregated: for each left row, the
    * given aggregates over right rows whose `rightTs` falls inside
    * [leftTs − widthMicros, leftTs + widthMicros] (inclusive).
    * `keyCols` optionally adds equi-key conjuncts (the per-entity
    * context window — "this user's events around each conversion"):
    * the join key becomes (bucket, keys…), so each group shrinks from
    * bucket density to per-key bucket density. With `keyCols` empty
    * this is the pure interval join Spark would otherwise plan as a
    * nested loop. `leftTs` / `rightTs` must be LONG epoch-µs
    * columns (the fixture's ns-long timestamps convert with `div 1000`,
    * the same truncation the DuckDB oracle applies reading the parquet —
    * doing the arithmetic on mixed ns/µs representations would disagree
    * with the oracle on sub-µs boundary rows). Aggregation is partial
    * (map-side combine) on the pair stream, so only (leftId,
    * partial-agg) rows cross the final shuffle.
    *
    * Inner semantics: left rows with an empty window produce no row
    * (mirrored by the oracle's inner join). */
  def aggInWindow(
      left: DataFrame,
      right: DataFrame,
      leftId: String,
      leftTs: String,
      rightTs: String,
      widthMicros: Long,
      aggs: Seq[Column],
      keyCols: Seq[String] = Nil): DataFrame = {
    require(leftTs != rightTs,
      s"leftTs and rightTs must have distinct names (both '$leftTs'): the exact " +
        "interval filter references both sides post-join and a shared name is ambiguous")
    // integer `div` keeps the bucket math exact; timestamps are positive
    // epochs so floor == truncation
    val intervals = left.select(
      (col(leftId) +: col(leftTs) +: keyCols.map(col)) :+
        explode(sequence(
          expr(s"($leftTs - ${widthMicros}L) div ${widthMicros}L"),
          expr(s"($leftTs + ${widthMicros}L) div ${widthMicros}L"))).as("__bucket"): _*)
    val bucketed = right
      .withColumn("__bucket", expr(s"$rightTs div ${widthMicros}L"))
    intervals
      .join(bucketed, "__bucket" +: keyCols)
      // a right row lives in exactly one bucket, so each (interval, row)
      // pair meets at most once — no post-join dedup needed
      .filter(col(rightTs) >= col(leftTs) - lit(widthMicros) &&
        col(rightTs) <= col(leftTs) + lit(widthMicros))
      .groupBy(col(leftId))
      .agg(aggs.head, aggs.tail: _*)
  }
}
