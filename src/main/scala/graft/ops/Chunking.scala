package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Global sequence / chunk assignment without a single-partition window.
  *
  * The reference numbers API request chunks with a global sequence over
  * conversion ids (reference api_client.py:179–187: 50 ids per request, in
  * id order). The direct Spark translation — `row_number().over(
  * Window.orderBy(key))` — plans an `Exchange SinglePartition`: every row
  * funnels through ONE task, which works on thousands of ids and falls
  * over on billions. These operators produce the same numbering with no
  * global window anywhere in the plan.
  *
  * [[globalRank]] — the classic two-pass distributed sequence (the shape
  * behind RDD `zipWithIndex`, re-expressed on DataFrames):
  *
  *  1. range-repartition on the key, so partitions hold DISJOINT,
  *     ORDERED key ranges (partition i's keys all sort before partition
  *     i+1's);
  *  2. rank WITHIN each partition — a partition-local sort plus a
  *     per-partition counter (mapPartitions). NOT a window keyed by the
  *     partition id: the rows are already physically clustered by
  *     partition, but Catalyst cannot see that through a column, so a
  *     `Window [..], [__pid]` would re-shuffle the whole set on __pid —
  *     a full avoidable exchange (measured in the round-7 plan audit).
  *     The counter is the one place an iterator beats an expression;
  *  3. collect the per-partition row COUNTS (metadata-scale: one long
  *     per partition, never data) and add each partition's cumulative
  *     offset as a literal map lookup.
  *
  * global rank = local rank + offset, exactly `row_number()` over the
  * global key order. The frame is persisted between the count pass and
  * the rank pass — the range partitioner samples its split points, and
  * the two passes must see the SAME physical partitioning for the
  * offsets to be correct (the persist pins it; this is a correctness
  * requirement, not a cache optimization).
  *
  * [[arithmeticChunks]] — the zero-sequence variant: when chunk ids only
  * need to be DETERMINISTIC and SIZE-BOUNDED (not the reference's exact
  * numbering), `key mod ceil(n/size)` assigns every row its chunk in a
  * single narrow projection — no shuffle, no window, no second pass; the
  * one action is a metadata-scale count to fix the chunk count. Expected
  * chunk size is `size` for roughly uniform keys (the fixtures' ids are
  * dense), and any skew is bounded by the key distribution, not the data
  * volume.
  */
object Chunking {

  /** Exact global `row_number()` in `key` order (keys must be unique —
    * with duplicates the intra-tie order would be partitioner-dependent).
    * Plans: one range shuffle + one keyed window; driver state is one
    * count per partition. */
  def globalRank(
      df: DataFrame, key: String, rankCol: String = "rn", numPartitions: Int = 0): DataFrame =
    globalRankBy(df, Seq(col(key)), rankCol, numPartitions)

  /** [[globalRank]] over a COMPOSITE sort order (e.g. `size DESC, id` for
    * the LPT-style shard balancer, Packing.balancedShards). The combined
    * key must still be unique; sort direction riding on each Column is
    * honored by both the range partitioner and the within-partition sort,
    * so the two passes agree on one global order. */
  def globalRankBy(
      df: DataFrame, sortKeys: Seq[org.apache.spark.sql.Column],
      rankCol: String = "rn", numPartitions: Int = 0): DataFrame = {
    require(sortKeys.nonEmpty, "need at least one sort key")
    require(!df.columns.contains("__pid") && !df.columns.contains("__lrn"),
      "input already carries a __pid/__lrn column — rename it first")
    val spark = df.sparkSession
    val n =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val parted = df
      .repartitionByRange(n, sortKeys: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one row per partition crosses to the driver — metadata, not data
    val counts = parted.groupBy("__pid").agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    // partition i's offset = rows in all lower-range partitions. A pid
    // with zero rows simply never appears — on either side.
    val cumulative: Map[Int, Long] = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _)).toMap
    val off =
      if (counts.isEmpty) lit(0L)
      else element_at(typedLit(cumulative), col("__pid"))
    val sorted = parted.sortWithinPartitions(sortKeys: _*)
    val outSchema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField(
          "__lrn", org.apache.spark.sql.types.LongType, nullable = false))
    val ranked = sorted.mapPartitions { it =>
      var i = 0L
      it.map { r => i += 1; org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i) }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    ranked
      .withColumn(rankCol, off + col("__lrn"))
      .drop("__pid", "__lrn")
  }

  /** Fixed-target-size chunk ids by key arithmetic: `key mod nChunks`,
    * `nChunks = max(1, ceil(totalRows / chunkSize))`. Deterministic,
    * engine-independent (plain integer mod — a DuckDB oracle reproduces
    * it verbatim), and shuffle-free. */
  def arithmeticChunks(
      df: DataFrame, key: String, chunkSize: Long, chunkCol: String = "chunk_id"): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive: $chunkSize")
    val total = df.count()
    val nChunks = math.max(1L, (total + chunkSize - 1) / chunkSize)
    df.withColumn(chunkCol, pmod(col(key), lit(nChunks)).cast("long"))
  }
}
