package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-batch assembly: sequence packing and balanced shard layout.
  *
  * The reference pipeline ends at a report table; a pre-training pipeline
  * ends at token sequences on disk. Two layout decisions dominate that
  * last mile at 100 TB, and both are pure arithmetic once an order is
  * fixed — no pairwise anything, no global window:
  *
  * [[packSpans]] / [[packSummary]] — GPT-style concat-and-split packing:
  * documents are concatenated in a deterministic order (with a one-token
  * EOS separator) and the stream is cut into fixed-length blocks, so the
  * only padding in the whole corpus is the tail of each shard's last
  * block. A document's block span falls out of the running token total:
  * `block_first = (cum − n_tok) div L`, `block_last = (cum − 1) div L`.
  * Shape: one hash shuffle on the shard key, then a PER-SHARD cumulative
  * window — the shard count is the parallelism knob (thousands at lake
  * scale, one per writer task), and no single task ever sees more than
  * one shard's token stream. Integer `div` keeps the arithmetic exact at
  * any corpus size (no double rounding at 2⁵³).
  *
  * [[balancedShards]] — size-balanced shard assignment for skew-free
  * output files: rank documents by size descending ([[Chunking
  * .globalRankBy]] — two-pass distributed rank, NO single-partition
  * window), then deal them boustrophedon (shard 0…N−1, then N−1…0, …).
  * This is the classic sorted-round-robin approximation of LPT
  * scheduling: each "round" of N docs has near-equal sizes, and the
  * serpentine reversal cancels the within-round descending bias instead
  * of letting shard 0 accumulate it. Imbalance is bounded by one round's
  * size spread, independent of corpus size. Driver state is the rank
  * pass's per-partition counts — metadata, never data.
  */
object Packing {

  /** Per-document block span under concat-and-split packing. Output:
    * (idCol, shard, n_tok, block_first, block_last, n_blocks) where
    * `n_tok` counts the document's tokens plus one EOS separator and
    * blocks are `blockLen` tokens, numbered per shard from 0. */
  def packSpans(
      docs: DataFrame, idCol: String, tokensCol: Column,
      blockLen: Long, nShards: Int): DataFrame = {
    require(blockLen > 0, s"blockLen must be positive: $blockLen")
    require(nShards > 0, s"nShards must be positive: $nShards")
    val win = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(
        col(idCol),
        pmod(col(idCol), lit(nShards.toLong)).cast("long").as("shard"),
        (tokensCol.cast("long") + 1L).as("n_tok"))
      .withColumn("__cum", sum("n_tok").over(win))
      .select(
        col(idCol), col("shard"), col("n_tok"),
        expr(s"(__cum - n_tok) div ${blockLen}L").as("block_first"),
        expr(s"(__cum - 1) div ${blockLen}L").as("block_last"))
      .withColumn("n_blocks", col("block_last") - col("block_first") + 1L)
  }

  /** Per-shard packing plan: document count, token total, block count,
    * tail padding, and fill ratio. Tokens never pad mid-shard under
    * concat-and-split, so `pad_tokens < blockLen` per shard by
    * construction — the fill ratio approaches 1 as shards grow. */
  def packSummary(
      docs: DataFrame, idCol: String, tokensCol: Column,
      blockLen: Long, nShards: Int): DataFrame = {
    require(blockLen > 0, s"blockLen must be positive: $blockLen")
    require(nShards > 0, s"nShards must be positive: $nShards")
    docs
      .select(
        pmod(col(idCol), lit(nShards.toLong)).cast("long").as("shard"),
        (tokensCol.cast("long") + 1L).as("n_tok"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("total_tokens"))
      .withColumn("n_blocks", expr(s"(total_tokens + ${blockLen - 1}L) div ${blockLen}L"))
      .withColumn("pad_tokens", col("n_blocks") * blockLen - col("total_tokens"))
      .withColumn(
        "fill_ratio",
        graft.Num.rnd(
          col("total_tokens").cast("double") / (col("n_blocks") * blockLen).cast("double"), 4))
  }

  /** Size-balanced shard ids: rank by (sizeCol DESC, idCol) with the
    * two-pass distributed rank, then serpentine-deal ranks across
    * `nShards`. Adds `shard`; keeps every input column. */
  def balancedShards(
      docs: DataFrame, sizeCol: String, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    Chunking.globalRankBy(docs, Seq(col(sizeCol).desc, col(idCol)), rankCol = "__rn")
      .withColumn(
        "shard",
        expr(s"""CASE WHEN ((__rn - 1) div $nShards) % 2 = 0
                 |     THEN (__rn - 1) % $nShards
                 |     ELSE ${nShards - 1} - ((__rn - 1) % $nShards) END""".stripMargin)
          .cast("long"))
      .drop("__rn")
  }
}
