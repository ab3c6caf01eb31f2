package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The canonical training-data cleaning pipeline, composed from the
  * engine's own operators: quality gate → exact dedup → near-dup dedup →
  * surviving corpus. Each stage is a keyed shuffle or an already-audited
  * op — the composition adds no new scale hazards.
  *
  *  1. quality gate: minimum token count + maximum stopword ratio
  *     (TextOps.qualityScore semantics);
  *  2. exact dedup: one survivor per identical text (min doc_id);
  *  3. near-dup dedup: for every near-dup pair (doc_a < doc_b) from the
  *     LSH path, the higher id is dropped — a deterministic greedy rule.
  *     On transitive chains it can over-drop (b removes c even though b
  *     itself was removed by a) — the conservative direction for training
  *     data, where an extra removal is cheaper than a kept duplicate;
  *     exact clustering would need iterative connected components.
  */
object CorpusClean {

  /** Surviving doc_ids with their quality stats. */
  def clean(
      docs: DataFrame,
      minTokens: Int = 10,
      maxStopwordRatio: Double = 0.5,
      jaccardThreshold: Double = 0.5): DataFrame = {
    // Quality stats feed two consumers (the gate and the final stat
    // join); the exact-deduped corpus feeds three (the LSH signature
    // pass, the candidate re-verification, and the final anti-join).
    // Persist both so their lineage — a full corpus scan + tokenization —
    // runs once, not once per consumer. Both frames are ≤ corpus-sized
    // and column-pruned, so MEMORY_AND_DISK spills safely at scale.
    val quality = TextOps.qualityScore(docs)
      .filter(col("n_tokens") >= minTokens && col("stopword_ratio") <= maxStopwordRatio)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // carry only (doc_id, text): the fixture has its own n_chars column
    // that would collide with the computed quality stats downstream
    val passing = docs.select("doc_id", "text").join(quality.select("doc_id"), "doc_id")

    // exact dedup: keep min doc_id per identical text
    val exactKept = passing
      .groupBy("text").agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val exact = passing.join(exactKept, "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // near-dup dedup over the exact-deduped corpus (LSH scale path)
    val dupLosers = Dedup.minhashLshPairs(exact, threshold = jaccardThreshold)
      .select(col("doc_b").as("doc_id")).distinct()
    exact
      .join(dupLosers, Seq("doc_id"), "left_anti")
      .join(quality, "doc_id")
      .select("doc_id", "n_chars", "n_tokens", "stopword_ratio")
  }

  /** One-line corpus report after cleaning. */
  def stats(cleaned: DataFrame): DataFrame =
    cleaned.agg(
      count(lit(1)).as("n_docs"),
      sum("n_tokens").as("total_tokens"),
      graft.Num.rnd(avg("n_tokens"), 4).as("avg_tokens"))
}
