package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXT42 — BPE vocabulary induction (Sennrich, Haddow & Birch 2016):
  * learn the first `merges` byte-pair merge rules from a corpus. The
  * classic tokenizer-training step of an LLM data pipeline — the seam
  * for *applying* a tokenizer (`tok: Column => Column`) already runs
  * through every tokenizing operator; this is the op that produces the
  * vocabulary such a tokenizer is built from.
  *
  * Scale shape — the reason BPE training fits a cluster at all: the
  * corpus is touched EXACTLY ONCE (the word-frequency groupBy, the
  * [[TextOps.unigramModel]] contract — map-side combinable, corpus-scale
  * shuffle of (word, count) pairs). Every Lloyd-like iteration after
  * that runs on the VOCABULARY table (distinct words — bounded by
  * language, not corpus size: millions of rows at web scale, not
  * billions), so per-merge cost is one vocab-scale map-side-combined
  * aggregate + a ONE-ROW argmax collect; the symbol-merge rewrite is a
  * pure per-row fold expression, no shuffle. This is the standard
  * restatement of Sennrich's algorithm (which iterates over a word
  * frequency dict, never the raw corpus). The iterated lineage is
  * truncated per round with localCheckpoint, the connected-components
  * rule — without it the fold plan doubles per merge.
  *
  * Semantics (pinned in BpeSpec and replayed by the unrolled DuckDB
  * oracle of `ext42_bpe`):
  *  - words split into single-character symbol arrays (no end-of-word
  *    marker — the within-word contract is what the oracle unrolls);
  *  - pair counts follow Sennrich's `get_stats`: EVERY adjacent
  *    position counts, weighted by word frequency ("aaa" contributes
  *    (a,a) twice);
  *  - the winning pair is (max count, then lexicographic (left,
  *    right)) — a total order, so training is deterministic;
  *  - merging is greedy left-to-right non-overlapping ("a a a a" under
  *    (a,a) becomes "aa aa", never "a aa a") — the fold keeps an
  *    accumulator whose last symbol merges with the current one iff
  *    they form the winning pair; a just-merged symbol can never
  *    re-merge this round (its text differs from `left`).
  *
  * Returns one row per learned rule: (merge_rank, lft, rgt,
  * pair_count), rank 1 = first merge. Stops early if the vocabulary
  * runs out of pairs. */
object Bpe {

  def bpeMerges(
      docs: DataFrame,
      merges: Int = 3,
      tok: Column => Column = TextOps.tokens): DataFrame = {
    require(merges >= 1, s"merges must be >= 1: $merges")
    val spark = docs.sparkSession
    // the ONE corpus-scale pass: word frequencies
    val words = docs
      .select(explode(tok(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    // vocabulary-scale state: (word, count, symbol array)
    var vocab = words
      .select(col("w"), col("cnt"), array_remove(split(col("w"), "(?!^)"), "").as("syms"))
      .localCheckpoint(true)
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var exhausted = false
    for (r <- 1 to merges if !exhausted) {
      // adjacent-pair counts, weighted by word frequency (get_stats)
      val top = vocab
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"),
          explode(zip_with(
            slice(col("syms"), lit(1), size(col("syms")) - 1),
            slice(col("syms"), lit(2), size(col("syms")) - 1),
            (x, y) => struct(x.as("l"), y.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(desc("c"), asc("l"), asc("r"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val l: String = top(0).getString(0)
        val rt: String = top(0).getString(1)
        val c: Long = top(0).getLong(2)
        learned += ((r.toLong, l, rt, c))
        // greedy left-to-right merge as a pure fold over the symbols;
        // element_at(acc, -1) is null-on-empty (non-ANSI), so the
        // empty-accumulator case falls through to append
        val folded = aggregate(
          col("syms"),
          typedLit(Array.empty[String]),
          (acc, s) =>
            when(element_at(acc, -1) === lit(l) && s === lit(rt),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + rt))))
              .otherwise(concat(acc, array(s))))
        vocab = vocab.select(col("w"), col("cnt"), folded.as("syms")).localCheckpoint(true)
      }
    }
    import spark.implicits._
    learned.toSeq.toDF("merge_rank", "lft", "rgt", "pair_count")
  }

  /** Corpus-scale ENCODE under learned merge rules: per-document BPE
    * token counts — the number every budget decision downstream
    * (chunking, packing, truncation, pricing) actually needs, computed
    * WITHOUT running the merge fold per document. The fold runs once
    * per DISTINCT WORD ([[applyMerges]], vocabulary-scale); documents
    * then meet the vocabulary in a keyed enrich join (word → symbol
    * count) and reduce with a map-side-combinable sum — the same
    * two-tier shape as TF-IDF, so corpus cost is one tokenize pass +
    * one vocab join, independent of merge count. Documents with no
    * tokens produce no row (nothing to count), in both engines. */
  def encodeCounts(
      docs: DataFrame,
      rules: Seq[(String, String)],
      tok: Column => Column = TextOps.tokens): DataFrame = {
    val vocab = applyMerges(docs, rules, tok)
      .select(col("w"), size(col("syms")).cast("long").as("__nsym"))
    docs
      .select(col("doc_id"), explode(tok(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("doc_id", "w").agg(count(lit(1)).as("__c"))
      .join(vocab, "w")
      .groupBy("doc_id")
      .agg(sum(col("__c") * col("__nsym")).as("n_bpe_tokens"))
  }

  /** The trained vocabulary state after [[bpeMerges]]' rules are
    * applied: (word, count, symbol array) — what a tokenizer builder
    * persists alongside the merge table. Re-runs the same fold chain;
    * exposed for specs and downstream encode stages. */
  def applyMerges(
      docs: DataFrame,
      rules: Seq[(String, String)],
      tok: Column => Column = TextOps.tokens): DataFrame = {
    val words = docs
      .select(explode(tok(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val init = words.select(col("w"), col("cnt"), array_remove(split(col("w"), "(?!^)"), "").as("syms"))
    rules.foldLeft(init) { case (df, (l, rt)) =>
      val folded = aggregate(
        col("syms"),
        typedLit(Array.empty[String]),
        (acc, s) =>
          when(element_at(acc, -1) === lit(l) && s === lit(rt),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + rt))))
            .otherwise(concat(acc, array(s))))
      df.select(col("w"), col("cnt"), folded.as("syms"))
    }
  }
}
