package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXT33 — exact-substring span dedup: the position-level deduplication of
  * Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
  * Better", the ExactSubstr half), re-expressed for a cluster. The
  * published implementation builds a single-node suffix array over the
  * whole corpus; the distributed equivalent here is an inverted index of
  * fixed-length token grams — every maximal duplicated substring of
  * ≥ L tokens is exactly a maximal run of duplicated L-grams, so marking
  * duplicated gram occurrences and merging overlapping runs recovers the
  * same spans without any global structure.
  *
  * Semantics (deterministic, keep-one): an L-gram occurrence is REDUNDANT
  * iff the same gram text occurs elsewhere in the corpus at a strictly
  * smaller (doc_id, pos) — i.e. every gram keeps exactly its first
  * occurrence in (doc_id, pos) order, matching the paper's "remove all
  * but one occurrence" rule, including repeats WITHIN one document.
  * [[duplicatedSpans]] reports the redundant regions (merged maximal
  * spans); [[trimSpans]] rebuilds each document's text with the redundant
  * positions removed.
  *
  * Scale shape (the reason this beats shipping a suffix array to one
  * node):
  *  - gram occurrences: posexplode + per-doc `lead` windows — one keyed
  *    shuffle on doc_id, stays in whole-stage codegen (same technique as
  *    [[TextOps.shingleRows]], positions kept instead of distinct'd);
  *  - first-occurrence election: `min(struct(doc_id, pos))` AGGREGATE per
  *    gram (map-side combinable, the [[Dedup.keepFirst]] pattern) — NOT a
  *    rank window, so a stop-phrase gram occurring millions of times
  *    costs a combinable min, never a single-partition sort;
  *  - mark join: occurrences ⋈ duplicated grams on the gram — d rows per
  *    gram where d = its occurrence count, Σd linear in corpus tokens;
  *  - span merge: running-max window per doc_id (gaps-and-islands) —
  *    keyed by doc, partition-parallel.
  * No all-pairs product anywhere: two documents sharing a duplicated
  * region meet only through the gram rows of that region.
  */
object SpanDedup {

  /** Every L-gram occurrence: (doc_id, pos, gram), pos 0-based, one row
    * per position 0 .. n_tokens − L. Documents shorter than L tokens
    * yield no rows. */
  private[ops] def gramOccurrences(
      docs: DataFrame, L: Int, tok: Column => Column = TextOps.tokens): DataFrame = {
    require(L >= 1)
    val win = Window.partitionBy("doc_id").orderBy("pos")
    val toks = docs.select(col("doc_id"),
      posexplode(tok(col("text"))).as(Seq("pos", "tok")))
    val withLeads = (1 until L).foldLeft(toks) { (df, o) =>
      df.withColumn(s"t_$o", lead("tok", o).over(win))
    }
    val parts = col("tok") +: (1 until L).map(o => col(s"t_$o"))
    val guarded = if (L > 1) withLeads.filter(col(s"t_${L - 1}").isNotNull) else withLeads
    guarded.select(col("doc_id"), col("pos").cast("long").as("pos"),
      concat_ws(" ", parts: _*).as("gram"))
  }

  /** (doc_id, pos) of every REDUNDANT gram occurrence — all occurrences
    * except each gram's first in (doc_id, pos) order. Grams occurring
    * once never leave the combinable aggregate (`n >= 2` filter before
    * the mark join). */
  private[ops] def redundantOccurrences(
      docs: DataFrame, L: Int, tok: Column => Column = TextOps.tokens): DataFrame = {
    val occ = gramOccurrences(docs, L, tok)
    val firsts = occ
      .groupBy("gram")
      .agg(min(struct(col("doc_id"), col("pos"))).as("keep"), count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .select("gram", "keep")
    occ.join(firsts, "gram")
      .filter(struct(col("doc_id"), col("pos")) =!= col("keep"))
      .select("doc_id", "pos")
  }

  /** Merged maximal redundant spans per document: each redundant L-gram
    * occurrence covers tokens [pos, pos+L−1]; overlapping or adjacent
    * covered ranges merge into one span (two spans with a gap of ≥ 1
    * never-covered token stay separate). Returns
    * (doc_id, span_start, span_end, span_tokens), token positions
    * 0-based inclusive. */
  def duplicatedSpans(
      docs: DataFrame, L: Int = 5, tok: Column => Column = TextOps.tokens): DataFrame = {
    val marked = redundantOccurrences(docs, L, tok)
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val prevEnd = max(col("pos") + lit(L.toLong - 1))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val islanded = marked
      .withColumn("brk",
        when(col("pos") > coalesce(prevEnd, lit(Long.MinValue)) + 1, 1L).otherwise(0L))
      .withColumn("island", sum("brk").over(byDoc))
    islanded
      .groupBy("doc_id", "island")
      .agg(min("pos").as("span_start"), (max("pos") + lit(L.toLong - 1)).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"))
  }

  /** Rebuild each document with the redundant positions removed: every
    * token covered by a redundant gram occurrence is dropped, the rest
    * re-joined in position order. Emits the before/after token counts so
    * the pipeline can report how much text dedup removed. Documents with
    * nothing redundant pass through verbatim (kept_tokens = n_tokens). */
  def trimSpans(
      docs: DataFrame, L: Int = 5, tok: Column => Column = TextOps.tokens): DataFrame = {
    // Covered positions come from the MERGED spans, not the raw
    // occurrences: exploding per redundant occurrence emits L rows each
    // (a heavily-duplicated region re-covers every position up to L
    // times) and then needs a (doc_id, pos) distinct shuffle to repair
    // the overlap. The islands pass already merges occurrence runs into
    // DISJOINT maximal spans, so exploding those emits every covered
    // position exactly once — ~L× smaller intermediate, zero distinct
    // (measured at sf10: the explode+distinct was the lane's dominant
    // cost; BASELINE.md round-10 century).
    val covered = duplicatedSpans(docs, L, tok)
      .select(col("doc_id"),
        explode(sequence(col("span_start"), col("span_end"))).as("pos"))
    val toks = docs.select(col("doc_id"),
      posexplode(tok(col("text"))).as(Seq("pos", "tok")))
      .withColumn("pos", col("pos").cast("long"))
    val kept = toks.join(covered, Seq("doc_id", "pos"), "left_anti")
    // sort_array on (pos, tok) structs restores position order inside the
    // aggregate; the transform + concat step is per-row, output-sized.
    val keptAgg = kept
      .groupBy("doc_id")
      .agg(count(lit(1)).as("kept_tokens"),
        concat_ws(" ",
          transform(sort_array(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok"))).as("text_clean"))
    docs
      .select(col("doc_id"),
        size(tok(col("text"))).cast("long").as("n_tokens"))
      .join(keptAgg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }
}
