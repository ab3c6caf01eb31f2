package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXT36 — the composed quality-filter FUNNEL: the rule pipeline a
  * training-data curation run actually ships (the shape of FineWeb's
  * ablation tables and Gopher's §A1.1 rule list), with per-rule
  * attrition reported so a corpus change shows WHERE documents die.
  *
  * Four rules in fixed order, each an exact-integer predicate (no float
  * threshold can disagree between engines; the one float input,
  * `avg_logp`, is compared AFTER its canonical 4dp rounding, which both
  * engines produce bit-identically — pinned by ext35's hash-green
  * oracle):
  *
  *  - R1 `len`:  20 ≤ n_tokens ≤ 10 000 (too short to carry signal /
  *    runaway concatenation)
  *  - R2 `rep`:  (n_tokens − n_distinct)·100 ≤ 65·n_tokens — repetition
  *    ratio ≤ 0.65 as a cross-multiplied integer inequality
  *  - R3 `stop`: n_stop·50 ≥ n_tokens — stopword ratio ≥ 0.02 (the
  *    classic natural-language-vs-keyword-list discriminator)
  *  - R4 `lm`:   avg_logp ≥ −3.43 — the unigram-LM gibberish gate
  *    ([[TextOps.unigramLogProb]])
  *
  * Thresholds are calibrated to the driver fixture so every rule has a
  * non-empty kill set at sf0.01 AND sf0.1 (a funnel whose rules never
  * fire verifies nothing); a production run re-tunes them per corpus.
  *
  * Scale shape: the token stats are one per-row projection (no shuffle);
  * the LM score joins on doc_id (keyed); the funnel aggregate reduces to
  * ONE row of running-conjunction sums before the four-row unpivot —
  * counters, not data, cross the final stage. */
object QualityFunnel {

  /** Rule names in funnel order. */
  val Rules: Seq[String] = Seq("len", "rep", "stop", "lm")

  /** Per-document verdicts: BIGINT 0/1 per rule plus the conjunction.
    * One row per input document. The LM gate scores under the corpus's
    * OWN distribution (the batch/oracle lane); [[filterFlagsUnder]] is
    * the train/apply variant for new batches and streams. */
  def filterFlags(docs: DataFrame, tok: Column => Column = TextOps.tokens): DataFrame =
    flagsWithLm(docs,
      TextOps.unigramLogProb(docs, tok).select(col("doc_id"), col("avg_logp")), tok)

  /** [[filterFlags]] with the LM gate scored under a SUPPLIED unigram
    * model ([[TextOps.unigramModel]] / [[TextOps.scoreUnderModel]]) —
    * identical rules, so a micro-batch gated under the reference model
    * equals the batch run over the same rows. */
  def filterFlagsUnder(
      docs: DataFrame,
      tf: DataFrame,
      total: Double,
      tok: Column => Column = TextOps.tokens): DataFrame =
    flagsWithLm(docs,
      TextOps.scoreUnderModel(docs, tf, total, tok).select(col("doc_id"), col("avg_logp")),
      tok)

  private def flagsWithLm(
      docs: DataFrame, lm: DataFrame, tok: Column => Column): DataFrame = {
    val t = tok(col("text"))
    val stats = docs.select(
      col("doc_id"),
      size(t).cast("long").as("n_tokens"),
      size(array_distinct(t)).cast("long").as("n_distinct"),
      size(filter(t, tk => tk.isin(TextOps.Stopwords: _*))).cast("long").as("n_stop"))
    val passLen = col("n_tokens") >= 20L && col("n_tokens") <= 10000L
    val passRep = (col("n_tokens") - col("n_distinct")) * 100L <= col("n_tokens") * 65L
    val passStop = col("n_stop") * 50L >= col("n_tokens")
    val passLm = col("avg_logp") >= -3.43
    // LEFT join + NULL→fail: a document with no LM row (NULL/empty text
    // explodes to zero tokens) must still get a VERDICT — an inner join
    // would silently drop it from both the flags and the funnel's n, so
    // it would count neither as passed nor failed. Every flag coalesces
    // to 0 so a NULL stat can never ride through the BIGINT cast as NULL.
    def flag(c: Column) = coalesce(c, lit(false)).cast("long")
    stats.join(lm, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        flag(passLen).as("pass_len"),
        flag(passRep).as("pass_rep"),
        flag(passStop).as("pass_stop"),
        flag(passLm).as("pass_lm"),
        flag(passLen && passRep && passStop && passLm).as("pass_all"))
  }

  /** The ORDER-FREE relaxation report the funnel's sequential semantics
    * deliberately is not ([[filterFunnel]]'s scaladoc points here): for
    * each rule, how many documents fail it while passing every OTHER
    * rule — exactly what relaxing that one rule would recover. A
    * document failing two rules appears in NEITHER count (relaxing one
    * rule alone does not save it), which is why these numbers answer
    * the threshold-tuning question the funnel's first-failing-rule
    * attrition cannot. Same one-row-of-counters-then-unpivot shape as
    * the funnel: the flags plan runs once, only counters cross the
    * final stage. */
  def relaxationSavings(docs: DataFrame): DataFrame = {
    val f = filterFlags(docs)
    val saves: Seq[Column] = Rules.map { r =>
      val others = Rules.filterNot(_ == r).map(o => col(s"pass_$o")).reduce(_ * _)
      sum((lit(1L) - col(s"pass_$r")) * others).as(s"save_$r")
    }
    val summary = f.agg(saves.head, saves.tail: _*)
    val rows = Rules.map { name =>
      struct(lit(name).as("rule"), col(s"save_$name").as("n_recovered"))
    }
    summary.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** Sequential attrition table: one row per rule, in [[Rules]] order,
    * with `n_in` (documents alive entering the rule), `n_fail` (killed
    * BY this rule, i.e. alive so far but failing it), `n_out`
    * (surviving it) — n_out of rule k is n_in of rule k+1, the
    * ablation-table invariant. A document failing two rules counts only
    * against the FIRST (sequential semantics — the number each rule
    * would save if relaxed is a different, order-free report). */
  def filterFunnel(docs: DataFrame): DataFrame = {
    val f = filterFlags(docs)
    val alive: Seq[Column] = Rules.indices.map { k =>
      Rules.take(k + 1).map(r => col(s"pass_$r")).reduce(_ * _)
    }
    val summary = f.agg(
      count(lit(1)).as("n"),
      alive.zipWithIndex.map { case (c, k) => sum(c).as(s"s$k") }: _*)
    // one explode over a literal 4-struct array: the flags plan runs
    // ONCE (a per-branch union would re-run it per rule)
    val rows = Rules.zipWithIndex.map { case (name, k) =>
      val nIn = if (k == 0) col("n") else col(s"s${k - 1}")
      struct(
        lit(k + 1L).as("step"),
        lit(name).as("rule"),
        nIn.as("n_in"),
        (nIn - col(s"s$k")).as("n_fail"),
        col(s"s$k").as("n_out"))
    }
    summary.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }
}
