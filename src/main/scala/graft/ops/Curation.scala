package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline runs between raw
  * ingestion and batch assembly: cross-source overlap measurement (what is
  * this new crawl actually adding?), token-budget truncation (context-window
  * capping), and reproducible global shuffling (training order you can
  * replay bit-for-bit).
  *
  * Same engine discipline as the sibling ops: integer or exact-ratio
  * arithmetic wherever a DuckDB oracle hash-compares the result, keyed
  * shuffles only, nothing collected to the driver.
  */
object Curation {

  /** EXT28 — pairwise source-overlap matrix: for every pair of `source`
    * values, the Jaccard similarity of their distinct w-token shingle
    * sets. The dataset-curation question this answers ("how much of
    * source B is already in source A?") decides dedup order and mixture
    * weights before any training run.
    *
    * Shape: the inverted index is distinct (source, shingle) — one row
    * per source per shingle regardless of how many documents in the
    * source repeat it — so the self-join on the shingle fans out at most
    * |sources|² rows per VOCABULARY entry, never per document pair.
    * Linear in corpus size for a bounded source count (the realistic
    * regime: crawls ship dozens of sources, not millions); the per-source
    * set sizes ride in on a broadcast (sources × 1 row). Pairs sharing
    * zero shingles are omitted (inner join), which is also what keeps
    * the output |sources|²-bounded rather than dense.
    *
    * Shuffles: tokenize/window (doc_id), distinct (source, shingle),
    * shingle-keyed self-join, pair groupBy — all keyed, all
    * map-side-combinable where aggregation applies. */
  def sourceOverlap(docs: DataFrame, w: Int = 3): DataFrame = {
    val inv = sourceShingles(docs, w)
    val perSrc = inv.groupBy("source").agg(count(lit(1)).as("n"))
    val inter = inv.as("a")
      .join(inv.as("b"), "shingle")
      .filter(col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(perSrc.select(col("source").as("src_a"), col("n").as("n_a"))), "src_a")
      .join(broadcast(perSrc.select(col("source").as("src_b"), col("n").as("n_b"))), "src_b")
      .select(
        col("src_a"), col("src_b"), col("n_a"), col("n_b"), col("inter"),
        graft.Num.rnd(
          col("inter").cast("double") /
            (col("n_a") + col("n_b") - col("inter")).cast("double"), 4).as("jaccard"))
  }

  /** Distinct (source, shingle) rows — [[TextOps.shingleRows]]'s
    * posexplode+lead technique (stays in whole-stage codegen; HOF array
    * slides do not) with the source label carried through the window. */
  private def sourceShingles(docs: DataFrame, w: Int): DataFrame = {
    require(w >= 1)
    val win = Window.partitionBy("doc_id").orderBy("pos")
    val toks = docs.select(col("doc_id"), col("source"),
      posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "tok")))
    val withLeads = (1 until w).foldLeft(toks) { (df, o) =>
      df.withColumn(s"t_$o", lead("tok", o).over(win))
    }
    val parts = col("tok") +: (1 until w).map(o => col(s"t_$o"))
    val guarded = if (w > 1) withLeads.filter(col(s"t_${w - 1}").isNotNull) else withLeads
    guarded
      .select(col("source"), concat_ws(" ", parts: _*).as("shingle"))
      .distinct()
  }

  /** EXT29 — token-budget truncation: cap every document at `maxTokens`
    * whitespace tokens, the context-window guard that runs just before
    * sequence packing. Pure per-row expressions (`slice` + `concat_ws`,
    * both codegen'd) — no shuffle, no UDF; emits the before/after token
    * counts so the pipeline can report how much text the cap discarded. */
  def truncateToBudget(docs: DataFrame, maxTokens: Int): DataFrame = {
    require(maxTokens >= 1)
    val t = TextOps.tokens(col("text"))
    docs.select(
      col("doc_id"),
      size(t).cast("long").as("n_tokens"),
      least(size(t).cast("long"), lit(maxTokens.toLong)).as("kept_tokens"),
      concat_ws(" ", slice(t, 1, maxTokens)).as("text_trunc"))
  }

  /** EXT30 — deterministic seeded shuffle: assign every document a
    * reproducible (shard, pos) slot for one training epoch. The hash is
    * a portable seed-keyed affine bijection over the key modulo a 31-bit
    * prime — NOT xxhash64/rand — so any engine (or the auditing oracle)
    * can recompute the exact permutation from (doc_id, seed) alone;
    * products stay < 2⁶³ for any BIGINT doc_id because the key is
    * reduced mod p first. The seed drives the MULTIPLIER (see
    * [[shuffleHash]]), so changing it permutes within-shard relative
    * order, not just shard labels; same seed replays the same epoch
    * order bit-for-bit.
    *
    * Scale shape: `pos` is ranked WITHIN each shard (`row_number` over
    * shard partitions — parallel across shards), never globally: a
    * global row_number would serialize the corpus through one partition.
    * A training dataloader consumes shard files independently in pos
    * order, so cross-shard position is meaningless anyway — shards ARE
    * the parallelism unit. */
  def seededShuffle(docs: DataFrame, seed: Long, shards: Int): DataFrame = {
    require(shards >= 1)
    val h = shuffleHash(col("doc_id"), seed)
    docs
      .select(col("doc_id"), h.as("h"))
      .withColumn("shard", pmod(col("h"), lit(shards.toLong)))
      .withColumn("pos",
        row_number().over(
          Window.partitionBy("shard").orderBy(col("h"), col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  /** `((key mod p) · m + (seed mod p)) mod p`, p = 1e9+7, with the
    * MULTIPLIER seed-derived: `m = (seed · 2654435761) mod (p−1) + 1`.
    * The seed must enter multiplicatively — an additive-only seed
    * (`k·c + seed mod p`) shifts every hash by the same constant, so
    * "different seed" merely relabels shards with within-shard relative
    * order preserved. Here m ∈ [1, p−1] and p is prime, so each seed
    * picks a distinct bijection of the residues and epoch-to-epoch
    * relative order genuinely changes (pinned by CurationSpec's
    * discordant-pair test). m is computed exactly on the driver via
    * BigInt (no Long overflow for any seed); per-row intermediates are
    * bounded by (p−1)² ≈ 1.0e18 < 2⁶³, exact in any BIGINT engine —
    * the oracle replays the permutation from (doc_id, seed) alone. */
  private[ops] def shuffleHash(key: Column, seed: Long): Column = {
    val p = 1000000007L
    val m = (BigInt(seed) * 2654435761L).mod(BigInt(p - 1)).toLong + 1
    pmod(pmod(key, lit(p)) * lit(m) + lit(Math.floorMod(seed, p)), lit(p))
  }

  /** EXT53 — PER-SOURCE DOCUMENT CAPS (the CommonCrawl "domain cap"
    * staple: no single domain/source may dominate the corpus): keep at
    * most `maxPerGroup` documents per source, chosen by the caller's
    * preference order (the registered lane prefers longer documents,
    * doc_id breaking ties — any deterministic quality order plugs in).
    *
    * Scale shape: the rank ≤ N filter adjacent to the per-source
    * row_number makes Catalyst plan a WindowGroupLimit PAIR — a
    * PARTIAL top-N per input partition BEFORE the shuffle, then the
    * final top-N after — so each partition ships at most N rows per
    * source it touches, never a mega-domain's full membership. That is
    * the property that lets the cap run over a lake where one domain
    * is 10% of the corpus (asserted on the executed plan in
    * CurationSpec). */
  def sourceCap(
      docs: DataFrame,
      maxPerGroup: Int,
      order: Seq[Column] = Seq(col("n_chars").desc, col("doc_id"))): DataFrame = {
    require(maxPerGroup >= 1, s"cap must be >= 1: $maxPerGroup")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(order: _*)
    docs
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= maxPerGroup)
      .select("source", "doc_id", "rk")
  }
}
