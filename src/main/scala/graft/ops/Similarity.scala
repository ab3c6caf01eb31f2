package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXT3 — vector similarity search over `embeddings` (array<float>, dim 64).
  *
  * Cosine is computed with higher-order functions (`zip_with` + `aggregate`
  * fold) in double precision — codegen-friendly, no UDF, and the sequential
  * left-to-right fold makes the result bit-identical to the DuckDB oracle's
  * `list_dot_product` over DOUBLE[] (both sum in input order).
  *
  * Scale paths:
  *  - [[topK]] broadcasts the (small) query set against the full corpus —
  *    the right plan when |queries| ≪ |corpus| (the common ANN-serving
  *    shape). Cost O(|Q|·|C|) but embarrassingly parallel over corpus
  *    partitions; no shuffle except the final per-query top-k.
  *  - [[topKBlocked]] is the IVF-style path: a coarse partitioner (here the
  *    fixture's `label`; in production a trained quantizer) restricts each
  *    query to its cell, cutting the scanned corpus by the cell count.
  *  - [[nearDupPairs]] — all-pairs ≥ threshold, blocked by label so the
  *    quadratic term is per-cell, not global.
  */
object Similarity {

  /** Double-precision dot product of two float-array columns — the native
    * codegen'd expression (functions/DotProduct.scala). */
  def dot(a: Column, b: Column): Column = graft.functions.GraftExtensions.dot(a, b)

  /** The same semantics in built-in higher-order functions. Kept as the
    * cross-check for the native expression (same IEEE result, verified in
    * tests) and as the fallback for sessions without graft registration —
    * but CodegenFallback-interpreted, ~3× slower in the pair join. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Queries = rows with `vec_id % queryMod == 0` (deterministic, valid at
    * any SF); corpus = everything. Top-k by cosine per query, self-match
    * excluded, vec_id tie-break. Norms are precomputed per row BEFORE the
    * pair join — computed inside it they would be re-derived per pair
    * (|Q|× for the corpus side), and the fold is interpreted
    * (CodegenFallback), so that costs real time. */
  def topK(embeddings: DataFrame, k: Int = 10, queryMod: Int = 50): DataFrame = {
    val corpus = embeddings
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    val q = corpus
      .filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val scored = corpus
      .join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("sim", dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")))
    scored
      .withColumn("rk",
        row_number().over(Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id"))).cast("long"))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("vec_id"), col("rk"), graft.Num.rnd(col("sim"), 6).as("sim"))
  }

  /** IVF-style blocked top-k: each query only scans its own coarse cell
    * (fixture `label` stands in for the quantizer assignment). */
  def topKBlocked(embeddings: DataFrame, k: Int = 5, queryMod: Int = 50): DataFrame = {
    val corpus = embeddings
      .select(col("vec_id"), col("label"), col("embedding"), norm(col("embedding")).as("nrm"))
    val q = corpus
      .filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    corpus
      .join(broadcast(q), col("label") === col("q_label") && col("vec_id") =!= col("q_id"))
      .withColumn("sim", dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")))
      .withColumn("rk",
        row_number().over(Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id"))).cast("long"))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("vec_id"), col("rk"), graft.Num.rnd(col("sim"), 6).as("sim"))
  }

  /** Embedding-cosine near-dup pairs (EXT2's vector flavor): pairs with
    * cosine ≥ threshold, label-blocked so the pair join is per-cell. */
  def nearDupPairs(embeddings: DataFrame, threshold: Double = 0.95): DataFrame = {
    val e = embeddings
      .select(col("vec_id"), col("label"), col("embedding"), norm(col("embedding")).as("nrm"))
    e.alias("a")
      .join(e.alias("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("sim",
        dot(col("a.embedding"), col("b.embedding")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("sim") >= threshold)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        graft.Num.rnd(col("sim"), 6).as("sim"))
  }
}
