package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text retrieval: BM25 ranking of documents against a keyword
  * query set — the search-engine scoring half of a data platform (the
  * ANN lanes cover the embedding half).
  *
  * Okapi BM25 (Robertson & Walker 1994; the Lucene-shape idf):
  *
  *   idf(t)      = ln(1 + (N − df + 0.5)/(df + 0.5))
  *   score(q, d) = Σ_{t∈q} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *
  * Design for 100 TB: the corpus is touched exactly twice — one
  * tokenize pass feeding a map-side-combinable (doc, term) tf groupBy,
  * one doc-length projection — and the tf table is immediately
  * SEMI-RESTRICTED to query terms by a broadcast join (the query set is
  * always human-scale), so df aggregation, scoring joins and the final
  * ranking all run on posting lists of the query vocabulary, never the
  * corpus vocabulary. Corpus-level stats (N, avgdl) are one scalar agg
  * row to the driver, re-entering the plan as literals. The only
  * window partitions by query_id over each query's CANDIDATE set
  * (docs sharing ≥1 query term) — bounded by posting-list size, the
  * usual IR working set; a per-query TakeOrdered variant would be the
  * next step if a query ever matched most of the lake.
  */
object Retrieval {

  /** Rank `docs` (doc_id, text) against `queries` (query_id, term) —
    * multi-row per query — returning the top `topK` docs per query as
    * (query_id, doc_id, rank, score), score unrounded.
    *
    * Tokenization is the engine-wide space-split default (ext47's
    * oracle-paired form); callers with a different segmentation pass
    * pre-split text through the `tok` seam. */
  def bm25(
      docs: DataFrame,
      queries: DataFrame,
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 5,
      tok: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        c => split(c, " ")): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(tok(col("text"))).as("term"))
    val dl = docs.select(col("doc_id"), size(tok(col("text"))).cast("long").as("dl"))
    // Corpus stats are ONE scalar aggregate row to the driver (the
    // metadata-bounded collect contract) and re-enter the plan as
    // literals — a 1-row cross join would plan a nested-loop join node,
    // which the engine bans categorically (PlanAuditSpec).
    val st = dl.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl")).head()
    val (nDocs, avgdl) = (st.getLong(0), st.getDouble(1))

    // One corpus-scale shuffle; then the broadcast semi-restriction to
    // query vocabulary makes everything downstream posting-list-sized.
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val rtf = tf.join(broadcast(queries), "term")
    val df = rtf.groupBy("term").agg(count_distinct(col("doc_id")).as("df"))

    val termScore =
      log(lit(1.0) + (lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
        (col("tf") * (lit(k1) + lit(1.0))) /
        (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgdl)))

    val scored = rtf
      .join(broadcast(df), "term")
      .join(dl, "doc_id")
      .select(col("query_id"), col("doc_id"), termScore.as("__ts"))
      .groupBy("query_id", "doc_id")
      .agg(sum("__ts").as("score"))

    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select("query_id", "doc_id", "rank", "score")
  }
}
