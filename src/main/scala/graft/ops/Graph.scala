package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge lists.
  *
  * The engine already has the *propagation* half of distributed graph
  * processing (Dedup.connectedComponents — label propagation with
  * iterated doubling); this adds the *numeric* half: PageRank by power
  * iteration, the canonical "joins-as-message-passing" Spark workload.
  *
  * Design for 100 TB: edges are the only data-scale frame and they are
  * persisted ONCE with the source out-degree pre-attached, so each
  * iteration is exactly one keyed join (ranks ⋈ edges on src — both
  * sides hash-partitioned on the same key, no re-scan of the raw fact
  * tables) plus one map-side-combinable groupBy(dst). Rank state is one
  * row per node. The per-iteration lineage is truncated with
  * localCheckpoint (same rule as connectedComponents) so k iterations
  * never stack k plans. Node count N is a single scalar driver agg
  * (metadata-bounded). No windows, no driver row traffic.
  */
object GraphOps {

  /** PageRank by fixed-k power iteration.
    *
    * edges: (src, dst) directed edge list; parallel duplicates are the
    * caller's choice (each contributes). Every node must appear as a
    * `src` at least once (callers with dangling nodes symmetrize or
    * pre-filter — the registered lane uses a symmetrized bipartite
    * graph where this holds by construction).
    *
    * r₀(v) = 1/N;  rᵢ₊₁(v) = (1−d)/N + d · Σ_{u→v} rᵢ(u)/deg(u)
    *
    * Returns (node, rank) with rank unrounded (callers round once for
    * cross-engine hash parity).
    */
  def pageRank(edges: DataFrame, iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val deg = edges.groupBy("src").agg(count(lit(1)).as("__deg"))
    // Co-key edges with out-degrees and HASH-PARTITION BY src before
    // persisting: the persisted partitioning satisfies the join's
    // distribution requirement in every iteration, so the data-scale
    // edge frame crosses the wire ONCE for k iterations — only the
    // node-scale rank frame shuffles per step. (Broadcasting ranks
    // would be faster at test SF but is not the 100 TB shape: node
    // count grows with the graph.)
    val withDeg = edges.join(deg, "src").repartition(col("src")).persist()
    val nodes = withDeg.select(col("src").as("node")).distinct().persist()
    val n = nodes.count() // scalar, metadata-bounded
    val teleport = (1.0 - damping) / n

    var ranks = nodes.withColumn("rank", lit(1.0 / n)).localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val contribs = withDeg
        .join(ranks, withDeg("src") === ranks("node"))
        .select(col("dst"), (col("rank") / col("__deg")).as("__c"))
        .groupBy("dst")
        .agg(sum("__c").as("__m"))
      ranks = nodes
        .join(contribs, nodes("node") === contribs("dst"), "left")
        .select(col("node"),
          (lit(teleport) + lit(damping) * coalesce(col("__m"), lit(0.0))).as("rank"))
        .localCheckpoint(true)
    }
    withDeg.unpersist()
    nodes.unpersist()
    ranks
  }
}
