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
  /** Triangle listing by degree-ordered orientation (the MapReduce
    * node-iterator++ shape: Suri & Vassilvitskii 2011, "Counting
    * triangles and the curse of the last reducer").
    *
    * `edges`: undirected edge list as (a, b) BIGINT node pairs — any
    * orientation, parallel duplicates and self-loops tolerated (deduped
    * / dropped here). Returns one row per triangle as the sorted triple
    * (n1 < n2 < n3) — all-integer, hash-exact.
    *
    * Why orientation matters at 100 TB: the naive wedge join pairs ALL
    * neighbors of every node — a hub with d neighbors costs C(d, 2)
    * wedges (quadratic in the hottest key, the "last reducer"). Orienting
    * every edge from its lower endpoint to its higher endpoint under the
    * TOTAL order (degree, node) caps out-degree at O(√m), so wedge volume
    * is Σ_v C(outdeg(v), 2) = O(m^1.5) worst case and far less on real
    * skewed graphs — the hub's C(d,2) disappears because a hub (highest
    * degree) has out-degree ~0. Every triangle keeps exactly ONE node
    * with two out-edges (the orientation is acyclic), so each is listed
    * exactly once, no post-dedup. Three keyed shuffles total (degree agg,
    * wedge self-join, closing-edge semi-join); no windows, no driver row
    * traffic. */
  def triangles(edges: DataFrame): DataFrame = {
    // canonical undirected set: u < v, distinct (drops self-loops/dups)
    val e = canonicalEdges(edges).persist()
    val out = trianglesCanonical(e, degrees(e))
    e.unpersist()
    out
  }

  /** Canonical undirected edge set: (u, v) with u < v, distinct —
    * drops self-loops and parallel duplicates. One shuffle (the
    * distinct). Shared by [[triangles]] and [[clusteringCoefficient]]
    * so the composition never re-shuffles the data-scale edge frame. */
  private def canonicalEdges(edges: DataFrame): DataFrame =
    edges.select(
        least(col(edges.columns(0)), col(edges.columns(1))).as("u"),
        greatest(col(edges.columns(0)), col(edges.columns(1))).as("v"))
      .filter(col("u") < col("v")).distinct()

  /** Undirected degree per node over a canonical edge set: (n, d). */
  private def degrees(e: DataFrame): DataFrame =
    e.select(col("u").as("n")).union(e.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))

  /** The orientation + wedge + close core of [[triangles]], taking the
    * already-canonical edge set (persisted by the caller) and its
    * degree frame — the seam that lets clusteringCoefficient reuse
    * both instead of paying the distinct and the degree agg twice.
    * Returns a localCheckpoint'd frame (safe to unpersist inputs). */
  private def trianglesCanonical(e: DataFrame, deg: DataFrame): DataFrame = {
    import org.apache.spark.sql.Column
    val lowFirst: Column = // (deg, node) total order: u is the lower endpoint
      col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v"))
    val oriented = e
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
      .select(
        when(lowFirst, col("u")).otherwise(col("v")).as("src"),
        when(lowFirst, col("v")).otherwise(col("u")).as("dst"))
      .persist()
    // wedges: pairs of out-neighbors of one source, id-ordered so the
    // candidate closing edge (x, y) is already canonical (x < y)
    val wedges = oriented.as("o1")
      .join(oriented.as("o2"),
        col("o1.src") === col("o2.src") && col("o1.dst") < col("o2.dst"))
      .select(col("o1.src").as("w"), col("o1.dst").as("x"), col("o2.dst").as("y"))
    val tri = wedges
      .join(e, col("x") === col("u") && col("y") === col("v"), "left_semi")
      .select(
        least(col("w"), col("x"), col("y")).as("n1"),
        // middle element via sort, not w+x+y−least−greatest: the
        // intermediate sum overflows Long for ids above ~MaxValue/3
        sort_array(array(col("w"), col("x"), col("y"))).getItem(1).as("n2"),
        greatest(col("w"), col("x"), col("y")).as("n3"))
    val out = tri.localCheckpoint(true) // materialize before unpersist
    oriented.unpersist()
    out
  }

  /** LOCAL CLUSTERING COEFFICIENT per node (Watts & Strogatz 1998):
    * c(v) = 2·t(v) / (d(v)·(d(v)−1)) — the fraction of a node's
    * neighbor pairs that are themselves connected. Composes
    * [[triangles]] (each listed triangle credits its three corners via
    * one explode + combinable count) with a degree agg over the same
    * canonical edge set. d < 2 nodes surface NULL, not 0 — a 0 claims
    * an OPEN neighborhood, NULL says there is no pair to close. The
    * coefficient is one division of exact BIGINTs (IEEE-identical in
    * any engine); rounding is the caller's choice. Returns
    * (node, degree, n_tri, coeff). */
  def clusteringCoefficient(edges: DataFrame): DataFrame = {
    // ONE canonical distinct + ONE degree agg, shared between the
    // orientation (inside trianglesCanonical) and the output degree
    // column — composing via the public triangles() would re-shuffle
    // the data-scale edge frame twice (re-distinct + re-degree), pure
    // waste at 100 TB (VERDICT r12 #4).
    val e = canonicalEdges(edges).persist()
    val deg = degrees(e).persist()
    val tcnt = trianglesCanonical(e, deg)
      .select(explode(array(col("n1"), col("n2"), col("n3"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    val out = deg.select(col("n").as("node"), col("d").as("degree"))
      .join(tcnt, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(col("degree") >= 2L,
          lit(2.0) * coalesce(col("n_tri"), lit(0L))
            / (col("degree") * (col("degree") - 1L))).as("coeff"))
      .localCheckpoint(true) // materialize before unpersisting inputs
    e.unpersist(); deg.unpersist()
    out
  }

  /** Community detection by synchronized label propagation (Raghavan et
    * al. 2007), k fixed iterations, fully deterministic.
    *
    * `edges`: SYMMETRIZED directed edge list (src, dst) over BIGINT
    * nodes — both directions present, so every node receives messages.
    * Label(v, 0) = v; each round every node adopts the most frequent
    * label among its in-neighbors, ties broken by SMALLEST label — the
    * synchronized update with a total-order tie-break that makes k
    * rounds a pure function of the graph (asynchronous/random-order
    * LPA, the paper's default, is irreproducible by design and useless
    * under a cross-engine oracle).
    *
    * Relationship to the engine's other graph ops: connectedComponents
    * propagates the MIN label to convergence (community = reachability);
    * this propagates the MODAL label k steps (community = local edge
    * density) — the clustering signal reachability cannot see, since one
    * bridge edge merges two dense clusters into a single component.
    *
    * Design for 100 TB: the edge frame is hash-partitioned on src and
    * persisted ONCE (the pageRank rule); each iteration is one keyed
    * join (labels ⋈ edges on src) + one map-side-combinable
    * groupBy(dst, lbl) count + one argmax agg — the argmax is
    * max(struct(count, −label)), a single combinable aggregate, never a
    * global window. localCheckpoint truncates the iterated lineage. No
    * driver row traffic at any point.
    */
  def labelPropagation(edges: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = edges.select(col(edges.columns(0)).as("src"), col(edges.columns(1)).as("dst"))
      .repartition(col("src")).persist()
    // r18 measurement note: lazy per-iteration checkpoints (the r17
    // connectedComponents trick — defer each round's result-stage job
    // into the next round's lineage, eager only on the final frame) were
    // tried here and in pageRank and REVERTED: same-window min-of-5 read
    // an26 3.56 → 4.22 s (+18%) and an20 3.25 → 3.49 s (+7%) while two
    // untouched controls moved ≤ +2%/+13%. Unlike connectedComponents,
    // these loops have no per-round action for the deferred stage to
    // fold into — the deferred result stage re-enters the NEXT round's
    // join planning as an unsized leaf, and the join strategy
    // degrades. Eager per-iteration checkpoints are load-bearing here.
    var labels = e.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node")).localCheckpoint(true)
    for (_ <- 1 to iterations) {
      // SHUFFLE_HASH on the node-scale labels side (r18, guide §3.1):
      // the checkpointed labels frame is an unsized leaf, so the
      // planner fell back to SortMergeJoin — which re-SORTED the
      // persisted data-scale edge frame every iteration. Hash-building
      // the small side keeps e streamed in its persisted layout (no
      // sort, no exchange) without broadcasting (node count grows with
      // the graph — broadcast is not the 100 TB shape; the build side
      // here is node-scale per partition, which is what shuffled-hash
      // is for).
      val cnts = e.join(labels.hint("SHUFFLE_HASH"), e("src") === labels("node"))
        .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("c"))
      labels = cnts
        .groupBy("dst")
        .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("m"))
        .select(col("dst").as("node"), (-col("m.nl")).as("lbl"))
        .localCheckpoint(true)
    }
    e.unpersist()
    labels
  }

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

    // r17 measurement note: a variant that replaced this per-iteration
    // left join with `contribs UNION precomputed-no-inbound-nodes` was
    // tried and REVERTED — the one-time distinct-dst anti-join it needs
    // is a full extra pass over the edge frame, which at k = 3 costs
    // more than the three node-scale left joins it removes (+0.5 s
    // min-of-5 on an20 at sf0.1; AQE broadcasts the node-scale contribs
    // side anyway, so the join it deleted was nearly free). At k ≫ 3
    // the union shape wins; revisit if an iterations-heavy caller lands.
    // r18: lazy per-iteration checkpoints tried and REVERTED — see the
    // measurement note in labelPropagation (an20 read +7% same-window;
    // no per-round action exists for the deferred stage to fold into).
    var ranks = nodes.withColumn("rank", lit(1.0 / n)).localCheckpoint(true)
    for (_ <- 1 to iterations) {
      // SHUFFLE_HASH on the node-scale sides (r18) — same rationale as
      // labelPropagation: the checkpointed ranks frame is an unsized
      // leaf, and a SortMergeJoin against it re-sorts the persisted
      // edge frame every iteration.
      val contribs = withDeg
        .join(ranks.hint("SHUFFLE_HASH"), withDeg("src") === ranks("node"))
        .select(col("dst"), (col("rank") / col("__deg")).as("__c"))
        .groupBy("dst")
        .agg(sum("__c").as("__m"))
      ranks = nodes
        .join(contribs.hint("SHUFFLE_HASH"), nodes("node") === contribs("dst"), "left")
        .select(col("node"),
          (lit(teleport) + lit(damping) * coalesce(col("__m"), lit(0.0))).as("rank"))
        .localCheckpoint(true)
    }
    withDeg.unpersist()
    nodes.unpersist()
    ranks
  }
}
