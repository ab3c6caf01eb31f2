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

  /** The shared top-k tail of every search path: rank scored (q_id,
    * vec_id, sim) pairs per query — sim descending, vec_id tie-break —
    * keep the best k, round sim for oracle parity. ONE definition so the
    * tie-break, the BIGINT rank cast, and the 6-dp rounding (all
    * oracle-relevant) cannot drift between the four search variants. */
  private[ops] def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored
      .withColumn("rk",
        row_number().over(Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id"))).cast("long"))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("vec_id"), col("rk"), graft.Num.rnd(col("sim"), 6).as("sim"))

  /** (vec_id, embedding, nrm) — the scored-corpus shape every search
    * variant starts from. */
  private def prepCorpus(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))

  /** Caller query frame → (q_id, q_emb, q_nrm). The contract for every
    * caller-supplied overload: `queries` carries `vec_id` + `embedding`
    * (extra columns ignored); rows whose vec_id appears in the corpus are
    * excluded from their own result (self-match rule). */
  private[ops] def prepQueries(queries: DataFrame): DataFrame =
    queries.select(
      col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      norm(col("embedding")).as("q_nrm"))

  /** Queries = rows with `vec_id % queryMod == 0` (deterministic, valid at
    * any SF); corpus = everything. Top-k by cosine per query, self-match
    * excluded, vec_id tie-break. NOTE the fixture filter makes |Q| grow
    * linearly with the corpus — fine for the oracle rows, wrong for
    * production serving; pass an explicit query frame (the overload below)
    * to keep the broadcast side sized to the actual query workload. */
  def topK(embeddings: DataFrame, k: Int = 10, queryMod: Int = 50): DataFrame =
    topK(embeddings, embeddings.filter(col("vec_id") % queryMod === 0), k)

  /** Caller-supplied query set (columns `vec_id`, `embedding`): top-k by
    * cosine per query over the corpus. The query side is broadcast — the
    * |Q| ≪ |C| serving shape — so it must stay driver-broadcastable;
    * norms are precomputed per row BEFORE the pair join (computed inside
    * it they would be re-derived per pair, |Q|× for the corpus side). */
  def topK(embeddings: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val corpus = prepCorpus(embeddings)
    rankTopK(
      corpus
        .join(broadcast(prepQueries(queries)), col("vec_id") =!= col("q_id"))
        .withColumn("sim", dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm"))),
      k)
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
    rankTopK(
      corpus
        .join(broadcast(q), col("label") === col("q_label") && col("vec_id") =!= col("q_id"))
        .withColumn("sim", dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm"))),
      k)
  }

  /** Sign-random-projection LSH top-k — the hash-bucketed ANN scale path
    * (complementing the IVF-style [[topKBlocked]]). `tables` independent
    * hash tables of `planes`-bit keys; a vector's key in table t is the
    * sign pattern of its projections onto `planes` fixed hyperplanes.
    * Hyperplane components are deterministic pseudo-random values derived
    * from (table, plane, dim) — reproducible across runs and engines, no
    * RNG state. Candidates = corpus rows sharing any table's bucket with
    * the query, re-scored exactly, top-k per query. Recall is tunable via
    * (planes, tables): fewer planes ⇒ bigger buckets ⇒ higher recall and
    * cost. Returns ≤ k rows per query (fewer when a bucket is sparse) —
    * the standard ANN contract. `probeBits` adds query-side multi-probe
    * (see the inline note) — fixture recall@10 by probeBits: 0 → 0.88,
    * 1 → 0.99, ≥2 → 1.00; the cost is (1+probeBits)× the broadcast probe
    * rows only.
    *
    * Tuning for scale: 4 planes = 16 buckets/table, which filters hard
    * only when |Q| is small. This fixture's true neighbors are weak
    * (top-10 cosine ≈ 0.5), the regime where NO hash family can filter
    * aggressively and keep recall — hence the coarse default. A
    * production near-dup index (neighbors at cosine ≥ 0.9) should raise
    * `planes` to 12–16 (4 k–65 k buckets/table) and lean on `probeBits`
    * for recall: per-plane agreement is ~0.9 there, so 16 planes still
    * collide at ~19% per table while random pairs drop to 2⁻¹⁶. */
  def topKLsh(
      embeddings: DataFrame,
      k: Int = 10,
      queryMod: Int = 50,
      planes: Int = 4,
      tables: Int = 16,
      dim: Int = 64,
      probeBits: Int = 4): DataFrame =
    topKLsh(embeddings, embeddings.filter(col("vec_id") % queryMod === 0),
      k, planes, tables, dim, probeBits)

  /** [[topKLsh]] with a caller-supplied query frame (columns `vec_id`,
    * `embedding`) — same contract as the [[topK]] overload: the query
    * side (keys × tables × (1+probeBits) probe rows) is the broadcast
    * side and must stay small; the corpus side is untouched by probing. */
  def topKLsh(
      embeddings: DataFrame,
      queries: DataFrame,
      k: Int,
      planes: Int,
      tables: Int,
      dim: Int,
      probeBits: Int): DataFrame = {
    require(probeBits >= 0 && probeBits <= planes, "probeBits in [0, planes]")
    val planesFlat = planeMatrix(tables, planes, dim)
    def allKeys(emb: Column): Column = bucketKeys(emb, planesFlat, tables, planes)

    val corpus = prepCorpus(embeddings)
    val q = prepQueries(queries)

    // Multi-probe (query side only): materialize each table's base key
    // once, THEN explode the probe set from the materialized column — the
    // probe keys are one xor each, not a re-derivation of the projection
    // sums. A near-miss on one hyperplane (the dominant LSH failure mode:
    // the true neighbor sits just across a single plane) still collides
    // on the flipped key. Recall@10 on the fixture: 0.88 unprobed → 1.00
    // at probeBits = 4; the corpus side — the big side — is untouched.
    val qKeyed = q.select(col("q_id"), col("q_emb"), col("q_nrm"),
      posexplode(allKeys(col("q_emb"))).as(Seq("table_id", "base_bucket")))
    val probeSet = col("base_bucket") +:
      (0 until probeBits).map(p => col("base_bucket").bitwiseXOR(lit(1L << p)))
    val qB = qKeyed
      .select(col("q_id"), col("q_emb"), col("q_nrm"), col("table_id"),
        explode(array(probeSet: _*)).as("bucket"))
    val cB = corpus.select(col("vec_id"), col("embedding"), col("nrm"),
      posexplode(allKeys(col("embedding"))).as(Seq("table_id", "bucket")))

    // Score BEFORE the cross-table dedup: a candidate pair surfaces once
    // per colliding (table, probe), and deduping first would drag both
    // 64-float embedding arrays through the dropDuplicates shuffle
    // (~0.5 KB/row) only to protect a 64-mul-add dot product that
    // codegen does in nanoseconds. Scoring in the join projection and
    // shuffling the narrow (q_id, vec_id, sim) triple cuts the exchange
    // ~20× — duplicates carry identical sims, so the dedup result is
    // unchanged.
    rankTopK(
      cB.join(broadcast(qB), Seq("table_id", "bucket"))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("sim", dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")))
        .select("q_id", "vec_id", "sim")
        .dropDuplicates("q_id", "vec_id"),
      k)
  }

  /** Deterministic random-hyperplane matrix for sign-LSH, flattened to
    * ONE float[] literal: component (t, p, d) from a splitmix-style mix
    * in [−1, 1]. All bucket keys then come from ONE expression
    * (graft_lsh_keys): the per-table composition of graft_dot calls —
    * 64 inlined dim-64 loops in one codegen method — compiled fine but
    * was too big to JIT, so it ran as cold interpreter-grade code (the
    * element_at form before it was worse still: a 4 096-node tree past
    * codegen's method-size limits, 36 s at sf0.1; the composed-dot form
    * ~6 s; this form: the whole lane in well under a second, the kernel
    * finally JITs). The plane matrix is one flat float[] reference
    * object; accumulation order matches graft_dot bit-for-bit, so the
    * keys are reproducible across runs and engines. */
  private def planeMatrix(tables: Int, planes: Int, dim: Int): Column = {
    def component(t: Int, p: Int, d: Int): Float = {
      var z = t.toLong * 1000003L + p.toLong * 1009L + d.toLong + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      (z.toDouble / Long.MaxValue.toDouble).toFloat // in [-1, 1]
    }
    typedLit(
      (0 until tables).flatMap(t => (0 until planes).flatMap(p =>
        (0 until dim).map(d => component(t, p, d)))).toArray)
  }

  /** Per-table sign-LSH bucket keys (array of `tables` longs, table t's
    * key = the `planes` sign bits of the projections onto its planes). */
  private def bucketKeys(emb: Column, planesFlat: Column, tables: Int, planes: Int): Column =
    graft.functions.GraftExtensions.lshKeys(emb, planesFlat, lit(tables), lit(planes))

  /** Embedding near-dup pairs via banded sign-LSH (Charikar 2002 random
    * hyperplanes) — the 100×-scale path where the trained-IVF variant
    * ([[nearDupPairsIvf]]) is structurally quadratic: on a corpus with no
    * cluster structure, IVF cell populations grow linearly with n at
    * fixed nCells, so within-cell pairs grow n² (measured: the sf10
    * century corpus, 2.2 M vectors, spilled > 70 GB and DNF'd — the
    * same lesson as MinHash-LSH's m=1 banding, BASELINE.md round-8
    * century). Sign-LSH bounds candidates by collision PROBABILITY
    * instead of cell population: a pair at angle θ collides in a table
    * with (1 − θ/π)^planes, so background pairs (θ ≈ π/2) arrive at
    * rate tables · C(n,2) / 2^planes — planes = 24 keeps that
    * sub-linear past 10⁷ vectors — while EXACT duplicates (θ = 0, the
    * planted oracle structure, and the overwhelming real-world shape at
    * threshold 0.95) collide in EVERY table: recall 1.0 structurally,
    * not probabilistically. Genuine-but-inexact 0.95-neighbors collide
    * per table at 0.9^planes; raise `tables` (recall 1−(1−0.9^p)^t) or
    * lower `planes` to trade candidate volume for tail recall — the
    * knob doc mirrors Dedup.minhashLshPairs.
    *
    * Plan shape: bucket keys are one codegen'd kernel over the corpus
    * (n·tables narrow (vec_id, table, bucket) rows — embeddings do NOT
    * ride the candidate join); candidates come from the (table, bucket)
    * equi-self-join, dedup to distinct pairs, then exactly TWO keyed
    * joins pull the embeddings back for the exact cosine re-verify. The
    * output is exact at the threshold over the surfaced candidates —
    * same contract as every other near-dup lane.
    *
    * USER-FACING RECALL CONTRACT (not just a knob note): exact
    * duplicates (θ = 0) are found with recall 1.0 — they collide in
    * every table. A GENUINE-BUT-INEXACT neighbor at per-table collision
    * probability q = (1 − θ/π)^planes is surfaced with probability
    * 1 − (1 − q)^tables ([[signLshPairRecall]]); at the defaults
    * (planes = 24, tables = 8) a cosine-0.95 pair (θ ≈ 0.318 rad,
    * q ≈ 0.9^24) is found with probability ≈ 0.49. The defaults are
    * tuned for the dominant web-corpus shape — exact/near-exact copies
    * — while keeping background candidates at tables·C(n,2)/2^planes.
    * A SemDeDup-style run that needs tail recall on inexact semantic
    * neighbors should LOWER `planes` / RAISE `tables` (e.g. planes=16,
    * tables=16 → recall ≈ 0.96 at cosine 0.95) and accept the larger
    * candidate volume.
    *
    * HOT-BUCKET GUARD (the [[Dedup.minhashLshPairs]] twin): a (table,
    * bucket) holding B vectors emits O(B²) candidates from the
    * self-join, and a real crawl's mega duplicate CLUSTER (10⁵ copies
    * of an error page) collides into ONE bucket per table — C(10⁵,2)
    * ≈ 5·10⁹ pairs × `tables`, the same class of blow-up that DNF'd
    * the IVF variant at sf10. Buckets larger than `maxBucket` are
    * dropped BEFORE the self-join; dropped buckets are observable via
    * [[oversizedEmbeddingBuckets]] — run it whenever the guard may
    * have fired. An exact-duplicate cluster bigger than `maxBucket`
    * is oversized in EVERY table (it collides everywhere), so its
    * pairs are not surfaced — exact duplicates should be removed by
    * hash-dedup BEFORE semantic dedup (the [[Dedup.keepFirst]] pass),
    * exactly as on the MinHash path. */
  def nearDupPairsLsh(
      embeddings: DataFrame,
      threshold: Double = 0.95,
      planes: Int = 24,
      tables: Int = 8,
      dim: Int = 64,
      maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame = {
    require(planes >= 1 && planes <= 63, "planes in [1, 63] (bucket key is one long)")
    val e = prepCorpus(embeddings)
    val planesFlat = planeMatrix(tables, planes, dim)
    // the bucket count is a window over exactly the self-join keys, so
    // its sort/exchange is the one the sort-merge join needs anyway,
    // and both aliases of the guarded frame share it (ReusedExchange)
    val keyed = e.select(col("vec_id"),
      posexplode(bucketKeys(col("embedding"), planesFlat, tables, planes))
        .as(Seq("table_id", "bucket")))
      .withColumn("__bucket_n",
        count(lit(1)).over(Window.partitionBy("table_id", "bucket")))
      .filter(col("__bucket_n") <= maxBucket)
      .drop("__bucket_n")
    val cand = keyed.alias("a")
      .join(keyed.alias("b"),
        col("a.table_id") === col("b.table_id") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .dropDuplicates("vec_a", "vec_b")
    cand
      .join(e.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"),
        col("nrm").as("nrm_a")), Seq("vec_a"))
      .join(e.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"),
        col("nrm").as("nrm_b")), Seq("vec_b"))
      .withColumn("sim", dot(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")))
      .filter(col("sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), graft.Num.rnd(col("sim"), 6).as("sim"))
  }

  /** Diagnostic twin of the hot-bucket guard in [[nearDupPairsLsh]]
    * (mirrors [[Dedup.oversizedBuckets]]): the (table_id, bucket,
    * bucket_n) sign-LSH buckets that exceed `maxBucket` and were
    * therefore excluded from candidate generation. Empty ⇒ the guard
    * changed nothing; a non-empty result on a hash-deduped corpus means
    * a NEAR-exact mega cluster — handle it upstream (cluster-level
    * dedup) rather than raising the cap into quadratic territory. */
  def oversizedEmbeddingBuckets(
      embeddings: DataFrame,
      planes: Int = 24,
      tables: Int = 8,
      dim: Int = 64,
      maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame = {
    require(planes >= 1 && planes <= 63, "planes in [1, 63] (bucket key is one long)")
    val planesFlat = planeMatrix(tables, planes, dim)
    prepCorpus(embeddings)
      .select(col("vec_id"),
        posexplode(bucketKeys(col("embedding"), planesFlat, tables, planes))
          .as(Seq("table_id", "bucket")))
      .groupBy("table_id", "bucket")
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > maxBucket)
  }

  /** The probability [[nearDupPairsLsh]] surfaces a pair whose per-table
    * collision probability is q = (1 − θ/π)^planes: 1 − (1 − q)^tables.
    * Pure arithmetic, exposed so a caller can size (planes, tables) for
    * the tail recall its corpus needs instead of trusting defaults. */
  def signLshPairRecall(cosine: Double, planes: Int, tables: Int): Double = {
    require(cosine >= -1.0 && cosine <= 1.0, "cosine in [-1, 1]")
    val q = math.pow(1.0 - math.acos(cosine) / math.Pi, planes.toDouble)
    1.0 - math.pow(1.0 - q, tables.toDouble)
  }

  /** EXT40 — CLUSTER-BALANCED subsampling: assign every vector to its
    * nearest cell under a FROZEN quantizer, then keep a deterministic
    * per-cell quota — the diversity-preserving selection a curation
    * pipeline runs after dedup (SemDeDup-adjacent: where semantic dedup
    * removes redundancy WITHIN neighborhoods, cluster-balanced
    * selection stops a dominant mode from crowding the budget — a
    * uniform random cut keeps the corpus's mode imbalance; a per-cell
    * quota flattens it).
    *
    * The quantizer here is frozen by construction — the embeddings of
    * the k smallest vec_ids, no Lloyd iteration — so membership is a
    * pure deterministic function of the corpus and the whole operator
    * replays in ANY engine (the oracle recomputes assignment from the
    * same k seed vectors; a TRAINED quantizer drops in through the
    * same [[assignCell]] seam, trading oracle-exactness for centroid
    * quality, exactly the [[topKBlocked]] vs [[topKIvf]] relationship).
    * Scoring ties break to the lower cell id on both engines.
    *
    * Per-cell order is the seeded permutation pmod(vec_id·40503, 2²⁰)
    * (the EXT30 shuffle key — NOT raw vec_id, which would bias the
    * sample toward early crawl order), quota selection is a row_number
    * window PARTITIONED BY cell — keyed, the [[Sampling.stratifiedHead]]
    * shape. Centroids ride as literals: k·dim floats, model-bounded. */
  def clusterBalancedSample(
      embeddings: DataFrame,
      k: Int = 8,
      quota: Int = 50): DataFrame = {
    require(k >= 1 && quota >= 1)
    val seeds = embeddings.orderBy("vec_id").limit(k)
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    require(seeds.length == k, s"corpus has only ${seeds.length} rows — need $k seed cells")
    clusterBalancedSample(embeddings, seeds, quota)
  }

  /** EXT40b — the TRAINED-quantizer form of [[clusterBalancedSample]]:
    * caller supplies the centroids (typically [[kmeansCentroids]], the
    * production quantizer — cells follow the corpus's actual density
    * modes instead of whatever the k lowest-id vectors happen to span).
    * Same [[assignCell]] seam, same seeded per-cell quota; the trade is
    * oracle-exactness — trained centroids depend on float summation
    * order in the Lloyd averages, so this form is verified by property
    * (quota honored, mode imbalance flattened vs a uniform cut —
    * DedupSimilaritySpec) rather than by value, exactly the
    * [[topKBlocked]] → [[topKIvf]] relationship on the sampling side.
    * The plan is identical: one pure-expression assignment pass (k
    * codegen'd kernels per row, centroids as literals), one keyed
    * quota window — no shuffle beyond the cell exchange. */
  def clusterBalancedSample(
      embeddings: DataFrame,
      centroids: Array[Array[Float]],
      quota: Int): DataFrame = {
    require(centroids.nonEmpty && quota >= 1)
    val win = Window.partitionBy("cell")
      .orderBy(pmod(col("vec_id") * 40503L, lit(1048576L)), col("vec_id"))
    embeddings
      .select(col("vec_id"), assignCell(col("embedding"), centroids).cast("long").as("cell"))
      .withColumn("__rk", row_number().over(win))
      .filter(col("__rk") <= quota)
      .select("vec_id", "cell")
  }

  /** Lloyd's k-means over the embedding column — the trained coarse
    * quantizer for the real IVF path ([[topKIvf]]; [[topKBlocked]] uses
    * the fixture's label as a stand-in). Centroids live on the driver
    * (k×dim floats — bytes, the standard k-means shape; MLlib does the
    * same), everything row-scale is distributed:
    *
    *  - assignment is a pure expression: argmin_c ‖e−c‖² = argmax_c
    *    (e·c − ‖c‖²/2), computed as `graft_dot` against each centroid
    *    LITERAL — k tight codegen'd loops per row, no UDF, no shuffle;
    *  - the update step is posexplode → groupBy(cell, dim) avg — one
    *    map-side-combinable shuffle of k×dim cells per iteration, then a
    *    k×dim collect to rebuild the literals.
    *
    * Init is deterministic — the k smallest vectors by xxhash64(vec_id),
    * a pseudo-random spread that works for ANY id domain (sparse,
    * offset, non-dense) and is a scale-safe TakeOrdered, not a global
    * sort. Training is reproducible run-to-run up to float summation
    * order in the avg (borderline points may flip cells across runs —
    * callers needing a frozen quantizer persist the centroids like any
    * model artifact). */
  def kmeansCentroids(
      embeddings: DataFrame,
      k: Int = 16,
      iters: Int = 5): Array[Array[Float]] = {
    var centroids: Array[Array[Float]] = embeddings
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(k)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    require(centroids.length == k,
      s"corpus has only ${centroids.length} rows — need at least $k for $k centroids")
    for (_ <- 0 until iters) {
      // cell materialized BELOW the explode — a single select would plan
      // the assignment in the Project above the Generate and re-score
      // all k centroids once per exploded element (see Pq.trainPq).
      val assigned = embeddings
        .select(assignCell(col("embedding"), centroids).as("cell"), col("embedding"))
        .select(col("cell"), posexplode(col("embedding")).as(Seq("d", "x")))
      val means = assigned
        .groupBy("cell", "d").agg(avg("x").as("m"))
        .collect()
      val next = centroids.map(_.clone())
      means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2).toFloat)
      centroids = next
    }
    centroids
  }

  /** All centroid scores (e·c_i − ‖c_i‖²/2) as ONE packed expression —
    * see [[graft.functions.CellScores]] for why not k composed
    * graft_dot structs (Catalyst tree size + codegen-cache misses made
    * the training loop pay ~4 s per Lloyd iteration; this form's
    * generated source is identical across iterations, so the codegen
    * cache hits and the kernel JITs). Bias replication note: the biases
    * are computed with the same left-to-right double sum as the old
    * `lit(c2 / 2.0)` literals, so scores are bit-identical. */
  private def cellScoresCol(emb: Column, centroids: Array[Array[Float]]): Column =
    graft.functions.GraftExtensions.cellScores(
      emb,
      typedLit(centroids.flatten),
      typedLit(centroids.map(c => c.map(x => x.toDouble * x.toDouble).sum / 2.0)))

  /** Nearest-centroid cell id as a pure expression (see
    * [[kmeansCentroids]] for the algebra). `array_position` takes the
    * FIRST occurrence of the max, so ties break to the lower cell id —
    * the same direction as the struct-max formulation it replaces. */
  private[ops] def assignCell(emb: Column, centroids: Array[Array[Float]]): Column = {
    val s = cellScoresCol(emb, centroids)
    (array_position(s, array_max(s)) - 1L).cast("int")
  }

  /** Per-row TOP-`nProbe` cells (for query-side multi-cell probing):
    * sort the (score, cell) structs descending and keep the best n.
    * Ties break to the LOWER cell id — the same direction as
    * [[assignCell]] (via the negated cell id: ascending sort + reverse =
    * score desc, neg_cell desc = cell asc), so with duplicate centroids
    * the first probed cell is exactly the cell corpus rows were assigned
    * to. The final `transform` un-negates — a CodegenFallback HOF, but
    * over nProbe elements on the broadcast query side only. */
  private[ops] def probeCells(emb: Column, centroids: Array[Array[Float]], nProbe: Int): Column = {
    val s = cellScoresCol(emb, centroids)
    val scored = centroids.indices.map(i =>
      struct(element_at(s, i + 1).as("score"), lit(-i).as("neg_cell")))
    transform(
      slice(reverse(sort_array(array(scored: _*))), 1, nProbe),
      x => -x.getField("neg_cell"))
  }

  /** EXT3d — IVF top-k with a TRAINED quantizer: corpus rows live in
    * their nearest-centroid cell; each query probes its `nProbe` nearest
    * cells and scores only those rows exactly. The corpus side is one
    * assignment expression + an equi-join on the cell id (no fan-out:
    * each corpus row sits in exactly one cell); only the tiny query side
    * multiplies by nProbe. Raising nProbe trades scan fraction
    * (≈ nProbe/nCells of the corpus per query) for recall — the same
    * knob as a production IVF index. Centroids are trained once on the
    * corpus (sampled at scale) and shipped as expression literals. */
  def topKIvf(
      embeddings: DataFrame,
      k: Int = 10,
      queryMod: Int = 50,
      nCells: Int = 16,
      nProbe: Int = 4,
      iters: Int = 5): DataFrame =
    topKIvf(embeddings, embeddings.filter(col("vec_id") % queryMod === 0),
      k, nCells, nProbe, iters)

  /** [[topKIvf]] with a caller-supplied query frame (columns `vec_id`,
    * `embedding`). The quantizer is still trained on the CORPUS (queries
    * need not be drawn from it); only the nProbe-exploded query side is
    * broadcast. */
  def topKIvf(
      embeddings: DataFrame,
      queries: DataFrame,
      k: Int,
      nCells: Int,
      nProbe: Int,
      iters: Int): DataFrame =
    topKIvf(embeddings, queries, k, nProbe, kmeansCentroids(embeddings, nCells, iters))

  /** [[topKIvf]] with a caller-supplied coarse quantizer — lets callers
    * and cross-lane recall tests share one trained quantizer (two
    * same-session trainings can land on different k-means local optima). */
  def topKIvf(
      embeddings: DataFrame,
      queries: DataFrame,
      k: Int,
      nProbe: Int,
      centroids: Array[Array[Float]]): DataFrame = {
    val corpus = embeddings.select(
      col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"),
      assignCell(col("embedding"), centroids).as("cell"))
    // q_nrm materialized below the explode (same Generate-projection rule
    // as the training loops — a computed sibling of explode() re-evaluates
    // per generated row).
    val q = prepQueries(queries)
      .select(col("q_id"), col("q_emb"), col("q_nrm"),
        explode(probeCells(col("q_emb"), centroids, nProbe)).as("cell"))
    rankTopK(
      corpus
        .join(broadcast(q), Seq("cell"))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("sim", dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm"))),
      k)
  }

  /** [[nearDupPairs]] with TRAINED cells instead of the fixture label —
    * self-sufficient (no pre-existing blocking column needed), but
    * per-cell QUADRATIC: cell populations are ~n·nAssign/nCells, so on a
    * corpus without cluster structure the candidate join grows n²/nCells
    * (the sf10 century corpus DNF'd here — 2.2 M vectors, > 70 GB spill;
    * see [[nearDupPairsLsh]], the probability-bounded scale path, for
    * the measured account). Use this variant when the corpus genuinely
    * clusters (cells stay small) or at ground-truthing scale.
    * Every vector is assigned to its `nAssign` nearest cells
    * (multi-assignment: a near-dup pair straddling a cell boundary still
    * meets in the runner-up cell — at cosine ≥ 0.95 the two vectors'
    * cell rankings are nearly identical, so 2 assignments cover the
    * boundary band); the quadratic term is per-cell, candidates met in
    * several shared cells are deduped BEFORE scoring. Same output shape
    * as [[nearDupPairs]]. */
  def nearDupPairsIvf(
      embeddings: DataFrame,
      threshold: Double = 0.95,
      nCells: Int = 16,
      nAssign: Int = 2,
      iters: Int = 5): DataFrame = {
    val centroids = kmeansCentroids(embeddings, nCells, iters)
    // nrm below the multi-assign explode — corpus-side, so the redundant
    // re-evaluation would run nAssign× over the BIG side (see trainPq).
    val e = prepCorpus(embeddings)
      .select(col("vec_id"), col("embedding"), col("nrm"),
        explode(probeCells(col("embedding"), centroids, nAssign)).as("cell"))
    e.alias("a")
      .join(e.alias("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("a.embedding").as("emb_a"), col("b.embedding").as("emb_b"),
        col("a.nrm").as("nrm_a"), col("b.nrm").as("nrm_b"))
      .dropDuplicates("vec_a", "vec_b")
      .withColumn("sim", dot(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")))
      .filter(col("sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), graft.Num.rnd(col("sim"), 6).as("sim"))
  }

  /** Per-query recall of an approximate top-k result against the exact
    * top-k (both in the (q_id, vec_id, …) shape [[rankTopK]] emits):
    * one row per exact-result query with `n_exact`, `n_hit`, `recall`.
    * The join is per-(q_id, vec_id) — k×|Q| rows, trivially small next
    * to the searches themselves — so an engine can afford to score every
    * index build/refresh this way and gate deployment on it. */
  def recallPerQuery(exact: DataFrame, approx: DataFrame): DataFrame = {
    val e = exact.select(col("q_id"), col("vec_id"))
    val hits = e
      .join(approx.select(col("q_id"), col("vec_id")), Seq("q_id", "vec_id"), "left_semi")
      .groupBy("q_id").agg(count(lit(1)).as("n_hit"))
    e.groupBy("q_id").agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("q_id"), "left")
      .select(
        col("q_id"), col("n_exact"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_exact")).as("recall"))
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
