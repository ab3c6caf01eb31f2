package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXT3e — product-quantized (PQ) similarity search: the compressed-index
  * ANN path. The corpus embedding (dim `D` floats) is split into `M`
  * subvectors of `D/M` dims; each subspace gets its own `K`-centroid
  * codebook (Lloyd's k-means, trained per subspace), and a corpus row is
  * stored as `M` small integer codes — 16 5-bit codes vs 64 floats here
  * (a byte-packed layout stores them in 16 bytes, 16× the raw column),
  * and the same kernels serve the M=16/K=256 of a production index.
  * Search is two-phase:
  *
  *  1. **ADC scan**: each query precomputes a lookup table
  *     `lut[m·K + j] = q_subᵐ · cᵐⱼ` (M·K doubles, on the broadcast query
  *     side only), and every corpus row is scored as
  *     `Σₘ lut[m·K + codes[m]]` by the codegen'd
  *     [[graft.functions.PqAdc]] kernel — the big side never touches the
  *     original embeddings, so a 100 TB float corpus becomes a ~3 TB code
  *     scan (the 32× that makes in-memory ANN over a lake feasible).
  *  2. **Exact re-rank**: the top `refine` ADC candidates per query
  *     (refine ≪ |C|) are joined back to the raw embeddings
  *     by `vec_id` — an equi-join moving refine·|Q| rows — and re-scored
  *     with the exact [[Similarity.dot]] cosine; the final top-k comes
  *     from the exact scores. ADC only has to land the true neighbors in
  *     the candidate set, not rank them perfectly.
  *
  * Reference anchor: the IHC pipeline itself has no vector search
  * (api_client.py outsources scoring); this lane extends the engine's
  * EXT3 family (SURVEY.md §2 LLM-data-pipeline operators) alongside the
  * brute/blocked/LSH/IVF paths.
  *
  * Scale shape: training is `iters` shuffles of (M·K·subDim) cells (all
  * subspaces in ONE aggregation pass per iteration — the per-subspace
  * loop only slices the collected means); encoding is a pure expression
  * (M packed [[graft.functions.CellScores]] argmaxes per row, no
  * shuffle); the ADC scan is a broadcast join + per-query top-refine;
  * the re-rank joins refine·|Q| rows. Driver state = the M×K×subDim
  * codebook floats (kilobytes), the same contract as
  * [[Similarity.kmeansCentroids]].
  *
  * Like the IVF lane, training is reproducible only up to float
  * summation order in the mean update, so registered rows emit a recall
  * scorecard (deterministic pass/fail) rather than raw top-k rows.
  */
object Pq {

  /** Frozen PQ codebooks: `codebooks(m)` is the flat (K·subDim,
    * centroid-major) matrix for subspace m — exactly the layout
    * [[graft.functions.CellScores]] consumes. Persist like any model
    * artifact for a frozen encoder. */
  final case class PqModel(numSub: Int, codebookSize: Int, subDim: Int,
      codebooks: Array[Array[Float]]) {
    require(codebooks.length == numSub &&
      codebooks.forall(_.length == codebookSize * subDim),
      s"codebook shape mismatch: want $numSub × ${codebookSize}·$subDim")
  }

  /** 1-based slice of the embedding column for subspace m. */
  private def subVec(emb: Column, m: Int, subDim: Int): Column =
    slice(emb, m * subDim + 1, subDim)

  /** Per-subspace centroid scores (sub·c − ‖c‖²/2) as one packed
    * expression — argmax of these is the nearest-centroid code. */
  private def subScores(emb: Column, model: PqModel, m: Int): Column =
    graft.functions.GraftExtensions.cellScores(
      subVec(emb, m, model.subDim),
      typedLit(model.codebooks(m)),
      typedLit(model.codebooks(m).grouped(model.subDim)
        .map(c => c.map(x => x.toDouble * x.toDouble).sum / 2.0).toArray))

  /** All M codes of a row as one `array<int>` column (ties to the lower
    * code id, matching the IVF assignment direction). */
  def codesCol(emb: Column, model: PqModel): Column =
    array((0 until model.numSub).map { m =>
      val s = subScores(emb, model, m)
      (array_position(s, array_max(s)) - 1L).cast("int")
    }: _*)

  /** The query-side ADC lookup table: flat M·K doubles,
    * `lut[m·K + j] = q_subᵐ · cᵐⱼ` (no bias — ADC reconstructs a dot
    * product, not a nearest-centroid argmax). */
  def lutCol(emb: Column, model: PqModel): Column =
    flatten(array((0 until model.numSub).map { m =>
      graft.functions.GraftExtensions.cellScores(
        subVec(emb, m, model.subDim),
        typedLit(model.codebooks(m)),
        typedLit(Array.fill(model.codebookSize)(0.0)))
    }: _*))

  /** Train per-subspace Lloyd's codebooks. Init is deterministic (the K
    * smallest rows by xxhash64(vec_id), sliced into subvectors — the
    * same scale-safe TakeOrdered init as [[Similarity.kmeansCentroids]]);
    * each iteration re-encodes with the packed expression and updates
    * ALL subspaces from ONE posexplode → groupBy(m, code, sub-dim) avg
    * shuffle (M·K·subDim cells, map-side combinable), then a cell-count
    * collect to rebuild the codebook literals. */
  def trainPq(
      embeddings: DataFrame,
      numSub: Int = 8,
      codebookSize: Int = 16,
      dim: Int = 64,
      iters: Int = 5): PqModel = {
    require(dim % numSub == 0, s"dim $dim not divisible by numSub $numSub")
    val subDim = dim / numSub
    val seed = embeddings
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(codebookSize)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    require(seed.length == codebookSize,
      s"corpus has only ${seed.length} rows — need at least $codebookSize for $codebookSize codes")
    var model = PqModel(numSub, codebookSize, subDim,
      Array.tabulate(numSub)(m =>
        seed.flatMap(row => row.slice(m * subDim, (m + 1) * subDim))))
    for (_ <- 0 until iters) {
      // codes MUST be materialized in a projection BELOW the explode:
      // `select(codesCol(..), posexplode(..))` plans the non-generator
      // expression in the Project ABOVE the Generate, re-evaluating the
      // full M·K encode once per exploded element — dim× redundant work
      // (measured 3.5× per-iteration cost on dim=64; registry-sweep
      // finding, round 8). Two selects pin the evaluation order.
      val means = embeddings
        .select(codesCol(col("embedding"), model).as("codes"), col("embedding"))
        .select(col("codes"), posexplode(col("embedding")).as(Seq("d", "x")))
        .select(
          (col("d") / subDim).cast("int").as("m"),
          element_at(col("codes"), (col("d") / subDim).cast("int") + 1).as("code"),
          (col("d") % subDim).as("sd"),
          col("x"))
        .groupBy("m", "code", "sd").agg(avg("x").as("mean"))
        .collect()
      val next = model.codebooks.map(_.clone())
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1) * subDim + r.getInt(2)) = r.getDouble(3).toFloat
      }
      model = model.copy(codebooks = next)
    }
    model
  }

  /** The compressed corpus: (vec_id, codes array<int>, nrm). `nrm` is the
    * EXACT norm, stored alongside the codes (the standard PQ-for-cosine
    * layout — one float per row next to M codes), so ADC cosine uses the
    * true denominator and only the numerator is approximate. */
  def encode(embeddings: DataFrame, model: PqModel): DataFrame =
    embeddings.select(
      col("vec_id"),
      codesCol(col("embedding"), model).as("codes"),
      Similarity.norm(col("embedding")).as("nrm"))

  /** Fixture-parameter entry: queries = `vec_id % queryMod == 0`, like
    * the sibling EXT3 lanes. Default geometry (M=16, K=32, refine=100)
    * is tuned for this fixture's WEAK neighbors (top-10 cosine ≈ 0.5 —
    * the regime where quantization error competes with the true score
    * gaps; measured recall@10 = 0.99–1.00 at sf0.001–0.01, vs 0.65–0.9
    * for the coarser M=8/K=16/refine=50). A production near-dup corpus
    * (neighbors at cosine ≥ 0.9) separates far better and can halve M
    * and the refine budget. */
  def topKPq(
      embeddings: DataFrame,
      k: Int = 10,
      queryMod: Int = 50,
      numSub: Int = 16,
      codebookSize: Int = 32,
      dim: Int = 64,
      iters: Int = 5,
      refine: Int = 100): DataFrame =
    topKPq(embeddings, embeddings.filter(col("vec_id") % queryMod === 0),
      k, numSub, codebookSize, dim, iters, refine)

  /** [[topKPq]] with a caller-supplied query frame (columns `vec_id`,
    * `embedding` — same contract as the other EXT3 overloads: query side
    * broadcast, self-matches excluded). */
  def topKPq(
      embeddings: DataFrame,
      queries: DataFrame,
      k: Int,
      numSub: Int,
      codebookSize: Int,
      dim: Int,
      iters: Int,
      refine: Int): DataFrame = {
    require(refine >= k, s"refine $refine must be ≥ k $k")
    val model = trainPq(embeddings, numSub, codebookSize, dim, iters)
    val corpus = encode(embeddings, model)
    val q = Similarity.prepQueries(queries)
      .select(col("q_id"), col("q_emb"), col("q_nrm"),
        lutCol(col("q_emb"), model).as("lut"))

    // Phase 1 — ADC scan over the code column only. The join projects the
    // narrow (q_id, vec_id, sim) triple before the per-query top-refine,
    // so neither codes nor LUTs enter the rank shuffle.
    val candidates = Similarity.rankTopK(
      corpus
        .join(broadcast(q.select(col("q_id"), col("q_nrm"), col("lut"))),
          col("vec_id") =!= col("q_id"))
        .withColumn("sim",
          graft.functions.GraftExtensions.pqAdc(col("codes"), col("lut")) /
            (col("q_nrm") * col("nrm")))
        .select("q_id", "vec_id", "sim"),
      refine)

    // Phase 2 — exact re-rank of refine·|Q| candidates: equi-join back to
    // the raw embeddings (the only point the big float column is read,
    // and only for candidate rows), broadcast the query embeddings, score
    // with the exact codegen'd dot.
    refineExact(candidates, embeddings, q, k)
  }

  /** Shared phase-2 exact re-rank: join ADC candidates `(q_id, vec_id)`
    * back to the raw embeddings (refine·|Q| rows — the ONLY rows whose
    * float column is ever read), broadcast the query embeddings, and
    * take the final top-k on the exact cosine. */
  private def refineExact(
      candidates: DataFrame,
      embeddings: DataFrame,
      q: DataFrame,
      k: Int): DataFrame =
    Similarity.rankTopK(
      candidates.select(col("q_id"), col("vec_id"))
        .join(embeddings.select(col("vec_id"), col("embedding"),
          Similarity.norm(col("embedding")).as("nrm")), Seq("vec_id"))
        .join(broadcast(q.select(col("q_id"), col("q_emb"), col("q_nrm"))), Seq("q_id"))
        .withColumn("sim",
          Similarity.dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm"))),
      k)

  /** Fixture-parameter entry for [[topKIvfPq]], mirroring the sibling
    * EXT3 defaults (queries = `vec_id % queryMod == 0`). */
  def topKIvfPq(
      embeddings: DataFrame,
      k: Int = 10,
      queryMod: Int = 50,
      nCells: Int = 16,
      nProbe: Int = 8,
      numSub: Int = 16,
      codebookSize: Int = 32,
      dim: Int = 64,
      iters: Int = 5,
      refine: Int = 100): DataFrame =
    topKIvfPq(embeddings, embeddings.filter(col("vec_id") % queryMod === 0),
      k, nCells, nProbe, numSub, codebookSize, dim, iters, refine)

  /** EXT3f — IVF-PQ: the composed lake-scale ANN index. The IVF coarse
    * quantizer ([[Similarity.kmeansCentroids]]) prunes WHICH rows each
    * query scores (equi-join on the cell id — nProbe/nCells of the
    * corpus per query, never a full scan); PQ compresses WHAT is read
    * for the rows that survive (M int codes + 1 float instead of the
    * raw embedding). Phase 1 is therefore an **equi-join ADC scan**:
    * the corpus side carries `(cell, vec_id, codes, nrm)`, the
    * broadcast query side carries nProbe `(cell, q_id, lut, q_nrm)`
    * rows, and the join key is the cell — this is the shape the brute
    * and pure-PQ lanes deliberately lack (their broadcast scan touches
    * every corpus row) and the reason IVF-PQ is the default physical
    * layout of production vector indexes at 10⁹⁺ rows. Phase 2 is the
    * same exact re-rank as [[topKPq]].
    *
    * Codebooks are SHARED across cells (one LUT of M·K doubles per
    * query, not nProbe of them). Classic IVF-PQ instead quantizes the
    * residual `x − centroid(cell)`, which tightens quantization error
    * at the cost of per-cell LUT biases; with exact-norm cosine + an
    * exact re-rank the candidate set is already recall-saturated on
    * weak-neighbor data (PqSpec holds ≥0.9, measured ≈0.99), so the
    * shared-codebook form keeps the broadcast payload cell-count
    * independent. Recall knobs: nProbe (cell misses) × refine (ADC
    * misses) — each sibling lane isolates one of the two.
    *
    * Scale shape: two training passes (IVF centroids + PQ codebooks,
    * both `iters` map-side-combinable shuffles, kilobyte collects);
    * corpus encode is one pure-expression pass; the scan join moves
    * only matched-cell code rows; re-rank moves refine·|Q| rows. */
  def topKIvfPq(
      embeddings: DataFrame,
      queries: DataFrame,
      k: Int,
      nCells: Int,
      nProbe: Int,
      numSub: Int,
      codebookSize: Int,
      dim: Int,
      iters: Int,
      refine: Int): DataFrame = {
    // Train the two quantizers CONCURRENTLY. They are independent by
    // construction (shared codebooks, not residual PQ — the PQ codes
    // never see the cell assignment), and each Lloyd iteration is a
    // small collect-bounded job, so the composed lane's training phase
    // is JOB-COUNT-dominated, not flop-dominated: overlapping the two
    // loops' job streams reclaims most of one loop's wall-clock
    // (registry-sweep finding, round 8). Spark job submission is
    // thread-safe; results are identical to the serial order.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val fCentroids = Future(Similarity.kmeansCentroids(embeddings, nCells, iters))
    val model = trainPq(embeddings, numSub, codebookSize, dim, iters)
    topKIvfPq(embeddings, queries, k, nProbe, numSub, codebookSize, dim,
      iters, refine, Await.result(fCentroids, Duration.Inf), model)
  }

  /** [[topKIvfPq]] with a caller-supplied coarse quantizer — so a caller
    * (or a recall test comparing against the plain-IVF lane) can share
    * ONE trained quantizer across lanes instead of letting two
    * independent k-means trainings land on different local optima. */
  def topKIvfPq(
      embeddings: DataFrame,
      queries: DataFrame,
      k: Int,
      nProbe: Int,
      numSub: Int,
      codebookSize: Int,
      dim: Int,
      iters: Int,
      refine: Int,
      centroids: Array[Array[Float]]): DataFrame =
    topKIvfPq(embeddings, queries, k, nProbe, numSub, codebookSize, dim,
      iters, refine, centroids, trainPq(embeddings, numSub, codebookSize, dim, iters))

  /** Fully pre-trained form: both the coarse quantizer and the PQ
    * codebooks are caller-supplied model artifacts (the production
    * serving shape — train once, persist, encode/scan many). */
  def topKIvfPq(
      embeddings: DataFrame,
      queries: DataFrame,
      k: Int,
      nProbe: Int,
      numSub: Int,
      codebookSize: Int,
      dim: Int,
      iters: Int,
      refine: Int,
      centroids: Array[Array[Float]],
      model: PqModel): DataFrame = {
    require(refine >= k, s"refine $refine must be ≥ k $k")
    // One pure-expression pass builds the full compressed index row:
    // cell id + M codes + exact norm (no self-join back to the floats).
    val corpus = embeddings.select(
      col("vec_id"),
      Similarity.assignCell(col("embedding"), centroids).as("cell"),
      codesCol(col("embedding"), model).as("codes"),
      Similarity.norm(col("embedding")).as("nrm"))
    // Prep the query frame ONCE; all three query-side shapes derive from it.
    val prepped = Similarity.prepQueries(queries)
    val q = prepped.select(col("q_id"), col("q_emb"), col("q_nrm"))

    // Phase 1 — equi-join ADC scan: each query meets only the code rows
    // of its nProbe probed cells. The broadcast is split in two so the
    // M·K-double LUT is shipped ONCE per query, not once per probed
    // cell: `probes` is the narrow (q_id, cell) fan-out, `qmeta` carries
    // the per-query LUT and norm, joined back on q_id after the cell
    // join has already pruned the corpus. Project the narrow
    // (q_id, vec_id, sim) triple before the per-query top-refine rank,
    // exactly like topKPq.
    val probes = prepped.select(col("q_id"),
      explode(Similarity.probeCells(col("q_emb"), centroids, nProbe)).as("cell"))
    val qmeta = prepped.select(col("q_id"), col("q_nrm"),
      lutCol(col("q_emb"), model).as("lut"))
    val candidates = Similarity.rankTopK(
      corpus
        .join(broadcast(probes), Seq("cell"))
        .filter(col("vec_id") =!= col("q_id"))
        .join(broadcast(qmeta), Seq("q_id"))
        .withColumn("sim",
          graft.functions.GraftExtensions.pqAdc(col("codes"), col("lut")) /
            (col("q_nrm") * col("nrm")))
        .select("q_id", "vec_id", "sim"),
      refine)

    refineExact(candidates, embeddings, q, k)
  }
}
