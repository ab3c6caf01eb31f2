package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** EXT50 — ANN INDEX PERSISTENCE: the model-artifact lifecycle around
  * [[Similarity.kmeansCentroids]] and [[Pq.trainPq]]. A production ANN
  * deployment trains its coarse quantizer and PQ codebooks ONCE (on a
  * sample), persists them, and every subsequent ingest/query job loads
  * the frozen artifact — retraining per job would both waste the
  * training scans and silently SHIFT cell boundaries (k-means is
  * float-order sensitive; two trainings are two different indexes, so
  * incremental ingest against a retrained quantizer mis-buckets the
  * old rows). Persisting the artifact is what makes the index a stable
  * contract.
  *
  * Format: plain parquet, one row per (cell, dim) / (subspace, slot)
  * value — readable by ANY engine, no JVM serialization. Floats
  * round-trip bit-exactly through parquet FLOAT, so a loaded index is
  * the SAME index: the ext50 lane pins loaded ≡ in-memory equality of
  * full query results, not approximate recall. Artifacts are
  * model-sized (k·dim / M·K·subDim floats) — the driver collect here
  * is the same bounded collect training itself already does. */
object IndexStore {

  private val CentroidSchema = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("d", IntegerType, nullable = false),
    StructField("v", FloatType, nullable = false)))

  /** Persist a coarse quantizer as (cell, d, v) parquet rows. */
  def saveCentroids(spark: SparkSession, centroids: Array[Array[Float]], path: String): Unit = {
    require(centroids.nonEmpty && centroids.forall(_.length == centroids.head.length),
      "centroids must be non-empty and rectangular")
    val rows = for {
      (c, i) <- centroids.zipWithIndex
      (v, d) <- c.zipWithIndex
    } yield Row(i, d, v)
    spark.createDataFrame(java.util.List.of(rows.toSeq: _*), CentroidSchema)
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a [[saveCentroids]] artifact back to the literal-array form
    * every ANN entry point consumes. Shape is validated: cells 0..k−1,
    * dims 0..dim−1, no holes (a partial artifact fails loudly, never
    * returns a zero-padded quantizer). */
  def loadCentroids(spark: SparkSession, path: String): Array[Array[Float]] = {
    val rows = spark.read.schema(CentroidSchema).parquet(path).collect()
    require(rows.nonEmpty, s"no centroid rows at $path")
    val k = rows.map(_.getInt(0)).max + 1
    val dim = rows.map(_.getInt(1)).max + 1
    require(rows.length == k * dim,
      s"centroid artifact at $path has holes: ${rows.length} rows for $k cells × $dim dims")
    val out = Array.ofDim[Float](k, dim)
    rows.foreach(r => out(r.getInt(0))(r.getInt(1)) = r.getFloat(2))
    out
  }

  private val PqSchema = StructType(Seq(
    StructField("sub", IntegerType, nullable = false),
    StructField("slot", IntegerType, nullable = false),
    StructField("v", FloatType, nullable = false),
    StructField("codebook_size", IntegerType, nullable = false),
    StructField("sub_dim", IntegerType, nullable = false)))

  /** Persist PQ codebooks as (sub, slot, v) parquet rows; the two shape
    * scalars ride every row (parquet dictionary-encodes the constant
    * columns away) so the artifact is self-describing. */
  def savePq(spark: SparkSession, model: Pq.PqModel, path: String): Unit = {
    val rows = for {
      (cb, m) <- model.codebooks.zipWithIndex
      (v, s) <- cb.zipWithIndex
    } yield Row(m, s, v, model.codebookSize, model.subDim)
    spark.createDataFrame(java.util.List.of(rows.toSeq: _*), PqSchema)
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a [[savePq]] artifact; shape-validated like centroids. */
  def loadPq(spark: SparkSession, path: String): Pq.PqModel = {
    val rows = spark.read.schema(PqSchema).parquet(path).collect()
    require(rows.nonEmpty, s"no PQ rows at $path")
    val codebookSize = rows.head.getInt(3)
    val subDim = rows.head.getInt(4)
    val numSub = rows.map(_.getInt(0)).max + 1
    require(rows.length == numSub * codebookSize * subDim,
      s"PQ artifact at $path has holes: ${rows.length} rows for " +
        s"$numSub x $codebookSize*$subDim")
    val cbs = Array.ofDim[Float](numSub, codebookSize * subDim)
    rows.foreach(r => cbs(r.getInt(0))(r.getInt(1)) = r.getFloat(2))
    Pq.PqModel(numSub, codebookSize, subDim, cbs)
  }

  /** The ext50 scorecard: train both artifacts, round-trip them through
    * `dir`, and compare FULL query results (loaded vs in-memory index)
    * with a symmetric exceptAll — one row, deterministic, exactness not
    * recall. */
  def roundTripReport(embeddings: DataFrame, dir: String): DataFrame = {
    val spark = embeddings.sparkSession
    val cent = Similarity.kmeansCentroids(embeddings, 16, 5)
    saveCentroids(spark, cent, s"$dir/centroids")
    val centLoaded = loadCentroids(spark, s"$dir/centroids")
    val pq = Pq.trainPq(embeddings)
    savePq(spark, pq, s"$dir/pq")
    val pqLoaded = loadPq(spark, s"$dir/pq")
    val queries = embeddings.filter(col("vec_id") % 50 === 0)
    def sameResults(a: DataFrame, b: DataFrame): Column =
      lit(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    val ivfSame = sameResults(
      Similarity.topKIvf(embeddings, queries, 10, 4, cent),
      Similarity.topKIvf(embeddings, queries, 10, 4, centLoaded))
    val pqSame = sameResults(
      Pq.topKIvfPq(embeddings, queries, 10, 4, pq.numSub, pq.codebookSize,
        pq.numSub * pq.subDim, 5, 100, cent, pq),
      Pq.topKIvfPq(embeddings, queries, 10, 4, pqLoaded.numSub, pqLoaded.codebookSize,
        pqLoaded.numSub * pqLoaded.subDim, 5, 100, centLoaded, pqLoaded))
    queries.agg(
      count(lit(1)).as("n_queries"),
      ivfSame.as("ivf_roundtrip_exact"),
      pqSame.as("pq_roundtrip_exact"))
  }
}
