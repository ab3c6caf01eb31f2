package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the maintenance operator every long-running
  * ingest needs. Streaming/incremental writers (StreamingIngest, the
  * PartitionedStore upsert, any micro-batched landing zone) produce one
  * file per trigger per partition; at 100 TB that decays into millions of
  * KB-sized files, and the NEXT job's scan pays for it twice: task-per-file
  * scheduling overhead and the loss of intra-file parallelism (a reader
  * can split one big parquet by row group, but cannot merge tiny files
  * without a task each).
  *
  * Two rewrite shapes:
  *
  *  - [[compact]] — round-robin `repartition(n)` where n is sized from the
  *    ACTUAL input bytes (listed from the filesystem, never guessed) over
  *    `targetBytes`. A full shuffle, deliberately: `coalesce(n)` would
  *    avoid it but collapses upstream parallelism (the read itself runs at
  *    n tasks) and inherits whatever row order the files had, producing
  *    unbalanced outputs from unbalanced inputs.
  *  - [[compactSorted]] — `repartitionByRange(n, key) + sortWithinPartitions`,
  *    the data-skipping shape: output files carry DISJOINT key ranges, so
  *    parquet min/max footer stats let later point/range scans on the key
  *    prune whole files instead of reading everything (verified by the
  *    disjoint-ranges assertion in CompactionSpec).
  *
  * Both rewrite into a fresh directory and leave the input untouched —
  * swap-on-success (rename/view flip) is the caller's transaction, matching
  * every serious table-maintenance protocol; a compactor that rewrites in
  * place can lose data on a mid-job crash.
  */
object Compaction {

  /** (file count, total bytes) under `path`, recursively — the real
    * numbers a compactor must size from. */
  def dirStats(spark: SparkSession, path: String): (Long, Long) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    val root = p.toUri.getPath
    // A data file must have no hidden component anywhere under the root:
    // a bare leaf check would still count files inside a stale
    // _temporary/ tree left by a crashed write and skew the file sizing.
    def hidden(path: Path): Boolean = {
      val rel = path.toUri.getPath.stripPrefix(root).stripPrefix("/")
      rel.split('/').exists(c => c.startsWith("_") || c.startsWith("."))
    }
    var files = 0L
    var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (!hidden(f.getPath)) {
        files += 1
        bytes += f.getLen
      }
    }
    (files, bytes)
  }

  private def nFiles(spark: SparkSession, inPath: String, targetBytes: Long): Int = {
    val (_, bytes) = dirStats(spark, inPath)
    math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
  }

  /** Rewrite the parquet directory `inPath` into `outPath` as
    * ceil(inputBytes / targetBytes) evenly sized files. */
  def compact(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      targetBytes: Long = 128L * 1024 * 1024): DataFrame = {
    val n = nFiles(spark, inPath, targetBytes)
    spark.read.parquet(inPath)
      .repartition(n)
      .write.mode("overwrite").parquet(outPath)
    spark.read.parquet(outPath)
  }

  /** The rank-normalized Morton z-VALUE for `df`'s rows as a pure
    * Column — the layout key [[compactZOrder]] clusters on, exposed so
    * OTHER writers (e.g. a TxStore append that wants multi-dimensional
    * data skipping from the commit log's min/max stats) can range-lay
    * their files on the same curve.
    *
    * Morton interleave in ONE array fold per column. The naive shape —
    * fold to a bucket index, then extract `bits` bits from it — would
    * re-evaluate the (interpreted, CodegenFallback, no-CSE) 255-step
    * fold once per extracted bit. Instead each boundary carries its
    * PRE-INTERLEAVED increment: crossing boundary i moves the bucket
    * from i to i+1, so it contributes spread(i+1) − spread(i), where
    * spread places bucket-bit p of column j at curve position p·k + j.
    * Summing the increments for every crossed boundary yields
    * spread(bucket) directly — one 255-step pass per column per row,
    * independent of `bits`. A NULL comparison contributes 0 everywhere,
    * clustering NULLs at the curve origin.
    *
    * Measurement notes. (1, r17) The per-column equi-depth boundaries
    * come from ONE multi-column `approxQuantile` pass (≤ 2^bits−1
    * doubles per column on the driver — model-bounded, the same
    * contract as the k-means centroids); the per-column calls this
    * replaced cost k full input scans for identical summaries.
    * (2, r18) The per-row fold is the NATIVE [[graft.functions.ZOrderSpread]]
    * expression — a codegen'd binary search of the boundary array plus
    * one lookup in the precomputed spread table (~8 comparisons/row
    * instead of the 255 interpreted closures of the r17
    * `aggregate(zip_with(...))` HOF, which is CodegenFallback). The
    * equivalence argument (telescoping delta sum = spread-table lookup;
    * NULL/NaN → 0) lives on the expression. The r17 alternative — a
    * 2·255-term codegen'd `when` unroll — had been tried and REVERTED
    * (1.2 MB task binaries tripled the lane); the native expression
    * ships two ≤256-element reference arrays instead of an expression
    * tree, so the plan stays tiny. Callers still persist the keyed
    * frame: the quantile pass aside, the input scan itself should not
    * run once per consumer pass. */
  def zOrderKey(df: DataFrame, zCols: Seq[String], bits: Int = 8): Column = {
    require(zCols.size >= 2, "z-order needs ≥2 columns")
    require(zCols.size * bits <= 62, s"${zCols.size} cols × $bits bits overflows a signed long")
    val buckets = 1 << bits
    // equi-depth boundaries per column; relativeError ≪ bucket width so
    // adjacent buckets stay comparable in population
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val k = zCols.size
    def spread(v: Long, j: Int): Long =
      (0 until bits).map(p => ((v >> p) & 1L) << (p * k + j)).sum
    // one shared pass for all k columns' quantile summaries
    val allBounds = df.stat.approxQuantile(zCols.toArray, probs, 1.0 / (4.0 * buckets))
    val zParts = zCols.zipWithIndex.map { case (c, j) =>
      val bs = allBounds(j)
      // spreads(i) = the pre-interleaved curve value of bucket i; the
      // expression returns spreads[#boundaries ≤ v] directly
      val spreads = (0 to bs.length).map(i => spread(i.toLong, j)).toArray
      graft.functions.GraftExtensions.zSpread(
        col(c).cast("double"), lit(bs), lit(spreads))
    }
    // columns occupy disjoint bit positions, so plain addition assembles z
    zParts.reduce(_ + _)
  }

  /** Rewrite clustered on a Z-ORDER (Morton) curve over `zCols` — the
    * multi-dimensional data-skipping layout [[compactSorted]] cannot give:
    * a lexicographic sort prunes files only for predicates on its LEADING
    * key (the second key's per-file min/max spans nearly the full domain),
    * while interleaving the keys' bits makes every output file a small
    * hyper-rectangle in (k1, k2, …) space, so parquet min/max footers
    * prune files for predicates on ANY of the z-columns (asserted
    * quantitatively in StorageSkewSpec).
    *
    * Shape (the same scheme Delta's OPTIMIZE ZORDER BY documents): each
    * column is first RANK-normalized into 2^`bits` equi-depth buckets via
    * `approxQuantile` boundaries — raw values interleave badly when the
    * columns' scales or distributions differ (a skewed column would own
    * all the high bits); equi-depth bucketing makes every bit carry the
    * same selectivity regardless of distribution. The per-column
    * boundaries are ≤(2^bits−1) doubles on the driver (tiny); bucket
    * lookup and bit-interleave are pure Column arithmetic over a literal
    * array — distributed, no UDF. NULL buckets to 0, clustering NULLs
    * together at the curve origin. One range exchange on the z-value +
    * in-file sort, identical cost shape to [[compactSorted]].
    *
    * `bits` trades curve resolution against quantile work: 8 bits/column
    * (256 buckets) already gives file-level pruning down to ~n_files
    * granularity — finer bits only matter once files ≫ 2^(bits·k). */
  def compactZOrder(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      zCols: Seq[String],
      targetBytes: Long = 128L * 1024 * 1024,
      bits: Int = 8): DataFrame = {
    require(zCols.size >= 2, "z-order needs ≥2 columns (use compactSorted for 1)")
    require(zCols.size * bits <= 62, s"${zCols.size} cols × $bits bits overflows a signed long")
    val n = nFiles(spark, inPath, targetBytes)
    val df = spark.read.parquet(inPath)
    require(!df.columns.contains("__z"), "input must not carry the reserved __z column")
    // persisted (r17): repartitionByRange SAMPLES its child to place the
    // range bounds, then shuffles it — without the persist the z-fold
    // and the input scan both run twice per rewrite. Same rule as
    // TxStore.compactZOrder's keyed persist. DISK_ONLY (r18): the frame
    // is the ENTIRE input table read exactly twice — at the 100 TB
    // design point a default deserialized MEMORY_AND_DISK copy would
    // compete with the range shuffle and the write for executor memory
    // (guide §5); sequential disk re-read is the scale-safe trade and
    // measured inside the lane's noise band locally. Unpersisted once
    // the write has consumed it.
    val keyed = df.withColumn("__z", zOrderKey(df, zCols, bits))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    try
      keyed
        .repartitionByRange(n, col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite").parquet(outPath)
    finally keyed.unpersist(): Unit
    spark.read.parquet(outPath)
  }

  /** Rewrite with RANGE partitioning + an in-file sort on `sortCols`:
    * same file sizing, but each output file owns a disjoint slice of the
    * key space, so parquet min/max stats prune files for key predicates. */
  def compactSorted(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      sortCols: Seq[String],
      targetBytes: Long = 128L * 1024 * 1024): DataFrame = {
    val n = nFiles(spark, inPath, targetBytes)
    spark.read.parquet(inPath)
      .repartitionByRange(n, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(outPath)
    spark.read.parquet(outPath)
  }
}
