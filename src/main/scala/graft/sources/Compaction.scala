package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
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
