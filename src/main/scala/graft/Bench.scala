package graft

/** Benchmark main: times the headline queries (SparkEntry.benchQueries) at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line for the driver.
  *
  * Measurement: a `noop`-format write, so every column is fully
  * materialized (a bare `.count()` lets Spark skip column evaluation for
  * some plans — VERDICT r1). Each query runs once untimed (JIT/codegen
  * warm-up, parquet footer caching), then THREE timed runs, and the
  * MEDIAN is reported — the BASELINE.md protocol. One-run timing let a
  * loaded machine report 23× noise in the round-2 artifact; the median of
  * three absorbs transient load spikes. A failing query is recorded as -1
  * and excluded from the total rather than silently inflating it.
  *
  * Optional args: a subset of query names to bench (default: all of
  * SparkEntry.benchQueries) — used for profiling a single query.
  */
object Bench {
  private val TimedRuns = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-bench")
    val fns = SparkEntry.queries
    val unknown = args.toSeq.filterNot(fns.contains)
    require(unknown.isEmpty,
      s"unknown quer${if (unknown.size == 1) "y" else "ies"}: ${unknown.mkString(", ")} " +
        "— a typo here would silently bench the empty set")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.benchQueries
    def run(name: String): Boolean =
      try {
        fns(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        true
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
      }
    val results = names.map { name =>
      // Drop caches persisted by EARLIER queries (Dedup/CorpusClean pin
      // corpus-sized frames and never unpersist — by the time the last
      // bench queries run, leftover blocks + GC pressure inflate their
      // numbers and make them depend on registry order). Each query's
      // own caches rebuild during its warm-up and stay hot for the three
      // timed runs, matching the per-query baseline protocol.
      spark.catalog.clearCache()
      val warm = run(name)
      val times = (1 to TimedRuns).flatMap { _ =>
        if (!warm) None
        else {
          val t0 = System.nanoTime()
          if (run(name)) Some((System.nanoTime() - t0) / 1e9) else None
        }
      }
      val median =
        if (times.size == TimedRuns) times.sorted.apply(TimedRuns / 2) else -1.0
      name -> median
    }
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
