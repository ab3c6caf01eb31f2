package graft

/** Benchmark main: times the headline queries (SparkEntry.benchQueries) at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line for the driver.
  *
  * Measurement: a `noop`-format write, so every column is fully
  * materialized (a bare `.count()` lets Spark skip column evaluation for
  * some plans — VERDICT r1). Each query runs once untimed then once timed
  * (BASELINE.md protocol: warm-up discarded) so JIT/codegen compilation
  * and parquet footer caching don't land on whichever query happens to run
  * first. A failing query is recorded as -1 and excluded from the total
  * rather than silently inflating it.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-bench")
    val fns = SparkEntry.queries
    def run(name: String): Unit =
      fns(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
    val results = SparkEntry.benchQueries.map { name =>
      val ok =
        try { run(name); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED (warm-up): ${e.getMessage}")
            false
        }
      val t0 = System.nanoTime()
      val ok2 = ok &&
        (try { run(name); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
        })
      name -> (if (ok2) (System.nanoTime() - t0) / 1e9 else -1.0)
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
