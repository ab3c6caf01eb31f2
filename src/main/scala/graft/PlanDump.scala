package graft

/** Dump `explain("formatted")` for named registered queries to files —
  * the plan evidence the optimization rounds commit under `plans/rNN/`.
  *
  * Usage: runMain graft.PlanDump <outDir> <query> [<query> ...] [--suffix _before]
  *
  * Each query's fn runs against $SPARK_GRAFT_SF_DIR (side-effecting lanes
  * build their fixtures as usual); the RETURNED frame's formatted plan is
  * written to `<outDir>/<query><suffix>.txt`. The frame is not executed,
  * so AQE plans show isFinalPlan=false — the shape (Exchanges, join
  * strategies, PushedFilters, ReadSchema) is what the audit reads.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <query>... [--suffix s]")
    val sufIdx = args.indexOf("--suffix")
    require(sufIdx < 0 || sufIdx + 1 < args.length, "--suffix needs a value")
    val suffix = if (sufIdx >= 0) args(sufIdx + 1) else ""
    val rest = if (sufIdx >= 0) args.patch(sufIdx, Nil, 2) else args
    val outDir = rest.head
    val names = rest.tail.toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.build("graft-plandump")
    val fns = SparkEntry.queries
    val unknown = names.filterNot(fns.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = fns(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/$name$suffix.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] wrote $outDir/$name$suffix.txt")
    }
    spark.stop()
  }
}
