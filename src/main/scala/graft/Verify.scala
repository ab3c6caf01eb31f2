package graft

import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. Extra args
  * beyond (sfDir, outDir) restrict the dump to those query names — the
  * fast iteration path when checking one new query against its oracle. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val subset = args.drop(2).toSet
    val unknown = subset.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = GraftSession.build("graft-verify")
    new java.io.File(outDir).mkdirs()
    val selected =
      if (subset.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(subset).toMap
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      catch {
        case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          // remove any output from a previous run: a stale (still-valid)
          // dump would make the driver's compare report this broken
          // query green
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete(): Unit
          }
          rm(new java.io.File(s"$outDir/$name"))
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Registry canary: a registered-vs-dumped mismatch means some query
    // silently failed (or a subset run) — makes a mass-drop a loud number
    // in the round artifact instead of a JSON-key diff exercise.
    val dumped = selected.keys.count(n => Files.exists(Paths.get(s"$outDir/$n")))
    Files.writeString(
      Paths.get(s"$outDir/registry.json"),
      s"""{"registered": ${SparkEntry.queries.size}, "selected": ${selected.size}, "dumped": $dumped}""")
    if (dumped < selected.size)
      System.err.println(s"[verify] CANARY: dumped $dumped of ${selected.size} selected queries")
    spark.stop()
  }
}
