package graft

import java.nio.file.Files

/** Drives the CLI dispatcher (Main.run) end-to-end against sf0.001 —
  * the product surface a reference user actually invokes. */
class CliSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft-cli").toString

  test("clean-corpus step writes survivors matching the operator output") {
    val out = tmp()
    Main.run(spark, Map(
      "step" -> "clean-corpus",
      "data-dir" -> sf("sf0.001"),
      "out-dir" -> out))
    val written = spark.read.parquet(s"$out/clean_corpus")
    val direct = ops.CorpusClean.cleanClustered(Tables.documents(spark, sf("sf0.001")))
    assert(written.count() === direct.count())
    assert(written.columns.toSeq ===
      Seq("doc_id", "n_chars", "n_tokens", "stopword_ratio"))
    // survivor sets identical, not just same size
    assert(written.select("doc_id").except(direct.select("doc_id")).count() === 0)
  }

  test("greedy survivor rule drops at least as many docs as clustering") {
    val out = tmp()
    Main.run(spark, Map(
      "step" -> "clean-corpus", "data-dir" -> sf("sf0.001"),
      "out-dir" -> out, "survivor-rule" -> "greedy"))
    val greedy = spark.read.parquet(s"$out/clean_corpus").count()
    val clustered = ops.CorpusClean.cleanClustered(
      Tables.documents(spark, sf("sf0.001"))).count()
    assert(greedy <= clustered) // greedy over-drops on transitive chains
  }

  test("the full attribution pipeline runs through the CLI dispatcher") {
    val out = tmp()
    Main.run(spark, Map(
      "step" -> "all", "data-dir" -> sf("sf0.001"), "out-dir" -> out))
    assert(spark.read.parquet(s"$out/attribution_customer_journey").count() > 0)
    assert(spark.read.option("header", "true").csv(s"$out/channel_reporting").count() > 0)
  }

  test("unknown steps and flags fail loudly") {
    intercept[RuntimeException] {
      Main.run(spark, Map("step" -> "clean-corpse", "data-dir" -> sf("sf0.001")))
    }
    intercept[RuntimeException] {
      Main.run(spark, Map(
        "step" -> "clean-corpus", "data-dir" -> sf("sf0.001"),
        "out-dir" -> tmp(), "survivor-rule" -> "fastest"))
    }
  }

  test("sql step: the flagship report as one SQL file matches the Scala pipeline") {
    val out = tmp()
    Main.run(spark, Map(
      "step" -> "sql", "data-dir" -> sf("sf0.001"), "out-dir" -> out,
      "query" -> "sql/flagship_report.sql"))
    val viaSql = spark.read.parquet(s"$out/sql_result")
    val viaScala = SparkEntry.queries("flagship_report")(spark, sf("sf0.001"))
    assert(viaSql.columns.toSeq === viaScala.columns.toSeq)
    assert(viaSql.count() === viaScala.count() && viaSql.count() > 0)
    assert(viaSql.exceptAll(viaScala).isEmpty && viaScala.exceptAll(viaSql).isEmpty,
      "SQL-step result must row-match the DataFrame flagship")
  }

  test("sql step: --tx registers transactional tables beside the fixture views") {
    import org.apache.spark.sql.functions.col
    val dir = tmp()
    val table = s"$dir/txtbl"
    graft.sources.TxStore.append(
      Tables.events(spark, sf("sf0.001")).filter(col("event_id") % 7 === 0), table)
    val out = tmp()
    Main.run(spark, Map(
      "step" -> "sql", "data-dir" -> sf("sf0.001"), "out-dir" -> out,
      "tx" -> s"mytx=$table",
      "sql" -> ("SELECT t.event_type, COUNT(*) AS n FROM mytx t " +
        "JOIN events e ON t.event_id = e.event_id GROUP BY 1")))
    val got = spark.read.parquet(s"$out/sql_result")
    assert(got.columns.toSeq === Seq("event_type", "n"))
    assert(got.agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0) ===
      Tables.events(spark, sf("sf0.001")).filter(col("event_id") % 7 === 0).count())
    // malformed --tx refuses loudly
    intercept[RuntimeException] {
      Main.run(spark, Map("step" -> "sql", "data-dir" -> sf("sf0.001"),
        "out-dir" -> tmp(), "tx" -> "nopath", "sql" -> "SELECT 1"))
    }
  }

  test("sql step: inline --sql over a fixture view; missing statement refuses") {
    val out = tmp()
    Main.run(spark, Map(
      "step" -> "sql", "data-dir" -> sf("sf0.001"), "out-dir" -> out,
      "sql" -> "SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1"))
    val got = spark.read.parquet(s"$out/sql_result")
    assert(got.columns.toSeq === Seq("event_type", "n") && got.count() > 0)
    intercept[RuntimeException] {
      Main.run(spark, Map("step" -> "sql", "data-dir" -> sf("sf0.001"), "out-dir" -> tmp()))
    }
  }
}
