package graft

import graft.sources.PartitionedStore
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Date-partitioned layout: bounded reads must prune partitions at
  * planning time, and the per-step file formats (JSON/ORC alternates of
  * the CSV contract) must round-trip the journey schema. */
class PartitionedStoreSpec extends SparkSpec {

  test("date-bounded read prunes partitions (PartitionFilters in the scan)") {
    val dir = Files.createTempDirectory("graft-part").toString
    PartitionedStore.writeByDate(Tables.events(spark, sf("sf0.001")), "ts", s"$dir/events")

    val bounded = PartitionedStore.read(spark, s"$dir/events",
      startDate = Some("2024-01-10"), endDate = Some("2024-01-12"))
    // the date bounds must appear as PartitionFilters on the scan (pruned
    // at planning time), NOT as row-level PushedFilters/data filters
    val plan = bounded.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("PartitionFilters: [isnotnull(date"), plan)
    assert(scanLine.contains("(date") && scanLine.contains("2024-01-10"), plan)

    // row-level truth: only the bounded dates come back
    val dates = bounded.select("date").distinct().collect().map(_.getString(0)).sorted
    assert(dates.sameElements(Array("2024-01-10", "2024-01-11", "2024-01-12")))
  }

  test("keyed upsert merges touched partitions and leaves the rest byte-identical") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-upsert").toString + "/store"
    val day = 86400L * 1000000000L // epoch-ns per day
    def row(key: Long, dayN: Long, v: Double) = (key, dayN * day + key * 1000L, v)

    // initial store: day 0 (keys 1,2) and day 1 (keys 3,4)
    PartitionedStore.upsertByDate(
      spark,
      Seq(row(1, 0, 1.0), row(2, 0, 2.0), row(3, 1, 3.0), row(4, 1, 4.0))
        .toDF("k", "ts", "v"),
      tsCol = "ts", keyCol = "k", path = dir)

    def files(date: String) = {
      val d = new java.io.File(s"$dir/date=$date")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.length, f.lastModified)).sortBy(_._1).toSeq
    }
    val day0Before = files("1970-01-01")

    // batch: update key 3, add key 5 (both day 1), open day 2 with key 6
    PartitionedStore.upsertByDate(
      spark,
      Seq(row(3, 1, 30.0), row(5, 1, 5.0), row(6, 2, 6.0)).toDF("k", "ts", "v"),
      tsCol = "ts", keyCol = "k", path = dir)

    // untouched partition: same files, byte-for-byte
    assert(files("1970-01-01") === day0Before)
    val got = spark.read.parquet(dir)
      .select(col("k"), col("v"), col("date").cast("string"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(got === Set(
      (1L, 1.0, "1970-01-01"), (2L, 2.0, "1970-01-01"),
      (3L, 30.0, "1970-01-02"), // batch wins
      (4L, 4.0, "1970-01-02"), // stored row with no batch counterpart survives
      (5L, 5.0, "1970-01-02"),
      (6L, 6.0, "1970-01-03")))
  }

  test("journey contract round-trips through JSON and ORC with the explicit schema") {
    val journeys = ops.JourneyBuilder.journeyOutput(
      ops.JourneyBuilder.journeys(
        Tables.conversions(spark, sf("sf0.001")), Tables.sessions(spark, sf("sf0.001"))))
    val dir = Files.createTempDirectory("graft-fmt").toString

    journeys.write.mode("overwrite").json(s"$dir/j.json")
    val fromJson = spark.read.schema(AttributionPipeline.journeyCsvSchema).json(s"$dir/j.json")
    assert(fromJson.schema == AttributionPipeline.journeyCsvSchema)

    journeys.write.mode("overwrite").orc(s"$dir/j.orc")
    val fromOrc = spark.read.orc(s"$dir/j.orc")

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(canon(fromJson).sameElements(canon(journeys)))
    assert(canon(fromOrc).sameElements(canon(journeys)))
  }
}
