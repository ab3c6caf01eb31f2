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
