package graft

import graft.ops.{ChannelReport, IhcScorer, IncrementalReport, JourneyBuilder}
import graft.sources.TxStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Incremental channel-report maintenance: CDC-folded state must converge
  * to the from-scratch rollup, and the maintenance step must be
  * exactly-once under replay — an ADDITIVE upsert double-counts on naive
  * retry, so the txn-stamped merge is what's actually under test. */
class IncrementalReportSpec extends SparkSpec {

  import spark.implicits._

  private def dir = sf("sf0.001")
  private def freshPath(tag: String): String =
    Files.createTempDirectory(s"graft-incr-$tag").toString + "/store"

  private def attribution: DataFrame =
    IhcScorer.score(JourneyBuilder.journeys(
      Tables.conversions(spark, dir), Tables.sessions(spark, dir)))

  private def sessionData: DataFrame =
    ChannelReport.sessionData(Tables.sessions(spark, dir), Tables.sessionCosts(spark, dir))

  private def sortedRows(df: DataFrame): Array[(String, String, Double, Double, Double)] =
    df.select("channel_name", "date", "cost", "ihc", "ihc_revenue")
      .as[(String, String, Double, Double, Double)]
      .collect().sortBy(r => (r._1, r._2))

  private def assertSameRollup(got: DataFrame, want: DataFrame): Unit = {
    val g = sortedRows(got)
    val w = sortedRows(want)
    assert(g.length == w.length, s"row count ${g.length} != ${w.length}")
    g.zip(w).foreach { case ((gc, gd, g1, g2, g3), (wc, wd, w1, w2, w3)) =>
      assert(gc == wc && gd == wd, s"key ($gc,$gd) != ($wc,$wd)")
      assert(math.abs(g1 - w1) < 1e-6 && math.abs(g2 - w2) < 1e-6 &&
        math.abs(g3 - w3) < 1e-6, s"sums drifted at ($gc,$gd)")
    }
  }

  test("three-wave incremental maintenance converges to the full recompute") {
    val attrStore = freshPath("attr")
    val repStore = freshPath("rep")
    val attr = attribution
    val cv = Tables.conversions(spark, dir)
    val sd = sessionData
    (0 until 3).foreach { wave =>
      TxStore.append(attr.filter(col("conversion_id") % 3 === wave), attrStore)
      IncrementalReport.advance(spark, attrStore, repStore, sd, cv)
    }
    assertSameRollup(
      TxStore.read(spark, repStore),
      ChannelReport.report(sd, attr, cv))
  }

  test("replaying a maintenance step is a no-op (txn-stamped merge)") {
    val attrStore = freshPath("attr2")
    val repStore = freshPath("rep2")
    val attr = attribution
    val cv = Tables.conversions(spark, dir)
    val sd = sessionData
    TxStore.append(attr.filter(col("conversion_id") % 2 === 0), attrStore)
    val v1 = IncrementalReport.advance(spark, attrStore, repStore, sd, cv)
    TxStore.append(attr.filter(col("conversion_id") % 2 =!= 0), attrStore)
    val v2 = IncrementalReport.advance(spark, attrStore, repStore, sd, cv)
    assert(v2 == v1 + 1)
    val afterOnce = sortedRows(TxStore.read(spark, repStore))
    // crash-replay: the position is IN the log, so advance() re-derives
    // it and no-ops; a direct mergeOnce replay with the consumed batchId
    // must also no-op instead of double-adding
    val v3 = IncrementalReport.advance(spark, attrStore, repStore, sd, cv)
    assert(v3 == v2)
    val replayDelta = ChannelReport.report(
      sd, attr.filter(col("conversion_id") % 2 =!= 0), cv)
    TxStore.mergeOnce(spark, repStore, replayDelta, Seq("channel_name", "date"),
      IncrementalReport.WriterId, batchId = v2)
    assert(sortedRows(TxStore.read(spark, repStore)).sameElements(afterOnce),
      "replayed delivery double-counted")
  }

  test("position is recovered from the report log, not caller state") {
    val attrStore = freshPath("attr3")
    val repStore = freshPath("rep3")
    val attr = attribution
    val cv = Tables.conversions(spark, dir)
    val sd = sessionData
    assert(IncrementalReport.consumedThrough(spark, repStore) == 0L)
    TxStore.append(attr, attrStore)
    val v = IncrementalReport.advance(spark, attrStore, repStore, sd, cv)
    assert(IncrementalReport.consumedThrough(spark, repStore) == v)
  }

  test("a rewrite on the attribution store fails the step loudly") {
    val attrStore = freshPath("attr4")
    val repStore = freshPath("rep4")
    val attr = attribution
    val cv = Tables.conversions(spark, dir)
    val sd = sessionData
    TxStore.append(attr.filter(col("conversion_id") % 2 === 0), attrStore)
    IncrementalReport.advance(spark, attrStore, repStore, sd, cv)
    val deleted = TxStore.delete(spark, attrStore, col("conversion_id") % 10 === 0)
    assert(deleted.nonEmpty, "rewrite commit was not created")
    val e = intercept[IllegalArgumentException] {
      IncrementalReport.advance(spark, attrStore, repStore, sd, cv)
    }
    assert(e.getMessage.contains("rewrite commits"))
  }
}
