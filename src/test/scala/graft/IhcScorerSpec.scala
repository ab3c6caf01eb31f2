package graft

import graft.ops.IhcScorer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.util.Random

/** Properties of the native IHC scorer (SURVEY.md §7.3): the reference's
  * only contract is Σ ihc = 1 ± 1e-4 per conversion with non-negative
  * weights (reference api_client.py:92–107, 132–136, 254–268). Property
  * cases are generated with a fixed seed (no scalatest-scalacheck bridge
  * in the offline dependency set). */
/** Static call recorder for the pacing test: referenced via class
  * loading (never serialized into the closure), so local-mode executor
  * threads and the test see ONE instance. */
object PacingRecorder {
  val calls = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
}

class IhcScorerSpec extends SparkSpec {

  import spark.implicits._

  private def journeysDf(rows: Seq[(Long, Long, Long, Long, Long, Long)]): DataFrame =
    rows.toDF("conversion_id", "session_id", "ts",
      "holder_engagement", "closer_engagement", "impression_interaction")

  private def randomJourneys(rnd: Random): Seq[(Long, Long, Long, Long, Long, Long)] = {
    val nConv = 1 + rnd.nextInt(8)
    (1 to nConv).flatMap { c =>
      val n = 1 + rnd.nextInt(12)
      (0 until n).map { i =>
        (c.toLong, c.toLong * 1000 + i, rnd.nextLong(1000000L),
          rnd.nextLong(2L), rnd.nextLong(2L), rnd.nextLong(2L))
      }
    }
  }

  test("property: ihc sums to 1 per conversion, all weights positive") {
    val rnd = new Random(42)
    (1 to 20).foreach { _ =>
      val scored = IhcScorer.score(journeysDf(randomJourneys(rnd)))
      val sums = scored.groupBy("conversion_id").agg(sum("ihc").as("s")).collect()
      assert(sums.nonEmpty)
      sums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-4, s"sum=${r.getDouble(1)}"))
      assert(scored.filter(col("ihc") <= 0.0).isEmpty, "non-positive weight")
    }
  }

  test("single-touchpoint journey gets exactly 1.0") {
    val scored = IhcScorer.score(journeysDf(Seq((1L, 10L, 5L, 1L, 0L, 1L)))).collect()
    assert(scored.length == 1 && scored.head.getDouble(2) == 1.0)
  }

  test("normalization is idempotent and rescales only outside tolerance") {
    val attr = Seq((1L, 10L, 0.5), (1L, 11L, 0.7), (2L, 20L, 0.99997), (2L, 21L, 0.00002))
      .toDF("conversion_id", "session_id", "ihc")
    val once = IhcScorer.normalize(attr)
    // conv 1: sum = 1.2 → rescaled; conv 2: sum = 0.99999, inside 1e-4 → untouched
    val m = once.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(m((1L, 10L)) - 0.5 / 1.2) < 1e-12)
    assert(m((2L, 20L)) == 0.99997 && m((2L, 21L)) == 0.00002)
    val twice = IhcScorer.normalize(once)
    assert(twice.collect().map(_.getDouble(2)).sorted
      .sameElements(once.collect().map(_.getDouble(2)).sorted))
  }

  test("scorer is deterministic under input row order") {
    val rows = Seq(
      (1L, 10L, 100L, 1L, 0L, 0L), (1L, 11L, 200L, 0L, 1L, 1L),
      (1L, 12L, 300L, 1L, 1L, 0L), (2L, 20L, 100L, 0L, 0L, 0L))
    def run(rs: Seq[(Long, Long, Long, Long, Long, Long)]) =
      IhcScorer.score(journeysDf(rs)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(t => (t._1, t._2))
    assert(run(rows).sameElements(run(rows.reverse)))
  }

  test("closer gets the largest share when engagement flags are equal") {
    // 3 touchpoints, no engagement: raw = initializer 10, holder 4, closer 12.
    val scored = IhcScorer.score(journeysDf(Seq(
      (1L, 10L, 100L, 0L, 0L, 0L), (1L, 11L, 200L, 0L, 0L, 0L), (1L, 12L, 300L, 0L, 0L, 0L))))
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(scored(12L) > scored(10L) && scored(10L) > scored(11L))
  }

  test("external-scorer boundary (mapPartitions) equals the native window scorer") {
    val rnd = new Random(7)
    val rows = randomJourneys(rnd)
    val j = journeysDf(rows)
    def canon(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(t => (t._1, t._2))
    // tiny batch limits force many request batches; result must not change
    val ext = graft.ops.ExternalScorer.score(j, maxJourneysPerRequest = 2, maxSessionsPerRequest = 5)
    assert(canon(ext).sameElements(canon(IhcScorer.score(j))))
  }

  test("external scorer retries a flaky transport inside the executor") {
    IhcScorerSpec.calls.set(0)
    val flaky: graft.ops.ExternalScorer.ScoreFn = batch => {
      // the first call ever fails; every retry (and later batch) succeeds
      if (IhcScorerSpec.calls.getAndIncrement() == 0)
        throw new RuntimeException("transient transport fault")
      graft.ops.ExternalScorer.localIhc(batch)
    }
    val j = journeysDf(randomJourneys(new Random(11)))
    val scored = graft.ops.ExternalScorer.score(j, flaky, backoffMs = 1L)
    def canon(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(t => (t._1, t._2))
    assert(canon(scored).sameElements(canon(IhcScorer.score(j))))
    assert(IhcScorerSpec.calls.get() >= 2, "the failing attempt must have been retried")
  }

  test("a poisoned batch surfaces per-conversion errors without killing the job") {
    val poison: graft.ops.ExternalScorer.ScoreFn = batch =>
      if (batch.exists(_.head.conversion_id == 2L))
        throw new RuntimeException("unscorable journey")
      else graft.ops.ExternalScorer.localIhc(batch)
    val j = journeysDf(Seq(
      (1L, 10L, 100L, 1L, 0L, 0L), (1L, 11L, 200L, 0L, 1L, 1L),
      (2L, 20L, 100L, 0L, 0L, 1L), (2L, 21L, 200L, 1L, 0L, 0L),
      (3L, 30L, 100L, 0L, 1L, 0L)))
    // one journey per request batch → exactly conversion 2 fails
    val out = graft.ops.ExternalScorer.scoreWithFailures(
      j, poison, maxJourneysPerRequest = 1, maxRetries = 1, backoffMs = 1L).collect()
    val byConv = out.groupBy(_.getLong(0))
    assert(byConv.keySet == Set(1L, 2L, 3L), "every conversion must appear")
    byConv(2L).foreach { r =>
      assert(r.isNullAt(2) && r.getString(3).contains("unscorable journey"))
    }
    (byConv(1L) ++ byConv(3L)).foreach(r => assert(!r.isNullAt(2) && r.isNullAt(3)))
    // and the log-and-continue shape (reference api_client.py:50–65):
    // score() drops the failed conversion, keeps the rest
    val kept = graft.ops.ExternalScorer.score(
      j, poison, maxJourneysPerRequest = 1, maxRetries = 1, backoffMs = 1L)
      .select("conversion_id").distinct().as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }

  test("inter-request pacing spaces transport calls within a partition (C3)") {
    PacingRecorder.calls.clear()
    val recording: graft.ops.ExternalScorer.ScoreFn = batch => {
      PacingRecorder.calls.add(
        (org.apache.spark.TaskContext.getPartitionId(), System.currentTimeMillis()))
      graft.ops.ExternalScorer.localIhc(batch)
    }
    // 12 single-touch conversions, 1 journey per request → ≥ 2 calls land
    // in SOME partition even spread across local[32]
    val j = journeysDf((1L to 12L).map(c => (c, c * 10, c, 1L, 0L, 0L)))
    graft.ops.ExternalScorer
      .score(j, recording, maxJourneysPerRequest = 1, minRequestIntervalMs = 80L)
      .count()
    import scala.jdk.CollectionConverters._
    val byPartition = PacingRecorder.calls.asScala.toSeq.groupBy(_._1).values.toSeq
    assert(byPartition.map(_.size).sum === 12, "one call per single-journey batch")
    assert(byPartition.exists(_.size >= 2), "need a partition with 2+ calls to observe pacing")
    byPartition.foreach { ps =>
      ps.map(_._2).sorted.sliding(2).foreach {
        case Seq(a, b) =>
          // Thread.sleep can wake a hair early; 70 ms still proves the
          // pause (un-paced consecutive local calls are < 5 ms apart)
          assert(b - a >= 70L, s"consecutive calls ${b - a} ms apart, expected ≥ 80")
        case _ => ()
      }
    }
  }

  test("session gate excludes a million-session conversion before the window") {
    // AQE does not split skewed window partitions — ungated, conversion 1
    // would serialize 10⁶ rows through one sorted window task. The gate
    // must remove it via the map-side-combined count, leaving the honest
    // conversion scored normally.
    val big = spark.range(1000000L).select(
      lit(1L).as("conversion_id"), col("id").as("session_id"), col("id").as("ts"),
      lit(0L).as("holder_engagement"), lit(0L).as("closer_engagement"),
      lit(0L).as("impression_interaction"))
    val small = journeysDf(Seq((2L, 20L, 100L, 1L, 0L, 0L), (2L, 21L, 200L, 0L, 1L, 0L)))
    val scored = IhcScorer.score(big.unionByName(small), maxSessions = Some(1000))
    val byConv = scored.collect().groupBy(_.getLong(0))
    assert(byConv.keySet == Set(2L), s"gate must drop conversion 1, got ${byConv.keySet}")
    assert(math.abs(byConv(2L).map(_.getDouble(2)).sum - 1.0) < 1e-12)
  }

  test("invariant report counts all conversions as ok") {
    val rows = (1 to 5).flatMap(c => (0 to c).map(i =>
      (c.toLong, c * 100L + i, i * 10L, (i % 2).toLong, 0L, 1L)))
    val rep = IhcScorer.invariantReport(IhcScorer.score(journeysDf(rows))).collect().head
    assert(rep.getLong(0) == 5L && rep.getLong(1) == 5L)
  }
}

/** JVM-static call counter: task closures are serialized even in local
  * mode, so the flaky transport counts attempts through this companion
  * rather than a captured field. */
object IhcScorerSpec {
  val calls = new java.util.concurrent.atomic.AtomicInteger(0)
}
