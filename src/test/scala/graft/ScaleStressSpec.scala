package graft

import graft.ops.{Dedup, Sessionize, TemporalJoin}
import org.apache.spark.sql.functions._

/** Order-of-magnitude stress past the fixture: the fixture tops out at
  * ~100 k events (sf0.1); these drive the scale-bearing operators at
  * 10 M synthetic rows (generated with spark.range — synthetic PERF
  * input only; correctness inputs stay the driver fixtures) and assert
  * output invariants. The point is not timing (CI boxes vary) but that
  * nothing in these plans is secretly quadratic, driver-bound, or
  * memory-proportional-to-partition: a 10 M-row run completes in
  * seconds on local[4] IF the plan is the shape the scaladocs claim, and
  * blows the heap or the wall-clock budget if a regression sneaks in a
  * cross product, an unpartitioned window, or a collect. */
class ScaleStressSpec extends SparkSpec {

  private val N = 10000000L
  private val Users = 50000L

  /** 10 M events across 50 k users, ~4.6 days of µs timestamps. */
  private def bigEvents = {
    import spark.implicits._
    spark.range(N).select(
      col("id").as("event_id"),
      pmod(hash(col("id")), lit(Users)).cast("long").as("user_id"),
      (col("id") * 40000000L).as("ts_us"), // one event / 40 s globally
      pmod(col("id"), lit(97L)).as("payload"))
  }

  test("as-of join at 10M rows: one row per left key, no pair blow-up") {
    val left = bigEvents.filter(col("event_id") % 100 === 0)
      .select(col("event_id").as("probe_id"), col("user_id"), col("ts_us"))
    val out = TemporalJoin.asOfLatest(
      left, bigEvents.filter(col("event_id") % 100 =!= 0),
      key = "user_id", leftTs = "ts_us", rightTs = "ts_us",
      tieCol = "event_id", payload = Seq("matched_event" -> "event_id"))
    assert(out.count() === N / 100) // every probe row exactly once
  }

  test("sessionization at 10M rows keeps one output row per event") {
    val sessions = Sessionize.sessions(
      bigEvents.select(
        col("event_id"), col("user_id"),
        (col("ts_us") * 1000L).as("ts"))) // epoch-ns, the operator contract
    assert(sessions.count() === N)
  }

  test("keyed range join at 10M rows stays binned (no pair blow-up)") {
    val hour = 3600L * 1000000L
    val probes = bigEvents.filter(col("event_id") % 100 === 0)
      .select(col("event_id").as("probe_id"), col("user_id"),
        col("ts_us").as("probe_us")) // leftTs must not share rightTs's name
    val out = TemporalJoin.aggInWindow(
      probes, bigEvents.select(col("user_id"), col("ts_us"), col("payload")),
      leftId = "probe_id", leftTs = "probe_us", rightTs = "ts_us",
      widthMicros = hour,
      aggs = Seq(count(lit(1)).as("n")),
      keyCols = Seq("user_id"))
    // every probe matches at least itself (the probe row is in the right
    // side too, zero distance), so the result covers all probes
    assert(out.count() === N / 100)
  }

  test("salted join at 10M rows with a 90%-hot key completes and matches") {
    // 9 M rows on ONE key — the shape where a plain shuffle join puts
    // 90% of the probe side in a single task. Salting (16×) bounds the
    // largest task at ~1/16 of the hot key; the result must be
    // bit-identical to the unsalted join (here: checked via counts per
    // dim attribute, which a lost/duplicated row would shift).
    val facts = spark.range(N).select(
      when(col("id") % 10 =!= 0, lit(13L)).otherwise(pmod(col("id"), lit(1000L)))
        .as("k"),
      col("id").as("v"))
    val dim = spark.range(1000).select(
      col("id").as("k"), pmod(col("id"), lit(7L)).as("attr"))
    val out = graft.ops.Skew.saltedJoin(facts, dim, "k", salt = 16)
      .groupBy("attr").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // key 13 (attr 6) carries the 9M hot rows plus its 1-in-10 stripe
    val hot = out(13L % 7)
    assert(out.values.sum === N)
    assert(hot > (N * 9) / 10, s"hot-key rows missing: $out")
  }

  test("one-pass profile at 10M rows (exact distinct via single Expand scan)") {
    val prof = graft.ops.Profiling.profile(
        bigEvents, numCols = Seq("event_id", "user_id"), strCols = Seq())
      .collect().map(r => r.getString(0) -> r).toMap
    assert(prof("event_id").getLong(1) === N)
    assert(prof("event_id").getLong(3) === N)
    assert(prof("user_id").getLong(3) === Users)
    assert(prof("user_id").getDouble(5) === (Users - 1).toDouble)
  }

  test("exact dedup at 10M rows with 97x duplication collapses per key") {
    val deduped = Dedup.keepFirst(
      bigEvents.select(col("payload").as("k"), col("ts_us"), col("event_id")),
      keys = Seq("k"), orderCol = "ts_us", tieCol = "event_id")
    assert(deduped.count() === 97)
  }

  test("column mapping at 10M rows: rename keeps stats pruning through the translation") {
    // the s39 conservative tier at scale: a range-sorted table whose
    // per-file stats prune a selective read must prune IDENTICALLY
    // after a metadata-only rename — the logical→physical predicate
    // translation is O(1) per file, never a rewrite or rescan
    import graft.sources.TxStore
    val t = java.nio.file.Files.createTempDirectory("graft-scale-colmap").toString
    TxStore.append(
      bigEvents.repartitionByRange(32, col("event_id"))
        .sortWithinPartitions("event_id"), t)
    val (_, kept0, skip0) = TxStore.pruneFiles(spark, t, col("event_id") < N / 32)
    assert(skip0.size >= 28, s"sorted layout must prune, skipped ${skip0.size}/32")
    TxStore.renameColumn(spark, t, "event_id", "eid") // metadata-only
    val (_, kept1, skip1) = TxStore.pruneFiles(spark, t, col("eid") < N / 32)
    assert(kept1 === kept0 && skip1 === skip0,
      "rename must not change the pruning decision")
    val n = TxStore.readWhere(spark, t, col("eid") < N / 32).count()
    assert(n === N / 32, s"pruned read exact under the new name: $n")
  }

  test("small-file compaction at 300 files / 3 partitions bin-packs in one commit") {
    // the s44 shape at realistic FILE counts: the bin-packer and the
    // leaf→bin broadcast route are file-count-scale driver work; 300
    // trickle files across 3 hive partitions must fold into the
    // per-partition bin math in ONE commit, with per-dir output counts
    // matching ceil(dirSmallBytes / targetBytes) under interleaved
    // range routing (no hash-collision merges, no per-bin jobs)
    import graft.sources.TxStore
    val t = java.nio.file.Files.createTempDirectory("graft-scale-smallfiles").toString
    import spark.implicits._
    // 100 batches × 3 partitions × 20 rows — 300 tiny files
    val rows = (0 until 6000).map(i => (i.toLong, s"v$i", s"p${i % 3}"))
      .toDF("id", "payload", "bucket")
    for (w <- 0 until 100)
      TxStore.append(rows.filter($"id" % 100 === w).coalesce(1), t,
        partitionBy = Seq("bucket"))
    val before = TxStore.snapshot(spark, t)
    assert(before.files.size === 300, s"fixture: ${before.files.size} files")
    val maxLen = before.files.map(f => new java.io.File(s"$t/data/$f").length).max
    // target fits ~10 trickle files per bin → ~10 bins per partition
    val v = TxStore.compactSmallFiles(spark, t,
      targetBytes = maxLen * 10, minBytes = maxLen + 1)
    assert(v.isDefined)
    val c = TxStore.history(spark, t).last
    assert(c.op == "compact" && c.remove.size === 300, "one commit folds all 300")
    val after = TxStore.snapshot(spark, t)
    val perDir = after.files.groupBy(f => f.substring(0, f.indexOf('/')))
      .view.mapValues(_.size).toMap
    assert(perDir.keySet === Set("bucket=p0", "bucket=p1", "bucket=p2"))
    // 100 files/dir at ≤10 per bin → ≥10 bins; interleaved range
    // routing must not have merged same-dir bins into oversized files
    perDir.values.foreach(nf => assert(nf >= 10 && nf <= 14, s"per-dir files: $perDir"))
    after.files.foreach { f =>
      val len = new java.io.File(s"$t/data/$f").length
      assert(len <= maxLen * 13, s"no oversized merge: $f is $len bytes")
    }
    assert(TxStore.read(spark, t).count() === 6000, "pure physical rewrite")
  }
}
