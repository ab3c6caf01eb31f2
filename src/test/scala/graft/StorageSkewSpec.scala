package graft

import graft.ops.Skew
import graft.sources.Compaction
import graft.streaming.{StreamingIngest, StreamingJoin}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** Round-5 surface: salted join (result-invariance + spread), compaction
  * (file sizing, identity, disjoint sorted ranges), and the stream-stream
  * interval join (stream == batch across micro-batch boundaries). */
class StorageSkewSpec extends SparkSpec {

  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(s"graft-$prefix").toString

  // ── Skew.saltedJoin ────────────────────────────────────────────────

  test("salted join result is identical to the plain join (inner and left)") {
    val dir = sf("sf0.001")
    val facts = Tables.lineitem(spark, dir).select("l_partkey", "l_quantity")
    val dim = Tables.part(spark, dir)
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))
      // drop some dim keys so inner loses rows and left manufactures nulls
      .filter(col("l_partkey") % 5 =!= 0)
    for (jt <- Seq("inner", "left")) {
      val plain = facts.join(dim, Seq("l_partkey"), jt)
        .groupBy("p_brand").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      val salted = Skew.saltedJoin(facts, dim, "l_partkey", salt = 8, joinType = jt)
        .groupBy("p_brand").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(salted === plain, s"joinType=$jt")
    }
  }

  test("salting spreads a hot key across sub-keys") {
    // one key carrying 96% of the rows — the shape AQE can't fix before
    // runtime stats exist
    val hot = spark.range(96000).select(lit(7L).as("k"), col("id").as("v"))
      .union(spark.range(4000).select((col("id") % 100).as("k"), col("id").as("v")))
    val dim = spark.range(100).select(col("id").as("k"), concat(lit("d"), col("id")).as("attr"))
    val salt = 16
    val joined = Skew.saltedJoin(hot, dim, "k", salt)
    assert(joined.count() === 100000L)
    // measure the spray itself (same value-hash the op uses — retry-stable,
    // never a physical row id): the hot key's rows must land in all
    // `salt` sub-keys, with no sub-key holding more than ~2× its share
    val spread = hot
      .withColumn("__salt", pmod(xxhash64(col("k"), col("v")), lit(salt.toLong)))
      .filter(col("k") === 7).groupBy("__salt").count()
      .collect().map(_.getLong(1))
    assert(spread.length === salt, s"hot key only reached ${spread.length}/$salt sub-keys")
    assert(spread.max < 2L * 96000 / salt,
      s"spray is lopsided: max sub-key ${spread.max} rows")
  }

  test("salted join rejects dim-preserving join types") {
    val df = spark.range(2).select(col("id").as("k"))
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(df, df, "k", 4, joinType = "right")
    }
  }

  // ── Compaction ─────────────────────────────────────────────────────

  test("compact merges a scattered directory into size-targeted files") {
    val in = tmpDir("compact-in")
    val out = tmpDir("compact-out")
    Tables.events(spark, sf("sf0.001")).repartition(32)
      .write.mode("overwrite").parquet(in)
    val (filesIn, bytesIn) = Compaction.dirStats(spark, in)
    assert(filesIn === 32L)
    // target ~¼ of the input ⇒ expect exactly ceil(bytes/target) = 4 files
    val target = bytesIn / 4 + 1
    val back = Compaction.compact(spark, in, out, targetBytes = target)
    val (filesOut, _) = Compaction.dirStats(spark, out)
    assert(filesOut === 4L, s"expected 4 compacted files, found $filesOut")
    // identity: same multiset of rows
    assert(back.count() === 1000L)
    assert(back.select(sum("event_id")).as[Long].head() ===
      Tables.events(spark, sf("sf0.001")).select(sum("event_id")).as[Long].head())
  }

  test("compactSorted produces files with disjoint key ranges") {
    val in = tmpDir("sorted-in")
    val out = tmpDir("sorted-out")
    Tables.events(spark, sf("sf0.001")).repartition(32)
      .write.mode("overwrite").parquet(in)
    val (_, bytes) = Compaction.dirStats(spark, in)
    Compaction.compactSorted(spark, in, out, Seq("user_id", "event_id"),
      targetBytes = bytes / 4 + 1)
    // each output file owns a disjoint (user_id, event_id) slice ⇒ parquet
    // min/max footers prune files for user_id predicates
    val ranges = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(
        min(struct(col("user_id"), col("event_id"))).as("lo"),
        max(struct(col("user_id"), col("event_id"))).as("hi"))
      .select(col("lo.user_id"), col("lo.event_id"), col("hi.user_id"), col("hi.event_id"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .sortBy(_._1)
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) =>
        assert(implicitly[Ordering[(Long, Long)]].lt(hi, lo),
          s"overlapping file ranges: $hi vs $lo")
      case _ =>
    }
  }

  test("compactZOrder clusters BOTH dimensions; lexicographic sort only the first") {
    val in = tmpDir("zorder-in")
    val zOut = tmpDir("zorder-out")
    val sOut = tmpDir("zorder-sorted-out")
    Tables.events(spark, sf("sf0.001")).repartition(32)
      .write.mode("overwrite").parquet(in)
    val (_, bytes) = Compaction.dirStats(spark, in)
    val target = bytes / 16 + 1 // ~16 files → 4 curve bits → 2 bits per dim
    val zBack = Compaction.compactZOrder(spark, in, zOut, Seq("user_id", "event_id"), target)
    Compaction.compactSorted(spark, in, sOut, Seq("user_id", "event_id"), target)

    // identity first: clustering is a pure physical rewrite
    val before = spark.read.parquet(in).select("event_id").as[Long].collect().toSet
    assert(zBack.select("event_id").as[Long].collect().toSet === before)

    // per-file min/max envelope width, normalized by the column's domain —
    // exactly the statistic parquet footer pruning runs on
    def avgWidth(path: String, c: String): Double = {
      val domain = spark.read.parquet(path).agg(min(col(c)), max(col(c))).head()
      val span = (domain.getLong(1) - domain.getLong(0)).toDouble
      val w = spark.read.parquet(path)
        .groupBy(input_file_name()).agg(min(col(c)).as("lo"), max(col(c)).as("hi"))
        .select(((col("hi") - col("lo")) / span).as("w"))
        .agg(avg("w")).head().getDouble(0)
      w
    }
    // lexicographic: the SECOND key's envelopes span ~the whole domain
    // (no pruning for event_id-only predicates); z-order: both dims'
    // envelopes shrink to a fraction, at the cost of the first dim no
    // longer being near-zero width
    val zU = avgWidth(zOut, "user_id"); val zE = avgWidth(zOut, "event_id")
    val sE = avgWidth(sOut, "event_id")
    assert(sE > 0.8, s"lexicographic second-key envelope should be ~full domain, got $sE")
    assert(zU < 0.6 && zE < 0.6,
      s"z-order envelopes must shrink on BOTH dims, got user_id=$zU event_id=$zE")
    assert(zE < sE / 2, s"z-order must at least halve the second-key envelope: $zE vs $sE")
  }

  // ── Malformed input + schema drift (the two ways a lake bites) ──────

  test("JSON source captures corrupt records instead of failing the job") {
    val dir = tmpDir("corrupt-json")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part.json"),
      """{"event_id": 1, "user_id": 10, "event_type": "click"}
        |{"event_id": oops not json
        |{"event_id": 3, "user_id": 30, "event_type": "view"}
        |""".stripMargin)
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("_corrupt_record", StringType)))
    // PERMISSIVE (the default): bad lines become one row with the raw
    // text in _corrupt_record — at 100 TB a single bad line must never
    // kill the ingest; it lands in a quarantine filter instead
    val rows = spark.read.schema(schema).json(dir)
      .cache() // corrupt-record column can't be queried alone without it
    assert(rows.count() === 3)
    assert(rows.filter(col("_corrupt_record").isNotNull).count() === 1)
    assert(rows.filter(col("_corrupt_record").isNull).count() === 2)
    // DROPMALFORMED: quarantine-free variant keeps only parseable rows
    val dropped = spark.read
      .schema(StructType(schema.dropRight(1)))
      .option("mode", "DROPMALFORMED").json(dir)
    assert(dropped.count() === 2)
    rows.unpersist()
  }

  test("parquet schema evolution: mergeSchema unifies drifting file schemas") {
    import spark.implicits._
    val dir = tmpDir("schema-drift")
    // v1 files lack the column a later producer added
    Seq((1L, "a")).toDF("event_id", "event_type")
      .write.parquet(s"$dir/v=1")
    Seq((2L, "b", 0.5)).toDF("event_id", "event_type", "quality")
      .write.parquet(s"$dir/v=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("event_id", "event_type", "quality", "v"))
    val byId = merged.select("event_id", "quality").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(byId(1L).isEmpty, "pre-drift rows surface NULL for the new column")
    assert(byId(2L).contains(0.5))
  }

  // ── Sampling (the DEFAULT xxhash bucketer — the oracle twins pin the
  //    portable modBucket path) ─────────────────────────────────────────

  test("hash split is disjoint, exhaustive, near the weights, and frozen") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    val split = graft.ops.Sampling.hashSplit(
      docs, col("doc_id"), Seq(("train", 80), ("val", 10), ("test", 10)))
    val counts = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum
    assert(n === docs.count(), "split must be exhaustive")
    assert(counts.keySet === Set("train", "val", "test"))
    // xxhash spreads uniformly: each split within ±35% of its weight
    assert(math.abs(counts("train") - 0.8 * n) < 0.35 * 0.8 * n, counts.toString)
    assert(math.abs(counts("val") - 0.1 * n) < 0.35 * 0.1 * n, counts.toString)
    // frozen: the same doc gets the same verdict on re-evaluation and
    // under a different partition layout (rand()-based splits fail this)
    val a = split.select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = graft.ops.Sampling.hashSplit(
        docs.repartition(7), col("doc_id"), Seq(("train", 80), ("val", 10), ("test", 10)))
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b, "split membership must not depend on layout or run")
  }

  test("mixture rates downsample per source deterministically") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    val mixed = graft.ops.Sampling.sampleByRates(
      docs, col("source"), Map("src0" -> 100, "src1" -> 0), col("doc_id"), defaultRate = 50)
    val bySource = mixed.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource("src0") === totals("src0"), "rate 100 keeps everything")
    assert(!bySource.contains("src1"), "rate 0 drops everything")
    val others = totals.filterNot(kv => kv._1 == "src0" || kv._1 == "src1").values.sum
    val keptOthers = bySource.filterNot(kv => kv._1 == "src0" || kv._1 == "src1").values.sum
    assert(math.abs(keptOthers - 0.5 * others) < 0.35 * 0.5 * others,
      s"default rate 50 kept $keptOthers of $others")
  }

  test("NULL keys stay deterministic: bucket 0, first split, kept in mixtures") {
    import spark.implicits._
    val df = Seq(Some(5L), None, Some(42L)).toDF("k")
    val split = graft.ops.Sampling.hashSplit(
      df, col("k"), Seq(("train", 80), ("val", 10), ("test", 10)),
      graft.ops.Sampling.modBucket)
    assert(split.filter(col("split").isNull).count() === 0,
      "a NULL key must not fall out of every split")
    assert(split.filter(col("k").isNull).select("split").head().getString(0) === "train")
    val kept = graft.ops.Sampling.sampleByRates(
      df.withColumn("src", lit("s")), col("src"), Map("s" -> 50), col("k"),
      bucketFn = graft.ops.Sampling.modBucket)
    assert(kept.filter(col("k").isNull).count() === 1, "NULL key dropped from mixture")
  }

  test("temperature mixing flattens toward √n shares under the row budget") {
    import spark.implicits._
    // hand-sized corpus: n = (400, 100, 25) → q = (20, 10, 5), S = 35.
    // With T = 175 the flattened shares T·q/S are exactly (100, 50, 25),
    // i.e. rates (25%, 50%, 100%) — the big source downsamples 4×, the
    // middle 2×, the small one is taken whole (cap).
    val df = ((0 until 400).map(i => (i.toLong, "big")) ++
      (0 until 100).map(i => (i.toLong, "mid")) ++
      (0 until 25).map(i => (i.toLong, "small"))).toDF("k", "src")
    val rates = graft.ops.Sampling.temperatureRates(df, col("src"), targetRows = 175L)
    assert(rates === Map("big" -> 25, "mid" -> 50, "small" -> 100))
    // modBucket with dense 0..n keys realizes the rates exactly
    val kept = graft.ops.Sampling.temperatureMixture(
        df, col("src"), col("k"), 175L, graft.ops.Sampling.modBucket)
      .groupBy("src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept === Map("big" -> 100L, "mid" -> 50L, "small" -> 25L))
    // α=1/2 flattening, visibly: natural shares 76/19/5% → mixed 57/29/14%
    assert(kept("big") < 400 * 175 / 525, "big source must be under its natural share")
  }

  test("table diff classifies added/removed/changed/unchanged; NULL fields compare equal") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("v", LongType, nullable = false)))
    def frame(rows: Row*) =
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    val before = frame(Row(1L, "a", 10L), Row(2L, null, 20L), Row(3L, "c", 30L))
    val after = frame(Row(2L, null, 20L), Row(3L, "c", 31L), Row(4L, "d", 40L))
    val got = graft.ops.Diff.diffTables(before, after, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(
      1L -> "removed",
      // a NULL name on both sides must read UNCHANGED, not changed —
      // the struct comparison is null-safe field-wise
      2L -> "unchanged",
      3L -> "changed",
      4L -> "added"))
  }

  test("stratified quota sampling keeps the exact per-stratum share") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    val kept = graft.ops.Sampling.stratifiedHead(docs, col("lang"), col("doc_id"), 20)
    val keptBy = kept.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totalBy = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(keptBy.keySet === totalBy.keySet, "every stratum must be represented")
    totalBy.foreach { case (lang, n) =>
      assert(keptBy(lang) === math.ceil(n * 0.2).toLong, s"lang=$lang n=$n kept=${keptBy(lang)}")
    }
    // membership is frozen under a different layout
    val a = kept.select("doc_id").as[Long].collect().sorted
    val b = graft.ops.Sampling.stratifiedHead(docs.repartition(7), col("lang"), col("doc_id"), 20)
      .select("doc_id").as[Long].collect().sorted
    assert(a.sameElements(b))
  }

  // ── Profiling ──────────────────────────────────────────────────────

  test("profile computes exact per-column stats in one aggregate") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val prof = graft.ops.Profiling.profile(docs, Seq("doc_id"), Seq("lang"))
      .collect().map(r => r.getString(0) -> r).toMap
    val n = docs.count()
    assert(prof("doc_id").getLong(1) === n)
    assert(prof("doc_id").getLong(2) === 0L) // no null ids
    assert(prof("doc_id").getLong(3) === n)  // ids unique
    assert(prof("lang").getLong(3) ===
      docs.select("lang").distinct().count())
    assert(prof("lang").getString(6) !== null) // min_str populated
    assert(prof("doc_id").isNullAt(6))         // num col: no str lane
    // approx mode agrees within HLL++ tolerance
    val approx = graft.ops.Profiling.profile(docs, Seq("doc_id"), Seq("lang"), exact = false)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(math.abs(approx("doc_id") - n) < 0.1 * n)
  }

  test("profiling an empty drop reads zeros, not NULLs") {
    // the ingest-gate case: an empty landing directory must profile as
    // n_rows=0 / n_nulls=0 / n_distinct=0, never NULL counters
    val empty = Tables.documents(spark, sf("sf0.001")).filter(col("doc_id") < 0)
    val prof = graft.ops.Profiling.profile(empty, Seq("doc_id"), Seq("lang"))
      .collect().map(r => r.getString(0) -> r).toMap
    for (c <- Seq("doc_id", "lang")) {
      assert(prof(c).getLong(1) === 0L)
      assert(!prof(c).isNullAt(2) && prof(c).getLong(2) === 0L, s"$c n_nulls must be 0")
      assert(prof(c).getLong(3) === 0L)
    }
  }

  // ── StreamingJoin ──────────────────────────────────────────────────

  test("stream-stream interval join equals the batch range join across micro-batches") {
    val dir = sf("sf0.001")
    val landing = tmpDir("ssjoin-landing")
    // split the fixture into two landing files so maxFilesPerTrigger=1
    // forces conversions and sessions to meet ACROSS micro-batches —
    // only the join's state store can produce those matches
    val ev = Tables.events(spark, dir)
    ev.filter(col("event_id") % 2 === 0).coalesce(1)
      .write.mode("overwrite").parquet(s"$landing/a")
    ev.filter(col("event_id") % 2 === 1).coalesce(1)
      .write.mode("overwrite").parquet(s"$landing/b")
    val stream = StreamingIngest.readEvents(
      spark, s"$landing/*", maxFilesPerTrigger = 1)
    val joined = StreamingJoin.convSessionInterval(
      stream.filter(col("event_type") === "purchase"),
      stream.filter(col("event_type") =!= "purchase"))
    val ckpt = tmpDir("ssjoin-ckpt")
    val q = joined.writeStream
      .format("memory").queryName("ssjoin")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000), "stream timed out")
    val streamed = spark.table("ssjoin")
      .select("conv_id", "session_id").as[(Long, Long)].collect().toSet

    // batch twin at the operator's µs resolution contract (event time in
    // Spark streaming is TimestampType = µs; raw-ns comparison would
    // disagree on pairs within 1 µs of a boundary)
    val conv = Tables.conversions(spark, dir)
      .withColumn("conv_us", expr("conv_ts div 1000"))
    val sess = Tables.sessions(spark, dir)
      .withColumn("sess_us", expr("ts div 1000"))
    val batch = sess.join(conv,
        sess("user_id") === conv("user_id") &&
          sess("sess_us") >= conv("conv_us") - lit(3600L * 1000000L) &&
          sess("sess_us") <= conv("conv_us"))
      .select(col("conv_id"), col("session_id")).as[(Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("left-outer stream-stream join: matches equal batch, null rows only for truly sessionless conversions") {
    val dir = sf("sf0.001")
    val landing = tmpDir("ssjoin-outer-landing")
    Tables.events(spark, dir).coalesce(1)
      .write.mode("overwrite").parquet(s"$landing/a")
    val stream = StreamingIngest.readEvents(spark, s"$landing/*")
    val joined = StreamingJoin.convSessionInterval(
      stream.filter(col("event_type") === "purchase"),
      stream.filter(col("event_type") =!= "purchase"),
      joinType = "left_outer")
    val ckpt = tmpDir("ssjoin-outer-ckpt")
    val q = joined.writeStream
      .format("memory").queryName("ssjoin_outer")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000), "stream timed out")
    val out = spark.table("ssjoin_outer").collect()
    val matched = out.filter(!_.isNullAt(1)).map(r => (r.getLong(0), r.getLong(1))).toSet
    val nullRows = out.filter(_.isNullAt(1)).map(_.getLong(0)).toSet

    val conv = Tables.conversions(spark, dir).withColumn("conv_us", expr("conv_ts div 1000"))
    val sess = Tables.sessions(spark, dir).withColumn("sess_us", expr("ts div 1000"))
    val batchInner = sess.join(conv,
        sess("user_id") === conv("user_id") &&
          sess("sess_us") >= conv("conv_us") - lit(3600L * 1000000L) &&
          sess("sess_us") <= conv("conv_us"))
      .select(col("conv_id"), col("session_id")).as[(Long, Long)].collect().toSet
    // matched side must be exactly the batch inner join
    assert(matched === batchInner)
    // null rows: ONLY for conversions with no in-window session at all —
    // and only those the final watermark could already prove sessionless
    // (AvailableNow stops with tail conversions still pending in state,
    // carried by the checkpoint into the next incremental run)
    val sessionless = conv.select("conv_id").as[Long].collect().toSet --
      batchInner.map(_._1)
    assert(nullRows.subsetOf(sessionless),
      s"null rows for conversions that HAVE sessions: ${nullRows -- sessionless}")
    assert((nullRows & matched.map(_._1)).isEmpty,
      "a conversion must not appear both matched and null")
  }

  test("streaming foreachBatch into the partitioned upsert store converges to exactly-once") {
    val dir = sf("sf0.001")
    val landing = tmpDir("sink-landing")
    val store = tmpDir("sink-store") + "/tbl"
    // three micro-batches: days 1–15, days 16–30, then days 1–15 AGAIN
    // (at-least-once redelivery). The store must end with all 30 date
    // partitions — a batch touching only later dates must NOT wipe the
    // earlier partitions (the static-overwrite failure mode when the
    // write runs under foreachBatch's CLONED session), and the
    // redelivered batch must upsert, not append.
    val ev = Tables.events(spark, dir)
    val cut = "2024-01-16"
    val firstHalf = ev.filter(
      date_format(Tables.tsMicros("ts"), "yyyy-MM-dd") < cut)
    val secondHalf = ev.filter(
      date_format(Tables.tsMicros("ts"), "yyyy-MM-dd") >= cut)
    // land as FLAT files (the file source does not recurse): write each
    // batch to scratch, move its single part file into the landing dir
    def land(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val scratch = tmpDir(s"sink-scratch-$name")
      df.coalesce(1).write.mode("overwrite").parquet(scratch)
      val part = new java.io.File(scratch).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(
        part.toPath, java.nio.file.Paths.get(landing, s"$name.parquet"))
    }
    land(firstHalf, "a")
    land(secondHalf, "b")
    land(firstHalf, "c")
    val ckpt = tmpDir("sink-ckpt")
    val q = StreamingIngest.readEvents(spark, landing, maxFilesPerTrigger = 1)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.sources.PartitionedStore.upsertByDate(
          spark, batch.select("event_id", "ts", "value"),
          tsCol = "ts", keyCol = "event_id", path = store)
      }
      .start()
    assert(q.awaitTermination(180000), "stream timed out")
    val stored = spark.read.parquet(store)
    assert(stored.select(countDistinct("date")).as[Long].head() === 30L,
      "a later-dates batch wiped earlier date partitions (static overwrite)")
    assert(stored.count() === 1000L, "redelivered micro-batch must upsert, not append")
    assert(stored.select(sum("event_id")).as[Long].head() ===
      Tables.events(spark, dir).select(sum("event_id")).as[Long].head())
  }
}
