package graft

import graft.sources.{GraftScanEvents, TxStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The DataSource v2 provider: `spark.read.format("graft")` must read
  * byte-identically to the TxStore v1 API across every table shape
  * (flat, partitioned, column-mapped, deletion-vectored), prune files
  * inside Catalyst from the SAME log walk `readWhere` uses, and accept
  * runtime (dynamic-pruning) filters at execution start. */
class GraftDataSourceSpec extends SparkSpec {

  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-dsv2").toString + "/t"

  private def rows(n: Int, from: Int = 0) =
    (from until from + n).map(i => (i.toLong, s"v$i")).toDF("id", "payload")

  private def v2(path: String): DataFrame = spark.read.format("graft").load(path)

  /** Order-insensitive frame comparison by aligned column names. */
  private def assertSame(got: DataFrame, want: DataFrame): Unit = {
    val cols = want.columns.sorted.toSeq
    val g = got.select(cols.map(col): _*).collect().map(_.toSeq).sortBy(_.mkString("|"))
    val w = want.select(cols.map(col): _*).collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(g.toSeq === w.toSeq)
  }

  test("v2 read round-trips a flat table; schema is the log schema") {
    val t = tmpDir()
    TxStore.append(rows(10), t)
    TxStore.append(rows(5, from = 10), t)
    val df = v2(t)
    assert(df.schema.fieldNames.toSeq === Seq("id", "payload"))
    assertSame(df, TxStore.read(spark, t))
    assert(df.count() === 15) // empty-projection scan (count star)
  }

  test("v2 pushed filters prune the IDENTICAL file set readWhere prunes") {
    val t = tmpDir()
    // one file per id-century so min/max ranges separate cleanly
    for (c <- 0 until 4)
      TxStore.append(rows(100, from = c * 100).repartition(1), t)
    val pred = col("id") >= 250L && col("id") < 320L
    val (_, keptV1, skippedV1) = TxStore.pruneFiles(spark, t, pred)
    GraftScanEvents.clear(t)
    val got = v2(t).filter(pred)
    assert(got.count() === 70)
    val ev = GraftScanEvents.last(t).getOrElse(fail("scan recorded no planning event"))
    assert(ev.kept.toSet === keptV1.toSet,
      s"v2 kept ${ev.kept.size} files, readWhere kept ${keptV1.size}")
    assert(ev.skipped.toSet === skippedV1.toSet)
    assert(ev.skipped.nonEmpty, "the fixture must actually skip files")
    assertSame(v2(t).filter(pred), TxStore.readWhere(spark, t, pred))
  }

  test("v2 reads a hive-partitioned table with typed partition values") {
    val t = tmpDir()
    val df = (0 until 40).map(i => (i.toLong, i % 4, s"p$i")).toDF("id", "shard", "payload")
    TxStore.append(df, t, partitionBy = Seq("shard"))
    val got = v2(t)
    // partition columns surface LAST in the v2 schema (hive layout)
    assert(got.schema.fieldNames.toSeq.sorted === Seq("id", "payload", "shard"))
    assert(got.schema("shard").dataType === org.apache.spark.sql.types.IntegerType)
    assertSame(got, TxStore.read(spark, t))
    // a partition predicate prunes to that partition's files only
    GraftScanEvents.clear(t)
    assert(v2(t).filter(col("shard") === 2).count() === 10)
    val ev = GraftScanEvents.last(t).get
    assert(ev.kept.forall(_.startsWith("shard=2/")),
      s"partition pruning must keep only shard=2 files, kept ${ev.kept}")
  }

  test("v2 time travel: versionAsOf and timestampAsOf pin historical snapshots") {
    val t = tmpDir()
    TxStore.append(rows(10), t) // v1
    TxStore.append(rows(10, from = 10), t) // v2
    assert(spark.read.format("graft").option("versionAsOf", 1).load(t).count() === 10)
    assert(v2(t).count() === 20)
    val ts = graft.sources.TxStore.history(spark, t).last.version
    assert(ts === 2L)
    intercept[Exception](
      spark.read.format("graft").option("versionAsOf", 99).load(t).count())
  }

  test("v2 applies inline deletion vectors (row-index skip, row-based scan)") {
    val t = tmpDir()
    TxStore.append(rows(100).repartition(2), t)
    TxStore.deleteVectored(spark, t, col("id") % 10 === 3L)
    val got = v2(t)
    assert(got.count() === 90)
    assert(got.filter(col("id") % 10 === 3L).count() === 0)
    assertSame(got, TxStore.read(spark, t))
  }

  test("v2 applies parquet-vectored (sidecar) deletion vectors executor-side") {
    val t = tmpDir()
    TxStore.append(rows(200).repartition(2), t)
    TxStore.deleteVectoredBulk(spark, t, col("id") >= 150L)
    assertSame(v2(t), TxStore.read(spark, t))
    assert(v2(t).count() === 150)
  }

  test("v2 reads a column-mapped table under logical names; filters still prune") {
    val t = tmpDir()
    for (c <- 0 until 3)
      TxStore.append(rows(100, from = c * 100).repartition(1), t)
    TxStore.renameColumn(spark, t, "payload", "note")
    val got = v2(t)
    assert(got.schema.fieldNames.toSeq === Seq("id", "note"))
    assertSame(got, TxStore.read(spark, t))
    GraftScanEvents.clear(t)
    assert(v2(t).filter(col("id") === 250L).count() === 1)
    val ev = GraftScanEvents.last(t).get
    assert(ev.skipped.size === 2, s"mapped-table pruning must skip 2 of 3 files: $ev")
  }

  test("v2 runtime filtering: a broadcast dim filter prunes fact files at execution") {
    val t = tmpDir()
    // fact partitioned by region key — 8 partitions, one file each
    val fact = (0 until 800).map(i => (i.toLong, i % 8, i * 2.0))
      .toDF("order_id", "region_id", "amount")
    TxStore.append(fact, t, partitionBy = Seq("region_id"))
    // tiny dim: only regions 6 and 7 survive its filter. The dim must
    // be FILE-backed — a local relation constant-folds its filter away
    // and DPP (correctly) sees no selective predicate to reuse
    val dimPath = t + "_dim"
    (0 until 8).map(i => (i, if (i >= 6) "keep" else "drop"))
      .toDF("r_id", "flag").write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    GraftScanEvents.clear(t)
    val joined = v2(t)
      .join(broadcast(dim.filter(col("flag") === "keep")),
        col("region_id") === col("r_id"))
      .agg(sum("amount").as("total"), count(lit(1)).as("n"))
    val row = joined.head()
    assert(row.getLong(1) === 200L)
    val total = TxStore.snapshot(spark, t).files.size
    val ev = GraftScanEvents.last(t).getOrElse(fail("no planning event"))
    assert(ev.runtimeFilterCount > 0,
      "the scan must have received a runtime (dynamic pruning) filter")
    assert(ev.kept.nonEmpty && ev.kept.size < total,
      s"runtime filter must prune fact files: kept ${ev.kept.size} of $total; " +
        s"filters=${ev.runtimeFilters}")
    assert(ev.kept.forall(f => f.startsWith("region_id=6/") || f.startsWith("region_id=7/")),
      s"kept files must be the dim-selected partitions only: ${ev.kept}")
    assert(ev.kept.size === total / 4,
      s"exactly the two selected regions' files survive: ${ev.kept.size} vs $total/4")
  }

  test("v2 metadata-only aggregates: COUNT/MIN/MAX answer from log facts, zero files planned") {
    val t = tmpDir()
    val df = (0 until 300).map(i => (i.toLong, s"u${i % 7}", i * 1.5, i % 3))
      .toDF("id", "user", "score", "part")
    TxStore.append(df, t, partitionBy = Seq("part"))
    GraftScanEvents.clear(t)
    val got = v2(t).agg(
      count(lit(1)).as("n"), count(col("user")).as("nu"),
      min("id").as("min_id"), max("id").as("max_id"),
      min("score").as("lo"), max("score").as("hi"),
      min("user").as("u_lo"), max("user").as("u_hi"),
      min("part").as("p_lo"), max("part").as("p_hi")).head()
    assert(got.getLong(0) === 300L && got.getLong(1) === 300L)
    assert(got.getLong(2) === 0L && got.getLong(3) === 299L)
    assert(got.getDouble(4) === 0.0 && got.getDouble(5) === 448.5)
    assert(got.getString(6) === "u0" && got.getString(7) === "u6")
    assert(got.getInt(8) === 0 && got.getInt(9) === 2) // partition col, from path values
    val ev = GraftScanEvents.last(t).getOrElse(fail("no planning event"))
    assert(ev.aggregatePushed && ev.kept.isEmpty,
      s"aggregates must answer from log facts with zero files planned: $ev")

    // refusal paths stay CORRECT, just unpushed: DATA-column filters,
    // DISTINCT, unsupported funcs, and deletion marks (partition-only
    // filters and partition GROUP BYs push — separate tests below)
    GraftScanEvents.clear(t)
    assert(v2(t).filter(col("id") >= 100L).agg(count(lit(1))).head().getLong(0) === 200L)
    assert(!GraftScanEvents.last(t).exists(_.aggregatePushed))
    assert(v2(t).agg(countDistinct(col("user"))).head().getLong(0) === 7L)
    assert(v2(t).groupBy("part").count().count() === 3)
    assert(v2(t).agg(sum("id")).head().getLong(0) === (0L until 300L).sum)
    TxStore.deleteVectored(spark, t, col("id") === 5L)
    GraftScanEvents.clear(t)
    assert(v2(t).agg(count(lit(1))).head().getLong(0) === 299L,
      "deletion marks must fall back to the real scan")
    assert(!GraftScanEvents.last(t).exists(_.aggregatePushed))
  }

  test("v2 aggregate pushdown handles nulls exactly: proven-all-null files skip, NULL answers") {
    val t = tmpDir()
    TxStore.append((0 until 50).map(i => (i.toLong, None: Option[String]))
      .toDF("id", "payload").repartition(1), t) // all-null payload
    TxStore.append((50 until 90).map(i => (i.toLong, Some(s"v$i")))
      .toDF("id", "payload").repartition(1), t)
    GraftScanEvents.clear(t)
    val got = v2(t).agg(
      count(col("payload")).as("np"),
      min("payload").as("lo"), max("payload").as("hi")).head()
    assert(got.getLong(0) === 40L, "count(col) = rows minus logged nulls")
    assert(got.getString(1) === "v50" && got.getString(2) === "v89",
      "the proven-all-null file contributes nothing to min/max")
    assert(GraftScanEvents.last(t).exists(_.aggregatePushed))
    // a column that is null EVERYWHERE answers SQL NULL — from facts
    val t2 = tmpDir()
    TxStore.append((0 until 10).map(i => (i.toLong, None: Option[String]))
      .toDF("id", "payload"), t2)
    GraftScanEvents.clear(t2)
    val r2 = v2(t2).agg(min("payload"), max("payload"), count(col("payload"))).head()
    assert(r2.isNullAt(0) && r2.isNullAt(1) && r2.getLong(2) === 0L)
    assert(GraftScanEvents.last(t2).exists(_.aggregatePushed))
  }

  test("SQL over CREATE TABLE USING graft: pruning and aggregates ride the catalog path") {
    val t = tmpDir()
    for (c <- 0 until 4)
      TxStore.append(rows(100, from = c * 100).repartition(1), t)
    spark.sql(s"CREATE TABLE graft_sql_tab USING graft OPTIONS (path '$t')")
    try {
      GraftScanEvents.clear(t)
      assert(spark.sql("SELECT count(*) AS n FROM graft_sql_tab").head().getLong(0) === 400L)
      assert(GraftScanEvents.last(t).exists(_.aggregatePushed),
        "SQL count(*) must answer from log facts")
      GraftScanEvents.clear(t)
      assert(spark.sql(
        "SELECT count(*) AS n FROM graft_sql_tab WHERE id BETWEEN 150 AND 180")
        .head().getLong(0) === 31L)
      val ev = GraftScanEvents.last(t).get
      assert(ev.kept.size === 1 && ev.skipped.size === 3,
        s"SQL WHERE must prune from the log walk: $ev")
    } finally spark.sql("DROP TABLE graft_sql_tab")
  }

  test("v2 estimateStatistics reports log-fact sizes (broadcastable filtered reads)") {
    val t = tmpDir()
    for (c <- 0 until 4)
      TxStore.append(rows(100, from = c * 100).repartition(1), t)
    // a selective filter shrinks the reported size to the kept file(s)
    val full = v2(t).queryExecution.optimizedPlan.stats.sizeInBytes
    val pruned = v2(t).filter(col("id") < 50L).queryExecution.optimizedPlan.stats.sizeInBytes
    assert(pruned < full, s"pruned stats $pruned must be under full $full")
  }

  test("partition filters consume exactly: filtered aggregates push, data conjuncts refuse") {
    val t = tmpDir()
    val df = (0 until 300).map(i => (i.toLong, i % 3)).toDF("id", "part")
    TxStore.append(df, t, partitionBy = Seq("part"))
    GraftScanEvents.clear(t)
    val got = v2(t).filter(col("part") === 1)
      .agg(count(lit(1)).as("n"), min("id").as("lo"), max("id").as("hi")).head()
    assert(got.getLong(0) === 100L)
    assert(got.getLong(1) === 1L && got.getLong(2) === 298L)
    assert(GraftScanEvents.recent(t).exists(p => p.aggregatePushed && p.kept.isEmpty),
      "a partition-filtered aggregate must answer from facts, zero files planned")
    // the consumed filter needs no post-scan re-evaluation; rows exact
    assert(v2(t).filter(col("part") === 1).count() === 100L)
    assert(v2(t).filter(col("part") === 1).select(sum("id")).head().getLong(0)
      === (0L until 300L).filter(_ % 3 == 1).sum)
    // a data-column conjunct refuses the aggregate pushdown (stays right)
    GraftScanEvents.clear(t)
    assert(v2(t).filter(col("part") === 1 && col("id") >= 0L)
      .agg(count(lit(1))).head().getLong(0) === 100L)
    assert(!GraftScanEvents.recent(t).exists(_.aggregatePushed))
  }

  test("GROUP BY partition columns answers one row per live dir from facts") {
    val t = tmpDir()
    val df = (0 until 300).map(i => (i.toLong, i % 3, s"u${i % 5}"))
      .toDF("id", "part", "user")
    TxStore.append(df, t, partitionBy = Seq("part"))
    GraftScanEvents.clear(t)
    val g = v2(t).groupBy("part")
      .agg(count(lit(1)).as("n"), min("id").as("lo"), max("id").as("hi"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    assert(g.toSeq === Seq((0, 100L, 0L, 297L), (1, 100L, 1L, 298L), (2, 100L, 2L, 299L)))
    assert(GraftScanEvents.recent(t).exists(p => p.aggregatePushed && p.kept.isEmpty),
      "GROUP BY a partition column must answer from facts, zero files planned")
    // filtered + grouped composes: only the selected partitions' rows out
    GraftScanEvents.clear(t)
    val fg = v2(t).filter(col("part") >= 1).groupBy("part").agg(count(lit(1)).as("n"))
    assert(fg.collect().map(_.getLong(1)).toSeq === Seq(100L, 100L))
    assert(GraftScanEvents.recent(t).exists(p => p.aggregatePushed && p.kept.isEmpty))
    // grouping by a DATA column refuses (stays right through the scan)
    GraftScanEvents.clear(t)
    assert(v2(t).groupBy("user").count().count() === 5)
    assert(!GraftScanEvents.recent(t).exists(_.aggregatePushed))
  }

  test("null partition dirs: Kleene consumption semantics and NULL group keys") {
    val t = tmpDir()
    val df = Seq((1L, Some(1)), (2L, Some(1)), (3L, None), (4L, Some(2)))
      .toDF("id", "part")
    TxStore.append(df, t, partitionBy = Seq("part"))
    // NOT(part = 1) is NULL for the null dir — SQL drops those rows
    assert(v2(t).filter(not(col("part") === 1)).select("id")
      .as[Long].collect().toSet === Set(4L))
    assert(v2(t).filter(col("part").isNull).count() === 1L)
    assert(v2(t).filter(col("part").isNotNull).count() === 3L)
    // the NULL group surfaces from the null dir; count(part) excludes it
    GraftScanEvents.clear(t)
    assert(v2(t).groupBy("part").agg(count(lit(1))).count() === 3L)
    assert(GraftScanEvents.recent(t).exists(_.aggregatePushed))
    GraftScanEvents.clear(t)
    assert(v2(t).agg(count(col("part"))).head().getLong(0) === 3L)
    assert(GraftScanEvents.recent(t).exists(_.aggregatePushed))
  }

  test("metadata columns _file and _commit_version answer from the log") {
    val t = tmpDir()
    TxStore.append(rows(10).repartition(1), t) // v1
    TxStore.append(rows(5, from = 10).repartition(1), t) // v2
    // hidden: a bare read does not surface them …
    assert(!v2(t).columns.contains("_file"))
    // … but a by-name reference resolves, per-file constants from log
    // metadata (zero extra IO)
    val got = v2(t).select(col("id"), col("_file"), col("_commit_version")).collect()
    assert(got.forall(_.getString(1).endsWith(".parquet")))
    val versionById = got.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert((0L until 10L).forall(versionById(_) === 1L))
    assert((10L until 15L).forall(versionById(_) === 2L))
    assert(got.map(_.getString(1)).distinct.sorted.toSeq ===
      TxStore.snapshot(spark, t).files.sorted)
    // composes with hive partitions (meta rides AFTER partition values)
    val tp = tmpDir()
    TxStore.append((0 until 20).map(i => (i.toLong, i % 2)).toDF("id", "part"),
      tp, partitionBy = Seq("part"))
    val rows2 = v2(tp).select(col("part"), col("_file")).collect()
    assert(rows2.forall(r => r.getString(1).startsWith(s"part=${r.getInt(0)}/")))
  }

  test("string partition consumption is ASCII-guarded: non-ASCII literals stay post-scan") {
    import org.apache.spark.sql.catalyst.plans.logical
    val t = tmpDir()
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "pt")
    TxStore.append(df, t, partitionBy = Seq("pt"))
    // ASCII ordering consumes: the Filter node vanishes from the plan
    // (UTF-16 and UTF-8 binary orders provably agree on pure ASCII)
    val consumed = v2(t).filter(col("pt") >= "b")
    assert(consumed.queryExecution.optimizedPlan
      .collect { case f: logical.Filter => f }.isEmpty,
      "an ASCII partition comparison must be consumed (no post-scan Filter)")
    assert(consumed.count() === 2L)
    // a NON-ASCII literal must NOT be consumed — Java's UTF-16
    // code-unit order diverges from Spark's UTF-8 binary order above
    // the surrogate range (e.g. U+FFFF vs U+1F600), and a consumed
    // verdict is never re-checked. The guard keeps the comparison in
    // the post-scan Filter, where Spark evaluates it exactly. (The
    // wrong-verdict fixture itself — non-ASCII PARTITION DIRS — cannot
    // be written under this container's POSIX locale; the guard exists
    // for clusters that can.)
    val guarded = v2(t).filter(col("pt") > "π")
    assert(guarded.queryExecution.optimizedPlan
      .collect { case f: logical.Filter => f }.nonEmpty,
      "a non-ASCII literal must stay in the post-scan Filter")
    assert(guarded.count() === 0L)
  }

  test("prefix predicates prune files from string ranges; walk and scan agree") {
    val t = tmpDir()
    val df = (0 until 400).map(i => (i.toLong, f"k$i%05d")).toDF("id", "key")
    for (c <- 0 until 4)
      TxStore.append(
        df.filter(col("id") >= c * 100L && col("id") < (c + 1) * 100L).repartition(1), t)
    val (_, kept, skipped) = TxStore.pruneFiles(spark, t, col("key").startsWith("k001"))
    assert(kept.size === 1 && skipped.size === 3,
      s"the prefix must keep exactly the covering file (kept ${kept.size})")
    GraftScanEvents.clear(t)
    val got = v2(t).filter(col("key").startsWith("k001"))
    assert(got.count() === 100L)
    assert(GraftScanEvents.last(t).exists(p => p.kept.toSet == kept.toSet),
      "the v2 scan must skip the same prefix-refuted files")
    // a longer prefix narrows within the file; rows stay exact
    assert(v2(t).filter(col("key").startsWith("k0010")).count() === 10L)
    // a prefix ABOVE every range refutes everything
    val (_, kept2, _) = TxStore.pruneFiles(spark, t, col("key").startsWith("z"))
    assert(kept2.isEmpty)
    assert(v2(t).filter(col("key").startsWith("z")).count() === 0L)
  }

  test("group-key pushdown keys on TYPED values: equal-cast raws merge, unparseable types refuse") {
    // a convert-adopted foreign layout can carry raws that differ
    // textually but cast to one typed value: part=01 and part=1 on an
    // INT column must land ONE group row (complete pushdown — Spark
    // never re-merges), matching what the ordinary scan would emit
    val t = tmpDir() + "/estate"
    Seq((1L, "01"), (2L, "1"), (3L, "2"))
      .toDF("id", "part").write.partitionBy("part").parquet(t)
    TxStore.convert(spark, t)
    assert(v2(t).schema("part").dataType ===
      org.apache.spark.sql.types.IntegerType)
    GraftScanEvents.clear(t)
    val g = v2(t).groupBy("part").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
    assert(g === Seq((1, 2L), (2, 1L)),
      s"part=01 and part=1 must merge into one typed group (got $g)")
    assert(GraftScanEvents.recent(t).exists(p => p.aggregatePushed && p.kept.isEmpty),
      "the merged-key group-by must still answer from facts")

    // a type outside the exactly-parseable set (DATE — calendar parsing
    // is not worth an exactness bug) refuses the pushdown; the ordinary
    // scan answers and stays correct
    val d = tmpDir() + "/dated"
    Seq((1L, "2024-01-01"), (2L, "2024-01-01"), (3L, "2024-02-03"))
      .toDF("id", "part").write.partitionBy("part").parquet(d)
    TxStore.convert(spark, d)
    assert(v2(d).schema("part").dataType ===
      org.apache.spark.sql.types.DateType)
    GraftScanEvents.clear(d)
    val byDay = v2(d).groupBy("part").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).sorted.toSeq
    assert(byDay === Seq(("2024-01-01", 2L), ("2024-02-03", 1L)))
    assert(!GraftScanEvents.recent(d).exists(_.aggregatePushed),
      "a DATE group key must refuse the metadata pushdown")
  }

  test("v1 and v2 reads agree on COLUMN ORDER for partitioned tables") {
    val t = tmpDir()
    // partition column declared FIRST — the parquet factory emits it
    // last; the reorder wrapper must restore the declared order
    val df = Seq((0, 1L, "a"), (1, 2L, "b"), (0, 3L, "c")).toDF("part", "id", "payload")
    TxStore.append(df, t, partitionBy = Seq("part"))
    assert(v2(t).columns.toSeq === Seq("part", "id", "payload"))
    assert(v2(t).columns.toSeq === TxStore.read(spark, t).columns.toSeq)
    // positional consumers see identical rows in identical order of fields
    assert(v2(t).collect().map(_.toSeq).toSet ===
      TxStore.read(spark, t).collect().map(_.toSeq).toSet)
    // a projection keeps ITS order, wherever the partition column sits
    assert(v2(t).select("payload", "part", "id").columns.toSeq ===
      Seq("payload", "part", "id"))
    assert(v2(t).select("payload", "part", "id").head().toSeq.map(_.getClass.getSimpleName)
      === Seq("String", "Integer", "Long"))
    // deletion-vector path reorders too (row-based reader)
    TxStore.deleteVectored(spark, t, col("id") === 2L)
    assert(v2(t).columns.toSeq === Seq("part", "id", "payload"))
    assert(v2(t).collect().map(_.toSeq).toSet ===
      TxStore.read(spark, t).collect().map(_.toSeq).toSet)
  }
}
