package graft

import graft.sources.{GraftScanEvents, TxStore}
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

/** The `spark.sql.catalog.graft` TableCatalog (VERDICT r16 #2):
  * name-addressed tables over the TxStore machinery — the catalog
  * holds no state of its own, so every lifecycle step below must be
  * observable in the table directory's own log. Also covers the
  * native `DELETE FROM` plan (VERDICT r16 #3): partition/metadata
  * deletes plan through Catalyst, row-level predicates refuse at
  * planning rather than paying a hidden copy-on-write. */
class GraftCatalogSpec extends SparkSpec {

  import spark.implicits._

  private lazy val warehouse: String = {
    val w = java.nio.file.Files.createTempDirectory("graft-catalog").toString
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", w)
    w
  }

  private def rows(n: Int, from: Int = 0) =
    (from until from + n).map(i => (i.toLong, s"v$i", i % 3)).toDF("id", "payload", "p")

  test("full lifecycle through catalog names: create, insert, read, time travel, rename, drop") {
    val w = warehouse
    spark.sql("CREATE NAMESPACE graft.db")
    spark.sql("CREATE TABLE graft.db.events (id BIGINT, payload STRING, p INT) " +
      "USING graft PARTITIONED BY (p)")
    val path = s"$w/db/events"
    assert(TxStore.isTable(spark, path), "the catalog table IS a table directory")
    assert(TxStore.history(spark, path).map(_.op) === Seq("create"))

    // insert routes through the v2 write; layout was established by CREATE
    spark.sql("INSERT INTO graft.db.events VALUES (1, 'a', 0), (2, 'b', 1), (3, 'c', 2)")
    assert(spark.table("graft.db.events").count() === 3)
    assert(TxStore.snapshot(spark, path).partitioning === Seq("p"))
    assert(TxStore.snapshot(spark, path).files.forall(_.startsWith("p=")),
      "files land under the hive layout the catalog CREATE declared")

    // column order: declared order, not partition-last (v1 ≡ v2)
    assert(spark.table("graft.db.events").columns.toSeq === Seq("id", "payload", "p"))

    // time travel through the catalog's loadTable overloads
    assert(spark.sql("SELECT * FROM graft.db.events VERSION AS OF 1").count() === 0)
    assert(spark.sql("SELECT * FROM graft.db.events VERSION AS OF 2").count() === 3)

    // rename is a directory move; the log travels with it (Spark's
    // RENAME TO names the destination without the catalog)
    spark.sql("ALTER TABLE graft.db.events RENAME TO db.events2")
    assert(!TxStore.isTable(spark, path))
    assert(spark.table("graft.db.events2").count() === 3)

    spark.sql("DROP TABLE graft.db.events2")
    assert(!new java.io.File(s"$w/db/events2").exists,
      "DROP deletes the managed directory")
    intercept[AnalysisException](spark.table("graft.db.events2").collect())
  }

  test("catalog reads plan the SAME pruned scan as path reads") {
    val w = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.prune")
    val path = s"$w/prune/t"
    for (c <- 0 until 4)
      TxStore.append(
        (c * 100 until (c + 1) * 100).map(i => (i.toLong, s"v$i")).toDF("id", "payload")
          .repartition(1), path)
    val (_, keptV1, _) = TxStore.pruneFiles(spark, path, col("id") >= 250L && col("id") < 320L)
    GraftScanEvents.clear(path)
    assert(spark.sql("SELECT count(*) AS n FROM graft.prune.t WHERE id >= 250 AND id < 320")
      .head().getLong(0) === 70L)
    val ev = GraftScanEvents.recent(path).find(_.kept.nonEmpty)
      .getOrElse(fail("catalog scan recorded no planning event"))
    assert(ev.kept.toSet === keptV1.toSet,
      "the catalog read must prune through the same log walk readWhere uses")
  }

  test("native DELETE: partition predicates plan metadata-only, row predicates refuse") {
    val w = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dml")
    spark.sql("CREATE TABLE graft.dml.t (id BIGINT, payload STRING, p INT) " +
      "USING graft PARTITIONED BY (p)")
    val path = s"$w/dml/t"
    spark.sql("INSERT INTO graft.dml.t SELECT id, payload, p FROM VALUES " +
      (0 until 30).map(i => s"(${i}L, 'v$i', ${i % 3})").mkString(", ") +
      " AS v(id, payload, p)")
    val vBefore = TxStore.snapshot(spark, path).version

    // partition delete: one remove-only commit, zero files staged
    spark.sql("DELETE FROM graft.dml.t WHERE p = 1")
    assert(spark.table("graft.dml.t").count() === 20)
    val c = TxStore.history(spark, path).find(_.version == vBefore + 1)
      .getOrElse(fail("no delete commit"))
    assert(c.op === "delete" && c.add.isEmpty && c.remove.nonEmpty,
      "a partition DELETE must be a remove-only metadata commit (no rewrite)")

    // unconditional delete = truncate: remove-all, still metadata-only
    spark.sql("DELETE FROM graft.dml.t")
    assert(spark.table("graft.dml.t").count() === 0)
    val t = TxStore.history(spark, path).last
    assert(t.op === "delete" && t.add.isEmpty)
    // schema and layout survive; time travel still reads the data
    assert(spark.table("graft.dml.t").columns.toSeq === Seq("id", "payload", "p"))
    assert(spark.sql(s"SELECT * FROM graft.dml.t VERSION AS OF $vBefore").count() === 30)

    // a row-level predicate must refuse at planning (no silent CoW)
    spark.sql("INSERT INTO graft.dml.t VALUES (1, 'x', 0)")
    val e = intercept[AnalysisException](spark.sql("DELETE FROM graft.dml.t WHERE id = 1"))
    assert(e.getMessage.toLowerCase.contains("delete"))
    assert(spark.table("graft.dml.t").count() === 1, "the refused DELETE changed nothing")
  }

  test("UPDATE and MERGE text resolve catalog names through SqlDml") {
    val w = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.updml")
    spark.sql("CREATE TABLE graft.updml.t (id BIGINT, payload STRING) USING graft")
    spark.sql("INSERT INTO graft.updml.t VALUES (1, 'a'), (2, 'b')")
    val path = s"$w/updml/t"

    val r = graft.sources.SqlDml.maybeExecute(spark,
      "UPDATE graft.updml.t SET payload = 'z' WHERE id = 2", Map.empty)
    assert(r.exists(_.op == "update"))
    assert(spark.table("graft.updml.t").where("id = 2").head().getString(1) === "z")
    assert(TxStore.history(spark, path).last.op === "update")

    Seq((2L, "m"), (3L, "n")).toDF("id", "payload").createOrReplaceTempView("updml_src")
    val m = graft.sources.SqlDml.maybeExecute(spark,
      "MERGE INTO graft.updml.t AS t USING updml_src AS s ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET payload = s.payload " +
        "WHEN NOT MATCHED THEN INSERT *", Map.empty)
    assert(m.exists(_.op == "merge"))
    assert(spark.table("graft.updml.t").orderBy("id").as[(Long, String)].collect().toSeq
      === Seq((1L, "a"), (2L, "m"), (3L, "n")))
  }

  test("CTAS, ALTER properties and columns, SHOW surfaces") {
    val w = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.meta")
    spark.sql("CREATE TABLE graft.meta.src USING graft AS SELECT 1L AS id, 'a' AS v")
    assert(spark.table("graft.meta.src").count() === 1)
    val path = s"$w/meta/src"
    assert(TxStore.history(spark, path).map(_.op).head === "create")

    spark.sql("ALTER TABLE graft.meta.src SET TBLPROPERTIES ('team' = 'graft', 'tier' = 'gold')")
    assert(TxStore.tableProperties(spark, path).toMap === Map("team" -> "graft", "tier" -> "gold"))
    spark.sql("ALTER TABLE graft.meta.src UNSET TBLPROPERTIES ('tier')")
    assert(TxStore.tableProperties(spark, path).toMap === Map("team" -> "graft"))

    spark.sql("ALTER TABLE graft.meta.src ADD COLUMN score DOUBLE")
    assert(spark.table("graft.meta.src").columns.toSeq === Seq("id", "v", "score"))
    spark.sql("ALTER TABLE graft.meta.src RENAME COLUMN v TO label")
    assert(spark.table("graft.meta.src").columns.toSeq === Seq("id", "label", "score"))
    spark.sql("ALTER TABLE graft.meta.src DROP COLUMN score")
    assert(spark.table("graft.meta.src").columns.toSeq === Seq("id", "label"))

    assert(spark.sql("SHOW TABLES IN graft.meta").collect().map(_.getString(1)).toSet
      === Set("src"))
    assert(spark.sql("SHOW NAMESPACES IN graft").collect().map(_.getString(0)).toSet
      .contains("meta"))
  }

  test("refusals: LOCATION, OPTIONS, bad identifiers, non-empty namespace, wrong provider") {
    val w = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ref")
    intercept[Exception](spark.sql(
      s"CREATE TABLE graft.ref.ext (id BIGINT) USING graft LOCATION '$w/elsewhere'"))
    intercept[Exception](spark.sql(
      "CREATE TABLE graft.ref.opt (id BIGINT) USING graft OPTIONS (path '/nope')"))
    intercept[Exception](spark.sql(
      "CREATE TABLE graft.ref.`bad/name` (id BIGINT) USING graft"))
    // a table creates; its namespace then refuses a non-cascade drop
    spark.sql("CREATE TABLE graft.ref.keep (id BIGINT) USING graft")
    intercept[Exception](spark.sql("DROP NAMESPACE graft.ref"))
    assert(TxStore.isTable(spark, s"$w/ref/keep"))
    spark.sql("DROP NAMESPACE graft.ref CASCADE")
    assert(!new java.io.File(s"$w/ref").exists)
    // appendOnly gates the native DELETE exactly like the API surface
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.gate")
    spark.sql("CREATE TABLE graft.gate.t (id BIGINT, p INT) USING graft " +
      "PARTITIONED BY (p) TBLPROPERTIES ('graft.appendOnly' = 'true')")
    spark.sql("INSERT INTO graft.gate.t VALUES (1, 0)")
    val e = intercept[Exception](spark.sql("DELETE FROM graft.gate.t WHERE p = 0"))
    assert(e.getMessage.contains("appendOnly"))
  }

  test("TRUNCATE TABLE and maintenance SQL address catalog names") {
    val w = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.maint")
    spark.sql("CREATE TABLE graft.maint.t (id BIGINT, payload STRING, p INT) " +
      "USING graft PARTITIONED BY (p)")
    val path = s"$w/maint/t"
    rows(30).write.format("graft").option("partitionBy", "p").mode("append").save(path)

    // TRUNCATE TABLE rides SupportsDeleteV2.truncateTable — one
    // remove-all metadata commit, schema/layout survive
    spark.sql("TRUNCATE TABLE graft.maint.t")
    assert(spark.table("graft.maint.t").count() === 0)
    val t = TxStore.history(spark, path).last
    assert(t.op === "delete" && t.add.isEmpty)
    assert(TxStore.snapshot(spark, path).partitioning === Seq("p"))

    // maintenance SQL resolves the same names (SqlResolve fallback)
    spark.sql("INSERT INTO graft.maint.t VALUES (1, 'a', 0), (2, 'b', 1)")
    val hist = graft.sources.SqlMaint.maybeExecute(spark,
      "DESCRIBE HISTORY graft.maint.t", Map.empty)
    assert(hist.isDefined)
    assert(hist.get.df.count() === TxStore.history(spark, path).size.toLong)
    val opt = graft.sources.SqlMaint.maybeExecute(spark,
      "OPTIMIZE graft.maint.t", Map.empty)
    assert(opt.isDefined)
    // an unknown catalog name still refuses loudly
    val e = intercept[Exception](graft.sources.SqlMaint.maybeExecute(spark,
      "DESCRIBE HISTORY graft.maint.nope", Map.empty))
    assert(e.getMessage.contains("graft-catalog") || e.getMessage.contains("not a"))
  }
}
