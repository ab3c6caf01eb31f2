package graft.sources

import java.util.Locale

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, NonEmptyNamespaceException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Name-addressed transactional tables — a `TableCatalog` plugin over
  * the TxStore machinery (VERDICT r16 #2), the same rung Delta and
  * Iceberg ship:
  *
  * {{{
  * spark.sql.catalog.graft           = graft.sources.GraftCatalog
  * spark.sql.catalog.graft.warehouse = /lake/graft
  *
  * CREATE NAMESPACE graft.db
  * CREATE TABLE graft.db.events (id BIGINT, v STRING, p INT)
  *   USING graft PARTITIONED BY (p)
  * INSERT INTO graft.db.events VALUES …
  * SELECT * FROM graft.db.events VERSION AS OF 3
  * DELETE FROM graft.db.events WHERE p = 1      -- native v2 plan
  * DROP TABLE graft.db.events
  * }}}
  *
  * Layout is the warehouse convention every lake catalog uses: a
  * namespace is a directory under the warehouse root, a table is a
  * directory holding a commit log — `warehouse/ns…/name`. The catalog
  * holds NO state of its own: existence, schema, layout, properties
  * all live in the table's log (listing = directory walk, loading =
  * snapshot replay), so a catalog restart — or a second cluster
  * pointing at the same warehouse — sees exactly the committed truth.
  * All tables are MANAGED: `DROP TABLE` deletes the directory, data
  * and log (the managed-table contract; external path-addressed tables
  * ride `format("graft").load(path)` instead, and `LOCATION` here
  * refuses rather than creating a table the catalog could never find
  * again by name).
  *
  * Time travel plans through the catalog's own `loadTable` overloads:
  * `VERSION AS OF n` pins [[TxStore.snapshotAt]], `TIMESTAMP AS OF ts`
  * resolves through [[TxStore.versionAtTimestamp]] — the same
  * snapshots `option("versionAsOf")` pins on the path surface.
  *
  * Reference: the challenge stores tables as bare SQLite names
  * (db_operations.py:10-69); this is that naming surface re-derived on
  * the lake — names resolve to transactional directories, not a
  * metastore row. */
final class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: String = _

  private def spark: SparkSession = SparkSession.active
  private def fs: FileSystem =
    new Path(warehouse).getFileSystem(spark.sessionState.newHadoopConf())

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).map(_.trim).filter(_.nonEmpty)
      .getOrElse(throw new IllegalArgumentException(
        s"graft catalog '$name': set spark.sql.catalog.$name.warehouse to the " +
          "warehouse root directory"))
    // the default namespace exists from the first touch — `USE graft`
    // followed by an unqualified CREATE must not demand a bootstrap
    fs.mkdirs(new Path(s"$warehouse/default")): Unit
  }

  override def name(): String = catalogName

  override def defaultNamespace(): Array[String] = Array("default")

  // ── identifier ↔ path ────────────────────────────────────────────
  // Names ARE directory names, so the grammar is the filesystem's
  // portable-safe subset: ASCII letters/digits/_/-/., no separators, no
  // dot-runs, nothing hidden or log-reserved. The container JVM cannot
  // even open non-ASCII paths (POSIX sun.jnu.encoding), so the ASCII
  // gate is honesty, not conservatism.
  private def validSegment(s: String): Boolean =
    s.nonEmpty && s.length <= 255 && s != "." && s != ".." &&
      !s.startsWith(".") && !s.startsWith("_") &&
      s.forall(c => c.isLetterOrDigit && c < 128 || c == '_' || c == '-' || c == '.')

  private def checkSegments(parts: Seq[String], what: String): Unit =
    parts.foreach(p => require(validSegment(p),
      s"graft catalog: invalid $what segment '$p' — ASCII letters, digits, " +
        "'_', '-', '.' only; must not start with '.' or '_'"))

  private def nsPath(namespace: Seq[String]): String = {
    checkSegments(namespace, "namespace")
    (warehouse +: namespace).mkString("/")
  }

  /** The table directory an identifier resolves to — shared with
    * [[SqlDml]]'s catalog-name resolution so SQL DML text and the
    * catalog plan against the same path. */
  def tablePath(ident: Identifier): String = {
    checkSegments(ident.namespace.toSeq :+ ident.name, "identifier")
    (warehouse +: ident.namespace.toSeq :+ ident.name).mkString("/")
  }

  private def isNamespaceDir(p: Path): Boolean =
    fs.getFileStatus(p).isDirectory && !TxStore.isTable(spark, p.toString)

  private def requireNamespace(namespace: Seq[String]): String = {
    val p = nsPath(namespace)
    if (!fs.exists(new Path(p)) || TxStore.isTable(spark, p))
      throw new NoSuchNamespaceException(namespace.toArray)
    p
  }

  // ── tables ───────────────────────────────────────────────────────

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val p = requireNamespace(namespace.toSeq)
    fs.listStatus(new Path(p)).iterator
      .filter(st => st.isDirectory && TxStore.isTable(spark, st.getPath.toString))
      .map(st => Identifier.of(namespace, st.getPath.getName))
      .toArray
  }

  private def load(ident: Identifier, snap: String => TxStore.Snapshot): GraftTable = {
    val path = tablePath(ident)
    if (!TxStore.isTable(spark, path)) throw new NoSuchTableException(ident)
    new GraftTable(spark, path, snap(path))
  }

  override def loadTable(ident: Identifier): Table =
    load(ident, TxStore.snapshot(spark, _))

  /** `VERSION AS OF` through the catalog (version strings are commit
    * numbers — the only version axis the log has). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v =
      try version.trim.toLong
      catch { case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft catalog: VERSION AS OF takes a commit number, got '$version'") }
    load(ident, TxStore.snapshotAt(spark, _, v))
  }

  /** `TIMESTAMP AS OF` through the catalog — Spark hands MICROseconds
    * since epoch; the log's clock is commit-file mtimes (millis). */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    load(ident, p =>
      TxStore.snapshotAt(spark, p, TxStore.versionAtTimestamp(spark, p, timestamp / 1000L)))

  override def tableExists(ident: Identifier): Boolean =
    TxStore.isTable(spark, tablePath(ident))

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    requireNamespace(ident.namespace.toSeq)
    val path = tablePath(ident)
    if (TxStore.isTable(spark, path)) throw new TableAlreadyExistsException(ident)
    val partitionBy = partitions.toSeq.map { t =>
      // the concrete IdentityTransform class is private[sql]; its public
      // face is name() == "identity" with exactly one column reference
      if (t.name == "identity" && t.references.length == 1)
        t.references.head.fieldNames.mkString(".")
      else throw new UnsupportedOperationException(
        s"graft catalog: only identity (hive-style) partitioning is supported, got $t")
    }
    val props = properties.asScala.toSeq.flatMap { case (k, v) =>
      k.toLowerCase(Locale.ROOT) match {
        case "provider" =>
          require(v.equalsIgnoreCase("graft"),
            s"graft catalog: tables are USING graft (got provider '$v')")
          None
        case "location" | "external" | "is_managed_location" =>
          throw new UnsupportedOperationException(
            "graft catalog: tables are warehouse-managed — a LOCATION-pinned table " +
              "could never be found by name again; use " +
              "spark.read/write.format(\"graft\").load(path) for external paths")
        case "owner" | "table_type" => None // engine-stamped, no log meaning
        case k2 if k2.startsWith("option.") =>
          throw new UnsupportedOperationException(
            s"graft catalog: OPTIONS ('$k') have no meaning on catalog tables — " +
              "reads take options at the session surface, writes at the writer")
        case _ => Some(k -> v)
      }
    }
    TxStore.create(spark, path, schema, partitionBy, props)
    new GraftTable(spark, path, TxStore.snapshot(spark, path))
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val path = tablePath(ident)
    if (!TxStore.isTable(spark, path)) throw new NoSuchTableException(ident)
    // property changes batch into ONE commit each way (ALTER … SET
    // TBLPROPERTIES is atomic multi-pair on the log); structural
    // changes apply in statement order
    val sets = changes.collect { case s: TableChange.SetProperty =>
      s.property -> s.value }
    val unsets = changes.collect { case r: TableChange.RemoveProperty => r.property }
    if (sets.nonEmpty) TxStore.setTableProperties(spark, path, sets): Unit
    if (unsets.nonEmpty)
      TxStore.unsetTableProperties(spark, path, unsets, ifExists = true): Unit
    changes.foreach {
      case _: TableChange.SetProperty | _: TableChange.RemoveProperty => ()
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1,
          s"graft catalog: nested ADD COLUMN is not supported (${a.fieldNames.mkString(".")})")
        TxStore.addColumn(spark, path, a.fieldNames.head, a.dataType): Unit
      case r: TableChange.RenameColumn =>
        require(r.fieldNames.length == 1,
          s"graft catalog: nested RENAME COLUMN is not supported (${r.fieldNames.mkString(".")})")
        TxStore.renameColumn(spark, path, r.fieldNames.head, r.newName): Unit
      case d: TableChange.DeleteColumn =>
        require(d.fieldNames.length == 1,
          s"graft catalog: nested DROP COLUMN is not supported (${d.fieldNames.mkString(".")})")
        TxStore.dropColumn(spark, path, d.fieldNames.head): Unit
      case other => throw new UnsupportedOperationException(
        s"graft catalog: unsupported ALTER ($other) — supported: SET/UNSET " +
          "TBLPROPERTIES, ADD/RENAME/DROP COLUMN")
    }
    loadTable(ident)
  }

  /** DROP deletes the directory — data, log, history (managed-table
    * semantics; there is no metastore row to drop separately). */
  override def dropTable(ident: Identifier): Boolean = {
    val path = tablePath(ident)
    TxStore.isTable(spark, path) && fs.delete(new Path(path), true)
  }

  override def purgeTable(ident: Identifier): Boolean = dropTable(ident)

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = tablePath(oldIdent)
    if (!TxStore.isTable(spark, from)) throw new NoSuchTableException(oldIdent)
    requireNamespace(newIdent.namespace.toSeq)
    val to = tablePath(newIdent)
    if (fs.exists(new Path(to))) throw new TableAlreadyExistsException(newIdent)
    require(fs.rename(new Path(from), new Path(to)),
      s"graft catalog: rename $from -> $to failed")
  }

  // ── namespaces ───────────────────────────────────────────────────

  override def listNamespaces(): Array[Array[String]] =
    fs.listStatus(new Path(warehouse)).iterator
      .filter(st => isNamespaceDir(st.getPath))
      .map(st => Array(st.getPath.getName))
      .toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val p = requireNamespace(namespace.toSeq)
    fs.listStatus(new Path(p)).iterator
      .filter(st => isNamespaceDir(st.getPath))
      .map(st => namespace :+ st.getPath.getName)
      .toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean = {
    val p = nsPath(namespace.toSeq)
    fs.exists(new Path(p)) && !TxStore.isTable(spark, p)
  }

  override def loadNamespaceMetadata(
      namespace: Array[String]): java.util.Map[String, String] = {
    val p = requireNamespace(namespace.toSeq)
    Map(SupportsNamespaces.PROP_LOCATION -> p).asJava
  }

  override def createNamespace(
      namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit = {
    metadata.asScala.keys.find(_.equalsIgnoreCase(SupportsNamespaces.PROP_LOCATION))
      .foreach(_ => throw new UnsupportedOperationException(
        "graft catalog: namespaces live under the warehouse root — LOCATION refuses"))
    if (namespaceExists(namespace)) throw new NamespaceAlreadyExistsException(namespace)
    checkSegments(namespace.toSeq, "namespace")
    require(fs.mkdirs(new Path(nsPath(namespace.toSeq))),
      s"graft catalog: mkdirs failed for namespace ${namespace.mkString(".")}")
  }

  override def alterNamespace(
      namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: namespaces carry no mutable metadata")

  override def dropNamespace(
      namespace: Array[String], cascade: Boolean): Boolean = {
    val p = requireNamespace(namespace.toSeq)
    if (!cascade && fs.listStatus(new Path(p)).nonEmpty)
      throw new NonEmptyNamespaceException(namespace)
    fs.delete(new Path(p), true)
  }
}

object GraftCatalog {
  /** Resolve catalog-qualified name parts (`catalog.ns….table`) to the
    * table directory — Some only when `parts.head` names a registered
    * [[GraftCatalog]] and the directory is a live table. Shared by
    * [[SqlDml]] and [[SqlResolve]] so DML and maintenance SQL text
    * address exactly the tables the catalog plans against. */
  def resolvePath(spark: SparkSession, parts: Seq[String]): Option[String] =
    if (parts.length < 2) None
    else org.apache.spark.sql.graft.DsvBridge.catalogPlugin(spark, parts.head).collect {
      case g: GraftCatalog => g.tablePath(Identifier.of(
        parts.drop(1).dropRight(1).toArray, parts.last))
    }.filter(p => TxStore.isTable(spark, p))
}
