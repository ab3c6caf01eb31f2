package graft.sources

import org.apache.spark.sql.catalyst.analysis.{UnresolvedRelation, UnresolvedTable}
import org.apache.spark.sql.catalyst.expressions.CheckConstraint
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** SQL DDL (ALTER TABLE) against TxStore tables — the schema-evolution
  * statements a Delta user writes daily. Spark PARSES all of them
  * (v2AlterTableCommands, including the 4.x ANSI constraint grammar)
  * but cannot execute them on a file-backed view, so like SqlDml the
  * parsed plan translates onto the TxStore API:
  *
  *   - `ALTER TABLE v RENAME COLUMN a TO b` → [[TxStore.renameColumn]]
  *     (metadata-only under column mapping — zero data IO)
  *   - `ALTER TABLE v DROP COLUMN [IF EXISTS] a[, b…]` →
  *     [[TxStore.dropColumn]] per column (physical names retire
  *     forever; values can never resurrect)
  *   - `ALTER TABLE v ADD COLUMN [IF NOT EXISTS] c TYPE[, …]` →
  *     [[TxStore.addColumn]] (schema restates, old files read NULL).
  *     NOT NULL, DEFAULT, comments and positions refuse — every log
  *     field is nullable by the evolution contract, and a default
  *     would silently rewrite history's meaning.
  *   - `ALTER TABLE v ADD CONSTRAINT n CHECK (expr)` →
  *     [[TxStore.addConstraint]] (existing rows validated first)
  *   - `ALTER TABLE v DROP CONSTRAINT [IF EXISTS] n` →
  *     [[TxStore.dropConstraint]]
  *
  * Targets must be current `--tx` views (time-travel views are
  * read-only); anything else — and any ALTER shape the table format
  * cannot honor — refuses loudly with the reason, never a silent
  * no-op and never Catalyst's opaque unsupported-plan error. */
object SqlDdl {

  /** Executed DDL: statement kind, target view + path, last committed
    * version (None = IF [NOT] EXISTS matched nothing), summary frame. */
  final case class Result(
      op: String, view: String, path: String, version: Option[Long], df: DataFrame)

  /** If `text` parses to an ALTER TABLE statement, execute it against
    * the `--tx` table it targets; None = not DDL. */
  def maybeExecute(
      spark: SparkSession, text: String, tx: Map[String, String]): Option[Result] = {
    val head = text.trim.split("\\s+", 2)(0).toUpperCase(java.util.Locale.ROOT)
    if (head != "ALTER") return None
    val parsed =
      try spark.sessionState.sqlParser.parsePlan(text)
      catch { case e: Exception => refuse(s"cannot parse ALTER statement: ${e.getMessage}") }

    def resolve(name: String): (String, String) =
      SqlResolve.view(tx, name).getOrElse(refuse(SqlResolve.unknown(tx, name)))
    def target(p: LogicalPlan): (String, String) = p match {
      case u: UnresolvedTable => resolve(u.multipartIdentifier.mkString("."))
      case other => refuse(s"unsupported ALTER target: ${other.nodeName}")
    }
    def one(cols: (String, Column)*): DataFrame =
      cols.foldLeft(spark.range(1).toDF())((df, c) => df.withColumn(c._1, c._2)).drop("id")
    def summary(op: String, view: String, path: String,
        v: Option[Long], detail: String): Result =
      Result(op, view, path, v,
        one("op" -> lit(op), "table" -> lit(view), "detail" -> lit(detail),
          "version" -> v.map(lit(_)).getOrElse(lit(null).cast("long"))))
    def singlePart(parts: Seq[String], what: String): String = {
      if (parts.length != 1)
        refuse(s"$what: nested fields are not supported (${parts.mkString(".")})")
      parts.head
    }

    Some(parsed match {
      case RenameColumn(t, col, newName) =>
        val (view, path) = target(t)
        val from = singlePart(col.name, "RENAME COLUMN")
        val v = TxStore.renameColumn(spark, path, from, newName)
        summary("alter-rename-column", view, path, Some(v), s"$from -> $newName")

      case DropColumns(t, cols, ifExists) =>
        val (view, path) = target(t)
        val names = cols.map(c => singlePart(c.name, "DROP COLUMN"))
        val have = TxStore.logicalSchema(TxStore.snapshot(spark, path))
          .map(_.fieldNames.map(_.toLowerCase(java.util.Locale.ROOT)).toSet)
          .getOrElse(Set.empty)
        val (present, absent) =
          names.partition(n => have(n.toLowerCase(java.util.Locale.ROOT)))
        if (absent.nonEmpty && !ifExists)
          refuse(s"DROP COLUMN: no such column(s) ${absent.mkString(", ")}")
        // ONE commit for the whole column list — every name validates
        // against the snapshot before anything publishes, so a refusal
        // on the second column (last-column rule, constraint ref) leaves
        // no earlier drop durable: the statement is atomic (ADVICE r14)
        val vs = if (present.isEmpty) Nil
          else Seq(TxStore.dropColumns(spark, path, present))
        summary("alter-drop-column", view, path, vs.lastOption,
          (present.map(n => s"dropped $n") ++ absent.map(n => s"skipped $n (absent)"))
            .mkString("; "))

      case AddColumns(t, cols) =>
        val (view, path) = target(t)
        val have = TxStore.logicalSchema(TxStore.snapshot(spark, path))
          .map(_.fieldNames.map(_.toLowerCase(java.util.Locale.ROOT)).toSet)
          .getOrElse(Set.empty)
        val specs = cols.map { q =>
          if (q.path.exists(_.name.nonEmpty))
            refuse("ADD COLUMN: nested fields are not supported")
          if (!q.nullable) refuse(
            s"ADD COLUMN ${q.colName}: NOT NULL is not supported — every log field is " +
              "nullable (old files lack the column and must read NULL)")
          if (q.default.isDefined) refuse(
            s"ADD COLUMN ${q.colName}: DEFAULT is not supported — a default would " +
              "silently rewrite what history's rows mean")
          if (q.position.isDefined)
            refuse(s"ADD COLUMN ${q.colName}: FIRST/AFTER positions are not supported")
          (q.colName, q.dataType, q.comment)
        }
        specs.foreach { case (n, _, c) =>
          if (c.isDefined) refuse(s"ADD COLUMN $n: COMMENT is not supported")
        }
        // IF NOT EXISTS rides the statement (Spark parses it into the
        // column list only for unqualified adds) — treat an existing
        // name as a loud refusal, the addColumn contract
        val (fresh, dup) =
          specs.partition(s => !have(s._1.toLowerCase(java.util.Locale.ROOT)))
        if (dup.nonEmpty)
          refuse(s"ADD COLUMN: column(s) already exist: ${dup.map(_._1).mkString(", ")}")
        val vs = fresh.map { case (n, dt, _) => TxStore.addColumn(spark, path, n, dt) }
        summary("alter-add-column", view, path, vs.lastOption,
          fresh.map { case (n, dt, _) => s"added $n ${dt.simpleString}" }.mkString("; "))

      // the 4.x ANSI grammar parses ADD CONSTRAINT … CHECK into
      // AddCheckConstraint whose child is Filter(NOT expr, relation) —
      // the validation plan Spark would run; the TxStore API runs its
      // own existing-rows validation, so only the relation matters here
      case a: AddCheckConstraint =>
        val rel = a.child.collectFirst { case u: UnresolvedRelation => u }
          .getOrElse(refuse("ADD CONSTRAINT: no table relation in the statement"))
        val (view, path) = resolve(rel.multipartIdentifier.mkString("."))
        val c = a.checkConstraint
        val name = Option(c.userProvidedName).filter(_.nonEmpty)
          .getOrElse(refuse("ADD CONSTRAINT: a constraint name is required"))
        val v = TxStore.addConstraint(spark, path, name, c.condition)
        summary("alter-add-constraint", view, path, Some(v), s"$name CHECK (${c.condition})")

      case a: AddConstraint =>
        refuse("only CHECK constraints are supported, got " +
          a.tableConstraint.getClass.getSimpleName)

      case d: DropConstraint =>
        val (view, path) = target(d.table)
        if (d.cascade) refuse("DROP CONSTRAINT CASCADE is not supported")
        val exists = TxStore.tableConstraints(spark, path)
          .exists(_._1.equalsIgnoreCase(d.name))
        if (!exists && d.ifExists)
          summary("alter-drop-constraint", view, path, None, s"skipped ${d.name} (absent)")
        else {
          val v = TxStore.dropConstraint(spark, path, d.name)
          summary("alter-drop-constraint", view, path, Some(v), s"dropped ${d.name}")
        }

      // TBLPROPERTIES: free-form operational metadata riding the log
      // latest-wins — one commit per statement (atomic multi-pair)
      case p: SetTableProperties =>
        val (view, path) = target(p.table)
        val pairs = p.properties.toSeq
        val v = TxStore.setTableProperties(spark, path, pairs)
        summary("alter-set-properties", view, path, Some(v),
          pairs.map { case (k, vv) => s"$k=$vv" }.sorted.mkString("; "))

      case p: UnsetTableProperties =>
        val (view, path) = target(p.table)
        val have = TxStore.tableProperties(spark, path)
          .map(_._1.toLowerCase(java.util.Locale.ROOT)).toSet
        val (present, absent) =
          p.propertyKeys.partition(k => have(k.toLowerCase(java.util.Locale.ROOT)))
        if (absent.nonEmpty && !p.ifExists)
          refuse(s"UNSET TBLPROPERTIES: no such key(s) ${absent.mkString(", ")}")
        val vs = if (present.isEmpty) Nil
          else Seq(TxStore.unsetTableProperties(spark, path, present, ifExists = true))
        summary("alter-unset-properties", view, path, vs.lastOption,
          (present.map(k => s"unset $k") ++ absent.map(k => s"skipped $k (absent)"))
            .mkString("; "))

      case other =>
        refuse(s"unsupported ALTER statement: ${other.nodeName} — the table format " +
          "supports RENAME/DROP/ADD COLUMN, ADD/DROP CONSTRAINT and " +
          "SET/UNSET TBLPROPERTIES")
    })
  }

  private def refuse(msg: String): Nothing =
    throw new IllegalArgumentException(s"sql ddl: $msg")
}
